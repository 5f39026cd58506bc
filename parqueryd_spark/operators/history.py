"""Type-2 slowly-changing-dimension history on plain parquet: effective-dated
versions with point-in-time reads, maintained at O(affected keys) per batch.

The type-1 face of maintenance already exists (``sources/sinks.upsert_*``,
``streaming/cdc.py``: latest row per key wins); this module keeps the HISTORY
— one row per surviving version carrying ``[eff_from, eff_to)`` validity — so
pipelines can ask "what was this dimension worth when the fact happened"
(training-data labeling against the label definition *in force at sample
time*, late-fact joins, audit). The Kimball SCD2 shape, built from Spark
windows:

- ``scd2_init``: change log -> history. Per key, order versions by
  ``(ts, *tiebreak_cols)`` (callers supply a tiebreaker making the order
  total — nondeterministic version order is silent corruption), optionally
  collapse runs where the tracked ``compare_cols`` didn't change (a change
  feed that re-states an unchanged row must not open a new version), then
  ``eff_to = lead(eff_from)``; the open version has ``eff_to IS NULL``.
- ``scd2_apply``: merge a new change batch by recomputing ONLY the affected
  keys: semi-join out their full version chains, re-derive attribute rows,
  union the batch, re-init, and union back the untouched keys. Late-arriving
  changes splice mid-chain correctly because the whole per-key chain is
  rebuilt — and only that chain is touched, so batch cost scales with the
  batch's key footprint, not table depth. Equivalence to a from-scratch
  rebuild is property-tested.
- ``scd2_as_of`` / ``scd2_current``: point-in-time and latest snapshots —
  plain filters, no shuffle; the as-of filter composes with the zone-map /
  partition layout when history is persisted sorted by ``eff_from``.

One shuffle per init (the key window); apply adds the two semi/anti joins.
Oracle-gated end to end (``scd2_events_asof``) against a DuckDB
window-function reformulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_RESERVED = ("eff_from", "eff_to", "is_current")


def scd2_init(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    compare_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Change log -> SCD2 history: per key, surviving versions effective
    ``[eff_from, eff_to)`` with ``is_current`` on the open one. With
    ``compare_cols``, a row opening a version identical (on those columns)
    to the immediately-previous surviving version is collapsed into it."""
    for c in _RESERVED:
        if c in changes.columns:
            raise ValueError(f"scd2 reserves column name {c!r}; rename the input")
    tb = [F.col(c) for c in (tiebreak_cols or [])]
    order = [F.col(ts_col), *tb]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = changes
    if compare_cols:
        sig = F.struct(*[F.col(c) for c in compare_cols])
        # eqNullSafe: first-version rows (lag NULL) keep, and null attribute
        # members compare equal instead of unknown (probed: struct(NULL) <=>
        # struct(NULL) is true), so null-valued attributes don't reopen
        out = (
            out.withColumn("__prev", F.lag(sig).over(w))
            .filter(~F.col("__prev").eqNullSafe(sig))
            .drop("__prev")
        )
    # second window over SURVIVORS: eff_to chains only across kept versions
    return (
        out.withColumn("eff_from", F.col(ts_col))
        .withColumn("eff_to", F.lead("eff_from").over(w))
        .withColumn("is_current", F.col("eff_to").isNull())
    )


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    compare_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Merge a change batch into existing history, recomputing only the
    affected keys' chains. ``changes`` carries the same attribute columns as
    the history minus the three scd2 columns."""
    keys = changes.select(*key_cols).distinct()
    untouched = history.join(keys, key_cols, "left_anti")
    affected = history.join(keys, key_cols, "left_semi")
    # back to change-log grain: every stored version is a change at eff_from.
    # The dedup on (key, ts, tiebreak) — which must identify a change — makes
    # apply IDEMPOTENT: replaying a batch already absorbed into the history
    # re-unions the identical change rows and collapses to the same chains,
    # the at-least-once contract the streaming maintainers rely on. When a
    # replayed version and an incoming change share the same identity but
    # differ in attribute values (a correcting RESTATEMENT), the incoming
    # batch row wins deterministically via the precedence rank — a bare
    # dropDuplicates would keep an arbitrary side run to run. Identity
    # collisions WITHIN one batch remain caller error (the tiebreak columns
    # exist to make change identity total).
    replay = affected.drop(*_RESERVED).withColumn("__prec", F.lit(0))
    combined = replay.unionByName(changes.withColumn("__prec", F.lit(1)))
    ident = Window.partitionBy(
        *key_cols, ts_col, *(tiebreak_cols or [])
    ).orderBy(F.col("__prec").desc())
    combined = (
        combined.withColumn("__rn", F.row_number().over(ident))
        .filter(F.col("__rn") == 1)
        .drop("__prec", "__rn")
    )
    rebuilt = scd2_init(combined, key_cols, ts_col, compare_cols, tiebreak_cols)
    return untouched.unionByName(rebuilt)


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """The version of every key in force at ``ts`` (a literal or Column):
    ``eff_from <= ts < eff_to``, open interval for the current version."""
    t = F.lit(ts)
    return history.filter(
        (F.col("eff_from") <= t) & (F.col("eff_to").isNull() | (F.col("eff_to") > t))
    )


def scd2_current(history: DataFrame) -> DataFrame:
    return history.filter(F.col("is_current"))
