"""Data-quality operators: table statistics (ANALYZE) and declarative
constraint checks — the deequ/dbt-test surface a production table needs
before anything downstream trusts it.

Scale design: every check compiles to ONE aggregate over the table (or one
anti-join for referential checks), all map-side partial-aggregated; the
report output is metadata-scale (rows = number of checks / columns, never
data rows). ``table_stats`` computes all columns' stats in a single
aggregation job — one scan, not one per column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_stats(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """ANALYZE-style per-column statistics in ONE scan: null count, exact
    distinct count, min and max (stringified so every type fits one report
    schema). Returns (column, n_rows, n_nulls, n_distinct, min_value,
    max_value). Exact ndv is a full shuffle per column at 100 TB — swap
    ``countDistinct`` for ``approx_count_distinct`` (HLL, map-side mergeable)
    when cardinality estimates are enough (the planner-stats case)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"),
            F.countDistinct(c).alias(f"_ndv_{c}"),
            # min/max on the NATIVE type (string-cast first would compare
            # lexicographically: max of 1..2000 would be "999"), then stringify
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.col("_n").alias("n_rows"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"_nulls_{c}").cast("long").alias("n_nulls"),
                        F.col(f"_ndv_{c}").alias("n_distinct"),
                        F.col(f"_min_{c}").alias("min_value"),
                        F.col(f"_max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s"),
    )
    return stacked.select(
        "s.column", "n_rows", "s.n_nulls", "s.n_distinct", "s.min_value", "s.max_value"
    )


def _report(name: str, violations: Column) -> list[Column]:
    return [F.lit(name).alias("check"), violations.cast("long").alias("violations")]


def check_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Rows carrying a key that occurs more than once (count of EXTRA rows:
    a key seen k times contributes k-1 violations — 0 means unique)."""
    dupes = df.groupBy(*cols).agg(F.count("*").alias("_n")).filter(F.col("_n") > 1)
    v = dupes.agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("v"))
    return v.select(*_report(name or f"unique({','.join(cols)})", F.col("v")))


def check_not_null(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    # coalesce: sum over ZERO rows is null, and a null violation count would
    # poison `passed` (null == 0 is null, reading as failed) — empty is clean
    v = df.agg(
        F.coalesce(
            sum(
                (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) for c in cols),
                F.lit(0),
            ),
            F.lit(0),
        ).alias("v")
    )
    return v.select(*_report(name or f"not_null({','.join(cols)})", F.col("v")))


def check_range(
    df: DataFrame, col: str, lo, hi, name: str | None = None
) -> DataFrame:
    """Rows outside [lo, hi] (nulls don't count — pair with check_not_null)."""
    bad = F.coalesce(
        F.sum(
            F.when(F.col(col).isNotNull() & ~F.col(col).between(lo, hi), 1).otherwise(0)
        ),
        F.lit(0),
    )
    return df.agg(bad.alias("v")).select(
        *_report(name or f"range({col},[{lo},{hi}])", F.col("v"))
    )


def check_foreign_key(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    name: str | None = None,
) -> DataFrame:
    """Child rows whose fk has no parent (left anti on the key — AQE
    broadcasts the parent's distinct keys when they fit, so the child is
    never shuffled in the common small-dimension case)."""
    orphans = child.select(F.col(fk).alias("_k")).join(
        parent.select(F.col(pk).alias("_k")).distinct(), "_k", "left_anti"
    )
    return orphans.agg(F.count("*").alias("v")).select(
        *_report(name or f"fk({fk}->{pk})", F.col("v"))
    )


def quality_report(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check results into the report: (check, violations,
    passed). Each check stays an independent aggregate — Spark runs them as
    parallel jobs of one stage each."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn("passed", F.col("violations") == 0)


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot reconciliation between two versions of a table: which keys
    were ``added`` (only in ``b``), ``removed`` (only in ``a``), or
    ``changed`` (present in both with differing compared columns). Unchanged
    keys are omitted — the output is diff-sized, not table-sized. The shape a
    CDC pipeline needs to validate an applied changeset (streaming/cdc.py)
    and a versioned publish needs to audit between generations
    (sources/sinks.py:publish_version).

    Scale design (100 TB): each side is reduced AT THE SCAN to
    ``(keys, xxhash64(compared cols))`` — a column-pruned projection, nothing
    row-width crosses the wire — then ONE full-outer sort-merge join on the
    key shuffle decides each key's status. The digest comparison trades
    exactness for width: xxhash64 collisions can mark a changed row
    unchanged with probability 2^-64 per key (only same-key pairs compare).
    Snapshots written bucketed by key (operators/scale.py:write_bucketed)
    make the join zero-exchange.
    """
    cc = compare_cols or [c for c in a.columns if c not in keys]

    # xxhash64 SKIPS null inputs (the seed passes through), so without a
    # per-column null flag the tuples (null,'x') and ('x',null) hash
    # identically — a deterministic collision class, not a 2^-64 one. The
    # interleaved is-null ints make every column's contribution positional.
    def _digest(df: DataFrame):
        parts = []
        for c in cc:
            parts += [F.col(c), F.isnull(c).cast("int")]
        return F.xxhash64(*parts)

    ha = a.select(*keys, _digest(a).alias("_ha"))
    hb = b.select(*keys, _digest(b).alias("_hb"))
    j = ha.join(hb, on=list(keys), how="full_outer")
    status = (
        F.when(F.col("_ha").isNull(), F.lit("added"))
        .when(F.col("_hb").isNull(), F.lit("removed"))
        .when(F.col("_ha") != F.col("_hb"), F.lit("changed"))
    )
    return j.select(status.alias("status"), *keys).where(F.col("status").isNotNull())


def compression_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    redundancy signal web-corpus curation uses alongside the Gopher
    repetition gates (operators/text.py): highly repetitive or templated
    text compresses far below ~0.4, high-entropy garbage sits near 1.0.
    Returns (doc, n_bytes, ratio).

    This is a legitimate Python escape hatch: no Column expression or ANSI
    SQL exposes a DEFLATE ratio, so it runs as an Arrow-batched mapInPandas
    (vectorized transfer, no per-row pickling) with a self-contained closure
    (executors must not need this package importable). Everything around it
    — filtering on the ratio, joining it back — stays JVM-side.
    """
    out_schema = "doc long, n_bytes long, ratio double"
    narrow = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_text"))

    def _ratios(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf["_text"].fillna("").str.encode("utf-8")
            n = raw.str.len()
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"],
                    "n_bytes": n.astype("int64"),
                    "ratio": (comp / n.clip(lower=1)).astype("float64"),
                }
            )

    return narrow.mapInPandas(_ratios, out_schema)


def data_card(
    df: DataFrame,
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-source data card: the one-scan audit report a curation run
    publishes alongside a dataset (datasheets-for-datasets style) — volume,
    token budget, exact-duplicate rate, mean quality, PII incidence, and
    language spread, grouped by ``group_cols`` (default: ``source``).

    Everything is computed in a SINGLE aggregation over one projection pass:
    per-doc signals (token count, content digest, quality score, PII flag,
    predicted language) are pure codegen'd Column expressions, then one
    groupBy folds them into the report — no second scan, no Python, report
    rows = number of sources. Float columns are rounded to 4dp so the report
    is stable across engines and row orders.
    """
    from parqueryd_spark.operators.pii import has_pii
    from parqueryd_spark.operators.text import predict_lang, quality_score, token_count

    groups = group_cols or ["source"]
    t = F.col(text_col)
    per_doc = df.select(
        *groups,
        token_count(t).alias("_ntok"),
        F.md5(t).alias("_digest"),
        quality_score(t).alias("_q"),
        has_pii(t).alias("_pii"),
        predict_lang(t).alias("_lang"),
    )
    n = F.count(F.lit(1))
    uniq = F.count_distinct(F.col("_digest"))
    return per_doc.groupBy(*groups).agg(
        n.alias("n_docs"),
        F.sum("_ntok").cast("long").alias("n_tokens"),
        F.round(F.avg("_ntok"), 4).alias("avg_tokens"),
        uniq.alias("n_unique_texts"),
        F.round(F.lit(1.0) - uniq / n.cast("double"), 4).alias("dup_pct"),
        F.round(F.avg("_q"), 4).alias("avg_quality"),
        F.sum(F.col("_pii").cast("long")).alias("docs_with_pii"),
        F.count_distinct(F.col("_lang")).alias("n_langs"),
    )


def quantile_calibrate(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tiebreak_cols: list[str] | None = None,
    calib_col: str = "calib",
) -> DataFrame:
    """Per-group quantile calibration of a quality score: replace each row's
    raw ``score_col`` with its percent_rank WITHIN ``group_col`` — the
    curation step that makes one keep-threshold comparable across sources
    whose raw score distributions differ (a 0.9 calibrated score means "top
    10% of its own source" for every source; Gopher/FineWeb-style per-source
    quality gates are exactly this, and DoReMi-style mixture reweighting
    consumes the same ranks).

    ``tiebreak_cols`` (default: none) are appended to the ordering so equal
    scores rank deterministically — REQUIRED for a replayable result when
    scores collide (the registry row ties on the document id). percent_rank
    is (rank-1)/(n-1), 0 for single-row groups, identical in Spark and ANSI
    SQL, so the calibrated values themselves are oracle-checkable.

    Scale: one shuffle on ``group_col`` (the window partition). Source-grain
    groups are few and large — exactly the shape window exchange reuse and
    AQE handle; there is no driver-side state and no second scan. Rounded to
    6 dp (exact rational (rank-1)/(n-1) in double — cross-engine identical;
    rounding is belt-and-braces for downstream float consumers).
    """
    from pyspark.sql import Window as W

    order = [F.col(score_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = W.partitionBy(group_col).orderBy(*order)
    return df.withColumn(calib_col, F.round(F.percent_rank().over(w), 6))


def calibration_cdf(
    df: DataFrame, group_col: str, score_col: str
) -> DataFrame:
    """The frozen face of :func:`quantile_calibrate`: reduce a reference
    window to its per-group empirical CDF — one row per (group, distinct
    score) with ``cdf`` = fraction of reference rows at or below that score
    (cume_dist, an exact rational k/n). Publish this table (it is
    distinct-score-sized, not corpus-sized) and every future batch scores
    against the SAME frozen distribution — the production quality gate,
    where thresholds must not drift with each incoming batch."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(F.col(score_col).asc())
    return (
        df.select(group_col, score_col)
        .withColumn("cdf", F.cume_dist().over(w))
        .distinct()
    )


def calibration_score(
    ref_cdf: DataFrame,
    new_df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    calib_col: str = "calib",
) -> DataFrame:
    """Score NEW rows against a published per-group CDF: each row's
    ``calib_col`` is the frozen cdf at the LARGEST reference score ≤ its own
    score (step-function lookup; 0.0 below every reference score — an
    out-of-distribution low outlier).

    Plan shape — a sort-merge step lookup, not a range join: union the
    (tiny) reference CDF rows with the probe rows, window per group ordered
    by (score, ref-before-probe so ties inherit the reference value), and
    take the running last non-null cdf. ONE shuffle on ``group_col``,
    linear in probes + reference rows; a broadcast range join would cost
    O(probes × distinct-scores) instead. The same call inside foreachBatch
    serves a stream against the frozen gate unchanged.

    Returns (id_col, group_col, score_col, calib_col) rounded to 6 dp —
    exact rationals in double, so an ANSI window replay hash-matches.

    ``id_col`` is carried through UNTOUCHED in its original type (string /
    UUID / long ids all work — ADVICE r13: an earlier cast-to-long silently
    nulled non-numeric ids). It also serves as the within-tie ordering key;
    the result is tie-order-independent anyway (tied probe rows all read the
    same running reference cdf, since reference rows sort before probes at
    equal score), so the ordering only pins plan determinism."""
    from pyspark.sql import Window as W

    id_type = new_df.schema[id_col].dataType
    ref = ref_cdf.select(
        F.col(group_col).alias("_g"),
        F.col(score_col).cast("double").alias("_s"),
        F.col("cdf").alias("_cdf"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(id_type).alias("_pid"),
    )
    probe = new_df.select(
        F.col(group_col).alias("_g"),
        F.col(score_col).cast("double").alias("_s"),
        F.lit(None).cast("double").alias("_cdf"),
        F.lit(1).alias("_tag"),
        F.col(id_col).alias("_pid"),
    )
    w = (
        W.partitionBy("_g")
        .orderBy(F.col("_s").asc(), F.col("_tag").asc(), F.col("_pid").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        ref.unionByName(probe)
        .withColumn("_run", F.last("_cdf", ignorenulls=True).over(w))
        .where(F.col("_tag") == 1)
    )
    return out.select(
        F.col("_pid").alias(id_col),
        F.col("_g").alias(group_col),
        F.col("_s").alias(score_col),
        F.round(F.coalesce(F.col("_run"), F.lit(0.0)), 6).alias(calib_col),
    )
