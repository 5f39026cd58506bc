"""Distributed frequent-items (heavy hitters) via Misra–Gries summaries —
the sketch the built-in family (HLL++ distinct, approx quantiles; see
``events_sketch_aggs``) doesn't cover.

Exact top-k-by-frequency needs a full shuffle of every key occurrence; at
100 TB a high-cardinality key (user id, URL, shingle) makes that shuffle the
job. Misra–Gries ("Finding repeated elements", Sci. Comput. Program. 1982)
keeps only ``capacity`` counters per partition with a deterministic guarantee:
a partition summary undercounts any key by at most ⌊n_part/(capacity+1)⌋, and
summaries MERGE by plain counter addition with errors adding — so the
distributed form is: per-partition sketch (one Arrow-batched pass, bounded
memory), then one tiny shuffle of ≤ capacity × n_partitions rows. Any key
with true frequency > Σ⌊n_p/(capacity+1)⌋ is guaranteed to surface.

This is the pattern the engine uses for custom sketches Spark lacks: a
self-contained mapInPandas summarizer + an algebraic merge expressed as a
plain groupBy — no state stores, no driver collection.

Also here: the mergeable HLL distinct-count rollup (hll_rollup /
hll_rollup_merge / hll_estimate) over Spark's built-in Datasketches HLL
binary sketches — persisted distinct-count state that merges across
partitions/days without touching raw ids again.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    capacity: int = 256,
) -> DataFrame:
    """Approximate top-k most frequent values of ``key_col``.

    Returns (key, est_count, max_undercount) ordered by est_count desc, key
    asc: ``est_count ≤ true_count ≤ est_count + max_undercount`` — the bound
    is part of the result so callers can see whether ranks are separable.
    Deterministic for a fixed partitioning: ties in the counter-eviction path
    are broken by insertion order, and the final ordering is value-then-key.

    capacity trades memory for error: per-partition error ≤ ⌊n_p/(capacity+1)⌋
    and errors add across partitions. For a guaranteed catch of keys above
    fraction φ of ALL rows, use capacity ≥ 1/φ.
    """
    summaries = _mg_summaries(df, key_col, int(capacity))
    bound = summaries.where(F.col("key").isNull()).agg(F.sum("err").alias("max_undercount"))
    merged = (
        summaries.where(F.col("key").isNotNull()).groupBy("key").agg(F.sum("cnt").alias("est_count"))
    )
    return (
        merged.join(F.broadcast(bound))
        .select(F.col("key").alias(key_col), "est_count", "max_undercount")
        .orderBy(F.col("est_count").desc(), F.col(key_col).asc())
        .limit(k)
    )


def _mg_summaries(
    df: DataFrame, key_col: str, cap: int, weight_col: str | None = None
) -> DataFrame:
    """Per-partition Misra–Gries summaries of ``key_col`` as rows
    (key, cnt, err): ≤ ``cap`` counter rows per partition plus ONE NULL-key
    marker row carrying that partition's accumulated eviction error.

    With ``weight_col`` (an integer, NON-NEGATIVE measure — scale decimals
    to integer units first, e.g. cents, so every sum downstream stays exact)
    the counters accumulate weight sums instead of occurrence counts: the
    identical guarantee holds with "count" read as "total weight" (Misra–
    Gries is linear in the increments, so decrement-by-the-(cap+1)-th-
    largest preserves weight ≥ true − err per surviving key)."""
    if cap < 1:
        raise ValueError("capacity must be >= 1")
    # NULL keys are excluded (NULL marks the per-partition error rows below,
    # and SQL count semantics skip NULL groups in frequency contexts anyway)
    df = df.where(F.col(key_col).isNotNull())
    if weight_col is not None:
        df = df.where(F.col(weight_col).isNotNull())

    def summarize(batches):
        # Misra–Gries with batch-vectorized counting: exact value_counts
        # (or per-key weight sums) per Arrow batch fold into the bounded
        # counter set; decrement step subtracts the (cap+1)-th largest
        # surviving value (the standard batched MG).
        import pandas as pd

        counters: dict = {}
        err = 0
        for pdf in batches:
            if pdf.shape[1] == 2:
                # the NON-NEGATIVE weight contract is enforced, not just
                # documented (ADVICE r12): a negative measure (refund rows)
                # breaks the MG undercount bound, so the "provably exact"
                # claim downstream would be silently wrong
                if (pdf.iloc[:, 1] < 0).any():
                    bad = pdf.iloc[:, 1].min()
                    raise ValueError(
                        f"heavy_hitters weight_col must be non-negative "
                        f"(found {bad}); exclude or split negative-measure "
                        "rows before sketching"
                    )
                vc = pdf.groupby(pdf.columns[0], sort=False)[pdf.columns[1]].sum()
            else:
                vc = pdf.iloc[:, 0].value_counts()
            for key, cnt in vc.items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > cap:
                # evict: subtract the (cap+1)-th largest count from everyone;
                # anything ≤ 0 drops. One decrement round per batch, error
                # grows by the subtracted amount.
                cut = sorted(counters.values(), reverse=True)[cap]
                counters = {k_: v - cut for k_, v in counters.items() if v > cut}
                err += cut
        # counter rows + ONE marker row (key NULL) carrying this partition's
        # accumulated eviction error, so the merge can bound undercounts
        # without a second scan of the input
        yield pd.DataFrame(
            {
                "key": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [0],
                "err": [0] * len(counters) + [err],
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    cols = [F.col(key_col).alias("key")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("w"))
    # merge semantics downstream: counts add across partitions; a key absent
    # from a partition's summary was undercounted there by at most that
    # partition's eviction error, so Σ err over all partitions bounds any
    # key's total undercount.
    return df.select(*cols).mapInPandas(
        summarize, schema=f"key {key_type}, cnt long, err long"
    )


def heavy_hitters_exact_topk(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    capacity: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """EXACT top-k most frequent values of ``key_col`` — the two-pass
    confirm pattern that makes the Misra–Gries sketch externally checkable.

    With ``weight_col`` (integer, NON-NEGATIVE — scale decimals to integer
    units like cents first; negative weights break the MG undercount
    guarantee and are the caller's contract to exclude) the same machinery
    answers top-k by TOTAL MEASURE — revenue by product, bytes by token,
    spend by account — and the output column is ``weight_sum`` instead of
    ``n_occurrences``. Every sum is integer, so the exactness proof and the
    cross-engine replay carry over unchanged.

    Pass 1 (Misra–Gries, bounded memory) surfaces a candidate set of at most
    ``capacity × n_partitions`` keys plus the total eviction error E. Any key
    ABSENT from every partition's summary has true count ≤ E, so pass 2 —
    exact counts restricted to the candidates via a broadcast semi-join, with
    map-side partial aggregation — ranks the only keys that can matter. The
    result is provably the exact top-k iff NO eviction happened anywhere
    (E == 0: candidates complete, counts exact) or k candidates came back
    with the k-th confirmed count strictly above E. Both directions are
    enforced, not assumed: fewer-than-k candidates with E > 0 raises
    ``ValueError`` eagerly at plan-build time (an evicted key could belong
    in the tail — and an empty result would give an in-plan check no row to
    fire on), and the k-th-count condition is enforced IN the plan with
    ``raise_error`` (the job fails rather than silently returning an
    unprovable cut — remedy: raise ``capacity``). Returns
    (key_col, n_occurrences) ordered by count desc, key asc — deterministic
    and replayable by any exact SQL engine.

    At 100 TB this replaces a full shuffle of every key occurrence with one
    bounded-state sketch pass plus one aggregate whose shuffle carries
    ≤ candidates × n_partitions partial rows: the frequent-token / hot-URL /
    heavy-user query at a cost independent of key cardinality.

    Contract deviations from the otherwise-lazy registry convention, both
    deliberate: (1) the sketch pass runs EAGERLY at plan-build time (the
    refusal gate needs the candidate count before a plan can honestly
    exist); (2) ``df`` must be a STATIC batch source between build and
    execution — the confirm pass re-scans it, so a file landing in between
    could hold a heavy key the snapshot candidates missed without tripping
    either proof.
    """
    out_col = "n_occurrences" if weight_col is None else "weight_sum"
    measure = (
        F.count("*") if weight_col is None else F.sum(F.col(weight_col).cast("long"))
    ).alias(out_col)
    # localCheckpoint materializes the MG summaries ONCE; the gate stats,
    # the eviction bound E, and the candidate set all read the SAME snapshot
    # (ADVICE r12: the old persist()-based split never unpersisted, leaking
    # cached blocks across a full registry run — checkpoint blocks are
    # freed by the ContextCleaner when the plan is garbage-collected — and a
    # recompute could re-batch rows into a DIFFERENT valid MG summary per
    # consumer). The summaries are bounded by construction: ≤ capacity
    # counter rows + 1 marker per partition (256×1000 executors ≈ 256k tiny
    # rows). Only the two gate SCALARS come to the driver; the candidate
    # set stays JVM-side (an earlier collect-and-recreate variant paid
    # ~0.5 s/plan shipping candidate keys through Python both ways).
    summaries = _mg_summaries(df, key_col, int(capacity), weight_col).localCheckpoint(
        eager=True
    )
    n_cands, total_err = summaries.agg(
        F.count_distinct("key"), F.coalesce(F.sum("err"), F.lit(0))
    ).first()
    total_err = int(total_err)
    # Short-candidate gate, checked EAGERLY at plan-build time: the per-row
    # proof below only covers the case where k candidates came back. If
    # FEWER than k candidates survived the sketch pass while eviction error
    # accumulated (E > 0), an evicted key (count ≤ E) could legitimately
    # belong in the top-k TAIL — including the degenerate batch whose counts
    # all equal the cut, which evicts EVERY counter and would otherwise
    # return an empty "top-k" with no row for the in-plan proof to evaluate
    # (and an in-plan gate on the empty side of a join can be skipped by
    # AQE's empty-relation propagation, so laziness is not safe here). E == 0
    # passes: no eviction anywhere means the candidate set is complete and
    # counts exact, so fewer than k rows is the honest full answer.
    if n_cands < int(k) and total_err > 0:
        raise ValueError(
            f"heavy_hitters_exact_topk: only {n_cands} candidates "
            f"survived for k={int(k)} with eviction error {total_err} — top-k "
            "not provably exact; increase capacity"
        )
    # Candidates travel as a broadcast-joined DataFrame over the checkpointed
    # summaries, never as an inlined isin literal list — the plan stays
    # bounded the way pq_lut_det keeps ADC tables out of the expression tree.
    # NOTE the sketch pass ran above at plan-BUILD time while the confirm
    # pass below re-scans df at EXECUTION time: df must be a static batch
    # source between the two (the registry/bench contract), or a key added
    # in between could miss the candidate set without tripping either proof.
    cands = (
        summaries.where(F.col("key").isNotNull())
        .select(F.col("key").alias(key_col))
        .distinct()
    )
    exact = (
        df.join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(measure)
        .orderBy(F.col(out_col).desc(), F.col(key_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window as W

    kth = F.min(out_col).over(W.partitionBy(F.lit(1)))
    guarded = (
        exact.withColumn("_max_under", F.lit(total_err))
        .withColumn("_kth", kth)
        # CASE WHEN guarantees the error branch is evaluated ONLY when the
        # proof fails (a bare OR may evaluate both sides). Kept as a filter
        # (not a projected column) so Catalyst cannot prune the proof away.
        # E == 0 is always exact (no eviction anywhere: counts exact and the
        # candidate set complete); otherwise the k-th returned count must
        # strictly exceed E so no evicted key can reach the cut.
        .where(
            F.when(
                (F.col("_max_under") == 0) | (F.col("_kth") > F.col("_max_under")),
                F.lit(True),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("heavy_hitters_exact_topk: k-th count "),
                        F.col("_kth").cast("string"),
                        F.lit(" does not exceed total MG eviction error "),
                        F.col("_max_under").cast("string"),
                        F.lit(" — top-k not provably exact; increase capacity"),
                    )
                ).cast("boolean")
            )
        )
    )
    return guarded.select(key_col, out_col).orderBy(
        F.col(out_col).desc(), F.col(key_col).asc()
    )


def _mg_summaries_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-partition Misra–Gries summaries per GROUP: rows
    (group, key, cnt, err) — ≤ ``cap`` counter rows per (partition, group)
    plus one NULL-key marker row per (partition, group) carrying that
    group's accumulated eviction error in that partition. Memory per
    partition is groups-present × cap counters: bounded when the group
    column is low-cardinality (languages, sources, event types — the
    intended grain; for high-cardinality groups use a plain groupBy, whose
    shuffle is then no larger than this sketch's candidate set anyway).
    ``weight_col`` follows the global variant's contract: an integer,
    NON-NEGATIVE measure (enforced in the fold), counters accumulate weight
    sums, and the MG guarantee reads "count" as "total weight"."""
    if cap < 1:
        raise ValueError("capacity must be >= 1")
    df = df.where(F.col(key_col).isNotNull() & F.col(group_col).isNotNull())
    if weight_col is not None:
        df = df.where(F.col(weight_col).isNotNull())

    def summarize(batches):
        import pandas as pd

        counters: dict = {}  # group -> {key: cnt}
        errs: dict = {}  # group -> err
        for pdf in batches:
            if pdf.shape[1] == 3:
                if (pdf.iloc[:, 2] < 0).any():
                    bad = pdf.iloc[:, 2].min()
                    raise ValueError(
                        f"heavy_hitters weight_col must be non-negative "
                        f"(found {bad}); exclude or split negative-measure "
                        "rows before sketching"
                    )
                vc = pdf.groupby(
                    [pdf.columns[0], pdf.columns[1]], sort=False
                )[pdf.columns[2]].sum()
            else:
                vc = pdf.groupby([pdf.columns[0], pdf.columns[1]], sort=False).size()
            for (g, key), cnt in vc.items():
                c = counters.setdefault(g, {})
                c[key] = c.get(key, 0) + int(cnt)
            for g, c in counters.items():
                if len(c) > cap:
                    cut = sorted(c.values(), reverse=True)[cap]
                    counters[g] = {k_: v - cut for k_, v in c.items() if v > cut}
                    errs[g] = errs.get(g, 0) + cut
        rows = []
        for g, c in counters.items():
            rows.extend({"group": g, "key": k_, "cnt": v, "err": 0} for k_, v in c.items())
        for g in set(counters) | set(errs):
            rows.append({"group": g, "key": None, "cnt": 0, "err": errs.get(g, 0)})
        yield pd.DataFrame(rows, columns=["group", "key", "cnt", "err"])

    g_type = df.schema[group_col].dataType.simpleString()
    k_type = df.schema[key_col].dataType.simpleString()
    cols = [F.col(group_col).alias("group"), F.col(key_col).alias("key")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("w"))
    return df.select(*cols).mapInPandas(
        summarize, schema=f"group {g_type}, key {k_type}, cnt long, err long"
    )


def heavy_hitters_exact_topk_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 10,
    capacity: int = 256,
    max_groups: int = 10_000,
    weight_col: str | None = None,
) -> DataFrame:
    """EXACT top-k most frequent ``key_col`` values PER ``group_col`` — the
    grouped face of :func:`heavy_hitters_exact_topk` (top tokens per
    language, hot URLs per domain, heavy users per tenant), with the same
    two-level refusal proof applied group-wise.

    Pass 1 sketches every group's keys in bounded per-partition state; for
    each group g this yields a candidate set and a total eviction error E_g
    with the MG guarantee that any key absent from g's candidates has true
    count ≤ E_g. Pass 2 exact-counts the candidates (broadcast semi-join on
    (group, key), map-side partial aggregation) and ranks within each group.
    Exactness per group requires E_g == 0, or k candidates whose k-th exact
    count strictly exceeds E_g; the short-candidate direction is checked
    eagerly at plan build (per group, from the persisted summaries — raises
    ``ValueError`` naming the offending groups), the k-th-count direction
    in-plan via ``raise_error``. ``max_groups`` bounds the driver-side gate
    state (the operators/selection.py limit-guard convention). Returns
    (group_col, key_col, n_occurrences) ordered by group, count desc, key —
    deterministic and replayable by any exact SQL engine.

    With ``weight_col`` (integer, NON-NEGATIVE — the global variant's
    contract, enforced in the sketch fold) the same machinery answers top-k
    by TOTAL MEASURE per group — revenue by part per brand, spend by user
    per tenant — and the output column is ``weight_sum``."""
    from pyspark.sql import Window as W

    # localCheckpoint, not persist (ADVICE r12): the summaries must be
    # materialized once and shared by the gate collect, the bound, and the
    # candidate set (snapshot consistency — a recompute could re-batch rows
    # and produce a DIFFERENT valid MG summary for each consumer), but a
    # CacheManager entry from .persist() lives until an explicit unpersist
    # nobody is positioned to call after the caller executes the plan.
    # Checkpoint blocks are instead freed by the ContextCleaner as soon as
    # the returned plan is garbage-collected. Grouped summaries can reach
    # groups × capacity × partitions rows, so they are NOT collected to the
    # driver the way the global variant's are; the eager gate below is
    # limit-guarded by max_groups (operators/selection.py convention). As
    # with the global variant, the confirm pass re-scans df at execution
    # time: df must be a static batch source between plan build and run.
    out_col = "n_occurrences" if weight_col is None else "weight_sum"
    measure = (
        F.count("*") if weight_col is None else F.sum(F.col(weight_col).cast("long"))
    ).alias(out_col)
    summaries = _mg_summaries_grouped(
        df, group_col, key_col, int(capacity), weight_col
    ).localCheckpoint(eager=True)
    gate = (
        summaries.groupBy("group")
        .agg(
            F.count_distinct("key").alias("n_cands"),
            F.coalesce(F.sum("err"), F.lit(0)).alias("err"),
        )
        .where((F.col("n_cands") < int(k)) & (F.col("err") > 0))
        .limit(int(max_groups))
        .collect()
    )
    if gate:
        worst = ", ".join(f"{r['group']}({r['n_cands']} cands, err {r['err']})" for r in gate[:5])
        raise ValueError(
            f"heavy_hitters_exact_topk_grouped: {len(gate)} group(s) kept fewer "
            f"than k={int(k)} candidates with nonzero eviction error ({worst}"
            f"{', …' if len(gate) > 5 else ''}) — top-k not provably exact; "
            "increase capacity"
        )
    bound = summaries.where(F.col("key").isNull()).groupBy("group").agg(
        F.sum("err").alias("_max_under")
    )
    cands = summaries.where(F.col("key").isNotNull()).select("group", "key").distinct()
    exact = (
        df.join(
            F.broadcast(
                cands.withColumnRenamed("group", group_col).withColumnRenamed("key", key_col)
            ),
            [group_col, key_col],
        )
        .groupBy(group_col, key_col)
        .agg(measure)
    )
    w_rank = W.partitionBy(group_col).orderBy(
        F.col(out_col).desc(), F.col(key_col).asc()
    )
    topk = exact.withColumn("_rn", F.row_number().over(w_rank)).where(F.col("_rn") <= int(k))
    kth = F.min(out_col).over(W.partitionBy(group_col))
    guarded = (
        topk.join(bound.withColumnRenamed("group", group_col), group_col, "left")
        .withColumn("_max_under", F.coalesce(F.col("_max_under"), F.lit(0)))
        .withColumn("_kth", kth)
        .where(
            F.when(
                (F.col("_max_under") == 0) | (F.col("_kth") > F.col("_max_under")),
                F.lit(True),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("heavy_hitters_exact_topk_grouped: group "),
                        F.col(group_col).cast("string"),
                        F.lit(" k-th count "),
                        F.col("_kth").cast("string"),
                        F.lit(" does not exceed its eviction error "),
                        F.col("_max_under").cast("string"),
                        F.lit(" — top-k not provably exact; increase capacity"),
                    )
                ).cast("boolean")
            )
        )
    )
    return guarded.select(group_col, key_col, out_col).orderBy(
        group_col, F.col(out_col).desc(), F.col(key_col).asc()
    )


def hll_rollup(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Mergeable distinct-count state at rest: one Datasketches HLL sketch
    (binary, ~2^lgk bytes max) per group over ``value_col``.

    The 100 TB pattern this enables: sketch each day/partition ONCE at ingest
    (cost: one scan), persist the (keys..., user_sketch, n_rows) rows, and
    answer "distinct users for any key over any day range" by merging a
    handful of kilobyte sketches (:func:`hll_rollup_merge`) instead of
    re-shuffling every raw id — the same maintenance shape as
    operators/rollup.py's incremental_rollup, extended to the one aggregate
    (count distinct) plain partials can't merge.

    HLL union is register-wise max, so merge ∘ split ≡ sketching the whole
    input directly — bit-identical estimates, asserted in tests and checked
    against the oracle-backed events_hll_rollup_bound row (pytest +
    driver_sim; registered past the driver's 50-row gate window).
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup_merge(parts: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Union N hll_rollup outputs (e.g. per-day states) into one rollup at the
    same key grain: sketches merge with hll_union_agg (register-wise max),
    row counts add. Cost ∝ number of STATE rows, never the raw data."""
    from functools import reduce

    if not parts:
        raise ValueError("hll_rollup_merge needs at least one rollup part")
    all_parts = reduce(lambda a, b: a.unionByName(b), parts)
    return all_parts.groupBy(*keys).agg(
        F.hll_union_agg("hll").alias("hll"),
        F.sum("n_rows").alias("n_rows"),
    )


def hll_estimate(rollup: DataFrame, estimate_col: str = "n_distinct") -> DataFrame:
    """Finalize a rollup: replace the binary sketch with its cardinality
    estimate (standard error ~1.04/sqrt(2^lgk): ~0.8% at the default lgk=14)."""
    return rollup.withColumn(
        estimate_col, F.hll_sketch_estimate("hll").cast("long")
    ).drop("hll")


def kmv_sketch(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """K-minimum-values (theta) sketch per key group: the k smallest
    normalized hashes of ``value_col``'s distinct values, as a sorted
    ``array<double>`` — the set-operation sketch HLL isn't.

    HLL state (hll_rollup) answers distinct counts of UNIONS only; KMV keeps
    an actual uniform SAMPLE of the distinct values (Bar-Yossef et al. 2002 /
    the Datasketches theta framework), so INTERSECTIONS and overlaps estimate
    directly: cut both sketches at theta = min of their k-th values and
    intersect the retained samples (:func:`kmv_intersection`). Estimate for a
    full sketch is (k-1)/theta, relative error ~1/sqrt(k-2) (~3% at k=1024);
    a group with fewer than k distinct values keeps them ALL and is exact.

    Build shape (the heavy_hitters pattern): values hash JVM-side, one
    Arrow-batched mapInPandas pass keeps a bounded k-smallest set per group
    per partition, then one tiny shuffle merges <= k x n_partitions doubles
    per group — raw values never shuffle. State at rest: 8k bytes/group max,
    mergeable forever (:func:`kmv_merge`).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    key_fields = [df.schema[c] for c in keys]
    out_schema = StructType(
        [*key_fields, StructField("kmv", ArrayType(DoubleType()), False)]
    )
    # uniform (0,1): a 64-bit (or 52-bit) hash scaled into the unit interval.
    # double's 53-bit mantissa is plenty for a rank statistic.
    # NULL values are excluded (SQL count-distinct semantics; xxhash64 would
    # otherwise fold every NULL onto the seed hash as one phantom value)
    #
    # hash_fn="xxhash64" (default): fastest, JVM-native, engine-specific.
    # hash_fn="md5_52": first 13 md5 hex digits of the value's string form as
    # a 52-bit integer, scaled by 2^-52 — exactly representable in a double
    # and byte-reproducible in any engine with md5 (the _cm_cell / count-min
    # convention), e.g. DuckDB:
    #   CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 13)) AS BIGINT)
    #     / 4503599627370496.0
    # Because the sketch is a pure SET function of the hashed values (k
    # smallest distinct — no partition- or order-dependence), md5_52 makes
    # every downstream estimate (kmv_distinct, kmv_set_estimates) a value an
    # external SQL engine replays bit-for-bit: sketch rows graduate from
    # bound-checked to VALUE-checked.
    if hash_fn == "xxhash64":
        u = (F.xxhash64(value_col) / F.lit(2.0**64)) + F.lit(0.5)
    elif hash_fn == "md5_52":
        u = F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 13), 16, 10
        ).cast("double") / F.lit(2.0**52)
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64 | md5_52)")
    hashed = df.where(F.col(value_col).isNotNull()).select(*keys, u.alias("__u"))
    kk = int(k)
    key_names = list(keys)

    def _partial(batches):
        # self-contained closure (imports inside): executors never need the
        # repo importable
        import numpy as np
        import pandas as pd

        state: dict[tuple, np.ndarray] = {}
        for batch in batches:
            for grp, sub in batch.groupby(key_names, dropna=False, sort=False):
                g = grp if isinstance(grp, tuple) else (grp,)
                u = sub["__u"].to_numpy()
                prev = state.get(g)
                merged = np.unique(u if prev is None else np.concatenate([prev, u]))
                state[g] = merged[:kk] if merged.size > kk else merged
        rows = [
            {**dict(zip(key_names, g)), "kmv": arr.tolist()}
            for g, arr in state.items()
        ]
        yield pd.DataFrame(rows, columns=[*key_names, "kmv"])

    partials = hashed.mapInPandas(_partial, out_schema)
    return kmv_merge([partials], keys, k)


def kmv_merge(parts: Sequence[DataFrame], keys: Sequence[str], k: int = 1024) -> DataFrame:
    """Union KMV states at the same key grain: distinct-union the retained
    values and keep the k smallest — exactly the sketch of the unioned
    inputs, so per-increment sketches merge at read time (the hll_rollup /
    bloom_merge / minhash-index maintenance contract)."""
    from functools import reduce

    if not parts:
        raise ValueError("kmv_merge needs at least one part")
    u = reduce(lambda a, b: a.unionByName(b), parts)
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))), 1, int(k)
    )
    return u.groupBy(*keys).agg(merged.alias("kmv"))


def _kmv_theta(arr, k: int):
    """Cut threshold: the k-th smallest value for a full sketch, else 1.0
    (an undersized sketch retains every distinct value)."""
    return F.when(F.size(arr) >= k, F.element_at(arr, k)).otherwise(F.lit(1.0))


def kmv_distinct(sketch: DataFrame, k: int = 1024, estimate_col: str = "n_distinct") -> DataFrame:
    """Finalize: distinct-count estimate per group — exact count when the
    group kept fewer than k values, else (k-1)/theta."""
    arr = F.col("kmv")
    est = F.when(F.size(arr) < k, F.size(arr).cast("double")).otherwise(
        F.lit(k - 1) / _kmv_theta(arr, k)
    )
    return sketch.withColumn(estimate_col, F.round(est).cast("long")).drop("kmv")


def kmv_set_estimates(prefix_a: str = "a", prefix_b: str = "b", k: int = 1024):
    """Column pair (n_intersect_est, n_union_est) over a joined row carrying
    two sketches as ``{prefix_a}_kmv`` / ``{prefix_b}_kmv`` (rename before
    the pair join). Pure array expressions (JVM-side): cut both retained
    samples at theta = min(theta_a, theta_b); |A ∩ B| ~ |cut(A) ∩ cut(B)| /
    theta and |A ∪ B| from the merged sketch. Error ~1/sqrt(k) on the union
    scale — intersections much smaller than theta*k carry proportionally
    wider relative error (the documented theta-sketch caveat)."""
    ka, kb = F.col(f"{prefix_a}_kmv"), F.col(f"{prefix_b}_kmv")
    theta = F.least(_kmv_theta(ka, k), _kmv_theta(kb, k))
    cut_a = F.filter(ka, lambda v: v < theta)
    cut_b = F.filter(kb, lambda v: v < theta)
    inter = F.size(F.array_intersect(cut_a, cut_b)) / theta
    union_arr = F.slice(F.array_sort(F.array_distinct(F.concat(ka, kb))), 1, int(k))
    union_est = F.when(
        F.size(union_arr) < k, F.size(union_arr).cast("double")
    ).otherwise(F.lit(k - 1) / F.element_at(union_arr, int(k)))
    return (
        F.round(inter).cast("long").alias("n_intersect_est"),
        F.round(union_est).cast("long").alias("n_union_est"),
    )


def _cm_cell(key_col, depth_j: int, width: int, salt: str):
    """Row j's cell index for a key: md5-derived, cross-engine reproducible —
    DuckDB: CAST(('0x' || substr(md5(v || '<salt>:<j>'), 1, 8)) AS BIGINT) % width."""
    h = F.md5(F.concat(key_col.cast("string"), F.lit(f"{salt}:{depth_j}")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast("int")


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
    salt: str = "cm",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
    summary: the count-min sketch and its applications", J. Algorithms 2005)
    as a TABLE of (depth_j, cell, cnt) — ``depth`` md5-derived hash rows of
    ``width`` counters. Complements Misra–Gries: MG surfaces the top keys
    with a deterministic undercount bound; CM answers a frequency query for
    ANY key, never undercounting, overcounting by ≤ εN = (e/width)·N with
    probability 1−(1/2)^depth per query.

    Everything is linear algebra over counters, so the sketch is built with
    pure Column expressions (one explode-free map pass emitting ``depth``
    cells per row, one groupBy of ≤ depth×width result rows — map-side
    combined) and two sketches MERGE by summing matching cells
    (:func:`count_min_merge`) — partials per day/partition compose exactly.
    md5 cell arithmetic makes the whole sketch byte-reproducible in DuckDB,
    so the registry row value-checks the guarantee itself, not just row
    counts. ``weight_col`` generalizes from counts to summed weights.
    NULL keys are excluded (a NULL never equals a lookup value — the
    bloom_manifest convention; without the filter they'd accumulate in a
    dead NULL cell no probe can reach)."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    cells = df.where(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth_j"),
                        _cm_cell(F.col(key_col), j, width, salt).alias("cell"),
                        w.alias("w"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("s")
    )
    return cells.groupBy(F.col("s.depth_j").alias("depth_j"), F.col("s.cell").alias("cell")).agg(
        F.sum("s.w").alias("cnt")
    )


def count_min_merge(parts: Sequence[DataFrame]) -> DataFrame:
    """Sum matching cells across sketch parts (built with identical
    width/depth/salt): CM is linear, so merge ∘ split ≡ sketching the whole
    input — bit-exact, pytest-pinned. Cost ∝ depth×width state rows."""
    from functools import reduce

    if not parts:
        raise ValueError("count_min_merge needs at least one sketch part")
    allp = reduce(lambda a, b: a.unionByName(b), parts)
    return allp.groupBy("depth_j", "cell").agg(F.sum("cnt").alias("cnt"))


def count_min_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
    salt: str = "cm",
) -> DataFrame:
    """Point-frequency estimates for a batch of keys: each key joins its
    ``depth`` cells (the sketch is broadcast — ≤ depth×width rows) and takes
    the MIN counter. Returns (key, est). est ≥ true count always; the εN
    overcount bound is what the registry row gates. Missing cells count 0
    (a key hashing only to untouched cells has true frequency 0)."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth_j"),
                        _cm_cell(F.col(key_col), j, width, salt).alias("cell"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.depth_j", "p.cell")
    joined = probes.join(F.broadcast(sketch), ["depth_j", "cell"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0.0))).alias("est")
    )
