"""Driver-checkable error bounds for the estimate queries.

Historically the registry's sketch/ANN rows were rows-only — engine-specific
estimates DuckDB cannot reproduce bit-for-bit — and the queries here closed
that external-verification gap the way VERDICT r6 item #6 prescribed: each
computes BOTH the estimate and the exact answer in Spark, reduces them to
"is the error inside the documented bound?" booleans keyed by data-derived
rows, and pairs that with a DuckDB oracle that asserts the bound holds
(``TRUE``) for the same keys. A drifting sketch or a recall regression flips
a boolean, the value hash mismatches, and the row fails.

The estimate rows themselves have since been upgraded one family at a time
(deterministic first-k IVF/SQ routes in r11, PQ spread-codebook replays and
md5_52 KMV set-function sketches in r12, the exact-confirmed heavy hitters
in r12b, and the reshaped ``events_sketch_aggs`` — in-query envelope
booleans plus the exact group count — in r13), so every registry row is now
value-checked and the bound rows here are COMPANIONS, not stand-ins: the
recall anchor ``ann_ivfpq_recall_bound`` stays inside the driver's 50-row
gate window (queries/__init__.py:GATE_WINDOW), while the rest remain
registered and pytest/driver_sim-oracled past it (``sketch_error_bounds``
was displaced in r13b because its exact checks now live inside the reshaped
sketch row; ``events_hll_rollup_bound``'s merge∘split≡direct invariant is
also pinned by tests/test_sketches.py).

These rows cost an exact pass over the same data as the estimate, so they are
gate/CI artifacts: at 100 TB you run the estimate queries alone and rely on
the bounds verified here at test scale (the bounds are scale-free: HLL rsd and
KLL rank error are sketch parameters, Misra-Gries undercount is returned with
every row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.queries import increment_of, query
from parqueryd_spark.sources.parquet import load_table


@query(
    "sketch_error_bounds",
    oracle="""
    SELECT event_type, TRUE AS users_ok, TRUE AS p50_ok, TRUE AS p95_ok
    FROM events
    GROUP BY event_type
    """,
)
def sketch_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_sketch_aggs' estimates gated through the oracle as error bounds.

    Per event_type, one aggregate computes the HLL++ distinct-user estimate
    (rsd 2%) next to the exact count-distinct, and the KLL-style
    percentile_approx(p, accuracy=10000) next to exact quantiles at p±0.02.
    Emitted columns are the bound checks themselves:

    - users_ok: |approx - exact| <= 6% * exact (3 sigma of the 2% rsd);
    - p50_ok/p95_ok: the approximate percentile lies between the exact
      interpolated quantiles at p-0.02 and p+0.02 — generous cover for the
      1/accuracy = 1e-4 rank-error guarantee plus interpolation slack.

    The oracle groups the same table and asserts TRUE per bound, so the
    driver's hash compare fails iff a sketch leaves its documented envelope.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_au"),
        F.count_distinct("user_id").alias("_nu"),
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95)), 10000).alias("_ap"),
        F.percentile(
            "value", F.array(F.lit(0.48), F.lit(0.52), F.lit(0.93), F.lit(0.97))
        ).alias("_ep"),
    )
    return agg.select(
        "event_type",
        (F.abs(F.col("_au") - F.col("_nu")) <= 0.06 * F.col("_nu")).alias("users_ok"),
        F.col("_ap")[0].between(F.col("_ep")[0], F.col("_ep")[1]).alias("p50_ok"),
        F.col("_ap")[1].between(F.col("_ep")[2], F.col("_ep")[3]).alias("p95_ok"),
    )


@query(
    "ann_ivf_recall_bound",
    oracle="""
    SELECT count(DISTINCT vec_id) AS n_queries, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def ann_ivf_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF route's approximation quality gated through the oracle.

    Runs the same IVF configuration as the estimate rows (n_centroids=16,
    nprobe=4, k=5, queries vec_id<5) against the exhaustively-probed
    nprobe=16 run — which the in-window ann_ivf_exhaustive_topk row proves
    equal to exact brute force — and reduces to overall recall@5 >= 0.8.
    The oracle derives n_queries from the data and asserts recall_ok, so an
    IVF recall regression is a driver hash failure, not just a pytest one.

    Both sides run over the PUBLISHED centroid-partitioned index
    (queries/similarity.py:served_ivf_index) — the same serving route as
    ann_ivf_index_topk — so this in-gate-window row gates the 100 TB index
    path itself: a publish/partition/pruning bug surfaces here as a recall or
    row-count failure (VERDICT r7 item #3).
    """
    from parqueryd_spark.operators.similarity import ivf_search
    from parqueryd_spark.queries.similarity import served_ivf_index

    index, cents = served_ivf_index(spark, sf_dir, n_centroids=16)
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    exact = ivf_search(index, cents, qs, nprobe=16, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_search(index, cents, qs, nprobe=4, k=5).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    joined = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return joined.agg(
        F.count_distinct("query_id").alias("n_queries"),
        ((F.coalesce(F.sum("hit"), F.lit(0)) / F.count(F.lit(1))) >= 0.8).alias("recall_ok"),
    )


@query(
    "ann_pq_recall_bound",
    # n_queries is data-derived (VERDICT r7 item #6): the Spark side counts
    # distinct query ids over qs = orderBy(vec_id).limit(8), i.e. min(8, |emb|)
    oracle="""
    SELECT CAST(LEAST(8, count(*)) AS BIGINT) AS n_queries, TRUE AS recall_ok
    FROM embeddings
    """,
)
def ann_pq_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_pq_topk's approximation quality gated through the oracle.

    Recall@10 of the refined PQ path (ADC shortlist with refine=8, exact
    re-rank) against exact brute force over the same 8 query vectors,
    reduced to recall >= 0.7. refine=8 rather than the pytest run's refine=4
    because this row must hold at every test SF. Since round 12 this row
    measures the SAME deterministic spread-codebook route (16x32) the
    value-checked ann_pq_topk serves (measured recall: 0.88/0.86/0.78 at
    sf0.001/0.01/0.1 — codebooks coarsen as the corpus grows, the standard
    PQ tradeoff); the seeded-kmeans production trainer keeps its own recall
    pins in tests/test_operators.py. The oracle asserts the claim, so PQ
    quality regressions fail at the driver.
    """
    from parqueryd_spark.operators.quantization import pq_topk
    from parqueryd_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.orderBy("vec_id").limit(8)
    exact = brute_force_topk(emb, qs, k=10).select("query_id", "neighbor_id")
    approx = pq_topk(emb, qs, dim=64, k=10, refine=8, k_codes=32, codebook="spread").select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    joined = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return joined.agg(
        F.count_distinct("query_id").alias("n_queries"),
        ((F.coalesce(F.sum("hit"), F.lit(0)) / F.count(F.lit(1))) >= 0.7).alias("recall_ok"),
    )


@query(
    "heavy_hitter_bound",
    # n_tokens is data-derived (VERDICT r7 item #6): heavy_hitters returns
    # min(k=20, distinct tokens) rows (MG retains every token exactly when
    # distinct <= capacity, and >= k counters otherwise). The oracle
    # re-tokenizes in DuckDB with the same single-space convention as
    # operators/text.py:tokens.
    oracle="""
    SELECT CAST(LEAST(20, count(DISTINCT token)) AS BIGINT) AS n_tokens,
           TRUE AS bounds_ok
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    """,
)
def heavy_hitter_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_heavy_hitter_tokens' Misra-Gries contract gated through the oracle.

    Joins the sketch's top-20 (est_count, max_undercount) to the exact token
    counts and checks the deterministic MG guarantee for every returned row:
    est_count <= true_count <= est_count + max_undercount. This is a hard
    invariant of the algorithm (not a probabilistic bound), so the oracle
    asserts it unconditionally; a counter-merge bug becomes a driver hash
    failure.
    """
    from parqueryd_spark.operators import text as T
    from parqueryd_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokens("text")).alias("token"))
    hh = heavy_hitters(toks, "token", k=20, capacity=1024)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_count"))
    joined = hh.join(exact, "token", "left")
    ok = (F.col("est_count") <= F.col("true_count")) & (
        F.col("true_count") <= F.col("est_count") + F.col("max_undercount")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.min(F.coalesce(ok, F.lit(False))).alias("bounds_ok"),
    )


@query(
    "events_hll_rollup_bound",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS merge_ok,
           TRUE AS err_ok
    FROM events
    GROUP BY event_type
    """,
    bench=True,
)
def events_hll_rollup_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable HLL distinct-count rollup (operators/sketches.py:
    hll_rollup family) gated through the oracle.

    Splits events at 2024-01-16, sketches each half independently, merges the
    binary sketches, and checks two claims per event_type next to the exact
    count-distinct (which the oracle also computes, so the exact pipeline is
    value-checked too):

    - merge_ok: merge-of-splits estimate == direct whole-input estimate (HLL
      union is register-wise max, so this must hold EXACTLY — a merge bug
      flips it). Version note (ADVICE r7): exact equality additionally
      depends on Datasketches' HLL mode promotion (list->set->dense) being
      deterministic for union-of-parts vs direct sketching, which holds for
      the pinned pyspark/datasketches build; if an upgrade ever flips ONLY
      merge_ok here while tests/test_sketches.py's register-max property
      still passes, suspect mode-promotion drift, not a merge bug;
    - err_ok: |estimate - exact| <= 3% * exact (lgk=14 => ~0.8% standard
      error; 3% is the 3-sigma envelope with slack).

    This is the state-at-rest pattern for 100 TB distinct counts: sketch each
    ingest partition once, persist kilobyte sketches, answer any-range
    distinct queries by merging state instead of re-shuffling raw ids.
    """
    from parqueryd_spark.operators.sketches import (
        hll_estimate,
        hll_rollup,
        hll_rollup_merge,
    )

    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    merged = hll_estimate(
        hll_rollup_merge(
            [
                hll_rollup(ev.where(F.col("ts") < split), ["event_type"], "user_id"),
                hll_rollup(ev.where(F.col("ts") >= split), ["event_type"], "user_id"),
            ],
            ["event_type"],
        ),
        "est_merged",
    )
    direct = hll_estimate(
        hll_rollup(ev, ["event_type"], "user_id"), "est_direct"
    ).select("event_type", "est_direct")
    exact = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_users"))
    return (
        merged.join(direct, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type",
            "n_users",
            (F.col("est_merged") == F.col("est_direct")).alias("merge_ok"),
            (F.abs(F.col("est_direct") - F.col("n_users")) <= 0.03 * F.col("n_users")).alias(
                "err_ok"
            ),
        )
    )


@query(
    "events_kmv_overlap_bound",
    oracle="""
    WITH ut AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS t1, b.event_type AS t2,
           count(*) AS n_common,
           TRUE AS inter_ok, TRUE AS union_ok
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def events_kmv_overlap_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV theta-sketch set operations gated as error bounds: per
    event-type PAIR, the sketch intersection/union estimates
    (operators/sketches.py kmv_sketch / kmv_set_estimates, k=128) next to
    the exact distinct-user overlap, reduced to within-25%/within-15%
    booleans (>= 3 sigma of the ~8.9% rel error at k=128; at sf0.01 the 150
    distinct users per type exceed k, so the ESTIMATION path — not the
    undersized exact path — is what's checked). The oracle recomputes the
    exact overlaps and asserts TRUE, so a sketch regression flips a boolean
    and fails the hash."""
    from parqueryd_spark.operators.sketches import kmv_set_estimates, kmv_sketch

    k = 128
    ev = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(ev, ["event_type"], "user_id", k=k)
    a = sk.select(F.col("event_type").alias("t1"), F.col("kmv").alias("a_kmv"))
    b = sk.select(F.col("event_type").alias("t2"), F.col("kmv").alias("b_kmv"))
    i_est, u_est = kmv_set_estimates("a", "b", k)
    pairs = a.join(b, F.col("t1") < F.col("t2")).select("t1", "t2", i_est, u_est)

    ut = ev.select("event_type", "user_id").distinct()
    exact_pair = (
        ut.alias("x")
        .join(
            ut.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("t1"), F.col("y.event_type").alias("t2")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    per_type = ut.groupBy("event_type").agg(F.count_distinct("user_id").alias("n"))
    exact = (
        exact_pair.join(per_type.withColumnRenamed("event_type", "t1"), "t1")
        .withColumnRenamed("n", "n1")
        .join(per_type.withColumnRenamed("event_type", "t2"), "t2")
        .withColumnRenamed("n", "n2")
        .withColumn("n_union", F.col("n1") + F.col("n2") - F.col("n_common"))
    )
    return pairs.join(exact, ["t1", "t2"]).select(
        "t1",
        "t2",
        "n_common",
        (
            F.abs(F.col("n_intersect_est") - F.col("n_common"))
            <= 0.25 * F.col("n_common")
        ).alias("inter_ok"),
        (F.abs(F.col("n_union_est") - F.col("n_union")) <= 0.15 * F.col("n_union")).alias(
            "union_ok"
        ),
    )


@query(
    "events_countmin_freq",
    oracle="""
    WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    ks AS (SELECT DISTINCT user_id FROM events WHERE user_id % 5 = 0),
    cells AS (
      SELECT j,
             CAST(CAST(('0x' || substr(md5(e.user_id::VARCHAR || 'cm:' || j::VARCHAR), 1, 8)) AS BIGINT) % 256 AS INT) AS cell
      FROM events e CROSS JOIN js
    ),
    sketch AS (SELECT j, cell, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY j, cell),
    probes AS (
      SELECT ks.user_id, js.j,
             CAST(CAST(('0x' || substr(md5(ks.user_id::VARCHAR || 'cm:' || js.j::VARCHAR), 1, 8)) AS BIGINT) % 256 AS INT) AS cell
      FROM ks CROSS JOIN js
    ),
    est AS (
      SELECT p.user_id, CAST(MIN(COALESCE(s.c, 0)) AS BIGINT) AS cm_est
      FROM probes p LEFT JOIN sketch s ON s.j = p.j AND s.cell = p.cell
      GROUP BY p.user_id
    ),
    exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt FROM events GROUP BY user_id)
    SELECT est.user_id AS user_id, exact_cnt, cm_est,
           cm_est >= exact_cnt AS never_under
    FROM est JOIN exact USING (user_id)
    """,
)
def events_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency estimates (operators/sketches.py:
    count_min_sketch/query — depth=4 × width=256 md5-derived counter cells,
    linear and mergeable) probed for every 5th user next to the exact
    per-user counts. The md5 cell arithmetic is byte-reproducible in DuckDB,
    so the oracle rebuilds the ENTIRE sketch and the driver value-checks the
    estimates themselves — plus the never-undercount hard guarantee as a
    column. The εN overcount bound (ε = e/width, prob 1−2^-depth per key)
    and merge∘split ≡ direct are pytest-pinned (tests/test_sketches.py)."""
    from parqueryd_spark.operators.sketches import count_min_query, count_min_sketch

    ev = load_table(spark, sf_dir, "events")
    sk = count_min_sketch(ev, "user_id", width=256, depth=4)
    # filter BEFORE distinct: the modulo predicate can't reach the parquet
    # scan (expression predicate), but applying it pre-aggregation cuts the
    # distinct's shuffle 5x — the lint's unpushed-filter WARN was this line
    keys = ev.select("user_id").filter(F.col("user_id") % 5 == 0).distinct()
    est = count_min_query(sk, keys, "user_id", width=256, depth=4).select(
        "user_id", F.col("est").cast("bigint").alias("cm_est")
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return est.join(exact, "user_id").select(
        "user_id",
        "exact_cnt",
        "cm_est",
        (F.col("cm_est") >= F.col("exact_cnt")).alias("never_under"),
    )


_CM_STATE_CACHE: dict = {}
_CM_STATE_LOCK = __import__("threading").Lock()


def _served_cm_state(spark: SparkSession, sf_dir: str) -> str:
    """Published per-batch Count-Min state for events.user_id, built ONCE
    per (process, sf_dir) into a temp dir: three disjoint increments
    (event_id mod 3) each sketched with count_min_sketch (width=256,
    depth=4, md5 cells) into the EXACT ``batch=<id>`` parquet layout
    streaming/rollup.py:stream_maintain_countmin writes, so the serving
    read path below is the streaming reader itself."""
    import os
    import tempfile

    from parqueryd_spark.operators.sketches import count_min_sketch

    key = os.path.abspath(sf_dir)
    with _CM_STATE_LOCK:
        path = _CM_STATE_CACHE.get(key)
        if path is None or not os.path.isdir(path):
            path = tempfile.mkdtemp(prefix="parqueryd_spark_cm_")
            ev = load_table(spark, sf_dir, "events")
            for i in range(3):
                count_min_sketch(
                    ev.where(increment_of("event_id", i)),
                    "user_id",
                    width=256,
                    depth=4,
                ).write.mode("overwrite").parquet(os.path.join(path, f"batch={i}"))
            _CM_STATE_CACHE[key] = path
    return path


@query(
    "events_countmin_served",
    bench=True,
    oracle="""
    WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    ks AS (SELECT unnest(range(0, 1500, 5)) AS user_id),
    cells AS (
      SELECT j,
             CAST(CAST(('0x' || substr(md5(e.user_id::VARCHAR || 'cm:' || j::VARCHAR), 1, 8)) AS BIGINT) % 256 AS INT) AS cell
      FROM events e CROSS JOIN js
      WHERE e.user_id IS NOT NULL
    ),
    sketch AS (SELECT j, cell, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY j, cell),
    probes AS (
      SELECT ks.user_id, js.j,
             CAST(CAST(('0x' || substr(md5(ks.user_id::VARCHAR || 'cm:' || js.j::VARCHAR), 1, 8)) AS BIGINT) % 256 AS INT) AS cell
      FROM ks CROSS JOIN js
    )
    SELECT p.user_id AS user_id, CAST(MIN(COALESCE(s.c, 0)) AS BIGINT) AS cm_est
    FROM probes p LEFT JOIN sketch s ON s.j = p.j AND s.cell = p.cell
    GROUP BY p.user_id
    """,
)
def events_countmin_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point frequencies SERVED from standing published sketch
    state — the third member of the served-sketch trio (events_kmv_served:
    distinct counts, text_hh_served: top-k, here: any-key frequency). The
    probe keys are a FIXED literal set (user_id 0,5,...,1495 — independent
    of the data, so the serving plan touches NO raw table: it reads only
    the <= depth x width counter cells per batch through the streaming
    reader, streaming/rollup.py:read_countmin_estimates, which merges by
    plain cell sums — CM linearity makes merged-batches bit-identical to a
    one-shot sketch). Keys unseen at small SFs come back with their honest
    small-collision estimate (usually 0), exactly as the DuckDB replay
    computes. Plan-asserted raw-table-absent in tests/test_plans.py."""
    from parqueryd_spark.streaming.rollup import read_countmin_estimates

    path = _served_cm_state(spark, sf_dir)
    keys = spark.range(0, 1500, 5).select(F.col("id").alias("user_id"))
    est = read_countmin_estimates(spark, path, keys, "user_id", width=256, depth=4)
    return est.select("user_id", F.col("est").cast("bigint").alias("cm_est"))
