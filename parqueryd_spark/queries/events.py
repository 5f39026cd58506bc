"""Time-series / windowed aggregation over the events table — the batch
equivalents of the Structured Streaming operators in
:mod:`parqueryd_spark.streaming` (same plans minus the watermark; streaming
parity is asserted in tests/test_streaming.py with an availableNow trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parqueryd_spark.queries import increment_of, query
from parqueryd_spark.sources.parquet import load_table


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window x event_type. Same plan streams with
    readStream+withWatermark (streaming/windows.py). Registered through the
    merged ``events_windowed_aggs`` query; kept as a standalone function for
    the batch-vs-streaming parity tests."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("event_id").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30m slide): each event lands in 2 windows.
    Registered through ``events_windowed_aggs``; standalone for the streaming
    parity tests."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("event_id").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "events_windowed_aggs",
    oracle="""
    SELECT 'tumbling' AS kind, time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type, count(event_id) AS n_events, sum(value) AS sum_value
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS kind, window_start, CAST(NULL AS VARCHAR) AS event_type,
           count(event_id) AS n_events, sum(value) AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_id, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes') AS window_start,
             event_id, value FROM events
    )
    GROUP BY 2
    """,
    bench=True,
)
def events_windowed_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1h x event_type) + sliding (1h length, 30m slide) windowed
    aggregation as one tagged union (merged from two round-1 queries to fit
    the gate window). The sliding oracle is a union of two offset tumbling
    bucketings — each event lands in exactly 2 windows. Both plans stream
    unchanged with readStream+withWatermark (streaming/windows.py)."""
    tumbling = events_tumbling_window(spark, sf_dir).select(
        F.lit("tumbling").alias("kind"), "window_start", "event_type", "n_events", "sum_value"
    )
    sliding = events_sliding_window(spark, sf_dir).select(
        F.lit("sliding").alias("kind"),
        "window_start",
        F.lit(None).cast("string").alias("event_type"),
        "n_events",
        "sum_value",
    )
    return tumbling.unionByName(sliding)


@query(
    "events_gap_fill_rolling",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '1 hour', min(ts)) AS lo,
             time_bucket(INTERVAL '1 hour', max(ts)) AS hi
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour_start FROM bounds
    ), agg AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
             count(event_id) AS n_events, sum(value) AS sum_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), filled AS (
      SELECT s.hour_start,
             COALESCE(a.n_events, 0)    AS n_events,
             COALESCE(a.sum_value, 0.0) AS sum_value
      FROM spine s LEFT JOIN agg a ON a.hour_start = s.hour_start
    )
    SELECT hour_start, n_events, round(sum_value, 4) AS sum_value,
           round(avg(sum_value) OVER w, 4)     AS rolling_avg_3h,
           CAST(count(*) OVER w AS BIGINT)     AS n_in_window
    FROM filled
    WINDOW w AS (ORDER BY epoch_us(hour_start)
                 RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW)
    """,
)
def events_gap_fill_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling + value-based rolling window composed (merged from
    events_gap_filled_hourly + events_rolling_window_range to fit the gate
    window): a generated hourly spine (sequence + explode, tiny and
    broadcast) left-joined to the windowed purchase aggregate with empty
    hours zero-filled — then a trailing-3-hour rolling average over the
    filled series using a RANGE (value-based) frame. Both engines order the
    frame by integer MICROSECONDS (unix_micros / epoch_us), the convention
    every timestamp-RANGE query here uses (fixture timestamps carry
    fractional seconds; hour boundaries don't, but consistency is cheap)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.date_trunc("hour", F.max("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start")
    )
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("event_id").alias("n"), F.sum("value").alias("s"))
        .select(F.col("w.start").alias("hour_start"), "n", "s")
    )
    filled = spine.join(agg, "hour_start", "left").select(
        "hour_start",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("s"), F.lit(0.0)).alias("sum_value"),
    )
    w = W.orderBy(F.unix_micros("hour_start")).rangeBetween(-7_200_000_000, 0)
    return filled.select(
        "hour_start",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        F.round(F.avg("sum_value").over(w), 4).alias("rolling_avg_3h"),
        F.count("*").over(w).alias("n_in_window"),
    )


@query(
    "events_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*)   AS n_events,
           min(ts)    AS session_start,
           max(ts)    AS session_end,
           sum(value) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via gaps-and-islands window
    functions — deterministic and SQL-expressible, unlike session_window's
    struct output. One shuffle on user_id. The streaming twin
    (session_window + watermark) is exercised in tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_order)
    new_session = (
        F.when(prev_ts.isNull() | (F.col("ts").cast("double") - prev_ts.cast("double") > 1800), 1)
        .otherwise(0)
    )
    w_run = (
        W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = ev.select("user_id", "event_id", "ts", "value", new_session.alias("new_session")).withColumn(
        "session_id", F.sum("new_session").over(w_run).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum("value").alias("sum_value"),
    )


@query(
    "events_sketch_aggs",
    # The estimates themselves are Spark-internal (HLL++/KLL binary sketch
    # state no SQL engine replays), but the row is still VALUE-checked
    # (VERDICT r12 item #3): the deterministic columns are the exact group
    # count, and each estimate is reduced IN-QUERY to "inside its documented
    # envelope of the exact answer" — a boolean the oracle asserts TRUE.
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS users_ok, TRUE AS p50_ok, TRUE AS p95_ok
    FROM events
    GROUP BY event_type
    """,
)
def events_sketch_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per event_type, gated as in-query error bounds.

    One aggregate builds the HLL++ distinct-user sketch (rsd 2%) and a single
    KLL-style percentile_approx state (accuracy 10000) serving both p50 and
    p95, NEXT TO their exact twins, and emits the bound checks:

    - users_ok: |approx - exact| <= 6% * exact (3 sigma of the 2% rsd);
    - p50_ok/p95_ok: RANK-based (ADVICE r13 — the earlier "between the exact
      interpolated quantiles at p±0.02" envelope was unsound for small
      groups, where the interpolated band can exclude every actual element).
      percentile_approx returns an actual element v whose rank error is
      bounded by n/accuracy = 1e-4*n, so the sound check is on v's exact
      rank interval: count(x < v) <= (p+0.02)*n + 1 AND
      count(x <= v) >= (p-0.02)*n - 1 (the ±1 covers tie-block boundary
      rounding, making the bound valid for EVERY group size — at n=1 it
      degenerates to trivially true, which is correct: a single element
      always satisfies any rank tolerance). n here is the NON-NULL value
      count (ADVICE r14): percentile_approx and the rank counts both skip
      NULL values, so the bound normalizes by the same population — with
      count(*) the lower bound could spuriously fail on NULL-bearing data.

    The rank counts need v itself, so the plan is two passes over events
    (aggregate -> broadcast the per-type v back -> count comparisons); the
    exact-twin columns already forced a full pass, and at 100 TB you run
    the sketch side alone — fixed-size mergeable state per group instead of
    a distinct-shuffle of every user id — relying on the envelope verified
    here at gate scale (the bounds are sketch parameters, not data sizes,
    so they transfer). The raw-estimate projection stays pinned by
    tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        # the rank bounds compare against the NON-NULL value count (ADVICE
        # r14): percentile_approx and the rank counts both ignore NULL
        # values, so normalizing by count(*) would spuriously fail the
        # lower bound on data with NULL values
        F.count("value").alias("_nv"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_au"),
        F.count_distinct("user_id").alias("_nu"),
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95)), 10000).alias("_ap"),
    )
    # no broadcast HINT on the per-type aggregate: it is tiny (one row per
    # event type) so the estimate-driven planner broadcasts it anyway at any
    # sane scale, and an un-hinted join REVERTS to shuffle if event_type
    # cardinality ever explodes (the test_plans.py hint-force guard)
    ranks = (
        ev.join(agg.select("event_type", "_ap"), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") < F.col("_ap")[0]).cast("long")).alias("_lt50"),
            F.sum((F.col("value") <= F.col("_ap")[0]).cast("long")).alias("_le50"),
            F.sum((F.col("value") < F.col("_ap")[1]).cast("long")).alias("_lt95"),
            F.sum((F.col("value") <= F.col("_ap")[1]).cast("long")).alias("_le95"),
        )
    )
    n = F.col("_nv").cast("double")
    return agg.join(ranks, "event_type").select(
        "event_type",
        "n_events",
        (F.abs(F.col("_au") - F.col("_nu")) <= 0.06 * F.col("_nu")).alias("users_ok"),
        (
            (F.col("_lt50") <= 0.52 * n + 1) & (F.col("_le50") >= 0.48 * n - 1)
        ).alias("p50_ok"),
        (
            (F.col("_lt95") <= 0.97 * n + 1) & (F.col("_le95") >= 0.93 * n - 1)
        ).alias("p95_ok"),
    )


@query(
    "events_kmv_distinct",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
               / 4503599627370496.0 AS u
      FROM events
      WHERE user_id IS NOT NULL
    ),
    r AS (
      SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    ),
    agg AS (
      SELECT event_type, max(nd) AS nd,
             min(CASE WHEN rn = 128 THEN u END) AS theta
      FROM r GROUP BY event_type
    )
    SELECT event_type,
           CAST(round(CASE WHEN nd < 128 THEN CAST(nd AS DOUBLE)
                           ELSE 127.0 / theta END) AS BIGINT) AS n_distinct
    FROM agg
    """,
)
def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (theta) distinct-user sketch per event_type, VALUE-checked — not
    bound-checked: with ``hash_fn="md5_52"`` (operators/sketches.py
    kmv_sketch) the sketch is a pure SET function of public md5 hashes — k
    smallest 52-bit-prefix hashes of the distinct user ids, estimate
    (k-1)/theta — so DuckDB replays the ESTIMATE itself bit-for-bit (the
    count-min convention extended to distinct counting). Partitioning,
    merge order, and executor count cannot change the answer, which is what
    lets an approximate operator pass a hash-equality gate. k=128 < the 150
    distinct users per type at sf0.01, so the gate exercises the estimation
    branch, not the undersized exact branch. At 100 TB this is the
    distinct-count state you persist per segment and merge at read time
    (kmv_merge) — and unlike HLL (events_sketch_aggs, engine-internal and
    rows-only by design) it stays externally auditable."""
    from parqueryd_spark.operators.sketches import kmv_distinct, kmv_sketch

    k = 128
    ev = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(ev, ["event_type"], "user_id", k=k, hash_fn="md5_52")
    return kmv_distinct(sk, k=k)


@query(
    "events_kmv_incremental",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
               / 4503599627370496.0 AS u
      FROM events
      WHERE user_id IS NOT NULL
    ),
    r AS (
      SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    ),
    agg AS (
      SELECT event_type, max(nd) AS nd,
             min(CASE WHEN rn = 128 THEN u END) AS theta
      FROM r GROUP BY event_type
    )
    SELECT event_type,
           CAST(round(CASE WHEN nd < 128 THEN CAST(nd AS DOUBLE)
                           ELSE 127.0 / theta END) AS BIGINT) AS n_distinct
    FROM agg
    """,
)
def events_kmv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV MERGE path under the hash-equality oracle: the corpus is
    split into three disjoint increments (event_id mod 3 — a stand-in for
    daily partitions), each increment is sketched INDEPENDENTLY
    (kmv_sketch, md5_52), and the per-increment states are unioned with
    kmv_merge. The oracle is the SAME full-corpus replay as
    events_kmv_distinct: because a KMV sketch is the k smallest hashes of
    the distinct-value SET, merge-of-parts is bit-identical to sketching
    everything at once — the property that makes per-segment sketch state
    the 100 TB serving pattern (sketch each segment once at ingest, answer
    any range by merging kilobytes of state, never re-reading raw ids).
    This row pins that equivalence under the driver's value gate rather
    than a pytest alone."""
    from parqueryd_spark.operators.sketches import kmv_distinct, kmv_merge, kmv_sketch

    k = 128
    ev = load_table(spark, sf_dir, "events")
    parts = [
        kmv_sketch(
            ev.where(increment_of("event_id", i)),
            ["event_type"],
            "user_id",
            k=k,
            hash_fn="md5_52",
        )
        for i in range(3)
    ]
    return kmv_distinct(kmv_merge(parts, ["event_type"], k=k), k=k)


_KMV_STATE_CACHE: dict = {}
_KMV_STATE_LOCK = __import__("threading").Lock()


def _served_kmv_state(spark: SparkSession, sf_dir: str, k: int = 128) -> str:
    """Published per-batch KMV state for the events table, built ONCE per
    (process, sf_dir) into a temp dir — the `served_minhash_index`
    amortization posture applied to sketch state: three disjoint increments
    (event_id mod 3, a stand-in for daily partitions) each sketched with
    kmv_sketch (md5_52) into the EXACT ``batch=<id>`` parquet layout
    streaming/rollup.py:stream_maintain_kmv writes, so the serving read
    path below is the streaming reader itself."""
    import os
    import tempfile

    from parqueryd_spark.operators.sketches import kmv_sketch

    key = (os.path.abspath(sf_dir), k)
    with _KMV_STATE_LOCK:
        path = _KMV_STATE_CACHE.get(key)
        if path is None or not os.path.isdir(path):
            path = tempfile.mkdtemp(prefix="parqueryd_spark_kmv_")
            ev = load_table(spark, sf_dir, "events")
            for i in range(3):
                kmv_sketch(
                    ev.where(increment_of("event_id", i)),
                    ["event_type"],
                    "user_id",
                    k=k,
                    hash_fn="md5_52",
                ).write.mode("overwrite").parquet(os.path.join(path, f"batch={i}"))
            _KMV_STATE_CACHE[key] = path
    return path


@query(
    "events_kmv_served",
    bench=True,
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
               / 4503599627370496.0 AS u
      FROM events
      WHERE user_id IS NOT NULL
    ),
    r AS (
      SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    ),
    agg AS (
      SELECT event_type, max(nd) AS nd,
             min(CASE WHEN rn = 128 THEN u END) AS theta
      FROM r GROUP BY event_type
    )
    SELECT event_type,
           CAST(round(CASE WHEN nd < 128 THEN CAST(nd AS DOUBLE)
                           ELSE 127.0 / theta END) AS BIGINT) AS n_distinct
    FROM agg
    """,
)
def events_kmv_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct counts SERVED from standing published sketch state
    (VERDICT r12 item #6 / r13 item #5): the query plan reads ONLY the
    kilobyte ``batch=<id>`` sketch partitions through the streaming reader
    (streaming/rollup.py:read_kmv_distinct — merge-on-read of the k-value
    arrays) and never touches the raw events table (plan-asserted in
    tests/test_plans.py). The oracle is the SAME full-corpus md5_52 replay
    as events_kmv_distinct: a KMV sketch is a pure SET function of the
    hashed distinct values, so serve-from-batches is bit-identical to
    sketching everything at once. This is the 100 TB steady state: segments
    sketch once at ingest (streaming maintenance), any range query answers
    by merging state, raw ids are never re-read."""
    from parqueryd_spark.streaming.rollup import read_kmv_distinct

    path = _served_kmv_state(spark, sf_dir, k=128)
    return read_kmv_distinct(spark, path, ("event_type",), k=128)


def _served_kmv_compacted_state(spark: SparkSession, sf_dir: str, k: int = 128) -> str:
    """The :func:`_served_kmv_state` layout taken one lifecycle step further:
    after the three increments land, :func:`compact_kmv_state` folds them
    into a single ``batch=-1`` generation (atomic_publish swap). Built once
    per (process, sf_dir) into its own temp dir (prefix ``kmvc``) so the
    uncompacted twin's state stays untouched and the two rows stay
    independently plan-assertable."""
    import os
    import tempfile

    from parqueryd_spark.operators.sketches import kmv_sketch
    from parqueryd_spark.streaming.rollup import compact_kmv_state

    key = (os.path.abspath(sf_dir), k, "compacted")
    with _KMV_STATE_LOCK:
        path = _KMV_STATE_CACHE.get(key)
        if path is None or not os.path.isdir(path):
            path = tempfile.mkdtemp(prefix="parqueryd_spark_kmvc_")
            ev = load_table(spark, sf_dir, "events")
            for i in range(3):
                kmv_sketch(
                    ev.where(increment_of("event_id", i)),
                    ["event_type"],
                    "user_id",
                    k=k,
                    hash_fn="md5_52",
                ).write.mode("overwrite").parquet(os.path.join(path, f"batch={i}"))
            compact_kmv_state(spark, path, ("event_type",), k=k)
            _KMV_STATE_CACHE[key] = path
    return path


@query(
    "events_kmv_compacted",
    bench=True,
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
               / 4503599627370496.0 AS u
      FROM events
      WHERE user_id IS NOT NULL
    ),
    r AS (
      SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    ),
    agg AS (
      SELECT event_type, max(nd) AS nd,
             min(CASE WHEN rn = 128 THEN u END) AS theta
      FROM r GROUP BY event_type
    )
    SELECT event_type,
           CAST(round(CASE WHEN nd < 128 THEN CAST(nd AS DOUBLE)
                           ELSE 127.0 / theta END) AS BIGINT) AS n_distinct
    FROM agg
    """,
)
def events_kmv_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct counts served from a POST-COMPACTION ``batch=-1``
    generation (VERDICT r14 item #3): the state is built as three increments
    then folded by streaming/rollup.py:compact_kmv_state — the bounded-
    state-growth lever for long-lived maintenance — and served through the
    UNCHANGED streaming reader. The oracle is the same full-corpus md5_52
    replay as events_kmv_served: KMV union is "k smallest of the combined
    distinct hashes", so the compacted row per key IS the sketch of
    everything the increments saw, and this row puts that equivalence under
    the driver's hash gate rather than pytest alone. The plan reads only
    the compacted kilobyte state — raw events absent (tests/test_plans.py).
    At 100 TB this is the steady state after a year of 5-minute triggers:
    compaction keeps the serve O(sketch) instead of O(maintenance age)."""
    from parqueryd_spark.streaming.rollup import read_kmv_distinct

    path = _served_kmv_compacted_state(spark, sf_dir, k=128)
    return read_kmv_distinct(spark, path, ("event_type",), k=128)


@query(
    "events_kmv_overlap",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
               / 4503599627370496.0 AS u
      FROM events
      WHERE user_id IS NOT NULL
    ),
    r AS (
      SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    ),
    sk AS (SELECT event_type, u, rn, nd FROM r WHERE rn <= 128),
    th AS (
      SELECT event_type,
             CASE WHEN max(nd) >= 128 THEN min(CASE WHEN rn = 128 THEN u END)
                  ELSE 1.0 END AS theta
      FROM sk GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS t1, b.event_type AS t2,
             least(a.theta, b.theta) AS theta
      FROM th a JOIN th b ON a.event_type < b.event_type
    ),
    inter AS (
      SELECT p.t1, p.t2, count(*) AS n_in
      FROM pairs p
      JOIN sk x ON x.event_type = p.t1 AND x.u < p.theta
      JOIN sk y ON y.event_type = p.t2 AND y.u = x.u AND y.u < p.theta
      GROUP BY p.t1, p.t2
    ),
    ur AS (
      SELECT t1, t2, u, row_number() OVER (PARTITION BY t1, t2 ORDER BY u) AS rn
      FROM (
        SELECT DISTINCT p.t1, p.t2, s.u
        FROM pairs p JOIN sk s ON s.event_type = p.t1 OR s.event_type = p.t2
      )
    ),
    uest AS (
      SELECT t1, t2, max(rn) AS nu, min(CASE WHEN rn = 128 THEN u END) AS uk
      FROM ur GROUP BY t1, t2
    )
    SELECT p.t1, p.t2,
           CAST(round(coalesce(i.n_in, 0) / p.theta) AS BIGINT) AS n_intersect_est,
           CAST(round(CASE WHEN e.nu < 128 THEN CAST(e.nu AS DOUBLE)
                           ELSE 127.0 / e.uk END) AS BIGINT) AS n_union_est
    FROM pairs p
    LEFT JOIN inter i ON i.t1 = p.t1 AND i.t2 = p.t2
    JOIN uest e ON e.t1 = p.t1 AND e.t2 = p.t2
    """,
)
def events_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set operations VALUE-checked (the events_kmv_overlap_bound row's
    estimates, replayed exactly rather than bounded): per event-type pair,
    audience intersection and union estimates from md5_52 sketches
    (kmv_set_estimates — cut both retained samples at theta = min theta,
    |A∩B| ~ |common|/theta, union re-sketched from the merged sample). Every
    number is a deterministic function of the distinct user-id SET under a
    public hash, so DuckDB reproduces the sketch, the cut, and both
    estimates bit-for-bit. This is the 100 TB audience-overlap query served
    from 1 KiB/segment persisted sketch state instead of a distinct-shuffle
    self-join of the raw ids; the companion bound row keeps the accuracy
    contract (estimates within 25%/15% of exact) under the same gate."""
    from parqueryd_spark.operators.sketches import kmv_set_estimates, kmv_sketch

    k = 128
    ev = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(ev, ["event_type"], "user_id", k=k, hash_fn="md5_52")
    a = sk.select(F.col("event_type").alias("t1"), F.col("kmv").alias("a_kmv"))
    b = sk.select(F.col("event_type").alias("t2"), F.col("kmv").alias("b_kmv"))
    i_est, u_est = kmv_set_estimates("a", "b", k)
    return a.join(b, F.col("t1") < F.col("t2")).select("t1", "t2", i_est, u_est)


@query(
    "events_exact_distinct_pcts",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)              AS n_users,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           count(*)                             AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def events_exact_distinct_pcts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact twin of events_sketch_aggs: true count-distinct users and
    linear-interpolated p50/p95 per event_type — the externally-checkable
    companion the sketch query (engine-specific estimates, rows-only) can't
    be. This row gates the grouping/percentile pipeline shape against DuckDB;
    the sketches' relative error vs THESE answers is asserted in
    tests/test_scale.py. At 100 TB the sketch path is the one to run (fixed
    mergeable state vs a distinct-shuffle of every user id) — this exact
    query is the correctness anchor, not the scale path."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.percentile("value", F.array(F.lit(0.5), F.lit(0.95))).alias("_p"),
        F.count("*").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_users",
        F.round(F.col("_p")[0], 4).alias("p50"),
        F.round(F.col("_p")[1], 4).alias("p95"),
        "n_events",
    )




@query(
    "events_incremental_rollup",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*)                       AS n_events,
           round(sum(value), 4)           AS sum_value,
           round(min(value), 4)           AS min_value,
           round(max(value), 4)           AS max_value,
           round(avg(value), 4)           AS avg_value,
           round(stddev_samp(value), 4)   AS std_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained hourly rollup == full recompute (the oracle).

    Splits events at 2024-01-16, builds mergeable partial aggregates
    (count/sum/min/max/Σx²) on each half independently, merges, finalizes
    (operators/rollup.py) — the materialized-rollup maintenance pattern the
    reference's request-time full groupby (worker.py:367-408) can't afford at
    100 TB: cost |increment| + |rollup| instead of |corpus| per refresh.
    avg/std are derived at finalize so the stored state stays mergeable;
    the oracle is a plain one-shot groupby, proving merge ∘ split ≡ direct."""
    from parqueryd_spark.operators.rollup import incremental_rollup

    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    out = incremental_rollup(ev.where(F.col("ts") < split), ev.where(F.col("ts") >= split))
    return out.select(
        "window_start",
        "event_type",
        "n_events",
        *[F.round(c, 4).alias(c) for c in ("sum_value", "min_value", "max_value", "avg_value", "std_value")],
    )


@query(
    "scd2_events_asof",
    bench=True,
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_type, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    versions AS (
      SELECT user_id, ts AS eff_from, event_type, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    chained AS (
      SELECT user_id, eff_from, event_type,
             lead(eff_from) OVER (PARTITION BY user_id ORDER BY eff_from, event_id)
               AS eff_to
      FROM versions
    )
    SELECT event_type, count(*) AS n_users
    FROM chained
    WHERE eff_from <= TIMESTAMP '2024-01-20 00:00:00'
      AND (eff_to IS NULL OR eff_to > TIMESTAMP '2024-01-20 00:00:00')
    GROUP BY event_type
    """,
)
def scd2_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 type-2 history (operators/history.py) treating each user's event
    stream as a change log of their "state" (event_type as the tracked
    attribute, restatements collapsed): build the effective-dated version
    chains, then take the point-in-time snapshot — which state was each user
    in on Jan 20 — and count users per state. The oracle rebuilds the same
    chains with a lag/lead window reformulation in DuckDB, so the version
    collapse, interval chaining, and inclusive/exclusive as-of bounds are all
    externally checked."""
    import datetime as dt

    from parqueryd_spark.operators.history import scd2_as_of, scd2_init

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    hist = scd2_init(
        ev, ["user_id"], "ts", compare_cols=["event_type"], tiebreak_cols=["event_id"]
    )
    snap = scd2_as_of(hist, dt.datetime(2024, 1, 20))
    return snap.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "events_exact_quantile",
    oracle="""
    SELECT CAST(0.1 AS DOUBLE) AS prob, quantile_disc(value, 0.1) AS value FROM events
    UNION ALL
    SELECT CAST(0.25 AS DOUBLE), quantile_disc(value, 0.25) FROM events
    UNION ALL
    SELECT CAST(0.5 AS DOUBLE), quantile_disc(value, 0.5) FROM events
    UNION ALL
    SELECT CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9) FROM events
    UNION ALL
    SELECT CAST(0.99 AS DOUBLE), quantile_disc(value, 0.99) FROM events
    """,
    bench=True,
)
def events_exact_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order statistics without a global sort
    (operators/selection.py): multi-pass histogram narrowing — each pass one
    filtered range-predicate aggregation (pushdown- and zone-map-composable),
    candidate population shrinking ~bins-fold per pass, final resolve as
    max-of-the-r-smallest inside the engine. bins/exact_threshold are set
    low here so the gate exercises REAL narrowing passes at sf0.01 (10k
    rows), not just the small-n direct path; the answers are the actual data
    elements, so the oracle's quantile_disc must agree bit-for-bit.

    bins=1024 (r15 optimization, guide §2.4 "remove shuffles outright"):
    the answer is EXACT for any bins — the knob only sets the narrowing
    fan-out, i.e. the number of sequential full-scan passes. The historical
    bins=16 ran 2 passes at sf0.1 (100k -> 6.3k -> 391) and would run 4+ at
    sf10; 1024 reaches the threshold in 1 pass at sf0.1 and keeps pass depth
    log_1024(n) at any scale, while the per-pass driver collect stays ~1024
    count rows. sf0.01 (10k rows > threshold 500) still exercises a real
    narrowing pass at the gate."""
    from parqueryd_spark.operators.selection import exact_quantiles

    ev = load_table(spark, sf_dir, "events")
    return exact_quantiles(
        spark, ev, "value", [0.1, 0.25, 0.5, 0.9, 0.99], bins=1024, exact_threshold=500
    )


@query(
    "events_exact_quantile_by_type",
    oracle="""
    SELECT event_type, CAST(0.5 AS DOUBLE) AS prob,
           quantile_disc(value, 0.5) AS value
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    UNION ALL
    SELECT event_type, CAST(0.9 AS DOUBLE),
           quantile_disc(value, 0.9)
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    UNION ALL
    SELECT event_type, CAST(0.99 AS DOUBLE),
           quantile_disc(value, 0.99)
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
    bench=True,
)
def events_exact_quantile_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED exact order statistics (operators/selection.py:
    exact_group_quantiles): every event type's exact p50/p90/p99 — the
    dashboard shape — with ALL (group, prob) units narrowed simultaneously:
    one shared aggregation per level, one distributed window resolve for
    everything at once, answers never funneling through the driver.

    bins=256 (r15 optimization): exactness is bins-independent — the knob
    trades sequential full-scan passes against per-pass driver rows
    (groups x bins counts). bins=16 ran 2 passes at sf0.1 (20k/group -> 1.3k
    -> 78) and 4 at sf10; 256 reaches threshold 200 in 1 pass at sf0.1
    (20k -> 78) and halves pass depth at sf10, at 5x256=1280 driver rows per
    pass. sf0.01 (2k/group > 200) still exercises a real narrowing pass at
    the gate; the oracle's per-group quantile_disc must agree bit-for-bit
    at every prob."""
    from parqueryd_spark.operators.selection import exact_group_quantiles

    ev = load_table(spark, sf_dir, "events")
    return exact_group_quantiles(
        spark, ev, ["event_type"], "value", [0.5, 0.9, 0.99], bins=256, exact_threshold=200
    )


@query(
    "events_exact_quantile_cont",
    oracle="""
    SELECT CAST(0.5 AS DOUBLE) AS prob,
           round(quantile_cont(value, 0.5), 6) AS value FROM events
    UNION ALL
    SELECT CAST(0.95 AS DOUBLE), round(quantile_cont(value, 0.95), 6) FROM events
    UNION ALL
    SELECT CAST(0.999 AS DOUBLE), round(quantile_cont(value, 0.999), 6) FROM events
    """,
)
def events_exact_quantile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INTERPOLATED exact-quantile definition (operators/selection.py:
    exact_quantiles_cont — SQL quantile_cont / Spark percentile): two
    bracketing rank selections through the same shared-pass narrowing, with
    the interpolation arithmetic done on the two exact scalars and rounded
    to 6 dp. Completes the quantile family's contract: disc rows return
    actual data elements bit-for-bit; this row matches the AVG-style
    definition dashboards expect."""
    from parqueryd_spark.operators.selection import exact_quantiles_cont

    ev = load_table(spark, sf_dir, "events")
    # bins=1024 (r15): same pass-depth optimization as events_exact_quantile
    # — the interpolated answer is exact for any bins, fewer full-scan passes
    return exact_quantiles_cont(
        spark, ev, "value", [0.5, 0.95, 0.999], bins=1024, exact_threshold=500
    )


@query(
    "events_exact_quantile_cont_by_type",
    oracle="""
    SELECT event_type, CAST(0.25 AS DOUBLE) AS prob,
           round(quantile_cont(value, 0.25), 6) AS value
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    UNION ALL
    SELECT event_type, CAST(0.5 AS DOUBLE),
           round(quantile_cont(value, 0.5), 6)
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    UNION ALL
    SELECT event_type, CAST(0.95 AS DOUBLE),
           round(quantile_cont(value, 0.95), 6)
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def events_exact_quantile_cont_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED interpolated exact quantiles, MULTI-prob (operators/
    selection.py:exact_group_quantiles_cont) — the last cell of the selection
    matrix (global/grouped x disc/cont x single/multi-prob): every event
    type's exact p25/p50/p95 under the quantile_cont definition, ALL
    bracketing ranks of ALL (group, prob) units narrowed in the SAME shared
    passes (distinct probs frequently share a bracketing rank, deduplicated
    in the narrowing state) and the interpolation distributed (per-(group,
    prob) frac broadcast as metadata, one final aggregation). Low
    bins/threshold force real narrowing at sf0.01; the oracle's per-group
    quantile_cont must agree to 6 dp at every prob."""
    from parqueryd_spark.operators.selection import exact_group_quantiles_cont

    ev = load_table(spark, sf_dir, "events")
    # bins=256 (r15): same pass-depth optimization as the grouped disc row
    return exact_group_quantiles_cont(
        spark, ev, ["event_type"], "value", [0.25, 0.5, 0.95], bins=256, exact_threshold=200
    )


@query(
    "events_heavy_spenders_by_type",
    oracle="""
    SELECT event_type, user_id, spend_cents
    FROM (
      SELECT event_type, user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY sum(CAST(round(value * 100) AS BIGINT)) DESC, user_id ASC
             ) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY event_type, user_id
    ) WHERE rn <= 5
    """,
)
def events_heavy_spenders_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 users by TOTAL SPEND per event_type via the GROUPED WEIGHTED
    exact-heavy-hitter route (operators/sketches.py
    heavy_hitters_exact_topk_grouped with weight_col — new in r13,
    completing the heavy-hitter matrix: global/grouped × count/measure).
    Values scale to integer cents before sketching so every sum — the
    per-group MG counters, the eviction errors E_g, the confirm aggregate —
    is exact integer arithmetic, keeping the group-wise completeness proof
    sound and the DuckDB replay bit-for-bit. At this SF the per-type user
    cardinality sits under the capacity, so E_g == 0 everywhere and the
    result is exact by construction; the eviction-proof branch is pinned in
    tests/test_sketches.py. At 100 TB this is heavy-spenders-per-tenant at
    a shuffle of candidate grain, not (tenant, user, payment) grain."""
    from parqueryd_spark.operators.sketches import heavy_hitters_exact_topk_grouped

    ev = load_table(spark, sf_dir, "events").withColumn(
        "spend_cents", F.round(F.col("value") * 100).cast("long")
    )
    out = heavy_hitters_exact_topk_grouped(
        ev, "event_type", "user_id", k=5, capacity=4096, weight_col="spend_cents"
    )
    return out.withColumnRenamed("weight_sum", "spend_cents")
