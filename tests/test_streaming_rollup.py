"""Streaming rollup maintenance: per-batch partial-state partitions must
merge-on-read to exactly the one-shot batch answer, stay idempotent under
checkpoint replay, survive compaction, and absorb late data."""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd

from parqueryd_spark.operators.rollup import finalize_rollup, rollup_partials
from parqueryd_spark.streaming.rollup import (
    compact_rollup,
    read_rollup,
    stream_maintain_rollup,
)


def _write(path: str, rows: list[tuple[int, dt.datetime, str, float]]) -> None:
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "event_type", "value"])
    # micros, not pandas' default nanos (Spark reads INT64 ts(NANOS) as bigint)
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(path)


B1 = [
    (1, dt.datetime(2024, 1, 1, 0, 5), "click", 1.0),
    (2, dt.datetime(2024, 1, 1, 0, 40), "click", 3.0),
    (3, dt.datetime(2024, 1, 1, 1, 10), "view", 10.0),
]
B2 = [
    (4, dt.datetime(2024, 1, 1, 0, 50), "click", 5.0),  # merges into B1's grain
    (5, dt.datetime(2024, 1, 2, 9, 0), "view", 2.0),
]
LATE = [(6, dt.datetime(2024, 1, 1, 0, 59), "click", 7.0)]  # days-late correction


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _direct(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "event_type", "value"])
    return finalize_rollup(rollup_partials(spark.createDataFrame(pdf)))


def _drain(docs, rollup_dir, ckpt):
    q = stream_maintain_rollup(docs, rollup_dir, ckpt)
    q.awaitTermination()


def test_stream_rollup_matches_batch_and_replays_idempotently(spark, tmp_path):
    stream_in = str(tmp_path / "in")
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)

    _write(os.path.join(stream_in, "b1.parquet"), B1)
    time.sleep(1.1)
    _write(os.path.join(stream_in, "b2.parquet"), B2)

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    docs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)

    _drain(docs, rollup_dir, ckpt)
    expect = _canon(_direct(spark, B1 + B2))
    assert _canon(read_rollup(spark, rollup_dir)) == expect

    # replay with the same checkpoint: partition overwrite, totals unchanged
    _drain(docs, rollup_dir, ckpt)
    assert _canon(read_rollup(spark, rollup_dir)) == expect

    # compaction folds partitions into batch=-1 without changing the answer
    n = compact_rollup(spark, rollup_dir, target_partitions=2)
    assert n == len(expect)
    assert _canon(read_rollup(spark, rollup_dir)) == expect

    # late data after compaction lands in a fresh partition and merges in
    _write(os.path.join(stream_in, "b3.parquet"), LATE)
    _drain(docs, rollup_dir, ckpt)
    assert _canon(read_rollup(spark, rollup_dir)) == _canon(_direct(spark, B1 + B2 + LATE))


def test_stream_hll_distinct_matches_batch_and_never_double_counts(spark, tmp_path):
    """Streaming HLL maintenance: merged per-batch sketches must equal the
    one-shot batch sketch EXACTLY (register-wise-max merge), checkpoint
    replay must not change the answer, and a user id repeated across batches
    must not double-count."""
    from pyspark.sql import functions as F

    from parqueryd_spark.operators.sketches import hll_estimate, hll_rollup
    from parqueryd_spark.streaming.rollup import read_hll_distinct, stream_maintain_hll

    stream_in = str(tmp_path / "in")
    hll_dir = str(tmp_path / "hll")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)

    # user 1 clicks in BOTH batches: global distinct for click must stay 2
    rows1 = [(1, dt.datetime(2024, 1, 1, 0, 5), "click", 1.0),
             (2, dt.datetime(2024, 1, 1, 0, 9), "click", 2.0),
             (3, dt.datetime(2024, 1, 1, 1, 0), "view", 1.0)]
    rows2 = [(1, dt.datetime(2024, 1, 2, 0, 5), "click", 9.0),
             (4, dt.datetime(2024, 1, 2, 2, 0), "view", 4.0)]

    def _w(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(os.path.join(stream_in, name))

    _w("b1.parquet", rows1)
    time.sleep(1.1)
    _w("b2.parquet", rows2)

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    ev = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_maintain_hll(ev, hll_dir, ckpt).awaitTermination()

    got = {
        (r.event_type, r.n_rows, r.n_distinct)
        for r in read_hll_distinct(spark, hll_dir).collect()
    }
    all_rows = spark.createDataFrame(
        pd.DataFrame(rows1 + rows2, columns=["user_id", "ts", "event_type", "value"])
    )
    want = {
        (r.event_type, r.n_rows, r.n_distinct)
        for r in hll_estimate(hll_rollup(all_rows, ["event_type"], "user_id")).collect()
    }
    assert got == want
    assert ("click", 3, 2) in got  # repeated user never double-counts

    # checkpoint replay: idempotent partition overwrite, same answer
    ev2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_maintain_hll(ev2, hll_dir, ckpt).awaitTermination()
    got2 = {
        (r.event_type, r.n_rows, r.n_distinct)
        for r in read_hll_distinct(spark, hll_dir).collect()
    }
    assert got2 == got


def test_stream_kmv_state_matches_batch_and_overlaps(spark, tmp_path):
    """Streaming KMV maintenance: merged per-batch sketches must equal the
    one-shot batch sketch BIT-EXACTLY (k-smallest-of-union merge), repeated
    values across batches never double-count, and the published state
    answers pairwise overlap — the query HLL state can't."""
    from parqueryd_spark.operators.sketches import kmv_sketch
    from parqueryd_spark.streaming.rollup import (
        read_kmv_distinct,
        read_kmv_overlap,
        stream_maintain_kmv,
    )

    stream_in = str(tmp_path / "in")
    kmv_dir = str(tmp_path / "kmv")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)

    # user 1 does click in both batches AND view: overlap(click, view) = {1}
    rows1 = [(1, dt.datetime(2024, 1, 1, 0, 5), "click", 1.0),
             (2, dt.datetime(2024, 1, 1, 0, 9), "click", 2.0),
             (1, dt.datetime(2024, 1, 1, 1, 0), "view", 1.0)]
    rows2 = [(1, dt.datetime(2024, 1, 2, 0, 5), "click", 9.0),
             (4, dt.datetime(2024, 1, 2, 2, 0), "view", 4.0)]

    def _w(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(os.path.join(stream_in, name))

    _w("b1.parquet", rows1)
    time.sleep(1.1)
    _w("b2.parquet", rows2)

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    ev = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_maintain_kmv(ev, kmv_dir, ckpt, k=64).awaitTermination()

    got = {
        (r.event_type, r.n_distinct)
        for r in read_kmv_distinct(spark, kmv_dir, k=64).collect()
    }
    assert got == {("click", 2), ("view", 2)}  # user 1 never double-counts

    # merged streaming state ≡ one-shot batch sketch, bit for bit
    all_rows = spark.createDataFrame(
        pd.DataFrame(rows1 + rows2, columns=["user_id", "ts", "event_type", "value"])
    )
    direct = {
        r.event_type: r.kmv
        for r in kmv_sketch(all_rows, ["event_type"], "user_id", 64).collect()
    }
    from parqueryd_spark.operators.sketches import kmv_merge

    merged = {
        r.event_type: r.kmv
        for r in kmv_merge(
            [spark.read.parquet(kmv_dir).drop("batch")], ["event_type"], 64
        ).collect()
    }
    assert merged == direct

    # overlap query over published state: |click ∩ view| = 1 exactly (< k)
    ov = read_kmv_overlap(spark, kmv_dir, k=64).collect()
    assert len(ov) == 1 and ov[0].n_intersect_est == 1 and ov[0].n_union_est == 3


def test_stream_countmin_merges_exactly_and_replays_safely(spark, tmp_path):
    """Two micro-batches of CM partials merge-on-read to the ONE-SHOT sketch
    estimates (CM linearity), and a replayed drain changes nothing."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from parqueryd_spark.operators.sketches import count_min_query, count_min_sketch
    from parqueryd_spark.streaming.rollup import (
        read_countmin_estimates,
        stream_maintain_countmin,
    )

    stream_in = str(tmp_path / "in")
    cm_dir = str(tmp_path / "cm")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)
    pd.DataFrame({"user_id": [i % 10 for i in range(500)]}).to_parquet(
        os.path.join(stream_in, "b1.parquet")
    )
    pd.DataFrame({"user_id": [i % 25 for i in range(500)]}).to_parquet(
        os.path.join(stream_in, "b2.parquet")
    )
    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_maintain_countmin(src, cm_dir, ckpt).awaitTermination()

    keys = spark.range(25).select(F.col("id").alias("user_id"))
    served = {
        r["user_id"]: r["est"]
        for r in read_countmin_estimates(spark, cm_dir, keys).collect()
    }
    oneshot_sk = count_min_sketch(spark.read.parquet(stream_in), "user_id")
    oneshot = {
        r["user_id"]: r["est"]
        for r in count_min_query(oneshot_sk, keys, "user_id").collect()
    }
    assert served == oneshot
    exact = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(stream_in).groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(served[k] >= exact.get(k, 0) for k in served)

    stream_maintain_countmin(src, cm_dir, ckpt).awaitTermination()  # replay, no input
    served2 = {
        r["user_id"]: r["est"]
        for r in read_countmin_estimates(spark, cm_dir, keys).collect()
    }
    assert served2 == served


def test_stream_heavy_hitters_state_bounds_and_exact_at_capacity(spark, tmp_path):
    """Streaming MG maintenance: per-batch bounded summaries merge-on-read to
    a valid MG summary of everything seen — exact counts when capacity never
    evicts, and est <= true <= est + max_undercount when it does. A replayed
    drain changes nothing (idempotent batch partitions)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from parqueryd_spark.streaming.rollup import (
        read_heavy_hitters,
        stream_maintain_heavy_hitters,
    )

    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    # zipf-ish: user u appears 40-u times per batch slice, two batches
    rows = [u for u in range(1, 40) for _ in range(40 - u)]
    pd.DataFrame({"user_id": rows[: len(rows) // 2]}).to_parquet(
        os.path.join(stream_in, "b1.parquet")
    )
    pd.DataFrame({"user_id": rows[len(rows) // 2 :]}).to_parquet(
        os.path.join(stream_in, "b2.parquet")
    )
    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema

    exact = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(stream_in)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    # capacity >= cardinality: no evictions anywhere -> exact top-k, zero bound
    hh_dir, ckpt = str(tmp_path / "hh_big"), str(tmp_path / "ck_big")
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_maintain_heavy_hitters(src, hh_dir, ckpt, capacity=256).awaitTermination()
    top = read_heavy_hitters(spark, hh_dir, k=5).collect()
    assert [(r.user_id, r.est_count) for r in top] == [
        (u, exact[u]) for u in sorted(exact, key=lambda u: (-exact[u], u))[:5]
    ]
    assert all(r.max_undercount == 0 for r in top)

    # replayed drain (no new files): state unchanged
    stream_maintain_heavy_hitters(src, hh_dir, ckpt, capacity=256).awaitTermination()
    top2 = read_heavy_hitters(spark, hh_dir, k=5).collect()
    assert [(r.user_id, r.est_count) for r in top2] == [(r.user_id, r.est_count) for r in top]

    # tight capacity: evictions accumulate, the MG invariant must still hold
    hh2, ck2 = str(tmp_path / "hh_small"), str(tmp_path / "ck_small")
    src2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_maintain_heavy_hitters(src2, hh2, ck2, capacity=8).awaitTermination()
    for r in read_heavy_hitters(spark, hh2, k=10).collect():
        assert r.est_count <= exact[r.user_id] <= r.est_count + r.max_undercount, r


def test_stream_heavy_hitters_weighted_state(spark, tmp_path):
    """weight_col maintenance: merged per-batch weighted summaries must give
    exact weight sums when capacity never evicts (the count-mode contract,
    read with 'count' as 'total weight')."""
    import pandas as pd
    from pyspark.sql import functions as F

    from parqueryd_spark.streaming.rollup import (
        read_heavy_hitters,
        stream_maintain_heavy_hitters,
    )

    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    rows = [(u, 100 - u) for u in range(1, 30) for _ in range(4)]
    pd.DataFrame(rows[: len(rows) // 2], columns=["user_id", "spend"]).to_parquet(
        os.path.join(stream_in, "b1.parquet")
    )
    pd.DataFrame(rows[len(rows) // 2 :], columns=["user_id", "spend"]).to_parquet(
        os.path.join(stream_in, "b2.parquet")
    )
    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    hh_dir, ckpt = str(tmp_path / "hh"), str(tmp_path / "ck")
    stream_maintain_heavy_hitters(
        src, hh_dir, ckpt, capacity=256, weight_col="spend"
    ).awaitTermination()

    exact = {
        r["user_id"]: r["w"]
        for r in spark.read.parquet(stream_in)
        .groupBy("user_id")
        .agg(F.sum("spend").alias("w"))
        .collect()
    }
    top = read_heavy_hitters(spark, hh_dir, k=5).collect()
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.user_id, r.est_count) for r in top] == want
    assert all(r.max_undercount == 0 for r in top)


def test_stream_heavy_hitters_grouped_state(spark, tmp_path):
    """Grouped streaming MG maintenance (r13): per-batch grouped summaries
    merge-on-read to exact per-group counts when capacity never evicts
    (zero bounds), the per-group MG invariant holds under a tight capacity,
    and the weighted face returns exact per-group weight sums."""
    import pandas as pd
    from pyspark.sql import functions as F

    from parqueryd_spark.streaming.rollup import (
        read_heavy_hitters_grouped,
        stream_maintain_heavy_hitters_grouped,
    )

    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    # two groups with different zipf slopes; weight = 2 per occurrence
    rows = [("ga", u, 2) for u in range(1, 20) for _ in range(20 - u)] + [
        ("gb", u, 2) for u in range(1, 12) for _ in range(3 * u)
    ]
    pd.DataFrame(rows[: len(rows) // 2], columns=["g", "k", "w"]).to_parquet(
        os.path.join(stream_in, "b1.parquet")
    )
    pd.DataFrame(rows[len(rows) // 2 :], columns=["g", "k", "w"]).to_parquet(
        os.path.join(stream_in, "b2.parquet")
    )
    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    exact = {
        (r.g, r.k): r.n
        for r in spark.read.parquet(stream_in)
        .groupBy("g", "k")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    # roomy capacity: exact per-group top-k, zero bounds; replay is a no-op
    hh, ck = str(tmp_path / "hh"), str(tmp_path / "ck")
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_maintain_heavy_hitters_grouped(src, hh, ck, "g", "k", capacity=64).awaitTermination()
    top = read_heavy_hitters_grouped(spark, hh, "g", "k", k=3).collect()
    want = []
    for g in ("ga", "gb"):
        best = sorted(
            ((k_, n) for (gg, k_), n in exact.items() if gg == g),
            key=lambda kv: (-kv[1], kv[0]),
        )[:3]
        want.extend((g, k_, n, 0) for k_, n in best)
    assert [(r.g, r.k, r.est_count, r.max_undercount) for r in top] == want
    stream_maintain_heavy_hitters_grouped(src, hh, ck, "g", "k", capacity=64).awaitTermination()
    assert [(r.g, r.k, r.est_count) for r in read_heavy_hitters_grouped(spark, hh, "g", "k", k=3).collect()] == [
        (g, k_, n) for g, k_, n, _ in want
    ]

    # tight capacity: per-group invariant est <= true <= est + bound_g
    hh2, ck2 = str(tmp_path / "hh2"), str(tmp_path / "ck2")
    src2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_maintain_heavy_hitters_grouped(src2, hh2, ck2, "g", "k", capacity=4).awaitTermination()
    for r in read_heavy_hitters_grouped(spark, hh2, "g", "k", k=8).collect():
        assert r.est_count <= exact[(r.g, r.k)] <= r.est_count + r.max_undercount, r

    # weighted face: exact weight sums at roomy capacity (w=2 per row)
    hh3, ck3 = str(tmp_path / "hh3"), str(tmp_path / "ck3")
    src3 = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_maintain_heavy_hitters_grouped(
        src3, hh3, ck3, "g", "k", capacity=64, weight_col="w"
    ).awaitTermination()
    for r in read_heavy_hitters_grouped(spark, hh3, "g", "k", k=3).collect():
        assert r.est_count == 2 * exact[(r.g, r.k)], r
        assert r.max_undercount == 0


def test_compaction_preserves_served_answers_and_shrinks_state(spark, tmp_path):
    """compact_*_state (r14): folding accumulated batch partitions into one
    batch=-1 generation must leave EVERY served answer identical — KMV
    distinct counts, CM estimates, global and grouped heavy-hitter top-k
    including the undercount bounds — while the stored row count shrinks.
    This is the bounded-state-growth lever for long-lived maintenance: a
    year of 5-minute triggers otherwise accumulates ~1e5 partitions whose
    merge-on-read cost the reader pays every query."""
    import pandas as pd
    from pyspark.sql import functions as F

    from parqueryd_spark.streaming.rollup import (
        compact_countmin_state,
        compact_heavy_hitters_grouped_state,
        compact_heavy_hitters_state,
        compact_kmv_state,
        read_countmin_estimates,
        read_heavy_hitters,
        read_heavy_hitters_grouped,
        read_kmv_distinct,
        stream_maintain_countmin,
        stream_maintain_heavy_hitters,
        stream_maintain_heavy_hitters_grouped,
        stream_maintain_kmv,
    )

    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    # user-major interleave so BOTH event types land in BOTH batch files —
    # otherwise per-key state is already 1 row per batch and compaction has
    # nothing to shrink
    rows = [
        {"event_type": t, "user_id": u}
        for u in range(1, 30)
        for t in ("a", "b")
        for _ in range(u % 7 + 1)
    ]
    half = len(rows) // 2
    pd.DataFrame(rows[:half]).to_parquet(os.path.join(stream_in, "b1.parquet"))
    pd.DataFrame(rows[half:]).to_parquet(os.path.join(stream_in, "b2.parquet"))
    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema

    def src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_in)
        )

    # ---- KMV
    kmv_dir = str(tmp_path / "kmv")
    stream_maintain_kmv(
        src(), kmv_dir, str(tmp_path / "ck1"), ("event_type",), "user_id", k=16
    ).awaitTermination()
    before = sorted(map(tuple, read_kmv_distinct(spark, kmv_dir, ("event_type",), k=16).collect()))
    rows_before = spark.read.parquet(kmv_dir).count()
    rows_after = compact_kmv_state(spark, kmv_dir, ("event_type",), k=16)
    after = sorted(map(tuple, read_kmv_distinct(spark, kmv_dir, ("event_type",), k=16).collect()))
    assert after == before
    assert rows_after < rows_before  # 2 batches x 2 keys -> 2 rows
    assert rows_after == 2

    # ---- Count-Min
    cm_dir = str(tmp_path / "cm")
    stream_maintain_countmin(
        src(), cm_dir, str(tmp_path / "ck2"), "user_id", width=64, depth=3, salt="t"
    ).awaitTermination()
    keys = spark.range(1, 30).select(F.col("id").alias("user_id"))
    cm_before = sorted(map(tuple, read_countmin_estimates(
        spark, cm_dir, keys, "user_id", width=64, depth=3, salt="t").collect()))
    cm_rows_before = spark.read.parquet(cm_dir).count()
    cm_rows_after = compact_countmin_state(spark, cm_dir)
    cm_after = sorted(map(tuple, read_countmin_estimates(
        spark, cm_dir, keys, "user_id", width=64, depth=3, salt="t").collect()))
    assert cm_after == cm_before
    assert cm_rows_after <= cm_rows_before

    # ---- global heavy hitters, TIGHT capacity so nonzero bounds survive too
    hh_dir = str(tmp_path / "hh")
    stream_maintain_heavy_hitters(
        src(), hh_dir, str(tmp_path / "ck3"), "user_id", capacity=8
    ).awaitTermination()
    hh_before = [tuple(r) for r in read_heavy_hitters(spark, hh_dir, "user_id", k=10).collect()]
    hh_rows_before = spark.read.parquet(hh_dir).count()
    hh_rows_after = compact_heavy_hitters_state(spark, hh_dir)
    hh_after = [tuple(r) for r in read_heavy_hitters(spark, hh_dir, "user_id", k=10).collect()]
    assert hh_after == hh_before  # est AND max_undercount identical
    assert hh_rows_after < hh_rows_before

    # ---- grouped heavy hitters
    gh_dir = str(tmp_path / "gh")
    stream_maintain_heavy_hitters_grouped(
        src(), gh_dir, str(tmp_path / "ck4"), "event_type", "user_id", capacity=8
    ).awaitTermination()
    gh_before = [
        tuple(r)
        for r in read_heavy_hitters_grouped(spark, gh_dir, "event_type", "user_id", k=5).collect()
    ]
    gh_rows_before = spark.read.parquet(gh_dir).count()
    gh_rows_after = compact_heavy_hitters_grouped_state(spark, gh_dir)
    gh_after = [
        tuple(r)
        for r in read_heavy_hitters_grouped(spark, gh_dir, "event_type", "user_id", k=5).collect()
    ]
    assert gh_after == gh_before
    assert gh_rows_after < gh_rows_before

    # ---- compaction composes with continued maintenance: new batches land
    # beside batch=-1 and merge in (write one more increment post-compaction)
    extra = [{"event_type": "a", "user_id": 999} for _ in range(50)]
    pd.DataFrame(extra).to_parquet(os.path.join(stream_in, "b3.parquet"))
    stream_maintain_kmv(
        src(), kmv_dir, str(tmp_path / "ck1"), ("event_type",), "user_id", k=16
    ).awaitTermination()
    grown = {r["event_type"]: r["n_distinct"]
             for r in read_kmv_distinct(spark, kmv_dir, ("event_type",), k=16).collect()}
    base = dict((t, n) for t, n in before)
    # the untouched key's estimate is unchanged; 'a' gained one distinct user
    # whose hash may or may not enter the k smallest, so for it we only pin
    # that the post-compaction merge keeps serving a sane estimate
    assert grown["b"] == base["b"]
    assert grown["a"] >= base["a"]
