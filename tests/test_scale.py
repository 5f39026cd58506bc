"""Scale-operator tests: salting correctness, bucketed join shuffle elimination."""

from __future__ import annotations

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parqueryd_spark.operators.scale import bucketed_join, salted_groupby_agg, write_bucketed
from parqueryd_spark.plans.audit import explain_str
from parqueryd_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def test_salted_groupby_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    salted = (
        salted_groupby_agg(
            li,
            ["l_returnflag"],
            {
                "sum_qty": ("l_quantity", "sum"),
                "cnt": ("l_orderkey", "count"),
                "max_price": ("l_extendedprice", "max"),
                "min_price": ("l_extendedprice", "min"),
            },
            salt_buckets=8,
        )
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count("l_orderkey").alias("cnt"),
            F.max("l_extendedprice").alias("max_price"),
            F.min("l_extendedprice").alias("min_price"),
        )
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(salted, plain, check_dtype=False, check_like=True)


def test_bucketed_join_eliminates_shuffle(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], num_buckets=8, sort_by=["o_orderkey"])
    write_bucketed(lineitem, "t_lineitem_b", ["o_orderkey"], num_buckets=8, sort_by=["o_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable broadcast so the planner must choose shuffle vs bucket co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", ["o_orderkey"])
        plan = explain_str(joined, "simple")
        # co-located: sort-merge join with NO shuffle exchange on either side
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        n_bucketed = joined.count()
        n_plain = orders.join(lineitem, "o_orderkey").count()
        assert n_bucketed == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_partition_pruning(spark, tmp_path):
    """A filter on a hive partition column must prune at planning time —
    at 100 TB a date-partitioned table answers a one-day query by listing one
    directory, not by scanning (or even stat-ing) every file."""
    import os

    from parqueryd_spark.sources.parquet import read_parquet

    target = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.write.partitionBy("o_orderstatus").parquet(target)
    statuses = [d.split("=")[1] for d in os.listdir(target) if d.startswith("o_orderstatus=")]
    assert len(statuses) > 1, "fixture must produce multiple partitions"

    df = read_parquet(spark, target).filter(F.col("o_orderstatus") == statuses[0])
    plan = explain_str(df, "formatted")
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    # attribute names carry expression ids in formatted plans (o_orderstatus#13)
    assert re.search(rf"\(o_orderstatus#\d+ = {statuses[0]}\)", scan), scan
    # the partition predicate is resolved against directory names, never data
    # (Spark omits the PushedFilters line entirely when no data filter remains)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert not pushed or "o_orderstatus" not in pushed[0], pushed
    expected = orders.filter(F.col("o_orderstatus") == statuses[0]).count()
    assert df.count() == expected > 0


def test_sketch_aggs_error_bounds(spark):
    """events_sketch_aggs (r13 shape: exact n_events + in-query bound
    booleans) must report every estimate inside its envelope, and the RAW
    sketch estimates — no longer in the row's output — stay pinned here:
    HLL++ within 5% of true distinct counts, approx p50/p95 within the value
    range spanned by neighboring exact quantiles."""
    from parqueryd_spark.queries.events import events_sketch_aggs

    gated = {r.event_type: r for r in events_sketch_aggs(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events")
    raw = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.expr("percentile_approx(value, array(0.5, 0.95), 10000)").alias("ap"),
        )
        .collect()
    }
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.45, 0.5, 0.55, 0.9, 0.95, 0.99))").alias("pcts"),
        )
        .collect()
    }
    assert set(gated) == set(exact) == set(raw)
    for et, g in gated.items():
        e, a = exact[et], raw[et]
        assert g.users_ok and g.p50_ok and g.p95_ok, (et, g)
        assert g.n_events == a.n, (et, g.n_events, a.n)
        assert abs(a.approx_users - e.users) / e.users <= 0.05, (et, a.approx_users, e.users)
        p50, p95 = a.ap[0], a.ap[1]
        assert e.pcts[0] <= p50 <= e.pcts[2], (et, p50, e.pcts)
        assert e.pcts[3] <= p95 <= e.pcts[5], (et, p95, e.pcts)


def test_sketch_aggs_envelope_sound_for_small_groups(spark, tmp_path):
    """ADVICE r13 regression: the p50_ok/p95_ok envelope must hold for groups
    so small/spread that the OLD interpolated-quantile band excluded every
    actual element (e.g. 2 rows at values 0 and 1000: interpolated [p48,p52]
    = [960, 1000]... percentile_approx returns an element, which the band can
    miss). The rank-based bound degenerates to trivially-true for tiny
    groups, which is the correct semantics of a rank-error guarantee."""
    import datetime as dt

    from parqueryd_spark.queries.events import events_sketch_aggs

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # 2-row spread group (the old-band killer) and a 1-row group
        (1, t0, 1, "tiny2", 0.0, "{}"),
        (2, t0, 2, "tiny2", 1000.0, "{}"),
        (3, t0, 3, "tiny1", 42.0, "{}"),
        # 3-row group with heavy ties
        (4, t0, 4, "ties", 5.0, "{}"),
        (5, t0, 5, "ties", 5.0, "{}"),
        (6, t0, 6, "ties", 7.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.event_type: r for r in events_sketch_aggs(spark, str(tmp_path)).collect()}
    assert set(out) == {"tiny2", "tiny1", "ties"}
    for et, r in out.items():
        assert r.users_ok and r.p50_ok and r.p95_ok, (et, r)


def test_atomic_publish_and_compact(spark, tmp_path):
    """atomic_publish swaps generations without partial visibility;
    compact_parquet rewrites many small files into few, in place, preserving
    rows."""
    import os

    from parqueryd_spark.sources.sinks import atomic_publish, compact_parquet

    target = str(tmp_path / "ds")
    li = load_table(spark, SF_SMOKE, "lineitem").limit(500)
    # generation 1: fragmented into many small files
    atomic_publish(li.repartition(20), target)
    files = [f for f in os.listdir(target) if f.endswith(".parquet")]
    assert len(files) == 20
    assert spark.read.parquet(target).count() == 500

    # compact in place (reads from target while writing its replacement)
    n = compact_parquet(spark, target, target_partitions=2)
    assert n == 500
    files = [f for f in os.listdir(target) if f.endswith(".parquet")]
    assert len(files) == 2
    # no leftover generation dirs
    leftovers = [d for d in os.listdir(tmp_path) if d.startswith((".incoming_", ".old_"))]
    assert leftovers == []

    # generation 2: different content fully replaces generation 1
    g2 = load_table(spark, SF_SMOKE, "orders").limit(100)
    atomic_publish(g2, target)
    back = spark.read.parquet(target)
    assert back.count() == 100 and "o_orderkey" in back.columns

    # hive-partitioned datasets must not be silently flattened by compaction
    part_target = str(tmp_path / "ds_part")
    atomic_publish(g2, part_target, partition_by=["o_orderstatus"])
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, part_target, target_partitions=2)
    compact_parquet(spark, part_target, target_partitions=2, partition_by=["o_orderstatus"])
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(part_target))
    assert spark.read.parquet(part_target).count() == 100


def test_atomic_publish_scheme_uri(spark, tmp_path):
    """The publish/compact path is object-store-shaped: a file:-scheme URI
    (resolved through Hadoop FileSystem, the same gateway an s3a:// path
    would use) publishes, replaces, and compacts exactly like a bare local
    path — the reference's moveparquet serves object-store data
    (worker.py:544-594), so the analog must not be POSIX-only."""
    import os

    from parqueryd_spark.sources.sinks import atomic_publish, compact_parquet

    target = f"file://{tmp_path}/ds_uri"
    local = str(tmp_path / "ds_uri")
    li = load_table(spark, SF_SMOKE, "lineitem").limit(200)
    atomic_publish(li.repartition(10), target)
    assert spark.read.parquet(target).count() == 200
    assert len([f for f in os.listdir(local) if f.endswith(".parquet")]) == 10

    assert compact_parquet(spark, target, target_partitions=2) == 200
    assert len([f for f in os.listdir(local) if f.endswith(".parquet")]) == 2

    # generation replacement through the URI path too
    g2 = load_table(spark, SF_SMOKE, "orders").limit(40)
    atomic_publish(g2, target)
    back = spark.read.parquet(target)
    assert back.count() == 40 and "o_orderkey" in back.columns
    leftovers = [d for d in os.listdir(tmp_path) if d.startswith((".incoming_", ".old_"))]
    assert leftovers == []


def test_atomic_publish_many_barrier(spark, tmp_path):
    """Ticket-level barrier: N datasets swap together. A failure while
    WRITING any dataset leaves every serving path on its previous
    generation (the reference's all-files-DONE-before-any-move contract)."""
    import os

    from parqueryd_spark.sources.sinks import atomic_publish_many

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    li = load_table(spark, SF_SMOKE, "lineitem").limit(50)
    orders = load_table(spark, SF_SMOKE, "orders").limit(30)
    atomic_publish_many([(li, a), (orders, b)])
    assert spark.read.parquet(a).count() == 50
    assert spark.read.parquet(b).count() == 30

    # second ticket: first dataset writable, second EXPLODES at write time —
    # both serving paths must stay on generation 1
    bad = orders.withColumn("boom", F.expr("assert_true(o_orderkey < 0)"))
    with pytest.raises(Exception):
        atomic_publish_many([(li.limit(10), a), (bad, b)])
    assert spark.read.parquet(a).count() == 50
    assert spark.read.parquet(b).count() == 30
    leftovers = [d for d in os.listdir(tmp_path) if d.startswith((".incoming_", ".old_"))]
    assert leftovers == []


def test_atomic_publish_many_mixed_schemes(spark, tmp_path):
    """The barrier publish resolves a FileSystem per path, so one ticket can
    span schemes (here a bare local path and a file: URI — the same gateway
    an s3a: path would take)."""
    from parqueryd_spark.sources.sinks import atomic_publish_many

    a = str(tmp_path / "mixed_a")
    b = f"file://{tmp_path}/mixed_b"
    li = load_table(spark, SF_SMOKE, "lineitem").limit(50)
    orders = load_table(spark, SF_SMOKE, "orders").limit(30)
    atomic_publish_many([(li, a), (orders, b)])
    assert spark.read.parquet(a).count() == 50
    assert spark.read.parquet(b).count() == 30


def test_atomic_publish_many_midswap_rollback(spark, tmp_path, monkeypatch):
    """A failure in the middle of the swap sequence rolls already-swapped
    datasets back — readers never see a mix of generations across the set."""
    import os

    from parqueryd_spark.sources import sinks

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    li = load_table(spark, SF_SMOKE, "lineitem").limit(50)
    orders = load_table(spark, SF_SMOKE, "orders").limit(30)
    sinks.atomic_publish_many([(li, a), (orders, b)])

    real_rename = sinks.HadoopFS.rename_or_raise
    calls = {"n": 0}

    def flaky_rename(self, src, dst):
        # swap sequence: (a->old, inc->a, b->old, inc->b); fail on b's swap
        calls["n"] += 1
        if calls["n"] == 3:
            raise OSError("injected rename failure")
        return real_rename(self, src, dst)

    monkeypatch.setattr(sinks.HadoopFS, "rename_or_raise", flaky_rename)
    with pytest.raises(OSError):
        sinks.atomic_publish_many([(li.limit(10), a), (orders.limit(5), b)])
    monkeypatch.undo()
    # both datasets still serve generation 1, no partial mix
    assert spark.read.parquet(a).count() == 50
    assert spark.read.parquet(b).count() == 30


def test_aqe_splits_skewed_join_partitions(spark):
    """With AQE skew-join on (the session default), a 99%-hot-key shuffle join
    must be re-planned at runtime into split partitions — the executed plan
    carries SortMergeJoin(skew=true). This is the engine-level guarantee that
    a hot key at 100 TB degrades into extra parallel tasks, not one straggler
    executor; thresholds are lowered here only to make 'skewed' reachable at
    test size."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(0, 300_000)
            .withColumn("k", F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(F.col("id") % 100))
            .withColumn("pad", F.sha2(F.col("id").cast("string"), 256))
        )
        right = spark.range(0, 200).select(F.col("id").alias("k2"), F.lit("x").alias("tag"))
        joined = left.join(right, F.col("k") == F.col("k2"))
        assert len(joined.collect()) == 300_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_skew_stats_flags_hot_key(spark):
    from parqueryd_spark.operators.scale import skew_stats

    rows = [(i, "hot") for i in range(900)] + [(i, f"k{i % 10}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, k string")
    top, summary = skew_stats(df, ["k"], top=3)
    assert summary["n_rows"] == 1000 and summary["n_keys"] == 11
    assert summary["max_key_rows"] == 900
    # hot key holds 90% over 11 keys -> skew factor ~9.9, salt ~10
    assert summary["skew_factor"] > 9
    assert 8 <= summary["suggested_salt_buckets"] <= 12
    assert top.first().k == "hot"


def test_skew_stats_uniform_key_needs_no_salt(spark):
    from parqueryd_spark.operators.scale import skew_stats

    df = spark.createDataFrame([(i, f"k{i % 20}") for i in range(400)], "id long, k string")
    _top, summary = skew_stats(df, ["k"])
    assert summary["skew_factor"] == 1.0
    assert summary["suggested_salt_buckets"] == 1


def test_salted_join_matches_plain_join_all_hows(spark):
    """salted_join must be row-for-row equivalent to the plain join for every
    supported (left-preserving) how, including null-key and no-match rows."""
    from parqueryd_spark.operators.scale import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (None, "e")],
        "k int, lv string",
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y"), (4, "Z")], "k int, rv string")
    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = {tuple(r) for r in left.join(right, "k", how).collect()}
        salted = {
            tuple(r) for r in salted_join(left, right, "k", salt_buckets=4, how=how).collect()
        }
        assert salted == plain, how


def test_salted_join_rejects_right_preserving_hows(spark):
    import pytest

    from parqueryd_spark.operators.scale import salted_join

    left = spark.createDataFrame([(1, "a")], "k int, lv string")
    right = spark.createDataFrame([(1, "X")], "k int, rv string")
    for how in ("right", "full", "left_outer_bogus"):
        with pytest.raises(ValueError):
            salted_join(left, right, "k", how=how)


def test_salted_join_spreads_hot_key(spark):
    """A key owning most rows must land in multiple salt buckets — the whole
    point. Inspect the salt distribution the operator derives."""
    from pyspark.sql import functions as F

    hot = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id").alias("lv"))
    salted = hot.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*hot.columns)), F.lit(8)).cast("int")
    )
    per_bucket = salted.groupBy("__salt").count().collect()
    assert len(per_bucket) == 8  # every bucket used
    counts = [r["count"] for r in per_bucket]
    assert max(counts) < 2 * min(counts)  # roughly level


def test_salted_operators_reject_reserved_salt_column(spark):
    """ADVICE r7: a pre-existing __salt column would be silently replaced and
    dropped — both salted operators must refuse it up front."""
    import pytest

    from parqueryd_spark.operators.scale import salted_groupby_agg, salted_join

    tainted = spark.createDataFrame([(1, 0)], "k int, __salt int")
    clean = spark.createDataFrame([(1, "X")], "k int, rv string")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(tainted, clean, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(clean.withColumnRenamed("rv", "lv"), tainted, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_groupby_agg(tainted, ["k"], {"n": ("k", "count")})


def test_salted_join_identical_duplicate_rows_share_salt(spark):
    """Documented caveat: whole-row-hash salting gives IDENTICAL rows the same
    salt (no spread), while rows differing in any column spread. Pins the
    caveat so the docstring stays honest; results stay correct either way."""
    from pyspark.sql import functions as F

    from parqueryd_spark.operators.scale import salted_join

    dup = spark.range(1000).select(F.lit(7).alias("k"), F.lit("same").alias("lv"))
    salts = (
        dup.withColumn(
            "__salt", F.pmod(F.xxhash64(F.struct(*dup.columns)), F.lit(8)).cast("int")
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts == 1  # identical rows -> one bucket (the caveat)
    right = spark.createDataFrame([(7, "X")], "k int, rv string")
    out = salted_join(dup, right, "k", salt_buckets=8).collect()
    assert len(out) == 1000 and all(r["rv"] == "X" for r in out)  # still correct
