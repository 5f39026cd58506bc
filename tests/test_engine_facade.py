"""ParquetEngine facade parity: concat shard-merge mode, info files_map,
apply_pandas (the typed execute_code replacement)."""

from __future__ import annotations

import os

from parqueryd_spark.core import ParquetEngine, aggregate_files
from tests.conftest import SF_SMOKE


def test_concat_shard_merge_reproduces_reference_duplicates(spark, tmp_path):
    """shard_merge='concat' reproduces the reference O7 artifact: per-shard
    partials concatenated, duplicate group keys surviving (controller.py:276-294)."""
    import pyarrow.parquet as pq

    table = pq.read_table(os.path.join(SF_SMOKE, "lineitem.parquet"))
    n = table.num_rows
    shards = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.parquet")
        pq.write_table(table.slice(i * n // 3, (i + 1) * n // 3 - i * n // 3), p)
        shards.append(p)

    args = (["l_returnflag"], [["l_quantity", "sum", "s"]])
    concat = aggregate_files(spark, shards, *args, shard_merge="concat").toPandas()
    glob = aggregate_files(spark, shards, *args, shard_merge="global").toPandas()
    # 3 groups per shard -> 9 rows concat vs 3 rows global
    assert len(concat) == 3 * len(glob)
    # and the partials sum to the global answer
    assert abs(concat.groupby("l_returnflag")["s"].sum().sum() - glob["s"].sum()) < 1e-6


def test_info_lists_data_files(spark):
    eng = ParquetEngine(spark, data_dir=SF_SMOKE)
    info = eng.info()
    assert "lineitem.parquet" in info["data_files"]
    assert info["spark_version"] == spark.version
    assert eng.ping() == "pong"
    # executor-introspection parity (reference controller.py:683-701: per-node
    # uptime / busy workers / files): uptime counts up, executor facts present
    assert info["uptime_seconds"] > 0
    assert info["active_jobs"] >= 0 and info["active_stages"] >= 0
    assert len(info["executors"]) >= 1
    for e in info["executors"]:
        assert ":" in e["host_port"] and e["running_tasks"] >= 0


def test_info_survives_missing_py4j_executor_surface(spark, monkeypatch):
    """Executor detail rides a PRIVATE py4j chain (there is no public PySpark
    getExecutorInfos); if that chain moves in a Spark/py4j upgrade, info()
    must degrade to executors=[] rather than break the whole topology
    snapshot."""
    eng = ParquetEngine(spark, data_dir=SF_SMOKE)
    sc = spark.sparkContext
    real_jsc = sc._jsc

    class _ScStub:
        def __init__(self, real):
            self._real = real

        def statusTracker(self):  # the private surface gone/moved
            raise AttributeError("removed in this py4j version")

        def __getattr__(self, name):
            return getattr(self._real, name)

    class _JscStub:
        def __init__(self, real):
            self._real = real

        def sc(self):
            return _ScStub(self._real.sc())

        def __getattr__(self, name):
            return getattr(self._real, name)

    monkeypatch.setattr(sc, "_jsc", _JscStub(real_jsc))
    info = eng.info()
    assert info["executors"] == []
    assert "lineitem.parquet" in info["data_files"]
    assert info["active_jobs"] >= 0


def test_apply_pandas_replaces_execute_code(spark):
    eng = ParquetEngine(spark, data_dir=SF_SMOKE)

    def double_qty(batches):
        for pdf in batches:
            out = pdf[["l_orderkey"]].copy()
            out["qty2"] = pdf["l_quantity"] * 2
            yield out

    out = eng.apply_pandas(["lineitem.parquet"], double_qty, "l_orderkey long, qty2 double")
    row = out.limit(1).collect()[0]
    assert row.qty2 is not None
    assert out.count() == spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet")).count()

    # all-missing: empty DataFrame with the declared schema, not an error
    empty = eng.apply_pandas(["nope.parquet"], double_qty, "l_orderkey long, qty2 double")
    assert empty.count() == 0 and empty.columns == ["l_orderkey", "qty2"]


def test_attach_tables_and_sql(spark):
    eng = ParquetEngine(spark, data_dir=SF_SMOKE)
    try:
        attached = eng.attach_tables()
        assert {"nation", "region", "lineitem"} <= set(attached)
        row = eng.sql(
            """
            SELECT r_name, count(*) AS n
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
            """
        ).first()
        assert row.r_name == "AFRICA" and row.n == 5
        # restricted attach only registers the requested subset
        assert eng.attach_tables(["nation"]) == ["nation"]
    finally:
        for t in eng.attach_tables():
            spark.catalog.dropTempView(t)


def test_sql_requires_data_dir(spark):
    import pytest

    with pytest.raises(ValueError, match="data_dir"):
        ParquetEngine(spark).attach_tables()


def test_last_call_duration_stamps_per_call(spark):
    """Reference parity: rpc.last_call_duration (rpc.py:186-187) updates after
    every call. Here the facade stamps groupby/sql/apply_pandas — including
    wait=False ticket submissions."""
    eng = ParquetEngine(spark, data_dir=SF_SMOKE)
    assert eng.last_call_duration is None

    eng.groupby(["lineitem.parquet"], ["l_returnflag"], [["l_quantity"]])
    first = eng.last_call_duration
    assert first is not None and first > 0

    try:
        eng.sql("SELECT count(*) AS n FROM nation")
        assert eng.last_call_duration is not None and eng.last_call_duration > 0
        assert eng.last_call_duration != first  # re-stamped, not sticky
    finally:
        for t in eng.attach_tables():
            spark.catalog.dropTempView(t)

    def ident(batches):
        yield from batches

    t = eng.apply_pandas(["nation.parquet"], ident, "n_nationkey long", wait=False)
    assert eng.last_call_duration is not None and eng.last_call_duration > 0
    t.result()


def test_all_missing_groupby_returns_declared_schema(spark):
    """VERDICT r10 item #7: the all-missing groupby returns the DECLARED
    groupby+agg output schema (names exact, counts typed bigint, means
    double, type-inheriting aggs string), not a 0-column frame that blows up
    downstream with an unrelated AnalysisException."""
    eng = ParquetEngine(spark, data_dir="/no/such/dir")
    out = eng.groupby(
        ["nope.parquet"],
        ["l_returnflag"],
        [["l_quantity", "sum", "sum_qty"], ["l_quantity", "mean", "avg_qty"], ["l_orderkey", "count", "n"]],
    )
    assert out.count() == 0
    assert out.columns == ["l_returnflag", "sum_qty", "avg_qty", "n"]
    dt = dict(out.dtypes)
    assert dt["n"] == "bigint" and dt["avg_qty"] == "double"
    # callers can compose on the declared columns without an AnalysisException
    from pyspark.sql import functions as F
    assert out.select("sum_qty").where(F.col("n") > 0).count() == 0
    # raw-rows shape: projection = groupby + agg input cols
    raw = eng.groupby(["nope.parquet"], ["l_returnflag"], [["l_quantity"]], aggregate=False)
    assert raw.columns == ["l_returnflag", "l_quantity"] and raw.count() == 0
