"""Scale-operator tests: salting correctness, bucketed join shuffle elimination."""

from __future__ import annotations

import pandas as pd
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
