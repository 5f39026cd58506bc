"""Core parity queries: the reference's groupby(filenames, groupby_cols,
agg_list, where_terms, aggregate=) surface (SURVEY.md §2 O1-O7)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from parqueryd_spark.core import aggregate_files
from parqueryd_spark.queries import query, table_path


def _li(sf_dir: str) -> str:
    return table_path(sf_dir, "lineitem")


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)      AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           avg(l_quantity)      AS avg_qty,
           avg(l_extendedprice) AS avg_price,
           avg(l_discount)      AS avg_disc,
           count(l_orderkey)    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 skeleton through the parqueryd-parity API
    (reference call shape: README.md:111, worker.py:379-397)."""
    return aggregate_files(
        spark,
        [_li(sf_dir)],
        ["l_returnflag", "l_linestatus"],
        [
            ["l_quantity", "sum", "sum_qty"],
            ["l_extendedprice", "sum", "sum_base_price"],
            ["l_quantity", "mean", "avg_qty"],
            ["l_extendedprice", "mean", "avg_price"],
            ["l_discount", "mean", "avg_disc"],
            ["l_orderkey", "count", "count_order"],
        ],
        where_terms=[["l_shipdate", "<=", "1998-09-02"]],
    )


@query(
    "groupby_sum_shorthand",
    oracle="""
    SELECT l_returnflag, sum(l_quantity) AS l_quantity
    FROM lineitem GROUP BY l_returnflag
    """,
)
def groupby_sum_shorthand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare-name agg shorthand ['col'] -> sum into same name (README.md:105)."""
    return aggregate_files(spark, [_li(sf_dir)], ["l_returnflag"], ["l_quantity"])


@query(
    "groupby_min_max",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           min(l_shipdate)      AS min_ship,
           max(l_shipdate)      AS max_ship
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregate_files(
        spark,
        [_li(sf_dir)],
        ["l_returnflag", "l_linestatus"],
        [
            ["l_extendedprice", "min", "min_price"],
            ["l_extendedprice", "max", "max_price"],
            ["l_shipdate", "min", "min_ship"],
            ["l_shipdate", "max", "max_ship"],
        ],
    )


@query(
    "groupby_std",
    oracle="""
    SELECT o_orderstatus, stddev_samp(o_totalprice) AS std_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def groupby_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """std is sample-std (ddof=1), matching the pandas oracle the reference's
    differential test used (tests/test_simple_rpc.py:112-131)."""
    return aggregate_files(
        spark,
        [os.path.join(sf_dir, "orders.parquet")],
        ["o_orderstatus"],
        [["o_totalprice", "std", "std_price"]],
    )


@query(
    "groupby_count_variants",
    oracle="""
    SELECT l_returnflag,
           count(l_partkey)                                  AS cnt,
           CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cnt_na,
           count(DISTINCT l_partkey)                          AS cnt_distinct,
           count(DISTINCT l_suppkey)                          AS cnt_sorted_distinct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def groupby_count_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / count_na / count_distinct / sorted_count_distinct (SURVEY §2 O5)."""
    return aggregate_files(
        spark,
        [_li(sf_dir)],
        ["l_returnflag"],
        [
            ["l_partkey", "count", "cnt"],
            ["l_partkey", "count_na", "cnt_na"],
            ["l_partkey", "count_distinct", "cnt_distinct"],
            ["l_suppkey", "sorted_count_distinct", "cnt_sorted_distinct"],
        ],
    )


@query(
    "where_ops_combo",
    oracle="""
    SELECT l_linestatus,
           sum(l_extendedprice) AS sum_price,
           count(l_orderkey)    AS cnt
    FROM lineitem
    WHERE l_returnflag != 'R'
      AND l_quantity > 5 AND l_quantity <= 45
      AND l_linenumber IN (1, 2, 3)
      AND l_suppkey NOT IN (1, 2)
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l_linestatus
    """,
)
def where_ops_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every where-term op in one AND-combined predicate (SURVEY §2 O2)."""
    return aggregate_files(
        spark,
        [_li(sf_dir)],
        ["l_linestatus"],
        [["l_extendedprice", "sum", "sum_price"], ["l_orderkey", "count", "cnt"]],
        where_terms=[
            ["l_returnflag", "!=", "R"],
            ["l_quantity", ">", 5],
            ["l_quantity", "<=", 45],
            ["l_linenumber", "in", [1, 2, 3]],
            ["l_suppkey", "not in", [1, 2]],
            ["l_shipdate", ">=", "1996-01-01"],
        ],
    )


@query(
    "where_eq_string",
    oracle="""
    SELECT o_orderpriority, count(o_orderkey) AS cnt, sum(o_totalprice) AS sum_price
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
    """,
)
def where_eq_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregate_files(
        spark,
        [os.path.join(sf_dir, "orders.parquet")],
        ["o_orderpriority"],
        [["o_orderkey", "count", "cnt"], ["o_totalprice", "sum", "sum_price"]],
        where_terms=[["o_orderstatus", "==", "F"]],
    )


@query(
    "raw_mode_no_aggregate",
    oracle="""
    SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_quantity < 10
    """,
)
def raw_mode_no_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate=False: filtered+projected rows, no aggregation (worker.py:385,
    rpc.py:173 — the client-side default)."""
    return aggregate_files(
        spark,
        [_li(sf_dir)],
        ["l_returnflag", "l_linestatus"],
        [["l_quantity", "sum", "l_quantity"], ["l_extendedprice", "sum", "l_extendedprice"]],
        where_terms=[["l_shipdate", "<", "1995-06-01"], ["l_quantity", "<", 10]],
        aggregate=False,
    )


@query(
    "missing_shards_ignored",
    oracle="""
    SELECT o_orderstatus, count(o_orderkey) AS cnt
    FROM orders GROUP BY o_orderstatus
    """,
)
def missing_shards_ignored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonexistent shard silently dropped from the path list
    (controller.py:618-621; RELEASE_NOTES.rst:63-65)."""
    return aggregate_files(
        spark,
        [
            os.path.join(sf_dir, "orders.parquet"),
            os.path.join(sf_dir, "no_such_shard_xyz.parquet"),
        ],
        ["o_orderstatus"],
        [["o_orderkey", "count", "cnt"]],
    )


@query(
    "global_agg_no_keys",
    oracle="""
    SELECT sum(l_extendedprice) AS total_price,
           avg(l_discount)      AS avg_disc,
           count(l_orderkey)    AS cnt
    FROM lineitem
    """,
)
def global_agg_no_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty groupby list -> single-row global aggregate."""
    return aggregate_files(
        spark,
        [_li(sf_dir)],
        [],
        [
            ["l_extendedprice", "sum", "total_price"],
            ["l_discount", "mean", "avg_disc"],
            ["l_orderkey", "count", "cnt"],
        ],
    )
