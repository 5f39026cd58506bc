"""Data-quality queries (operators/quality.py): a constraint report over the
TPC-H fixture's real invariants and ANALYZE-style per-column statistics.
Registered past the gate window; oracle-checked by tests/test_registry_oracle
and tools/driver_sim."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.operators.quality import (
    check_foreign_key,
    check_not_null,
    check_range,
    check_unique,
    quality_report,
    table_stats,
)
from parqueryd_spark.queries import query
from parqueryd_spark.sources.parquet import load_table


@query(
    "quality_checks",
    oracle="""
    WITH u AS (
      SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS v
      FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1) WHERE n > 1
    ),
    nn AS (
      SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                + sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v
      FROM orders
    ),
    fk1 AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    ),
    fk2 AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    ),
    r1 AS (
      SELECT CAST(sum(CASE WHEN l_quantity IS NOT NULL
                            AND l_quantity NOT BETWEEN 1 AND 50
                           THEN 1 ELSE 0 END) AS BIGINT) AS v FROM lineitem
    ),
    r2 AS (
      SELECT CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                            AND o_totalprice NOT BETWEEN 0 AND 100000
                           THEN 1 ELSE 0 END) AS BIGINT) AS v FROM orders
    )
    SELECT 'unique(o_orderkey)' AS check_name, v AS violations, v = 0 AS passed FROM u
    UNION ALL SELECT 'not_null(o_custkey,o_orderdate)', v, v = 0 FROM nn
    UNION ALL SELECT 'fk(o_custkey->c_custkey)', v, v = 0 FROM fk1
    UNION ALL SELECT 'fk(l_orderkey->o_orderkey)', v, v = 0 FROM fk2
    UNION ALL SELECT 'range(l_quantity,[1,50])', v, v = 0 FROM r1
    UNION ALL SELECT 'range(o_totalprice,[0,100000])', v, v = 0 FROM r2
    """,
)
def quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt/deequ-style constraint report over the fixture's invariants:
    key uniqueness, non-null columns, two referential checks, and two value
    ranges (the o_totalprice cap is deliberately tight enough to produce
    real violations, so the report exercises the failing path too)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    rep = quality_report(
        [
            check_unique(orders, ["o_orderkey"], name="unique(o_orderkey)"),
            check_not_null(
                orders,
                ["o_custkey", "o_orderdate"],
                name="not_null(o_custkey,o_orderdate)",
            ),
            check_foreign_key(
                orders, "o_custkey", customer, "c_custkey",
                name="fk(o_custkey->c_custkey)",
            ),
            check_foreign_key(
                lineitem, "l_orderkey", orders, "o_orderkey",
                name="fk(l_orderkey->o_orderkey)",
            ),
            check_range(lineitem, "l_quantity", 1, 50, name="range(l_quantity,[1,50])"),
            check_range(
                orders, "o_totalprice", 0, 100000,
                name="range(o_totalprice,[0,100000])",
            ),
        ]
    )
    return rep.withColumnRenamed("check", "check_name")


@query(
    "table_stats_part",
    oracle="""
    WITH n AS (SELECT count(*) AS n_rows FROM part)
    SELECT 'p_partkey' AS "column", n.n_rows,
           CAST((SELECT count(*) - count(p_partkey) FROM part) AS BIGINT) AS n_nulls,
           (SELECT count(DISTINCT p_partkey) FROM part) AS n_distinct,
           (SELECT CAST(min(p_partkey) AS VARCHAR) FROM part) AS min_value,
           (SELECT CAST(max(p_partkey) AS VARCHAR) FROM part) AS max_value
    FROM n
    UNION ALL
    SELECT 'p_brand', n.n_rows,
           CAST((SELECT count(*) - count(p_brand) FROM part) AS BIGINT),
           (SELECT count(DISTINCT p_brand) FROM part),
           (SELECT min(p_brand) FROM part),
           (SELECT max(p_brand) FROM part)
    FROM n
    UNION ALL
    SELECT 'p_size', n.n_rows,
           CAST((SELECT count(*) - count(p_size) FROM part) AS BIGINT),
           (SELECT count(DISTINCT p_size) FROM part),
           (SELECT CAST(min(p_size) AS VARCHAR) FROM part),
           (SELECT CAST(max(p_size) AS VARCHAR) FROM part)
    FROM n
    UNION ALL
    SELECT 'p_type', n.n_rows,
           CAST((SELECT count(*) - count(p_type) FROM part) AS BIGINT),
           (SELECT count(DISTINCT p_type) FROM part),
           (SELECT min(p_type) FROM part),
           (SELECT max(p_type) FROM part)
    FROM n
    """,
)
def table_stats_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE over four part columns in one scan (operators/quality.py
    table_stats): null counts, exact distinct counts, stringified min/max —
    the planner/data-quality statistics surface."""
    part = load_table(spark, sf_dir, "part")
    return table_stats(part, ["p_partkey", "p_brand", "p_size", "p_type"])


_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]
_DIFF_COMPARE = " OR ".join(
    f"a.{c} IS DISTINCT FROM b.{c}" for c in _ORDER_COLS if c != "o_orderkey"
)
_B_COLS = ",\n             ".join(
    "CASE WHEN o_orderkey % 97 = 0 THEN round(o_totalprice * 1.05, 2)"
    " ELSE o_totalprice END AS o_totalprice"
    if c == "o_totalprice"
    else c
    for c in _ORDER_COLS
)


@query(
    "table_diff_snapshots",
    oracle=f"""
    WITH a AS (
      SELECT * FROM orders WHERE o_orderkey % 101 <> 0
    ), b AS (
      SELECT {_B_COLS}
      FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR ({_DIFF_COMPARE})
    """,
)
def table_diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/quality.py:table_diff): diff two
    simulated generations of the orders table — one with ~1% of keys absent
    (added in the new snapshot), the other with ~1% dropped and ~1% repriced
    — into (status, key) rows. The oracle rebuilds the same diff with a full
    outer join and IS DISTINCT FROM column compares, independently of the
    operator's xxhash64 digest."""
    from parqueryd_spark.operators.quality import table_diff

    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderkey") % 101 != 0)
    b = orders.where(F.col("o_orderkey") % 89 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.round(F.col("o_totalprice") * 1.05, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    return table_diff(a, b, ["o_orderkey"])
