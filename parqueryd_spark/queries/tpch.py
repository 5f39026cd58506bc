"""TPC-H-style multi-join analytical queries over the testdata star schema —
the realistic 100 TB workload shapes (dim broadcast + fact shuffle + agg +
top-k). Float-ranked top-k queries rank on round(revenue, 2) with a key
tie-break so cross-engine ulp noise cannot reorder the cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.queries import query
from parqueryd_spark.sources.parquet import load_table

def _revenue():
    return F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 skeleton: dim filter -> two fact joins -> agg -> top-10."""
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-06-01")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-01")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)  # dim side: AQE broadcasts while it fits
        # fact-fact: both sides scale with SF, so declare the shuffle join
        # outright — a size-estimate broadcast of lineitem is wrong at scale
        # and measurably slower even at bench scale
        .join(lineitem.hint("merge"), lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(_revenue(), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(DISTINCT o_orderkey) AS n_orders
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name IN ('ASIA', 'AFRICA')
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
    bench=True,
)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 skeleton: the always-tiny snowflake dims (nation 25 rows,
    region 5 at ANY scale factor) are hint-broadcast; the customer-side join
    is deliberately left to AQE — customer grows with SF and stops being
    broadcastable at extreme scale, and AQE both auto-broadcasts it while it
    fits and falls back to a shuffle join from runtime stats when it doesn't.
    The orders-lineitem join is hinted to sort-merge: both sides are facts,
    so the only scale-correct strategy is a shuffle join on the key."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AFRICA"))
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1996-01-01")
    lineitem = load_table(spark, sf_dir, "lineitem")
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        orders.join(dims, orders.o_custkey == dims.c_custkey)
        .join(lineitem.hint("merge"), lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("n_name")
        .agg(F.round(_revenue(), 2).alias("revenue"), F.countDistinct("o_orderkey").alias("n_orders"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS forecast_revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + conjunctive filter + global agg — the pushdown
    showcase. All three predicates reach the parquet scan (PushedFilters), so
    at 100 TB only matching row groups are decoded; no shuffle except the
    single-row final agg."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "forecast_revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to this schema's columns): EXISTS decorrelates
    to a LEFT SEMI join with a non-equi conjunct (shipped >60 days after
    ordering). Semi join keeps the probe side at orders width — no lineitem
    columns survive the join, and each order emits at most once."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            lineitem.hint("merge"),  # fact-fact: shuffle semi join, never broadcast lineitem
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
           / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation ratio over the part join. The month
    filter prunes lineitem before the join; part is mid-sized (scales with
    SF), so the join strategy is AQE's call — broadcast while part fits,
    shuffle join beyond."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)  # part scales with SF: AQE decides
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(0.0)) / F.sum(net),
                2,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180) big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: pre-aggregate the fact to order grain FIRST (HAVING prunes
    ~99% of orders), then join the survivors — the aggregate-before-join
    pattern that keeps the big join input small at scale. Ranked on the stored
    o_totalprice column (not a recomputed float), so the top-20 cut is stable
    cross-engine with the o_orderkey tie-break."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)  # AQE decides
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@query(
    "q19_disjunctive_filter",
    oracle="""
    SELECT count(*) AS n_items, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity conjuncts spanning
    both join sides. Catalyst extracts the common-side predicates (quantity
    bands push to the lineitem scan, brand/size to the part scan) before
    evaluating the residual OR above the broadcast join."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def band(brand, size_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        lineitem.join(part, part.p_partkey == lineitem.l_partkey)  # part scales with SF: AQE decides
        .filter(band("Brand#12", 15, 1, 11) | band("Brand#3", 25, 10, 20) | band("Brand#14", 35, 20, 30))
        .agg(
            F.count("*").alias("n_items"),
            F.round(_revenue(), 2).alias("revenue"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 skeleton: who returned the most value — join + agg + top-20."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(lineitem.hint("merge"), lineitem.l_orderkey == orders.o_orderkey)  # fact-fact
        .join(customer, orders.o_custkey == customer.c_custkey)  # dim side: AQE decides
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.round(_revenue(), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
