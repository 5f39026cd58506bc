"""Joins, windows, sorts/top-k, set ops, grouping sets — the relational
categories the reference lacks entirely (SURVEY.md §2.2), as Spark built-ins.

Scale posture per query is noted inline; dimension joins broadcast explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parqueryd_spark.operators.relational import asof_join, topk
from parqueryd_spark.queries import query, table_path
from parqueryd_spark.sources.parquet import load_table


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, n_name,
           count(c_custkey)  AS n_customers,
           sum(c_acctbal)    AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    bench=True,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim join: nation/region are broadcast (map-side join, zero
    shuffle of the fact side) — at 100 TB the fact table never moves."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.sum("c_acctbal").alias("sum_acctbal"),
        )
    )


@query(
    "join_fact_fact_revenue",
    oracle="""
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(DISTINCT o_orderkey)                        AS n_orders
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority
    """,
    bench=True,
)
def join_fact_fact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join: shuffles both sides on the key (sort-merge /
    shuffled-hash chosen by Catalyst+AQE); filter pushed to the orders scan.

    The double sum is rounded to 2dp on both sides: Spark's partial/final
    accumulation order over the shuffle differs from DuckDB's, so the raw
    low bits diverge (round-1 gate hash failure)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1996-01-01")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, count(c_custkey) AS n_with_f_orders
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi = EXISTS; no right-side columns materialize, build side only
    needs the distinct keys."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("c_custkey").alias("n_with_f_orders"))
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, count(c_custkey) AS n_without_orders
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti = NOT EXISTS: customers with no orders since 2000 (every
    customer has SOME order in this data, so the unfiltered anti-join would
    be vacuously empty — 135 customers qualify at sf0.01)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("c_custkey").alias("n_without_orders"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT p_brand,
           count(l_orderkey)                       AS n_lineitems,
           CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                   AS n_unsold_parts
    FROM part LEFT JOIN lineitem ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(lineitem, lineitem.l_partkey == part.p_partkey, "left")
        .groupBy("p_brand")
        .agg(
            F.count("l_orderkey").alias("n_lineitems"),
            F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unsold_parts"),
        )
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k => TakeOrderedAndProject (no full sort); deterministic via
    o_orderkey tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    return topk(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        10,
    )


@query(
    "window_topn_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window + filter => per-group top-n; Spark pushes a group-local
    limit below the shuffle (WindowGroupLimit) — no full per-group sort at scale."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_and_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           sum(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_spend,
           lag(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price,
           avg(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS avg_last3
    FROM orders WHERE o_custkey < 50
    """,
)
def window_running_and_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running sum, lag, sliding row frame — deterministic via
    (o_orderdate, o_orderkey) full ordering."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.avg("o_totalprice").over(w.rowsBetween(-2, W.currentRow)).alias("avg_last3"),
    )


@query(
    "window_analytics_extended",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           lead(o_totalprice) OVER w                  AS next_price,
           first_value(o_totalprice) OVER w           AS first_price,
           ntile(4) OVER w                            AS quartile,
           CAST(percent_rank() OVER w AS DOUBLE)      AS pct_rank,
           CAST(cume_dist() OVER w AS DOUBLE)         AS cume
    FROM orders
    WHERE o_custkey < 20
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_analytics_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead / first_value / ntile / percent_rank / cume_dist over a fully
    ordered window (deterministic via the o_orderkey tie-break)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
    )


@query(
    "string_agg_ordered",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities,
           count(o_orderkey) AS n
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_set -> array_sort -> concat_ws makes
    the nondeterministic collection order deterministic (the only safe way to
    emit aggregated strings from a distributed engine)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_set("o_orderpriority"))).alias("priorities"),
            F.count("o_orderkey").alias("n"),
        )
    )


@query(
    "set_intersect_except",
    oracle="""
    WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT 'both'   AS bucket, count(*) AS n FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
    UNION ALL
    SELECT 'f_only' AS bucket, count(*) AS n FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
    """,
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct set semantics) summarized into one row each."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f.intersect(o).agg(F.count("*").alias("n")).select(F.lit("both").alias("bucket"), "n")
    f_only = f.exceptAll(o).agg(F.count("*").alias("n")).select(F.lit("f_only").alias("bucket"), "n")
    return both.unionByName(f_only)


@query(
    "having_filter",
    oracle="""
    SELECT l_partkey, count(l_orderkey) AS n, sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(l_orderkey) >= 25 AND sum(l_quantity) > 500
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) — a filter above the agg in the plan,
    which Catalyst cannot push below it."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_partkey")
        .agg(F.count("l_orderkey").alias("n"), F.sum("l_quantity").alias("sum_qty"))
        .filter((F.col("n") >= 25) & (F.col("sum_qty") > 500))
    )


@query(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT p_brand, count(p_partkey) AS n_above_avg, max(p_retailprice) AS max_price
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    GROUP BY p_brand
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern (rows above the global average) — expressed as a
    broadcast cross-join of the 1-row aggregate, the plan Spark produces for a
    scalar subquery anyway."""
    part = load_table(spark, sf_dir, "part")
    avg_price = part.agg(F.avg("p_retailprice").alias("__avg"))
    return (
        part.crossJoin(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("__avg"))
        .groupBy("p_brand")
        .agg(F.count("p_partkey").alias("n_above_avg"), F.max("p_retailprice").alias("max_price"))
    )


@query(
    "set_union_distinct",
    oracle="""
    SELECT k, count(*) AS n FROM (
      SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45
      UNION
      SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 4000
    ) GROUP BY k
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics (vs the shard-merge UNION ALL of O7)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    a = lineitem.filter(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("k"))
    b = supplier.filter(F.col("s_acctbal") > 4000).select(F.col("s_suppkey").cast("long").alias("k"))
    return a.union(b).distinct().groupBy("k").agg(F.count("*").alias("n"))


@query(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(l_orderkey) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total; NULL group markers)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("l_orderkey").alias("cnt")
    )


@query(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(o_orderkey) AS cnt
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(F.count("o_orderkey").alias("cnt"))


@query(
    "grouping_sets_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (an arbitrary set list — rollup/cube are just
    special cases) with grouping_id to disambiguate NULL-as-subtotal from
    NULL-as-data. The DataFrame API only exposes rollup/cube, so this goes
    through spark.sql over a temp view — same Catalyst Expand-based plan."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               grouping_id(l_returnflag, l_linestatus) AS gid,
               sum(l_quantity) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """)


@query(
    "pivot_agg",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for distinct
    pivot values at 100 TB)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).sum("l_quantity")


@query(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.select("l_returnflag", "l_linestatus").distinct()


@query(
    "range_join_price_bands",
    oracle="""
    WITH bands AS (
      SELECT i AS band_id, i * 50000.0 AS lo, (i + 1) * 50000.0 AS hi
      FROM generate_series(0, 9) t(i)
    )
    SELECT band_id, count(o_orderkey) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_id
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval containment) join. Naive form is broadcast-nested-loop;
    for *uniform* bands the scale path is O(1) arithmetic binning — compute the
    band id with floor(), then equi-join the (tiny, broadcast) bands table.

    sum_price is rounded to 2dp on both engines: Spark and DuckDB accumulate
    the doubles in different orders, so the raw sums differ in the last ulps
    and break the driver's exact value hash (same fix as
    join_fact_fact_revenue)."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.range(0, 10).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 50000.0).alias("lo"),
        ((F.col("id") + 1) * 50000.0).alias("hi"),
    )
    binned = orders.withColumn("band_id", F.floor(F.col("o_totalprice") / 50000.0).cast("int"))
    return (
        binned.join(F.broadcast(bands), "band_id")  # equi-join after arithmetic binning
        .groupBy("band_id")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "salted_skew_groupby",
    oracle="""
    SELECT l_returnflag,
           sum(l_quantity)      AS sum_qty,
           count(l_orderkey)    AS cnt,
           max(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_skew_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/scale.py) — semantics-preserving
    skew mitigation, so the oracle is the plain GROUP BY. lineitem's 3-value
    l_returnflag key IS maximally skewed: every row lands on one of 3 reducers
    unsalted; salting spreads each key over 16 before the merge."""
    from parqueryd_spark.operators.scale import salted_groupby_agg

    li = load_table(spark, sf_dir, "lineitem")
    return salted_groupby_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "cnt": ("l_orderkey", "count"),
            "max_price": ("l_extendedprice", "max"),
        },
    )


@query(
    "asof_join_events",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.value AS last_click_value, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (most recent prior click per purchase) — the custom operator
    Spark lacks; union+window formulation, one shuffle (operators/relational.py)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.col("value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").alias("last_click_value"),
        F.col("ts_right").alias("click_ts"),
    )
