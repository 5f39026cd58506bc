"""Scalar function library coverage — string/date/math/json/conditional
expressions. The reference has no expression language at all (SURVEY.md §2.2:
"no scalar function library"); these are Spark built-ins (JVM-side, codegen'd),
demonstrated as oracle-checked queries.

Cross-engine gotcha: ``round()`` is avoided on .5-tie-prone data (Spark
HALF_UP vs DuckDB's rounding can differ); floor/ceil/abs/sqrt/ln are exact or
bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.queries import query
from parqueryd_spark.sources.parquet import load_table


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT upper(p_brand)                         AS brand_u,
           count(p_partkey)                       AS n,
           min(length(p_name))                    AS min_name_len,
           max(substring(p_type, 1, 3))           AS type_prefix_max,
           count(CASE WHEN p_name LIKE '%widget%' THEN 1 END) AS n_widget,
           max(concat(p_brand, ':', lower(p_type))) AS brand_type_max,
           max(replace(p_type, ' ', '_'))          AS type_underscored_max
    FROM part
    WHERE trim(p_type) <> ''
    GROUP BY upper(p_brand)
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.trim(F.col("p_type")) != "")
    return part.groupBy(F.upper("p_brand").alias("brand_u")).agg(
        F.count("p_partkey").alias("n"),
        F.min(F.length("p_name")).alias("min_name_len"),
        F.max(F.substring("p_type", 1, 3)).alias("type_prefix_max"),
        F.count(F.when(F.col("p_name").like("%widget%"), 1)).alias("n_widget"),
        F.max(F.concat(F.col("p_brand"), F.lit(":"), F.lower("p_type"))).alias("brand_type_max"),
        F.max(F.replace(F.col("p_type"), F.lit(" "), F.lit("_"))).alias("type_underscored_max"),
    )


@query(
    "scalar_date_json_funcs",
    oracle="""
    SELECT event_type,
           year(ts)                        AS yr,
           month(ts)                       AS mo,
           date_trunc('month', ts)         AS month_start,
           count(event_id)                 AS n,
           min(day(ts))                    AS min_day,
           strftime(max(date_trunc('second', ts)), '%Y-%m-%d %H:%M:%S') AS max_ts_s,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER))                 AS max_k,
           count(json_extract_string(props, '$.missing'))                          AS n_missing
    FROM events
    GROUP BY event_type, year(ts), month(ts), date_trunc('month', ts)
    """,
)
def scalar_date_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction + JSON extraction in one pass over events (merged
    from scalar_date_funcs + scalar_json_funcs to fit the gate window):
    year/month/day/date_trunc/format on the timestamp column, and
    get_json_object on the string props column (missing paths yield NULL on
    both engines). Date-typed outputs are avoided (they stringify differently
    across engines) — formatted strings instead."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy(
        "event_type",
        F.year("ts").alias("yr"),
        F.month("ts").alias("mo"),
        F.date_trunc("month", "ts").alias("month_start"),
    ).agg(
        F.count("event_id").alias("n"),
        F.min(F.dayofmonth("ts")).alias("min_day"),
        F.date_format(F.max(F.date_trunc("second", "ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "max_ts_s"
        ),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.get_json_object("props", "$.missing")).alias("n_missing"),
    )


@query(
    "scalar_math_bucketing",
    oracle="""
    SELECT CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS qty_bucket,
           count(l_orderkey)                  AS n,
           sum(floor(l_extendedprice))        AS sum_floor,
           sum(ceil(l_quantity))              AS sum_ceil,
           sum(abs(l_discount - 0.05))        AS sum_absdev,
           avg(sqrt(l_extendedprice))         AS avg_sqrt,
           avg(ln(l_extendedprice + 1))       AS avg_ln,
           max(power(l_tax, 2))               AS max_tax_sq,
           CAST(sum(l_linenumber % 3) AS BIGINT)     AS sum_mod,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.50) AS median_price,
           quantile_cont(l_extendedprice, 0.75) AS p75
    FROM lineitem
    GROUP BY 1
    """,
)
def scalar_math_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function + CASE WHEN bucketing + exact-percentile coverage in one
    aggregation (merged from scalar_math_funcs + case_when_bucketing +
    groupby_percentiles to fit the gate window). Exact interpolated
    percentiles (Spark `percentile` == DuckDB quantile_cont); at 100 TB
    prefer percentile_approx (mergeable sketch, no per-group sort buffer)."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_bucket")
    )
    return li.groupBy(bucket).agg(
        F.count("l_orderkey").alias("n"),
        # Spark floor/ceil return LONG, DuckDB's return DOUBLE — cast the sums
        # to double so the result schemas agree
        F.sum(F.floor("l_extendedprice")).cast("double").alias("sum_floor"),
        F.sum(F.ceil("l_quantity")).cast("double").alias("sum_ceil"),
        F.sum(F.abs(F.col("l_discount") - 0.05)).alias("sum_absdev"),
        F.avg(F.sqrt("l_extendedprice")).alias("avg_sqrt"),
        F.avg(F.log(F.col("l_extendedprice") + 1)).alias("avg_ln"),
        F.max(F.pow("l_tax", 2)).alias("max_tax_sq"),
        F.sum(F.col("l_linenumber") % 3).cast("long").alias("sum_mod"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
        F.expr("percentile(l_extendedprice, 0.50)").alias("median_price"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("p75"),
    )
