"""Plan-time file skipping and point-in-time dimensions on plain parquet —
the two round-8 families working together:

    layout:  cluster a fact table by the hot filter column and publish it
             with a zone-map manifest (one footer sweep)
    query:   selective scans prune whole files from the manifest BEFORE
             Spark schedules the read (same where-term triples the engine
             executes), then apply the exact filter
    history: maintain a customer-tier dimension as SCD2 version chains and
             join facts against the tier that was IN FORCE at fact time

Runnable:

    python examples/layout_and_history.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.operators.history import scd2_as_of, scd2_init
from parqueryd_spark.sources.manifest import build_manifest, scan_pruned, skip_stats


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="layout_history_")

    # ---- publish a value-clustered fact table + its zone-map manifest ----
    facts_dir = os.path.join(root, "facts")
    facts = spark.range(100_000).select(
        F.col("id").alias("fact_id"),
        F.pmod(F.col("id"), F.lit(50)).alias("customer_id"),
        (F.col("id") % 1000).cast("double").alias("amount"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
    )
    (
        facts.repartitionByRange(16, "amount")
        .sortWithinPartitions("amount")
        .write.mode("overwrite")
        .parquet(facts_dir)
    )
    manifest = build_manifest(spark, facts_dir).cache()

    terms = [["amount", ">=", 990.0]]  # top 1% of the amount range
    print("skip stats:", skip_stats(manifest, terms))
    big = scan_pruned(spark, facts_dir, terms, manifest=manifest)
    print("rows matching:", big.count())

    # ---- SCD2 dimension: customer tier changes over time ----
    changes = spark.createDataFrame(
        [
            (c, dt.datetime(2024, 1, 1), "bronze", 0)
            for c in range(50)
        ]
        + [
            (c, dt.datetime(2024, 1, 1, 12), "gold", 1)
            for c in range(0, 50, 5)  # every 5th customer upgraded at noon
        ],
        "customer_id long, ts timestamp, tier string, seq int",
    )
    hist = scd2_init(
        changes, ["customer_id"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"]
    )

    # point-in-time join: the tier in force when each fact happened.
    # (as-of JOIN by range; for a snapshot at one instant use scd2_as_of);
    # the history keeps its change-log ts column — drop it so the fact ts
    # is unambiguous
    hist = hist.drop("ts", "seq")
    joined = big.join(hist, "customer_id").filter(
        (F.col("ts") >= F.col("eff_from"))
        & (F.col("eff_to").isNull() | (F.col("ts") < F.col("eff_to")))
    )
    print("high-amount facts by tier IN FORCE at fact time:")
    joined.groupBy("tier").count().orderBy("tier").show()

    snap = scd2_as_of(hist, dt.datetime(2024, 1, 1, 6))
    print("tiers at 06:00 (before the noon upgrades):")
    snap.groupBy("tier").count().show()

    spark.stop()


if __name__ == "__main__":
    main()
