"""A serving table kept current from a CDC feed — the mutable-table loop a
plain-parquet dataset runs without a table format:

    day 0: publish the base table hive-partitioned by day
    feed:  change files land (replace / insert / delete rows, with a
           sequence number per change)
    apply: a Structured Streaming query merges each micro-batch through the
           partition-pruned upsert — only the touched day-partitions are
           rewritten, emptied partitions are dropped, replays are idempotent

Runnable:

    python examples/cdc_serving_table.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.sources.parquet import load_table
from parqueryd_spark.streaming.cdc import stream_apply_cdc

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("cdc-serving-table")

    with tempfile.TemporaryDirectory() as work:
        table = os.path.join(work, "orders_serving")
        feed = os.path.join(work, "changes")
        os.makedirs(feed)

        # day 0: a serving copy of orders, partitioned by priority (stand-in
        # for the usual date partition so the demo touches few partitions)
        orders = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        orders.write.partitionBy("o_orderpriority").parquet(table)
        n0 = spark.read.parquet(table).count()
        a, b = orders.orderBy("o_orderkey").limit(2).collect()
        print(f"published {n0} orders; will mutate keys {a.o_orderkey}, {b.o_orderkey}")

        # the feed: one file per arriving change batch. NOTE the partition-
        # pruned merge only scans partitions named in the batch — a change
        # (including a delete) must carry the key's CURRENT partition value.
        pd.DataFrame(
            [
                (a.o_orderkey, a.o_orderpriority, 0.0, False, 1),  # reprice
                (999_999_001, "5-LOW", 42.0, False, 2),            # brand-new order
            ],
            columns=["o_orderkey", "o_orderpriority", "o_totalprice", "is_delete", "seq"],
        ).to_parquet(os.path.join(feed, "c1.parquet"))
        time.sleep(1.1)
        pd.DataFrame(
            [(b.o_orderkey, b.o_orderpriority, None, True, 3)],    # cancellation
            columns=["o_orderkey", "o_orderpriority", "o_totalprice", "is_delete", "seq"],
        ).to_parquet(os.path.join(feed, "c2.parquet"))

        schema = spark.read.parquet(os.path.join(feed, "c1.parquet")).schema
        changes = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed)
        )
        stream_apply_cdc(
            changes,
            table,
            os.path.join(work, "ckpt"),
            key_cols=["o_orderkey"],
            partition_col="o_orderpriority",
            delete_col="is_delete",
            seq_col="seq",
        ).awaitTermination()

        served = spark.read.parquet(table)
        print(f"after feed: {served.count()} rows (was {n0}: +1 insert, -1 delete)")
        print(
            "mutated row:",
            served.filter(F.col("o_orderkey") == a.o_orderkey).first(),
        )
        assert served.filter(F.col("o_orderkey") == b.o_orderkey).count() == 0
        assert served.filter(F.col("o_orderkey") == 999_999_001).count() == 1
        print("serving table is current — cancellation gone, new order visible")


if __name__ == "__main__":
    main()
