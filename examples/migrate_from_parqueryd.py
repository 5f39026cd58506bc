"""Side-by-side migration guide: every call a parqueryd user makes today, and
its parqueryd_spark equivalent. Runnable against the bundled testdata:

    python examples/migrate_from_parqueryd.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parqueryd_spark import ParquetEngine, get_spark

DATA_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("migration-example")

    # reference:  rpc = parqueryd.rpc.RPC()           (Redis discovery + zmq)
    # here:       engine bound to a SparkSession + data_dir
    eng = ParquetEngine(spark, data_dir=DATA_DIR)

    # reference:  rpc.ping() / rpc.info()
    print("ping:", eng.ping())
    print("files:", eng.info()["data_files"][:4], "...")

    # reference:  rpc.groupby(['file.parquet'], ['key'], [['m','sum','m']], [],
    #                         aggregate=True)         (README.md:111)
    df = eng.groupby(
        ["lineitem.parquet"],
        ["l_returnflag"],
        [["l_quantity", "sum", "sum_qty"], ["l_extendedprice", "mean", "avg_price"]],
        [["l_shipdate", ">=", "1996-01-01"]],
        aggregate=True,
    )
    print("groupby:")
    df.show()

    # reference:  rpc.last_call_duration  (rpc.py:186-187)
    # stamped after every groupby/sql/apply_pandas; note calls return LAZY
    # DataFrames, so this times the facade call — execution is in the Spark UI
    print("last_call_duration:", eng.last_call_duration)

    # sharded tables: pass every shard path; missing shards silently ignored
    # (controller.py:618-621 semantics), results globally merged (not the
    # reference's duplicate-key concat — pass shard_merge='concat' to
    # aggregate_files for bug-for-bug parity)
    sharded = eng.groupby(
        ["lineitem.parquet", "lineitem-shard-does-not-exist.parquet"],
        ["l_linestatus"],
        [["l_quantity"]],  # bare-name shorthand == sum into same name
    )
    print("sharded (missing shard ignored):")
    sharded.show()

    # reference:  rpc.execute_code(function='module.fn', args=[...])  (RCE RPC)
    # here:       typed Arrow-batched per-batch function over the data
    def enrich(batches):
        for pdf in batches:
            out = pdf[["l_orderkey"]].copy()
            out["value"] = pdf["l_extendedprice"] * (1 - pdf["l_discount"])
            yield out

    enriched = eng.apply_pandas(["lineitem"], enrich, "l_orderkey long, value double")
    print("apply_pandas rows:", enriched.count())

    # reference:  bcolz per-shard metadata let workers skip shards
    # here:       a persisted zone-map manifest does the same from parquet
    #             footers — the SAME where-terms prune whole shards at plan
    #             time, results identical (exact predicate still runs)
    from parqueryd_spark.sources.manifest import build_manifest

    manifest = build_manifest(spark, DATA_DIR)
    pruned = eng.groupby(
        ["lineitem.parquet"],
        ["l_returnflag"],
        [["l_quantity", "sum", "sum_qty"]],
        [["l_shipdate", ">", "1998-09-02"]],
        manifest=manifest,
    )
    print("manifest-pruned groupby:")
    pruned.show()

    # reference:  rpc.download(...) + moveparquet barrier    (S3 -> local sync)
    # here:       not needed — Spark reads object storage directly; atomic
    #             publication is sources.sinks.atomic_publish
    spark.stop()


if __name__ == "__main__":
    main()
