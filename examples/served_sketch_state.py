"""Standing sketch state: maintain it from a stream, answer from it forever.

The 100 TB pattern this demonstrates: raw events are expensive to re-read,
so each micro-batch is reduced AT INGEST to kilobytes of mergeable sketch
state in an idempotent ``batch=<id>`` partition — then every later question
(distinct users? overlap between event types? top keys per group? how often
did key X occur?) is answered by merging state, never by scanning raw data.
The serving readers here are exactly what the gate rows
``events_kmv_served`` / ``text_hh_served`` / ``events_countmin_served``
run with raw-table-absent plans.

    maintain (streaming, once per batch):
        stream_maintain_kmv             distinct/overlap state (k-min values)
        stream_maintain_heavy_hitters_grouped   per-group top-k state (MG)
        stream_maintain_countmin        any-key frequency state (CM cells)
    serve (any time, state only):
        read_kmv_distinct / read_kmv_overlap
        read_heavy_hitters_grouped
        read_countmin_estimates

Each serve is checked against the exact answer computed from the raw table
— the checks ARE the sketch contracts (KMV merge ≡ one-shot; MG
est ≤ true ≤ est + bound; CM never undercounts).

Runnable:

    python examples/served_sketch_state.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.sketches import kmv_distinct, kmv_sketch
from parqueryd_spark.sources.parquet import load_table
from parqueryd_spark.streaming.rollup import (
    read_countmin_estimates,
    read_heavy_hitters_grouped,
    read_kmv_distinct,
    read_kmv_overlap,
    stream_maintain_countmin,
    stream_maintain_heavy_hitters_grouped,
    stream_maintain_kmv,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("served-sketch-state")
    ev = load_table(spark, SF_DIR, "events")

    with tempfile.TemporaryDirectory() as work:
        # ---- simulate the ingest stream: events arrive as parquet files
        stream_in = os.path.join(work, "in")
        ev.withColumn("day", F.dayofmonth("ts")).write.partitionBy("day").parquet(
            stream_in
        )
        schema = spark.read.parquet(stream_in).schema

        def stream():
            return spark.readStream.schema(schema).parquet(stream_in)

        # ---- maintain all three sketch families from the same stream
        kmv_dir, hh_dir, cm_dir = (os.path.join(work, d) for d in ("kmv", "hh", "cm"))
        stream_maintain_kmv(
            stream(), kmv_dir, os.path.join(work, "ck1"), ("event_type",), "user_id", k=128
        ).awaitTermination()
        stream_maintain_heavy_hitters_grouped(
            stream(), hh_dir, os.path.join(work, "ck2"), "event_type", "user_id", capacity=4096
        ).awaitTermination()
        stream_maintain_countmin(
            stream(), cm_dir, os.path.join(work, "ck3"), "user_id"
        ).awaitTermination()

        # ---- serve #1: distinct users per type, state-only, vs one-shot
        served = {
            r["event_type"]: r["n_distinct"]
            for r in read_kmv_distinct(spark, kmv_dir, ("event_type",), k=128).collect()
        }
        oneshot = {
            r["event_type"]: r["n_distinct"]
            for r in kmv_distinct(
                kmv_sketch(ev, ["event_type"], "user_id", k=128), k=128
            ).collect()
        }
        assert served == oneshot, (served, oneshot)  # KMV merge ≡ one-shot
        print(f"kmv distinct (state-only serve, ≡ one-shot): {served}")

        # ---- serve #2: cross-type audience overlap — the set-op HLL can't do
        overlaps = read_kmv_overlap(spark, kmv_dir, "event_type", k=128).collect()
        assert overlaps, "expected at least one event-type pair"
        for r in overlaps:
            assert 0 <= r["n_intersect_est"] <= r["n_union_est"], r
        print(f"kmv overlap pairs served: {len(overlaps)}")

        # ---- serve #3: top spenders^W users per type with the MG bound
        top = read_heavy_hitters_grouped(spark, hh_dir, "event_type", "user_id", k=3)
        exact = {
            (r["event_type"], r["user_id"]): r["n"]
            for r in ev.groupBy("event_type", "user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for r in top.collect():
            true = exact[(r["event_type"], r["user_id"])]
            assert r["est_count"] <= true <= r["est_count"] + r["max_undercount"], r
        print("grouped heavy hitters: est ≤ true ≤ est + bound holds for every row")

        # ---- serve #4: any-key frequency, never undercounting
        probe = ev.select("user_id").distinct().limit(50)
        est = {
            r["user_id"]: r["est"]
            for r in read_countmin_estimates(spark, cm_dir, probe, "user_id").collect()
        }
        true_counts = {
            r["user_id"]: r["n"]
            for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }
        for uid, e in est.items():
            assert e >= true_counts.get(uid, 0), (uid, e, true_counts.get(uid))
        print(f"count-min: {len(est)} keys served, zero undercounts")

        # ---- idempotent maintenance: a replayed batch changes nothing
        # (each foreachBatch write lands in its own batch=<id> partition with
        # overwrite mode — rerunning the SAME stream over the same files is a
        # no-op for the merged answer)
        stream_maintain_kmv(
            stream(), kmv_dir, os.path.join(work, "ck1b"), ("event_type",), "user_id", k=128
        ).awaitTermination()
        again = {
            r["event_type"]: r["n_distinct"]
            for r in read_kmv_distinct(spark, kmv_dir, ("event_type",), k=128).collect()
        }
        assert again == served, (again, served)
        print("replayed maintenance run: served answers unchanged (idempotent)")

        # ---- compact: fold batch history into one bounded generation so
        # merge-on-read never degrades as triggers accumulate (a year of
        # 5-minute batches is ~1e5 partitions) — answers must not move
        from parqueryd_spark.streaming.rollup import compact_kmv_state

        n_rows = compact_kmv_state(spark, kmv_dir, ("event_type",), k=128)
        final = {
            r["event_type"]: r["n_distinct"]
            for r in read_kmv_distinct(spark, kmv_dir, ("event_type",), k=128).collect()
        }
        assert final == served, (final, served)
        print(f"compacted kmv state to {n_rows} rows; served answers unchanged")

    spark.stop()


if __name__ == "__main__":
    main()
