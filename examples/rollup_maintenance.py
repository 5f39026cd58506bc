"""The hot-dashboard rollup loop a growing events table actually runs:

    day 0: aggregate history into mergeable partial state, publish atomically
    day N: aggregate ONLY the new day, merge it with the stored partials,
           publish the new generation; late corrections are just another
           increment — merging is associative and commutative

Readers always see one consistent generation (atomic_publish), and a refresh
costs |increment| + |rollup| rather than re-scanning the corpus — the shape
the reference's request-time full groupby (worker.py:367-408) can't reach.
The streaming twin (parqueryd_spark.streaming.rollup) does the same from a
readStream with idempotent per-batch partitions. Runnable:

    python examples/rollup_maintenance.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.rollup import finalize_rollup, merge_rollups, rollup_partials
from parqueryd_spark.sources.parquet import load_table
from parqueryd_spark.sources.sinks import atomic_publish

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SPLIT = "2024-01-16"  # everything before = history, after = today's increment


def main() -> None:
    spark = get_spark("rollup-maintenance")
    ev = load_table(spark, SF_DIR, "events")

    with tempfile.TemporaryDirectory() as work:
        rollup_path = os.path.join(work, "hourly_rollup")

        # day 0: publish partial state for history (NOT finalized — stays mergeable)
        history = ev.filter(F.col("ts") < SPLIT)
        atomic_publish(rollup_partials(history), rollup_path)
        print(f"day 0: published {spark.read.parquet(rollup_path).count()} grain rows")

        # day N: aggregate only the increment, merge with stored state, republish
        increment = ev.filter(F.col("ts") >= SPLIT)
        stored = spark.read.parquet(rollup_path)
        merged = merge_rollups(stored, rollup_partials(increment))
        atomic_publish(merged, rollup_path)
        print(f"day N: merged increment -> {spark.read.parquet(rollup_path).count()} grain rows")

        # serve: finalize derives avg/std from the partial state, no shuffle
        served = finalize_rollup(spark.read.parquet(rollup_path))
        served.orderBy("window_start", "event_type").show(6, truncate=False)

        # proof: maintained state == one-shot recompute over everything
        direct = finalize_rollup(rollup_partials(ev))
        assert sorted(map(tuple, served.collect())) == sorted(map(tuple, direct.collect()))
        print("maintained rollup == full recompute: OK")

        # the one aggregate plain partials can't merge — DISTINCT users —
        # uses the same split/merge loop with kilobyte HLL sketch state
        from parqueryd_spark.operators.sketches import (
            hll_estimate,
            hll_rollup,
            hll_rollup_merge,
        )

        merged_hll = hll_rollup_merge(
            [hll_rollup(history, ["event_type"], "user_id"),
             hll_rollup(increment, ["event_type"], "user_id")],
            ["event_type"],
        )
        got = hll_estimate(merged_hll)
        want = hll_estimate(hll_rollup(ev, ["event_type"], "user_id"))
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        print("maintained HLL distinct state == direct sketch: OK")

        # set operations HLL can't answer — cross-type user OVERLAP — use
        # KMV state with the same split/merge loop (merge is bit-exact)
        from parqueryd_spark.operators.sketches import (
            kmv_merge,
            kmv_set_estimates,
            kmv_sketch,
        )

        merged_kmv = kmv_merge(
            [kmv_sketch(history, ["event_type"], "user_id", 256),
             kmv_sketch(increment, ["event_type"], "user_id", 256)],
            ["event_type"], 256,
        )
        a = merged_kmv.select(F.col("event_type").alias("t1"), F.col("kmv").alias("a_kmv"))
        b = merged_kmv.select(F.col("event_type").alias("t2"), F.col("kmv").alias("b_kmv"))
        i_est, u_est = kmv_set_estimates("a", "b", 256)
        overlaps = a.join(b, F.col("t1") < F.col("t2")).select("t1", "t2", i_est, u_est)
        print("pairwise distinct-user overlap from maintained KMV state:")
        overlaps.orderBy("t1", "t2").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
