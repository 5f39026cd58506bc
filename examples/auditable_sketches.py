"""Approximate answers you can AUDIT: sketch state whose estimates an
external engine reproduces bit-for-bit.

Most sketch pipelines end at "trust the library" — HLL registers and KLL
compactors are engine-internal, so a regulator (or a suspicious downstream
team) cannot re-derive the numbers. This example runs the two families this
engine makes externally checkable:

  1. KMV (theta) distinct sketches under hash_fn="md5_52": the sketch is the
     k smallest 52-bit md5-prefix hashes of the distinct values — a pure SET
     function of the data under a public hash. Per-day sketch states merge
     (kmv_merge) into exactly the sketch of the union, and DuckDB replays
     the ESTIMATE itself from the raw parquet — asserted here with a real
     DuckDB connection, equality to the last bit.
  2. Exact heavy hitters via the two-pass Misra-Gries confirm
     (heavy_hitters_exact_topk): bounded-state sketch pass -> candidate set
     + total eviction error E, exact confirm count over the candidates, and
     an IN-PLAN proof (raise_error unless the k-th count > E) so the job
     fails rather than serve an unprovable top-k.

The registry twins (events_kmv_distinct / events_kmv_incremental /
events_kmv_overlap / text_heavy_hitter_tokens) put the same plans under the
driver's hash-equality gate. Runnable:

    python examples/auditable_sketches.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.sketches import (
    heavy_hitters_exact_topk,
    kmv_distinct,
    kmv_merge,
    kmv_sketch,
)
from parqueryd_spark.sources.parquet import load_table
from parqueryd_spark.sources.sinks import atomic_publish

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
K = 64  # sketch size: ~12.7% rel error; small enough to exercise estimation


def main() -> None:
    spark = get_spark("auditable-sketches")
    ev = load_table(spark, SF_DIR, "events")

    with tempfile.TemporaryDirectory() as work:
        # --- 1. per-day KMV state, published once per increment ------------
        days = ev.select(F.to_date("ts").alias("d")).distinct().orderBy("d").collect()
        state_paths = []
        for i, row in enumerate(days[:3]):  # three increments are enough to show it
            day = ev.where(F.to_date("ts") == F.lit(row.d))
            sk = kmv_sketch(day, ["event_type"], "user_id", k=K, hash_fn="md5_52")
            p = os.path.join(work, f"kmv_day={i}")
            atomic_publish(sk, p)
            state_paths.append(p)
        print(f"published {len(state_paths)} per-day sketch states (<= {K} doubles/group)")

        # serve a distinct-count over the covered range by merging STATE only
        parts = [spark.read.parquet(p) for p in state_paths]
        merged = kmv_merge(parts, ["event_type"], k=K)
        served = kmv_distinct(merged, k=K).orderBy("event_type")
        got = {r.event_type: r.n_distinct for r in served.collect()}
        print(f"served distinct-user estimates from merged state: {got}")

        # --- 2. the audit: DuckDB re-derives the SAME estimates ------------
        covered = [str(days[i].d) for i in range(len(state_paths))]
        con = duckdb.connect()
        replay = con.execute(
            f"""
            WITH h AS (
              SELECT DISTINCT event_type,
                     CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
                       / 4503599627370496.0 AS u
              FROM read_parquet('{os.path.join(SF_DIR, "events.parquet")}')
              WHERE user_id IS NOT NULL
                AND ({" OR ".join(f"CAST(ts AS DATE) = DATE '{d}'" for d in covered)})
            ),
            r AS (
              SELECT event_type, u,
                     row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS nd
              FROM h
            ),
            agg AS (
              SELECT event_type, max(nd) AS nd,
                     min(CASE WHEN rn = {K} THEN u END) AS theta
              FROM r GROUP BY event_type
            )
            SELECT event_type,
                   CAST(round(CASE WHEN nd < {K} THEN CAST(nd AS DOUBLE)
                                   ELSE {K - 1}.0 / theta END) AS BIGINT) AS n_distinct
            FROM agg ORDER BY event_type
            """
        ).fetchall()
        audit = {t: n for t, n in replay}
        assert audit == got, (audit, got)
        print("DuckDB replay matches the served estimates exactly — audited")

    # --- 3. exact heavy hitters with the in-plan completeness proof --------
    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    top = heavy_hitters_exact_topk(toks, "token", k=5, capacity=1024)
    rows = top.collect()  # raises in-plan if the top-5 were not provably exact
    print("provably-exact top-5 tokens:", [(r.token, r.n_occurrences) for r in rows])

    # cross-check: brute-force exact counts agree (the sketch path only
    # avoided shuffling the full token stream, never changed the answer)
    brute = (
        toks.groupBy("token")
        .count()
        .orderBy(F.desc("count"), "token")
        .limit(5)
        .collect()
    )
    assert [(r.token, r.n_occurrences) for r in rows] == [(r.token, r["count"]) for r in brute]
    print("brute-force cross-check passed")

    spark.stop()


if __name__ == "__main__":
    main()
