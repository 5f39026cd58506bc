"""Distributed Bloom-filter membership — the runtime filter for anti/semi
joins whose build side is too big to broadcast raw but whose *sketch* fits
anywhere.

The filter is DATA, not a driver object: one row
``(n_bits bigint, n_hashes int, bitmap map<int,bigint>)`` where ``bitmap``
maps a 64-bit-word index to its lane of set bits. Build is one aggregation
pipeline over the key set (explode the k probe positions per key, ``bit_or``
the lanes per word, ``map_from_entries`` into the single row) — fully
parallel, map-side combinable, and the result is kilobytes-to-megabytes
(~1.2 bytes/key at fpp=1%) regardless of key width. Probe is a pure JVM
expression over the broadcast row: Kirsch–Mitzenmacher double hashing
(position_i = pmod(h1 + i*h2, m), "Less hashing, same performance",
ESA 2006) with ``h1 = xxhash64(key)``, ``h2 = xxhash64(key, seed2)`` —
no Python, no per-row py4j, whole-stage codegen throughout.

No false negatives by construction (the probe recomputes exactly the
positions the build set), so the composed joins below are EXACT:

- ``bloom_anti_join`` (decontamination shape): rows whose probe misses are
  definitely clean and never shuffle; only the maybe-fraction (true hits +
  ~fpp false positives) is verified by an exact semi join, and the final
  anti join runs against that tiny verified key set (AQE broadcasts it).
  At 100 TB this turns "shuffle the whole corpus against the benchmark"
  into "scan the corpus twice, shuffle ~fpp of it".
- ``bloom_semi_join``: members = maybe-rows ∩ build keys, same exactness.

Why not Spark's own bloom machinery: ``bloom_filter_agg``/``might_contain``
are internal (unresolvable from SQL in this build) and
``DataFrameStatFunctions.bloomFilter`` returns a driver-side py4j object
with no Column-level probe. Expressing the filter as a one-row DataFrame
keeps build and probe inside Catalyst, makes the sketch persistable
(write the row to parquet, reuse across jobs), and costs nothing Spark's
own runtime filters wouldn't.

Reference parity: the reference engine (parqueryd) has no membership
sketches — this family exists for the LLM-curation north star
(decontamination / allowlist filtering at corpus scale).

Keys are assumed non-null: SQL ``NOT IN`` over a null key is NULL (row
dropped) while ``left_anti`` keeps it — filter nulls out (or coalesce) before
calling if the key column is nullable in practice.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Second xxhash64 seed column for double hashing; any constant works as long
# as build and probe agree. (xxhash64's own seed is fixed at 42 in Spark —
# appending a literal column derives an independent second stream.)
_SEED2 = 0x9E3779B9

_RESERVED = ("n_bits", "n_hashes", "bitmap")


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (num_bits, num_hashes) for ``expected_items`` keys at false
    positive rate ``fpp``: m = -n·ln p/(ln 2)², k = (m/n)·ln 2."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = max(64, int(math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / expected_items * math.log(2))))
    return m, k


def _positions_sql(h1: str, h2: str, k: str, m: str) -> str:
    """SQL for the array of k probe positions — shared verbatim by build and
    probe so no-false-negatives holds by construction. Both hashes are
    reduced mod m BEFORE combining (double hashing works identically in
    Z_m) so the arithmetic never overflows under ANSI mode: i ≤ k ≤ 64 and
    pmod(h2, m) < m keep i*h2 ≪ 2^63 for any practical m."""
    return (
        f"transform(sequence(0, {k} - 1), "
        f"i -> pmod(pmod({h1}, {m}) + cast(i AS BIGINT) * pmod({h2}, {m}), {m}))"
    )


def bloom_build(
    keys: DataFrame, key_col: str, *, num_bits: int, num_hashes: int
) -> DataFrame:
    """Aggregate the distinct probe positions of every key into the one-row
    bloom ``(n_bits, n_hashes, bitmap)``. Cost: one explode of k positions
    per key, one map-combinable ``bit_or`` shuffle of ≤ m/64 rows, one
    single-row collect_list — independent of key width and key count beyond
    the position stream."""
    if num_bits < 64 or num_hashes < 1:
        raise ValueError("need num_bits >= 64 and num_hashes >= 1")
    lanes = (
        keys.select(
            F.xxhash64(key_col).alias("__h1"),
            F.xxhash64(key_col, F.lit(_SEED2)).alias("__h2"),
        )
        .select(
            F.explode(
                F.expr(_positions_sql("__h1", "__h2", str(num_hashes), f"{num_bits}L"))
            ).alias("pos")
        )
        .select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("lane"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(lane)").alias("bits"))
    )
    return _assemble(lanes).select(
        F.lit(num_bits).cast("bigint").alias("n_bits"),
        F.lit(num_hashes).cast("int").alias("n_hashes"),
        "bitmap",
    )


def _assemble(lanes: DataFrame) -> DataFrame:
    """Collect (word, bits) lanes into the single bitmap row (empty input ->
    empty map, not null)."""
    entries = F.collect_list(F.struct("word", "bits"))
    return lanes.agg(
        F.coalesce(
            F.when(F.size(entries) > 0, F.map_from_entries(entries)),
            F.expr("CAST(map() AS MAP<INT, BIGINT>)"),
        ).alias("bitmap")
    )


def bloom_merge(blooms: list[DataFrame]) -> DataFrame:
    """Union membership without rebuilding: bit_or the bitmaps of blooms
    built with IDENTICAL (num_bits, num_hashes) — bloom_merge([bloom(A),
    bloom(B)]) is bit-for-bit bloom(A ∪ B), because each key sets the same
    positions wherever it is built. This is the incremental-maintenance face
    of the family (the minhash-index / ivf_append / HLL-rollup contract):
    build a bloom per day/partition/increment, persist the rows, merge at
    read time — never re-scan the standing corpus. Parameter mismatch fails
    at execution (raise_error), not silently."""
    if not blooms:
        raise ValueError("bloom_merge needs at least one bloom")
    u = blooms[0]
    for b in blooms[1:]:
        u = u.unionByName(b)
    params = u.groupBy().agg(
        F.expr(
            "CASE WHEN count(DISTINCT n_bits) = 1 AND count(DISTINCT n_hashes) = 1"
            " THEN max(n_bits)"
            " ELSE raise_error('bloom_merge: blooms have mismatched"
            " num_bits/num_hashes') END"
        ).alias("n_bits"),
        F.max("n_hashes").alias("n_hashes"),
    )
    lanes = (
        u.select(F.explode("bitmap").alias("word", "bits"))
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    return params.crossJoin(_assemble(lanes)).select("n_bits", "n_hashes", "bitmap")


def with_bloom_flag(
    df: DataFrame, key_col: str, bloom: DataFrame, flag_col: str = "maybe_member"
) -> DataFrame:
    """Add boolean ``flag_col``: True iff every probe position of the key is
    set in the broadcast bloom row. False ⇒ definitely not a member; True ⇒
    member with probability ≈ 1 - fpp. Pure JVM: shiftright + bitwise-and
    over ``element_at`` map lookups, inside whole-stage codegen."""
    for c in (*_RESERVED, flag_col, "__h1", "__h2"):
        if c in df.columns:
            raise ValueError(f"column {c!r} already exists on the probe side")
    probe = F.expr(
        "forall("
        + _positions_sql("__h1", "__h2", "n_hashes", "n_bits")
        + ", p -> (shiftright(coalesce(element_at(bitmap, CAST(p DIV 64 AS INT)), 0L),"
        "            CAST(p % 64 AS INT)) & 1) = 1)"
    )
    return (
        df.withColumn("__h1", F.xxhash64(key_col))
        .withColumn("__h2", F.xxhash64(key_col, F.lit(_SEED2)))
        .crossJoin(F.broadcast(bloom))
        .withColumn(flag_col, probe)
        .drop("__h1", "__h2", *_RESERVED)
    )


def _bloom_for(bench_keys: DataFrame, key_col: str, fpp: float, expected: int | None):
    n = expected if expected is not None else bench_keys.count()
    m, k = bloom_params(max(n, 1), fpp)
    return bloom_build(bench_keys, key_col, num_bits=m, num_hashes=k)


def bloom_anti_join(
    corpus: DataFrame,
    bench: DataFrame,
    on: str,
    *,
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """EXACT ``corpus ⟕̸ bench`` (rows of corpus whose ``on`` key does not
    appear in bench), with the bloom as a pre-shuffle runtime filter: probe
    misses never shuffle, maybe-rows are verified by an exact semi join, and
    the final anti join runs against the verified (tiny) contaminated key
    set — AQE broadcasts it, so the full corpus is never shuffled. Corpus is
    scanned twice (linear, pruned); the shuffle is ~fpp + hit-rate of it."""
    bench_keys = bench.select(on).distinct()
    bloom = _bloom_for(bench_keys, on, fpp, expected_items)
    maybe = with_bloom_flag(corpus.select(on), on, bloom, "__maybe").filter(
        F.col("__maybe")
    )
    contaminated = maybe.join(bench_keys, on, "left_semi").select(on).distinct()
    return corpus.join(contaminated, on, "left_anti")


def bloom_semi_join(
    corpus: DataFrame,
    bench: DataFrame,
    on: str,
    *,
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """EXACT ``corpus ⋉ bench`` (allowlist filtering): no false negatives ⇒
    every true member survives the bloom prefilter; the exact semi join then
    removes the ~fpp false positives. Only the maybe-fraction shuffles."""
    bench_keys = bench.select(on).distinct()
    bloom = _bloom_for(bench_keys, on, fpp, expected_items)
    flagged = with_bloom_flag(corpus, on, bloom, "__maybe")
    return flagged.filter(F.col("__maybe")).drop("__maybe").join(
        bench_keys, on, "left_semi"
    )
