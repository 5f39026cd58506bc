"""Misra-Gries heavy hitters: the undercount bound must hold against exact
counts, the sketch must recover the exact top-k on a zipfian stream, and the
capacity knob must control the bound. (Registry row text_heavy_hitter_tokens
was rows-only until late round 12; it now runs heavy_hitters_exact_topk and
hash-matches the exact SQL answer, while these tests keep the raw one-pass
sketch's bound contract honest.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from parqueryd_spark.operators.sketches import heavy_hitters


def _zipf(spark, n_keys=200, scale=1000, parts=16):
    rows = [(i,) for i in range(1, n_keys) for _ in range(scale // i)]
    return spark.createDataFrame(rows, "k long").repartition(parts)


def test_bound_holds_and_topk_exact_on_zipf(spark):
    df = _zipf(spark)
    true = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    hh = heavy_hitters(df, "k", k=10, capacity=32).collect()
    for r in hh:
        assert r.est_count <= true[r.k] <= r.est_count + r.max_undercount, r
    exact_top = [
        r.k for r in df.groupBy("k").count().orderBy(F.desc("count"), "k").limit(10).collect()
    ]
    assert [r.k for r in hh] == exact_top


def test_capacity_controls_error(spark):
    df = _zipf(spark)
    loose = heavy_hitters(df, "k", k=5, capacity=8).collect()[0].max_undercount
    tight = heavy_hitters(df, "k", k=5, capacity=256).collect()[0].max_undercount
    assert tight <= loose
    # capacity >= number of distinct keys => no evictions, exact counts
    exact = heavy_hitters(df, "k", k=5, capacity=4096).collect()
    true = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert exact[0].max_undercount == 0
    assert all(r.est_count == true[r.k] for r in exact)


def test_null_keys_ignored_and_string_keys(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,), (None,), (None,)], "s string"
    )
    hh = heavy_hitters(df, "s", k=3, capacity=16).collect()
    assert [(r.s, r.est_count) for r in hh] == [("a", 2), ("b", 1)]


def test_guarantee_above_phi_fraction(spark):
    """Any key with frequency > n/(capacity+1) summed per partition must
    surface among the candidates — the MG guarantee, checked with a hot key
    buried in uniform noise."""
    rows = [(999,)] * 400 + [(i % 97,) for i in range(4000)]
    df = spark.createDataFrame(rows, "k long").repartition(8)
    hh = heavy_hitters(df, "k", k=5, capacity=64).collect()
    assert 999 in {r.k for r in hh}


def test_exact_topk_matches_full_count_and_proves(spark):
    """heavy_hitters_exact_topk returns the EXACT top-k (counts and order)
    whenever the proof holds — pinned against the brute-force groupBy."""
    from parqueryd_spark.operators.sketches import heavy_hitters_exact_topk

    df = _zipf(spark)
    got = heavy_hitters_exact_topk(df, "k", k=10, capacity=64).collect()
    want = (
        df.groupBy("k")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "k")
        .limit(10)
        .collect()
    )
    assert [(r.k, r.n_occurrences) for r in got] == [(r.k, r.n_occurrences) for r in want]


def test_exact_topk_raises_when_unprovable(spark):
    """A capacity far below the key cardinality accumulates eviction error
    past the k-th count: the plan must FAIL (raise_error), never silently
    return an unprovable cut."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from parqueryd_spark.operators.sketches import heavy_hitters_exact_topk

    # near-uniform: every key appears 3x, capacity 2 -> huge total error.
    # Depending on how survivors land this trips either the eager
    # short-candidate gate (ValueError at plan build) or the in-plan
    # k-th-count proof (runtime raise_error) — both refuse the cut.
    rows = [(i % 500,) for i in range(1500)]
    df = spark.createDataFrame(rows, "k long").repartition(8)
    with pytest.raises((ValueError, SparkRuntimeException, Py4JJavaError)) as ei:
        heavy_hitters_exact_topk(df, "k", k=5, capacity=2).collect()
    assert "not provably exact" in str(ei.value)


def test_exact_topk_short_candidate_set_refuses(spark):
    """Regression (hypothesis-found): capacity 2 over {k0:3, k1:1, k2:4}
    evicts k1, leaving only TWO candidates for k=5 with eviction error 1 —
    the old per-row proof passed (min returned count 3 > 1) and silently
    dropped k1 from the tail. The short-candidate gate must refuse."""
    import pytest

    from parqueryd_spark.operators.sketches import heavy_hitters_exact_topk

    rows = [("k0",)] * 3 + [("k1",)] * 1 + [("k2",)] * 4
    df = spark.createDataFrame(rows, "k string").coalesce(1)
    with pytest.raises(ValueError, match="not provably exact"):
        heavy_hitters_exact_topk(df, "k", k=5, capacity=2)
    # same data, enough capacity: full exact answer, no eviction, no raise
    got = [
        (r.k, r.n_occurrences)
        for r in heavy_hitters_exact_topk(df, "k", k=5, capacity=8).collect()
    ]
    assert got == [("k2", 4), ("k0", 3), ("k1", 1)]


def test_weighted_exact_topk_matches_brute_force_under_eviction(spark):
    """weight_col mode: zipfian integer weights with a capacity small enough
    to force evictions — the confirmed top-k must equal the brute-force
    top-k BY TOTAL WEIGHT, and an unprovable configuration must refuse."""
    import pytest

    from parqueryd_spark.operators.sketches import heavy_hitters_exact_topk

    # key i carries weight ~ 3000/i spread over several rows: heavy keys
    # dominate, the tail is wide enough that capacity 16 must evict
    rows = [(i, 3000 // i) for i in range(1, 120) for _ in range(3)]
    df = spark.createDataFrame(rows, "k long, w long").repartition(5)
    got = [
        (r.k, r.weight_sum)
        for r in heavy_hitters_exact_topk(df, "k", k=5, capacity=16, weight_col="w").collect()
    ]
    want: dict[int, int] = {}
    for k_, w in rows:
        want[k_] = want.get(k_, 0) + w
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == top, (got, top)

    # near-uniform weights under tiny capacity: must refuse, not guess
    flat = spark.createDataFrame(
        [(i % 200, 7) for i in range(2000)], "k long, w long"
    ).repartition(5)
    with pytest.raises((ValueError, Exception), match="not provably exact"):
        heavy_hitters_exact_topk(flat, "k", k=5, capacity=2, weight_col="w").collect()

    # negative weights break the MG undercount bound: ENFORCED, not just
    # documented (ADVICE r12) — the sketch pass is eager, so the refusal
    # surfaces at plan-build time
    refunds = spark.createDataFrame(
        [(1, 100), (2, 50), (1, -30)], "k long, w long"
    ).coalesce(1)
    with pytest.raises(Exception, match="non-negative"):
        heavy_hitters_exact_topk(refunds, "k", k=2, capacity=8, weight_col="w")


def test_grouped_exact_topk_matches_brute_force_and_refuses(spark):
    """heavy_hitters_exact_topk_grouped: per-group exact top-k pinned
    against the brute-force groupBy + row_number, and the group-wise
    short-candidate gate must refuse when any group's candidates fall
    short with nonzero eviction error."""
    import pytest
    from pyspark.sql import Window as W

    from parqueryd_spark.operators.sketches import heavy_hitters_exact_topk_grouped

    rows = [(g, f"k{i % (10 + g * 7)}") for g in range(3) for i in range(400 + 100 * g)]
    df = spark.createDataFrame(rows, "g int, k string").repartition(6)
    got = [
        (r.g, r.k, r.n_occurrences)
        for r in heavy_hitters_exact_topk_grouped(df, "g", "k", k=4, capacity=64).collect()
    ]
    brute = (
        df.groupBy("g", "k")
        .agg(F.count("*").alias("n_occurrences"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("g").orderBy(F.desc("n_occurrences"), F.asc("k"))
            ),
        )
        .where(F.col("rn") <= 4)
        .orderBy("g", F.desc("n_occurrences"), "k")
        .collect()
    )
    assert got == [(r.g, r.k, r.n_occurrences) for r in brute]

    # a near-uniform group under tiny capacity: the gate must name it
    bad = spark.createDataFrame(
        [(9, f"u{i % 300}") for i in range(900)] + [(1, "hot")] * 50, "g int, k string"
    ).repartition(4)
    with pytest.raises(ValueError, match="not provably exact"):
        heavy_hitters_exact_topk_grouped(bad, "g", "k", k=5, capacity=2)


def test_kmv_md5_mode_partition_invariant_and_externally_replayable(spark):
    """hash_fn="md5_52" makes the sketch a pure set function of public md5
    hashes: identical under any partitioning, and replayable outside Spark
    (here: pure Python hashlib) bit-for-bit — the property that lets the
    events_kmv_distinct / events_kmv_overlap registry rows pass a
    hash-equality oracle despite being 'approximate' operators."""
    import hashlib

    import pytest as _pytest

    from parqueryd_spark.operators.sketches import kmv_sketch

    rows = [(i % 3, f"v{(i * 7) % 57}") for i in range(500)]
    df = spark.createDataFrame(rows, "g int, v string")
    a = {r.g: r.kmv for r in kmv_sketch(df.repartition(1), ["g"], "v", k=16, hash_fn="md5_52").collect()}
    b = {r.g: r.kmv for r in kmv_sketch(df.repartition(13), ["g"], "v", k=16, hash_fn="md5_52").collect()}
    assert a == b
    vals: dict[int, set] = {}
    for g, v in rows:
        vals.setdefault(g, set()).add(v)
    for g, vs in vals.items():
        want = sorted(int(hashlib.md5(v.encode()).hexdigest()[:13], 16) / 2.0**52 for v in vs)[:16]
        assert a[g] == want, g  # exact float equality, not approx
    with _pytest.raises(ValueError, match="hash_fn"):
        kmv_sketch(df, ["g"], "v", k=16, hash_fn="sha9000")


# --- domain mixture (operators/sampling.py) ---------------------------------


def test_mixture_fractions_math():
    from parqueryd_spark.operators.sampling import mixture_fractions

    counts = {"en": 800, "de": 100, "fr": 100}
    fr = mixture_fractions(counts, {"en": 0.5, "de": 0.25, "fr": 0.25})
    # de/fr are limiting (100/0.25 = 400 scale): keep all of both, 200 of en
    assert fr["de"] == 1.0 and fr["fr"] == 1.0
    assert abs(fr["en"] - 0.25) < 1e-12
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_fractions({"en": 10}, {"en": 0.5, "missing": 0.5})
    with _pytest.raises(ValueError):
        mixture_fractions(counts, {})


def test_resample_to_mixture_hits_targets(spark):
    from parqueryd_spark.operators.sampling import resample_to_mixture

    rows = [(i, "a" if i % 10 else "b") for i in range(10000)]  # 90/10 skew
    df = spark.createDataFrame(rows, "id long, dom string")
    out = resample_to_mixture(df, "dom", {"a": 0.5, "b": 0.5}, "id")
    got = {r.dom: r.n for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    # b is limiting (1000 rows): kept whole; a downsamples to ~1000
    assert got["b"] == 1000
    assert abs(got["a"] - 1000) < 100  # md5-bucket sampling noise
    # deterministic
    out2 = resample_to_mixture(df, "dom", {"a": 0.5, "b": 0.5}, "id")
    assert sorted(r.id for r in out.collect()) == sorted(r.id for r in out2.collect())


def test_hll_rollup_merge_equals_direct_and_bounds_error(spark):
    """HLL union is register-wise max: merging per-half sketches must equal
    sketching the whole input (bit-identical estimates), and the estimate must
    sit inside the lgk=14 error envelope vs exact count-distinct."""
    import pyspark.sql.functions as F

    from parqueryd_spark.operators.sketches import (
        hll_estimate,
        hll_rollup,
        hll_rollup_merge,
    )
    from parqueryd_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    split = F.lit("2024-01-16").cast("timestamp")
    merged = hll_estimate(
        hll_rollup_merge(
            [
                hll_rollup(ev.where(F.col("ts") < split), ["event_type"], "user_id"),
                hll_rollup(ev.where(F.col("ts") >= split), ["event_type"], "user_id"),
            ],
            ["event_type"],
        )
    )
    direct = hll_estimate(hll_rollup(ev, ["event_type"], "user_id"))
    m = {r.event_type: (r.n_distinct, r.n_rows) for r in merged.collect()}
    d = {r.event_type: (r.n_distinct, r.n_rows) for r in direct.collect()}
    assert m == d  # merge ∘ split ≡ direct, rows included
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for k, (est, _) in d.items():
        assert abs(est - exact[k]) <= 0.03 * exact[k], (k, est, exact[k])


def test_hll_rollup_merge_rejects_empty_parts():
    import pytest

    from parqueryd_spark.operators.sketches import hll_rollup_merge

    with pytest.raises(ValueError, match="at least one"):
        hll_rollup_merge([], ["event_type"])


def test_count_min_merge_split_equals_direct_and_bounds(spark):
    """CM is linear: per-half sketches summed == one-shot sketch, bit-exact;
    queries never undercount; overcount stays within the generous 3·εN
    envelope (ε = e/width — the per-key w.h.p. bound, deterministic here
    because the md5 hashing is fixed); an absent key estimates no higher
    than εN-level collision mass."""
    import math

    from parqueryd_spark.operators.sketches import (
        count_min_merge,
        count_min_query,
        count_min_sketch,
    )
    from pyspark.sql import functions as F

    n = 5000
    df = spark.range(n).select((F.col("id") % 100).alias("k"))  # 100 keys x 50
    width, depth = 256, 4

    direct = count_min_sketch(df, "k", width=width, depth=depth)
    a = count_min_sketch(spark.range(n).filter("id % 2 = 0").select((F.col("id") % 100).alias("k")), "k", width=width, depth=depth)
    b = count_min_sketch(spark.range(n).filter("id % 2 = 1").select((F.col("id") % 100).alias("k")), "k", width=width, depth=depth)
    merged = count_min_merge([a, b])
    key = lambda r: (r["depth_j"], r["cell"], float(r["cnt"]))
    assert sorted(map(key, merged.collect())) == sorted(map(key, direct.collect()))

    keys = spark.range(100).select(F.col("id").alias("k"))
    est = {r["k"]: r["est"] for r in count_min_query(direct, keys, "k", width=width, depth=depth).collect()}
    eps_n = math.e / width * n
    for k in range(100):
        assert est[k] >= 50, (k, est[k])            # never undercounts
        assert est[k] <= 50 + 3 * eps_n, (k, est[k])  # bounded overcount

    absent = spark.createDataFrame([(10**9,)], "k bigint")
    got = count_min_query(direct, absent, "k", width=width, depth=depth).collect()[0]["est"]
    assert got <= 3 * eps_n, got


def test_count_min_null_keys_are_excluded(spark):
    """NULL keys must not land in an unreachable NULL cell: the sketch of a
    NULL-bearing column equals the sketch of its non-null rows, and probing
    any real key is unaffected."""
    from parqueryd_spark.operators.sketches import count_min_query, count_min_sketch

    with_nulls = spark.createDataFrame(
        [(1,), (1,), (None,), (2,), (None,)], "k int"
    )
    without = with_nulls.where("k IS NOT NULL")
    key = lambda r: (r["depth_j"], r["cell"], float(r["cnt"]))
    a = sorted(map(key, count_min_sketch(with_nulls, "k").collect()))
    b = sorted(map(key, count_min_sketch(without, "k").collect()))
    assert a == b
    keys = spark.createDataFrame([(1,), (2,)], "k int")
    est = {r["k"]: r["est"] for r in count_min_query(count_min_sketch(with_nulls, "k"), keys, "k").collect()}
    assert est[1] >= 2 and est[2] >= 1


def test_grouped_weighted_topk_matches_brute_force(spark):
    """grouped + weighted heavy hitters (r13): per-group top-k by TOTAL
    integer measure equals brute force under eviction pressure; negative
    weights refuse at plan-build; an unprovable group refuses by name."""
    import pytest

    from parqueryd_spark.operators.sketches import heavy_hitters_exact_topk_grouped

    rows = [
        (g, i, 3000 // i)
        for g in ("ga", "gb")
        for i in range(1, 80)
        for _ in range(2)
    ]
    df = spark.createDataFrame(rows, "g string, k long, w long").repartition(5)
    got = [
        (r.g, r.k, r.weight_sum)
        for r in heavy_hitters_exact_topk_grouped(
            df, "g", "k", k=3, capacity=16, weight_col="w"
        ).collect()
    ]
    want: dict = {}
    for g, k_, w in rows:
        want[(g, k_)] = want.get((g, k_), 0) + w
    expect = []
    for g in ("ga", "gb"):
        top = sorted(
            ((k_, tot) for (gg, k_), tot in want.items() if gg == g),
            key=lambda kv: (-kv[1], kv[0]),
        )[:3]
        expect.extend((g, k_, tot) for k_, tot in top)
    assert got == expect, (got, expect)

    refunds = spark.createDataFrame(
        [("ga", 1, 100), ("ga", 2, -5)], "g string, k long, w long"
    ).coalesce(1)
    with pytest.raises(Exception, match="non-negative"):
        heavy_hitters_exact_topk_grouped(refunds, "g", "k", k=1, capacity=8, weight_col="w")

    # near-uniform weights under tiny capacity: must refuse, not guess —
    # either the eager short-candidate gate (build-time ValueError) or the
    # in-plan k-th-vs-error proof (runtime raise_error), depending on how
    # survivors land per partition
    flat = spark.createDataFrame(
        [("ga", i % 100, 7) for i in range(1000)], "g string, k long, w long"
    ).repartition(5)
    with pytest.raises(Exception, match="not provably exact"):
        heavy_hitters_exact_topk_grouped(
            flat, "g", "k", k=5, capacity=2, weight_col="w"
        ).collect()
