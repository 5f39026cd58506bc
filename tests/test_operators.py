"""Operator-level tests: multimodal plumbing, IVF recall vs brute force,
as-of join tolerance, sinks round-trip."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parqueryd_spark.operators.multimodal import (
    decode_image,
    extract_features,
    media_from_documents,
)
from parqueryd_spark.operators.relational import asof_join
from parqueryd_spark.operators.similarity import brute_force_topk, ivf_topk
from parqueryd_spark.sources.parquet import load_table
from parqueryd_spark.sources.sinks import to_pandas_result, write_parquet
from tests.conftest import SF_SMOKE


def test_multimodal_feature_schema_and_determinism(spark):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 30)
    media = media_from_documents(docs)
    feats = extract_features(media)
    assert [f.name for f in feats.schema.fields] == [
        "media_id", "media_type", "byte_len", "digest", "width", "height", "feature",
    ]
    a = feats.orderBy("media_id").toPandas()
    # repartitioning must not change results (batch-shape independence)
    b = extract_features(media.repartition(7)).orderBy("media_id").toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["width"] >= 1).all() and (a["width"] <= 64).all()
    assert a["feature"].map(len).eq(8).all()


def test_multimodal_decode_stub_contract():
    w, h, f = decode_image(b"payload")
    w2, h2, f2 = decode_image(b"payload")
    assert (w, h, f) == (w2, h2, f2)
    assert 1 <= w <= 64 and 1 <= h <= 64 and len(f) == 8


def _make_ppm(w, h, rgb):
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + bytes(rgb)


def _make_png(w, h, rgb_rows):
    import struct
    import zlib

    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(">I", zlib.crc32(tag + body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in rgb_rows)  # filter 0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_bmp(w, h, bgr_rows):
    import struct

    stride = (3 * w + 3) & ~3
    pixel = b"".join(bytes(r) + b"\x00" * (stride - 3 * w) for r in bgr_rows)
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixel), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel), 2835, 2835, 0, 0)
    return header + dib + pixel


def _make_wav(samples, nch=1, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_multimodal_real_stdlib_codecs(spark):
    """Self-describing formats decode FOR REAL (dims + histogram/RMS
    features), driver-side and through the Arrow mapInPandas path alike;
    malformed-but-sniffed payloads fall back to the deterministic fake."""
    # 2x2 image: 3 black px + 1 white px => hist bins [0.75, 0,...,0, 0.25]
    rgb = [0, 0, 0, 0, 0, 0, 0, 0, 0, 255, 255, 255]
    ppm = _make_ppm(2, 2, rgb)
    png = _make_png(2, 2, [rgb[:6], rgb[6:]])
    bmp = _make_bmp(2, 2, [rgb[6:], rgb[:6]])  # BMP rows bottom-up; BGR==RGB for gray
    wav = _make_wav([16384] * 800)  # constant half-amplitude => RMS 0.5 everywhere
    for payload in (ppm, png, bmp):
        w, h, f = decode_image(payload)
        assert (w, h) == (2, 2), payload[:8]
        assert f[0] == 0.75 and f[7] == 0.25 and sum(f) == 1.0, (payload[:8], f)
    w, h, f = decode_image(wav)
    assert (w, h) == (1, 16)  # (channels, bits per sample)
    assert all(abs(v - 0.5) < 0.01 for v in f)
    # malformed P6 header falls back to the sha256 fake, deterministically
    bad = b"P6 notanumber"
    assert decode_image(bad) == decode_image(bad)
    # and the same decode runs inside Spark's Arrow batch path
    media = spark.createDataFrame(
        [(1, "image", ppm), (2, "image", png), (3, "image", bmp), (4, "audio", wav)],
        "media_id long, media_type string, payload binary",
    ).withColumn("byte_len", F.octet_length("payload").cast("long")).withColumn(
        "digest", F.md5("payload")
    )
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert [rows[i].width for i in (1, 2, 3)] == [2, 2, 2]
    assert rows[1].feature == rows[2].feature == rows[3].feature
    assert rows[4].height == 16
    # real resize: every decodable input comes back as a 4x4 P6 whose
    # upscaled pixels decode identically across source formats
    from parqueryd_spark.operators.multimodal import resize_media

    resized = {r.media_id: bytes(r.payload) for r in resize_media(media, 4, 4).collect()}
    assert resized[1].startswith(b"P6\n4 4\n255\n")
    assert resized[1] == resized[2] == resized[3]  # same pixels in, same P6 out
    w, h, f = decode_image(resized[1])
    assert (w, h) == (4, 4) and f[0] == 0.75 and f[7] == 0.25
    assert len(resized[4]) == 32  # WAV is not an image: digest fake


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    exact_pairs = set(zip(exact.query_id, exact.neighbor_id))

    def recall(mode: str) -> float:
        approx = ivf_topk(emb, queries, n_centroids=16, nprobe=4, k=5, centroid_mode=mode).toPandas()
        pairs = set(zip(approx.query_id, approx.neighbor_id))
        return len(exact_pairs & pairs) / len(exact_pairs)

    # nprobe=4 of 16 buckets; random-ish embeddings make coarse quantization
    # weak, but recall must beat the 25%-of-corpus scan baseline convincingly
    r_first = recall("first_k")
    assert r_first >= 0.4, f"IVF(first_k) recall {r_first:.2f}"
    r_kmeans = recall("kmeans")
    assert r_kmeans >= 0.4, f"IVF(kmeans) recall {r_kmeans:.2f}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_near_dup_bucketed_equals_exact(spark, sf_dir):
    """The bucketed (multi-probe IVF) near-dup path must reproduce the exact
    all-pairs >=0.45 set — full recall at the gate's (16, 6) config; precision
    is 1.0 by construction (every candidate is exact-cosine verified)."""
    from parqueryd_spark.operators.similarity import cosine_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_near_dup_pairs(emb, threshold=0.45, mode="exact").toPandas()
    bucketed = cosine_near_dup_pairs(
        emb, threshold=0.45, mode="bucketed", n_centroids=16, nprobe=6
    ).toPandas()
    assert len(exact) > 0  # vacuous-oracle guard
    e = exact.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = bucketed.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(e, b, check_like=True)


def test_near_dup_bucketed_plan_no_cartesian(spark):
    """The 100 TB contract: candidate generation is a hash join on
    centroid_id, never a cartesian / nested-loop product."""
    from parqueryd_spark.operators.similarity import cosine_near_dup_pairs
    from parqueryd_spark.plans.audit import explain_str

    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = explain_str(cosine_near_dup_pairs(emb, threshold=0.45, mode="bucketed"), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_index_persisted_search_matches_oneshot(spark, tmp_path):
    """Searching a parquet-persisted IVF index (partitioned by centroid_id —
    the layout that lets a search read only its probed buckets) returns
    exactly what the one-shot ivf_topk computes from raw vectors."""
    from pyspark.sql import functions as F

    from parqueryd_spark.operators.similarity import ivf_index, ivf_search

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.orderBy(F.col("vec_id").desc()).limit(5)
    centroids = (
        emb.orderBy(F.col("vec_id").asc())
        .limit(8)
        .select(F.col("vec_id").alias("centroid_id"), F.col("embedding"))
    )
    oneshot = ivf_topk(emb, queries, n_centroids=8, nprobe=3, k=4).toPandas()

    idx_path = str(tmp_path / "ivf_index")
    ivf_index(emb, centroids).write.partitionBy("centroid_id").parquet(idx_path)
    stored = spark.read.parquet(idx_path)
    from_store = ivf_search(stored, centroids, queries, nprobe=3, k=4).toPandas()

    key = ["query_id", "rank"]
    a = oneshot.sort_values(key).reset_index(drop=True)
    b = from_store.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    assert len(a) == 5 * 4


def test_incremental_minhash_matches_full_run(spark):
    """Deduping an increment against a stored corpus index must find exactly
    the full-corpus pairs that involve at least one new doc — the guarantee
    that lets a growing corpus dedup daily increments without reprocessing
    history. Corpus split by doc_id parity so near-dup pairs land across the
    boundary (sequential-id near-dups would mostly fall inside one half)."""
    from parqueryd_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_index,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    full = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).toPandas()
    assert len(full) > 0  # vacuous guard

    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    inc = incremental_minhash_pairs(
        minhash_index(new, "doc_id", "text"),
        minhash_index(old, "doc_id", "text"),
        threshold=0.8,
    ).toPandas()

    want = full[(full.id_a % 2 == 1) | (full.id_b % 2 == 1)]
    assert len(want) > 0
    got_pairs = set(zip(inc.id_a, inc.id_b))
    want_pairs = set(zip(want.id_a, want.id_b))
    assert got_pairs == want_pairs


def test_incremental_minhash_reingested_id(spark):
    """A doc id present in BOTH indexes (re-ingestion of an unchanged doc)
    must not self-pair at Jaccard 1.0 or duplicate its pair rows — the union
    of the two indexes is deduped per doc before verification."""
    from parqueryd_spark.operators.dedup import incremental_minhash_pairs, minhash_index

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    idx = minhash_index(docs, "doc_id", "text")
    # corpus already holds both docs; the "increment" re-submits doc 1
    inc = incremental_minhash_pairs(
        idx.where(F.col("doc") == 1), idx, threshold=0.5
    ).collect()
    assert [(r.id_a, r.id_b) for r in inc] == [(1, 2)]
    assert inc[0].jaccard < 1.0


def test_near_dup_groups_transitive_chain(spark):
    """Connected components over pairs: a chain 1-2, 2-3, 3-4 (no direct 1-4)
    collapses into ONE group labeled by its smallest id; disjoint pair 10-11
    stays its own group; convergence handles multi-hop label flow."""
    from parqueryd_spark.operators.dedup import near_dup_groups

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.group_id for r in near_dup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_near_dup_groups_empty_pairs(spark):
    from parqueryd_spark.operators.dedup import near_dup_groups

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert near_dup_groups(pairs).count() == 0


def test_contamination_stats_planted_overlap(spark):
    """Planted contamination is found exactly: a train doc copying an eval
    doc's text shares all its trigrams; disjoint docs share none. Hashed and
    string join paths agree."""
    from parqueryd_spark.operators.dedup import contamination_stats

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # verbatim copy
            (2, "quick brown fox runs far away tonight"),  # partial overlap
            (3, "completely different words here entirely now"),  # disjoint
            (4, "tiny"),  # short-doc fallback shingle, no hit
        ],
        "doc_id long, text string",
    )
    for hashed in (True, False):
        out = {
            r.doc: r
            for r in contamination_stats(
                corpus, bench, "doc_id", "text", k=3, hashed=hashed
            ).collect()
        }
        assert out[1].n_hits == out[1].n_grams > 0 and out[1].contaminated
        assert 0 < out[2].n_hits < out[2].n_grams and out[2].contaminated
        assert out[3].n_hits == 0 and not out[3].contaminated
        assert out[4].n_grams == 1 and out[4].n_hits == 0 and not out[4].contaminated


def test_contamination_plan_broadcasts_benchmark(spark):
    """The 100 TB contract: the benchmark gram set rides a broadcast hash
    join — the corpus is never shuffled by gram, and nothing in the plan is
    a cartesian/nested-loop product or a Python eval."""
    from parqueryd_spark.operators.dedup import contamination_stats
    from parqueryd_spark.plans.audit import explain_str

    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    plan = explain_str(
        contamination_stats(corpus, bench, "doc_id", "text", k=3), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_hash_split_deterministic_and_weighted(spark):
    from parqueryd_spark.operators.sampling import hash_split

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(docs, "doc_id", w).groupBy("split").count().collect()
    b = hash_split(docs, "doc_id", w).groupBy("split").count().collect()
    assert sorted((r.split, r["count"]) for r in a) == sorted((r.split, r["count"]) for r in b)
    counts = {r.split: r["count"] for r in a}
    n = sum(counts.values())
    assert n == docs.count() and set(counts) == set(w)
    # md5 buckets are uniform: each split within +-50% relative of its weight
    for name, weight in w.items():
        assert abs(counts[name] / n - weight) < weight * 0.5, (name, counts)
    # re-salting re-rolls the assignment
    c = {r.split: r["count"] for r in hash_split(docs, "doc_id", w, salt="x").groupBy("split").count().collect()}
    assert c != counts
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.1})


def test_stratified_sample_nested_and_per_stratum(spark):
    from parqueryd_spark.operators.sampling import stratified_sample

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    small = {r.doc_id for r in stratified_sample(docs, "doc_id", 0.25).collect()}
    big = {r.doc_id for r in stratified_sample(docs, "doc_id", 0.5).collect()}
    assert small and small < big  # nested: same salt, larger threshold is a superset
    by_lang = stratified_sample(
        docs, "doc_id", {"en": 0.5, "de": 0.1}, strata_col="lang"
    ).groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in by_lang}
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert set(got) <= {"en", "de"}  # unlisted strata dropped
    assert abs(got["en"] / totals["en"] - 0.5) < 0.25


def test_pack_contiguous_bin_invariants(spark):
    from parqueryd_spark.operators.sampling import pack_contiguous
    from parqueryd_spark.operators.text import token_count

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", token_count("text").alias("tok")
    )
    budget = 512
    packed = pack_contiguous(docs, "doc_id", "tok", budget, group_cols=["lang"]).toPandas()
    max_item = packed["tok"].max()
    for (lang, b), grp in packed.groupby(["lang", "bin_id"]):
        assert grp["tok"].sum() < budget + max_item, (lang, b)
    # bins are contiguous in doc_id order within each group
    for lang, grp in packed.groupby("lang"):
        assert grp.sort_values("doc_id")["bin_id"].is_monotonic_increasing
        # every bin except the last is filled past budget - max_item
        sums = grp.groupby("bin_id")["tok"].sum()
        assert (sums.iloc[:-1] >= budget - max_item).all()
    with pytest.raises(ValueError):
        pack_contiguous(docs, "doc_id", "tok", 0)


def test_asof_join_tolerance(spark, tmp_path):
    left = spark.createDataFrame(
        [(1, 100.0), (1, 200.0), (2, 100.0)], "k long, ts double"
    ).select("k", F.timestamp_seconds("ts").alias("ts"))
    right = spark.createDataFrame(
        [(1, 90.0, "a"), (1, 150.0, "b"), (2, 95.0, "c")], "k long, ts double, v string"
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "v")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").orderBy("k", "ts").collect()
    assert [r.v for r in out] == ["a", "b", "c"]
    out_tol = (
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", tolerance_seconds=5)
        .orderBy("k", "ts")
        .collect()
    )
    assert [r.v for r in out_tol] == [None, None, "c"]
    # forward: nearest following right event (inclusive)
    fwd = (
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", direction="forward")
        .orderBy("k", "ts")
        .collect()
    )
    assert [r.v for r in fwd] == ["b", None, None]
    fwd_tol = (
        asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            direction="forward", tolerance_seconds=10,
        )
        .orderBy("k", "ts")
        .collect()
    )
    assert [r.v for r in fwd_tol] == [None, None, None]


def test_resize_and_frame_sample_stubs(spark):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 30)
    media = media_from_documents(docs)
    from parqueryd_spark.operators.multimodal import resize_media, sample_frames

    resized = resize_media(media, 16, 16).toPandas()
    assert len(resized) == media.count()
    assert (resized["width"] == 16).all()
    assert resized["payload"].map(len).eq(32).all()  # sha256 digest stub
    # deterministic across repartitioning
    r2 = resize_media(media.repartition(5), 16, 16).toPandas()
    assert set(map(bytes, r2["payload"])) == set(map(bytes, resized["payload"]))

    frames = sample_frames(media).toPandas()
    n_videos = media.filter(F.col("media_type") == "video").count()
    assert frames["media_id"].nunique() == n_videos
    assert frames["frame_index"].min() == 0
    per = frames.groupby("media_id")["frame_index"].max()
    assert (per <= 3).all()  # max_frames=4 -> indices 0..3


def test_winnow_fingerprint_overlap(spark):
    """Near-dup documents (known Jaccard >= 0.9 pairs) must share most
    winnowing fingerprints; unrelated docs must not."""
    from parqueryd_spark.operators.text import winnow_fingerprints
    from parqueryd_spark.queries.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, SF_SMOKE).toPandas()
    assert len(pairs) > 0
    docs = load_table(spark, SF_SMOKE, "documents")
    fp = {
        r.doc_id: set(r.fp)
        for r in docs.select("doc_id", winnow_fingerprints("text").alias("fp")).collect()
    }
    a, b = int(pairs.iloc[0].id_a), int(pairs.iloc[0].id_b)
    overlap = len(fp[a] & fp[b]) / len(fp[a] | fp[b])
    assert overlap > 0.7, f"near-dup winnow overlap {overlap:.2f}"
    unrelated = len(fp[a] & fp[(a + 7) % 400]) / len(fp[a] | fp[(a + 7) % 400])
    assert unrelated < 0.3, f"unrelated winnow overlap {unrelated:.2f}"


def test_simhash_recall_covers_exact_jaccard(spark):
    """The gate's explicit radius-13 / 14-band config must recover every
    exact Jaccard>=0.8 pair — the radius was tuned against this oracle, and
    a regression here silently degrades dedup recall."""
    from parqueryd_spark.operators.dedup import ngram_jaccard_pairs, simhash_near_pairs

    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, "doc_id", "text").collect()}
    near = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(docs, "doc_id", "text", max_hamming=13).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    assert exact <= near, f"simhash missed {sorted(exact - near)}"
    # precision guard: blocking is a candidate generator, but the hamming
    # verification should keep extras rare on this corpus
    assert len(near - exact) <= max(2, len(exact) // 5)


def test_simhash_default_is_scale_safe(spark):
    """A BARE simhash_near_pairs call must be the production blocking config
    (SIMHASH_SCALE_CONFIG: 16-bit bands, radius 3) and generate a vanishing
    candidate set — <=1% of the full pair space at sf0.1 (5000 docs => 12.5M
    pairs) — because at 100 TB the candidate count IS the cost of the verify
    join. A user who doesn't read the docs gets the scale-safe behavior; the
    high-recall radius-13 config is opt-in."""
    import inspect

    from parqueryd_spark.operators.dedup import (
        SIMHASH_SCALE_CONFIG,
        simhash_candidate_pairs,
        simhash_near_pairs,
    )

    sig = inspect.signature(simhash_near_pairs)
    assert sig.parameters["bits"].default == SIMHASH_SCALE_CONFIG["bits"]
    assert sig.parameters["max_hamming"].default == SIMHASH_SCALE_CONFIG["max_hamming"]
    # bands=None resolves to max_hamming + 1 == the scale config's band count
    assert SIMHASH_SCALE_CONFIG["max_hamming"] + 1 == SIMHASH_SCALE_CONFIG["bands"]

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    n = docs.count()
    # candidate pairs under the defaults simhash_near_pairs resolves to
    candidates = simhash_candidate_pairs(
        docs, "doc_id", "text",
        bits=SIMHASH_SCALE_CONFIG["bits"], bands=SIMHASH_SCALE_CONFIG["bands"],
    ).count()
    pair_space = n * (n - 1) / 2
    assert candidates <= 0.01 * pair_space, f"{candidates} of {pair_space:.0f} pairs"


def test_simhash_bit63_sign_bit(spark):
    """64-bit signatures exercise the long sign bit. The library's own band
    extraction (simhash_bands) must reproduce the bands Python computes from
    the unsigned value — an arithmetic shiftright would smear the sign bit
    into every high band and fail this on any negative signature."""
    from parqueryd_spark.operators.dedup import simhash, simhash_bands

    # fully distinct token sets per doc — near-identical texts would collapse
    # to near-identical signatures and might all leave bit 63 unset
    texts = [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(40)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = df.select(
        "doc_id",
        simhash(F.col("text"), bits=64).alias("sig"),
        simhash_bands(simhash(F.col("text"), bits=64), 64, 14).alias("bands"),
    ).collect()
    assert any(r.sig < 0 for r in rows), "fixture must produce a sign-bit signature"
    base, extra = divmod(64, 14)
    widths = [base + 1 if i < extra else base for i in range(14)]
    offsets = [sum(widths[:i]) for i in range(14)]
    for r in rows:
        unsigned = r.sig & ((1 << 64) - 1)
        expected = [(unsigned >> off) & ((1 << w) - 1) for off, w in zip(offsets, widths)]
        assert [b.bh for b in sorted(r.bands, key=lambda b: b.band)] == expected
    # bands=1 must not overflow the 2^64-1 mask (whole signature is the band)
    one = (
        df.filter(F.col("doc_id") == 0)
        .select(simhash_bands(simhash(F.col("text"), 64), 64, 1).alias("b"))
        .collect()
    )
    sig0 = next(r.sig for r in rows if r.doc_id == 0)
    assert one[0].b[0].bh == sig0


def test_sink_roundtrip_and_empty_protocol(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").limit(100)
    path = str(tmp_path / "out")
    write_parquet(li, path, partition_by=["l_returnflag"])
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert to_pandas_result(None) is None
    empty = li.filter(F.lit(False))
    assert to_pandas_result(empty, none_on_empty=True) is None
    assert len(to_pandas_result(empty)) == 0


def _make_y4m(w, h, frames_yuv, cfmt=b"C444"):
    """Minimal YUV4MPEG2 container: header + FRAME-delimited planar YUV."""
    out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s\n" % (w, h, cfmt))
    for planes in frames_yuv:
        out.extend(b"FRAME\n")
        for plane in planes:
            out.extend(bytes(plane))
    return bytes(out)


def test_sample_frames_real_y4m(spark):
    """y4m videos are frame-sampled FOR REAL: evenly-spaced frames come back
    as P6 PPMs that the image decoder reads with the expected dims and pixel
    content; non-y4m 'video' payloads keep the deterministic digest fake."""
    from parqueryd_spark.operators.multimodal import sample_frames

    w, h = 4, 2
    n = w * h
    # 6 frames; frame i is uniform gray level 40*i (Y=gray, U=V=128 => R=G=B=Y)
    frames = [([40 * i] * n, [128] * n, [128] * n) for i in range(6)]
    y4m = _make_y4m(w, h, frames)
    # C420: quarter-size chroma planes, still neutral gray
    y4m_420 = _make_y4m(w, h, [([200] * n, [128] * (n // 4), [128] * (n // 4))], b"C420jpeg")
    media = spark.createDataFrame(
        [(1, "video", y4m), (2, "video", y4m_420), (3, "video", b"not a container"),
         (4, "image", y4m)],
        "media_id long, media_type string, payload binary",
    )
    rows = sorted(sample_frames(media, max_frames=3).collect(), key=lambda r: (r.media_id, r.frame_index))
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    # images are not sampled at all
    assert set(by_id) == {1, 2, 3}
    # 3 evenly spaced picks over 6 frames: indices 0, 2, 4 => gray 0, 80, 160
    assert len(by_id[1]) == 3
    for rec, gray in zip(by_id[1], (0, 80, 160)):
        wd, ht, f = decode_image(bytes(rec.frame_payload))
        assert (wd, ht) == (w, h)
        # uniform frame: all mass in gray's histogram bin
        assert f[gray >> 5] == 1.0, (gray, f)
    # C420 single frame decodes to the same uniform-gray PPM
    (rec,) = by_id[2]
    wd, ht, f = decode_image(bytes(rec.frame_payload))
    assert (wd, ht) == (w, h) and f[200 >> 5] == 1.0
    # undecodable container: digest-fake frames, deterministic across runs
    again = [r for r in sample_frames(media, max_frames=3).collect() if r.media_id == 3]
    assert [bytes(r.frame_payload) for r in by_id[3]] == [
        bytes(r.frame_payload) for r in sorted(again, key=lambda r: r.frame_index)
    ]


def test_bm25_semantics_tiny_corpus(spark):
    """Hand-checkable BM25 invariants on a 4-doc corpus: non-matching docs are
    excluded, more matched terms / higher tf ranks higher at equal length, and
    a single-term score matches the closed-form Okapi formula."""
    import math

    from parqueryd_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "x x x y"),       # tf(x)=3, tf(y)=1
            (2, "x z z z"),       # tf(x)=1
            (3, "z z z z"),       # no query term
            (4, "y z z z"),       # tf(y)=1
        ],
        "id long, text string",
    )
    out = {
        r["doc"]: r
        for r in bm25_scores(docs, "id", "text", ["x", "y"]).collect()
    }
    assert 3 not in out  # no query term => excluded
    assert out[1]["n_match"] == 2 and out[2]["n_match"] == 1
    # doc 1 beats doc 2 on tf(x) alone (same dl) and matches y on top
    assert out[1]["score"] > out[2]["score"]
    # closed-form check for doc 2: N=4, df(x)=2, dl=4, avgdl=4
    idf_x = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    expect = idf_x * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 4 / 4))
    assert abs(out[2]["score"] - expect) < 1e-12


def test_bm25_index_serve_matches_scan(spark, tmp_path):
    """The published-inverted-index serve path must score identically to the
    corpus-scan path, and its postings read must prune to the query terms'
    hash buckets."""
    from parqueryd_spark.operators.text import (
        bm25_from_index,
        bm25_scores,
        text_index_publish,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    terms = ["hash", "join", "vector"]
    idx = str(tmp_path / "text_index")
    text_index_publish(docs, idx, "doc_id", "text")

    scan = {
        r["doc"]: (r["n_match"], round(r["score"], 9))
        for r in bm25_scores(docs, "doc_id", "text", terms).collect()
    }
    served = {
        r["doc"]: (r["n_match"], round(r["score"], 9))
        for r in bm25_from_index(spark, idx, terms).collect()
    }
    assert served == scan
    # partition pruning: the postings scan must carry the bucket filter
    from parqueryd_spark.plans.audit import explain_str

    plan = explain_str(bm25_from_index(spark, idx, terms), "formatted")
    assert "PartitionFilters" in plan and "bucket" in plan


def test_bm25_index_append_equals_full_rebuild(spark, tmp_path):
    """Appending an increment to a published inverted index must serve the
    same scores as rebuilding the index from the full corpus."""
    from parqueryd_spark.operators.text import (
        bm25_from_index,
        text_index_append,
        text_index_publish,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    old = docs.where(F.col("doc_id") < 150)
    new = docs.where(F.col("doc_id") >= 150)
    terms = ["hash", "stream"]

    full_idx = str(tmp_path / "full")
    text_index_publish(docs, full_idx, "doc_id", "text")
    inc_idx = str(tmp_path / "inc")
    text_index_publish(old, inc_idx, "doc_id", "text")
    text_index_append(spark, inc_idx, new, "doc_id", "text")

    def scores(idx):
        return {
            r["doc"]: (r["n_match"], round(r["score"], 9))
            for r in bm25_from_index(spark, idx, terms).collect()
        }

    assert scores(inc_idx) == scores(full_idx)


def test_encode_documents_order_oov_and_vocab_rank(spark):
    from parqueryd_spark.operators.text import build_vocab, encode_documents

    docs = spark.createDataFrame(
        [(1, "b a b c b a"), (2, "a c zz")], "doc_id long, text string"
    )
    vocab = {r.token: (r.token_id, r.freq) for r in build_vocab(docs, "text").collect()}
    # frequency desc, token asc: a and b tie at 3 -> a=0, b=1; then c(2), zz(1)
    assert vocab == {"a": (0, 3), "b": (1, 3), "c": (2, 2), "zz": (3, 1)}

    enc = {r.doc: r for r in encode_documents(docs, "doc_id", "text").collect()}
    assert enc[1].input_ids == [1, 0, 1, 2, 1, 0]  # order preserved
    assert enc[1].n_tokens == 6

    # encoding doc 2 under a vocab built from doc 1 only: zz is OOV
    v1 = build_vocab(docs.where("doc_id = 1"), "text")
    enc2 = {
        r.doc: r
        for r in encode_documents(docs, "doc_id", "text", vocab=v1, oov_id=-1).collect()
    }
    assert enc2[2].input_ids[-1] == -1


def test_build_vocab_max_vocab_truncation(spark):
    from parqueryd_spark.operators.text import build_vocab, encode_documents

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b zz")], "doc_id long, text string"
    )
    v2 = build_vocab(docs, "text", max_vocab=2)
    assert {r.token: r.token_id for r in v2.collect()} == {"a": 0, "b": 1}
    enc = {r.doc: r for r in encode_documents(docs, "doc_id", "text", vocab=v2).collect()}
    assert enc[2].input_ids == [0, 1, -1]  # c and zz fall to OOV


def test_search_literal_matches_bruteforce(spark):
    """Searching with vec_id 0's own vector as a literal must return the
    same neighbor set as brute_force_topk querying vec_id 0 (plus itself at
    cosine 1.0, which the table-query form excludes)."""
    from parqueryd_spark.operators.similarity import search_literal

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    lit_hits = search_literal(emb, qvec, k=6)
    rows = lit_hits.collect()
    assert rows[0].neighbor_id == 0 and abs(rows[0].cosine_sim - 1.0) < 1e-9
    assert [r.rank for r in rows] == list(range(1, 7))
    table_hits = brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=5).collect()
    assert [r.neighbor_id for r in rows[1:]] == [r.neighbor_id for r in table_hits]

    from parqueryd_spark.plans.audit import plan_report

    assert plan_report(search_literal(emb, qvec, k=6))["python_evals"] == 0


def test_near_dup_groups_increment_equals_recompute(spark):
    from parqueryd_spark.operators.dedup import near_dup_groups, near_dup_groups_increment

    def pairs(rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    base = [(1, 2), (2, 3), (10, 11), (20, 21)]  # groups {1,2,3} {10,11} {20,21}
    old = near_dup_groups(pairs(base)).persist()

    # increment: extend group 1, MERGE groups 10/20 via a bridge, and a
    # brand-new component {30,31}
    inc = [(3, 4), (11, 20), (30, 31)]
    got = sorted(
        map(tuple, near_dup_groups_increment(old, pairs(inc)).collect())
    )
    expect = sorted(map(tuple, near_dup_groups(pairs(base + inc)).collect()))
    assert got == expect
    # group {20,21} merged under min-id 10; untouched nothing here except none
    as_map = dict(got)
    assert as_map[21] == 10 and as_map[4] == 1 and as_map[31] == 30

    # replay: applying the same increment to the UPDATED labels is a no-op
    updated = near_dup_groups_increment(old, pairs(inc)).persist()
    again = sorted(
        map(tuple, near_dup_groups_increment(updated, pairs(inc)).collect())
    )
    assert again == expect
    old.unpersist()
    updated.unpersist()


def test_near_dup_groups_increment_leaves_untouched_groups_alone(spark):
    from parqueryd_spark.operators.dedup import near_dup_groups, near_dup_groups_increment

    def pairs(rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    old = near_dup_groups(pairs([(1, 2), (50, 51), (60, 61)]))
    out = near_dup_groups_increment(old, pairs([(2, 3)]))
    as_map = {r["doc_id"]: r["group_id"] for r in out.collect()}
    assert as_map == {1: 1, 2: 1, 3: 1, 50: 50, 51: 50, 60: 60, 61: 60}


# --- substring dedup (arbitrary-boundary repeats, VERDICT r10 item #4) ---


def _py_substring_dedup(docs, n):
    """Quadratic reference: same set-based semantics as substring_dedup."""
    wins = {}  # gram -> list[(doc, pos)]
    toks = {d: t.split(" ") for d, t in docs}
    for d, ts in toks.items():
        for p in range(len(ts) - n + 1):
            wins.setdefault(" ".join(ts[p : p + n]), []).append((d, p))
    dup_cov, keep_cov = set(), set()
    for occ in wins.values():
        if len(occ) < 2:
            continue
        keeper = min(occ)
        for d, p in occ:
            cov = keep_cov if (d, p) == keeper else dup_cov
            for i in range(p, p + n):
                cov.add((d, i))
    dropped = dup_cov - keep_cov
    out = {}
    for d, ts in toks.items():
        drops = sorted(i for dd, i in dropped if dd == d)
        if drops:
            kept = [t for i, t in enumerate(ts) if (d, i) not in dropped]
            out[d] = (len(ts), len(drops), " ".join(kept))
    return out


def test_substring_dedup_matches_quadratic_oracle(spark):
    from parqueryd_spark.operators.dedup import substring_dedup

    passage = " ".join(f"p{i}" for i in range(11))  # 11-token shared passage
    docs = [
        (1, "u1 u2 u3 " + passage + " u4 u5"),          # first bearer, offset 3
        (2, "v1 " + passage + " v2 v3 v4 v5 v6"),        # same passage, offset 1
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),   # unique prose
        (4, passage),                                     # the bare passage
        (5, "x1 " + passage + " x2 " + passage),          # within-doc repeat too
        (6, " ".join(["r"] * 9)),                         # period-1 self-overlap run
        (7, " ".join(["r"] * 9)),                         # duplicate of the run
        (8, "s1 s2 s3"),                                  # shorter than the window
    ]
    n = 4
    expect = _py_substring_dedup(docs, n)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc"]: (r["n_tokens"], r["n_dropped"], r["dedup_text"])
        for r in substring_dedup(df, "doc_id", "text", min_tokens=n).collect()
    }
    assert got == expect
    # the repeat is caught at ARBITRARY offsets: doc 1 keeps everything (first
    # bearer), docs 2 and 4 lose the passage wherever it sits
    assert 1 not in got
    assert got[2][1] == 11 and got[4][1] == 11
    # self-overlapping run: exactly one n-token copy survives in the keeper
    # (ADVICE r11: assert the exact tuple — the old or-chain was vacuous
    # given the got == expect check above), and the run's LATER duplicate
    # document loses every token
    assert got[6] == (9, 9 - n, " ".join(["r"] * n))
    assert got[7] == (9, 9, "")
    # droplist mode names the same token indices it rebuilt without
    drops = {
        r["doc"]: (list(r["drop_idx"]), r["n_dropped"])
        for r in substring_dedup(df, "doc_id", "text", min_tokens=n, mode="droplist").collect()
    }
    for d, (nt, nd, text) in expect.items():
        assert drops[d][1] == nd, d
        kept_py = [
            t for i, t in enumerate(dict(docs)[d].split(" ")) if i not in set(drops[d][0])
        ]
        assert " ".join(kept_py) == text, d


def test_substring_dedup_randomized_against_oracle(spark):
    import random

    from parqueryd_spark.operators.dedup import substring_dedup

    rng = random.Random(411)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab => natural repeats
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(40)
    ]
    for n in (2, 3, 5):
        expect = _py_substring_dedup(docs, n)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc"]: (r["n_tokens"], r["n_dropped"], r["dedup_text"])
            for r in substring_dedup(df, "doc_id", "text", min_tokens=n).collect()
        }
        assert got == expect, n


def test_apply_token_droplist_matches_rebuild(spark):
    """droplist + deferred apply ≡ direct rebuild on affected docs, and
    unaffected docs pass through unchanged."""
    from parqueryd_spark.operators.dedup import apply_token_droplist, substring_dedup

    passage = " ".join(f"p{i}" for i in range(9))
    docs = [
        (1, "u1 u2 " + passage),
        (2, passage + " v1 v2"),
        (3, "w1 w2 w3 w4 w5"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    direct = {
        r["doc"]: (r["n_tokens"], r["n_dropped"], r["dedup_text"])
        for r in substring_dedup(df, "doc_id", "text", min_tokens=4).collect()
    }
    drops = substring_dedup(df, "doc_id", "text", min_tokens=4, mode="droplist")
    applied = {
        r["doc"]: (r["n_tokens"], r["n_dropped"], r["dedup_text"])
        for r in apply_token_droplist(df, drops, "doc_id", "text").collect()
    }
    assert len(applied) == 3
    for d, v in direct.items():
        assert applied[d] == v, d
    assert applied[3] == (5, 0, "w1 w2 w3 w4 w5")


def test_apply_token_droplist_heavy_drop_property(spark):
    """Property check on a HEAVY-drop fixture (ADVICE r11 / VERDICT item #6:
    the apply-side filter is now O(tokens + drops), not O(tokens x drops)):
    long documents that are mostly repeated passage — so the droplist covers
    most of each doc — rebuild exactly to the direct-mode text, and a
    synthetic droplist applied to a long document keeps precisely the
    complement positions in order."""
    import random

    from parqueryd_spark.operators.dedup import apply_token_droplist, substring_dedup

    rng = random.Random(1205)
    passage = " ".join(f"p{i}" for i in range(40))
    docs = [
        # ~90% duplicated content: passage repeated 5x with tiny unique seams
        (d, f"s{d}a " + (passage + f" s{d}b ") * 5 + passage)
        for d in range(6)
    ] + [(99, "z1 z2 z3")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    direct = {
        r["doc"]: (r["n_tokens"], r["n_dropped"], r["dedup_text"])
        for r in substring_dedup(df, "doc_id", "text", min_tokens=5).collect()
    }
    drops = substring_dedup(df, "doc_id", "text", min_tokens=5, mode="droplist")
    applied = {
        r["doc"]: (r["n_tokens"], r["n_dropped"], r["dedup_text"])
        for r in apply_token_droplist(df, drops, "doc_id", "text").collect()
    }
    for d, v in direct.items():
        assert applied[d] == v, d
        assert v[1] > v[0] * 0.5, d  # the fixture really is heavy-drop
    assert applied[99] == (3, 0, "z1 z2 z3")

    # synthetic droplist: random drop set over a 500-token doc — the rebuilt
    # text is exactly the ordered complement
    toks = [f"w{i}" for i in range(500)]
    drop_set = sorted(rng.sample(range(500), 380))
    one = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    dl = spark.createDataFrame([(1, drop_set)], "doc long, drop_idx array<int>")
    got = apply_token_droplist(one, dl, "doc_id", "text").collect()[0]
    expect_text = " ".join(t for i, t in enumerate(toks) if i not in set(drop_set))
    assert (got["n_tokens"], got["n_dropped"], got["dedup_text"]) == (500, 380, expect_text)


def test_substring_increment_equals_one_shot(spark):
    """substring_dedup_increment(increment, index(base)) ≡ one-shot
    substring_dedup(base ∪ increment) restricted to increment docs, when
    increment ids sort after base ids — on crafted and randomized corpora."""
    import random

    from parqueryd_spark.operators.dedup import (
        substring_dedup,
        substring_dedup_increment,
        substring_index,
    )

    rng = random.Random(1107)
    vocab = [f"t{i}" for i in range(10)]
    passage = " ".join(f"p{i}" for i in range(9))
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))) for i in range(30)]
    docs[3] = (3, "a1 a2 " + passage)          # base bearer of the passage
    docs[25] = (25, passage + " z9")           # increment repeats it (shifted)
    docs[27] = (27, docs[26][1])               # increment exact-dups another increment doc
    for n in (3, 4):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        base = df.filter("doc_id < 20")
        inc = df.filter("doc_id >= 20")
        one_shot = {
            r["doc"]: (r["n_tokens"], r["n_dropped"], r["dedup_text"])
            for r in substring_dedup(df, "doc_id", "text", min_tokens=n).collect()
            if r["doc"] >= 20
        }
        idx = substring_index(base, "doc_id", "text", min_tokens=n)
        got = {
            r["doc"]: (r["n_tokens"], r["n_dropped"], r["dedup_text"])
            for r in substring_dedup_increment(
                inc, idx, "doc_id", "text", min_tokens=n
            ).collect()
        }
        assert got == one_shot, n
    # the passage implanted across the base/increment split was actually hit
    assert any(d >= 20 for d in got), "fixture produced no increment-side drops"


def test_substring_index_append_composes(spark):
    """index(base) ∪ index(day1) serves day2 exactly like index(base∪day1) —
    digests are a set, append is union-distinct."""
    from parqueryd_spark.operators.dedup import (
        substring_dedup_increment,
        substring_index,
    )

    p = " ".join(f"q{i}" for i in range(6))
    base = spark.createDataFrame([(1, "b1 b2 " + p)], "doc_id long, text string")
    day1 = spark.createDataFrame([(10, "c1 " + p + " c2")], "doc_id long, text string")
    day2 = spark.createDataFrame([(20, p + " d1 d2 d3")], "doc_id long, text string")
    n = 3
    idx_union = substring_index(base.union(day1), "doc_id", "text", min_tokens=n)
    idx_merged = (
        substring_index(base, "doc_id", "text", min_tokens=n)
        .union(substring_index(day1, "doc_id", "text", min_tokens=n))
        .distinct()
    )
    a = {
        r["doc"]: (r["n_dropped"], r["dedup_text"])
        for r in substring_dedup_increment(day2, idx_union, "doc_id", "text", min_tokens=n).collect()
    }
    b = {
        r["doc"]: (r["n_dropped"], r["dedup_text"])
        for r in substring_dedup_increment(day2, idx_merged, "doc_id", "text", min_tokens=n).collect()
    }
    assert a == b and 20 in a and a[20][0] == 6


def test_minhash_pairs_from_index_equals_one_shot(spark):
    """The published-index serve path (VERDICT r11 item #4) returns exactly
    the one-shot minhash_lsh_pairs result: same banding, same exact-Jaccard
    verification, no text reprocessing."""
    from parqueryd_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_pairs,
        minhash_pairs_from_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    one_shot = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, num_hashes=128, bands=32, threshold=0.8
        ).collect()
    }
    idx = minhash_index(docs, "doc_id", "text", k=3, num_hashes=128)
    served = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_pairs_from_index(
            idx, num_hashes=128, bands=32, threshold=0.8
        ).collect()
    }
    assert served == one_shot and len(served) > 0


def test_substring_index_grain_mismatch_raises(spark):
    """Consuming a substring index at the wrong min_tokens raises instead of
    silently matching nothing (review r12: digests of different window
    lengths never collide, so a grain mismatch used to report a contaminated
    corpus as clean)."""
    from parqueryd_spark.operators.dedup import (
        substring_decontaminate,
        substring_dedup_increment,
        substring_index,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(20)))], "doc_id long, text string"
    )
    idx8 = substring_index(docs, "doc_id", "text", min_tokens=8)
    with pytest.raises(ValueError, match="min_tokens=8.*min_tokens=4"):
        substring_decontaminate(docs, idx8, "doc_id", "text", min_tokens=4).collect()
    with pytest.raises(ValueError, match="min_tokens=8.*min_tokens=16"):
        substring_dedup_increment(docs, idx8, "doc_id", "text", min_tokens=16).collect()
    # matching grain passes; a pre-n index (digest only) skips the check
    substring_decontaminate(docs, idx8, "doc_id", "text", min_tokens=8).collect()
    legacy = idx8.select("digest")
    substring_decontaminate(docs, legacy, "doc_id", "text", min_tokens=4).collect()


def test_span_dedup_drop_join_modes_agree(spark):
    """drop_join='shuffle' (the AQE-degradable escape hatch for corpora whose
    drop lists exceed broadcast limits — review r12) returns exactly the
    broadcast-hinted plan's answer."""
    from parqueryd_spark.operators.dedup import span_dedup

    passage = " ".join(f"p{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(d, f"u{d} " + passage + f" v{d}") for d in range(12)],
        "doc_id long, text string",
    )
    def run(mode):
        return sorted(
            (r["doc"], r["n_spans"], r["n_kept"], r["dedup_text"])
            for r in span_dedup(
                docs, "doc_id", "text", span_tokens=4, rebuild="droplist", drop_join=mode
            ).collect()
        )
    assert run("broadcast") == run("shuffle")
    with pytest.raises(ValueError, match="drop_join"):
        span_dedup(docs, "doc_id", "text", rebuild="droplist", drop_join="nope")


def test_minhash_index_signature_width_mismatch_raises(spark):
    """Serving a minhash index at the wrong num_hashes raises (review r12:
    over-asking slices past the signature and every trailing band becomes a
    single all-documents bucket — an O(n^2) candidate explosion; under-asking
    silently bands a prefix and changes recall)."""
    from parqueryd_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_index,
        minhash_pairs_from_index,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id long, text string"
    )
    idx64 = minhash_index(docs, "doc_id", "text", k=3, num_hashes=64)
    with pytest.raises(ValueError, match="64 hashes.*num_hashes=128"):
        minhash_pairs_from_index(idx64, num_hashes=128, bands=32)
    with pytest.raises(ValueError, match="64 hashes.*num_hashes=32"):
        incremental_minhash_pairs(idx64, idx64, num_hashes=32, bands=8)
    # matching width serves fine
    minhash_pairs_from_index(idx64, num_hashes=64, bands=16).collect()
