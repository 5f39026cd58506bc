"""Shuffle-byte contracts (VERDICT r11 item #3): certain operators PROMISE
that document text never crosses a shuffle — the property that makes them
viable at 100 TB — and local wall time cannot detect a regression there.
These tests measure actual shuffle bytes via plans/telemetry.ShuffleDelta and
pin the contracts: growing every token ~8x in CHARACTER length must leave the
droplist paths' shuffle volume nearly unchanged (digests are fixed 16-byte
values), while the text-carrying rebuild visibly grows.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from parqueryd_spark.plans.telemetry import ShuffleDelta, shuffle_bytes


def _corpus(spark, token_chars: int, n_docs: int = 80, toks_per_doc: int = 96):
    """Docs over a shared vocabulary (heavy duplication) where each token is
    ``token_chars`` RANDOM characters — same token COUNT and digest stream
    either way, only the text payload scales. Tokens must be high-entropy:
    shuffle blocks are LZ4-compressed, so repeated-character filler would
    compress away the very bytes the test measures."""
    import random
    import string

    rng = random.Random(42)
    vocab = [
        "".join(rng.choices(string.ascii_lowercase, k=token_chars)) for _ in range(400)
    ]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(toks_per_doc)))
        for d in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run_bytes(spark, df, **kwargs) -> int:
    from parqueryd_spark.operators.dedup import substring_dedup

    with ShuffleDelta(spark) as d:
        substring_dedup(df, "doc_id", "text", min_tokens=4, **kwargs).write.mode(
            "overwrite"
        ).format("noop").save()
    return d.total


def test_shuffle_bytes_reader_sees_a_shuffle(spark):
    r0, w0 = shuffle_bytes(spark)
    spark.range(200_000).withColumn("k", F.col("id") % 100).groupBy("k").count().write.mode(
        "overwrite"
    ).format("noop").save()
    r1, w1 = shuffle_bytes(spark)
    assert r1 > r0 and w1 > w0


def test_substring_droplist_shuffle_is_text_size_invariant(spark):
    """substring_dedup(mode='droplist') — the 'text never crosses a shuffle'
    serving path: 8x longer tokens may grow its shuffle volume only
    marginally, because the dominant shuffle carries fixed 16-byte digests
    and integer positions, never the token text."""
    small = _corpus(spark, token_chars=2)
    big = _corpus(spark, token_chars=16)

    drop_small = _run_bytes(spark, small, mode="droplist")
    drop_big = _run_bytes(spark, big, mode="droplist")
    assert drop_small > 0  # the digest shuffle is real
    assert drop_big < drop_small * 1.5, (drop_small, drop_big)


def test_span_dedup_droplist_vs_carry_shuffle_contract(spark):
    """span_dedup's two documented rebuild plans, measured: the CARRY plan
    ships span text through the digest shuffle (volume grows with token
    length — the positive control proving the meter sees text), the
    DROPLIST plan cuts the exploded side to (doc, pos, digest) first, joins
    the drop lists back under an explicit broadcast hint (r12 fix: AQE's
    SortMergeJoin paid the base-side text shuffle WRITE even when converted
    to broadcast at runtime), and stays text-size invariant."""
    from parqueryd_spark.operators.dedup import span_dedup

    small = _corpus(spark, token_chars=2)
    big = _corpus(spark, token_chars=16)

    def run(df, rebuild):
        with ShuffleDelta(spark) as d:
            span_dedup(df, "doc_id", "text", span_tokens=8, rebuild=rebuild).write.mode(
                "overwrite"
            ).format("noop").save()
        return d.total

    carry_small, carry_big = run(small, "carry"), run(big, "carry")
    drop_small, drop_big = run(small, "droplist"), run(big, "droplist")
    # 8x token bytes: carry measured ~1.8x (text through the digest shuffle,
    # diluted by fixed per-row overhead), droplist ~1.0x — the 1.6/1.3
    # thresholds keep a clear gap between the two regimes
    assert carry_big > carry_small * 1.6, (carry_small, carry_big)
    assert drop_big < drop_small * 1.3, (drop_small, drop_big)


def test_nb_score_shuffle_does_not_carry_text(spark):
    """nb_score's shuffle grain is (doc, class, partial-sum): multiplying
    every document's TEXT ~8x (longer high-entropy tokens, same token count)
    must leave the scoring shuffle volume nearly unchanged — the hashed
    buckets are fixed-width ints and partial sums reduce map-side."""
    from parqueryd_spark.operators.classify import nb_score, nb_train

    short = _corpus(spark, token_chars=6).withColumn(
        "lang", (F.col("doc_id") % 2).cast("string")
    )
    long_ = _corpus(spark, token_chars=48).withColumn(
        "lang", (F.col("doc_id") % 2).cast("string")
    )

    def run(docs):
        model = nb_train(docs, "lang", n_buckets=256)
        with ShuffleDelta(spark) as d:
            nb_score(docs, model, n_buckets=256).write.mode("overwrite").format(
                "noop"
            ).save()
        return d.total

    b_short, b_long = run(short), run(long_)
    assert b_long <= b_short * 1.5 + 64 * 1024, (b_short, b_long)


def test_exact_topk_confirm_shuffle_is_duplication_invariant(spark):
    """heavy_hitters_exact_topk's confirm aggregate reduces map-side to
    candidate-grain partials: replicating every row 8x (same key set) must
    leave the shuffle volume nearly flat, unlike a naive full groupBy whose
    input grew 8x (here both shuffles stay candidate-grain — the test pins
    that the plan keeps partial aggregation, the property that makes the
    confirm pass safe at 100 TB)."""
    from parqueryd_spark.operators.sketches import heavy_hitters_exact_topk

    base = (
        spark.createDataFrame([(f"k{i % 50}",) for i in range(4000)], "k string")
        .repartition(8)
        .persist()
    )
    big = (
        spark.createDataFrame([(f"k{i % 50}",) for i in range(32000)], "k string")
        .repartition(8)
        .persist()
    )
    base.count(), big.count()  # materialize: keep the input repartition
    # shuffle OUT of the measured window — only the operator's own shuffles
    # (MG summaries + candidate-grain confirm) may count

    def run(df):
        with ShuffleDelta(spark) as d:
            heavy_hitters_exact_topk(df, "k", k=10, capacity=128).write.mode(
                "overwrite"
            ).format("noop").save()
        return d.total

    b1, b8 = run(base), run(big)
    base.unpersist(), big.unpersist()
    assert b8 <= b1 * 1.5 + 64 * 1024, (b1, b8)
