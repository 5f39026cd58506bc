"""Unit tests for the curation operators: PII detection/redaction and
sub-document span dedup (operators/pii.py, operators/dedup.py span_dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parqueryd_spark.operators.dedup import span_dedup
from parqueryd_spark.operators.pii import has_pii, pii_counts, redact_pii


def _one(spark, text: str):
    return spark.createDataFrame([(text,)], "text string")


def _redacted(spark, text: str) -> str:
    return _one(spark, text).select(redact_pii("text").alias("r")).first().r


def test_redact_each_category(spark):
    assert (
        _redacted(spark, "mail bob.smith+x@corp.example.org now")
        == "mail <EMAIL> now"
    )
    assert _redacted(spark, "host 192.168.0.1 up") == "host <IP> up"
    assert _redacted(spark, "ssn 123-45-6789 leaked") == "ssn <ID> leaked"
    assert _redacted(spark, "call +44 555-0142 today") == "call <PHONE> today"


def test_redact_clean_text_unchanged(spark):
    clean = "no contact information here, just words and 42 numbers"
    assert _redacted(spark, clean) == clean


def test_redact_multiple_and_counts(spark):
    text = "a@b.io and c@d.io from 10.0.0.1 id 111-22-3333 tel +1 555-0100 ."
    row = (
        _one(spark, text)
        .select(
            *[c.alias(n) for n, c in pii_counts("text").items()],
            has_pii("text").alias("any"),
            redact_pii("text").alias("r"),
        )
        .first()
    )
    assert (row.email, row.ipv4, row.id_number, row.phone) == (2, 1, 1, 1)
    assert row.any
    assert row.r == "<EMAIL> and <EMAIL> from <IP> id <ID> tel <PHONE> ."


def test_ipv4_matches_leading_quad_of_version_string(spark):
    # documented behavior: the word-bounded quad matches the first four octets
    assert _redacted(spark, "v 1.2.3.4.5 x") == "v <IP>.5 x"


def test_has_pii_prefilter(spark):
    df = spark.createDataFrame(
        [(1, "clean words only"), (2, "leak a@b.co here")], "id long, text string"
    )
    hits = df.filter(has_pii("text")).select("id").collect()
    assert [r.id for r in hits] == [2]


def test_span_dedup_keep_first_across_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c x y z")], "doc_id long, text string"
    )
    rows = {
        r.doc: r
        for r in span_dedup(df, "doc_id", "text", span_tokens=3).collect()
    }
    assert rows[1].n_spans == 2 and rows[1].n_kept == 2
    assert rows[1].dedup_text == "a b c d e f"
    # doc 2 shares span "a b c" with the earlier doc 1 and loses it
    assert rows[2].n_spans == 2 and rows[2].n_kept == 1
    assert rows[2].dedup_text == "x y z"


def test_span_dedup_fully_duplicate_doc_survives_with_empty_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    rows = {
        r.doc: r
        for r in span_dedup(df, "doc_id", "text", span_tokens=3).collect()
    }
    assert rows[1].dedup_text == "a b c"
    assert rows[2].n_spans == 1 and rows[2].n_kept == 0
    assert rows[2].dedup_text == ""


def test_span_dedup_within_doc_repeats(spark):
    # the same span repeated inside ONE doc also dedups (keep-first by pos)
    df = spark.createDataFrame([(7, "p q r p q r")], "doc_id long, text string")
    row = span_dedup(df, "doc_id", "text", span_tokens=3).first()
    assert row.n_spans == 2 and row.n_kept == 1
    assert row.dedup_text == "p q r"


def test_span_dedup_ragged_tail(spark):
    # 4 tokens at span 3 -> spans "a b c" and "d" (clamped slice, no padding)
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    row = span_dedup(df, "doc_id", "text", span_tokens=3).first()
    assert row.n_spans == 2 and row.n_kept == 2
    assert row.dedup_text == "a b c d"


def test_paragraph_dedup_keeps_first_occurrence(spark):
    from parqueryd_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [
            (1, "intro text\nshared license block\nunique body one"),
            (2, "shared license block\nunique body two"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc: r for r in paragraph_dedup(df, "doc_id", "text").collect()}
    assert rows[1].n_spans == 3 and rows[1].n_kept == 3
    assert rows[2].n_spans == 2 and rows[2].n_kept == 1
    assert rows[2].dedup_text == "unique body two"
    # order of surviving paragraphs is preserved
    assert rows[1].dedup_text == "intro text\nshared license block\nunique body one"


def test_edit_distance_join_lossless_blocking(spark):
    from parqueryd_spark.operators.relational import edit_distance_join

    left = spark.createDataFrame(
        [(1, "kitten"), (2, "abcdef")], "id_a long, s string"
    )
    right = spark.createDataFrame(
        # sitting: distance 3 from kitten; kitte: 1 (deletion, shorter);
        # kittenxy: 2 (insertions, longer); zzzzzz: far
        [(10, "sitting"), (11, "kitte"), (12, "kittenxy"), (13, "zzzzzz")],
        "id_b long, t string",
    )
    got = {
        (r.id_a, r.id_b): r.distance
        for r in edit_distance_join(left, right, "s", "t", max_distance=3).collect()
    }
    assert got[(1, 10)] == 3
    assert got[(1, 11)] == 1
    assert got[(1, 12)] == 2
    assert (1, 13) not in got
    assert (2, 13) not in got  # length in band but distance 6 > 3


def test_normalize_text_variants(spark):
    from parqueryd_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [("  Hello,   WORLD!  ",)], "text string"
    )
    full = df.select(normalize_text("text", strip_punct=True).alias("n")).first().n
    assert full == "hello world"
    keep_punct = df.select(normalize_text("text").alias("n")).first().n
    assert keep_punct == "hello, world!"
    no_case = df.select(
        normalize_text("text", lowercase=False, strip_punct=True).alias("n")
    ).first().n
    assert no_case == "Hello WORLD"


def test_weighted_sample_favors_heavy_weights_and_matches_python(spark):
    """The derandomized A-Res draw must reproduce a pure-Python walk exactly,
    and across salts the inclusion frequency of a heavily-weighted row must
    dominate a light one."""
    import hashlib
    import math

    from parqueryd_spark.operators.sampling import weighted_sample

    rows = [(i, 100.0 if i % 10 == 0 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, w double")

    def py_score(k, w, salt):
        u = (int(hashlib.md5(f"{k}{salt}".encode()).hexdigest()[:8], 16) + 0.5) / 2**32
        return round(math.log(u) / w, 10)

    got = [(r.k, r.sample_score) for r in weighted_sample(df, "k", "w", 20, "s1").collect()]
    want = sorted(
        ((k, py_score(k, w, "s1")) for k, w in rows), key=lambda t: (-t[1], t[0])
    )[:20]
    assert got == want

    heavy_hits = light_hits = 0
    for salt in ("a", "b", "c", "d", "e"):
        picked = {r.k for r in weighted_sample(df, "k", "w", 20, salt).collect()}
        heavy_hits += sum(1 for k in picked if k % 10 == 0)
        light_hits += sum(1 for k in picked if k % 10 != 0)
    # 20 heavy rows at weight 100 vs 180 light at weight 1: the heavy tenth
    # of the population must take the clear majority of every draw
    assert heavy_hits > light_hits

    # plan: heap top-n, never a global sort
    from parqueryd_spark.plans.audit import plan_report

    assert plan_report(weighted_sample(df, "k", "w", 20))["has_take_ordered"]


def test_materialize_packed_sequences_invariants(spark):
    """Packed bins must reconstruct the exact token stream: flattening bins in
    order equals concatenating the docs in order; offsets mark each doc's
    start; bins respect the budget except for oversized single docs."""
    from parqueryd_spark.operators.sampling import materialize_packed_sequences

    rows = [
        (1, [1, 2, 3]),
        (2, [4, 5]),
        (3, [6, 7, 8, 9]),
        (4, [10]),
        (5, list(range(20, 35))),  # 15 ids: longer than the budget on its own
        (6, [99]),
    ]
    enc = spark.createDataFrame(rows, "doc long, input_ids array<int>")
    out = sorted(
        materialize_packed_sequences(enc, seq_len=6).collect(), key=lambda r: r.bin_id
    )
    # stream reconstruction
    flat = [t for r in out for t in r.token_ids]
    assert flat == [t for _, ids in rows for t in ids]
    for r in out:
        assert r.n_tokens == len(r.token_ids)
        assert r.n_docs == len(r.doc_offsets)
        assert r.doc_offsets[0] == 0
        assert all(b > a for a, b in zip(r.doc_offsets, r.doc_offsets[1:]))
    # every bin's START respects the budget rule; the oversized doc 5 gets
    # its own bin(s) without corrupting neighbors
    assert any(len(r.token_ids) > 6 for r in out)  # the oversized one


def test_weighted_sample_grouped_draws_n_per_group(spark):
    from parqueryd_spark.operators.sampling import weighted_sample
    from parqueryd_spark.plans.audit import explain_str

    rows = [(i, ["x", "y", "z"][i % 3], float(1 + i % 7)) for i in range(90)]
    df = spark.createDataFrame(rows, "k long, grp string, w double")
    out = weighted_sample(df, "k", "w", 5, "s", group_cols=["grp"])
    by_grp = {}
    for r in out.collect():
        by_grp.setdefault(r.grp, []).append(r.k)
    assert {g: len(ks) for g, ks in by_grp.items()} == {"x": 5, "y": 5, "z": 5}
    # grouped draw must pre-trim map-side (WindowGroupLimit), like cap_per_group
    assert "WindowGroupLimit" in explain_str(out, "simple")


def test_k_anonymity_suppression_and_null_combos(spark):
    from parqueryd_spark.operators.pii import k_anonymity_violations, k_anonymize

    rows = (
        [("a", "x")] * 5          # safe combo
        + [("a", "y")] * 2        # rare: suppressed at k=3
        + [(None, "x")] * 3       # NULL quasi value is its own (safe) combo
        + [(None, "y")]           # rare NULL combo: suppressed
    )
    df = spark.createDataFrame(rows, "qid string, attr string")
    viol = {
        (r["qid"], r["attr"]): r["group_size"]
        for r in k_anonymity_violations(df, ["qid", "attr"], k=3).collect()
    }
    assert viol == {("a", "y"): 2, (None, "y"): 1}
    kept = k_anonymize(df, ["qid", "attr"], k=3)
    assert kept.count() == 8
    combos = {(r["qid"], r["attr"]) for r in kept.collect()}
    assert combos == {("a", "x"), (None, "x")}
    # every surviving combo satisfies the floor
    sizes = kept.groupBy("qid", "attr").count().collect()
    assert all(r["count"] >= 3 for r in sizes)
