"""Unit tests for the data-quality operators (operators/quality.py) on
fixtures that actually violate each constraint."""

from __future__ import annotations

from parqueryd_spark.operators.quality import (
    check_foreign_key,
    check_not_null,
    check_range,
    check_unique,
    quality_report,
    table_stats,
)


def test_checks_count_real_violations(spark):
    child = spark.createDataFrame(
        [(1, 10, 5.0), (1, 10, 99.0), (1, 20, None), (2, 30, -1.0), (None, 10, 3.0)],
        "k long, fk long, v double",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    rep = {
        r.check: (r.violations, r.passed)
        for r in quality_report(
            [
                check_unique(child, ["k"]),          # k=1 three times -> 2 extras
                check_not_null(child, ["k", "v"]),   # 1 null k + 1 null v
                check_foreign_key(child, "fk", parent, "pk"),  # fk=30 orphan
                check_range(child, "v", 0, 50),      # 99.0 and -1.0 (null skipped)
            ]
        ).collect()
    }
    assert rep["unique(k)"] == (2, False)
    assert rep["not_null(k,v)"] == (2, False)
    assert rep["fk(fk->pk)"] == (1, False)
    assert rep["range(v,[0,50])"] == (2, False)


def test_checks_pass_on_clean_data(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    rep = quality_report(
        [check_unique(df, ["k"]), check_not_null(df, ["k", "v"]), check_range(df, "v", 0, 5)]
    ).collect()
    assert all(r.passed and r.violations == 0 for r in rep)


def test_table_stats_single_scan_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c"), (3, "b")], "k long, s string"
    )
    stats = {r.column: r for r in table_stats(df).collect()}
    assert stats["k"].n_rows == 4
    assert stats["k"].n_nulls == 0 and stats["k"].n_distinct == 3
    # native-typed min/max THEN stringified (not lexicographic)
    assert (stats["k"].min_value, stats["k"].max_value) == ("1", "3")
    assert stats["s"].n_nulls == 1 and stats["s"].n_distinct == 3
    assert (stats["s"].min_value, stats["s"].max_value) == ("a", "c")


def test_table_diff_statuses_and_unchanged_omitted(spark):
    from parqueryd_spark.operators.quality import table_diff

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)], "k long, s string, v double"
    )
    b = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 9.0), (4, "w", 4.0)], "k long, s string, v double"
    )
    out = {r.k: r.status for r in table_diff(a, b, ["k"]).collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}  # key 1 unchanged => omitted
    # compare_cols narrows the changed test: v differs on 2 but s doesn't
    out_s = {r.k: r.status for r in table_diff(a, b, ["k"], compare_cols=["s"]).collect()}
    assert out_s == {3: "removed", 4: "added"}


def test_table_diff_join_is_key_grain_only(spark):
    """The full-outer join must carry only keys + digests — no row-width
    columns cross the shuffle (the 100 TB posture the docstring claims)."""
    from parqueryd_spark.operators.quality import table_diff
    from parqueryd_spark.plans.audit import plan_report
    from parqueryd_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    d = table_diff(orders, orders.limit(10), ["o_orderkey"])
    rep = plan_report(d)
    assert rep["python_evals"] == 0


def test_compression_ratio_separates_repetitive_from_random(spark):
    from parqueryd_spark.operators.quality import compression_ratio

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam " * 20),
            (2, "k9#xQ!mZ@4vR$8pL^2wN&6tY*0uI(3oP)7aS-5dF_1gH+jE " * 20),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc: r for r in compression_ratio(docs, "doc_id", "text").collect()}
    assert out[1].ratio < 0.1          # pure repetition collapses
    assert out[2].ratio > out[1].ratio * 3  # high-entropy text compresses worse
    assert out[3].n_bytes == 0 and out[3].ratio > 0  # null-safe, no div-by-zero
    # determinism across partitionings (batch-shape independence)
    again = {
        r.doc: r.ratio
        for r in compression_ratio(docs.repartition(5), "doc_id", "text").collect()
    }
    assert {k: v.ratio for k, v in out.items()} == again


def test_table_diff_detects_null_shifted_values(spark):
    """(null,'x') vs ('x',null) must register as changed: xxhash64 skips null
    inputs, so the digest interleaves per-column null flags to keep every
    column's contribution positional."""
    from parqueryd_spark.operators.quality import table_diff

    a = spark.createDataFrame([(1, None, "x"), (2, "y", "y")], "k long, c1 string, c2 string")
    b = spark.createDataFrame([(1, "x", None), (2, "y", "y")], "k long, c1 string, c2 string")
    out = {r.k: r.status for r in table_diff(a, b, ["k"]).collect()}
    assert out == {1: "changed"}


def test_quantile_calibrate_ranks_within_group(spark):
    """quantile_calibrate: percent_rank is per-group ((rank-1)/(n-1) with
    deterministic tiebreaks), 0 for a single-row group, and a shared
    threshold selects the same FRACTION of every group regardless of raw
    score scale."""
    from parqueryd_spark.operators.quality import quantile_calibrate

    rows = (
        # source a: scores 1..5 (small scale)
        [(i, "a", i) for i in range(1, 6)]
        # source b: scores 100..500 (different scale, same shape)
        + [(i + 10, "b", 100 * i) for i in range(1, 6)]
        # source c: single row -> calib 0
        + [(99, "c", 7)]
        # source d: all-equal scores -> ties broken by id, ranks still spread
        + [(20, "d", 3), (21, "d", 3), (22, "d", 3)]
    )
    df = spark.createDataFrame(rows, "id long, source string, score long")
    got = {
        (r.source, r.id): r.calib
        for r in quantile_calibrate(df, "source", "score", ["id"]).collect()
    }
    for i in range(1, 6):
        assert got[("a", i)] == got[("b", i + 10)] == round((i - 1) / 4, 6)
    assert got[("c", 99)] == 0.0
    assert [got[("d", i)] for i in (20, 21, 22)] == [0.0, 0.5, 1.0]
    # shared threshold keeps the same fraction of a and b
    keep_a = sum(1 for (s, _), c in got.items() if s == "a" and c >= 0.5)
    keep_b = sum(1 for (s, _), c in got.items() if s == "b" and c >= 0.5)
    assert keep_a == keep_b == 3


def test_calibration_frozen_serve_step_lookup(spark):
    """calibration_cdf + calibration_score: new scores take the frozen cdf of
    the largest reference score at or below them (ties inherit the reference
    value), scores below every reference get 0.0, and — the point of the
    frozen gate — the served values do NOT move when the new batch itself is
    skewed (unlike a per-batch percent_rank refit)."""
    from parqueryd_spark.operators.quality import calibration_cdf, calibration_score

    ref_rows = [(i, "a", s) for i, s in enumerate([10, 20, 20, 40])]
    ref = calibration_cdf(
        spark.createDataFrame(ref_rows, "id long, g string, s long"), "g", "s"
    )
    # frozen CDF: 10 -> 1/4, 20 -> 3/4 (two rows at 20), 40 -> 1.0
    cdf = {r.s: r.cdf for r in ref.collect()}
    assert cdf == {10: 0.25, 20: 0.75, 40: 1.0}

    probes = [
        (1, "a", 5),    # below all -> 0.0
        (2, "a", 10),   # exact lowest -> 0.25
        (3, "a", 20),   # tie -> inherits 0.75
        (4, "a", 25),   # between 20 and 40 -> steps down to 0.75
        (5, "a", 99),   # above all -> 1.0
    ]
    new = spark.createDataFrame(probes, "doc long, g string, s long")
    got = {
        r.doc: r.calib
        for r in calibration_score(ref, new, "g", "s", "doc").collect()
    }
    assert got == {1: 0.0, 2: 0.25, 3: 0.75, 4: 0.75, 5: 1.0}

    # skewed second batch: same probe scores plus a flood of high scores —
    # frozen calib for the original probes must be unchanged
    flood = new.union(
        spark.createDataFrame([(100 + i, "a", 1000) for i in range(20)],
                              "doc long, g string, s long")
    )
    again = {
        r.doc: r.calib
        for r in calibration_score(ref, flood, "g", "s", "doc").collect()
        if r.doc <= 5
    }
    assert again == got


def test_calibration_score_preserves_string_ids(spark):
    """ADVICE r13 regression: a string/UUID id column must survive
    calibration_score untouched — the earlier cast-to-long silently nulled
    every non-numeric id (and with it the deterministic tiebreak)."""
    from parqueryd_spark.operators.quality import calibration_cdf, calibration_score

    ref_rows = [(f"r{i}", "a", s) for i, s in enumerate([10, 20, 20, 40])]
    ref = calibration_cdf(
        spark.createDataFrame(ref_rows, "id string, g string, s long"), "g", "s"
    )
    probes = [
        ("doc-005", "a", 5),
        ("7f1c2e3a-0000-4000-8000-000000000001", "a", 10),
        ("doc-020", "a", 20),
        ("doc-099", "a", 99),
    ]
    new = spark.createDataFrame(probes, "doc string, g string, s long")
    out = calibration_score(ref, new, "g", "s", "doc")
    assert dict(out.dtypes)["doc"] == "string"
    got = {r.doc: r.calib for r in out.collect()}
    assert got == {
        "doc-005": 0.0,
        "7f1c2e3a-0000-4000-8000-000000000001": 0.25,
        "doc-020": 0.75,
        "doc-099": 1.0,
    }
    assert all(k is not None for k in got)
