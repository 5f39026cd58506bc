"""Property-based differential tests of the pipeline graph/set operators:

- near_dup_groups: on random edge lists, the Spark min-label-propagation
  fixpoint must agree with a trivially-correct pure-Python union-find —
  every node labeled with the smallest id in its component, regardless of
  graph shape (chains, stars, cycles, disjoint cliques).
- contamination_stats: on random small-vocab corpora, per-doc gram/hit
  counts must agree with pure-Python set arithmetic over the same
  shingle definition (distinct k-grams, whole-doc fallback under k tokens).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


# small node space forces dense/cyclic structures; bigger ids catch chains
_edge = st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(_edge, min_size=1, max_size=18))
def test_near_dup_groups_matches_union_find(spark, edges):
    from parqueryd_spark.operators.dedup import near_dup_groups

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {r.doc_id: r.group_id for r in near_dup_groups(pairs).collect()}
    assert got == _union_find_components(edges)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(_edge, min_size=1, max_size=18))
def test_star_contraction_matches_union_find(spark, edges):
    """The O(log n) fallback must agree with union-find on arbitrary graph
    shapes too — it is what non-converged label propagation falls back to,
    so a bug here surfaces exactly when correctness matters most."""
    from parqueryd_spark.operators.dedup import star_contraction_groups

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {r.doc_id: r.group_id for r in star_contraction_groups(pairs).collect()}
    assert got == _union_find_components(edges)


def test_star_contraction_10k_node_path(spark):
    """Adversarial chain: a 10k-node path graph (diameter 9999) converges in
    O(log n) star rounds — the shape where min-label propagation's
    O(diameter) loop is documented-unsafe."""
    from parqueryd_spark.operators.dedup import star_contraction_groups

    pairs = spark.range(9_999).select(
        (F.col("id")).alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    groups = star_contraction_groups(pairs)
    assert groups.count() == 10_000
    assert groups.where(F.col("group_id") != 0).count() == 0


def test_near_dup_groups_falls_back_on_long_chain(spark):
    """Exhausting max_iter must not return component-splitting labels: the
    operator warns and switches to the star contraction, so callers still
    get correct groups."""
    import pytest

    from parqueryd_spark.operators.dedup import near_dup_groups

    pairs = spark.range(200).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    with pytest.warns(UserWarning, match="falling back"):
        groups = near_dup_groups(pairs, max_iter=3)
    assert groups.where(F.col("group_id") != 0).count() == 0
    assert groups.count() == 201


def _py_shingles(text: str, k: int) -> set[str]:
    toks = text.split(" ")
    if len(toks) >= k:
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return {" ".join(toks)}


_doc = st.lists(st.sampled_from("alpha beta gamma delta".split()), min_size=1, max_size=8).map(
    " ".join
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(_doc, min_size=1, max_size=6),
    bench=st.lists(_doc, min_size=0, max_size=3),
    k=st.integers(2, 4),
)
def test_contamination_stats_matches_set_arithmetic(spark, corpus, bench, k):
    from parqueryd_spark.operators.dedup import contamination_stats

    corpus_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    bench_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    got = {
        r.doc: (r.n_grams, r.n_hits, r.contaminated)
        for r in contamination_stats(corpus_df, bench_df, "doc_id", "text", k=k).collect()
    }
    bench_grams: set[str] = set()
    for t in bench:
        bench_grams |= _py_shingles(t, k)
    want = {}
    for i, t in enumerate(corpus):
        gs = _py_shingles(t, k)
        hits = len(gs & bench_grams)
        want[i] = (len(gs), hits, hits >= 1)
    assert got == want
