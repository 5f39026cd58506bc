"""Property-based differential test of near_dup_groups: on random edge lists,
the Spark min-label-propagation fixpoint must agree with a trivially-correct
pure-Python union-find — every node labeled with the smallest id in its
component, regardless of graph shape (chains, stars, cycles, disjoint
cliques, self-loop-free random graphs).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


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
