"""Property-based differential test of the ordered funnel: on random event
sets, the Spark per-user fold (operators/analytics.py funnel_stages) must
agree with a trivially-correct pure-Python greedy walk — same stage counts
and same stage timestamps, for any interleaving of stage/non-stage events."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parqueryd_spark.operators.analytics import funnel_stages

STAGES = ["view", "click", "purchase"]
TYPES = STAGES + ["error", "signup"]
_T0 = datetime(2024, 1, 1)


def _py_funnel(events: list[tuple[int, int, str]]) -> dict[int, list[int]]:
    """user -> stage minute-offsets, greedy earliest-qualifying walk."""
    out: dict[int, list[int]] = {}
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, m, t in events:
        by_user.setdefault(u, []).append((m, t))
    for u, evs in by_user.items():
        filled: list[int] = []
        for m, t in sorted(evs):
            if (
                len(filled) < len(STAGES)
                and t == STAGES[len(filled)]
                and (not filled or m > filled[-1])
            ):
                filled.append(m)
        if filled:
            out[u] = filled
    return out


# few users + few minutes forces same-user chains and repeated types; event
# times are unique per user so the greedy walk is deterministic
_event = st.tuples(st.integers(0, 3), st.integers(0, 30), st.sampled_from(TYPES))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(_event, min_size=1, max_size=25, unique_by=lambda e: (e[0], e[1])))
def test_funnel_matches_pure_python(spark, events):
    df = spark.createDataFrame(
        [(u, _T0 + timedelta(minutes=m), t) for u, m, t in events],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r.user: [int((t - _T0).total_seconds() // 60) for t in r.stage_ts]
        for r in funnel_stages(df, STAGES).collect()
    }
    assert got == _py_funnel(events)
