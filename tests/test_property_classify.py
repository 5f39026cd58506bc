"""Property-based differential test of the NB classifier: on random small
corpora, nb_train/nb_score must agree with a from-scratch pure-Python
multinomial NB using the identical formula (md5 bucket hash, Laplace
smoothing, ln priors, 4-decimal rounding, min-label argmax tiebreak) — the
same replay DuckDB performs in the text_nb_langid oracle, independently
re-derived here so a regression in either the operator or the oracle SQL
convention is caught without Spark-vs-DuckDB agreement masking it."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

N_BUCKETS = 32
_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"])
_doc = st.tuples(st.lists(_word, min_size=1, max_size=6), st.sampled_from(["X", "Y"]))


def _bucket(token: str) -> int:
    return int(hashlib.md5(f"{token}:nb".encode()).hexdigest()[:8], 16) % N_BUCKETS


def _py_nb(train: list[tuple[list[str], str]], score: list[list[str]]):
    counts: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    docs: dict[str, int] = {}
    for words, lab in train:
        docs[lab] = docs.get(lab, 0) + 1
        for w in words:
            b = _bucket(w)
            counts[(lab, b)] = counts.get((lab, b), 0) + 1
            totals[lab] = totals.get(lab, 0) + 1
    nd = sum(docs.values())

    def _half_up(x: float) -> int:
        # Spark round() / DuckDB round(): half away from zero (NOT Python's
        # banker's rounding) — replicate it exactly
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    out = []
    for words in score:
        best = None
        for lab in sorted(docs):
            # exact integer micro-nat sum (the r15 nb_score contract): each
            # model cell quantized once, then integer addition only
            s_n = _half_up(math.log(docs[lab] / nd) * 1e6)
            for w in words:
                c = counts.get((lab, _bucket(w)), 0)
                s_n += _half_up(math.log((c + 1.0) / (totals[lab] + 1.0 * N_BUCKETS)) * 1e6)
            s = s_n / 1e6
            if best is None or s_n > best[2] or (s_n == best[2] and lab < best[0]):
                best = (lab, s, s_n)
        out.append((best[0], best[1]))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(train=st.lists(_doc, min_size=2, max_size=12), score=st.lists(st.lists(_word, min_size=1, max_size=6), min_size=1, max_size=6))
def test_nb_matches_pure_python_replay(spark, train, score):
    from parqueryd_spark.operators.classify import nb_score, nb_train

    # both classes must appear, else priors degenerate (operator and replay
    # agree there too, but the interesting surface is the two-class argmax)
    labels = {lab for _, lab in train}
    if len(labels) < 2:
        train = train + [(["aa"], "X"), (["bb"], "Y")]

    tr = spark.createDataFrame(
        [(i, " ".join(ws), lab) for i, (ws, lab) in enumerate(train)],
        "doc_id long, text string, lang string",
    )
    sc = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(score)], "doc_id long, text string"
    )
    model = nb_train(tr, "lang", n_buckets=N_BUCKETS)
    got = {
        r.doc_id: (r.label, r.score) for r in nb_score(sc, model, n_buckets=N_BUCKETS).collect()
    }
    want = dict(enumerate(_py_nb(train, score)))
    # rounding is applied before the argmax in both; equality is exact
    assert got == want, (got, want)
