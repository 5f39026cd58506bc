"""Property-based differential testing of the where-term/agg compiler:
random filter+agg combinations over a synthetic table must match DuckDB
running the equivalent SQL — the reference's differential-oracle strategy
(SURVEY.md §5.1) generalized from 3 hand-picked cases to the whole input space.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parqueryd_spark.core import aggregate_files

NUM_COLS = ["v1", "v2"]
KEY_COLS = ["k1", "k2"]
OPS = ["==", "!=", ">", ">=", "<", "<=", "in", "not in"]
METHODS = ["sum", "mean", "count", "min", "max", "std", "count_na", "count_distinct"]

_SQL_OP = {"==": "=", "!=": "<>", ">": ">", ">=": ">=", "<": "<", "<=": "<="}


def _method_sql(method: str, col: str, out: str) -> str:
    return {
        "sum": f"sum({col}) AS {out}",
        "mean": f"avg({col}) AS {out}",
        "count": f"count({col}) AS {out}",
        "min": f"min({col}) AS {out}",
        "max": f"max({col}) AS {out}",
        "std": f"stddev_samp({col}) AS {out}",
        "count_na": f"CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS {out}",
        "count_distinct": f"count(DISTINCT {col}) AS {out}",
    }[method]


@pytest.fixture(scope="module")
def prop_table(spark, tmp_path_factory):
    """Deterministic table with nulls, duplicates, negatives, and skewed keys."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 2000
    pdf = pd.DataFrame(
        {
            "k1": rng.choice(["a", "b", "c", None], n, p=[0.5, 0.3, 0.15, 0.05]),
            "k2": rng.integers(0, 5, n),
            "v1": rng.choice([1.5, -2.25, 0.0, 7.125, None], n),
            "v2": rng.integers(-100, 100, n).astype("float64"),
        }
    )
    path = str(tmp_path_factory.mktemp("prop") / "t.parquet")
    pdf.to_parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}')")
    return path, con


term_strategy = st.tuples(
    st.sampled_from(NUM_COLS + ["k2"]),
    st.sampled_from(OPS),
    st.sampled_from([-2.25, 0.0, 1.5, 2, 7.125, 50]),
)
agg_strategy = st.lists(
    st.tuples(st.sampled_from(NUM_COLS), st.sampled_from(METHODS)),
    min_size=1,
    max_size=4,
    unique=True,
)


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    terms=st.lists(term_strategy, max_size=3),
    aggs=agg_strategy,
    keys=st.sampled_from([["k1"], ["k2"], ["k1", "k2"], []]),
)
def test_random_groupby_matches_duckdb(spark, prop_table, terms, aggs, keys):
    path, con = prop_table

    where_terms = []
    sql_preds = []
    for col, op, val in terms:
        if op in ("in", "not in"):
            where_terms.append([col, op, [val, 999]])
            neg = "NOT " if op == "not in" else ""
            sql_preds.append(f"{col} {'NOT ' if op == 'not in' else ''}IN ({val}, 999)")
        else:
            where_terms.append([col, op, val])
            sql_preds.append(f"{col} {_SQL_OP[op]} {val}")

    agg_list = [[c, m, f"out_{i}"] for i, (c, m) in enumerate(aggs)]
    sql_aggs = ", ".join(_method_sql(m, c, f"out_{i}") for i, (c, m) in enumerate(aggs))

    sdf = aggregate_files(spark, [path], keys, agg_list, where_terms=where_terms)
    where_sql = f"WHERE {' AND '.join(sql_preds)}" if sql_preds else ""
    if keys:
        sql = f"SELECT {', '.join(keys)}, {sql_aggs} FROM t {where_sql} GROUP BY {', '.join(keys)}"
    else:
        sql = f"SELECT {sql_aggs} FROM t {where_sql}"
    odf = con.execute(sql).df()

    got = sdf.toPandas()
    assert len(got) == len(odf), f"rows {len(got)} != {len(odf)}\nSQL: {sql}"
    sort_keys = keys or list(got.columns)
    got = got.sort_values(sort_keys, na_position="last").reset_index(drop=True)
    odf = odf.sort_values(sort_keys, na_position="last").reset_index(drop=True)
    for c in got.columns:
        for i, (x, y) in enumerate(zip(got[c], odf[c])):
            x_nan = x is None or (isinstance(x, float) and math.isnan(x))
            y_nan = y is None or (isinstance(y, float) and math.isnan(y))
            if x_nan and y_nan:
                continue
            if isinstance(x, float) or isinstance(y, float):
                assert not (x_nan or y_nan), f"{c}[{i}]: {x!r} vs {y!r}\nSQL: {sql}"
                assert math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9), (
                    f"{c}[{i}]: {x!r} vs {y!r}\nSQL: {sql}"
                )
            else:
                assert x == y, f"{c}[{i}]: {x!r} vs {y!r}\nSQL: {sql}"
