"""Differential test of the extended TPC-H suite (Q2/Q7-Q9/Q11-Q13/Q15-Q17/
Q20-Q22) against DuckDB oracles at sf0.01 — same normalize-sort-compare
harness as the driver gate, applied to the queries that don't fit in the
50-row registry window."""

from __future__ import annotations

import pytest

from parqueryd_spark.queries.tpch_extended import EXTENDED
from tests.compare import assert_same_result
from tests.conftest import SF_CORRECT

CASES = sorted(EXTENDED)


def test_full_tpch_coverage():
    # 9 in the registry + 13 here = all 22 TPC-H query shapes
    assert len(EXTENDED) == 13


@pytest.mark.parametrize("name", CASES)
def test_extended_tpch_matches_oracle(spark, duck, name):
    fn, oracle, _bench = EXTENDED[name]
    sdf = fn(spark, SF_CORRECT)
    oracle_pdf = duck.execute(oracle).df()
    assert len(oracle_pdf) > 0, f"{name} oracle returns 0 rows — vacuous"
    assert_same_result(sdf, oracle_pdf)
