"""Order-insensitive DataFrame comparison — local mirror of the driver's
row-count + schema + value-hash oracle check (column names sorted, rows sorted,
float tolerance like the reference's check_less_precise pandas compare)."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
        elif df[c].dtype == object:
            # date objects / decimals -> canonical string
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    sort_cols = list(df.columns)
    if sort_cols:
        df = df.sort_values(by=sort_cols, kind="mergesort").reset_index(drop=True)
    return df


def assert_same_result(spark_df, oracle_pdf: pd.DataFrame, rtol: float = 1e-6) -> None:
    got = _normalize(spark_df.toPandas())
    exp = _normalize(oracle_pdf)
    assert list(got.columns) == list(exp.columns), f"columns {list(got.columns)} != {list(exp.columns)}"
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ga = pd.to_numeric(g, errors="coerce")
            ea = pd.to_numeric(e, errors="coerce")
            for i, (x, y) in enumerate(zip(ga, ea)):
                both_nan = (x is None or (isinstance(x, float) and math.isnan(x))) and (
                    y is None or (isinstance(y, float) and math.isnan(y))
                )
                if both_nan:
                    continue
                assert x is not None and y is not None, f"{c}[{i}]: {x!r} vs {y!r}"
                assert math.isclose(x, y, rel_tol=rtol, abs_tol=1e-9), f"{c}[{i}]: {x!r} vs {y!r}"
        else:
            pd.testing.assert_series_equal(g, e, check_dtype=False, check_names=False)
