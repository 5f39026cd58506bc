"""Dress rehearsal of the driver's correctness gate: load __spark_entry__ by
file path (as the driver does), run t1 smoke + every queries() entry at sf0.01
against its oracle_sql() in DuckDB, and print a per-query MATCH/MISMATCH line.

Float columns are compared at FULL precision (repr of the double, 17
significant digits) — the real gate's value hash does not round, and the
round(4) this script used in rounds 1-2 green-lit two queries the gate
rejected (unrounded cross-engine float sums). Queries must therefore emit
deterministically-representable doubles (round/decimal-cast their float aggs).

Run from anywhere:  python /root/repo/tools/driver_sim.py [name_substr ...]
Optional args filter the query set by substring match for fast iteration.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(lambda v: repr(float(v)))  # full 17-sig-digit repr
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def digest(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()[:8]


def main(filters: list[str] | None = None) -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not filters:
        n_smoke = len(mod.entry(spark).collect())
        print(f"t1 smoke: {n_smoke} rows {'OK' if n_smoke > 0 else 'FAIL'}")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = mod.queries(), mod.oracle_sql()
    if filters:
        qs = {n: f for n, f in qs.items() if any(s in n for s in filters)}
    t0 = time.time()
    n_match = n_rows_only = n_mismatch = 0
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as e:
            n_mismatch += 1
            print(f"  ERROR {name}: {e}")
            continue
        if name not in osql:
            n_rows_only += 1
            continue
        odf = con.execute(osql[name]).df()
        a, b = norm(sdf), norm(odf)
        if a.shape == b.shape and digest(a) == digest(b):
            n_match += 1
        else:
            n_mismatch += 1
            print(f"  MISMATCH {name}: rows={len(sdf)}/{len(odf)}")
    print(
        f"t2 gate: {n_match} match, {n_rows_only} rows-only, {n_mismatch} MISMATCH "
        f"of {len(qs)} ({time.time() - t0:.0f}s)"
    )
    spark.stop()
    return 1 if n_mismatch else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
