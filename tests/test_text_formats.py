"""CSV/JSON ingest round-trip: the reference's csv -> parquet -> groupby
onboarding workflow (README.md:25-43) reproduced through the engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from parqueryd_spark.core import ParquetEngine
from parqueryd_spark.sources.text_formats import ingest_to_parquet, read_csv, read_json


def test_csv_to_parquet_to_groupby(spark, tmp_path):
    csv_path = str(tmp_path / "trips.csv")
    with open(csv_path, "w") as f:
        f.write("payment_type,fare_amount,pickup\n")
        f.write("1,10.5,2016-01-01 10:00:00\n")
        f.write("1,5.5,2016-01-01 11:00:00\n")
        f.write("2,7.0,2016-01-02 09:30:00\n")
    df = read_csv(spark, csv_path, timestamp_cols=["pickup"])
    assert dict(df.dtypes)["pickup"] == "timestamp"

    pq_path = str(tmp_path / "trips.parquet")
    ingest_to_parquet(df, pq_path)

    # the reference README flow: write parquet, then rpc.groupby on it
    eng = ParquetEngine(spark, data_dir=str(tmp_path))
    out = (
        eng.groupby(["trips.parquet"], ["payment_type"], [["fare_amount", "sum", "fare_amount"]])
        .toPandas()
        .set_index("payment_type")
        .sort_index()
    )
    assert out.loc[1, "fare_amount"] == 16.0
    assert out.loc[2, "fare_amount"] == 7.0


def test_json_lines_roundtrip(spark, tmp_path):
    json_path = str(tmp_path / "events.jsonl")
    with open(json_path, "w") as f:
        f.write('{"k": "a", "v": 1}\n{"k": "a", "v": 2}\n{"k": "b", "v": 3}\n')
    df = read_json(spark, json_path)
    agg = df.groupBy("k").agg(F.sum("v").alias("s")).toPandas().set_index("k")
    assert agg.loc["a", "s"] == 3 and agg.loc["b", "s"] == 3
