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


def test_repetition_metrics_match_duckdb(spark, duck):
    """The three Gopher-style repetition fractions are exact small-integer
    ratios — DuckDB must reproduce every value bit-for-bit at sf0.01."""
    from parqueryd_spark.operators import text as T
    from parqueryd_spark.sources.parquet import load_table
    from tests.compare import assert_same_result
    from tests.conftest import SF_CORRECT

    sdf = load_table(spark, SF_CORRECT, "documents").select(
        "doc_id",
        T.dup_token_fraction("text").alias("dup_tok"),
        T.top_token_fraction("text").alias("top_tok"),
        T.dup_ngram_fraction("text", 2).alias("dup_2gram"),
    )
    oracle = duck.execute("""
        SELECT doc_id,
               1.0 - len(list_distinct(string_split(text,' ')))::DOUBLE
                   / len(string_split(text,' ')) AS dup_tok,
               list_max(list_transform(list_distinct(string_split(text,' ')),
                   d -> len(list_filter(string_split(text,' '), x -> x = d))))::DOUBLE
                   / len(string_split(text,' ')) AS top_tok,
               CASE WHEN len(string_split(text,' ')) >= 2 THEN
                 1.0 - len(list_distinct(list_transform(range(1, len(string_split(text,' '))),
                         i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])))::DOUBLE
                     / (len(string_split(text,' ')) - 1)
               ELSE 0.0 END AS dup_2gram
        FROM documents
    """).df()
    assert_same_result(sdf, oracle, rtol=0.0)


def test_orc_roundtrip(spark, tmp_path):
    from parqueryd_spark.sources.parquet import load_table
    from parqueryd_spark.sources.text_formats import read_orc

    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    p = str(tmp_path / "nation_orc")
    nation.write.orc(p)
    back = read_orc(spark, p)
    assert sorted(back.collect()) == sorted(nation.collect())
