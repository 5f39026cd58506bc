"""Text-analysis queries over the documents table (north-star scope):
token stats, quality scoring, language ID, fingerprinting — each with an exact
DuckDB oracle mirroring the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.operators import text as T
from parqueryd_spark.queries import query
from parqueryd_spark.sources.parquet import load_table

_STOP_SQL = "('the','a','an','and','of','to','in','is','it')"


@query(
    "text_token_stats",
    oracle="""
    SELECT lang,
           count(doc_id)                                        AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)    AS total_tokens,
           avg(len(string_split(text, ' ')))                    AS avg_tokens,
           max(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 ]'))) AS max_regex_tokens,
           avg(n_chars)                                         AS avg_chars
    FROM documents
    GROUP BY lang
    """,
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) aggregated per language."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("doc_id").alias("n_docs"),
        F.sum(T.token_count("text")).cast("long").alias("total_tokens"),
        F.avg(T.token_count("text")).alias("avg_tokens"),
        F.max(T.regex_token_count("text")).alias("max_regex_tokens"),
        F.avg("n_chars").alias("avg_chars"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    SELECT source,
           avg(
             least(length(text) / 400.0, 1.0) * 0.5
             + (len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
                / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.5
             - ((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                / CAST(length(text) AS DOUBLE))
           ) AS avg_quality,
           count(doc_id) AS n_docs
    FROM documents
    GROUP BY source
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristic (length band + stopword ratio - punctuation ratio)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.avg(T.quality_score("text")).alias("avg_quality"),
        F.count("doc_id").alias("n_docs"),
    )


_LANG_SCORE_SQL = {
    lang: f"len(list_filter(string_split(text, ' '), t -> t IN ({', '.join(repr(m) for m in ms)})))"
    for lang, ms in T.LANG_MARKERS.items()
}
_BEST_SQL = f"greatest({', '.join(_LANG_SCORE_SQL[lang] for lang in T.LANG_ORDER)})"
_PRED_SQL = "CASE "
for _lang in T.LANG_ORDER:
    _PRED_SQL += f"WHEN {_LANG_SCORE_SQL[_lang]} > 0 AND {_LANG_SCORE_SQL[_lang]} = {_BEST_SQL} THEN '{_lang}' "
_PRED_SQL += "ELSE 'unknown' END"


@query(
    "text_language_id",
    oracle=f"""
    SELECT {_PRED_SQL} AS pred_lang,
           count(doc_id) AS n_docs,
           count(CASE WHEN {_PRED_SQL} = lang THEN 1 END) AS n_label_match
    FROM documents
    GROUP BY 1
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID (n-gram heuristic) with deterministic
    tie-break, compared against the table's lang label."""
    docs = load_table(spark, sf_dir, "documents")
    pred = T.predict_lang("text")
    return docs.select(pred.alias("pred_lang"), "lang").groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("pred_lang") == F.col("lang"), 1)).alias("n_label_match"),
    )


@query(
    "text_edit_distance",
    oracle="""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 60 AND b.p_partkey < 60
      AND levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-match pairs over short strings (typo-level dedup for
    names/titles; shingle methods cover long documents)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 60)
    a = part.select(F.col("p_partkey").alias("id_a"), F.col("p_name").alias("name_a"))
    b = part.select(F.col("p_partkey").alias("id_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 4)
        .select("id_a", "id_b", "edit_dist")
    )


@query("text_winnow_fingerprint", oracle=None)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash family) fingerprint counts per document
    (rows-only: xxhash64-based prints are not reproducible in ANSI SQL; the
    overlap property is asserted in tests/test_operators.py)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.size(T.winnow_fingerprints("text")).alias("n_fingerprints")
    )


@query(
    "text_curation_funnel",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             least(length(text) / 400.0, 1.0) * 0.5
             + (len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
                / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.5
             - ((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                / CAST(length(text) AS DOUBLE)) AS q,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      FROM documents
    ),
    kept AS (SELECT * FROM scored WHERE q >= 0.35),
    keepers AS (SELECT min(doc_id) AS keep_id FROM kept GROUP BY fp)
    SELECT source, count(*) AS n_docs, round(avg(q), 4) AS avg_quality
    FROM kept WHERE doc_id IN (SELECT keep_id FROM keepers)
    GROUP BY source
    """,
)
def text_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation pipeline in one plan: quality
    filter -> exact dedup on the bag-of-words fingerprint (keep lowest id) ->
    per-source stats. At sf0.01 the funnel is 500 docs -> 290 quality-pass ->
    ~246 survivors. One scan computes score and fingerprint together; dedup
    is a fingerprint-keyed aggregate plus a semi join back, so document text
    never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        T.quality_score("text").alias("q"),
        T.fingerprint("text").alias("fp"),
    ).filter(F.col("q") >= 0.35)
    keepers = scored.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    return (
        scored.join(keepers, scored.doc_id == keepers.keep_id, "left_semi")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("q"), 4).alias("avg_quality"))
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
      GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT doc_id, token, tfidf
    FROM (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(nd.n_docs / CAST(dfreq.df AS DOUBLE)), 4) AS tfidf,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY round(tf.tf * ln(nd.n_docs / CAST(dfreq.df AS DOUBLE)), 4) DESC,
                        tf.token ASC
             ) AS rn
      FROM tf JOIN dfreq USING (token) CROSS JOIN nd
    )
    WHERE rn <= 3 AND doc_id < 100
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (corpus-wide idf, broadcast back onto
    the (doc, token) grain). Ranked on round(tfidf, 4) with a token tie-break
    so cross-engine ln() ulp noise cannot reorder the cut."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    terms = T.tfidf_terms(docs, "doc_id", "text").withColumn(
        "tfidf", F.round("tfidf", 4)
    )
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        terms.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("doc") < 100))
        .select(F.col("doc").alias("doc_id"), "token", "tfidf")
    )


@query(
    "text_bigram_counts",
    oracle="""
    SELECT bigram, count(*) AS n_occurrences
    FROM (
      SELECT unnest(list_transform(
               range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]
             )) AS bigram
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    )
    GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram ASC
    LIMIT 20
    """,
)
def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram occurrence counts, top-20 — the n-gram
    language-model statistic (every occurrence counted, unlike the distinct
    shingle sets used for Jaccard). Integer-count ties broken by bigram."""
    docs = load_table(spark, sf_dir, "documents").filter(F.size(T.tokens("text")) >= 2)
    return (
        docs.select(F.explode(T.ngrams_all("text", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("bigram").asc())
        .limit(20)
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fingerprint,
           length(text) AS text_len
    FROM documents
    WHERE doc_id < 100
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical bag-of-words md5 fingerprint (order-insensitive content hash)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        T.fingerprint("text").alias("fingerprint"),
        F.length("text").alias("text_len"),
    )
