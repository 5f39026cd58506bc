"""Corpus-curation queries past the gate window: PII redaction audit,
sub-document span dedup, and grouped exact quantiles.

Registered after the 50-row gate window on purpose (see queries/__init__.py) —
each is still fully oracle-checked by tests/test_registry_oracle.py and
tools/driver_sim.py with the driver's own normalize-sort-hash harness.

The PII query enriches the synthetic documents fixture with deterministic
doc_id-derived contact strings (the corpus itself is digit-free word soup, so
without enrichment every count would be vacuously zero); the enrichment is
reproduced verbatim in the DuckDB oracle, making the check a real
cross-engine test of the regex semantics in operators/pii.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.operators.dedup import span_dedup
from parqueryd_spark.operators.pii import has_pii, pii_counts, redact_pii
from parqueryd_spark.queries import query
from parqueryd_spark.sources.parquet import load_table

# doc_id-derived PII enrichment, mirrored exactly in the oracle SQL: every doc
# gains one email, one phone, one IPv4; every third doc an SSN-shaped id;
# every fifth doc a second email.
_PII_SUFFIX_SQL = """
    ' contact user' || doc_id || '@example.com or +1 555-'
    || lpad((doc_id % 10000)::VARCHAR, 4, '0')
    || ' from 10.' || (doc_id % 200) || '.0.1'
    || CASE WHEN doc_id % 3 = 0
            THEN ' ssn 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' cc admin' || doc_id || '@corp.example.org'
            ELSE '' END
"""


def _pii_enriched(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id").cast("string")
    pad = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    suffix = F.concat(
        F.lit(" contact user"), d, F.lit("@example.com or +1 555-"), pad,
        F.lit(" from 10."), (F.col("doc_id") % 200).cast("string"), F.lit(".0.1"),
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.lit(" ssn 123-45-"), pad)
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" cc admin"), d, F.lit("@corp.example.org")),
        ).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id", "source", F.concat(F.col("text"), suffix).alias("text")
    )


@query(
    "pipeline_pii_redaction",
    oracle=f"""
    WITH enriched AS (
      SELECT doc_id, source, text || {_PII_SUFFIX_SQL} AS text FROM documents
    ),
    scored AS (
      SELECT source,
        len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
        len(regexp_extract_all(text, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS n_ipv4,
        len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b')) AS n_id,
        len(regexp_extract_all(text, '\\+\\d{{1,3}} \\d{{3}}-\\d{{4}}\\b')) AS n_phone,
        length(text) - length(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
              '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '<ID>', 'g'),
            '\\+\\d{{1,3}} \\d{{3}}-\\d{{4}}\\b', '<PHONE>', 'g')
        ) AS delta
      FROM enriched
    )
    SELECT source,
           count(*)                                   AS n_docs,
           CAST(sum(n_email) AS BIGINT)               AS emails,
           CAST(sum(n_ipv4) AS BIGINT)                AS ipv4s,
           CAST(sum(n_id) AS BIGINT)                  AS id_numbers,
           CAST(sum(n_phone) AS BIGINT)               AS phones,
           CAST(sum(CASE WHEN n_email + n_ipv4 + n_id + n_phone > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           CAST(sum(delta) AS BIGINT)                 AS chars_redacted
    FROM scored GROUP BY source
    """,
)
def pipeline_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit over the (deterministically enriched) documents table: per
    source, match counts for each category in operators/pii.py, the number of
    documents carrying any PII, and total characters removed by redaction —
    the summary a curation run reports before/after scrubbing. Pure
    regexp_count / regexp_replace Column expressions: one codegen'd scan, no
    Python, no second pass over the text."""
    docs = _pii_enriched(load_table(spark, sf_dir, "documents"))
    counts = pii_counts("text")
    return (
        docs.select(
            "source",
            counts["email"].alias("n_email"),
            counts["ipv4"].alias("n_ipv4"),
            counts["id_number"].alias("n_id"),
            counts["phone"].alias("n_phone"),
            has_pii("text").alias("any_pii"),
            (F.length("text") - F.length(redact_pii("text"))).alias("delta"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_email").cast("long").alias("emails"),
            F.sum("n_ipv4").cast("long").alias("ipv4s"),
            F.sum("n_id").cast("long").alias("id_numbers"),
            F.sum("n_phone").cast("long").alias("phones"),
            F.sum(F.when(F.col("any_pii"), 1).otherwise(0)).cast("long").alias("docs_with_pii"),
            F.sum("delta").cast("long").alias("chars_redacted"),
        )
    )


@query(
    "dedup_spans",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    spans AS (
      SELECT doc_id, i AS pos, array_to_string(t[(i*3+1):(i*3+3)], ' ') AS span
      FROM toks,
           UNNEST(generate_series(0, CAST(ceil(len(t)/3.0) AS INT) - 1)) AS u(i)
    ),
    ranked AS (
      SELECT doc_id, pos, span,
             row_number() OVER (PARTITION BY md5(span) ORDER BY doc_id, pos) AS rn
      FROM spans
    )
    SELECT doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY pos),
                        '')) AS kept_md5
    FROM ranked GROUP BY doc_id
    """,
    bench=True,
)
def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document span dedup (operators/dedup.py span_dedup) at 3-token
    granularity — small spans so the synthetic fixture actually contains
    cross-document repeats. Emits per doc: span count, surviving-span count,
    and the md5 of the rebuilt text (compact cross-engine content check). The
    oracle reproduces keep-first with a ROW_NUMBER over the span digest,
    equivalent to the operator's skew-safe min(struct(doc, pos)) + join-back
    because (doc, pos) pairs are unique."""
    docs = load_table(spark, sf_dir, "documents")
    res = span_dedup(docs, "doc_id", "text", span_tokens=3)
    return res.select(
        F.col("doc").alias("doc_id"),
        "n_spans",
        "n_kept",
        F.md5("dedup_text").alias("kept_md5"),
    )


@query(
    "pipeline_chunk_documents",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    chunks AS (
      SELECT doc_id, i AS chunk_id,
             array_to_string(t[(i*24+1):(i*24+32)], ' ') AS chunk_text
      FROM toks,
           UNNEST(generate_series(
             0, greatest(CAST(ceil((len(t) - 8) / 24.0) AS INT), 1) - 1)) AS u(i)
    )
    SELECT doc_id, chunk_id,
           len(string_split(chunk_text, ' ')) AS n_chunk_tokens,
           md5(chunk_text) AS chunk_md5
    FROM chunks
    """,
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking (operators/sampling.py chunk_documents) at
    max 32 tokens / overlap 8 — small enough that the fixture's ~35-token
    docs actually split. Emits (doc_id, chunk_id, n_chunk_tokens, chunk_md5);
    the oracle reproduces the stride/coverage arithmetic with list slicing."""
    docs = load_table(spark, sf_dir, "documents")
    from parqueryd_spark.operators.sampling import chunk_documents

    return chunk_documents(docs, "doc_id", "text", max_tokens=32, overlap=8).select(
        F.col("doc").alias("doc_id"),
        "chunk_id",
        "n_chunk_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    )


@query(
    "pipeline_exact_sample",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST(('0x' || substr(md5(doc_id::VARCHAR || 'audit'), 1, 8))
                             AS BIGINT), doc_id) AS rn
      FROM documents
    )
    SELECT lang,
           count(*) AS n_sampled,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
    FROM ranked WHERE rn <= 25 GROUP BY lang
    """,
)
def pipeline_exact_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified sampling (operators/sampling.py
    stratified_exact_sample): precisely 25 docs per language by smallest
    salted md5 rank — the oracle reproduces the identical sample membership
    from the same md5 arithmetic, so the doc_id checksum matches exactly,
    not statistically."""
    docs = load_table(spark, sf_dir, "documents")
    from parqueryd_spark.operators.sampling import stratified_exact_sample

    sampled = stratified_exact_sample(docs, "doc_id", 25, "lang", salt="audit")
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
    total AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM vocab)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(avg(ln(v.n / total.total)), 4) AS avg_logprob
    FROM toks t JOIN vocab v USING (tok), total
    GROUP BY t.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    token distribution (operators/text.py unigram_logprob) — the
    corpus-statistical quality filter complementing the heuristic
    quality_score."""
    docs = load_table(spark, sf_dir, "documents")
    from parqueryd_spark.operators.text import unigram_logprob

    # float agg rounded in BOTH engines: the gate's value hash does not round
    return (
        unigram_logprob(docs, "doc_id", "text")
        .withColumnRenamed("doc", "doc_id")
        .withColumn("avg_logprob", F.round("avg_logprob", 4))
    )


@query(
    "text_normalize_dedup",
    oracle="""
    WITH enriched AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 3 = 0 THEN upper(text)
                  WHEN doc_id % 5 = 0 THEN replace(text, ' ', '  ') || ' !!!'
                  ELSE text END AS text
      FROM documents
    ),
    norm AS (
      SELECT doc_id, source, text,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^\\w\\s]', '', 'g'),
               '\\s+', ' ', 'g')) AS ntext
      FROM enriched
    )
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS distinct_raw,
           count(DISTINCT md5(ntext)) AS distinct_norm
    FROM norm GROUP BY source
    """,
)
def text_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware dedup accounting: the fixture is deterministically
    perturbed (every 3rd doc uppercased, every 5th double-spaced with junk
    punctuation — formatting variants, not new content) and per source the
    query reports how many distinct digests exist before and after
    normalize_text (operators/text.py). distinct_norm < distinct_raw is
    exactly the dedup the canonicalization recovers; the oracle reproduces
    both the perturbation and the normalization."""
    from parqueryd_spark.operators.text import normalize_text

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 3 == 0, F.upper("text"))
        .when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.regexp_replace(F.col("text"), F.lit(" "), F.lit("  ")), F.lit(" !!!")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    norm = normalize_text("text", strip_punct=True)
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("distinct_raw"),
        F.countDistinct(F.md5(norm)).alias("distinct_norm"),
    )


@query(
    "embedding_label_centroids",
    oracle="""
    SELECT label, i AS dim, round(avg(e[i]), 4) AS centroid_val
    FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         UNNEST(generate_series(1, len(e))) AS u(i)
    GROUP BY label, i
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids as flat (label, dim, value) rows — the
    vector-aggregate shape (class prototypes, cluster summaries) computed by
    exploding dimensions and averaging per (label, dim): one shuffle keyed
    by (label, dim), map-side combined, no vector UDAF needed. Flat rows
    rather than array output so the cross-engine compare is per-value exact
    instead of string-format-dependent."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
        )
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg("v"), 4).alias("centroid_val"))
    )


@query(
    "fuzzy_join_part_names",
    oracle="""
    SELECT CAST(levenshtein(a.p_name, b.p_name) AS INT) AS distance,
           count(*) AS n_pairs
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
     AND levenshtein(a.p_name, b.p_name) <= 2
    GROUP BY 1
    """,
)
def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join of part names within edit distance 2
    (operators/relational.py edit_distance_join — lossless length-band
    blocking + threshold levenshtein verify), reported as pair counts per
    distance; the oracle recomputes the full pair set with an unblocked
    quadratic join, so a single missed or extra candidate shifts a count."""
    from parqueryd_spark.operators.relational import edit_distance_join

    part = load_table(spark, sf_dir, "part")
    a = part.select(F.col("p_partkey").alias("id_a"), "p_name")
    b = part.select(F.col("p_partkey").alias("id_b"), "p_name")
    pairs = edit_distance_join(a, b, "p_name", "p_name", max_distance=2)
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .groupBy("distance")
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "part_price_quantiles",
    oracle="""
    SELECT p_brand,
           count(*) AS n_parts,
           round(quantile_cont(p_retailprice, 0.25), 4) AS p25,
           round(quantile_cont(p_retailprice, 0.5), 4)  AS median,
           round(quantile_cont(p_retailprice, 0.9), 4)  AS p90,
           CAST(max(p_retailprice) AS DOUBLE) AS max_price
    FROM part GROUP BY p_brand
    """,
)
def part_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped EXACT quantiles (p25/median/p90) of part retail price by brand
    via F.percentile — linear interpolation on the sorted group, matching
    ANSI PERCENTILE_CONT / DuckDB quantile_cont bit-for-bit on doubles. At
    100 TB exact per-group percentile is a single shuffle on the group key
    with sort-based aggregation; for global quantiles over billions of rows
    prefer approx_percentile (t-digest sketch, mergeable map-side)."""
    part = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice").cast("double")
    return part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.round(F.percentile(price, 0.25), 4).alias("p25"),
        F.round(F.percentile(price, 0.5), 4).alias("median"),
        F.round(F.percentile(price, 0.9), 4).alias("p90"),
        F.max(price).alias("max_price"),
    )


_Q_SQL = """least(length(text) / 400.0, 1.0) * 0.5
             + (len(list_filter(string_split(text, ' '),
                    t -> t IN ('the','a','an','and','of','to','in','is','it')))
                / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.5
             - ((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                / CAST(length(text) AS DOUBLE))"""


@query(
    "pipeline_source_caps",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, round({_Q_SQL}, 4) AS q
      FROM documents
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC) AS rn
      FROM scored
    )
    SELECT source, doc_id, q FROM ranked WHERE rn <= 5
    """,
)
def pipeline_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps (operators/sampling.py:cap_per_group): keep
    the best 5 documents per source by quality score — the RefinedWeb-style
    no-source-dominates rule, preference-ordered rather than a uniform draw.
    row_number <= n compiles to WindowGroupLimit so each task pre-trims its
    local top-5 before the shuffle."""
    from parqueryd_spark.operators.sampling import cap_per_group
    from parqueryd_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", F.round(quality_score("text"), 4).alias("q")
    )
    return cap_per_group(
        scored, ["source"], 5, [F.col("q").desc(), F.col("doc_id").asc()]
    )


@query(
    "pipeline_weighted_sample",
    oracle="""
    SELECT doc_id, n_chars, sample_score FROM (
      SELECT doc_id, n_chars,
             round(ln((CAST(('0x' || substr(md5(doc_id::VARCHAR || 'ws'), 1, 8)) AS BIGINT)
                       + 0.5) / 4294967296.0) / n_chars, 10) AS sample_score
      FROM documents
    )
    ORDER BY sample_score DESC, doc_id ASC
    LIMIT 50
    """,
)
def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sample: 50 documents drawn
    proportionally to n_chars via derandomized A-Res
    (operators/sampling.py:weighted_sample) — reproducible to the exact row
    in any engine, served as a heap top-n."""
    from parqueryd_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(docs, "doc_id", "n_chars", 50, salt="ws")


@query(
    "pipeline_quality_calibration",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(percent_rank() OVER (PARTITION BY source
                                      ORDER BY n_tokens, doc_id), 6) AS calib,
           (round(percent_rank() OVER (PARTITION BY source
                                       ORDER BY n_tokens, doc_id), 6) >= 0.5) AS keep
    FROM scored
    """,
)
def pipeline_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile calibration of a quality score
    (operators/quality.py:quantile_calibrate): each document's token-count
    score becomes its percent_rank WITHIN its source, so one keep-threshold
    ("top half of every source") is comparable across sources with different
    raw score distributions — the Gopher/FineWeb per-source quality gate and
    the rank input DoReMi-style mixture reweighting consumes. Ties rank
    deterministically by doc_id; the oracle replays rank arithmetic exactly
    ((rank-1)/(n-1) is the same rational in both engines). One shuffle on
    source, no driver state — the same plan at 100 TB."""
    from parqueryd_spark.operators.quality import quantile_calibrate

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    out = quantile_calibrate(scored, "source", "n_tokens", tiebreak_cols=["doc_id"])
    return out.withColumn("keep", F.col("calib") >= 0.5)


@query(
    "pipeline_calibration_serve",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), refc AS (
      SELECT DISTINCT source, n_tokens,
             cume_dist() OVER (PARTITION BY source ORDER BY n_tokens) AS cdf
      FROM scored WHERE doc_id < 400
    ), probe AS (
      SELECT doc_id, source, n_tokens FROM scored WHERE doc_id >= 400
    )
    SELECT p.doc_id, p.source, CAST(p.n_tokens AS BIGINT) AS n_tokens,
           round(coalesce((SELECT max(r.cdf) FROM refc r
                           WHERE r.source = p.source
                             AND r.n_tokens <= p.n_tokens), 0.0), 6) AS calib
    FROM probe p
    """,
)
def pipeline_calibration_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FROZEN quality gate (operators/quality.py:calibration_cdf +
    calibration_score): reduce a reference window (doc_id < 400) to its
    per-source empirical CDF — distinct-score-sized, publishable — then
    score the NEW batch (doc_id >= 400) against that frozen distribution by
    step-function lookup (largest reference score ≤ the new score; 0.0
    below all — an out-of-distribution low outlier). This is what
    production curation needs that per-batch percent_rank
    (pipeline_quality_calibration) can't give: thresholds that do NOT drift
    as batches arrive. The lookup is a union + per-source running window —
    one shuffle, linear in probes + reference rows, never a range join; the
    oracle replays the step lookup with a correlated max over the same
    CDF. The same calibration_score call inside foreachBatch serves a
    document stream against the frozen gate unchanged."""
    from parqueryd_spark.operators.quality import calibration_cdf, calibration_score

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    ref = calibration_cdf(scored.filter(F.col("doc_id") < 400), "source", "n_tokens")
    out = calibration_score(
        ref, scored.filter(F.col("doc_id") >= 400), "source", "n_tokens", "doc_id"
    )
    return out.select(
        "doc_id", "source", F.col("n_tokens").cast("long").alias("n_tokens"), "calib"
    )
