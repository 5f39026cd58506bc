"""Byte-pair-encoding tokenizer TRAINING on the engine (Sennrich et al.
2016) — the step between token counting (operators/text.py) and token-id
encoding (build_vocab/encode_documents): learn the merge table itself from
the corpus.

Spark-first shape: BPE statistics live on the WORD-FREQUENCY table, not the
corpus — the corpus is scanned once into (word, n) rows, and every merge
iteration is one adjacent-pair count aggregation plus one array map-pass
over that vocabulary-sized table (millions of rows at 100 TB, never
corpus-sized). The driver holds only the argmax pair per iteration (one
1-row collect each) and the growing merge list — the classic trainer's
in-memory pair heap becomes K tiny aggregations. The merge REWRITE is a
pure Column fold (left-to-right greedy, overlap-safe via carried skip
state), so the whole trainer is JVM-side; lineage is truncated every few
iterations (localCheckpoint) so plan depth stays bounded.

Determinism contract (pytest-pinned against a pure-Python reference): the
winning pair each round is (max total count, then lexicographically smallest
(a, b)) — reproducible everywhere, no hash or partition order in the
decision. Words are whitespace tokens split into characters; no
end-of-word marker (merges never cross word boundaries because statistics
are per-word by construction; a '</w>' sentinel is a caller-side column
transform if the downstream tokenizer wants one).

Reference parity: the reference engine has no tokenizer surface of any kind
(/root/reference/parqueryd/controller.py:483-553); north-star pipeline
scope, the trainer face of the encode path used by
examples/make_training_batches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parqueryd_spark.operators.text import tokens


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n, syms) — the vocabulary-sized training state: corpus word
    frequencies with each word split into its character array. One corpus
    scan, one map-side-combined groupBy."""
    words = docs.select(F.explode(tokens(F.col(text_col))).alias("word")).filter(
        F.col("word") != ""
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("syms", F.split("word", ""))
    )


def merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of every non-overlapping (a, b) occurrence
    into the single symbol a+b — the BPE rewrite — as a pure Column fold.

    The fold walks the (cur, next) pair stream carrying a skip flag (an
    emitted merge consumes its right element, so overlapping occurrences
    like 'aaa' with pair (a,a) merge once, matching the reference
    implementation), then appends the final element unless it was consumed.
    """
    n = F.size(syms)
    pairs = F.arrays_zip(F.slice(syms, 1, n - 1), F.slice(syms, 2, n - 1))
    fold = F.aggregate(
        pairs,
        F.struct(
            F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
        ),
        lambda acc, p: F.when(
            acc["skip"], F.struct(acc["out"].alias("out"), F.lit(False).alias("skip"))
        )
        .when(
            (p["0"] == a) & (p["1"] == b),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(a + b))).alias("out"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(p["0"])).alias("out"),
                F.lit(False).alias("skip"),
            )
        ),
    )
    merged = F.when(
        fold["skip"], fold["out"]
    ).otherwise(F.concat(fold["out"], F.slice(syms, -1, 1)))
    return F.when(n >= 2, merged).otherwise(syms)


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list [(a, b), ...]; stops early when no pair reaches
    ``min_pair_count``. Each iteration: one pair-count aggregation over the
    word table (weights = word frequencies), one 1-row argmax collect, one
    array rewrite; lineage truncates every ``checkpoint_every`` merges."""
    wt = word_table(docs, text_col).persist()
    wt.count()  # materialize the single corpus scan
    merges: list[tuple[str, str]] = []
    try:
        for i in range(num_merges):
            nsz = F.size("syms")
            pair = F.explode(
                F.arrays_zip(F.slice("syms", 1, nsz - 1), F.slice("syms", 2, nsz - 1))
            ).alias("p")
            top = (
                wt.filter(nsz >= 2)
                .select("n", pair)
                .groupBy(F.col("p")["0"].alias("a"), F.col("p")["1"].alias("b"))
                .agg(F.sum("n").alias("c"))
                .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["c"] < min_pair_count:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            nxt = wt.withColumn("syms", merge_pair(F.col("syms"), a, b))
            if (i + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            wt.unpersist()
            wt = nxt
    finally:
        wt.unpersist()
    return merges


def bpe_segment(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list to a (word, ...) table: adds ``bpe_tokens``
    (the word's BPE segmentation). K sequential rewrites over the
    vocabulary-sized table — documents themselves are never rewritten K
    times (see bpe_encode)."""
    out = words.withColumn("bpe_tokens", F.split("word", ""))
    for i, (a, b) in enumerate(merges):
        out = out.withColumn("bpe_tokens", merge_pair(F.col("bpe_tokens"), a, b))
        if (i + 1) % 8 == 0:
            out = out.localCheckpoint(eager=True)
    return out


def bpe_encode(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize documents under a learned merge list: (id, n_tokens,
    bpe_tokens). The K merge passes run over the DISTINCT-WORD table only;
    documents then join that word→segmentation mapping once and reassemble
    per-document token streams in word order (order carried explicitly —
    collect_list alone is unordered)."""
    wordpos = docs.select(
        F.col(id_col).alias("_id"), F.posexplode(tokens(F.col(text_col))).alias("pos", "word")
    ).filter(F.col("word") != "")
    mapping = bpe_segment(wordpos.select("word").distinct(), merges)
    joined = wordpos.join(mapping, "word")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "bpe_tokens"))),
        lambda s: s["bpe_tokens"],
    )
    return (
        joined.groupBy("_id")
        .agg(F.flatten(ordered).alias("bpe_tokens"))
        .select(
            F.col("_id").alias(id_col),
            F.size("bpe_tokens").alias("n_tokens"),
            "bpe_tokens",
        )
    )
