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

At production vocab sizes (8k-32k merges) one Spark job per merge is the
wrong trade: ``bpe_train_hybrid`` keeps the single distributed corpus scan
and then COLLECTS the vocabulary-sized (word, count) table to run the merge
loop driver-side with incrementally-maintained pair statistics
(``train_merges_local``) — seconds for 32k merges, guarded by a bounded
cardinality check with automatic fallback to the distributed loop.
Segmentation under a large merge list likewise switches from K chained
Column rewrites to one Arrow-batched rank-loop pass (``bpe_segment_udf``).
Both halves are pinned bit-equal to the one-job-per-merge forms.

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
    precomputed: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list [(a, b), ...]; stops early when no pair reaches
    ``min_pair_count``. Each iteration: one pair-count aggregation over the
    word table (weights = word frequencies), one 1-row argmax collect, one
    array rewrite; lineage truncates every ``checkpoint_every`` merges.
    ``precomputed`` (a :func:`word_table` DataFrame, typically already
    persisted) skips the corpus scan — bpe_train_hybrid's over-limit
    fallback hands its own table over so the scan is never repeated."""
    wt = (precomputed if precomputed is not None else word_table(docs, text_col)).persist()
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


def _local_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping (a, b) -> a+b rewrite — the
    driver-side twin of :func:`merge_pair` (same contract, pinned equal in
    tests/test_bpe.py)."""
    out, i = [], 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_merges_local(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Classic driver-side BPE training over a collected (word, count) table
    with incrementally-maintained pair statistics (Sennrich et al. 2016's
    efficient form): each merge rewrites ONLY the words containing the
    winning pair and adjusts their pair counts in place, so 32k merges cost
    ~O(affected words) each, not a full vocabulary recount. The per-merge
    argmax is a LAZY MAX-HEAP (entries pushed on every count change, stale
    tops skipped against the live dict), so selection is O(log heap) per
    merge instead of an O(distinct pairs) dict scan — the difference between
    seconds and minutes at 32k merges over a 5M-word table. Determinism
    contract identical to :func:`bpe_train`: max total count, then
    lexicographically smallest (a, b) — the heap key (-count, pair) orders
    exactly that way."""
    import heapq
    from collections import defaultdict

    syms_list = [list(w) for w, _ in word_counts]
    freqs = [n for _, n in word_counts]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, syms in enumerate(syms_list):
        f = freqs[idx]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += f
            pair_words[p].add(idx)
    heap: list[tuple[int, tuple[str, str]]] = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    # heap invariant: every live pair has at least one entry with entry >=
    # its true count (counts only ever EXCEED an entry via an explicit push
    # on increase; decreases leave stale-HIGH entries). Popping therefore
    # always surfaces the true max: a stale-high top is reinserted at its
    # true value and the scan continues — each decrease costs at most one
    # deferred reinsert instead of a push per update.
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best_pair = None
        while heap:
            neg_c, p = heap[0]
            c = pair_counts.get(p, 0)
            if c == -neg_c:
                best_pair, best_c = p, c
                break
            heapq.heappop(heap)
            if 0 < c < -neg_c:
                heapq.heappush(heap, (-c, p))  # stale-high: refresh in place
        if best_pair is None or best_c < min_pair_count:
            break
        a, b = best_pair
        merges.append((a, b))
        for idx in list(pair_words.get((a, b), ())):
            old, f = syms_list[idx], freqs[idx]
            new = _local_merge(old, a, b)
            syms_list[idx] = new
            # net per-pair delta only (multiset diff): pairs away from the
            # merge sites cancel out and never touch the counts, the heap,
            # or the membership sets
            oc: dict = {}
            for pp in zip(old, old[1:]):
                oc[pp] = oc.get(pp, 0) + 1
            nc: dict = {}
            for pp in zip(new, new[1:]):
                nc[pp] = nc.get(pp, 0) + 1
            for p, o in oc.items():
                nv = nc.get(p, 0)
                d = nv - o
                if d:
                    c = pair_counts[p] + d * f
                    if c <= 0:
                        pair_counts.pop(p, None)
                    else:
                        pair_counts[p] = c
                        if d > 0:
                            heapq.heappush(heap, (-c, p))
                if nv == 0:
                    ws = pair_words.get(p)
                    if ws is not None:
                        ws.discard(idx)
            for p, nv in nc.items():
                if p not in oc:
                    c = pair_counts[p] + nv * f
                    pair_counts[p] = c
                    heapq.heappush(heap, (-c, p))
                    pair_words[p].add(idx)
    return merges


def bpe_train_hybrid(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 8192,
    min_pair_count: int = 2,
    max_word_table: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Production-vocab BPE training: ONE distributed corpus scan builds the
    (word, count) table, then the merge loop runs driver-side over that
    vocabulary-sized state (:func:`train_merges_local`) — 8k-32k merges are
    a few seconds of dict updates instead of 8k-32k sequential Spark jobs.
    The word table is vocabulary-sized by construction (millions of rows at
    100 TB — it always fits), but the collect is still guarded: above
    ``max_word_table`` distinct words this falls back to the fully
    distributed :func:`bpe_train` loop, trading merge latency for zero
    driver-memory exposure. Segmentation/encoding stay distributed either
    way (:func:`bpe_segment` / :func:`bpe_encode`).

    Returns the ordered merge list — bit-identical to :func:`bpe_train` on
    the same corpus (pytest-pinned), since both implement the same
    determinism contract over the same integer statistics."""
    wt = word_table(docs, text_col).persist()
    # ONE bounded collect serves both the guard and the data — the limit caps
    # what can reach the driver — and the persisted table backs BOTH outcomes,
    # so the corpus is scanned once on either path (the one-scan contract):
    # under-limit, the collected rows feed the driver-side loop; over-limit,
    # the SAME persisted table is handed to the distributed loop, which
    # reads the cache instead of re-scanning the corpus.
    rows = wt.select("word", "n").limit(max_word_table + 1).collect()
    if len(rows) > max_word_table:
        return bpe_train(
            docs, text_col, num_merges, min_pair_count, precomputed=wt
        )  # bpe_train unpersists wt as it iterates
    try:
        return train_merges_local(
            [(r["word"], r["n"]) for r in rows], num_merges, min_pair_count
        )
    finally:
        wt.unpersist()


def bpe_segment(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list to a (word, ...) table: adds ``bpe_tokens``
    (the word's BPE segmentation). K sequential rewrites over the
    vocabulary-sized table — documents themselves are never rewritten K
    times (see bpe_encode). Plan depth grows with K: past ~64 merges use
    :func:`bpe_segment_udf` (bpe_encode switches automatically)."""
    out = words.withColumn("bpe_tokens", F.split("word", ""))
    for i, (a, b) in enumerate(merges):
        out = out.withColumn("bpe_tokens", merge_pair(F.col("bpe_tokens"), a, b))
        if (i + 1) % 8 == 0:
            out = out.localCheckpoint(eager=True)
    return out


def bpe_segment_udf(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """:func:`bpe_segment` for production-sized merge lists (8k-32k): one
    Arrow-batched mapInPandas pass over the vocabulary-sized word table with
    the merge-RANK table broadcast in the closure, instead of K chained
    Column rewrites (whose plan depth is K). Applies the standard
    lowest-rank-first loop, which equals sequential merge application: a
    merge can only create pairs of HIGHER rank than itself (its output
    symbol didn't exist when earlier merges were learned), so taking the
    present pair with the smallest rank replays training order exactly.
    Output schema matches bpe_segment: input columns + bpe_tokens."""
    import pandas as pd  # noqa: F401 (schema doc)

    ranks = {pair: i for i, pair in enumerate(merges)}
    pairs_by_rank = list(merges)
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    out_schema = StructType(
        list(words.schema.fields) + [StructField("bpe_tokens", ArrayType(StringType()))]
    )

    # self-contained closure: executors cloudpickle it by VALUE (no module
    # import on the Python worker), per the repo's mapInPandas convention
    def _segment_batches(batches):
        def seg(word):
            syms = list(word)
            while len(syms) >= 2:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                a, b = pairs_by_rank[best]
                out, i = [], 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        for pdf in batches:
            pdf = pdf.copy()
            pdf["bpe_tokens"] = [seg(w) for w in pdf["word"]]
            yield pdf

    return words.mapInPandas(_segment_batches, out_schema)


# merge-list size above which bpe_encode switches from the chained-Column
# rewrite (plan depth = K) to the Arrow-batched rank-loop segmentation
_SEGMENT_UDF_THRESHOLD = 64


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
    segment = bpe_segment if len(merges) <= _SEGMENT_UDF_THRESHOLD else bpe_segment_udf
    mapping = segment(wordpos.select("word").distinct(), merges)
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
