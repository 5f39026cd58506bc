"""Deterministic sampling, splitting, and sequence packing for training-data
pipelines (north-star scope).

Every decision here is a pure function of the row's key — md5-derived, no RNG,
no seed coordination, no shuffle:

- **hash_split**: train/val/test assignment from the high 32 bits of
  md5(key || salt). The same row lands in the same split on every run, every
  cluster, every engine (md5 is md5 everywhere — the DuckDB oracles compute
  the identical assignment); changing ``salt`` re-rolls the universe.
- **stratified_sample**: per-stratum keep/drop by comparing the same kind of
  bucket against a per-stratum fraction threshold. Exact determinism beats
  Bernoulli ``df.sample`` for pipeline reproducibility, and the keep decision
  is a projection — Catalyst pushes it into the scan like any filter.
- **pack_contiguous**: greedy contiguous sequence packing — running token
  total in key order, bin = which budget-multiple the row STARTS in. Each
  bin's content sums to < budget + max_item (the streaming packer's bounded
  overflow contract; trim/pad downstream). ``group_cols`` is the scale lever:
  packing runs independently inside each group, so the window never needs a
  global sort — at 100 TB group by shard/date/split and each partition packs
  locally. Omitting group_cols demands a single-partition global window —
  only for small data.

All three stay JVM-side (md5 / conv / window aggregates — no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Bucket space: the first 8 md5 hex digits = 32 bits. Thresholds are computed
# in Python as exact ints so Spark and SQL oracles compare the same literals.
BUCKET_SPACE = 1 << 32


def md5_bucket(col: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 2**32): integer value of the first 8 hex
    digits of md5(str(value) || salt). Cross-engine reproducible — DuckDB:
    ``CAST(('0x' || substr(md5(v || salt), 1, 8)) AS BIGINT)``."""
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def split_threshold(cum_weight: float) -> int:
    """The exact integer bucket threshold for a cumulative weight — exposed so
    oracle SQL can inline the identical literal."""
    return int(cum_weight * BUCKET_SPACE)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split with the given weights (must sum to 1
    within 1e-9). Pure projection: deterministic, shuffle-free, re-rollable
    via ``salt``. The last split absorbs integer-threshold rounding."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if not weights:
        raise ValueError("weights must be non-empty")
    b = md5_bucket(F.col(key_col), salt)
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        cond = b < F.lit(split_threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: float | dict[str, float],
    strata_col: str | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic sample: keep a row iff its bucket falls below the
    stratum's fraction threshold. ``fractions`` is one float for all rows, or
    a {stratum_value: fraction} dict (requires ``strata_col``; unlisted
    strata are dropped). Within a stratum the kept set is exactly the rows
    whose bucket < floor(fraction * 2**32) — reproducible and nested:
    a 0.1 sample is a subset of a 0.2 sample under the same salt."""
    b = md5_bucket(F.col(key_col), salt)
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions require strata_col")
        expr = None
        for value, frac in fractions.items():
            cond = (F.col(strata_col) == value) & (b < F.lit(split_threshold(frac)))
            expr = cond if expr is None else (expr | cond)
        if expr is None:
            raise ValueError("fractions dict must be non-empty")
        return df.filter(expr)
    return df.filter(b < F.lit(split_threshold(float(fractions))))


def pack_contiguous(
    df: DataFrame,
    order_col: str,
    size_col: str,
    budget: int,
    group_cols: list[str] | None = None,
    out_col: str = "bin_id",
) -> DataFrame:
    """Contiguous greedy packing: rows ordered by ``order_col`` (within each
    ``group_cols`` group) are laid end-to-end and ``out_col`` is the
    zero-based index of the budget-sized bin where the row STARTS
    (floor(preceding_size_sum / budget)). Bin sums land in
    [budget - max_item, budget + max_item) except the final bin.

    At scale pass ``group_cols``: each group packs in its own window
    partition with no global sort. With no groups the window is a single
    partition — small data only (Spark also warns in the plan)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(*group_cols).orderBy(order_col)
        if group_cols
        else Window.orderBy(order_col)
    )
    cum = F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = cum - F.col(size_col)
    return df.withColumn(out_col, F.floor(start / F.lit(float(budget))).cast("long"))


def stratified_exact_sample(
    df: DataFrame,
    id_col: str,
    n_per_stratum: int,
    strata_col: str,
    salt: str = "",
) -> DataFrame:
    """EXACT-count deterministic sampling: the ``n_per_stratum`` rows with
    the smallest md5(id+salt) in each stratum — the budgeted counterpart of
    :func:`stratified_sample` (fractions give binomially-varying counts;
    audits and eval-set construction need exactly n). Same md5 ordering in
    any engine reproduces the same rows; changing the salt draws a fresh
    independent sample.

    One shuffle on the stratum key; the per-stratum ORDER is rank-k
    selection inside the window sort. For mega-strata where even that sort
    hurts, pre-filter with :func:`stratified_sample` at a fraction safely
    above n/|stratum| and rank only the survivors."""
    w = Window.partitionBy(strata_col).orderBy(
        md5_bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Boundary-aware chunking of long documents into overlapping
    ``max_tokens``-token windows — the max-sequence-length prep step
    :func:`pack_contiguous` doesn't cover (packing lays WHOLE docs into bins;
    chunking splits docs that exceed the budget). Chunk i starts at token
    ``i * (max_tokens - overlap)``; the chunk count guarantees full coverage
    (last chunk may run short), and a doc within budget stays one chunk.
    Returns one row per chunk: (doc, chunk_id, n_chunk_tokens, chunk_text).

    Pure Column arithmetic (sequence/transform/slice + posexplode), fully
    distributed and codegen-eligible — per-doc cost is linear in its length,
    and no shuffle at all: chunks are emitted in the scan stage."""
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens ({max_tokens})")
    stride = max_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, max_tokens)),
    )
    return df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    ).withColumn("n_chunk_tokens", F.size(F.split("chunk_text", " ")))


def mixture_fractions(
    counts: dict[str, int], targets: dict[str, float]
) -> dict[str, float]:
    """Per-domain keep-fractions that hit a target mixture WITHOUT upsampling.

    The achievable scale is set by the limiting domain (smallest
    count/target); every domain then keeps ``scale * target / count`` of its
    rows, so kept sizes are proportional to the targets and no fraction
    exceeds 1. Pure float arithmetic in a fixed op order — (scale * target) /
    count — so an oracle can reproduce the exact doubles. Domains absent from
    ``targets`` get fraction 0 (dropped); targets for absent domains raise.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    missing = [d for d in targets if d not in counts or counts[d] == 0]
    if missing:
        raise ValueError(f"target domains with no rows: {missing}")
    scale = min(counts[d] / targets[d] for d in targets)
    return {d: (scale * targets[d]) / counts[d] for d in targets}


def temperature_targets(counts: dict[str, int], alpha: float = 0.5) -> dict[str, float]:
    """Temperature-scaled mixture targets: target_i proportional to
    ``counts_i ** alpha`` — the multilingual/multi-source sampling rule
    (alpha=1 keeps the natural distribution, alpha=0 forces uniform,
    0<alpha<1 up-weights small sources without the unbounded repetition a
    hard uniform mix would demand of them; 0.3-0.7 is the published range
    for multilingual pretraining). Feed the result to
    :func:`mixture_fractions` / :func:`resample_to_mixture`; since those
    never upsample, the smallest source after temperature scaling sets the
    achievable total. Pure driver-side float arithmetic over |domains|
    numbers — metadata-scale."""
    if not counts:
        raise ValueError("counts must be non-empty")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    empty = [d for d, n in counts.items() if n <= 0]
    if empty:
        # silently dropping them would return a mixture over a different
        # domain set than the caller passed — make the exclusion deliberate
        raise ValueError(f"domains with no rows (exclude them first): {empty}")
    weights = {d: float(n) ** alpha for d, n in counts.items()}
    total = sum(weights.values())
    return {d: w / total for d, w in weights.items()}


def resample_to_mixture(
    df: DataFrame,
    domain_col: str,
    targets: dict[str, float],
    id_col: str,
    salt: str = "mixture",
) -> DataFrame:
    """Deterministically resample ``df`` so the surviving rows follow the
    ``targets`` domain mixture (downsampling only — the limiting domain is
    kept whole). The curation step that turns a crawl's accidental language/
    source distribution into the training mix you actually want.

    One metadata-scale action (a count per domain — rows == |domains|, the
    same posture as the IVF centroid bootstrap), then a pure stratified
    filter: no shuffle of the corpus, reproducible and nested under ``salt``
    like every md5-bucket sample here.
    """
    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d")).agg(F.count("*").alias("n")).collect()
    }
    fracs = mixture_fractions(counts, targets)
    return stratified_sample(df, id_col, fracs, strata_col=domain_col, salt=salt)


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    order_by: list[Column],
) -> DataFrame:
    """Keep at most ``n`` rows per group, preferring the ``order_by`` ranking
    — the per-domain document cap of web-corpus curation (RefinedWeb-style:
    no single source may dominate the mixture), also the general "best k per
    key" primitive. Ties must be broken by a unique column in ``order_by``
    for a deterministic draw.

    Scale design: ``row_number() <= n`` compiles to WindowGroupLimit, so each
    map task keeps only its local top-n per group BEFORE the shuffle — the
    exchange carries at most n·|groups|·|tasks| rows, not the corpus. Unlike
    :func:`stratified_exact_sample` (uniform salted-hash draw) the cap is
    preference-ordered; use the hash draw when the kept subset must be
    unbiased rather than best-first."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    n: int,
    salt: str = "",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, derandomized — the
    Efraimidis-Spirakis A-Res scheme with hash-derived uniforms: each row
    scores ``ln(u) / w`` where ``u = (md5_bucket(key, salt) + 0.5) / 2^32``
    (strictly inside (0,1)) and the n highest scores win — equivalent to
    ranking on ``u^(1/w)``, so inclusion probability scales with weight while
    the draw stays exactly reproducible in any engine (and re-rollable via
    ``salt``). The training-data use: quality- or length-proportional subset
    selection where a uniform draw (``stratified_exact_sample``) would
    under-represent the documents worth keeping. Weights must be > 0.

    Scale shape: one projection + TakeOrderedAndProject (heap top-n, no
    global sort); adds a ``sample_score`` column (rounded to 10dp so
    cross-engine float ulps cannot reorder near-ties; ties break on key).
    With ``group_cols`` the draw is n PER GROUP (weighted stratified
    sampling) via a rank window that compiles to WindowGroupLimit — each
    task pre-trims its local top-n per group before the shuffle."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (md5_bucket(F.col(key_col), salt) + F.lit(0.5)) / F.lit(float(2**32))
    scored = df.withColumn("sample_score", F.round(F.log(u) / w, 10))
    order = [F.col("sample_score").desc(), F.col(key_col).asc()]
    if group_cols:
        return cap_per_group(scored, group_cols, n, order)
    return scored.orderBy(*order).limit(n)


def group_aware_split(
    df: DataFrame,
    id_col: str,
    groups: DataFrame,
    weights: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: rows are assigned to splits by their
    duplicate-GROUP key, not their own id, so every member of a near-dup group
    lands in the SAME split — a plain per-row :func:`hash_split` after fuzzy
    dedup still leaks near-copies of training documents into eval (the
    contamination measured by benchmark decontamination studies), because
    near-dup survivors and their dropped twins hash independently.

    ``groups`` is a (doc_id, group_id) frame — the output of
    ``operators.dedup.near_dup_groups`` over whatever pair generator fits the
    corpus (minhash, simhash, embedding); duplicate doc_id rows are collapsed
    (min group_id) before the join so a malformed mapping can never fan out
    corpus rows. Rows absent from ``groups`` (singletons) split by their own
    id, which IS their group key. The join is groups-side small relative to
    the corpus (only grouped docs appear), so AQE broadcasts it; the split
    itself stays a pure projection.
    """
    for reserved in ("_gkey", "_skey"):
        if reserved in df.columns:
            raise ValueError(
                f"group_aware_split uses internal column {reserved!r}, which "
                "already exists on the input — rename it first"
            )
    g = (
        groups.select(F.col("doc_id").alias(id_col), F.col("group_id").alias("_gkey"))
        .groupBy(id_col)
        .agg(F.min("_gkey").alias("_gkey"))
    )
    joined = df.join(g, id_col, "left").withColumn(
        "_skey", F.coalesce(F.col("_gkey"), F.col(id_col))
    )
    return hash_split(joined, "_skey", weights, salt, out_col).drop("_gkey", "_skey")


def seeded_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "shuffle",
    out_col: str = "shuffle_rank",
    n_output_partitions: int = 32,
    curriculum_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training output: every row gets a
    dense ``shuffle_rank`` (1..n) by md5-bucket order (ties broken on the key
    itself), reproducible across engines and re-rollable via ``salt``. The
    last step of a curation pipeline — training loaders want documents in a
    fixed pseudorandom order decorrelated from source/crawl order, and
    byte-identical re-runs.

    Scale shape — a naive ``row_number() OVER (ORDER BY bucket)`` funnels the
    corpus through ONE partition; instead: (1) range-partition on
    (bucket, key) into ``n_output_partitions``, locally sort, and
    ``localCheckpoint`` the result so BOTH passes below read one frozen
    materialization (re-evaluating ``repartitionByRange`` re-samples its
    range boundaries with a different seed per execution, which would move
    rows between partitions mid-computation and silently corrupt ranks);
    (2) collect per-partition row counts — metadata-scale, one number per
    partition; (3) lift each row's WITHIN-partition index (the low 33 bits
    of ``monotonically_increasing_id``, which counts rows in partition
    iteration order — exactly the sorted order the checkpoint froze) by its
    partition's cumulative offset. Range boundaries guarantee partition i's
    keys all precede partition i+1's, so local-index + offset IS the exact
    global rank, every partition ranks in parallel with NO further exchange,
    and output files really do hold contiguous rank spans. The checkpoint
    stores one copy of the shuffled layout on executor-local storage — the
    price of frozen two-pass composition; partitions must stay under 2^33
    rows (the id's per-partition counter width).

    ``curriculum_cols``: optional leading sort columns (a difficulty bucket,
    a quality tier) — rows then order by (curriculum, bucket, key): stages
    in curriculum order, pseudorandomly shuffled WITHIN each stage. The
    curriculum-training layout, same cost and same rank guarantees.
    """
    b = md5_bucket(F.col(key_col), salt)
    order = [F.col(c) for c in (curriculum_cols or [])] + [F.col("_sb"), F.col(key_col)]
    out = (
        df.withColumn("_sb", b)
        .repartitionByRange(n_output_partitions, *order)
        .sortWithinPartitions(*order)
        .localCheckpoint()
    )
    counts = sorted(
        (r["_pid"], r["c"])
        for r in out.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    if offsets:
        off = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.spark_partition_id(),
        )
    else:
        off = F.lit(0)
    local_idx = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    return out.withColumn(
        out_col, (F.coalesce(off, F.lit(0)) + local_idx + F.lit(1)).cast("long")
    ).drop("_sb")


def materialize_packed_sequences(
    encoded: DataFrame,
    order_col: str = "doc",
    ids_col: str = "input_ids",
    seq_len: int = 512,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Turn per-document ``input_ids`` arrays (operators/text.py:
    encode_documents) into training sequences: documents are laid end-to-end
    in ``order_col`` order (:func:`pack_contiguous` decides each document's
    bin), each bin's ids are concatenated, and the result is one row per bin
    with the flat token array plus the per-document boundary offsets an
    attention mask needs (tokens of different documents must not attend to
    each other). Returns (bin_id, n_tokens, n_docs, token_ids, doc_offsets).

    Bins target ``seq_len`` tokens; a document longer than ``seq_len`` makes
    an oversized bin — chunk upstream (``chunk_documents``) if hard caps are
    required. At scale pass ``group_cols`` so packing windows stay
    partitioned (same contract as pack_contiguous).

    Plan: the window cumsum assigns bins without moving the arrays, then ONE
    groupBy(bin) regroup ships each id array exactly once."""
    sized = encoded.withColumn("_n", F.size(F.col(ids_col)))
    binned = pack_contiguous(sized, order_col, "_n", seq_len, group_cols=group_cols)
    parts = [F.col(c) for c in (group_cols or [])]
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(ids_col).alias("ids")))
    )
    return (
        binned.groupBy(*parts, "bin_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            ordered.alias("_packed"),
        )
        .select(
            *parts,
            "bin_id",
            "n_docs",
            F.flatten(F.transform("_packed", lambda s: s["ids"])).alias("token_ids"),
            # boundary offsets: one O(n_docs) prefix-sum fold over the doc
            # sizes (an aggregate(slice(...)) per element would be quadratic
            # in the many-short-docs bins packing exists for)
            F.expr(
                "aggregate(transform(_packed, s -> size(s.ids)), "
                "named_struct('offs', cast(array() as array<int>), 'tot', 0), "
                "(acc, x) -> named_struct('offs', array_append(acc.offs, acc.tot), "
                "'tot', acc.tot + x), acc -> acc.offs)"
            ).alias("doc_offsets"),
        )
        .withColumn("n_tokens", F.size("token_ids").cast("long"))
        .select(*[c for c in (group_cols or [])], "bin_id", "n_tokens", "n_docs", "token_ids", "doc_offsets")
    )
