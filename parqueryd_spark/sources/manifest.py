"""Zone-map data skipping: a file-level min/max manifest built from parquet
footers, and a scan that prunes files BEFORE Spark plans the read.

Vanilla Spark pushes predicates into the parquet reader, but that pruning
happens per row group INSIDE each scheduled task — every file is still
listed, split, and scheduled. At 100 TB a selective query over a
well-clustered layout (``sources/layout.py``: range-sorted or Z-ordered
writes) should not schedule a task per file just to discover min/max
disjointness; that is the file-skipping layer table formats (Delta, Iceberg,
Hudi — and the reference's bcolz-era per-shard metadata) add over a bare
directory of parquet. This module is that layer as plain DataFrames:

- ``build_manifest``: one distributed pass over the footers (mapInPandas —
  each task opens only metadata, never data pages) producing one row per
  (file, column): row count, null count, and min/max encoded both
  numerically and lexically. The manifest is itself a small DataFrame —
  persist it next to the data and rebuild incrementally per publish batch
  (it unions/overwrites per file, like the other incremental indexes).
- ``prune_files``: evaluate the reference's ``[[col, op, value], ...]``
  where-terms (the same triples ``functions/compile.py`` executes — one
  predicate language for execution AND planning) against the manifest,
  yielding a per-file keep verdict.
- ``scan_pruned``: read only the kept files, then apply the exact compiled
  filter — pruning is an optimization, never a semantics change.

Soundness: the parquet spec defines ``min_value``/``max_value`` as BOUNDS
(they may be truncated toward wider ranges, e.g. long strings), so interval
disjointness proves a file has no matching row; missing statistics or an
unprunable op keep the file. NULL semantics make every where-op
unsatisfiable on an all-null chunk (``x != v`` is NULL for NULL x), so
``null_count == n_rows`` skips for every op. The residual exact filter makes
even a pruning bug a perf bug, not a wrong answer — but the property test
asserts kept ⊇ matching-files anyway.

Driver-side cost is one collect of the KEPT file paths — the same O(files)
planning-time listing Spark's own FileIndex does; verdict evaluation stays
distributed. Hive-partitioned layouts compose: ``build_manifest`` records
directory-derived ``key=value`` partition values as constant-per-file stats
rows (so partition terms prune through the same verdict machinery as data
stats), and pruned subset reads pass ``basePath`` so the partition columns
survive — a query filtering on a partition key AND a clustered data column
skips via both layers at once.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterable, Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from parqueryd_spark.functions.compile import QueryCompileError, compile_where_terms
from parqueryd_spark.sources.fs import HadoopFS

MANIFEST_SCHEMA = StructType(
    [
        StructField("file", StringType(), False),
        StructField("column", StringType(), False),
        StructField("n_rows", LongType(), False),
        StructField("null_count", LongType(), True),
        StructField("has_min_max", BooleanType(), False),
        StructField("min_num", DoubleType(), True),
        StructField("max_num", DoubleType(), True),
        StructField("min_str", StringType(), True),
        StructField("max_str", StringType(), True),
    ]
)

_EPOCH_DT = _dt.datetime(1970, 1, 1)
_EPOCH_D = _dt.date(1970, 1, 1)


def _norm_path(u: str) -> str:
    """Normalize URI spelling differences (``file:/x`` vs ``/x`` vs
    ``file:///x``) so manifest rows (input_file_name / lister spellings)
    match caller paths."""
    return "/" + u.split(":", 1)[-1].lstrip("/") if ":" in u else u


def _coerce_num(value) -> float | None:
    """Python term-value -> the manifest's numeric encoding (None = not
    numeric). Dates AND datetimes both encode as epoch SECONDS (dates at
    midnight, matching Spark's date->timestamp cast), mirroring the
    footer-side encoding in ``build_manifest``, so a ``date`` term against a
    timestamp column (or vice versa) compares in ONE unit — encoding dates
    as days would silently prune everything on mixed-type terms (the
    day-count ~2e4 sits below every epoch-second bound ~2e9)."""
    if isinstance(value, bool):
        return float(value)
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, _dt.datetime):
        base = _EPOCH_DT.replace(tzinfo=value.tzinfo) if value.tzinfo else _EPOCH_DT
        return (value - base).total_seconds()
    if isinstance(value, _dt.date):
        return float((value - _EPOCH_D).days) * 86400.0
    return None


def build_manifest(
    spark: SparkSession, path: str, columns: Sequence[str] | None = None
) -> DataFrame:
    """One (file, column) stats row per data file under ``path`` — a
    distributed footer sweep; data pages are never read. ``columns`` limits
    the manifest to the hot filter columns (pruning treats absent columns as
    unprunable, so a narrow manifest stays sound)."""
    files = HadoopFS(spark, path).list_files(path)
    if not files:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    slices = min(len(files), 64)
    return (
        spark.createDataFrame([(f,) for f in files], "file string")
        .repartition(slices)
        .mapInPandas(
            _footer_reader(list(columns) if columns else None, root=path),
            MANIFEST_SCHEMA,
        )
    )


def _footer_reader(wanted: list[str] | None, root: str | None = None):
    """mapInPandas fn over a ``file string`` column of parquet URIs ->
    MANIFEST_SCHEMA rows. Returned closure is self-contained (imports
    inside, no module globals) so executors never need the repo importable.

    With ``root``, hive-style ``key=value`` path segments between the root
    and each file ALSO become manifest rows (min == max == the partition
    value, encoded both lexically and — when it parses as a number or ISO
    date — numerically; ``__HIVE_DEFAULT_PARTITION__`` registers as all-null)
    so where-terms on partition columns prune through the SAME verdict
    machinery as data-column stats, and the two pruning layers compose."""
    out_cols = [f.name for f in MANIFEST_SCHEMA.fields]
    norm_root = (
        ("/" + root.split(":", 1)[-1].lstrip("/") if ":" in root else root).rstrip("/")
        if root is not None
        else None
    )

    def _footers(batches):
        # self-contained closure: executors must not need the repo on their
        # import path (cloudpickled by value, imports inside)
        import datetime as dt
        from urllib.parse import unquote

        import pandas as pd
        import pyarrow.parquet as pq

        epoch_dt = dt.datetime(1970, 1, 1)
        epoch_d = dt.date(1970, 1, 1)

        def hive_parts(uri):
            if norm_root is None:
                return []
            p = "/" + uri.split(":", 1)[-1].lstrip("/") if ":" in uri else uri
            if not p.startswith(norm_root + "/"):
                return []
            out = []
            for seg in p[len(norm_root) + 1 :].split("/")[:-1]:  # dirs only
                if "=" in seg:
                    k, _, v = seg.partition("=")
                    out.append((k, unquote(v)))
            return out

        def part_num(v):
            try:
                return float(int(v))
            except ValueError:
                pass
            try:
                return float(v)
            except ValueError:
                pass
            try:
                return float((dt.date.fromisoformat(v) - epoch_d).days) * 86400.0
            except ValueError:
                return None

        def num(v):
            if v is None:
                return None
            if isinstance(v, bool):
                return float(v)
            if isinstance(v, (int, float)):
                return float(v)
            if isinstance(v, dt.datetime):
                base = epoch_dt.replace(tzinfo=v.tzinfo) if v.tzinfo else epoch_dt
                return (v - base).total_seconds()
            if isinstance(v, dt.date):
                # epoch SECONDS (midnight), same unit as datetimes — keeps
                # date/timestamp cross-type terms comparable (see _coerce_num)
                return float((v - epoch_d).days) * 86400.0
            return None

        def lex(v):
            return v if isinstance(v, str) else None

        for batch in batches:
            rows = []
            for uri in batch["file"]:
                local = uri[5:] if uri.startswith("file:") else uri
                md = pq.ParquetFile(local).metadata
                n_rows = md.num_rows
                # fold row-group chunk stats to file grain: min of mins /
                # max of maxs is still a valid bound; ANY chunk without
                # stats poisons the file's bounds (has_min_max=False)
                acc = {}
                for rg in range(md.num_row_groups):
                    for ci in range(md.num_columns):
                        cc = md.row_group(rg).column(ci)
                        name = cc.path_in_schema
                        if wanted is not None and name not in wanted:
                            continue
                        st = cc.statistics
                        cur = acc.setdefault(name, {"null": 0, "ok": True, "mins": [], "maxs": []})
                        if st is None or not st.has_min_max:
                            cur["ok"] = False
                        else:
                            cur["mins"].append(st.min)
                            cur["maxs"].append(st.max)
                        if cur["null"] is not None:
                            nc = (
                                st.null_count
                                if st is not None and st.has_null_count
                                else None
                            )
                            cur["null"] = None if nc is None else cur["null"] + nc
                # directory-derived hive partition columns: constant per file
                # (min == max == value; exact-zero nulls), so equality/range
                # terms on them prune files exactly like clustered data stats
                for pk, pv in hive_parts(uri):
                    if wanted is not None and pk not in wanted:
                        continue
                    is_null = pv == "__HIVE_DEFAULT_PARTITION__"
                    rows.append(
                        {
                            "file": uri,
                            "column": pk,
                            "n_rows": n_rows,
                            "null_count": n_rows if is_null else 0,
                            "has_min_max": not is_null,
                            "min_num": None if is_null else part_num(pv),
                            "max_num": None if is_null else part_num(pv),
                            "min_str": None if is_null else pv,
                            "max_str": None if is_null else pv,
                        }
                    )
                # sentinel coverage row (column=""): EVERY swept file gets at
                # least one manifest row, so a narrowed manifest over a file
                # whose schema lacks every wanted column still registers the
                # file in prune_files' universe (absent columns stay
                # unprunable instead of silently dropping the file's rows)
                rows.append(
                    {
                        "file": uri,
                        "column": "",
                        "n_rows": n_rows,
                        "null_count": None,
                        "has_min_max": False,
                        "min_num": None,
                        "max_num": None,
                        "min_str": None,
                        "max_str": None,
                    }
                )
                for name, cur in acc.items():
                    ok = cur["ok"] and cur["mins"]
                    mn = min(cur["mins"]) if ok else None
                    mx = max(cur["maxs"]) if ok else None
                    rows.append(
                        {
                            "file": uri,
                            "column": name,
                            "n_rows": n_rows,
                            "null_count": cur["null"],
                            "has_min_max": bool(ok),
                            "min_num": num(mn),
                            "max_num": num(mx),
                            "min_str": lex(mn),
                            "max_str": lex(mx),
                        }
                    )
            yield pd.DataFrame(rows, columns=out_cols)

    return _footers


def refresh_manifest(
    spark: SparkSession,
    path: str,
    old: DataFrame,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Incrementally maintain a persisted manifest: footer-sweep ONLY files
    not already covered, drop rows for files that vanished (compaction /
    atomic_publish swaps). Cost is O(new files), the same increment contract
    as the minhash/IVF/HLL indexes — a 100 TB corpus appending a daily batch
    re-reads a day of footers, not the standing corpus's."""
    current = set(HadoopFS(spark, path).list_files(path))
    if not current:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    known = {r.file for r in old.select("file").distinct().collect()}
    current_df = spark.createDataFrame([(f,) for f in sorted(current)], "file string")
    # semi join, not a giant isin literal: the file list can be millions long
    kept = old.join(current_df, "file", "left_semi")
    new_files = sorted(current - known)
    if not new_files:
        return kept
    slices = min(len(new_files), 64)
    fresh = (
        spark.createDataFrame([(f,) for f in new_files], "file string")
        .repartition(slices)
        .mapInPandas(
            _footer_reader(list(columns) if columns else None, root=path),
            MANIFEST_SCHEMA,
        )
    )
    return kept.unionByName(fresh)


def _window_pred(value):
    """Column predicate: could [min, max] contain ``value``?"""
    v_num = _coerce_num(value)
    if v_num is not None:
        lo, hi, v = F.col("min_num"), F.col("max_num"), F.lit(v_num)
    elif isinstance(value, str):
        lo, hi, v = F.col("min_str"), F.col("max_str"), F.lit(value)
    else:
        return F.lit(True)  # unencodable type: never prune on it
    # bounds of the wrong family (e.g. numeric term on a string column)
    # stay conservative via the coalesce(True)
    return F.coalesce((lo <= v) & (hi >= v), F.lit(True))


def _point_pred(value):
    """Column predicate: is the file constant at exactly ``value``?"""
    v_num = _coerce_num(value)
    if v_num is not None:
        lo, hi, v = F.col("min_num"), F.col("max_num"), F.lit(v_num)
    elif isinstance(value, str):
        lo, hi, v = F.col("min_str"), F.col("max_str"), F.lit(value)
    else:
        return F.lit(False)
    return F.coalesce((lo == v) & (hi == v), F.lit(False))


def _bound_pred(op: str, value):
    """Keep-verdict for one term over a (file, column) stats row that HAS
    min/max bounds. Conservative by construction: anything uncertain
    evaluates to keep."""
    if op in ("==", "="):
        return _window_pred(value)
    if op in (">", ">=", "<", "<="):
        v_num = _coerce_num(value)
        if v_num is not None:
            lo, hi, v = F.col("min_num"), F.col("max_num"), F.lit(v_num)
        elif isinstance(value, str):
            lo, hi, v = F.col("min_str"), F.col("max_str"), F.lit(value)
        else:
            return F.lit(True)
        cmp = {">": hi > v, ">=": hi >= v, "<": lo < v, "<=": lo <= v}[op]
        return F.coalesce(cmp, F.lit(True))
    if op == "in":
        vs = value if isinstance(value, (list, tuple, set)) else [value]
        preds = [_window_pred(v) for v in vs]
        return reduce(lambda a, b: a | b, preds) if preds else F.lit(False)
    if op == "!=":
        # a constant-at-v file has no satisfying non-null row; NULLs never
        # satisfy != either, so null_count is irrelevant here
        return ~_point_pred(value)
    if op == "not in":
        vs = value if isinstance(value, (list, tuple, set)) else [value]
        hit = [_point_pred(v) for v in vs]
        return ~(reduce(lambda a, b: a | b, hit)) if hit else F.lit(True)
    raise QueryCompileError(f"unsupported where op {op!r} for pruning")


def prune_files(
    manifest: DataFrame, where_terms: Sequence[Sequence] | None
) -> DataFrame:
    """Per-file keep verdicts ``(file, keep)`` for AND-combined where-terms
    (the reference's triple syntax — ``functions/compile.py``). A term whose
    column is absent from the manifest keeps every file; an all-null chunk
    satisfies no op (SQL NULL comparison semantics) and is skipped."""
    files = manifest.select("file").distinct()
    if not where_terms:
        return files.withColumn("keep", F.lit(True))
    out = files
    for i, term in enumerate(where_terms):
        if not isinstance(term, (list, tuple)) or len(term) != 3:
            raise QueryCompileError(f"where term must be [col, op, value], got {term!r}")
        col_name, op, value = term
        op_key = str(op).strip().lower()
        all_null = F.col("null_count").isNotNull() & (
            F.col("null_count") == F.col("n_rows")
        )
        keep = F.when(all_null, F.lit(False)).otherwise(
            F.when(~F.col("has_min_max"), F.lit(True)).otherwise(
                _bound_pred(op_key, value)
            )
        )
        verdict = (
            manifest.filter(F.col("column") == col_name)
            .select("file", keep.alias(f"__k{i}"))
        )
        out = out.join(verdict, "file", "left")
    ks = [F.coalesce(F.col(f"__k{i}"), F.lit(True)) for i in range(len(where_terms))]
    return out.select("file", reduce(lambda a, b: a & b, ks).alias("keep"))


def pruned_file_list(
    manifest: DataFrame, where_terms: Sequence[Sequence] | None
) -> list[str]:
    """The kept file paths — the planning-time collect (O(kept files), the
    analog of Spark's own driver-side file listing)."""
    return sorted(
        r.file for r in prune_files(manifest, where_terms).filter("keep").collect()
    )


def prune_paths(
    manifest: DataFrame,
    paths: Sequence[str],
    where_terms: Sequence[Sequence] | None,
) -> list[str]:
    """Filter a caller-resolved shard list by the manifest's verdicts — the
    hook the parity API uses (``aggregate_files(..., manifest=)``): the
    reference's worker skipped work via per-shard metadata; here the same
    where-term triples skip whole shards before Spark ever lists them.
    Paths absent from the manifest are KEPT (conservative), and scheme
    spelling differences (``file:/x`` vs ``/x`` vs ``file:///x``) are
    normalized away before matching.

    A shard path may be a FILE or a DIRECTORY of part-files (Spark writes):
    a directory is dropped only when EVERY manifest file under it is ruled
    out; a path with no manifest coverage at all is kept.

    Driver-side cost is O(paths log files): verdict keys are sorted once and
    each shard path binary-searches its prefix range (a per-path linear scan
    of the verdict dict would be quadratic at millions of files).
    """
    import bisect

    verdicts = {
        _norm_path(r.file): bool(r.keep)
        for r in prune_files(manifest, where_terms).collect()
    }
    keys = sorted(verdicts)
    kept: list[str] = []
    for p in paths:
        np_ = _norm_path(p)
        prefix = np_.rstrip("/") + "/"
        # files under the directory form a contiguous sorted range
        # [prefix, prefix + U+10FFFF); an exact-file shard matches np_ itself
        lo = bisect.bisect_left(keys, prefix)
        hi = bisect.bisect_left(keys, prefix + "\U0010ffff")
        under = [verdicts[k] for k in keys[lo:hi]]
        if np_ in verdicts:
            under.append(verdicts[np_])
        if not under or any(under):
            kept.append(p)
    return kept


def _uncovered_live_files(spark: SparkSession, path: str, mf: DataFrame) -> list[str]:
    """Live files under ``path`` with NO manifest coverage — a stale
    persisted manifest's blind spot; callers keep (scan) them."""
    covered = {_norm_path(r.file) for r in mf.select("file").distinct().collect()}
    return sorted(
        f for f in HadoopFS(spark, path).list_files(path) if _norm_path(f) not in covered
    )


def skip_stats(manifest: DataFrame, where_terms: Sequence[Sequence] | None) -> dict:
    """How much the layout lets this predicate skip: files/rows total vs
    kept. ``rows_kept`` is the scheduling bound (rows in files we must
    read), not the match count."""
    per_file = manifest.groupBy("file").agg(F.max("n_rows").alias("n_rows"))
    joined = per_file.join(prune_files(manifest, where_terms), "file")
    row = joined.agg(
        F.count(F.lit(1)).alias("files_total"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("files_kept"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(F.when(F.col("keep"), F.col("n_rows")).otherwise(0)).alias("rows_kept"),
    ).collect()[0]
    return {k: (0 if row[k] is None else int(row[k])) for k in row.asDict()}


def scan_pruned(
    spark: SparkSession,
    path: str,
    where_terms: Sequence[Sequence] | None,
    manifest: DataFrame | None = None,
    select: Iterable[str] | None = None,
    bloom_manifests: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Read only the files the manifest cannot rule out, then apply the
    EXACT compiled predicate — identical results to a full scan + filter
    (property-tested), minus the skipped files' tasks. Pass a persisted
    ``manifest`` for standing data; omitting it builds one on the fly (a
    footer sweep — still cheaper than a data scan for selective queries,
    but the point of the layer is to build once per publish).

    ``bloom_manifests`` ({column: bloom_manifest DataFrame}) stacks the
    second pruning mechanism: for each ``==``/``in`` term on a covered
    column, the per-file blooms rule out files the min/max bounds can't —
    the two verdict sets INTERSECT, so a query like "value in this range
    AND key == X" reads only files passing both. Sound either way (bloom:
    no false negatives; zone map: spec bounds; exact filter regardless)."""
    mf = manifest if manifest is not None else build_manifest(spark, path)
    kept = pruned_file_list(mf, where_terms)
    if manifest is not None:
        # a STALE persisted manifest (new files published since the last
        # refresh) must not silently drop the uncovered files' rows: union
        # the live listing and keep anything without manifest coverage
        # (conservative — the same contract as an absent column). A freshly
        # built manifest just listed the same files, so this only runs for
        # caller-persisted manifests.
        kept = kept + _uncovered_live_files(spark, path, mf)
    if bloom_manifests:
        norm = _norm_path
        dtypes = {f.name: f.dataType for f in spark.read.parquet(path).schema.fields}
        for term in where_terms or []:
            col_name, op, value = term
            op_key = str(op).strip().lower()
            if col_name not in bloom_manifests or op_key not in ("==", "=", "in"):
                continue
            vals = list(value) if isinstance(value, (list, tuple, set)) else [value]
            verdicts = {
                norm(r.file): bool(r.keep)
                for r in prune_files_bloom(
                    bloom_manifests[col_name], vals, value_type=dtypes.get(col_name)
                ).collect()
            }
            kept = [f for f in kept if verdicts.get(norm(f), True)]
    pred = compile_where_terms(where_terms)
    if not kept:
        base = spark.read.parquet(path).filter(F.lit(False))
    else:
        # basePath keeps directory-derived (hive) partition columns alive on
        # a subset-of-files read — without it a pruned read of a partitioned
        # dataset would silently drop those columns. Only meaningful when
        # ``path`` is a directory above the kept files.
        reader = spark.read
        if any(_norm_path(f) != _norm_path(path) for f in kept):
            reader = reader.option("basePath", path)
        base = reader.parquet(*kept)
        if pred is not None:
            base = base.filter(pred)
    if select is not None:
        base = base.select(*select)
    return base


def _full_pred(op: str, value):
    """Keep-verdict complement: does EVERY non-null row of a (file, column)
    stats row satisfy the term? Conservative toward False (uncertain files
    get scanned, never stat-counted)."""
    v_num = _coerce_num(value)
    if v_num is not None:
        lo, hi, v = F.col("min_num"), F.col("max_num"), F.lit(v_num)
    elif isinstance(value, str):
        lo, hi, v = F.col("min_str"), F.col("max_str"), F.lit(value)
    else:
        return F.lit(False)
    if op in ("==", "="):
        core = (lo == v) & (hi == v)
    elif op == ">":
        core = lo > v
    elif op == ">=":
        core = lo >= v
    elif op == "<":
        core = hi < v
    elif op == "<=":
        core = hi <= v
    elif op == "!=":
        core = (hi < v) | (lo > v)
    elif op == "in":
        vs = value if isinstance(value, (list, tuple, set)) else [value]
        # whole file inside the set: only provable for a constant file
        per = [_point_pred(x) for x in vs]
        core = reduce(lambda a, b: a | b, per) if per else F.lit(False)
    elif op == "not in":
        vs = value if isinstance(value, (list, tuple, set)) else [value]
        outs = [
            (F.col("max_num") < _coerce_num(x)) | (F.col("min_num") > _coerce_num(x))
            if _coerce_num(x) is not None
            else (F.col("max_str") < x) | (F.col("min_str") > x)
            if isinstance(x, str)
            else F.lit(False)
            for x in vs
        ]
        core = reduce(lambda a, b: a & b, outs) if outs else F.lit(True)
    else:
        return F.lit(False)
    # NULL rows never satisfy a predicate, so a stat-counted file must have
    # a proven-zero null count for the term's column
    return (
        F.col("has_min_max")
        & F.col("null_count").isNotNull()
        & (F.col("null_count") == 0)
        & F.coalesce(core, F.lit(False))
    )


def _full_satisfaction(mf: DataFrame, terms: list) -> DataFrame:
    """Per-file ``(file, full)``: does every non-null row of the file
    provably satisfy EVERY term? (``_full_pred`` per term, AND-combined;
    missing stats coalesce to False — uncertain files are boundary, never
    stat-answered.)"""
    per_file = mf.groupBy("file").agg(F.max("n_rows").alias("n_rows"))
    if not terms:
        return per_file.select("file", F.lit(True).alias("full"))
    full = per_file.select("file")
    for i, term in enumerate(terms):
        col_name, op, value = term
        sat = (
            mf.filter(F.col("column") == col_name)
            .select("file", _full_pred(str(op).strip().lower(), value).alias(f"__s{i}"))
        )
        full = full.join(sat, "file", "left")
    alls = [F.coalesce(F.col(f"__s{i}"), F.lit(False)) for i in range(len(terms))]
    return full.select("file", reduce(lambda a, b: a & b, alls).alias("full"))


def count_pruned(
    spark: SparkSession,
    path: str,
    where_terms: Sequence[Sequence] | None,
    manifest: DataFrame | None = None,
) -> int:
    """COUNT(*) under AND-combined where-terms with METADATA-ONLY counting
    where the stats prove it: a file every term fully satisfies contributes
    its footer row count without being read; a file no term can match
    contributes nothing; only BOUNDARY files — possibly-matching but not
    provably-all-matching — are scanned with the exact predicate. On a
    clustered layout (sources/layout.py) a range count touches the two edge
    files of the range and sums the interior from kilobytes of manifest —
    the zone-map analog of partition-level count pushdown."""
    mf = manifest if manifest is not None else build_manifest(spark, path)
    terms = list(where_terms or [])
    per_file = mf.groupBy("file").agg(F.max("n_rows").alias("n_rows"))
    plan = (
        per_file.join(prune_files(mf, terms), "file")
        .join(_full_satisfaction(mf, terms), "file")
        .select("file", "n_rows", "keep", "full")
        .collect()
    )
    stat_count = sum(r.n_rows for r in plan if r.keep and r.full)
    boundary = sorted(r.file for r in plan if r.keep and not r.full)
    if manifest is not None:
        # stale-manifest guard (see scan_pruned): uncovered live files can't
        # be stat-counted or ruled out — scan them with the exact predicate
        boundary = boundary + _uncovered_live_files(spark, path, mf)
    if not boundary:
        return int(stat_count)
    pred = compile_where_terms(terms)
    reader = spark.read
    if any(_norm_path(f) != _norm_path(path) for f in boundary):
        reader = reader.option("basePath", path)  # keep hive partition cols
    scan = reader.parquet(*boundary)
    if pred is not None:
        scan = scan.filter(pred)
    return int(stat_count + scan.count())


def minmax_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    where_terms: Sequence[Sequence] | None = None,
    manifest: DataFrame | None = None,
    dtype: str | None = None,
) -> tuple:
    """(MIN(col), MAX(col)) under AND-combined where-terms with
    METADATA-ONLY answers where the stats prove them — the min/max analog of
    :func:`count_pruned`: a kept file every term fully satisfies contributes
    its footer ``[min, max]`` for ``col`` WITHOUT being read; only boundary
    files (possibly-matching but not provably-all-matching, or lacking exact
    stats) are scanned with the exact predicate.

    Soundness: this shortcut applies ONLY to numerically-encoded stats
    (ints/floats — exact by the parquet spec; string min/max may be
    TRUNCATED toward wider bounds, so string columns always scan), only when
    the file fully satisfies every term (so every non-null row — including
    the extremes — is in the result set), and the footer min/max of a fully-
    matching file ARE its contribution to the aggregate (MIN/MAX ignore
    NULLs, which the stats exclude by construction). Date/timestamp columns
    also scan: their numeric encoding (epoch seconds) is planning-grade, not
    value-grade. Returns ``(None, None)`` when no rows match.

    ``dtype`` (a Spark type string, e.g. ``"double"``) skips the schema
    lookup — pass it when the answer must come from the manifest ALONE (the
    count_pruned posture: a fully-provable predicate then needs no data file
    on disk at all)."""
    num_types = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    if dtype is None:
        dtype = dict(spark.read.parquet(path).dtypes).get(col)
    metadata_ok = dtype in num_types
    mf = manifest if manifest is not None else build_manifest(spark, path)
    terms = list(where_terms or [])
    colstats = mf.filter(F.col("column") == col).select(
        "file",
        F.col("has_min_max").alias("stat_hmm"),
        F.col("min_num").alias("stat_lo"),
        F.col("max_num").alias("stat_hi"),
    )
    plan = (
        prune_files(mf, terms)
        .join(_full_satisfaction(mf, terms), "file")
        .join(colstats, "file", "left")
        .collect()
    )
    lo = hi = None
    boundary = []
    for r in plan:
        if not r.keep:
            continue
        if metadata_ok and r.full and r.stat_hmm and r.stat_lo is not None:
            lo = r.stat_lo if lo is None else min(lo, r.stat_lo)
            hi = r.stat_hi if hi is None else max(hi, r.stat_hi)
        else:
            boundary.append(r.file)
    if manifest is not None:
        boundary = boundary + _uncovered_live_files(spark, path, mf)
    if boundary:
        pred = compile_where_terms(terms)
        reader = spark.read
        if any(_norm_path(f) != _norm_path(path) for f in boundary):
            reader = reader.option("basePath", path)
        scan = reader.parquet(*sorted(boundary))
        if pred is not None:
            scan = scan.filter(pred)
        row = scan.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        s_lo, s_hi = row["lo"], row["hi"]
        if s_lo is not None:
            if not metadata_ok:
                # non-numeric columns never take the stats shortcut, so the
                # scan result IS the answer, in the column's native type
                return (s_lo, s_hi)
            s_lo, s_hi = float(s_lo), float(s_hi)
            lo = s_lo if lo is None else min(lo, s_lo)
            hi = s_hi if hi is None else max(hi, s_hi)
        elif not metadata_ok:
            return (None, None)
    if lo is None:
        return (None, None)
    if dtype in {"tinyint", "smallint", "int", "bigint"}:
        return (int(lo), int(hi))
    return (float(lo), float(hi))


def bloom_manifest(
    spark: SparkSession,
    path: str,
    key_col: str,
    fpp: float = 0.01,
    num_bits: int | None = None,
    num_hashes: int | None = None,
) -> DataFrame:
    """Per-FILE Bloom filters for point-lookup skipping on UNCLUSTERED
    columns — the skipping mechanism min/max zone maps can't provide: when a
    high-cardinality key is scattered (not range-clustered), every file's
    [min, max] spans the whole domain and ``prune_files`` keeps everything,
    but a key lives in few files and each file's bloom proves its absence
    from the rest. One row per file ``(file, n_bits, n_hashes, bitmap)`` —
    the operators/membership.py filter at file grain, same double-hashing
    probe, so no false negatives and lookups stay EXACT after the residual
    filter.

    Build reads the key column once (unlike the footer manifest) — an
    ingest-time cost amortized over every lookup; sizing defaults to the
    largest file's row count at ``fpp``. NULL keys are excluded (a NULL
    never equals a lookup value). Persist the rows next to the data and
    maintain per publish batch like the other incremental indexes."""
    base = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), F.col(key_col).alias("__k"))
        .where(F.col("__k").isNotNull())
    )
    if num_bits is None or num_hashes is None:
        from parqueryd_spark.operators.membership import bloom_params

        mx = (
            base.groupBy("file")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .collect()[0][0]
        )
        num_bits, num_hashes = bloom_params(int(mx or 1), fpp)
    from parqueryd_spark.operators.membership import _SEED2, _positions_sql

    lanes = (
        base.select(
            "file",
            F.xxhash64("__k").alias("__h1"),
            F.xxhash64("__k", F.lit(_SEED2)).alias("__h2"),
        )
        .select(
            "file",
            F.explode(
                F.expr(_positions_sql("__h1", "__h2", str(num_hashes), f"{num_bits}L"))
            ).alias("pos"),
        )
        .select(
            "file",
            F.expr("CAST(pos DIV 64 AS INT)").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("lane"),
        )
        .groupBy("file", "word")
        .agg(F.expr("bit_or(lane)").alias("bits"))
    )
    return lanes.groupBy("file").agg(
        F.lit(int(num_bits)).cast("bigint").alias("n_bits"),
        F.lit(int(num_hashes)).cast("int").alias("n_hashes"),
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bitmap"),
    )


def prune_files_bloom(bloom_mf: DataFrame, values: Sequence, value_type=None) -> DataFrame:
    """Per-file keep verdicts for ``key IN values``: a file is kept iff ANY
    lookup value probes positive in its bloom (expected kept ≈ true hits +
    fpp x files). IMPORTANT: hash equality requires TYPE equality — cast
    ``values`` to the key column's exact Spark type via ``value_type``
    (``scan_bloom_pruned`` does this from the data schema automatically)."""
    from parqueryd_spark.operators.membership import _SEED2, _positions_sql

    spark = bloom_mf.sparkSession
    vals = spark.createDataFrame([(v,) for v in values], ["__v"])
    if value_type is not None:
        vals = vals.select(F.col("__v").cast(value_type).alias("__v"))
    vals = vals.select(
        F.xxhash64("__v").alias("__h1"), F.xxhash64("__v", F.lit(_SEED2)).alias("__h2")
    )
    hit = F.expr(
        "forall("
        + _positions_sql("__h1", "__h2", "n_hashes", "n_bits")
        + ", p -> (shiftright(coalesce(element_at(bitmap, CAST(p DIV 64 AS INT)), 0L),"
        "            CAST(p % 64 AS INT)) & 1) = 1)"
    )
    return (
        bloom_mf.crossJoin(F.broadcast(vals))
        .withColumn("__hit", hit)
        .groupBy("file")
        .agg(F.expr("bool_or(__hit)").alias("keep"))
    )


def scan_bloom_pruned(
    spark: SparkSession,
    path: str,
    key_col: str,
    values: Sequence,
    bloom_mf: DataFrame,
) -> DataFrame:
    """Point-in-set lookup reading only files whose bloom may contain one of
    ``values``; the exact ``isin`` filter then runs on the survivors —
    identical results to a full scan. Files without manifest coverage are
    kept (conservative), matching the other pruned-scan contracts."""
    all_files = HadoopFS(spark, path).list_files(path)
    dtype = spark.read.parquet(path).schema[key_col].dataType

    def norm(u: str) -> str:
        return "/" + u.split(":", 1)[-1].lstrip("/") if ":" in u else u

    verdicts = {
        norm(r.file): bool(r.keep)
        for r in prune_files_bloom(bloom_mf, values, value_type=dtype).collect()
    }
    kept = [f for f in all_files if verdicts.get(norm(f), True)]
    typed = [F.lit(v).cast(dtype) for v in values]
    if not kept:
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*kept).filter(F.col(key_col).isin(*typed))


def refresh_bloom_manifest(
    spark: SparkSession,
    path: str,
    key_col: str,
    old: DataFrame,
) -> DataFrame:
    """Incrementally maintain a persisted bloom manifest: build blooms ONLY
    for files not already covered (reading just their key column), drop rows
    for vanished files, and reuse the OLD rows' (n_bits, n_hashes) so every
    file probes identically — the refresh_manifest contract for the bloom
    layer. Cost is O(new files' rows), never the standing corpus."""
    current = set(HadoopFS(spark, path).list_files(path))
    if not current:
        return old.limit(0)

    def norm(u: str) -> str:
        return "/" + u.split(":", 1)[-1].lstrip("/") if ":" in u else u

    # manifest rows carry input_file_name() spellings (file:///x) while the
    # lister yields Hadoop-qualified ones (file:/x) — join on the normalized
    # path, not the raw string
    norm_sql = F.concat(
        F.lit("/"), F.expr("trim(LEADING '/' FROM element_at(split(file, ':', 2), -1))")
    )
    current_df = spark.createDataFrame(
        [(norm(f),) for f in sorted(current)], "nf string"
    )
    kept = old.join(
        current_df, norm_sql == F.col("nf"), "left_semi"
    )
    known = {r.file for r in old.select("file").distinct().collect()}
    known_n = {norm(f) for f in known}
    new_files = sorted(f for f in current if norm(f) not in known_n)
    if not new_files:
        return kept
    params = old.select("n_bits", "n_hashes").limit(1).collect()
    if params:
        num_bits, num_hashes = int(params[0].n_bits), int(params[0].n_hashes)
    else:
        num_bits = num_hashes = None  # empty old manifest: size from the new files
    from parqueryd_spark.operators.membership import _SEED2, _positions_sql, bloom_params

    base = (
        spark.read.parquet(*new_files)
        .select(F.input_file_name().alias("file"), F.col(key_col).alias("__k"))
        .where(F.col("__k").isNotNull())
    )
    if num_bits is None:
        mx = (
            base.groupBy("file").agg(F.count(F.lit(1)).alias("n")).agg(F.max("n")).collect()[0][0]
        )
        num_bits, num_hashes = bloom_params(int(mx or 1), 0.01)
    lanes = (
        base.select(
            "file",
            F.xxhash64("__k").alias("__h1"),
            F.xxhash64("__k", F.lit(_SEED2)).alias("__h2"),
        )
        .select(
            "file",
            F.explode(
                F.expr(_positions_sql("__h1", "__h2", str(num_hashes), f"{num_bits}L"))
            ).alias("pos"),
        )
        .select(
            "file",
            F.expr("CAST(pos DIV 64 AS INT)").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("lane"),
        )
        .groupBy("file", "word")
        .agg(F.expr("bit_or(lane)").alias("bits"))
    )
    fresh = lanes.groupBy("file").agg(
        F.lit(num_bits).cast("bigint").alias("n_bits"),
        F.lit(num_hashes).cast("int").alias("n_hashes"),
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bitmap"),
    )
    return kept.unionByName(fresh)


def optimize_dataset(
    spark: SparkSession,
    dataset_dir: str,
    target_partitions: int,
    cluster_by: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
    manifest_dir: str | None = None,
    manifest_columns: Sequence[str] | None = None,
    bloom_cols: Sequence[str] | None = None,
    bloom_fpp: float = 0.01,
) -> dict:
    """The OPTIMIZE maintenance op for plain parquet, one call: compact
    small files and re-cluster (``sinks.compact_parquet`` — range-sort for
    one ``cluster_by`` column, Z-order for several, readers stay on the old
    generation until the atomic swap), then REBUILD the skipping indexes the
    rewrite just invalidated — the zone-map manifest (every file is new, so
    a full footer sweep IS the increment) and optional per-column Bloom
    manifests — persisting them under ``manifest_dir`` (``zonemap/`` and
    ``bloom=<col>/`` datasets) for every later ``scan_pruned`` /
    ``scan_bloom_pruned`` / ``aggregate_files(manifest=)`` call. This is the
    moment skipping indexes should be refreshed: clustering is what makes
    zone-map bounds tight, and stale manifests after a rewrite would keep
    phantom files. Returns {'rows', 'files', 'manifest_rows'}."""
    import os

    from parqueryd_spark.sources.sinks import compact_parquet

    n_rows = compact_parquet(
        spark,
        dataset_dir,
        target_partitions,
        list(partition_by) if partition_by else None,
        list(cluster_by) if cluster_by else None,
    )
    out = {"rows": int(n_rows), "files": len(HadoopFS(spark, dataset_dir).list_files(dataset_dir))}
    if manifest_dir is not None:
        mf = build_manifest(
            spark, dataset_dir, list(manifest_columns) if manifest_columns else None
        )
        zdir = os.path.join(manifest_dir, "zonemap")
        mf.write.mode("overwrite").parquet(zdir)
        out["manifest_rows"] = spark.read.parquet(zdir).count()
        for c in bloom_cols or []:
            bloom_manifest(spark, dataset_dir, c, fpp=bloom_fpp).write.mode(
                "overwrite"
            ).parquet(os.path.join(manifest_dir, f"bloom={c}"))
    return out
