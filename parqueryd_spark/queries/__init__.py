"""Named query registry — the driver-facing coverage surface.

Every implemented operator from SURVEY.md §2 (plus the north-star extensions)
gets one entry: a ``(spark, sf_dir) -> DataFrame`` callable and, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string over the same
parquet tables (pre-registered views: region nation customer supplier part
orders lineitem events documents embeddings).

Column-name contract: every computed column is aliased identically in the Spark
plan and the oracle SQL (the driver's compare sorts columns by name before
hashing values). Oracle-authoring gotcha: CAST integer sums to BIGINT (DuckDB
sums ints into HUGEINT).

Domain modules register themselves via the ``@query`` decorator on import:
``core`` (parqueryd parity), ``relational`` (joins/windows/sorts/set ops),
``scalars`` (string/date/math/json functions), ``text`` (analysis),
``dedup``, ``similarity``, ``events`` (time-series/streaming-equivalent).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, driver does rows-only check
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, bench: bool = False):
    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle, bench)
        return fn

    return deco


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items() if q.bench}


# Register all domain modules (import order = registry order). The driver's
# correctness gate records the FIRST 50 registry entries, and the highest-value
# modules register first, so an addition pushing past 50 only drops the
# lowest-value variants out of the window. Past the window as of round 6
# (51 total, each still verified by tools/driver_sim.py and pytest):
# #51 text_ngram_stats, #52 text_fingerprint, #53 text_bm25_search,
# #54 hybrid_search_rerank, #55 text_bigram_logprob, #56 text_encode_ids,
# #57 scalar_string_funcs, #58 scalar_date_json_funcs,
# #59 scalar_math_bucketing, #60 ann_pq_topk +
# #61 text_heavy_hitter_tokens (rows-only by design),
# #62 pipeline_domain_mixture, #63 pipeline_pii_redaction, #64 dedup_spans,
# #65 pipeline_chunk_documents, #66 pipeline_exact_sample,
# #67 text_unigram_logprob, #68 text_normalize_dedup,
# #69 embedding_label_centroids, #70 fuzzy_join_part_names,
# #71 part_price_quantiles, #72 pipeline_source_caps,
# #73 pipeline_weighted_sample, #74 events_funnel,
# #75 events_anomaly_zscore, #76 events_histogram_quantiles,
# #77 events_cohort_retention, #78 quality_checks, #79 table_stats_part,
# #80 table_diff_snapshots, #81 embedding_semantic_dedup,
# #82 embedding_prototypes, #83 pipeline_leakage_safe_split,
# #84 pipeline_global_shuffle, #85 text_winnow_overlap,
# #86 pipeline_data_card, #87 ann_margin_match,
# #88 text_source_divergence,
# #89-101 the extended TPC-H suite. In-window
# rows-only: events_sketch_aggs + ann_ivf_topk (estimates by design; each has
# an oracle-checked exact companion row in the window).
from parqueryd_spark.queries import core  # noqa: E402,F401
from parqueryd_spark.queries import tpch  # noqa: E402,F401
from parqueryd_spark.queries import dedup  # noqa: E402,F401
from parqueryd_spark.queries import events  # noqa: E402,F401
from parqueryd_spark.queries import similarity  # noqa: E402,F401
from parqueryd_spark.queries import multimodal  # noqa: E402,F401
from parqueryd_spark.queries import pipeline  # noqa: E402,F401
from parqueryd_spark.queries import relational  # noqa: E402,F401
from parqueryd_spark.queries import text  # noqa: E402,F401
from parqueryd_spark.queries import scalars  # noqa: E402,F401
from parqueryd_spark.queries import quantization  # noqa: E402,F401
from parqueryd_spark.queries import curation  # noqa: E402,F401
from parqueryd_spark.queries import analytics  # noqa: E402,F401
from parqueryd_spark.queries import quality  # noqa: E402,F401
from parqueryd_spark.queries import selection  # noqa: E402,F401

# MUST stay last: registers the extended TPC-H suite past the gate window.
from parqueryd_spark.queries import tpch_extended  # noqa: E402,F401

# Flagship re-export for __spark_entry__.entry()
from parqueryd_spark.queries.core import q1_pricing_summary  # noqa: E402,F401
