"""parqueryd_spark — a PySpark-native analytics engine with the query surface of
visualfabriq/parqueryd, rebuilt Spark-first.

The reference (surveyed in /root/repo/SURVEY.md) is a ZeroMQ/Redis dispatch shell
around one compute primitive: a filter -> group-by -> aggregate pass over local
Parquet shards (reference: parqueryd/worker.py:379-397, controller.py:599-646).
Here the cluster plumbing is Spark itself; this package is the query surface:

- :mod:`parqueryd_spark.core` — the parqueryd-parity ``groupby`` call
  (where-term triples, agg triples, silent-missing shards, aggregate=False).
- :mod:`parqueryd_spark.operators` — relational + LLM-data-pipeline operators
  (joins, windows, sorts, set ops, dedup, similarity search, text analysis,
  multimodal plumbing).
- :mod:`parqueryd_spark.sources` — parquet path resolution and table loading.
- :mod:`parqueryd_spark.functions` — the where-term / agg-list compilers.
- :mod:`parqueryd_spark.streaming` — Structured Streaming over the events table.
"""

from parqueryd_spark.core import ParquetEngine, aggregate_files
from parqueryd_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["ParquetEngine", "aggregate_files", "get_spark", "__version__"]
