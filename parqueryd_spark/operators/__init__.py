from parqueryd_spark.operators.relational import asof_join, topk

__all__ = ["asof_join", "topk"]
