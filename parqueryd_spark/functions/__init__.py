from parqueryd_spark.functions.compile import (
    AGG_METHODS,
    compile_agg_list,
    compile_where_terms,
    normalize_agg_list,
)

__all__ = [
    "AGG_METHODS",
    "compile_agg_list",
    "compile_where_terms",
    "normalize_agg_list",
]
