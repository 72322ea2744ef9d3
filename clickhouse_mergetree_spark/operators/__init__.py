"""Operator modules — importing this package registers every declared query."""

from clickhouse_mergetree_spark.operators import (  # noqa: F401
    engine_queries,
    relational,
    sql_queries,
)

_OPTIONAL_MODULES = (
    "dedup",
    "similarity",
    "text_analysis",
    "multimodal",
    "udfs",
    "web",
)

for _m in _OPTIONAL_MODULES:
    try:
        __import__(f"clickhouse_mergetree_spark.operators.{_m}")
    except ModuleNotFoundError as exc:
        # Only swallow "the optional module itself doesn't exist yet"; a
        # broken import *inside* an existing module must fail loudly.
        if exc.name != f"clickhouse_mergetree_spark.operators.{_m}":
            raise
