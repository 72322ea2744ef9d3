"""Operator modules — importing this package registers every declared query."""

from clickhouse_mergetree_spark.operators import (  # noqa: F401
    engine_queries,
    relational,
)

_OPTIONAL_MODULES = (
    "dedup",
    "similarity",
    "text_analysis",
    "multimodal",
    "udfs",
)

for _m in _OPTIONAL_MODULES:
    try:
        __import__(f"clickhouse_mergetree_spark.operators.{_m}")
    except ImportError:
        pass
