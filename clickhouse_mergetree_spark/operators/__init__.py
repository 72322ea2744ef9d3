"""Operator modules — importing this package registers every declared query.

Import order IS registration order, and registration order is the
tie-break inside each priority class of the driver-gate rotation
(registry.all_queries): when more queries are unchecked than the 50-row
window holds, the later-registered ones wait a round. The sequence below
therefore puts the long-standing core surfaces (engine, SQL, dedup,
similarity) ahead of the fast-growing batch modules (relational,
text_analysis, web), so a burst of new dialect queries can never push an
older unchecked core query out of the window.
"""

from clickhouse_mergetree_spark.operators import (  # noqa: F401
    engine_queries,
    sql_queries,
)

_OPTIONAL_MODULES = (
    "dedup",
    "similarity",
    "relational",
    "text_analysis",
    "multimodal",
    "udfs",
    "web",
    "formats",
    "stats",
    "dictionaries",
)

for _m in _OPTIONAL_MODULES:
    try:
        __import__(f"clickhouse_mergetree_spark.operators.{_m}")
    except ModuleNotFoundError as exc:
        # Only swallow "the optional module itself doesn't exist yet"; a
        # broken import *inside* an existing module must fail loudly.
        if exc.name != f"clickhouse_mergetree_spark.operators.{_m}":
            raise
