"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in clickhouse_mergetree_spark/operators/ and register
themselves into clickhouse_mergetree_spark.registry; this module just
exposes the registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_mergetree_spark.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Range scan + (key, ts) dedup + latest-version read — the reference's
    core query semantics composed (SURVEY.md R3+R14+E30).
    """
    from clickhouse_mergetree_spark.operators.engine_queries import q_latest_version

    return q_latest_version(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query in queries()."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
