"""Declared-query registry (SURVEY.md §2 → __spark_entry__.py contract).

Each operator module registers its queries with @declared_query. A query is a
callable ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, the
equivalent DuckDB oracle SQL over the same parquet tables. Column names must
match between the two — the driver sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, DeclaredQuery] = {}


def declared_query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query {name!r}")
        REGISTRY[name] = DeclaredQuery(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn
    return deco


def all_queries() -> dict[str, DeclaredQuery]:
    # Import operator + streaming modules for their registration side effects.
    from clickhouse_mergetree_spark import operators, streaming  # noqa: F401
    return dict(REGISTRY)
