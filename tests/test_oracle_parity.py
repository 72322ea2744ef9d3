"""Run every declared query against its DuckDB oracle at the test SF.

This mirrors the driver's CORRECTNESS gate (row count + schema +
order-insensitive values) so mismatches are caught locally first.
Rows-only queries are checked for executability and non-crash.
"""

from __future__ import annotations

import pytest

from clickhouse_mergetree_spark.registry import all_queries
from tests.oracle_compare import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, sf_dir, duck):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        rows = df.collect()
        assert rows is not None  # executable; driver does rows-only check
    else:
        compare(df, duck, q.oracle)
