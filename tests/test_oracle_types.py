"""Fast standalone lint: every DuckDB oracle's result schema is
driver-hash-safe (no HUGEINT/DECIMAL/UHUGEINT columns).

This is the mechanical defense against the round-4 hash-fail class:
DuckDB widens sum(BIGINT) to HUGEINT (int128) and keeps DECIMAL types
un-cast; the driver's value hash canonicalizes those differently from
Spark's int64/float64, so bit-identical values still hash-mismatch.
The fix is always a CAST in the oracle SQL. This test needs no Spark
session — it plans each oracle under DuckDB directly, so it runs in
seconds and catches new oracles at authoring time.

(Verified against history: before the round-5 casts, this lint flags
q_udf_grouped, q_window_sessionize, q_embed_quantize — the three r4
hash-fails — and q_sql_tpch_q12, which had never been driver-checked
and would have failed in r5.)
"""

from __future__ import annotations

import pytest

from clickhouse_mergetree_spark.registry import all_queries
from tests.oracle_compare import assert_oracle_types

QUERIES = all_queries()
ORACLED = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_result_types(name, duck):
    q = QUERIES[name]
    try:
        rel = duck.sql(q.oracle)
    except Exception as e:  # oracle depends on a Spark-side persisted table
        msg = str(e)
        if "does not exist" in msg or "No files found" in msg:
            pytest.skip(f"oracle needs Spark-side setup: {msg[:80]}")
        raise
    assert_oracle_types(rel)
