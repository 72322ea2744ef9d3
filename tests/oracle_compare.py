"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's check: row count, column names, and an
order-insensitive value comparison with columns sorted by name.

Round-5 strictness (VERDICT r4 item 3): the driver's value hash is
TYPE-sensitive — DuckDB widening sum(BIGINT) to HUGEINT (int128) or
leaving a DECIMAL un-cast hash-mismatches even when the values are
bit-identical (the whole r4 hash-fail class). Two defenses:

1. ``compare()`` asserts no HUGEINT/DECIMAL column survives in the
   oracle result schema — the mechanical fix is always a CAST in the
   oracle SQL (``CAST(sum(x) AS BIGINT)`` / ``AS DOUBLE``).
2. ``_norm_cell`` tags numeric cells with a type class, so a Python
   ``int`` no longer compares equal to a ``float``/``Decimal`` of the
   same value (Python's cross-type ``==`` hid exactly this).
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

# DuckDB result types that the driver's hash canonicalizes differently
# from Spark's int64/float64 — any oracle producing one is a latent
# hash-fail even when values match. Round-6 addition: LIST/MAP/STRUCT
# result columns ("[]", "MAP(", "STRUCT(") — the driver's pandas
# canonicalizer crashes sorting list cells (TypeError: unhashable type,
# the r5 q_agg_grouparray/q_quantiles_multi fail class); the fix is
# always a canonical scalar serialization (array_to_string / sorted
# 'k=v' pairs, the q_agg_summap pattern).
_FORBIDDEN_TYPE_FRAGMENTS = (
    "HUGEINT", "DECIMAL", "UHUGEINT", "[]", "MAP(", "STRUCT(")


def _norm_cell(v: Any) -> Any:
    # bool is an int subclass — check first so True doesn't tag as int
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # Round-10 strictness (VERDICT r9 items 1b/3): the driver's value
        # hash is EXACT — it distinguishes -0.0 from 0.0 (the r9
        # q_embed_covariance fail: Spark's BigDecimal HALF_UP round emits
        # 0.0 where DuckDB's round preserves IEEE -0.0) and any sub-9dp
        # repr drift (the old `round(v + 0.0, 9)` masked both classes,
        # which is why 268/268 self-sweeps could not see the one red
        # driver cell). Full repr preserves the sign of zero and every
        # mantissa bit, making self-pass a strict superset of driver-pass.
        return ("f", repr(v))
    if isinstance(v, decimal.Decimal):
        # distinct tag: a Decimal reaching the comparison is already a
        # type divergence from Spark's float/int and must not pass
        return ("dec", str(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def assert_oracle_types(rel) -> None:
    """Fail if any result column has a type the driver hashes differently
    from Spark's (HUGEINT/DECIMAL). ``rel`` is a DuckDB relation."""
    flagged = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(frag in str(t).upper() for frag in _FORBIDDEN_TYPE_FRAGMENTS)
    ]
    assert not flagged, (
        f"oracle result has driver-hash-unsafe column types {flagged}; "
        f"CAST numerics (AS BIGINT / AS DOUBLE — r4 HUGEINT class) and "
        f"serialize arrays/maps/structs to canonical strings "
        f"(array_to_string / sorted 'k=v' — r5 unhashable-list class)"
    )


def compare(spark_df, duck_con, sql: str) -> None:
    """Raise AssertionError with a diff sample on any mismatch."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    assert_oracle_types(rel)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_norm = normalize(s_rows, s_cols)
    d_norm = normalize(d_rows, d_cols)
    if s_norm != d_norm:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
        ][:5]
        raise AssertionError(
            f"value mismatch ({len(diffs)}+ rows); cols={sorted(s_cols)}; "
            f"first diffs (spark vs duck): {diffs}"
        )
