"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's check: row count, column names, and an
order-insensitive value comparison with columns sorted by name.
"""

from __future__ import annotations

import datetime
import math
from typing import Any


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and normalize float repr
        return round(v + 0.0, 9)
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


def compare(spark_df, duck_con, sql: str) -> None:
    """Raise AssertionError with a diff sample on any mismatch."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
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
