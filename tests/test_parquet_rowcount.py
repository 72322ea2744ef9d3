"""_parquet_num_rows contract (ADVICE r12 + VERDICT r12 item 7b).

The footer-read shortcut feeds the corpus-size-scaled parameters
(_lsh_pair_bits, _cos_audit_blocks): a wrong 0 from an unexpected
layout would silently pin FIXTURE parameters — and fixture bits on a
scaled corpus is exactly the n²/256 quadratic the r12 round fixed. So
the contract is: exact count from footers when the layout is
recognized, None (→ caller falls back to a distributed count()) for
anything else. Pure driver-side, no Spark session needed.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from clickhouse_mergetree_spark.operators.similarity import (
    _cos_audit_blocks,
    _lsh_pair_bits,
    _parquet_num_rows,
)


def _write(path: str, n: int) -> None:
    pq.write_table(pa.table({"vec_id": list(range(n))}), path)


def test_single_file_exact(tmp_path):
    p = str(tmp_path / "emb.parquet")
    _write(p, 123)
    assert _parquet_num_rows(p) == 123


def test_directory_of_parts_exact(tmp_path):
    d = tmp_path / "emb.parquet"
    d.mkdir()
    _write(str(d / "part-0.parquet"), 100)
    _write(str(d / "part-1.parquet"), 55)
    assert _parquet_num_rows(str(d)) == 155


def test_empty_directory_returns_none_not_zero(tmp_path):
    # e.g. a hive-partitioned layout: no TOP-LEVEL .parquet files.
    # 0 would be consumed as a real count and pin fixture parameters;
    # None forces the caller's count() fallback (ADVICE r12).
    d = tmp_path / "emb.parquet"
    (d / "lang=en").mkdir(parents=True)
    _write(str(d / "lang=en" / "part-0.parquet"), 77)
    assert _parquet_num_rows(str(d)) is None


def test_missing_path_returns_none(tmp_path):
    assert _parquet_num_rows(str(tmp_path / "nope.parquet")) is None


def test_none_count_pins_fixture_parameters_only_via_fallback():
    # helpers treat None as "unknown" (fixture values) — the QUERY paths
    # never pass None without first falling back to emb.count(); this
    # pins the helper side of that contract
    assert _lsh_pair_bits(None) == 8
    assert _cos_audit_blocks(None) == 25
    # and a real scaled count moves both off the fixture values
    assert _lsh_pair_bits(100_000) > 8
    assert _cos_audit_blocks(100_000) > 25
