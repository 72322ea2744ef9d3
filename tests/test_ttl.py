"""TTL retention — expire(before_ts) (ClickHouse TTL DELETE analog).

Pins the three metadata cases (whole-part drop with zero rows read,
straddling-part rewrite, untouched young part), buffer filtering, result
correctness after expiry, disk reclamation, and persistence across reopen.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("value", T.StringType(), False),
    T.StructField("timestamp", T.LongType(), False),
])


@pytest.fixture()
def table(spark):
    base = tempfile.mkdtemp(prefix="ttl_tbl_")
    cfg = MergeTreeConfig(memtable_flush_threshold=10**9, max_parts=100)
    t = SparkMergeTree(spark, base, schema=SCHEMA, config=cfg)
    yield t
    t.close()
    shutil.rmtree(base, ignore_errors=True)


def _flush(table, lo_ts, hi_ts):
    table.insert_rows([(f"k{ts:05d}", f"v{ts}", ts)
                       for ts in range(lo_ts, hi_ts)])
    table.flush()


def test_expire_drops_rewrites_and_keeps(table):
    _flush(table, 0, 100)     # fully expired
    _flush(table, 100, 200)   # straddles cutoff 150
    _flush(table, 200, 300)   # fully young
    old_paths = {p.part_id: p.path for p in table.manifest.parts}

    stats = table.expire(150)
    assert stats == {"parts_dropped": 1, "parts_rewritten": 1,
                     "rows_removed": 150}
    assert table.part_count() == 2
    assert table.total_rows() == 150
    # surviving data is exactly ts >= 150
    ts_vals = [r["timestamp"] for r in table.query_all().collect()]
    assert min(ts_vals) == 150 and max(ts_vals) == 299 and len(ts_vals) == 150
    # dropped + rewritten part dirs are reclaimed
    live = {p.path for p in table.manifest.parts}
    for pid, path in old_paths.items():
        if path not in live:
            assert not os.path.exists(path), f"leaked part dir {path}"
    # part metadata reflects the rewrite
    assert all(p.min_ts >= 150 for p in table.manifest.parts)


def test_expire_is_metadata_only_for_whole_parts(table):
    _flush(table, 0, 100)
    _flush(table, 500, 600)
    stats = table.expire(200)
    assert stats["parts_dropped"] == 1 and stats["parts_rewritten"] == 0


def test_expire_filters_buffer(table):
    table.insert_rows([("a", "x", 10), ("b", "y", 20), ("c", "z", 30)])
    stats = table.expire(25)
    assert stats["rows_removed"] == 2
    assert table.total_rows() == 1
    rows = table.query_all().collect()
    assert [(r["key"], r["timestamp"]) for r in rows] == [("c", 30)]


def test_expire_noop_below_all_data(table):
    _flush(table, 100, 200)
    stats = table.expire(50)
    assert stats == {"parts_dropped": 0, "parts_rewritten": 0,
                     "rows_removed": 0}
    assert table.total_rows() == 100


def test_expire_persists_across_reopen(spark, table):
    _flush(table, 0, 100)
    _flush(table, 100, 200)
    table.expire(150)
    base = table.base_path
    table.close()
    cfg = MergeTreeConfig(memtable_flush_threshold=10**9)
    t2 = SparkMergeTree(spark, base, schema=SCHEMA, config=cfg)
    try:
        assert t2.total_rows() == 50
        ts_vals = [r["timestamp"] for r in t2.query_all().collect()]
        assert min(ts_vals) == 150
    finally:
        t2.close()


def test_rewritten_part_keeps_bloom(table):
    _flush(table, 100, 200)
    table.expire(150)
    p = table.manifest.parts[0]
    assert p.bloom_hex, "rewritten part lost its bloom"
    assert p.may_contain_key("k00160")
    assert not p.may_contain_key("k00120")  # expired key, fresh bloom
