"""set(N) skipping index (ClickHouse ``INDEX ... TYPE set(N)`` analog).

Pins: per-part exact distinct-set metadata built on the write job,
equality/IN pruning WITHOUT opening files (asserted on metadata alone),
no false negatives (query_in ≡ full-scan filter), the overflow-to-no-claim
contract at N, manifest persistence across reopen, and index refresh at
merge.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

SCHEMA = T.StructType([
    T.StructField("key", T.LongType(), False),
    T.StructField("ts", T.LongType(), False),
    T.StructField("status", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
])

CFG = dict(memtable_flush_threshold=10**9, max_parts=100,
           key_col="key", ts_col="ts",
           set_index_cols=(("status", 8),))


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="setidx_tbl_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def table(spark, base):
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    yield t
    t.close()


def _flush_statuses(table, lo, hi, statuses):
    table.insert_rows([(k, k, statuses[k % len(statuses)], float(k))
                       for k in range(lo, hi)])
    table.flush()


def test_set_index_prunes_without_file_reads(table):
    _flush_statuses(table, 0, 50, ["ok", "retry"])        # part 1
    _flush_statuses(table, 50, 100, ["error", "fatal"])   # part 2
    _flush_statuses(table, 100, 150, ["ok"])              # part 3
    assert table.part_count() == 3
    # pruning decision is METADATA-ONLY: parts_for_in consults col_sets
    cand = table.parts_for_in("status", ["error"])
    assert [p.col_sets["status"] for p in table.manifest.parts] == [
        ["ok", "retry"], ["error", "fatal"], ["ok"]]
    assert len(cand) == 1 and cand[0].col_sets["status"] == ["error", "fatal"]
    # probing multiple values unions the claims
    assert len(table.parts_for_in("status", ["ok", "fatal"])) == 3
    assert len(table.parts_for_in("status", ["nope"])) == 0


def test_query_in_no_false_negatives(table):
    _flush_statuses(table, 0, 60, ["a", "b", "c"])
    _flush_statuses(table, 60, 120, ["d", "e"])
    got = {r["key"] for r in table.query_in("status", ["b", "e"]).collect()}
    want = {r["key"] for r in table.query_all()
            .filter(F.col("status").isin(["b", "e"])).collect()}
    assert got == want and got


def test_overflow_stores_no_claim(spark, base):
    cfg = MergeTreeConfig(**{**CFG, "set_index_cols": (("status", 3),)})
    t = SparkMergeTree(spark, base, schema=SCHEMA, config=cfg)
    _flush_statuses(t, 0, 40, ["s0", "s1", "s2", "s3", "s4"])  # 5 > N=3
    assert t.manifest.parts[0].col_sets == {"status": None}
    # overflowed part never prunes — even for absent values
    assert len(t.parts_for_in("status", ["absent"])) == 1
    assert t.query_in("status", ["s1"]).count() == 8
    t.close()


def test_set_index_survives_reopen(spark, base):
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    _flush_statuses(t, 0, 30, ["x", "y"])
    t.close()
    t2 = SparkMergeTree(spark, base, schema=SCHEMA,
                        config=MergeTreeConfig(**CFG))
    assert t2.manifest.parts[0].col_sets == {"status": ["x", "y"]}
    assert len(t2.parts_for_in("status", ["z"])) == 0
    t2.close()


def test_merge_refreshes_set_index(table):
    _flush_statuses(table, 0, 30, ["m1"])
    _flush_statuses(table, 30, 60, ["m2"])
    table.config.max_parts = 1
    table.optimize()
    assert table.part_count() == 1
    assert table.manifest.parts[0].col_sets == {"status": ["m1", "m2"]}


def test_set_index_column_is_structural(table):
    _flush_statuses(table, 0, 10, ["ok"])
    with pytest.raises(ValueError, match="structural"):
        table.drop_column("status")
    with pytest.raises(ValueError, match="structural"):
        table.rename_column("status", "code")


def test_non_string_probe_types_never_prune(table):
    # str(probe) diverges from Spark's string CAST for floats/bools —
    # such probes must make NO claim (pruning may never false-negative)
    _flush_statuses(table, 0, 10, ["ok"])
    assert len(table.parts_for_in("status", [1e-07])) == 1
    assert len(table.parts_for_in("status", [True])) == 1
    assert len(table.parts_for_in("status", ["ok", 2.5])) == 1
    # pure str/int probes still prune
    assert len(table.parts_for_in("status", ["absent"])) == 0


def test_buffered_rows_still_visible(table):
    _flush_statuses(table, 0, 10, ["seen"])
    table.insert_rows([(99, 99, "buffered", 9.9)])  # unflushed
    got = {r["status"] for r in
           table.query_in("status", ["buffered", "seen"]).collect()}
    assert got == {"buffered", "seen"}
