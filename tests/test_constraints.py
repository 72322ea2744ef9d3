"""ALTER TABLE ADD/DROP CONSTRAINT ... CHECK (insert-time validation).

The predicate is evaluated during the part-write job itself; a violating
batch rolls back its files before the manifest sees the part, so the
table is untouched. NULL predicate results count as violations (the row
must be provably TRUE). Existing data is never re-validated; merges
never re-check; the DDL persists across reopen.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

SCHEMA = T.StructType([
    T.StructField("key", T.LongType(), False),
    T.StructField("ts_us", T.LongType(), False),
    T.StructField("score", T.DoubleType(), True),
])


@pytest.fixture()
def table(spark):
    base = tempfile.mkdtemp(prefix="constraint_")
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                          key_col="key", ts_col="ts_us")
    t = SparkMergeTree(spark, base, schema=SCHEMA, config=cfg)
    yield t
    t.close()
    shutil.rmtree(base, ignore_errors=True)


def test_valid_inserts_land_violations_roll_back(table):
    table.add_constraint("pos_score", "score > 0")
    table.insert_rows([(1, 10, 1.5), (2, 20, 2.5)])
    table.flush()
    assert table.total_rows() == 2
    table.insert_rows([(3, 30, -1.0)])
    with pytest.raises(ValueError, match="pos_score"):
        table.flush()
    assert table.total_rows() == 2
    assert table.part_count() == 1
    # no orphan part directory survived the rollback
    import os
    dirs = [d for d in os.listdir(table.base_path) if d.startswith("part_")]
    assert len(dirs) == 1


def test_null_counts_as_violation(table):
    table.add_constraint("pos_score", "score > 0")
    table.insert_rows([(1, 10, None)])
    with pytest.raises(ValueError, match="pos_score"):
        table.flush()
    assert table.total_rows() == 0


def test_existing_data_not_revalidated_and_merges_dont_check(table):
    table.insert_rows([(1, 10, -5.0)])
    table.flush()  # pre-constraint data violates the future constraint
    table.add_constraint("pos_score", "score > 0")
    table.insert_rows([(2, 20, 1.0)])
    table.flush()
    table.config.max_parts = 1
    table.optimize(final=True)  # merge rewrites the violating row: fine
    assert table.total_rows() == 2


def test_drop_constraint_and_reopen(table, spark):
    table.add_constraint("pos_score", "score > 0")
    with pytest.raises(ValueError, match="already exists"):
        table.add_constraint("pos_score", "score > 1")
    r = SparkMergeTree(spark, table.base_path, schema=SCHEMA,
                       config=table.config)
    assert [c["name"] for c in r.constraints()] == ["pos_score"]
    r.insert_rows([(1, 10, -1.0)])
    with pytest.raises(ValueError, match="pos_score"):
        r.flush()
    r.drop_constraint("pos_score")
    r.insert_rows([(1, 10, -1.0)])
    r.flush()
    assert r.total_rows() == 1
    with pytest.raises(KeyError):
        r.drop_constraint("pos_score")


def test_add_constraint_validates_expression(table):
    with pytest.raises(Exception):
        table.add_constraint("bad", "score >>> 1")


def test_partitioned_insert_rejection_is_atomic(spark):
    """A violation in a LATER partition split must leave the whole insert
    unapplied: no part from any earlier (clean) split may be visible, no
    orphan dirs may survive. ClickHouse validates the insert block before
    any part is committed; the flush commits the manifest only after
    every split's write job passed its CHECK observation."""
    import os

    base = tempfile.mkdtemp(prefix="constraint_part_")
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                          key_col="key", ts_col="ts_us",
                          partition_col="key")
    t = SparkMergeTree(spark, base, schema=SCHEMA, config=cfg)
    try:
        t.add_constraint("pos_score", "score > 0")
        # split for key=1 is clean; split for key=2 (sorted later) violates
        t.insert_rows([(1, 10, 1.0), (1, 11, 2.0), (2, 20, -1.0)])
        with pytest.raises(ValueError, match="pos_score"):
            t.flush()
        assert t.total_rows() == 0
        assert t.part_count() == 0
        dirs = [d for d in os.listdir(base) if d.startswith("part_")]
        assert dirs == []
        # the table still works after the rejected insert
        t.insert_rows([(1, 10, 1.0), (2, 20, 3.0)])
        t.flush()
        assert t.total_rows() == 2
        assert t.part_count() == 2  # one part per partition value
    finally:
        t.close()
        shutil.rmtree(base, ignore_errors=True)
