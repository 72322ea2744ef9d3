"""CREATE/DROP ROW POLICY (row-level security analog).

Policies are table-attached read predicates: every read path applies
them (range/point/full/partition/sample, token/ngram/set index reads,
time travel, grouped aggregation), they AND together, persist across
reopen, and never touch storage — merges/mutations see physical rows,
and dropping a policy restores visibility. Projections cannot serve
policy-filtered reads, so routing falls back to raw aggregation.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import (
    MergeTreeConfig,
    ProjectionSpec,
    SparkMergeTree,
)

SCHEMA = T.StructType([
    T.StructField("key", T.LongType(), False),
    T.StructField("ts_us", T.LongType(), False),
    T.StructField("tenant", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
])

ROWS = [
    (1, 10, "acme", "alpha zebra"),
    (2, 20, "acme", "beta"),
    (3, 30, "globex", "gamma zebra"),
    (4, 40, "globex", "delta"),
]


@pytest.fixture()
def table(spark):
    base = tempfile.mkdtemp(prefix="rowpol_")
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                          key_col="key", ts_col="ts_us",
                          token_bloom_cols=("text",),
                          set_index_cols=(("tenant", 8),),
                          snapshot_retention=4)
    t = SparkMergeTree(spark, base, schema=SCHEMA, config=cfg)
    t.insert_rows(ROWS[:2])
    t.flush()
    t.insert_rows(ROWS[2:])
    t.flush()
    yield t
    t.close()
    shutil.rmtree(base, ignore_errors=True)


def _keys(df):
    return sorted(r["key"] for r in df.collect())


def test_every_read_path_applies_the_policy(table):
    table.create_row_policy("acme_only", "tenant = 'acme'")
    assert _keys(table.query_all()) == [1, 2]
    assert _keys(table.query(1, 4)) == [1, 2]
    assert _keys(table.query_key(3)) == []          # policy hides key 3
    assert _keys(table.query_token("text", "zebra")) == [1]
    assert _keys(table.query_in("tenant", ["acme", "globex"])) == [1, 2]
    v = table.current_version()
    assert _keys(table.query_at_version(v)) == [1, 2]


def test_policies_and_together_and_drop_restores(table):
    table.create_row_policy("acme_only", "tenant = 'acme'")
    table.create_row_policy("late_only", "ts_us >= 20")
    assert _keys(table.query_all()) == [2]
    table.drop_row_policy("acme_only")
    assert _keys(table.query_all()) == [2, 3, 4]
    table.drop_row_policy("late_only")
    assert _keys(table.query_all()) == [1, 2, 3, 4]
    with pytest.raises(KeyError):
        table.drop_row_policy("late_only")


def test_policy_persists_across_reopen(table, spark):
    table.create_row_policy("acme_only", "tenant = 'acme'")
    r = SparkMergeTree(spark, table.base_path, schema=SCHEMA,
                       config=table.config)
    assert [p["name"] for p in r.row_policies()] == ["acme_only"]
    assert _keys(r.query_all()) == [1, 2]


def test_merges_ignore_policies_storage_is_untouched(table):
    table.create_row_policy("acme_only", "tenant = 'acme'")
    table.config.max_parts = 1
    table.optimize(final=True)
    # the merged part still holds all 4 physical rows
    assert sum(p.row_count for p in table.manifest.parts) == 4
    assert _keys(table.query_all()) == [1, 2]
    table.drop_row_policy("acme_only")
    assert _keys(table.query_all()) == [1, 2, 3, 4]


def test_projection_reads_disabled_under_policy(spark):
    base = tempfile.mkdtemp(prefix="rowpol_proj_")
    spec = ProjectionSpec("by_tenant", ("tenant",),
                          {"n": ("count", "tenant")})
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                          projections=(spec,),
                          key_col="key", ts_col="ts_us")
    t = SparkMergeTree(spark, base, schema=SCHEMA, config=cfg)
    try:
        t.insert_rows(ROWS)
        t.flush()
        req = {"n": ("count", "tenant")}
        t.create_row_policy("acme_only", "tenant = 'acme'")
        with pytest.raises(ValueError, match="row policies"):
            t.query_projection("by_tenant")
        # query_grouped falls back to policy-filtered raw rows
        got = {r["tenant"]: r["n"]
               for r in t.query_grouped(("tenant",), req).collect()}
        assert got == {"acme": 2}
    finally:
        t.close()
        shutil.rmtree(base, ignore_errors=True)


def test_validation(table):
    with pytest.raises(Exception):  # unparsable predicate
        table.create_row_policy("bad", "tenant === ")
    table.create_row_policy("p1", "key > 0")
    with pytest.raises(ValueError, match="already exists"):
        table.create_row_policy("p1", "key > 1")


def test_drop_and_rename_refuse_policy_referenced_columns(spark):
    base = tempfile.mkdtemp(prefix="rowpol_dep_")
    t = SparkMergeTree(  # no indexes: tenant is NOT structural here
        spark, base, schema=SCHEMA,
        config=MergeTreeConfig(memtable_flush_threshold=10**12,
                               max_parts=100,
                               key_col="key", ts_col="ts_us"))
    try:
        t.insert_rows(ROWS)
        t.flush()
        t.create_row_policy("acme_only", "tenant = 'acme'")
        with pytest.raises(ValueError, match="row policy 'acme_only'"):
            t.drop_column("tenant")
        with pytest.raises(ValueError, match="row policy 'acme_only'"):
            t.rename_column("tenant", "org")
        t.drop_row_policy("acme_only")
        t.rename_column("tenant", "org")  # now fine
    finally:
        t.close()
        shutil.rmtree(base, ignore_errors=True)
