"""ShardedMergeTree — the ClickHouse Distributed-engine analog.

Pins: hash routing puts every (key, ts) version group wholly in one
shard (shard-local collapse == global collapse), point lookups touch
exactly one shard, per-shard maintenance (flush/optimize/TTL) composes
to the table-level result, reopen recovers every shard, and the sharded
read equals the unsharded table's read on identical input.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import (MergeTreeConfig,
                                               ShardedMergeTree,
                                               SparkMergeTree)

SCHEMA = T.StructType([
    T.StructField("key", T.LongType(), False),
    T.StructField("ts", T.LongType(), False),
    T.StructField("v", T.DoubleType(), True),
])

CFG = dict(memtable_flush_threshold=10**9, max_parts=3,
           key_col="key", ts_col="ts")

ROWS = [(k, ts, float(k * 10 + ts)) for k in range(40) for ts in range(3)]


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="sharded_tbl_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_sharded_read_equals_unsharded(spark, base):
    with ShardedMergeTree(spark, base + "/s", n_shards=4, schema=SCHEMA,
                          config=MergeTreeConfig(**CFG)) as st, \
         SparkMergeTree(spark, base + "/u", schema=SCHEMA,
                        config=MergeTreeConfig(**CFG)) as ut:
        st.insert_rows(ROWS)
        ut.insert_rows(ROWS)
        st.flush()
        ut.flush()
        got = sorted(map(tuple, st.query_all().collect()))
        want = sorted(map(tuple, ut.query_all().collect()))
        assert got == want and len(got) == len(ROWS)
        # range scans agree too
        g = sorted(map(tuple, st.query(5, 15).collect()))
        w = sorted(map(tuple, ut.query(5, 15).collect()))
        assert g == w and g


def test_version_groups_never_span_shards(spark, base):
    with ShardedMergeTree(spark, base, n_shards=4, schema=SCHEMA,
                          config=MergeTreeConfig(**CFG)) as st:
        st.insert_rows([(k, 1, 1.0) for k in range(40)])
        st.flush()
        # re-insert the same (key, ts) with new values: dedup must hide
        # one copy, which requires the duplicate to land in the SAME shard
        st.insert_rows([(k, 1, 2.0) for k in range(40)])
        st.flush()
        assert st.query_all().count() == 40
        assert st.total_rows() == 80   # physical copies before merges
        st.optimize(final=True)
        assert st.total_rows() == 40   # per-shard merges collapsed them
        assert st.query_all().count() == 40


def test_point_lookup_touches_one_shard(spark, base):
    with ShardedMergeTree(spark, base, n_shards=4, schema=SCHEMA,
                          config=MergeTreeConfig(**CFG)) as st:
        st.insert_rows(ROWS)
        st.flush()
        i = st.shard_of(7)
        assert 0 <= i < 4
        # the routed shard holds the key; every other shard does not
        assert st.shards[i].query_key(7).count() == 3
        for j, s in enumerate(st.shards):
            if j != i:
                assert s.query_key(7).count() == 0
        assert st.query_key(7).count() == 3


def test_shard_maintenance_and_reopen(spark, base):
    st = ShardedMergeTree(spark, base, n_shards=3, schema=SCHEMA,
                          config=MergeTreeConfig(**CFG))
    st.insert_rows(ROWS)
    st.flush()
    stats = st.shard_stats()
    assert sum(x["rows"] for x in stats) == len(ROWS)
    assert all(x["rows"] > 0 for x in stats)   # hash spreads the keys
    r = st.expire(2)                            # drop ts < 2 everywhere
    assert r["rows_removed"] == 80
    assert st.query_all().count() == 40
    st.close()
    st2 = ShardedMergeTree(spark, base, n_shards=3, schema=SCHEMA,
                           config=MergeTreeConfig(**CFG))
    assert st2.query_all().count() == 40
    assert st2.query_key(7).count() == 1
    st2.close()


def test_query_in_global_semi_join_semantics(spark, base):
    with ShardedMergeTree(spark, base, n_shards=4, schema=SCHEMA,
                          config=MergeTreeConfig(**CFG)) as st:
        st.insert_rows(ROWS)
        st.flush()
        from pyspark.sql import functions as F
        # membership set computed over the WHOLE table (the GLOBAL
        # contract): keys with v-sum above 60 — spans shards
        keys = (st.query_all().groupBy("key")
                .agg(F.sum("v").alias("s")).filter(F.col("s") > 60)
                .select("key"))
        expect = {r["key"] for r in keys.collect()}
        assert 0 < len(expect) < 40
        got = st.query_in_global(keys, ["key"])
        assert {r["key"] for r in got.collect()} == expect
        assert got.count() == 3 * len(expect)  # 3 ts rows per key, never
        # multiplied: duplicate membership rows must not fan out
        dup = keys.unionAll(keys)
        assert st.query_in_global(dup, ["key"]).count() == 3 * len(expect)
