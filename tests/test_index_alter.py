"""ALTER TABLE ADD INDEX / MATERIALIZE INDEX (ClickHouse DDL analog).

ADD INDEX is a metadata-only commit: parts written before it carry no
index metadata, and "no metadata" means "no claim" — probes scan those
parts, so correctness never depends on the backfill. MATERIALIZE INDEX
then backfills live parts (one bounded scan each), is idempotent, and
the DDL survives reopen with the original index-less config. These
tests pin that split for every index kind (tokenbf / ngrambf / minmax /
set), the validation errors, and that parts written AFTER the ADD index
themselves at write time with no materialize step.
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
    T.StructField("tag", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("text", T.StringType(), True),
])


def _cfg() -> MergeTreeConfig:
    return MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                           key_col="key", ts_col="ts_us")


def _row(k: int, tag: str, score: float, text: str):
    return (k, k * 10, tag, score, text)


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="idx_alter_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _three_parts(spark, base) -> SparkMergeTree:
    """Three banded parts: 'needle zebra' text only in part 1, tag 'hot'
    only in part 1, score ranges disjoint per part."""
    t = SparkMergeTree(spark, base, schema=SCHEMA, config=_cfg())
    bands = [
        [(1, "hot", 1.0, "alpha needle zebra beta"),
         (2, "hot", 2.0, "gamma delta")],
        [(3, "cold", 10.0, "epsilon zeta"), (4, "cold", 11.0, "eta theta")],
        [(5, "warm", 20.0, "iota kappa"), (6, "warm", 21.0, "mu nu")],
    ]
    for band in bands:
        t.insert_rows([_row(*r) for r in band])
        t.flush()
    assert t.part_count() == 3
    return t


def test_add_index_is_metadata_only_then_materialize_prunes(spark, base):
    t = _three_parts(spark, base)
    t.add_index("text", "tokenbf")
    # metadata-only: no part carries the bloom, probe scans all 3
    assert all(not (p.token_blooms or {}) for p in t.manifest.parts)
    assert len(t.parts_for_token("text", "zebra")) == 3
    stats = t.materialize_index("text")
    assert stats == {"parts_indexed": 3, "parts_skipped": 0}
    assert len(t.parts_for_token("text", "zebra")) == 1
    rows = t.query_token("text", "zebra").collect()
    assert [r["key"] for r in rows] == [1]
    # idempotent
    assert t.materialize_index("text") == {"parts_indexed": 0,
                                           "parts_skipped": 3}


def test_minmax_and_set_backfill(spark, base):
    t = _three_parts(spark, base)
    t.add_index("score", "minmax")
    t.add_index("tag", "set", n=8)
    stats = t.materialize_index()
    assert stats["parts_indexed"] == 3
    # minmax: score range [10,11] lives in exactly one part
    assert len(t.parts_for_col_range("score", 10.0, 11.5)) == 1
    assert sorted(r["key"] for r in
                  t.query_col_range("score", 10.0, 11.5).collect()) == [3, 4]
    # set: tag equality prunes to one part
    assert len(t.parts_for_in("tag", ["hot"])) == 1
    assert sorted(r["key"] for r in
                  t.query_in("tag", ["hot"]).collect()) == [1, 2]


def test_new_parts_index_at_write_time(spark, base):
    t = _three_parts(spark, base)
    t.add_index("text", "tokenbf")
    t.insert_rows([_row(7, "new", 30.0, "omicron needle zebra")])
    t.flush()  # written AFTER the ADD → indexes itself
    t.wait_for_index_builds()  # write-path builds attach deferred (r14)
    new_part = t.manifest.parts[-1]
    assert "text" in (new_part.token_blooms or {})
    # the 3 pre-ALTER parts make no claim (scan) + the new part matches
    assert len(t.parts_for_token("text", "zebra")) == 4
    t.materialize_index("text")
    assert len(t.parts_for_token("text", "zebra")) == 2


def test_ddl_survives_reopen_and_merge(spark, base):
    t = _three_parts(spark, base)
    t.add_index("text", "ngrambf")
    t.materialize_index()
    assert len(t.parts_for_like("text", "le zeb")) == 1
    # reopen with the ORIGINAL config: index DDL replays from the manifest
    r = SparkMergeTree(spark, base, schema=SCHEMA, config=_cfg())
    assert r.config.ngram_bloom_cols == ("text",)
    assert len(r.parts_for_like("text", "le zeb")) == 1
    # a merge rewrite refreshes the index on the merged part for free
    r.optimize(final=True)
    r.wait_for_index_builds()  # write-path builds attach deferred (r14)
    assert all("text" in (p.ngram_blooms or {}) for p in r.manifest.parts)
    rows = r.query_like("text", "le zeb").collect()
    assert [x["key"] for x in rows] == [1]


def test_validation_errors(spark, base):
    t = _three_parts(spark, base)
    with pytest.raises(ValueError, match="unknown column"):
        t.add_index("nope", "tokenbf")
    with pytest.raises(ValueError, match="unknown index kind"):
        t.add_index("text", "btree")
    t.add_index("text", "tokenbf")
    with pytest.raises(ValueError, match="already exists"):
        t.add_index("text", "tokenbf")
    # same column, different kind is fine
    t.add_index("text", "ngrambf")


def test_set_overflow_stores_no_claim(spark, base):
    t = _three_parts(spark, base)
    t.add_index("tag", "set", n=1)  # every part has 2 distinct? no: 1 each
    t.materialize_index("tag")
    # each part holds exactly one distinct tag → fits n=1, prunes
    assert len(t.parts_for_in("tag", ["warm"])) == 1
    # a column with per-part cardinality above n stores None → no claim
    t2_base = tempfile.mkdtemp(prefix="idx_alter2_")
    try:
        t2 = SparkMergeTree(spark, t2_base, schema=SCHEMA, config=_cfg())
        t2.insert_rows([_row(1, "a", 1.0, "x"), _row(2, "b", 2.0, "y")])
        t2.flush()
        t2.add_index("tag", "set", n=1)
        t2.materialize_index("tag")
        assert t2.manifest.parts[0].col_sets["tag"] is None
        assert len(t2.parts_for_in("tag", ["zzz"])) == 1  # scans, no claim
        t2.close()
    finally:
        shutil.rmtree(t2_base, ignore_errors=True)


def test_drop_index_unregisters_and_frees_the_column(spark, base):
    t = _three_parts(spark, base)
    t.add_index("text", "tokenbf")
    t.materialize_index("text")
    assert len(t.parts_for_token("text", "zebra")) == 1
    t.drop_index("text", "tokenbf")
    # stale per-part claims remain TRUE, so old parts still prune
    assert len(t.parts_for_token("text", "zebra")) == 1
    # new parts stop building the bloom
    t.insert_rows([_row(9, "x", 50.0, "omega")])
    t.flush()
    assert "text" not in (t.manifest.parts[-1].token_blooms or {})
    # the column is no longer structural: droppable again
    t.drop_column("text")
    with pytest.raises(KeyError):
        t.drop_index("text", "tokenbf")
    # DDL removal survives reopen
    r = SparkMergeTree(spark, base, schema=SCHEMA, config=_cfg())
    assert r.config.token_bloom_cols == ()
