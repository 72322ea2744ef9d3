"""Projection suite (ClickHouse PROJECTION analog — extension).

Partial-combining exactness, projection-only scans (inputFiles), routing
(smallest covering projection / fallback to raw), lifecycle consistency
across merge + mutation + TTL, buffered-row inclusion, and the
non-materialized-part raw fallback.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import (
    MergeTreeConfig,
    ProjectionSpec,
    SparkMergeTree,
)

SCHEMA = T.StructType([
    T.StructField("key", T.LongType(), False),
    T.StructField("ts_us", T.LongType(), False),
    T.StructField("cat", T.StringType(), True),
    T.StructField("value", T.DecimalType(18, 6), True),
])

SPEC = ProjectionSpec("by_key_cat", ("key", "cat"),
                      {"value_sum": ("sum", "value"),
                       "n": ("count", "value"),
                       "v_min": ("min", "value"),
                       "v_max": ("max", "value")})


@pytest.fixture()
def table(spark, tmp_path):
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          projections=(SPEC,),
                          key_col="key", ts_col="ts_us")
    t = SparkMergeTree(spark, str(tmp_path / "t"), schema=SCHEMA, config=cfg)
    rows = [(k % 7, 1000 + k, "ab"[k % 2], Decimal(k)) for k in range(300)]
    for i in range(3):
        t.insert_rows(rows[i * 100:(i + 1) * 100])
        t.flush()
    yield t
    t.close()


def _raw_rollup(t, *gb):
    return {
        tuple(r[c] for c in gb): (r["s"], r["n"], r["mn"], r["mx"])
        for r in t.query_all().groupBy(*gb).agg(
            F.sum("value").cast("decimal(18,6)").alias("s"),
            F.count("*").alias("n"),
            F.min("value").alias("mn"), F.max("value").alias("mx")).collect()
    }


def _proj_rollup(df, *gb):
    return {
        tuple(r[c] for c in gb):
        (r["value_sum"], r["n"], r["v_min"], r["v_max"])
        for r in df.collect()
    }


def test_partials_combine_exactly(table):
    assert _proj_rollup(table.query_projection("by_key_cat"),
                        "key", "cat") == _raw_rollup(table, "key", "cat")


def test_projection_read_never_opens_raw_parts(table):
    files = table.query_projection("by_key_cat").inputFiles()
    assert files and all("_proj_by_key_cat" in f for f in files)


def test_subset_group_by_reaggregates(table):
    got = {r["key"]: r["value_sum"] for r in
           table.query_projection("by_key_cat", ("key",)).collect()}
    want = {}
    for (k, _c), (s, _n, _mn, _mx) in _raw_rollup(table, "key", "cat").items():
        want[k] = want.get(k, Decimal(0)) + s
    assert got == want


def test_uncovered_group_by_rejected(table):
    with pytest.raises(ValueError, match="not covered"):
        table.query_projection("by_key_cat", ("ts_us",))
    with pytest.raises(KeyError):
        table.query_projection("nope")


def test_routing_picks_covering_projection(table):
    req = {"value_sum": ("sum", "value")}
    assert table.routed_projection(("key", "cat"), req) == "by_key_cat"
    assert table.routed_projection(("key",), req) == "by_key_cat"
    # uncovered grouping or differently-defined agg → raw fallback
    assert table.routed_projection(("ts_us",), req) is None
    assert table.routed_projection(("key",), {"value_sum": ("max", "value")}) \
        is None


def test_query_grouped_matches_raw_on_both_paths(table):
    req = {"value_sum": ("sum", "value"), "n": ("count", "value")}
    routed = {r["key"]: (r["value_sum"], r["n"])
              for r in table.query_grouped(("key",), req).collect()}
    # raw fallback path: group by a column not covered by the projection
    fb = table.query_grouped(("cat",), {"v2": ("sum", "value")})
    want_fb = {r["cat"]: r["s"] for r in table.query_all().groupBy("cat")
               .agg(F.sum("value").cast("decimal(18,6)").alias("s")).collect()}
    got_fb = {r["cat"]: r["v2"] for r in fb.collect()}
    assert got_fb == want_fb
    want_routed = {}
    for (k, _c), (s, n, _mn, _mx) in _raw_rollup(table, "key", "cat").items():
        ps, pn = want_routed.get(k, (Decimal(0), 0))
        want_routed[k] = (ps + s, pn + n)
    assert routed == want_routed


def test_merge_rebuilds_projection(table):
    before = _proj_rollup(table.query_projection("by_key_cat"), "key", "cat")
    table.config.max_parts = 1
    table.optimize()
    assert table.part_count() == 1
    assert _proj_rollup(table.query_projection("by_key_cat"),
                        "key", "cat") == before
    # still projection-only
    files = table.query_projection("by_key_cat").inputFiles()
    assert all("_proj_by_key_cat" in f for f in files)


def test_mutation_rewrites_projection(table):
    table.delete_where(F.col("cat") == "a")
    assert {r["cat"] for r in
            table.query_projection("by_key_cat").collect()} == {"b"}
    assert _proj_rollup(table.query_projection("by_key_cat"),
                        "key", "cat") == _raw_rollup(table, "key", "cat")


def test_buffered_rows_included_on_the_fly(table):
    table.insert_rows([(50, 9999, "z", Decimal(5))])
    got = _proj_rollup(table.query_projection("by_key_cat"), "key", "cat")
    assert got[(50, "z")] == (Decimal(5), 1, Decimal(5), Decimal(5))


def test_part_without_materialized_projection_falls_back_to_raw(table, spark):
    # simulate a part written before the projection existed
    victim = table.manifest.parts[0]
    import shutil
    shutil.rmtree(victim.proj_paths["by_key_cat"])
    victim.proj_paths = None
    assert _proj_rollup(table.query_projection("by_key_cat"),
                        "key", "cat") == _raw_rollup(table, "key", "cat")


def test_delete_part_dirs_removes_projections(table, tmp_path):
    import os
    proj_dirs = [p.proj_paths["by_key_cat"] for p in table.manifest.parts]
    assert all(os.path.isdir(d) for d in proj_dirs)
    table.config.max_parts = 1
    table.optimize()
    assert not any(os.path.isdir(d) for d in proj_dirs)


def test_fallback_and_routed_paths_agree_on_duplicate_rows(spark, tmp_path):
    """ADVICE r4 medium: with duplicate (key, ts) rows across parts, the
    no-projection fallback must aggregate the same PHYSICAL multiset the
    projection-routed path aggregates — not query_all(), whose read-time
    dedup would drop the duplicate and change counts/sums by path."""
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          projections=(SPEC,),
                          key_col="key", ts_col="ts_us")
    t = SparkMergeTree(spark, str(tmp_path / "dup"), schema=SCHEMA,
                       config=cfg)
    try:
        # same (key, ts_us) row in two different parts
        t.insert_rows([(1, 100, "a", Decimal(10)), (2, 200, "b", Decimal(5))])
        t.flush()
        t.insert_rows([(1, 100, "a", Decimal(10))])
        t.flush()
        routed = {r["key"]: (r["value_sum"], r["n"]) for r in t.query_grouped(
            ("key",), {"value_sum": ("sum", "value"),
                       "n": ("count", "value")}).collect()}
        # grouping on ts_us is NOT covered by the projection -> fallback
        fb = {r["ts_us"]: (r["value_sum"], r["n"]) for r in t.query_grouped(
            ("ts_us",), {"value_sum": ("sum", "value"),
                         "n": ("count", "value")}).collect()}
        assert routed[1] == (Decimal(20), 2)   # physical: both copies
        assert fb[100] == (Decimal(20), 2)     # fallback matches physical
        assert fb[200] == (Decimal(5), 1)
    finally:
        t.close()


def test_query_grouped_empty_table_returns_typed_empty(spark, tmp_path):
    """ADVICE r4 low: a fully-empty table must yield an empty result with
    the agg output columns present and typed — not AnalysisException."""
    cfg = MergeTreeConfig(projections=(SPEC,), key_col="key", ts_col="ts_us")
    t = SparkMergeTree(spark, str(tmp_path / "empty"), schema=SCHEMA,
                       config=cfg)
    try:
        routed = t.query_grouped(("key", "cat"),
                                 {"value_sum": ("sum", "value"),
                                  "n": ("count", "value")})
        assert routed.collect() == []
        assert set(routed.columns) == {"key", "cat", "value_sum", "n"}
        fb = t.query_grouped(("ts_us",), {"n": ("count", "value")})
        assert fb.collect() == []
        assert set(fb.columns) == {"ts_us", "n"}
    finally:
        t.close()


def test_projections_refused_on_collapsing_modes(spark, tmp_path):
    """Physical-row partials cannot agree with collapsed reads; the config
    is rejected up front (ClickHouse refuses projections under FINAL)."""
    for mode in ("summing", "collapsing", "aggregating"):
        cfg = MergeTreeConfig(projections=(SPEC,), mode=mode,
                              key_col="key", ts_col="ts_us")
        with pytest.raises(ValueError, match="mode='dedup'"):
            SparkMergeTree(spark, str(tmp_path / f"m_{mode}"),
                           schema=SCHEMA, config=cfg)


# ---------------------------------------------------------------------------
# ALTER ADD / MATERIALIZE / DROP PROJECTION (retrofit on a standing table)

SPEC2 = ProjectionSpec("by_cat", ("cat",),
                       {"value_sum": ("sum", "value"),
                        "n": ("count", "value")})


@pytest.fixture()
def bare_table(spark, tmp_path):
    """Same data as `table` but built with NO projections."""
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    t = SparkMergeTree(spark, str(tmp_path / "bare"), schema=SCHEMA,
                       config=cfg)
    rows = [(k % 7, 1000 + k, "ab"[k % 2], Decimal(k)) for k in range(300)]
    for i in range(3):
        t.insert_rows(rows[i * 100:(i + 1) * 100])
        t.flush()
    yield t
    t.close()


def test_add_projection_serves_raw_until_materialized(bare_table):
    t = bare_table
    req = {"value_sum": ("sum", "value"), "n": ("count", "value")}
    t.add_projection(SPEC2)
    assert t.routed_projection(("cat",), req) == "by_cat"
    assert all(not (p.proj_paths or {}) for p in t.manifest.parts)
    pre = {r["cat"]: (r["value_sum"], r["n"])
           for r in t.query_grouped(("cat",), req).collect()}
    stats = t.materialize_projection("by_cat")
    assert stats == {"parts_built": 3, "parts_skipped": 0}
    post_df = t.query_grouped(("cat",), req)
    assert all("_proj_by_cat" in f for f in post_df.inputFiles())
    post = {r["cat"]: (r["value_sum"], r["n"]) for r in post_df.collect()}
    assert pre == post
    # idempotent
    assert t.materialize_projection("by_cat") == {"parts_built": 0,
                                                  "parts_skipped": 3}


def test_add_projection_persists_and_new_parts_build_it(bare_table, spark):
    t = bare_table
    t.add_projection(SPEC2)
    t.insert_rows([(99, 9999, "a", Decimal(5))])
    t.flush()  # post-ALTER part builds the projection at write time
    assert "by_cat" in (t.manifest.parts[-1].proj_paths or {})
    # reopen with the ORIGINAL projection-less config: DDL replays
    r = SparkMergeTree(spark, t.base_path, schema=SCHEMA,
                       config=MergeTreeConfig(
                           memtable_flush_threshold=10**12, max_parts=10,
                           key_col="key", ts_col="ts_us"))
    assert [s.name for s in r.config.projections] == ["by_cat"]
    r.materialize_projection("by_cat")
    req = {"value_sum": ("sum", "value"), "n": ("count", "value")}
    got = {x["cat"]: x["n"] for x in
           r.query_grouped(("cat",), req).collect()}
    assert got == {"a": 151, "b": 150}
    r.close()


def test_drop_projection_reclaims_files_and_reroutes(bare_table):
    t = bare_table
    req = {"value_sum": ("sum", "value"), "n": ("count", "value")}
    t.add_projection(SPEC2)
    t.materialize_projection("by_cat")
    assert t.drop_projection("by_cat") == 3
    assert t.routed_projection(("cat",), req) is None
    assert all(not (p.proj_paths or {}) for p in t.manifest.parts)
    # reads still correct through the raw path
    got = {x["cat"]: x["n"] for x in
           t.query_grouped(("cat",), req).collect()}
    assert got == {"a": 150, "b": 150}
    with pytest.raises(KeyError):
        t.drop_projection("nope")


def test_add_projection_validation(bare_table, spark, tmp_path):
    t = bare_table
    with pytest.raises(ValueError, match="unknown columns"):
        t.add_projection(ProjectionSpec("bad", ("nope",),
                                        {"n": ("count", "value")}))
    t.add_projection(SPEC2)
    with pytest.raises(ValueError, match="already exists"):
        t.add_projection(SPEC2)
    # collapsing-family tables refuse ADD PROJECTION outright
    s = SparkMergeTree(
        spark, str(tmp_path / "summing"),
        schema=SCHEMA,
        config=MergeTreeConfig(memtable_flush_threshold=10**12,
                               mode="summing",
                               key_col="key", ts_col="ts_us"))
    with pytest.raises(ValueError, match="mode='dedup'"):
        s.add_projection(SPEC2)
    s.close()
