"""Streaming ↔ engine integration (SURVEY §7.1 M4) and stream/batch equivalence.

The oracle-parity suite already hash-checks E26–E29 against DuckDB; here we
exercise what SQL can't: foreachBatch as the streaming insert path into
SparkMergeTree, and watermark state eviction behavior.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F


def test_foreachbatch_streaming_insert(spark, sf_dir):
    """readStream → foreachBatch → SparkMergeTree.insert_batch: the engine's
    memtable is fed by micro-batches; after the bounded replay drains, the
    engine's content equals the batch dedup of the source (SURVEY M4)."""
    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree
    from clickhouse_mergetree_spark.streaming import read_events_stream
    from clickhouse_mergetree_spark.tables import load

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("key", T.LongType()),
        T.StructField("ts_us", T.LongType()),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=2000, max_parts=3,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, tempfile.mkdtemp(prefix="stream_ingest_"),
                           schema=schema, config=cfg)

    stream = read_events_stream(spark, sf_dir).select(
        F.col("user_id").alias("key"),
        F.unix_micros("ts").alias("ts_us"),
    )

    def feed(batch_df, _batch_id):
        table.insert_batch(batch_df)

    q = (
        stream.writeStream.foreachBatch(feed)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    table.flush()

    got = table.query_all().count()
    want = (
        load(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts"))
        .distinct()
        .count()
    )
    assert got == want
    assert table.part_count() >= 1
    table.close()


def test_streaming_ingest_maintains_matview(spark, sf_dir):
    """readStream → foreachBatch → source table with an attached
    MaterializedView: the rollup accumulates per micro-batch and, after
    the replay drains, equals the one-shot batch aggregate — streaming
    ingest and incremental view maintenance composed end-to-end."""
    from clickhouse_mergetree_spark.engine import (
        MaterializedView, MergeTreeConfig, SparkMergeTree)
    from clickhouse_mergetree_spark.streaming import read_events_stream
    from clickhouse_mergetree_spark.tables import load

    from pyspark.sql import types as T

    src_schema = T.StructType([
        T.StructField("key", T.LongType()),
        T.StructField("ts_us", T.LongType()),
    ])
    mv_schema = T.StructType([
        T.StructField("key", T.LongType()),
        T.StructField("zero", T.LongType()),
        T.StructField("n", T.LongType()),
    ])
    src = SparkMergeTree(
        spark, tempfile.mkdtemp(prefix="stream_mv_src_"), schema=src_schema,
        config=MergeTreeConfig(memtable_flush_threshold=10**9,
                               key_col="key", ts_col="ts_us"))
    mv = MaterializedView(
        SparkMergeTree(
            spark, tempfile.mkdtemp(prefix="stream_mv_tgt_"),
            schema=mv_schema,
            config=MergeTreeConfig(memtable_flush_threshold=10**9,
                                   mode="summing",
                                   key_col="key", ts_col="zero")),
        lambda df: df.groupBy("key").agg(
            F.lit(0).cast("long").alias("zero"),
            F.count("*").alias("n")).select("key", "zero", "n"))
    src.attach_view(mv)

    stream = read_events_stream(spark, sf_dir).select(
        F.col("user_id").alias("key"),
        F.unix_micros("ts").alias("ts_us"),
    )
    q = (
        stream.writeStream
        .foreachBatch(lambda batch_df, _id: src.insert_batch(batch_df))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_mv_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    mv.flush()

    got = {r["key"]: r["n"] for r in mv.query().collect()}
    want = {
        r["user_id"]: r["count"]
        for r in load(spark, sf_dir, "events").groupBy("user_id")
        .count().collect()
    }
    assert got == want
    src.close()
    mv.close()


def test_stream_batch_equivalence_tumbling(spark, sf_dir):
    """E26 streaming result == batch recomputation on the same input."""
    from clickhouse_mergetree_spark.registry import all_queries

    qs = all_queries()
    s = qs["q_stream_tumbling"].fn(spark, sf_dir)
    b = qs["q_window_tumbling"].fn(spark, sf_dir)
    cols = ["window_start", "event_type"]
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, b.collect()))


def test_watermark_withholds_trailing_windows(spark, sf_dir):
    """E28: append mode must emit strictly fewer windows than the complete
    aggregation — the trailing ones inside the watermark delay stay open."""
    from clickhouse_mergetree_spark.registry import all_queries
    from clickhouse_mergetree_spark.tables import load

    emitted = all_queries()["q_stream_watermark"].fn(spark, sf_dir)
    all_windows = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"))
        .count()
    )
    n_emitted, n_all = emitted.count(), all_windows.count()
    assert 0 < n_emitted < n_all
