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


def test_watermark_drops_late_rows_across_micro_batches(spark, tmp_path):
    """r10: the declared streaming queries replay the corpus in ONE data
    micro-batch (deterministic results, the driver contract), which means
    the watermark never advances MID-replay — so this test proves the
    cross-batch semantics separately: with maxFilesPerTrigger=1 each file
    is its own micro-batch, the watermark advances between batches, the
    expired window's state is evicted, and a genuinely-late row arriving
    in a later batch is dropped instead of resurrecting the window."""
    import datetime
    import os

    from clickhouse_mergetree_spark.streaming.streams import run_to_memory

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "k string, ts timestamp"

    def write_one(name: str, rows, mtime: int) -> None:
        d = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = os.path.join(src, name + ".parquet")
        os.rename(os.path.join(d, part), dst)
        # file-source pickup order is oldest-mtime-first: pin it
        os.utime(dst, (mtime, mtime))

    def ts(h: int, m: int = 0) -> datetime.datetime:
        return datetime.datetime(2024, 1, 1, h, m)

    # Empirically-pinned Spark semantics (probed on 4.1): a late row is
    # dropped only once its window was EVICTED in a PRIOR batch — if the
    # watermark first passes the window's end in the same batch the late
    # row arrives, the row still merges before eviction. So the late
    # arrival is staged TWO batches after its window's data:
    # batch 0: rows at 10:00 and 12:00 (wm 0 during the batch)
    write_one("b1", [("a", ts(10)), ("a", ts(12))], 1_700_000_000)
    # batch 1: wm = 11:30 -> window [10,11) emits (n=1) and is evicted
    write_one("b2", [("a", ts(14))], 1_700_000_100)
    # batch 2: wm = 13:30 -> the 10:05 row's window is long gone: the
    # row is dropped (numRowsDroppedByWatermark=1 in the probe) and
    # [12,13) emits; the 15:00 row keeps its own window open
    write_one("b3", [("a", ts(10, 5)), ("a", ts(15))], 1_700_000_200)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    agg = (stream.withWatermark("ts", "30 minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count("*").alias("n")))
    out = run_to_memory(agg, "append")
    got = {r["w"]["start"].hour: r["n"] for r in out.collect()}
    # [10,11): 1 — would read 2 if the late 10:05 row leaked back in;
    # [12,13): 1; [14,15) and [15,16) unemitted (past the final wm)
    assert got == {10: 1, 12: 1}
