"""SparkMergeTree demo — mirrors the reference's examples/demo.cpp scenarios
(test_basic_operations, test_memtable_flush, test_merge_operations,
test_performance, test_persistence) on the Spark engine.

Run: python examples/demo.py     (writes under a temp dir, cleans up)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree
from clickhouse_mergetree_spark.session import get_spark


def test_basic_operations(spark, root):
    print("=== Testing Basic Operations ===")
    cfg = MergeTreeConfig(memtable_flush_threshold=100, max_parts=5)
    with SparkMergeTree(spark, f"{root}/test_basic", config=cfg) as engine:
        print("Inserting test data...")
        engine.insert("key1", "value1", 1000)
        engine.insert("key2", "value2", 2000)
        engine.insert("key3", "value3", 3000)
        engine.insert("key1", "updated_value1", 4000)

        print("Querying single key...")
        rows = engine.query_key("key1").collect()
        print(f"Found {len(rows)} entries for key1")
        for r in rows:
            print(f"  {r.key} -> {r.value} (ts: {r.timestamp})")

        print("Querying range...")
        rng = engine.query("key1", "key3").collect()
        print(f"Found {len(rng)} entries in range [key1, key3]")
    print("Basic operations test completed successfully!\n")


def test_memtable_flush(spark, root):
    print("=== Testing Memtable Flush ===")
    cfg = MergeTreeConfig(memtable_flush_threshold=10)
    engine = SparkMergeTree(spark, f"{root}/test_flush", config=cfg)
    print("Inserting data to trigger flush...")
    for i in range(25):
        engine.insert(f"key{i}", f"value{i}", i * 1000)
    print(f"Parts after inserts: {engine.part_count()}")
    print(f"Total rows: {engine.total_rows()}")
    engine.flush()
    print(f"Parts after manual flush: {engine.part_count()}")
    engine.close()
    print("Memtable flush test completed successfully!\n")


def test_merge_operations(spark, root):
    print("=== Testing Merge Operations ===")
    cfg = MergeTreeConfig(memtable_flush_threshold=20, max_parts=3)
    engine = SparkMergeTree(spark, f"{root}/test_merge", config=cfg)
    print("Creating multiple parts...")
    for batch in range(10):
        engine.insert_rows([
            (f"batch{batch}_key{i}", f"value_{batch}_{i}", batch * 1000 + i)
            for i in range(25)
        ])
    print(f"Parts before merge: {engine.part_count()}")
    print(f"Total rows before merge: {engine.total_rows()}")
    engine.optimize()
    print(f"Parts after optimization: {engine.part_count()}")
    print(f"Total rows after merge: {engine.total_rows()}")
    n = engine.query("batch0", "batch2").count()
    print(f"Query results from merged data: {n} rows")
    engine.close()
    print("Merge operations test completed successfully!\n")


def test_performance(spark, root):
    print("=== Performance Test ===")
    from bench_workload_a import run_workload_a

    out = run_workload_a(spark)
    rate = 50_000 / out["insert_sec"]
    print(f"Insert performance: 50000 rows in {out['insert_sec']*1000:.0f} ms "
          f"({rate:.0f} rows/sec) across {out['parts_after_insert']:.0f} parts")
    print(f"Optimize: {out['optimize_sec']:.2f} s "
          f"-> {out['parts_after_optimize']:.0f} parts")
    print(f"Query performance: {out['range_scan_rows']:.0f} results in "
          f"{out['range_scan_sec']*1e6:.0f} us")
    print("Performance test completed successfully!\n")


def test_persistence(spark, root):
    print("=== Testing Persistence ===")
    path = f"{root}/test_persistence"
    print("Creating engine and inserting data...")
    engine = SparkMergeTree(spark, path)
    engine.insert_rows([
        (f"persistent_key{i}", f"persistent_value{i}", i * 1000)
        for i in range(100)
    ])
    engine.flush()
    print(f"Data written, parts: {engine.part_count()}")
    engine.close()

    print("Recreating engine and loading existing data...")
    engine = SparkMergeTree(spark, path)
    print(f"Loaded parts: {engine.part_count()}")
    print(f"Total rows: {engine.total_rows()}")
    rows = engine.query("persistent_key50", "persistent_key60").collect()
    print(f"Query results from persistent data: {len(rows)} rows")
    for r in rows[:3]:
        print(f"  {r.key} -> {r.value}")
    engine.close()
    print("Persistence test completed successfully!\n")


def test_connector(spark, root):
    """Beyond the reference: the table as a first-class Spark source/sink."""
    print("=== Testing Data Source Connector ===")
    from pyspark.sql import functions as F

    from clickhouse_mergetree_spark.sources import register_mergetree

    register_mergetree(spark)
    path = f"{root}/test_connector"
    df = spark.createDataFrame(
        [(f"key_{i:03d}", f"value{i}", i) for i in range(500)],
        "key string, value string, timestamp long")
    print("Writing one part via df.write.format('mergetree')...")
    df.repartition(2).write.format("mergetree").option(
        "path", path).mode("append").save()

    back = spark.read.format("mergetree").option("path", path).load()
    print(f"Read back {back.count()} rows")
    n = back.filter(
        (F.col("key") >= "key_100") & (F.col("key") <= "key_199")).count()
    print(f"Pushdown-pruned range read: {n} rows")

    engine = SparkMergeTree(spark, path)
    print(f"Engine opened the same table: {engine.part_count()} part(s), "
          f"{engine.total_rows()} rows")
    engine.close()
    print("Connector test completed successfully!\n")


def test_table_management(spark, root):
    """Round-4 surface: PARTITION BY + DROP PARTITION, TTL expiry,
    summing/collapsing modes, a materialized view, and time travel."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MaterializedView, MergeTreeConfig, SparkMergeTree)

    print("=== Table management (partitions / TTL / modes / MV) ===")
    schema = T.StructType([
        T.StructField("key", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("category", T.StringType(), True),
        T.StructField("amount", T.LongType(), True),
    ])
    path = os.path.join(root, "managed")
    cfg = MergeTreeConfig(memtable_flush_threshold=10**9, max_parts=4,
                          partition_col="category", snapshot_retention=4,
                          key_col="key", ts_col="ts")
    t = SparkMergeTree(spark, path, schema=schema, config=cfg)
    t.insert_rows([(f"k{i}", i, "hot" if i % 2 else "cold", i * 10)
                   for i in range(100)])
    t.flush()
    print(f"Partitions after flush: {t.partitions()}")
    v1 = t.current_version()
    removed = t.drop_partition("cold")
    print(f"DROP PARTITION 'cold' removed {removed} rows (metadata-only)")
    print(f"Live rows now: {t.query_all().count()}")
    print(f"Time travel to v{v1}: "
          f"{t.query_at_version(v1).count()} rows (pre-drop)")
    expired = t.expire(before_ts=50)
    print(f"TTL expire(ts<50): {expired}")
    t.close()

    # summing-mode rollup maintained by a materialized view
    mv_schema = T.StructType([
        T.StructField("category", T.StringType(), False),
        T.StructField("zero", T.LongType(), False),
        T.StructField("total", T.LongType(), True),
    ])
    src = SparkMergeTree(spark, os.path.join(root, "mv_src"), schema=schema,
                         config=MergeTreeConfig(memtable_flush_threshold=10**9,
                                                key_col="key", ts_col="ts"))
    mv = MaterializedView(
        SparkMergeTree(
            spark, os.path.join(root, "mv_tgt"), schema=mv_schema,
            config=MergeTreeConfig(memtable_flush_threshold=10**9,
                                   mode="summing", key_col="category",
                                   ts_col="zero")),
        lambda df: df.groupBy("category").agg(
            F.lit(0).cast("long").alias("zero"),
            F.sum("amount").alias("total")).select("category", "zero", "total"))
    src.attach_view(mv)
    for batch in range(3):
        src.insert_rows([(f"b{batch}_{i}", i, "hot" if i % 2 else "cold",
                          i) for i in range(50)])
    mv.flush()
    print("MV rollup (3 incremental blocks, finalized read):")
    for r in mv.query().collect():
        print(f"  {r['category']}: {r['total']}")
    src.close()
    mv.close()
    print("Table management demo completed successfully!\n")


def test_ddl_and_indexes(spark, root):
    """Round-4 surface (continued): mutations, ADD COLUMN evolution,
    projections with query routing, and the token-bloom text index."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MergeTreeConfig, ProjectionSpec, SparkMergeTree)

    print("=== DDL & indexes (mutations / evolution / projections / token bloom) ===")
    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("category", T.StringType(), True),
        T.StructField("amount", T.DecimalType(18, 2), True),
        T.StructField("note", T.StringType(), True),
    ])
    spec = ProjectionSpec("by_category", ("category",),
                          {"total": ("sum", "amount"), "n": ("count", "amount")})
    cfg = MergeTreeConfig(memtable_flush_threshold=10**9, max_parts=4,
                          projections=(spec,), token_bloom_cols=("note",),
                          key_col="key", ts_col="ts")
    t = SparkMergeTree(spark, os.path.join(root, "ddl"), schema=schema,
                       config=cfg)
    from decimal import Decimal
    t.insert_rows([(i, i, "hot" if i % 2 else "cold", Decimal(i),
                    f"order {i} {'URGENT-review' if i % 17 == 0 else 'routine'}")
                   for i in range(120)])
    t.flush()

    # ALTER ... DELETE with a pruning hint, then ALTER ... UPDATE
    r = t.delete_where(F.col("key") >= 100, key_range=(100, 10**9))
    print(f"DELETE key>=100: {r}")
    r = t.update_where(F.col("category") == "cold",
                       {"amount": F.col("amount") * 2})
    print(f"UPDATE cold amounts x2: {r}")

    # metadata-only ADD COLUMN; old rows read the default lazily
    t.add_column("source", "string", default="backfill")
    t.insert_rows([(500, 500, "hot", Decimal(5), "fresh row", "live")])
    t.flush()
    srcs = {row["source"] for row in t.query_all().collect()}
    print(f"ADD COLUMN source: distinct values after evolution = {sorted(srcs)}")

    # projection routing: the grouped read never opens raw part files
    req = {"total": ("sum", "amount"), "n": ("count", "amount")}
    print(f"query_grouped routes to: {t.routed_projection(('category',), req)}")
    for row in t.query_grouped(("category",), req).collect():
        print(f"  {row['category']}: total={row['total']} n={row['n']}")

    # token-bloom text search: parts without the token are never opened
    scanned = t.parts_for_token("note", "urgent")
    print(f"token 'urgent': scanning {len(scanned)}/{t.part_count()} parts, "
          f"{t.query_token('note', 'urgent').count()} rows")
    t.close()
    print("DDL & index demo completed successfully!\n")


def main():
    print("ClickHouse MergeTree (Spark) Implementation Demo")
    print("=========================================\n")
    spark = get_spark("demo", cpus=8)
    root = tempfile.mkdtemp(prefix="mergetree_demo_")
    t0 = time.perf_counter()
    try:
        test_basic_operations(spark, root)
        test_memtable_flush(spark, root)
        test_merge_operations(spark, root)
        test_performance(spark, root)
        test_persistence(spark, root)
        test_connector(spark, root)
        test_table_management(spark, root)
        test_ddl_and_indexes(spark, root)
        print(f"All demos completed in {time.perf_counter()-t0:.1f} s")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
