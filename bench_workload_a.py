"""Workload A — the reference-shaped engine benchmark (BASELINE.md).

Mirrors examples/demo.cpp:100-153 (test_performance): 50k rows over 10k
keys (≈5 versions each) through the SparkMergeTree write path in
threshold-sized batches, a full optimize() pass, then a range scan over
~10% of the keyspace. Rows are generated JVM-side with spark.range — no
driver-side row loop, so the timing measures the engine, not createDataFrame.
"""

from __future__ import annotations

import shutil
from clickhouse_mergetree_spark.scratch import scratch_dir
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

NUM_ROWS = 50_000
NUM_KEYS = 10_000
BATCH_ROWS = 5_000  # == flush threshold → one part per batch, 10 parts

# Methodology knobs that changed across rounds (ADVICE r4: record them in
# the artifact so cross-round comparisons are explicitly flagged instead
# of silently mixing disk-vs-tmpfs scratch or bloom-on-vs-off numbers).
BLOOM_INDEX = False  # reference's write path builds no skipping index


def methodology() -> dict[str, object]:
    from clickhouse_mergetree_spark.scratch import scratch_root

    return {"workload_a_scratch_root": scratch_root(),
            "workload_a_bloom_index": BLOOM_INDEX}


def run_workload_a(spark: SparkSession, scale: int = 1) -> dict[str, float]:
    """scale=1 is the reference-shaped baseline (50k rows / 10k keys /
    10 parts). scale=N multiplies rows, keys, and the flush threshold
    together, so the part COUNT and versions-per-key stay fixed while
    every part is N× bigger — the scaling-rehearsal shape (the range
    scan still covers ~10% of the keyspace, bounds computed from
    NUM_KEYS so they track the scale)."""
    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    num_rows = NUM_ROWS * scale
    num_keys = NUM_KEYS * scale
    batch_rows = BATCH_ROWS * scale
    base = scratch_dir("workload_a_")
    # Bloom off: this workload is the like-for-like comparison against the
    # reference's test_performance, which builds no skipping index on its
    # write path (src/part.cpp:39-65). The bloom's write-side cost (~2× on
    # 5k-row demo parts, amortized at real part sizes) is measured by the
    # engine feature queries that actually exercise it (q_point_lookup
    # pruning via q_mergetree_engine/source).
    cfg = MergeTreeConfig(memtable_flush_threshold=batch_rows, max_parts=4,
                          enable_bloom_index=BLOOM_INDEX)
    out: dict[str, float] = {}
    try:
        t = SparkMergeTree(spark, base, config=cfg)

        # %05d keeps every key the same width up to scale 10 (keys
        # 0..99999), so lexical range-scan bounds stay order-correct
        width = max(5, len(str(num_keys - 1)))
        rows = spark.range(num_rows).select(
            F.format_string(f"key_%0{width}d",
                            (F.col("id") % num_keys)).alias("key"),
            F.format_string("value_%d", F.col("id")).alias("value"),
            F.col("id").cast("long").alias("timestamp"),
        )

        t0 = time.perf_counter()
        for b in range(num_rows // batch_rows):
            batch = rows.filter(
                (F.col("timestamp") >= b * batch_rows)
                & (F.col("timestamp") < (b + 1) * batch_rows))
            t.insert_batch(batch, row_count=batch_rows)
        t.flush()
        out["insert_sec"] = time.perf_counter() - t0
        out["parts_after_insert"] = float(t.part_count())

        t1 = time.perf_counter()
        t.optimize()
        out["optimize_sec"] = time.perf_counter() - t1
        out["parts_after_optimize"] = float(t.part_count())

        t2 = time.perf_counter()
        lo = f"key_{num_keys // 10:0{width}d}"
        hi = f"key_{num_keys // 5:0{width}d}"
        n = t.query(lo, hi).count()
        out["range_scan_sec"] = time.perf_counter() - t2
        out["range_scan_rows"] = float(n)

        out["total_sec"] = out["insert_sec"] + out["optimize_sec"] + out["range_scan_sec"]
        t.close()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


if __name__ == "__main__":
    from clickhouse_mergetree_spark.session import get_spark

    s = get_spark("workload_a")
    print(run_workload_a(s))
    s.stop()
