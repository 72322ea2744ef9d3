"""SparkSession factory tuned for this engine.

Local mode is the test harness; the config is written so the same code is
correct on a multi-executor cluster: AQE on (runtime re-plan, skew-join,
partition coalescing), parquet filter pushdown on, Arrow on for the
Pandas-UDF slow path, and shuffle partitions sized to the local core count
rather than the 200 default.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

# Unique per process, stable within it: a fixed path would outlive the
# in-memory catalog across sessions, so a rerun's saveAsTable would hit
# LOCATION_ALREADY_EXISTS on a table the new catalog has never heard of.
_WAREHOUSE_DIR = tempfile.mkdtemp(prefix="spark_graft_wh_")


def get_spark(app_name: str = "clickhouse_mergetree_spark",
              cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle_parts = str(cpus if cpus else (os.cpu_count() or 8))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE partition-coalescing knobs, env-parameterized (guide §2.2).
        # parallelismFirst=false (size post-shuffle partitions purely by
        # the advisory byte target) was MEASURED as the r14 floor-shaving
        # candidate and REJECTED: 3-round interleaved A/B over 14
        # mixed-shape queries at sf0.1 read flat-to-worse totals
        # (11.6→13.6 s round 3), because sort-heavy shapes
        # (q_agg_percentile 1.1-1.6→1.8 s in ALL rounds,
        # q_quantile_weighted) lose their parallel per-group sorts when
        # tiny shuffles coalesce to one partition — the scheduling saved
        # on 32 micro-tasks is smaller than the sort width lost. Spark's
        # default (true) stays; production at real data volumes would
        # raise the advisory toward 256m (guide §9), where the trade
        # inverts because partitions are byte-bound anyway.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Nanos-era events.parquet stored TIMESTAMP(NANOS), which the Spark
        # parquet reader rejects; read as long (ns since epoch) and convert
        # in tables.load — DuckDB equivalently truncates ns → µs.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Current testdata stores timestamp[us] with isAdjustedToUTC=false;
        # read as plain TIMESTAMP (µs = epoch, like DuckDB) instead of
        # TIMESTAMP_NTZ so epoch functions and timestamp literals work and
        # predicates push down at the scan. tables.load sets the same conf
        # for vanilla caller sessions.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # granule analog: cap rows per output file chunk like the reference's
        # 8192-row granule (reference: src/granule.h:10) — parquet row groups
        # carry the min/max stats that replace the sparse index.
        .config("spark.hadoop.parquet.block.size", str(8 * 1024 * 1024))
        # saveAsTable targets (bucketed-join demos/tests) land in a scratch
        # warehouse, never the repo's cwd
        .config("spark.sql.warehouse.dir", _WAREHOUSE_DIR)
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
