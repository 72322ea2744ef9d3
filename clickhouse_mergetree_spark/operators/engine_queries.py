"""Reference-derived queries (SURVEY.md §2.A) over the ``events`` table.

The reference's public query surface is point lookup and inclusive key-range
scan over (key, value, timestamp) rows with (key, timestamp) dedup and
(key ASC, timestamp ASC) result order (reference: src/merge_tree.cpp:37-67).
``events`` is the engine analog per FIXTURES.md: user_id ↔ key, ts ↔ the
uint64 version timestamp (we use epoch microseconds as a long — faithful to
the reference's opaque-integer timestamps, src/row.h:12).

Dedup determinism note: the reference keeps the *first* row after sorting on
(key, ts) when two rows share (key, ts) (src/merge_tree.cpp:57-60) — which
row wins is an internal ordering artifact. We pin a deterministic winner
(lowest event_id) via row_number so Spark and the DuckDB oracle agree.

Scale notes: every query here is a single parquet scan with the range
predicate pushed to the reader (PushedFilters — the Spark analog of the
reference's part/granule min-max pruning, src/part.cpp:201-203 and
src/sparse_index.cpp:17-27); dedup plans as partial+final hash aggregate, so
the only shuffle is on the dedup/window key — exactly one exchange at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.scratch import scratch_dir
from clickhouse_mergetree_spark.tables import load

# Inclusive key range used by q_range_scan — covers ~25% of the keyspace at
# every SF (user_id is 0..14 at sf0.001, 0..149 at sf0.01).
RANGE_START, RANGE_END = 3, 7
POINT_KEY = 7


def _kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events projected onto the reference row model: key/value/version ts."""
    return load(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
    )


_KV_SQL = (
    "SELECT user_id AS key, epoch_us(ts) AS ts_us, event_id, event_type, value "
    "FROM events"
)


def _dedup_first(df: DataFrame) -> DataFrame:
    """(key, ts) dedup with deterministic first-wins (lowest event_id).

    Spark re-expression of the reference's sort+std::unique on (key, ts)
    (src/merge_tree.cpp:56-60).
    """
    w = W.partitionBy("key", "ts_us").orderBy("event_id")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _dedup_first_sql(inner: str, where: str = "TRUE") -> str:
    return f"""
        SELECT key, ts_us, event_id, event_type, value FROM (
            SELECT *, row_number() OVER (PARTITION BY key, ts_us ORDER BY event_id) AS rn
            FROM ({inner}) WHERE {where}
        ) WHERE rn = 1
    """


@declared_query(
    "q_range_scan",
    oracle=_dedup_first_sql(_KV_SQL, f"key BETWEEN {RANGE_START} AND {RANGE_END}"),
)
def q_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: inclusive key-range scan + (key,ts) dedup (src/merge_tree.cpp:37-63)."""
    kv = _kv(spark, sf_dir).filter(F.col("key").between(RANGE_START, RANGE_END))
    return _dedup_first(kv)


@declared_query(
    "q_point_lookup",
    oracle=_dedup_first_sql(_KV_SQL, f"key = {POINT_KEY}"),
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: all versions of one key = range scan with start==end (src/merge_tree.cpp:65-67)."""
    kv = _kv(spark, sf_dir).filter(F.col("key") == POINT_KEY)
    return _dedup_first(kv)


@declared_query(
    "q_dedup_exact",
    oracle=f"""
        SELECT key, ts_us, min(event_id) AS first_event, count(*) AS n_rows
        FROM ({_KV_SQL}) GROUP BY key, ts_us
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14: exact (key, timestamp) duplicate groups (src/merge_tree.cpp:57-60)."""
    return (
        _kv(spark, sf_dir)
        .groupBy("key", "ts_us")
        .agg(F.min("event_id").alias("first_event"), F.count("*").alias("n_rows"))
    )


@declared_query(
    "q_count_total",
    oracle="SELECT count(*) AS total_rows, count(DISTINCT user_id) AS distinct_keys FROM events",
)
def q_count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R37: total row count + key cardinality (src/merge_tree.cpp:119-135)."""
    return load(spark, sf_dir, "events").agg(
        F.count("*").alias("total_rows"),
        F.countDistinct("user_id").alias("distinct_keys"),
    )


@declared_query(
    "q_part_stats",
    oracle=f"""
        SELECT min(key) AS min_key, max(key) AS max_key,
               min(ts_us) AS min_ts, max(ts_us) AS max_ts,
               count(*) AS row_count
        FROM ({_KV_SQL})
    """,
)
def q_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24: part-metadata aggregate — min/max key & ts, row count (src/part.cpp:219-246)."""
    return _kv(spark, sf_dir).agg(
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
        F.min("ts_us").alias("min_ts"),
        F.max("ts_us").alias("max_ts"),
        F.count("*").alias("row_count"),
    )


@declared_query(
    "q_latest_version",
    oracle=f"""
        SELECT key, ts_us, event_id, event_type, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY key ORDER BY ts_us DESC, event_id DESC) AS rn
            FROM ({_KV_SQL})
        ) WHERE rn = 1
    """,
)
def q_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E30: ReplacingMergeTree-style read — latest version per key (SURVEY §1.5)."""
    w = W.partitionBy("key").orderBy(F.col("ts_us").desc(), F.col("event_id").desc())
    return (
        _kv(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@declared_query(
    "q_merge_equivalence",
    oracle=_dedup_first_sql(_KV_SQL),
)
def q_merge_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R26: k-way merge ≡ union + dedup (src/merger.cpp:176-196).

    Splits the table into 3 disjoint "parts" (mod event_id), unions them, and
    dedups on (key, ts) — the oracle runs the dedup on the unsplit table, so
    a hash match proves merge-equivalence. In Spark the union is free
    (no shuffle); only the dedup exchanges.
    """
    kv = _kv(spark, sf_dir)
    # pmod (not %) so negative ids can never fall outside buckets 0..2 — the
    # union provably covers every row of the scan.
    parts = [kv.filter(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    merged = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return _dedup_first(merged)


@declared_query(
    "q_mergetree_engine",
    oracle=f"""
        SELECT DISTINCT user_id AS key, epoch_us(ts) AS ts_us
        FROM events WHERE user_id BETWEEN {RANGE_START} AND {RANGE_END}
    """,
)
def q_mergetree_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SparkMergeTree: events → insert_batch ×3 → flush (3 sorted
    parquet parts + manifest) → one compaction round → manifest-pruned range
    query with (key, ts) dedup (reference lifecycle, src/merge_tree.cpp:24-97).

    Oracle checks the deduped (key, ts) pair set — which *row* survives a
    (key, ts) tie is merge-order-dependent in the reference and here alike,
    so only the pair set is deterministic.
    """
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12,
                          max_parts=2, key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_mergetree_"),
                           schema=schema, config=cfg)
    kv = _kv(spark, sf_dir).persist()  # grouped count + 3 writes share it
    # one grouped count instead of a count() job per insert_batch
    counts = {
        int(r["b"]): r["count"]
        for r in kv.groupBy(F.pmod(F.col("event_id"), F.lit(3)).alias("b"))
        .count().collect()
    }
    for i in range(3):
        table.insert_batch(
            kv.filter(F.pmod(F.col("event_id"), F.lit(3)) == i),
            row_count=counts.get(i, 0))
        table.flush()
    table.merge_parts_sync()
    # query() already dedups on (key, ts_us) — the projection stays distinct
    return table.query(RANGE_START, RANGE_END).select("key", "ts_us")


@declared_query(
    "q_mergetree_source",
    oracle=f"""
        SELECT DISTINCT user_id AS key, epoch_us(ts) AS ts_us
        FROM events WHERE user_id BETWEEN {RANGE_START} AND {RANGE_END}
    """,
)
def q_mergetree_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine table read back through the `mergetree` connector's
    BATCH FAST PATH (``mergetree_batch_scan``) instead of the engine's
    own query() — same build as q_mergetree_engine, same oracle.

    The connector has two data planes (r9, VERDICT r8 item 6): the
    Python Data Source (``spark.read.format("mergetree")``) whose Arrow
    batches cross Python runner processes — kept for streaming part-id
    offsets and as the generic connector, pinned end-to-end by
    tests/test_datasource.py — and this fast path, which runs the SAME
    manifest part pruning (R8) at the driver and hands the surviving
    file list to the JVM parquet scanner: vectorized decode inside
    whole-stage codegen, row-group pruning (R9) from the pushed key
    filter. The (key, ts) dedup that engine.query() applies is
    re-expressed on top of the raw scan, exactly what the reference's
    query path does over its parts (src/merge_tree.cpp:37-63).
    """
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree
    from clickhouse_mergetree_spark.sources import mergetree_batch_scan

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12,
                          max_parts=2, key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_mt_source_"),
                           schema=schema, config=cfg)
    kv = _kv(spark, sf_dir).persist()  # grouped count + 3 writes share it
    # one grouped count instead of a count() job per insert_batch
    counts = {
        int(r["b"]): r["count"]
        for r in kv.groupBy(F.pmod(F.col("event_id"), F.lit(3)).alias("b"))
        .count().collect()
    }
    for i in range(3):
        table.insert_batch(
            kv.filter(F.pmod(F.col("event_id"), F.lit(3)) == i),
            row_count=counts.get(i, 0))
        table.flush()
    table.merge_parts_sync()

    scan = (
        mergetree_batch_scan(spark, table.base_path,
                             key_lower=RANGE_START, key_upper=RANGE_END)
        .filter(F.col("key").between(RANGE_START, RANGE_END))
    )
    return scan.select("key", "ts_us").dropDuplicates(["key", "ts_us"])


@declared_query(
    "q_ttl_expire",
    oracle=f"""
        WITH kv AS ({_KV_SQL}),
        cut AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS cutoff
                FROM kv WHERE key <= {RANGE_END})
        SELECT DISTINCT key, ts_us FROM kv, cut
        WHERE key <= {RANGE_END} AND ts_us >= cutoff
    """,
)
def q_ttl_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL retention end-to-end (ClickHouse ``TTL ts DELETE`` analog):
    build a 2-part engine table split at the time midpoint, expire
    everything below it, read back.

    The split puts every pre-cutoff row in part 1, so expire() takes the
    metadata-only fast path — part 1 is DROPPED via a manifest swap with
    zero rows read, and part 2 (min_ts ≥ cutoff) is untouched; no data is
    rewritten anywhere. That is the 100 TB shape: with time-correlated
    parts, TTL is a metadata operation, not a scan. The oracle recomputes
    the same cutoff ((min+max)//2, integer-exact in both engines) and
    filters the raw table."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12,
                          max_parts=10, key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_ttl_"),
                           schema=schema, config=cfg)
    # 4 actions (2 stats + 2 part writes) share one cached scan
    kv = _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END).persist()
    mn, mx = kv.agg(F.min("ts_us"), F.max("ts_us")).first()
    cutoff = (mn + mx) // 2
    counts = {
        bool(r["old"]): r["count"]
        for r in kv.groupBy((F.col("ts_us") < cutoff).alias("old"))
        .count().collect()
    }
    for old in (True, False):
        table.insert_batch(
            kv.filter((F.col("ts_us") < cutoff) == old),
            row_count=counts.get(old, 0))
        table.flush()
    stats = table.expire(cutoff)
    assert stats["parts_rewritten"] == 0, stats  # metadata-only path
    return table.query_all().select("key", "ts_us")


@declared_query(
    "q_partition_prune",
    oracle=f"""
        SELECT DISTINCT key, ts_us FROM ({_KV_SQL})
        WHERE key <= {RANGE_END} AND event_type <> 'purchase'
    """,
)
def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION BY end-to-end (ClickHouse MergeTree partitioning analog —
    extension): a table partitioned by event_type flushes into one part
    PER partition value, DROP PARTITION removes the 'purchase' partition
    with a manifest-only commit (zero rows read), and the read covers the
    surviving partitions.

    This is the MergeTree scale feature: at 100 TB with time/category
    partitions, retention and bulk deletes are metadata operations, and a
    partition-scoped query opens only its partition's parts (asserted
    below via parts_in_partition — partition pruning happens on the
    manifest before any file is listed). Merges are partition-scoped too:
    parts of different partitions are never merge candidates."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          partition_col="event_type",
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_partition_"),
                           schema=schema, config=cfg)
    kv = _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
    table.insert_batch(kv, row_count=1)  # count known post-split; 1 = "non-empty"
    table.flush()
    assert table.partitions() == sorted(
        ["click", "error", "purchase", "signup", "view"]), table.partitions()
    # partition-scoped reads open exactly that partition's parts
    assert len(table.parts_in_partition("click")) == 1
    dropped = table.drop_partition("purchase")
    assert dropped > 0 and table.parts_in_partition("purchase") == []
    return table.query_all().select("key", "ts_us")


@declared_query(
    "q_summing_merge",
    oracle=f"""
        SELECT key, ts_us,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
               count(*) AS n_rows
        FROM ({_KV_SQL}) WHERE key <= {RANGE_END}
        GROUP BY key, ts_us
    """,
)
def q_summing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree mode end-to-end (ClickHouse table-engine family
    analog — extension; the reference implements only dedup semantics):
    rows sharing (key, ts) are SUMMED, not deduplicated. Three inserted
    parts hold partial sums; compaction collapses groups physically and
    the read finalizes with the same aggregate — ClickHouse's documented
    "merges may be partial, GROUP BY on read" contract, verified here
    because the oracle aggregates the raw rows directly.

    The measure is DECIMAL(18,6) so partial-sum order can't perturb the
    result (exact arithmetic at any merge schedule — the property that
    makes merge-time pre-aggregation safe at 100 TB, where an incremental
    rollup replaces re-scanning raw data). n_rows counts source rows via
    an auxiliary summed column: a constant-1 measure, the SummingMergeTree
    idiom for keeping COUNT through collapses."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("value", T.DecimalType(18, 6), True),
        T.StructField("n_rows", T.LongType(), False),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=2,
                          mode="summing", key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_summing_"),
                           schema=schema, config=cfg)
    kv = (
        _kv(spark, sf_dir)
        .filter(F.col("key") <= RANGE_END)
        .select("key", "ts_us",
                F.col("value").cast("decimal(18,6)").alias("value"),
                F.lit(1).cast("long").alias("n_rows"),
                "event_id")
    ).persist()  # grouped count + 3 part writes share one scan
    counts = {
        int(r["b"]): r["count"]
        for r in kv.groupBy(F.pmod(F.col("event_id"), F.lit(3)).alias("b"))
        .count().collect()
    }
    for i in range(3):
        table.insert_batch(
            kv.filter(F.pmod(F.col("event_id"), F.lit(3)) == i)
            .drop("event_id"),
            row_count=counts.get(i, 0))
        table.flush()
    table.merge_parts_sync()
    return table.query_all().select(
        "key", "ts_us",
        F.col("value").cast("double").alias("value_sum"),
        "n_rows")


@declared_query(
    "q_aggregating_merge",
    oracle=f"""
        SELECT key, day_us,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
               CAST(min(value) AS DOUBLE) AS value_min,
               CAST(max(value) AS DOUBLE) AS value_max,
               count(*) AS n_rows
        FROM (
            SELECT key, ts_us - ts_us % 86400000000 AS day_us, value
            FROM ({_KV_SQL}) WHERE key <= {RANGE_END}
        )
        GROUP BY key, day_us
    """,
)
def q_aggregating_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree mode end-to-end (ClickHouse table-engine
    family analog — extension, completing dedup/summing/collapsing): rows
    sharing the (key, day) sorting key combine with PER-COLUMN aggregate
    states — sum, min, max, and a summed constant-1 count — physically at
    merge and logically at read, in any order, because every admitted
    state is associative. Three parts hold partials; compaction collapses
    them; the oracle recomputes the states from raw rows in one shot, so
    the hash match proves merge-schedule independence.

    This is the ClickHouse pattern for incremental metric rollups at
    100 TB: a (key, day)-grained table absorbs appends and keeps
    re-collapsing to one state row per group during normal merges —
    dashboards read states, never raw events. Sum is DECIMAL (exact at
    any schedule); min/max are order-free by definition."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("day_us", T.LongType(), False),
        T.StructField("value_sum", T.DecimalType(18, 6), True),
        T.StructField("value_min", T.DoubleType(), True),
        T.StructField("value_max", T.DoubleType(), True),
        T.StructField("n_rows", T.LongType(), False),
    ])
    cfg = MergeTreeConfig(
        memtable_flush_threshold=10**12, max_parts=2, mode="aggregating",
        agg_cols={"value_sum": "sum", "value_min": "min",
                  "value_max": "max", "n_rows": "sum"},
        key_col="key", ts_col="day_us")
    table = SparkMergeTree(spark, scratch_dir("q_aggregating_"),
                           schema=schema, config=cfg)
    kv = (
        _kv(spark, sf_dir)
        .filter(F.col("key") <= RANGE_END)
        .select("key",
                (F.col("ts_us") - F.pmod("ts_us", F.lit(86_400_000_000)))
                .alias("day_us"),
                F.col("value").cast("decimal(18,6)").alias("value_sum"),
                F.col("value").alias("value_min"),
                F.col("value").alias("value_max"),
                F.lit(1).cast("long").alias("n_rows"),
                "event_id")
    ).persist()  # 3 part writes share one scan
    for i in range(3):
        table.insert_batch(
            kv.filter(F.pmod("event_id", F.lit(3)) == i).drop("event_id"),
            row_count=1)
        table.flush()
    table.merge_parts_sync()
    return table.query_all().select(
        "key", "day_us",
        F.col("value_sum").cast("double").alias("value_sum"),
        "value_min", "value_max", "n_rows")


@declared_query(
    "q_system_parts",
    oracle=f"""
        SELECT CAST(event_id % 3 + 1 AS BIGINT) AS part_id,
               count(*) AS row_count,
               CAST(min(key) AS VARCHAR) AS min_key,
               CAST(max(key) AS VARCHAR) AS max_key,
               min(ts_us) AS min_ts, max(ts_us) AS max_ts
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        GROUP BY part_id
    """,
)
def q_system_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``system.parts`` introspection end-to-end (ClickHouse's ops staple
    — extension): the manifest's live part registry exposed as a
    DataFrame, metadata-only (no part file is opened — it's one row per
    part straight from the in-memory manifest, at any table size).

    Three event_id-banded inserts produce parts 1..3 with fully
    deterministic stats, so the oracle can recompute each part's row
    count and key/ts spans RELATIONALLY from the raw rows — a hash match
    proves the write path's manifest stats (R24: the stats every pruning
    decision trusts) are exactly the data's true spans. Ops queries like
    "which parts would a merge pick" read this surface."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_sysparts_"),
                           schema=schema, config=cfg)
    kv = (_dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
          .select("key", "ts_us", "event_id", "value")).persist()
    for i in range(3):
        table.insert_batch(kv.filter(F.pmod("event_id", F.lit(3)) == i),
                           row_count=1)
        table.flush()
    return table.system_parts().select(
        "part_id", "row_count", "min_key", "max_key", "min_ts", "max_ts")


@declared_query(
    "q_query_log",
    oracle=f"""
        WITH kv AS ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        SELECT 1 AS seq, 'range_scan' AS kind,
               (SELECT count(*) FROM kv
                WHERE key BETWEEN {RANGE_START} AND {RANGE_END}) AS n_rows
        UNION ALL
        SELECT 2, 'point_lookup',
               (SELECT count(*) FROM kv WHERE key = {POINT_KEY})
        UNION ALL
        SELECT 3, 'full_scan', (SELECT count(*) FROM kv)
    """,
)
def q_query_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``system.query_log`` end-to-end (ClickHouse observability analog —
    extension): every read planned against a table lands in a query
    ledger with its kind and its pruning outcome (live parts vs parts
    scheduled after manifest + skip-index pruning) — the surface an
    operator reads to learn which indexes EARN their build cost.

    Three reads run against a 3-part table (range scan, point lookup,
    full scan); the asserts pin the ledger's plan-time facts (every read
    saw 3 live parts; the bloom-backed point lookup never schedules
    more than that), and the returned rows join the engine's own ledger
    (seq, kind) with each read's executed row count, which the oracle
    recomputes relationally — so the hash match proves the log describes
    the reads that actually ran. The ledger is metadata-sized (one row
    per query) at any table size."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree
    from clickhouse_mergetree_spark.tables import values_df

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_querylog_"),
                           schema=schema, config=cfg)
    kv = (_dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
          .select("key", "ts_us", "event_id", "value")).persist()
    for i in range(3):
        table.insert_batch(kv.filter(F.pmod("event_id", F.lit(3)) == i),
                           row_count=1)
        table.flush()
    counts = [
        table.query(RANGE_START, RANGE_END).count(),   # seq 1
        table.query_key(POINT_KEY).count(),            # seq 2
        table.query_all().count(),                     # seq 3
    ]
    log = table.system_query_log()
    entries = log.collect()
    assert [e["kind"] for e in entries] == [
        "range_scan", "point_lookup", "full_scan"], entries
    assert all(e["parts_total"] == 3 for e in entries), entries
    assert entries[1]["parts_scanned"] <= 3, entries
    assert entries[2]["parts_scanned"] == 3, entries
    rows_df = values_df(
        spark, [(i + 1, int(n)) for i, n in enumerate(counts)],
        [("seq", "int"), ("n_rows", "bigint")])
    return log.join(rows_df, "seq").select("seq", "kind", "n_rows")


@declared_query(
    "q_row_policy",
    oracle=f"""
        SELECT key, ts_us, event_id, event_type
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        WHERE event_type <> 'click' AND key >= {RANGE_START}
    """,
)
def q_row_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``CREATE ROW POLICY`` end-to-end (ClickHouse row-level security
    analog — extension): predicates attached to the TABLE that every
    subsequent read applies automatically — tenant isolation, PII
    scoping, soft retention — so no caller can forget the filter. Two
    policies AND together (restrictive combination); they filter the
    logical table (post-collapse), persist in the manifest (asserted
    across reopen), and dropping one restores visibility (asserted —
    nothing was deleted). The policy filter rides the read plan itself,
    whole-stage codegen, no extra job at any scale; the oracle applies
    the same predicates relationally."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
    ])

    def cfg() -> MergeTreeConfig:
        return MergeTreeConfig(memtable_flush_threshold=10**12,
                               max_parts=10, key_col="key", ts_col="ts_us")

    path = scratch_dir("q_rowpolicy_")
    table = SparkMergeTree(spark, path, schema=schema, config=cfg())
    kv = (_dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
          .select("key", "ts_us", "event_id", "event_type")).persist()
    for i in range(3):
        table.insert_batch(kv.filter(F.pmod("event_id", F.lit(3)) == i),
                           row_count=1)
        table.flush()
    full = table.query_all().count()
    table.create_row_policy("no_clicks", "event_type <> 'click'")
    table.create_row_policy("key_floor", f"key >= {RANGE_START}")
    filtered = table.query_all().count()
    assert filtered < full, (filtered, full)
    # drop → visibility restored (policies never delete)
    table.drop_row_policy("key_floor")
    assert table.query_all().filter(
        F.col("key") < RANGE_START).count() > 0
    table.create_row_policy("key_floor", f"key >= {RANGE_START}")
    # policies survive reopen with the original config
    reopened = SparkMergeTree(spark, path, schema=schema, config=cfg())
    assert {p["name"] for p in reopened.row_policies()} == {
        "no_clicks", "key_floor"}
    out = reopened.query_all()
    assert out.count() == filtered
    return out.select("key", "ts_us", "event_id", "event_type")


@declared_query(
    "q_default_expr",
    oracle=f"""
        SELECT key, ts_us, event_id, event_type,
               CAST(length(event_type) * 100 + key AS BIGINT) AS type_code
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
    """,
)
def q_default_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALTER TABLE ADD COLUMN ... DEFAULT expr`` end-to-end (ClickHouse
    expression defaults — extension, completing the literal-default ADD
    of q_schema_evolution): the default is a SQL expression over the
    row's OTHER columns, computed wherever the default applies — lazily
    for pre-ALTER parts at read time (zero parts rewritten, asserted),
    and physically at the next merge (OPTIMIZE materializes it; content
    signature asserted unchanged). A post-ALTER insert supplies the
    column explicitly, proving old and new parts serve one schema. The
    oracle recomputes the expression relationally over all rows.

    At 100 TB this is the derived-column backfill without a backfill
    job: the ALTER is O(1), old data computes the expression on read,
    and the physical column appears as compaction touches each part."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_defaultexpr_"),
                           schema=schema, config=cfg)
    kv = (_dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
          .select("key", "ts_us", "event_id", "event_type")).persist()
    expr = "CAST(length(event_type) * 100 + key AS BIGINT)"
    for i in range(2):
        table.insert_batch(kv.filter(F.pmod("event_id", F.lit(3)) == i),
                           row_count=1)
        table.flush()
    ids_before = [p.part_id for p in table.manifest.parts]
    table.add_column("type_code", "bigint", default_expr=expr)
    assert [p.part_id for p in table.manifest.parts] == ids_before  # O(1)
    # post-ALTER insert supplies the column explicitly
    table.insert_batch(
        kv.filter(F.pmod("event_id", F.lit(3)) == 2)
        .withColumn("type_code", F.expr(expr)),
        row_count=1)
    table.flush()
    cols = ["key", "ts_us", "event_id", "event_type", "type_code"]

    def _sig(df: DataFrame):  # order-insensitive content signature
        return df.agg(F.count("*"), F.sum(
            F.xxhash64(*cols).cast("decimal(38,0)"))).collect()[0]

    before = _sig(table.query_all())
    table.config.max_parts = 1
    table.optimize()  # merge materializes the expression physically
    merged = table.query_all()
    assert _sig(merged) == before
    return merged.select(*cols)


@declared_query(
    "q_constraint_check",
    oracle=_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}"),
)
def q_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALTER TABLE ... ADD CONSTRAINT ... CHECK`` end-to-end (ClickHouse
    data-quality gate analog — extension): inserts validate the predicate
    DURING the part-write job (one conditional sum riding the existing
    write observation — no extra scan at any scale) and a violating batch
    rolls back before the manifest ever sees the part, leaving the table
    untouched (asserted: part count and row count unchanged after the
    rejected insert, and the violating rows are absent from the result
    the oracle recomputes). The DDL persists in the manifest (asserted
    across reopen) and existing data is never re-validated — exactly the
    CHECK-at-INSERT contract."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])

    def cfg() -> MergeTreeConfig:
        return MergeTreeConfig(memtable_flush_threshold=10**12,
                               max_parts=10, key_col="key", ts_col="ts_us")

    path = scratch_dir("q_constraint_")
    table = SparkMergeTree(spark, path, schema=schema, config=cfg())
    table.add_constraint("nonneg_key", "key >= 0")
    kv = _dedup_first(
        _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)).persist()
    table.insert_batch(kv, row_count=1)
    table.flush()  # valid batch lands
    n_parts, n_rows = table.part_count(), table.total_rows()
    # a violating batch (negated keys) must reject and leave no trace
    table.insert_batch(
        kv.select((-F.col("key") - 1).alias("key"), "ts_us", "event_id",
                  "event_type", "value"),
        row_count=1)
    try:
        table.flush()
        raise AssertionError("violating batch was accepted")
    except ValueError as e:
        assert "nonneg_key" in str(e), e
    assert (table.part_count(), table.total_rows()) == (n_parts, n_rows)
    # DDL survives reopen with the original config
    reopened = SparkMergeTree(spark, path, schema=schema, config=cfg())
    assert [c["name"] for c in reopened.constraints()] == ["nonneg_key"]
    return reopened.query_all().select(
        "key", "ts_us", "event_id", "event_type", "value")


@declared_query(
    "q_create_ddl",
    oracle=f"""
        WITH kv AS ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        SELECT key, ts_us, event_id, event_type,
               upper(event_type) AS tag
        FROM kv WHERE event_type IN ('click', 'purchase')
    """,
)
def q_create_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``CREATE TABLE`` DDL front end end-to-end (migration
    surface — extension): the table is created from the LITERAL DDL a
    ClickHouse user runs today — column types (UInt64/Int64/
    LowCardinality(String)), a ``set`` skipping index, a CHECK
    constraint, a DEFAULT expression column, PARTITION BY, and SETTINGS
    — mapped onto the engine's schema/config. The insert OMITS the
    defaulted column (filled from its expression — the ClickHouse INSERT
    contract), the set-index read prunes partitions/parts (asserted),
    and the oracle recomputes the same rows + default relationally. A
    reopen through the same DDL is idempotent (asserted)."""
    from clickhouse_mergetree_spark.engine import create_table_from_ddl

    ddl = """
    CREATE TABLE analytics.kv (
        key        UInt64,
        ts_us      Int64,
        event_id   Nullable(Int64),
        event_type LowCardinality(String),
        tag        String DEFAULT upper(event_type),
        INDEX et_set event_type TYPE set(8),
        CONSTRAINT nonneg CHECK key >= 0
    ) ENGINE = MergeTree()
    ORDER BY (key, ts_us)
    SETTINGS parts_to_throw_insert = 500
    """
    path = scratch_dir("q_createddl_")
    table = create_table_from_ddl(spark, path, ddl)
    kv = (_dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
          .select("key", "ts_us", "event_id", "event_type")).persist()
    for i in range(3):
        # tag omitted on purpose: DEFAULT upper(event_type) fills it
        table.insert_batch(kv.filter(F.pmod("event_id", F.lit(3)) == i),
                           row_count=1)
        table.flush()
    # the DDL-declared set index prunes equality probes
    probed = table.parts_for_in("event_type", ["click", "purchase"])
    assert len(probed) <= table.part_count()
    # reopen through the SAME DDL: idempotent (no duplicate constraints)
    table.close()
    reopened = create_table_from_ddl(spark, path, ddl)
    assert [c["name"] for c in reopened.constraints()] == ["nonneg"]
    return reopened.query_in("event_type", ["click", "purchase"]).select(
        "key", "ts_us", "event_id", "event_type", "tag")


@declared_query(
    "q_alter_ddl",
    oracle=f"""
        WITH kv AS ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        SELECT key, ts_us, event_id,
               CASE WHEN key = {POINT_KEY} THEN 'promo'
                    ELSE event_type END AS event_type,
               value, value * 2 AS vb
        FROM kv
        WHERE NOT (CASE WHEN key = {POINT_KEY} THEN 'promo'
                        ELSE event_type END = 'click')
    """,
)
def q_alter_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ALTER-statement runbook end-to-end (migration surface —
    extension, completing q_create_ddl): a sequence of LITERAL ALTER /
    OPTIMIZE statements — ADD COLUMN with a DEFAULT expression, ADD +
    MATERIALIZE INDEX, UPDATE ... WHERE, DELETE WHERE, OPTIMIZE FINAL —
    executes against the engine through ``execute_ddl``, each clause
    routed to the engine method that owns its contract. The oracle
    replays the same mutations relationally (CASE for the UPDATE, a
    filter for the DELETE, the expression for the default), so the hash
    match proves statement parsing AND mutation semantics end-to-end."""
    from clickhouse_mergetree_spark.engine import (create_table_from_ddl,
                                                   execute_ddl)

    ddl = """
    CREATE TABLE kv (
        key UInt64, ts_us Int64, event_id Nullable(Int64),
        event_type String, value Nullable(Float64)
    ) ENGINE = MergeTree() ORDER BY (key, ts_us)
    """
    table = create_table_from_ddl(spark, scratch_dir("q_alterddl_"), ddl)
    kv = (_dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
          .select("key", "ts_us", "event_id", "event_type", "value")
          ).persist()
    for i in range(3):
        table.insert_batch(kv.filter(F.pmod("event_id", F.lit(3)) == i),
                           row_count=1)
        table.flush()
    execute_ddl(table,
                "ALTER TABLE kv ADD COLUMN vb Float64 DEFAULT value * 2")
    execute_ddl(table, "ALTER TABLE kv ADD INDEX et event_type TYPE set(8)")
    execute_ddl(table, "ALTER TABLE kv MATERIALIZE INDEX et")
    execute_ddl(
        table,
        f"ALTER TABLE kv UPDATE event_type = 'promo' WHERE key = {POINT_KEY}")
    execute_ddl(table, "ALTER TABLE kv DELETE WHERE event_type = 'click'")
    execute_ddl(table, "OPTIMIZE TABLE kv FINAL")
    # the set index serves the post-mutation table: 'promo' probe prunes
    assert len(table.parts_for_in("event_type", ["promo"])) \
        <= table.part_count()
    return table.query_all().select(
        "key", "ts_us", "event_id", "event_type", "value", "vb")


MINMAX_LO, MINMAX_HI = 300.0, 1000.0


@declared_query(
    "q_minmax_skip",
    oracle=f"""
        SELECT DISTINCT key, ts_us FROM ({_KV_SQL})
        WHERE key <= {RANGE_END}
          AND value BETWEEN {MINMAX_LO} AND {MINMAX_HI}
    """,
)
def q_minmax_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minmax skipping index end-to-end (ClickHouse ``INDEX ... TYPE
    minmax`` analog): per-part [min, max] of a NON-KEY column kept in the
    manifest, so a value-range read prunes whole parts without opening a
    file — the same trick the primary key already gets, generalized to
    any column whose values correlate with ingest batches.

    The three inserted parts are value-banded ([0,100), [100,300),
    [300,∞)), so the [{300}, {1000}] probe opens exactly ONE part
    (asserted below — the pruning happens on manifest metadata before any
    listing). At 100 TB this is how secondary range predicates
    (price tiers, status codes, severity levels) avoid full scans in a
    table sorted by something else. The index stats ride the part-write
    job's observe — building them costs no extra scan."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          minmax_cols=("value",),
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_minmax_"),
                           schema=schema, config=cfg)
    kv = (_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
          .select("key", "ts_us", "event_id", "value"))
    bands = [(0.0, 100.0), (100.0, 300.0), (300.0, 10**9)]
    counts = {
        int(r["b"]): r["count"]
        for r in kv.groupBy(
            F.when(F.col("value") < 100.0, 0)
            .when(F.col("value") < 300.0, 1).otherwise(2).alias("b"))
        .count().collect()
    }
    for i, (lo, hi) in enumerate(bands):
        table.insert_batch(
            kv.filter((F.col("value") >= lo) & (F.col("value") < hi)),
            row_count=counts.get(i, 0))
        table.flush()
    # the probe range overlaps only the third band, so at most one part
    # survives pruning (zero at tiny SFs where no value reaches the band)
    scanned = table.parts_for_col_range("value", MINMAX_LO, MINMAX_HI)
    assert len(scanned) <= 1, [p.col_stats for p in table.manifest.parts]
    return (table.query_col_range("value", MINMAX_LO, MINMAX_HI)
            .select("key", "ts_us"))


@declared_query(
    "q_collapsing_merge",
    oracle=f"""
        WITH base AS (
            SELECT key, ts_us, min(event_id) AS event_id
            FROM ({_KV_SQL}) WHERE key <= {RANGE_END}
            GROUP BY key, ts_us
        )
        SELECT key, ts_us, event_id FROM base WHERE event_id % 2 = 1
    """,
)
def q_collapsing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree mode end-to-end (ClickHouse table-engine
    family analog — extension): row-level DELETE in an append-only
    engine. Batch 1 inserts every unique (key, ts) row with sign +1;
    batch 2 re-sends the even-event_id rows with sign -1; compaction
    collapses the pairs physically and the read shows only the
    still-live (odd) rows — the oracle derives the same survivor set
    relationally.

    This is how a 100 TB append-only store expresses deletes without
    rewriting data: cancellation rows accumulate at ingest cost and
    disappear during normal background merges (net-sign algebra keeps
    any merge order correct)."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("sign", T.IntegerType(), False),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=1,
                          mode="collapsing", key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_collapsing_"),
                           schema=schema, config=cfg)
    base = (
        _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
        .groupBy("key", "ts_us").agg(F.min("event_id").alias("event_id"))
    )
    n = base.count()  # one tiny agg job; reused for both batch sizes below
    table.insert_batch(base.withColumn("sign", F.lit(1)), row_count=n)
    table.flush()
    table.insert_batch(
        base.filter(F.pmod("event_id", F.lit(2)) == 0)
        .withColumn("sign", F.lit(-1)), row_count=max(1, n // 2))
    table.flush()
    table.merge_parts_sync()
    return table.query_all().select("key", "ts_us", "event_id")


MUT_KEY_LO, MUT_KEY_HI = 3, 5


@declared_query(
    "q_mutation",
    oracle=f"""
        SELECT key, ts_us, event_id, event_type,
               CASE WHEN event_type = 'purchase' THEN value * 2
                    ELSE value END AS value
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        WHERE NOT (event_type = 'click'
                   AND key BETWEEN {MUT_KEY_LO} AND {MUT_KEY_HI})
    """,
)
def q_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutations end-to-end (ClickHouse ``ALTER TABLE ... DELETE/UPDATE``
    analog — extension; the reference has no row mutation at all): parts
    are immutable, so a mutation rewrites ONLY the parts holding matching
    rows and swaps them atomically — untouched parts are never opened.

    Three inserted parts (banded by event_id mod 3); a DELETE with a
    key_range pruning hint (the manifest skips parts whose [min,max] key
    span can't intersect — the 100 TB path: mutate one partition's worth
    of parts, not the table); then an UPDATE doubling purchase values
    (rewrites only parts that contain purchases). The oracle replays both
    statements relationally over the same deduped input, so a hash match
    proves the rewrite-and-swap produced exactly SQL's DELETE+UPDATE
    semantics. Insert data is pre-deduped (first-wins) because dedup mode
    keeps an arbitrary row per (key, ts)."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_mutation_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(  # one cached window run feeds 3 part writes
        _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)).persist()
    for i in range(3):
        table.insert_batch(kv.filter(F.pmod("event_id", F.lit(3)) == i),
                           row_count=1)
        table.flush()
    table.delete_where(
        (F.col("event_type") == "click")
        & F.col("key").between(MUT_KEY_LO, MUT_KEY_HI),
        key_range=(MUT_KEY_LO, MUT_KEY_HI))
    table.update_where(F.col("event_type") == "purchase",
                       {"value": F.col("value") * 2})
    return table.query_all().select(
        "key", "ts_us", "event_id", "event_type", "value")


# Lightweight-delete fixture: predicate band + the ts shift that makes
# re-inserted rows a fresh (key, ts) identity (original epochs are ~1.7e15
# µs, so +1e16 is disjoint from every original timestamp).
LW_KEY_LO, LW_KEY_HI = 2, 6
LW_TS_SHIFT = 10**16
_LW_PRED = f"event_type = 'click' AND key BETWEEN {LW_KEY_LO} AND {LW_KEY_HI}"


@declared_query(
    "q_lightweight_delete",
    oracle=f"""
        WITH base AS ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        SELECT key, ts_us, event_id, event_type, value
        FROM base WHERE NOT ({_LW_PRED})
        UNION ALL
        SELECT key, ts_us + {LW_TS_SHIFT} AS ts_us, event_id, event_type,
               value
        FROM base WHERE {_LW_PRED}
    """,
)
def q_lightweight_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lightweight DELETE end-to-end (ClickHouse ``DELETE FROM`` 23.3+
    analog — extension; contrast q_mutation's ALTER ... DELETE, which
    rewrites parts before returning): the delete commits a predicate mask
    to the manifest — metadata-only, zero rows read, O(1) at any table
    size — and rows vanish from reads immediately while parts stay
    physically untouched.

    The fixture proves all three contract points in one hash: (1) masked
    rows are invisible; (2) the SAME rows re-inserted after the delete
    (ts shifted to a fresh identity) remain visible — the mask binds to
    the parts live at commit time, not to future data; (3)
    ``materialize_deletes()`` (the ALTER ... APPLY DELETED MASK analog)
    then rewrites exactly the masked parts and the result is unchanged —
    the oracle replays delete + re-insert relationally, so the hash match
    pins both the mask-read path and the materialized rewrite to SQL
    semantics. At 100 TB this is the point of lightweight deletes:
    takedowns/GDPR erasure become one manifest commit, and the rewrite
    cost is deferred onto merges that were going to happen anyway."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_lw_delete_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(  # 5 consuming actions share one cached window run
        _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)).persist()
    for i in range(3):
        table.insert_batch(kv.filter(F.pmod("event_id", F.lit(3)) == i),
                           row_count=1)
        table.flush()
    table.lightweight_delete(_LW_PRED)
    table.insert_batch(
        kv.filter(F.expr(_LW_PRED))
        .withColumn("ts_us", F.col("ts_us") + F.lit(LW_TS_SHIFT)),
        row_count=1)
    table.flush()
    table.materialize_deletes()
    return table.query_all().select(
        "key", "ts_us", "event_id", "event_type", "value")


@declared_query(
    "q_schema_evolution",
    oracle=f"""
        SELECT key, ts_us, event_id, value, 'backfill' AS origin
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        WHERE event_id % 2 = 0
        UNION ALL
        SELECT key, ts_us, event_id, value, event_type AS origin
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        WHERE event_id % 2 = 1
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution end-to-end (ClickHouse ``ALTER TABLE ADD COLUMN``
    analog — extension): the ALTER is a metadata-only manifest commit —
    ZERO parts are rewritten. Part 1 is written with the original schema;
    ``add_column("origin", default='backfill')`` evolves the table; part 2
    carries real values. The read fills the default lazily for the
    pre-evolution part (grouped scan by part schema, one extra lit()
    projection), and OPTIMIZE materializes it physically at the next
    merge — the ClickHouse lazy-default contract, which at 100 TB is why
    an ALTER is O(1) instead of an O(table) rewrite. Both the pre- and
    post-merge reads hash-match the oracle's UNION reconstruction.
    Reopen is covered by the engine tests (manifest replays the ALTER)."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_evolve_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
    table.insert_batch(
        kv.filter(F.pmod("event_id", F.lit(2)) == 0)
        .select("key", "ts_us", "event_id", "value"), row_count=1)
    table.flush()
    table.add_column("origin", "string", default="backfill")
    table.insert_batch(
        kv.filter(F.pmod("event_id", F.lit(2)) == 1)
        .select("key", "ts_us", "event_id", "value",
                F.col("event_type").alias("origin")), row_count=1)
    table.flush()
    cols = ["key", "ts_us", "event_id", "value", "origin"]

    def _sig(df: DataFrame):  # order-insensitive content signature
        return df.agg(F.count("*"), F.sum(
            F.xxhash64(*cols).cast("decimal(38,0)"))).collect()[0]

    # evaluate the lazy-default read NOW (optimize deletes its part dirs)
    before = _sig(table.query_all())
    # merge materializes the default physically; content must not change
    table.config.max_parts = 1
    table.optimize()
    merged = table.query_all()
    assert _sig(merged) == before
    return merged.select(*cols)


@declared_query(
    "q_projection_agg",
    oracle=f"""
        SELECT key, event_type,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
               count(*) AS n_rows
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        GROUP BY key, event_type
    """,
)
def q_projection_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projections end-to-end (ClickHouse ``ALTER TABLE ... ADD
    PROJECTION`` analog — extension): a pre-aggregated (key, event_type)
    rollup written WITH every part and combined at read time, so the
    grouped query scans |groups|·|parts| pre-aggregated rows instead of
    the raw table — the 100 TB dashboard path, same contract as a
    SummingMergeTree MV but living inside the part lifecycle (merges,
    mutations and TTL rebuild it automatically; nothing can drift).

    Three inserted parts each carry projection partials; ``query_grouped``
    ROUTES the request to the projection (asserted — and inputFiles()
    proves the plan reads only projection dirs, never raw part files), and
    the oracle aggregates the raw rows relationally, so the hash match
    proves partial-combining is exact. Sums are DECIMAL so combine order
    can't perturb values. Insert data is pre-deduped — projections
    aggregate physical rows (ClickHouse's own FINAL restriction)."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MergeTreeConfig, ProjectionSpec, SparkMergeTree)

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DecimalType(18, 6), True),
    ])
    spec = ProjectionSpec("by_key_type", ("key", "event_type"),
                          {"value_sum": ("sum", "value"),
                           "n_rows": ("count", "value")})
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          projections=(spec,),
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_projection_"),
                           schema=schema, config=cfg)
    kv = (_dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
          .select("key", "ts_us", "event_id", "event_type",
                  F.col("value").cast("decimal(18,6)").alias("value"))
          ).persist()  # 3 part writes share one cached window run
    for i in range(3):
        table.insert_batch(kv.filter(F.pmod("event_id", F.lit(3)) == i),
                           row_count=1)
        table.flush()
    req = {"value_sum": ("sum", "value"), "n_rows": ("count", "value")}
    assert table.routed_projection(("key", "event_type"), req) == "by_key_type"
    out = table.query_grouped(("key", "event_type"), req)
    files = out.inputFiles()
    assert files and all("_proj_by_key_type" in f for f in files), files[:3]
    return out.select("key", "event_type",
                      F.col("value_sum").cast("double").alias("value_sum"),
                      "n_rows")


@declared_query(
    "q_materialize_projection",
    oracle=f"""
        SELECT event_type,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
               count(*) AS n_rows
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        GROUP BY event_type
    """,
)
def q_materialize_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALTER TABLE ... ADD PROJECTION`` + ``MATERIALIZE PROJECTION`` on
    a STANDING table end-to-end (ClickHouse DDL analog — extension,
    completing q_projection_agg which declares the projection at
    creation): the table is built with NO projections, then one is ADDed
    as a metadata-only commit. Grouped reads stay correct immediately —
    un-materialized parts serve through the raw-row fallback (asserted:
    the plan still reads raw part files) — and MATERIALIZE then backfills
    each lagging part with one part-local aggregate job (asserted: the
    plan now reads only projection dirs, re-running is a no-op, and the
    DDL survives reopen with the original config). The oracle aggregates
    the raw rows relationally, so the hash proves the backfilled partials
    combine to exactly the data's truth.

    At 100 TB this is how dashboards get retrofitted onto a standing
    corpus: the ALTER is O(1), the backfill is one bounded job per
    historical part, and every future merge/mutation/TTL rewrite keeps
    the projection fresh automatically."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MergeTreeConfig, ProjectionSpec, SparkMergeTree)

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DecimalType(18, 6), True),
    ])

    def cfg() -> MergeTreeConfig:
        return MergeTreeConfig(memtable_flush_threshold=10**12,
                               max_parts=10, key_col="key", ts_col="ts_us")

    path = scratch_dir("q_matprojection_")  # NB: no "_proj_" substring —
    # the raw-vs-projection file asserts below match on "_proj_by_type"
    table = SparkMergeTree(spark, path, schema=schema, config=cfg())
    kv = (_dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
          .select("key", "ts_us", "event_id", "event_type",
                  F.col("value").cast("decimal(18,6)").alias("value"))
          ).persist()
    for i in range(3):
        table.insert_batch(kv.filter(F.pmod("event_id", F.lit(3)) == i),
                           row_count=1)
        table.flush()
    spec = ProjectionSpec("by_type", ("key", "event_type"),
                          {"value_sum": ("sum", "value"),
                           "n_rows": ("count", "value")})
    table.add_projection(spec)                     # metadata-only
    req = {"value_sum": ("sum", "value"), "n_rows": ("count", "value")}
    assert table.routed_projection(("event_type",), req) == "by_type"
    # correct BEFORE materialization: raw-row fallback serves the read
    pre = table.query_grouped(("event_type",), req)
    assert pre.inputFiles() and all(
        "_proj_by_type" not in f for f in pre.inputFiles()), "expected raw"
    stats = table.materialize_projection("by_type")
    assert stats == {"parts_built": 3, "parts_skipped": 0}, stats
    assert table.materialize_projection("by_type")["parts_built"] == 0
    # reopen with the ORIGINAL projection-less config: DDL replays
    reopened = SparkMergeTree(spark, path, schema=schema, config=cfg())
    assert reopened.routed_projection(("event_type",), req) == "by_type"
    out = reopened.query_grouped(("event_type",), req)
    files = out.inputFiles()
    assert files and all("_proj_by_type" in f for f in files), files[:3]
    return out.select("event_type",
                      F.col("value_sum").cast("double").alias("value_sum"),
                      "n_rows")


TOKEN_NEEDLE = "dup"


@declared_query(
    "q_token_search",
    oracle=f"""
        SELECT doc_id FROM documents
        WHERE list_contains(
            string_split_regex(lower(text), '[^a-z0-9]+'), '{TOKEN_NEEDLE}')
    """,
)
def q_token_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bloom skipping index end-to-end (ClickHouse ``INDEX ...
    TYPE tokenbf_v1`` + ``hasToken`` analog — extension): each part
    carries a bloom over its column's DISTINCT lowercased word tokens, so
    a token-containment query prunes parts on manifest metadata before
    any file is listed. The inserted parts are banded needle-vs-rest, so
    the probe must skip at least one needle-free part (asserted; bloom
    FPs can only add scans, never lose rows). The oracle recomputes
    containment relationally with the identical tokenizer regex, so the
    hash match proves index + predicate semantics, not just plumbing.

    At 100 TB this is needle-in-haystack text search — error IDs, SKUs,
    usernames — touching only parts that can match instead of every
    byte of the corpus."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          token_bloom_cols=("text",),
                          key_col="doc_id", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_token_"),
                           schema=schema, config=cfg)
    # Tokenize every document ONCE: the four banded part writes below
    # each filter the cached (doc, has-needle) frame instead of
    # re-splitting the full text column per write action.
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").alias("ts_us"), "text").withColumn(
        "_has", F.array_contains(
            F.split(F.lower("text"), "[^a-z0-9]+"), TOKEN_NEEDLE)).persist()
    cols = ["doc_id", "ts_us", "text"]
    table.insert_batch(docs.filter("_has").select(cols), row_count=1)
    table.flush()
    for i in range(3):
        table.insert_batch(
            docs.filter(~F.col("_has")
                        & (F.pmod("doc_id", F.lit(3)) == i)).select(cols),
            row_count=1)
        table.flush()
    scanned = table.parts_for_token("text", TOKEN_NEEDLE)
    # ≥1 of the 3 needle-free parts must be skipped (FP-tolerant bound)
    assert len(scanned) < table.part_count(), (
        len(scanned), table.part_count())
    return table.query_token("text", TOKEN_NEEDLE).select("doc_id")


@declared_query(
    "q_materialize_index",
    oracle=f"""
        SELECT doc_id FROM documents
        WHERE list_contains(
            string_split_regex(lower(text), '[^a-z0-9]+'), '{TOKEN_NEEDLE}')
    """,
)
def q_materialize_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALTER TABLE ... ADD INDEX`` + ``MATERIALIZE INDEX`` end-to-end
    (ClickHouse DDL analog — extension): the table is built WITHOUT any
    text index, then a tokenbf index is ADDed as a metadata-only commit
    (asserted: the probe still scans every part — an un-materialized
    index makes no claim, so correctness never depends on it), then
    MATERIALIZE backfills the existing parts (asserted: the probe now
    skips at least one needle-free part, re-running is a no-op, and the
    DDL survives reopen). The oracle recomputes token containment
    relationally, so the hash match proves the backfilled index serves
    the same rows a full scan would.

    At 100 TB this is how you retrofit needle-in-haystack search onto a
    standing corpus: the ALTER is O(1), the backfill is one bounded
    single-column scan per historical part, and new parts index
    themselves at write time."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="doc_id", ts_col="ts_us")
    path = scratch_dir("q_mat_index_")
    table = SparkMergeTree(spark, path, schema=schema, config=cfg)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").alias("ts_us"), "text").withColumn(
        "_has", F.array_contains(
            F.split(F.lower("text"), "[^a-z0-9]+"), TOKEN_NEEDLE)).persist()
    cols = ["doc_id", "ts_us", "text"]
    table.insert_batch(docs.filter("_has").select(cols), row_count=1)
    table.flush()
    for i in range(3):
        table.insert_batch(
            docs.filter(~F.col("_has")
                        & (F.pmod("doc_id", F.lit(3)) == i)).select(cols),
            row_count=1)
        table.flush()
    table.add_index("text", "tokenbf")          # metadata-only
    n_parts = table.part_count()
    assert len(table.parts_for_token("text", TOKEN_NEEDLE)) == n_parts
    stats = table.materialize_index("text")     # backfill
    assert stats == {"parts_indexed": n_parts, "parts_skipped": 0}, stats
    assert len(table.parts_for_token("text", TOKEN_NEEDLE)) < n_parts
    again = table.materialize_index("text")     # idempotent
    assert again["parts_indexed"] == 0, again
    # DDL survives reopen with the ORIGINAL (index-less) config
    reopened = SparkMergeTree(spark, path, schema=schema,
                              config=MergeTreeConfig(
                                  memtable_flush_threshold=10**12,
                                  max_parts=10,
                                  key_col="doc_id", ts_col="ts_us"))
    assert len(reopened.parts_for_token("text", TOKEN_NEEDLE)) < n_parts
    return reopened.query_token("text", TOKEN_NEEDLE).select("doc_id")


# Injected cross-token needle (same fixture technique as q_pii_scrub):
# it spans a word boundary — the query class tokenbf structurally cannot
# serve — and its 3-grams ("zqx", "qxv", ...) are absent from the
# corpus vocabulary, so needle-free parts actually prune. A needle made
# of common words ("fast merge") would NOT prune this word-soup corpus:
# every part contains each individual 3-gram via other word pairs —
# the honest ngrambf caveat (it serves rare substrings: IDs, error
# codes, stack frames; not common-word phrases).
LIKE_NEEDLE = "panic zqxv"
_LIKE_TEXT_SQL = (
    "CASE WHEN doc_id % 7 = 3 "
    "THEN concat(text, ' kernel panic zqxv-', CAST(doc_id AS STRING)) "
    "ELSE text END"
)


@declared_query(
    "q_like_search",
    oracle=f"""
        SELECT doc_id FROM documents
        WHERE contains(lower({_LIKE_TEXT_SQL}), '{LIKE_NEEDLE}')
    """,
)
def q_like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-bloom skipping index end-to-end (ClickHouse ``INDEX ...
    TYPE ngrambf_v1`` + ``LIKE '%needle%'`` analog — extension,
    completing the skipping-index family: minmax / key bloom / tokenbf /
    ngrambf): each part carries a bloom over its column's DISTINCT
    lowercased character 3-grams; a substring query prunes every part
    whose bloom provably lacks ANY 3-gram of the needle — before a
    single file is listed. The needle deliberately SPANS a token
    boundary ("panic zqxv"), the query class tokenbf structurally cannot
    serve, and carries out-of-vocabulary grams so pruning engages (see
    LIKE_NEEDLE comment for the honest caveat on common-word needles).
    Parts are banded needle-vs-rest, so the probe must skip at least one
    needle-free part (asserted; bloom FPs only add scans). The oracle
    recomputes containment relationally over the same injected text, so
    the hash match proves index + predicate semantics.

    At 100 TB this is substring search over logs/payloads — stack
    traces, request ids, embedded SKUs — touching only parts that can
    match instead of every byte."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          ngram_bloom_cols=("text",),
                          key_col="doc_id", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_like_"),
                           schema=schema, config=cfg)
    # Evaluate the needle test ONCE: the four banded part writes filter
    # the cached frame instead of re-deriving text + instr per action.
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").alias("ts_us"),
        F.expr(_LIKE_TEXT_SQL).alias("text")).withColumn(
        "_has", F.instr(F.lower("text"), LIKE_NEEDLE) > 0).persist()
    cols = ["doc_id", "ts_us", "text"]
    table.insert_batch(docs.filter("_has").select(cols), row_count=1)
    table.flush()
    for i in range(3):
        table.insert_batch(
            docs.filter(~F.col("_has")
                        & (F.pmod("doc_id", F.lit(3)) == i)).select(cols),
            row_count=1)
        table.flush()
    scanned = table.parts_for_like("text", LIKE_NEEDLE)
    # ≥1 of the 3 needle-free parts must be skipped (FP-tolerant bound)
    assert len(scanned) < table.part_count(), (
        len(scanned), table.part_count())
    return table.query_like("text", LIKE_NEEDLE).select("doc_id")


@declared_query(
    "q_matview_rollup",
    oracle=f"""
        SELECT key, ts_us - ts_us % 86400000000 AS day_us,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
               count(*) AS n_rows
        FROM ({_KV_SQL}) WHERE key <= {RANGE_END}
        GROUP BY key, day_us
    """,
)
def q_matview_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized view end-to-end (ClickHouse ``CREATE MATERIALIZED
    VIEW ... ENGINE = SummingMergeTree`` analog): a per-(key, day) rollup
    maintained INCREMENTALLY at ingest. Three batches insert into the
    source table; each block is pushed through the view transform (a
    batch-local groupBy — small, map-side-heavy jobs) into a summing-mode
    target, whose flush/merge/read keep collapsing the partials.

    Reading the rollup never touches the source table — the 100 TB
    argument for MVs: dashboard reads hit the (key, day)-sized target,
    and raw-table rescans are replaced by merge-time accumulation. The
    oracle recomputes the same rollup from the raw rows in one shot, so a
    hash match proves incremental == batch (the MV correctness
    contract). Measures are DECIMAL so partial-sum order is irrelevant."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MaterializedView, MergeTreeConfig, SparkMergeTree)

    src_schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    mv_schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("day_us", T.LongType(), False),
        T.StructField("value_sum", T.DecimalType(18, 6), True),
        T.StructField("n_rows", T.LongType(), False),
    ])
    DAY_US = 86_400_000_000

    def rollup(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                "key",
                (F.col("ts_us") - F.pmod("ts_us", F.lit(DAY_US)))
                .alias("day_us"))
            .agg(F.sum(F.col("value").cast("decimal(18,6)"))
                 .cast("decimal(18,6)").alias("value_sum"),
                 F.count("*").alias("n_rows"))
        )

    src = SparkMergeTree(
        spark, scratch_dir("q_mv_src_"), schema=src_schema,
        config=MergeTreeConfig(memtable_flush_threshold=10**12,
                               key_col="key", ts_col="ts_us"))
    mv = MaterializedView(
        SparkMergeTree(
            spark, scratch_dir("q_mv_tgt_"), schema=mv_schema,
            config=MergeTreeConfig(memtable_flush_threshold=10**12,
                                   max_parts=2, mode="summing",
                                   key_col="key", ts_col="day_us")),
        rollup)
    src.attach_view(mv)

    kv = (_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
          .select("key", "ts_us", "event_id", "value")).persist()
    counts = {
        int(r["b"]): r["count"]
        for r in kv.groupBy(F.pmod(F.col("event_id"), F.lit(3)).alias("b"))
        .count().collect()
    }
    for i in range(3):
        src.insert_batch(
            kv.filter(F.pmod(F.col("event_id"), F.lit(3)) == i),
            row_count=counts.get(i, 0))
        mv.flush()  # one partial-rollup part per inserted block
    mv.target.merge_parts_sync()  # physical partial-sum collapse
    return mv.query().select(
        "key", "day_us",
        F.col("value_sum").cast("double").alias("value_sum"),
        "n_rows")


@declared_query(
    "q_time_travel",
    oracle=f"""
        SELECT DISTINCT key, ts_us FROM ({_KV_SQL})
        WHERE key <= {RANGE_END} AND event_id % 2 = 0
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel (Delta/Iceberg-style versioned reads on the
    engine's manifest): flush batch 1 (version v1), flush batch 2, then a
    compaction that TOMBSTONES — not deletes — the pre-merge parts under
    ``snapshot_retention``; finally read the table AS OF v1.

    The as-of read resolves v1's part list from the manifest's version
    log and scans those parquet dirs directly — proving removed parts
    stay readable until vacuum ages them out. Metadata-only versioning:
    no data is ever copied for a snapshot, which is what makes snapshots
    free at 100 TB. The oracle reconstructs v1's content (the even
    event_id half) from the raw table."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=1,
                          snapshot_retention=8, key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_timetravel_"),
                           schema=schema, config=cfg)
    kv = _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END).persist()
    counts = {
        int(r["b"]): r["count"]
        for r in kv.groupBy(F.pmod(F.col("event_id"), F.lit(2)).alias("b"))
        .count().collect()
    }
    for i in range(2):
        table.insert_batch(
            kv.filter(F.pmod(F.col("event_id"), F.lit(2)) == i),
            row_count=counts.get(i, 0))
        table.flush()
        if i == 0:
            v1 = table.current_version()
    merged = table.merge_parts_sync()
    assert merged, "compaction should have run (2 parts > max_parts=1)"
    return table.query_at_version(v1).select("key", "ts_us")


FUNNEL_WINDOW_H = 24


@declared_query(
    "q_events_funnel",
    oracle=f"""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
              AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW_H} HOUR
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT s1.user_id,
               1 + (s2.user_id IS NOT NULL)::INT
                 + (s3.user_id IS NOT NULL)::INT AS funnel_depth,
               epoch_us(s1.t1) AS t_view_us,
               epoch_us(s2.t2) AS t_click_us,
               epoch_us(s3.t3) AS t_purchase_us
        FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
                LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (the ClickHouse windowFunnel shape): per user, how
    deep into view → click → purchase did they get, with the click
    required within {24}h of the first view.

    Greedy earliest-anchor semantics — each step anchors on the MIN
    qualifying timestamp of the previous step — which makes the result
    deterministic and SQL-expressible on both engines. Three aggregates
    chained by per-user joins; every stage shuffles on user_id only, so
    the whole funnel is one exchange column at any scale (and the step
    frames are tiny — one row per user that reached the step).
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1"))
                & (F.col("ts") <= F.col("t1")
                   + F.expr(f"INTERVAL {FUNNEL_WINDOW_H} HOURS")))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
        .select(
            "user_id",
            (F.lit(1)
             + F.col("t2").isNotNull().cast("int")
             + F.col("t3").isNotNull().cast("int")).alias("funnel_depth"),
            F.unix_micros("t1").alias("t_view_us"),
            F.unix_micros("t2").alias("t_click_us"),
            F.unix_micros("t3").alias("t_purchase_us"),
        )
    )


@declared_query(
    "q_events_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id, time_bucket(INTERVAL 1 DAY, min(ts)) AS cohort
            FROM events GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT user_id, time_bucket(INTERVAL 1 DAY, ts) AS day
            FROM events
        )
        SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
               datediff('day', f.cohort, a.day) AS day_offset,
               count(*) AS n_active
        FROM firsts f JOIN activity a ON f.user_id = a.user_id
        WHERE datediff('day', f.cohort, a.day) BETWEEN 0 AND 7
        GROUP BY f.cohort, day_offset
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (the ClickHouse retention() shape): users grouped
    by first-seen day, counted active on each of the next 7 days.

    Two aggregates over one scan lineage — first-seen day per user and
    distinct (user, day) activity — joined on user_id. Both sides are
    user-cardinality (small relative to events), so at scale the join is
    a thin shuffle after two map-side-combining aggregations; the event
    table itself is read once per side with only 2-3 columns.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day"))
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    activity = ev.distinct()
    off = F.datediff("day", "cohort")
    return (
        firsts.join(activity, "user_id")
        .filter(off.between(0, 7))
        .groupBy(F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
                 off.alias("day_offset"))
        .agg(F.count("*").alias("n_active"))
    )


@declared_query(
    "q_events_timeseries",
    oracle="""
        WITH bounds AS (
            SELECT time_bucket(INTERVAL 1 HOUR, min(ts)) AS lo,
                   time_bucket(INTERVAL 1 HOUR, max(ts)) AS hi
            FROM events
        ), axis AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        ), counts AS (
            SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour, count(*) AS n
            FROM events GROUP BY 1
        )
        SELECT strftime(a.hour, '%Y-%m-%d %H:%M:%S') AS hour,
               coalesce(c.n, 0) AS n_events
        FROM axis a LEFT JOIN counts c ON a.hour = c.hour
    """,
)
def q_events_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled time series: hourly event counts with ZERO rows for
    silent hours — the densified axis every monitoring/report query needs
    (an outer join against the time dimension, ClickHouse's
    WITH FILL analog).

    The axis is generated from one aggregate row via sequence+explode —
    no driver-side collect, and the axis side is tiny (hours in range) so
    Spark broadcasts it into the left join with the hourly counts. One
    shuffle total (the count groupBy) at any scale.
    """
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"))
    axis = (
        ev.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select(F.explode(F.sequence(
            "lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    )
    counts = ev.groupBy("hour").agg(F.count("*").alias("n"))
    return (
        axis.join(counts, "hour", "left")
        .select(F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                F.coalesce("n", F.lit(0)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Round 5: sequence pattern matching (ClickHouse sequenceMatch analog)
# ---------------------------------------------------------------------------

# view → click → purchase, in order, with anything in between.
SEQ_PATTERN = "v.*c.*p"


@declared_query(
    "q_seq_match",
    oracle=f"""
        WITH seqs AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               length(seq) AS n_events,
               regexp_matches(seq, '{SEQ_PATTERN}') AS matched
        FROM seqs
    """,
)
def q_seq_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')`` analog: per user,
    does the time-ordered event stream contain view, then click, then
    purchase (any events in between)? Event conditions compress to one
    symbol per event ('v'/'c'/'p'/...; first letter is unique here) so the
    temporal pattern becomes a REGEX over the per-user symbol string —
    exactly how ClickHouse compiles its pattern DSL.

    Plan shape: one partial+final agg on user_id building the ordered
    symbol string (elements carry their (ts_us, event_id) sort key into
    the collect; ordering is resolved row-locally after sort_array, so
    collect partials still merge associatively), then a row-local regex.
    Per-user state is the event count — the same bound as any
    sessionization; a pathological hot user caps with a LIMIT-BY-style
    truncation upstream.
    """
    ev = load(spark, sf_dir, "events")
    tagged = F.struct(
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").alias("event_id"),
        F.substring("event_type", 1, 1).alias("sym"))
    seq = F.concat_ws(
        "",
        F.transform(F.sort_array(F.collect_list(tagged)),
                    lambda r: r["sym"]))
    return (
        ev.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(
            "user_id",
            F.length("seq").alias("n_events"),
            F.col("seq").rlike(SEQ_PATTERN).alias("matched"),
        )
    )


@declared_query(
    "q_funnel_strict",
    oracle="""
        WITH seqs AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id
        ), a AS (
            SELECT user_id, seq, strpos(seq, 'v') AS pos FROM seqs
        )
        SELECT user_id,
               CAST(CASE WHEN pos = 0 THEN 0
                    WHEN substr(seq, pos + 1, 2) = 'cp' THEN 3
                    WHEN substr(seq, pos + 1, 1) = 'c' THEN 2
                    ELSE 1 END AS INTEGER) AS strict_depth,
               CAST(CASE WHEN pos = 0 THEN 0
                    WHEN regexp_matches(substr(seq, pos), 'v.*c.*p') THEN 3
                    WHEN regexp_matches(substr(seq, pos), 'v.*c') THEN 2
                    ELSE 1 END AS INTEGER) AS relaxed_depth
        FROM a
    """,
)
def q_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(... , 'strict_order')`` analog: in
    strict-order mode ANY intervening event aborts the chain — in
    A→B→D→C, the D stops the A→B→C search (ClickHouse's own example).
    Anchored at each user's first view, the strict depth advances only
    while the IMMEDIATELY next events are click then purchase; the
    relaxed depth (same anchor, any events in between) is computed
    alongside so the two modes' divergence is itself hash-verified.
    Pattern-only variant — the time-windowed relaxed funnel is
    q_events_funnel; strict_order composes with the symbol-string
    technique, not with per-step min-join chains.

    Plan: the q_seq_match shape — one partial+final agg on user_id
    building the time-ordered symbol string, then row-local string ops.
    One shuffle total."""
    ev = load(spark, sf_dir, "events")
    tagged = F.struct(
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").alias("event_id"),
        F.substring("event_type", 1, 1).alias("sym"))
    seq_col = F.concat_ws(
        "",
        F.transform(F.sort_array(F.collect_list(tagged)),
                    lambda r: r["sym"]))
    a = (
        ev.groupBy("user_id")
        .agg(seq_col.alias("seq"))
        .withColumn("pos", F.instr("seq", "v"))
    )
    tail = F.expr("substring(seq, pos)")
    return a.select(
        "user_id",
        F.when(F.col("pos") == 0, 0)
        .when(F.expr("substring(seq, pos + 1, 2)") == "cp", 3)
        .when(F.expr("substring(seq, pos + 1, 1)") == "c", 2)
        .otherwise(1).cast("int").alias("strict_depth"),
        F.when(F.col("pos") == 0, 0)
        .when(tail.rlike("v.*c.*p"), 3)
        .when(tail.rlike("v.*c"), 2)
        .otherwise(1).cast("int").alias("relaxed_depth"),
    )


@declared_query(
    "q_seq_count",
    oracle="""
        WITH runs AS (
            SELECT user_id,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       OVER w AS p_run,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       OVER w AS c_run
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT user_id,
               CAST(max(c_run) AS BIGINT) AS n_clicks,
               CAST(max(p_run) AS BIGINT) AS n_purchases,
               CAST(max(p_run) - greatest(max(p_run - c_run), 0) AS BIGINT)
                 AS pairs
        FROM runs GROUP BY user_id
    """,
)
def q_seq_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1)(?t>0)(?2)')`` analog: per user,
    the number of NON-OVERLAPPING click→purchase chains in time order —
    the funnel-throughput counterpart to q_seq_match's boolean.

    The greedy left-to-right matcher ClickHouse runs is sequential, but
    its result has a closed prefix form (bracket matching): with running
    counts P(t)/C(t) of purchases/clicks up to t, unmatched purchases =
    max(0, max_t (P(t) − C(t))), so pairs = total_P − that deficit.
    (Proof sketch: the deficit at t counts purchases so far that cannot
    possibly have a distinct earlier click; greedy matching achieves the
    bound.) That re-expression is one per-user running-sum window plus
    one hash aggregate — two uniform user_id shuffles that Spark fuses
    into one sort, no per-row Python, no quadratic pairing — where a
    literal port of the reference matcher would be a per-user UDF.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p_run = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(w)
    c_run = F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).over(w)
    runs = ev.select(
        "user_id", p_run.alias("p_run"), c_run.alias("c_run")
    )
    return runs.groupBy("user_id").agg(
        F.max("c_run").alias("n_clicks"),
        F.max("p_run").alias("n_purchases"),
        (F.max("p_run")
         - F.greatest(F.max(F.col("p_run") - F.col("c_run")), F.lit(0)))
        .alias("pairs"),
    )


@declared_query(
    "q_versioned_collapse",
    oracle=f"""
        WITH base AS (
            SELECT key, ts_us, min(event_id) AS event_id
            FROM ({_KV_SQL}) WHERE key <= {RANGE_END}
            GROUP BY key, ts_us
        )
        SELECT key, ts_us, 1 AS version, event_id
        FROM base WHERE event_id % 2 = 1
        UNION ALL
        SELECT key, ts_us, 2 AS version, event_id
        FROM base WHERE event_id % 2 = 0
    """,
)
def q_versioned_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VersionedCollapsingMergeTree mode end-to-end: state updates under
    OUT-OF-ORDER delivery. Plain collapsing cancels whatever +1 row it
    meets — correct only when cancellations arrive after their insert.
    Versioned collapsing pairs a -1 row with the +1 row carrying the SAME
    version, so the collapse commutes with delivery order.

    The fixture delivers the cancellation part FIRST: part 1 holds
    (sign=-1, version=1) for the even-event_id rows, part 2 the original
    (sign=+1, version=1) rows, part 3 the replacement (sign=+1,
    version=2) even rows. After compaction the odd rows survive at
    version 1 and the even rows at version 2 — which is exactly what the
    oracle derives relationally, and what plain collapsing's
    order-sensitive contract would get wrong given this delivery order.

    At 100 TB this is the engine mode for mutable state fed by an
    at-least-once, out-of-order stream (CDC, clickstream updates): merges
    stay pure net-sign algebra per (key, ts, version), associative under
    any merge schedule."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("sign", T.IntegerType(), False),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=1,
                          mode="versioned_collapsing",
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_vercollapse_"),
                           schema=schema, config=cfg)
    base = (  # count + multiple sign-block writes reuse one cached agg
        _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
        .groupBy("key", "ts_us").agg(F.min("event_id").alias("event_id"))
    ).persist()
    even = base.filter(F.pmod("event_id", F.lit(2)) == 0)
    n = base.count()
    # cancellation delivered BEFORE the row it cancels
    table.insert_batch(
        even.select("key", "ts_us", F.lit(1).alias("version"), "event_id",
                    F.lit(-1).alias("sign")), row_count=max(1, n // 2))
    table.flush()
    table.insert_batch(
        base.select("key", "ts_us", F.lit(1).alias("version"), "event_id",
                    F.lit(1).alias("sign")), row_count=n)
    table.flush()
    table.insert_batch(
        even.select("key", "ts_us", F.lit(2).alias("version"), "event_id",
                    F.lit(1).alias("sign")), row_count=max(1, n // 2))
    table.flush()
    table.merge_parts_sync()
    return table.query_all().select("key", "ts_us", "version", "event_id")


@declared_query(
    "q_replacing_merge",
    oracle=f"""
        WITH base AS (
            SELECT key, ts_us, min(event_id) AS event_id
            FROM ({_KV_SQL}) WHERE key <= {RANGE_END}
            GROUP BY key, ts_us
        )
        SELECT key, ts_us, 2 AS version,
               event_id + 1000000 AS payload
        FROM base WHERE event_id % 2 = 0 AND event_id % 5 <> 0
        UNION ALL
        SELECT key, ts_us, 1 AS version, event_id AS payload
        FROM base WHERE event_id % 2 = 1 AND event_id % 5 <> 0
    """,
)
def q_replacing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree(ver, is_deleted) mode end-to-end: per (key, ts)
    the HIGHEST-version row wins, and a winning row flagged is_deleted is
    a read-invisible tombstone — ClickHouse's row-delete idiom for
    upsert/CDC tables (mode="replacing", engine/merge_tree.py).

    Delivery is fully OUT-OF-ORDER to prove the collapse is a pure
    associative max: part 1 carries the version-2 updates (even rows,
    payload rewritten), part 2 the version-3 tombstones (every fifth
    row — deletes BEAT the lower-version updates), part 3 the original
    version-1 rows — so the tombstoned keys must not resurrect when
    their v1 insert arrives last. After compaction: fifth rows invisible,
    remaining even rows at v2, remaining odd rows at v1 — derived
    relationally by the oracle.

    At 100 TB: the merge keeps ONE row per key (storage converges to the
    live set, unlike collapsing's net-sign pairs), reads finalize with
    the same max — this is the mutable-dimension-table engine mode."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("payload", T.LongType(), True),
        T.StructField("is_deleted", T.IntegerType(), False),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=1,
                          mode="replacing", key_col="key", ts_col="ts_us",
                          version_col="version", deleted_col="is_deleted")
    table = SparkMergeTree(spark, scratch_dir("q_replacing_"),
                           schema=schema, config=cfg)
    base = (
        _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
        .groupBy("key", "ts_us").agg(F.min("event_id").alias("event_id"))
    )
    even = base.filter(F.pmod("event_id", F.lit(2)) == 0)
    fifth = base.filter(F.pmod("event_id", F.lit(5)) == 0)
    n = base.count()
    # version-2 updates arrive FIRST ...
    table.insert_batch(
        even.select("key", "ts_us", F.lit(2).alias("version"),
                    (F.col("event_id") + 1000000).alias("payload"),
                    F.lit(0).alias("is_deleted")),
        row_count=max(1, n // 2))
    table.flush()
    # ... then the version-3 tombstones ...
    table.insert_batch(
        fifth.select("key", "ts_us", F.lit(3).alias("version"),
                     F.lit(None).cast("long").alias("payload"),
                     F.lit(1).alias("is_deleted")),
        row_count=max(1, n // 5))
    table.flush()
    # ... and the ORIGINAL version-1 rows last (no resurrection)
    table.insert_batch(
        base.select("key", "ts_us", F.lit(1).alias("version"),
                    F.col("event_id").alias("payload"),
                    F.lit(0).alias("is_deleted")),
        row_count=n)
    table.flush()
    table.merge_parts_sync()
    return table.query_all().select("key", "ts_us", "version", "payload")


@declared_query(
    "q_partition_detach",
    oracle=f"""
        SELECT DISTINCT key, ts_us FROM ({_KV_SQL})
        WHERE key <= {RANGE_END} AND event_type <> 'click'
    """,
)
def q_partition_detach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETACH / ATTACH PARTITION end-to-end (ClickHouse ops staple —
    extension): detach the 'error' partition (parts leave the live set,
    data parked on disk as ``detached_part_<id>`` — the ``detached/``
    analog, invisible to crash-recovery rescans), verify reads exclude
    it, ATTACH it back (same part ids, rename + manifest re-commit),
    then detach 'click' — so the returned read proves both directions:
    re-attached 'error' rows are present, detached 'click' rows absent.

    Both operations are metadata + a directory rename per part — zero
    rows read at any table size, which is what makes detach/attach the
    tool for partition-level backfills, quarantines, and migrations at
    100 TB."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          partition_col="event_type",
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_detach_"),
                           schema=schema, config=cfg)
    kv = _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
    table.insert_batch(kv, row_count=1)
    table.flush()
    n_err = table.detach_partition("error")
    assert n_err > 0 and table.parts_in_partition("error") == []
    n_back = table.attach_partition("error")
    assert n_back == n_err and len(table.parts_in_partition("error")) == 1
    n_click = table.detach_partition("click")
    assert n_click > 0
    return table.query_all().select("key", "ts_us")


@declared_query(
    "q_drop_column",
    oracle=f"""
        SELECT key, ts_us, event_id, value, 'redacted' AS event_type
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        WHERE event_id % 2 = 0
        UNION ALL
        SELECT key, ts_us, event_id, value, event_type
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        WHERE event_id % 2 = 1
    """,
)
def q_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALTER TABLE DROP COLUMN`` end-to-end (ClickHouse ops staple —
    extension): the DROP is a metadata-only manifest commit — ZERO parts
    rewritten (part ids asserted unchanged) — and old parts shed the
    physical bytes lazily at their next merge, because every rewrite
    reads at the current schema. The round-trip then re-ADDs the same
    name with a default: pre-drop parts must serve the NEW default, never
    the stale bytes still sitting in their parquet files (ClickHouse
    semantics — DROP destroys the data logically), while post-re-add
    inserts carry real values again. The oracle reconstructs exactly
    that: even event_ids (inserted before the drop) get 'redacted', odd
    ones (inserted after the re-add) keep their real event_type.

    At 100 TB this is why DROP COLUMN is O(1): no scan, no rewrite, one
    manifest swap; the reclaim rides compaction."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_dropcol_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
    table.insert_batch(
        kv.filter(F.pmod("event_id", F.lit(2)) == 0), row_count=1)
    table.flush()
    ids_before = [p.part_id for p in table.manifest.parts]
    table.drop_column("event_type")
    assert [p.part_id for p in table.manifest.parts] == ids_before  # O(1)
    table.add_column("event_type", "string", default="redacted")
    # re-added column sits at the END of the evolved schema
    table.insert_batch(
        kv.filter(F.pmod("event_id", F.lit(2)) == 1)
        .select("key", "ts_us", "event_id", "value", "event_type"),
        row_count=1)
    table.flush()
    return table.query_all().select(
        "key", "ts_us", "event_id", "value", "event_type")


@declared_query(
    "q_ttl_column",
    oracle=f"""
        WITH kv AS ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")}),
        b AS (SELECT min(ts_us) + (max(ts_us) - min(ts_us)) // 2 AS cutoff
              FROM kv)
        SELECT key, ts_us, event_id,
               CASE WHEN ts_us < cutoff THEN NULL ELSE value END AS value
        FROM kv, b
    """,
)
def q_ttl_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level TTL end-to-end (ClickHouse ``value TTL ts + INTERVAL``
    analog — extension): values below the time cutoff revert to the
    column default (NULL) while the ROWS survive — the "age out the heavy
    column, keep the skeleton" retention pattern.

    The table is built as three time-split parts so each per-part case is
    exercised and asserted: the all-old part expires via METADATA ONLY
    (expired_cols mark, zero rows read — the dominant case at 100 TB with
    time-correlated parts, physical reclaim riding the next merge), the
    straddling part is rewritten ONCE with the conditional default, and
    the young part is never opened. The oracle recomputes the same
    integer-exact cutoff ((min+max)/2 floor) over the raw rows and applies
    the CASE directly."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_ttlcol_"),
                           schema=schema, config=cfg)
    # One dedup shuffle total: the min/max agg materializes the cache and
    # the three banded part writes below reuse it instead of re-running
    # the window (4 actions consume kv; bench clears the cache per query).
    kv = _dedup_first(
        _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
    ).select("key", "ts_us", "event_id", "value").persist()
    mn, mx = kv.agg(F.min("ts_us"), F.max("ts_us")).first()
    cutoff = mn + (mx - mn) // 2
    q1 = mn + (mx - mn) // 4
    q3 = mn + 3 * ((mx - mn) // 4)
    for lo, hi in ((None, q1), (q1, q3), (q3, None)):
        batch = kv
        if lo is not None:
            batch = batch.filter(F.col("ts_us") >= lo)
        if hi is not None:
            batch = batch.filter(F.col("ts_us") < hi)
        table.insert_batch(batch, row_count=1)
        table.flush()
    stats = table.expire_columns({"value": cutoff})
    # part 1 (max < cutoff): metadata-only; part 2 (straddles): one
    # rewrite; part 3 (min ≥ cutoff): untouched
    assert stats["parts_meta_expired"] == 1, stats
    assert stats["parts_rewritten"] == 1, stats
    return table.query_all().select("key", "ts_us", "event_id", "value")


@declared_query(
    "q_modify_column",
    oracle=f"""
        SELECT key, ts_us, CAST(event_id AS DOUBLE) AS event_id, value
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
    """,
)
def q_modify_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALTER TABLE MODIFY COLUMN`` (type change) end-to-end (ClickHouse
    ops staple — extension): the MODIFY is a metadata-only manifest
    commit — ZERO parts rewritten (part ids asserted unchanged). Parts
    written before the ALTER keep their physical encoding (bigint here)
    and reads CAST them to the declared type lazily; parts written after
    carry the new type (double) natively. OPTIMIZE then materializes the
    new physical type at the rewrite — asserted on the merged part's
    parquet footer — without changing the result (signature-compared
    before/after, the q_schema_evolution pattern). The oracle recomputes
    the same rows with a plain CAST.

    At 100 TB this is why type widening is O(1): no scan, no rewrite,
    one manifest swap; the re-encode rides compaction — exactly
    ClickHouse's materialize-at-merge contract for MODIFY COLUMN."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_modcol_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(
        _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
    ).select("key", "ts_us", "event_id", "value")
    table.insert_batch(
        kv.filter(F.pmod("event_id", F.lit(2)) == 0), row_count=1)
    table.flush()
    ids_before = [p.part_id for p in table.manifest.parts]
    table.modify_column("event_id", "double")
    assert [p.part_id for p in table.manifest.parts] == ids_before  # O(1)
    assert table.manifest.parts[0].cast_cols == {"event_id": "bigint"}
    table.insert_batch(
        kv.filter(F.pmod("event_id", F.lit(2)) == 1)
        .withColumn("event_id", F.col("event_id").cast("double")),
        row_count=1)
    table.flush()
    cols = ["key", "ts_us", "event_id", "value"]

    def _sig(df: DataFrame):  # order-insensitive content signature
        return df.agg(F.count("*"), F.sum(
            F.xxhash64(*cols).cast("decimal(38,0)"))).collect()[0]

    before = _sig(table.query_all())
    table.config.max_parts = 1
    table.optimize()
    merged = table.query_all()
    assert _sig(merged) == before
    assert all(p.cast_cols is None for p in table.manifest.parts)
    physical = spark.read.parquet(table.manifest.parts[0].path)
    assert dict(physical.dtypes)["event_id"] == "double"
    return merged.select(*cols)


@declared_query(
    "q_set_skip",
    oracle=f"""
        SELECT key, ts_us, event_id, event_type, value
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        WHERE event_type IN ('purchase', 'signup')
    """,
)
def q_set_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INDEX ... TYPE set(N)`` skipping index end-to-end (ClickHouse
    analog — extension): each part stores the EXACT distinct value set of
    a low-cardinality column in the manifest (built on the part-write
    job's observe — no second scan), and an equality/IN read prunes every
    part whose set provably lacks all probed values WITHOUT opening a
    file. The table is built as three parts with disjoint event_type
    sets; the probe for {{purchase, signup}} must prune to exactly the
    two covering parts — asserted on metadata alone before any read.
    Overflow past N stores "no claim" (never skip), ClickHouse's own
    contract.

    At 100 TB, low-cardinality filters (status codes, event classes,
    tenant tiers) skip the bulk of the table at the manifest, the same
    lever as partition pruning but without dedicating the partition key."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us",
                          set_index_cols=(("event_type", 8),))
    table = SparkMergeTree(spark, scratch_dir("q_setskip_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
    for group in (("click", "view"), ("purchase", "error"), ("signup",)):
        table.insert_batch(
            kv.filter(F.col("event_type").isin(list(group))), row_count=1)
        table.flush()
    assert table.part_count() == 3
    # pruning decision is manifest metadata only: 2 of 3 parts survive
    cand = table.parts_for_in("event_type", ["purchase", "signup"])
    assert len(cand) == 2, [p.col_sets for p in table.manifest.parts]
    return table.query_in("event_type", ["purchase", "signup"]).select(
        "key", "ts_us", "event_id", "event_type", "value")


@declared_query(
    "q_ttl_groupby",
    oracle=f"""
        WITH kv AS (
            SELECT key, ts_us, event_id,
                   CAST(value AS DECIMAL(18,6)) AS value
            FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        ),
        b AS (SELECT min(ts_us) + (max(ts_us) - min(ts_us)) // 2 AS cutoff
              FROM kv)
        SELECT key, ts_us, event_id, CAST(value AS DOUBLE) AS value
        FROM kv, b WHERE ts_us >= cutoff
        UNION ALL
        SELECT key, max(ts_us) AS ts_us,
               arg_max(event_id, ts_us) AS event_id,
               CAST(CAST(sum(value) AS DECIMAL(18,6)) AS DOUBLE) AS value
        FROM kv, b WHERE ts_us < cutoff GROUP BY key
    """,
)
def q_ttl_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL GROUP BY end-to-end (ClickHouse ``TTL ts + INTERVAL ... GROUP
    BY key SET value = sum(value)`` analog — extension): rows past the
    retention cutoff don't drop — they AGGREGATE. Per key, all expired
    rows collapse to one rollup row (value summed exactly in
    decimal(18,6); ts and the other columns from the group's newest
    expired row) while young rows survive verbatim — the "age detail
    into a summary" retention pattern that keeps dashboards correct
    after raw events expire.

    The engine executes one job per partition group over only the
    affected (expiry-frontier) parts: young|expired split, one
    partial+final hash agg on the sorting-key prefix — the cheapest
    shuffle the table admits — and a single part written back per
    partition; untouched parts are never opened. The oracle reconstructs
    the same UNION of verbatim young rows and per-key decimal-exact
    rollups with arg_max for the carried columns."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DecimalType(18, 6), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_ttlgb_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(
        _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
    ).select("key", "ts_us", "event_id",
             F.col("value").cast("decimal(18,6)").alias("value"))
    mn, mx = kv.agg(F.min("ts_us"), F.max("ts_us")).first()
    cutoff = mn + (mx - mn) // 2
    q1 = mn + (mx - mn) // 4
    for lo, hi in ((None, q1), (q1, None)):
        batch = kv
        if lo is not None:
            batch = batch.filter(F.col("ts_us") >= lo)
        if hi is not None:
            batch = batch.filter(F.col("ts_us") < hi)
        table.insert_batch(batch, row_count=1)
        table.flush()
    n_before = table.total_rows()
    stats = table.expire_rollup(cutoff, {"value": "sum"})
    assert stats["rows_before"] == n_before        # both parts straddle/old
    assert stats["rows_after"] < stats["rows_before"]
    return table.query_all().select(
        "key", "ts_us", "event_id",
        F.col("value").cast("double").alias("value"))


@declared_query(
    "q_sample_by",
    oracle=f"""
        SELECT key, ts_us, event_id, event_type, value
        FROM ({_dedup_first_sql(_KV_SQL)})
        WHERE substring(md5(CAST(key AS VARCHAR)), 1, 2) < '40'
    """,
)
def q_sample_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SAMPLE BY`` end-to-end (ClickHouse ``SAMPLE BY intHash32(key)``
    + ``SELECT ... SAMPLE 0.25`` analog — extension): the engine declares
    a sampling key (= the sorting key, ClickHouse's primary-key
    restriction) and reads take a deterministic value-keyed slice —
    md5-bucket of the key, 256 buckets, first quarter of the bucket
    space here. Same key ⇒ same bucket on every run/engine/cluster
    (no RNG), bigger fractions nest, disjoint offsets partition the
    table, and ALL rows of a key are in or out together — per-entity
    aggregates over the sample stay unbiased.

    The sample predicate executes BELOW the (key, ts) dedup shuffle
    (asserted on the physical plan), sound because a dedup group shares
    its key and hence its bucket — at 100 TB the dedup shuffle shrinks
    by the sample factor instead of sampling after the heavy lifting.
    The oracle replays the identical md5-bucket predicate (hex digits
    are ASCII-ordered, so string compare == numeric compare)."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us", sample_col="key")
    table = SparkMergeTree(spark, scratch_dir("q_sampleby_"),
                           schema=schema, config=cfg)
    table.insert_batch(_kv(spark, sf_dir), row_count=1)
    table.flush()
    out = table.query_sample(0.25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # root-first print: the md5 filter below the Exchange ⇒ it executes
    # before the dedup shuffle
    assert "md5" in plan and plan.index("md5") > plan.index("Exchange")
    return out.select("key", "ts_us", "event_id", "event_type", "value")


@declared_query(
    "q_matview_cascade",
    oracle=f"""
        SELECT ts_us - ts_us % 86400000000 AS day_us,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
               count(*) AS n_rows
        FROM ({_KV_SQL}) WHERE key <= {RANGE_END}
        GROUP BY 1
    """,
)
def q_matview_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASCADED materialized views (ClickHouse chained-MV pattern: MV
    reading from an MV's target table): source inserts trigger a
    per-(key, day) summing rollup, and every block landing in THAT
    target triggers a second per-day rollup — two levels of incremental
    aggregation maintained by one source insert, no rescan of either
    upstream table, the exact shape of the raw→hourly→daily dashboards
    ClickHouse users chain.

    The cascade falls out of the trigger model: a view's on_batch calls
    the target's insert_batch, which notifies the target's OWN views —
    so depth-N chains need no extra machinery. Correctness holds because
    each level's measures are associative (DECIMAL sums + counts): level
    2 sees level 1's block-local PARTIALS, not finalized rows, and
    summing partials of partials equals the one-shot aggregate — which
    is exactly what the oracle computes from the raw rows, so the hash
    match proves the whole chain."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MaterializedView, MergeTreeConfig, SparkMergeTree)

    src_schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    l1_schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("day_us", T.LongType(), False),
        T.StructField("value_sum", T.DecimalType(18, 6), True),
        T.StructField("n_rows", T.LongType(), False),
    ])
    l2_schema = T.StructType([
        T.StructField("day_us", T.LongType(), False),
        T.StructField("zero", T.LongType(), False),
        T.StructField("value_sum", T.DecimalType(18, 6), True),
        T.StructField("n_rows", T.LongType(), False),
    ])
    DAY_US = 86_400_000_000

    def l1_rollup(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                "key",
                (F.col("ts_us") - F.pmod("ts_us", F.lit(DAY_US)))
                .alias("day_us"))
            .agg(F.sum(F.col("value").cast("decimal(18,6)"))
                 .cast("decimal(18,6)").alias("value_sum"),
                 F.count("*").alias("n_rows"))
        )

    def l2_rollup(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("day_us")
            .agg(F.lit(0).cast("bigint").alias("zero"),
                 F.sum("value_sum").cast("decimal(18,6)")
                 .alias("value_sum"),
                 F.sum("n_rows").alias("n_rows"))
            .select("day_us", "zero", "value_sum", "n_rows")
        )

    src = SparkMergeTree(
        spark, scratch_dir("q_mvc_src_"), schema=src_schema,
        config=MergeTreeConfig(memtable_flush_threshold=10**12,
                               key_col="key", ts_col="ts_us"))
    l1 = SparkMergeTree(
        spark, scratch_dir("q_mvc_l1_"), schema=l1_schema,
        config=MergeTreeConfig(memtable_flush_threshold=10**12,
                               max_parts=2, mode="summing",
                               key_col="key", ts_col="day_us"))
    l2 = SparkMergeTree(
        spark, scratch_dir("q_mvc_l2_"), schema=l2_schema,
        config=MergeTreeConfig(memtable_flush_threshold=10**12,
                               max_parts=2, mode="summing",
                               key_col="day_us", ts_col="zero"))
    l1.attach_view(MaterializedView(l2, l2_rollup))   # level 2 chains off l1
    src.attach_view(MaterializedView(l1, l1_rollup))

    # 3 blocks × 2 MV levels consume this frame; one cached scan total
    kv = (_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
          .select("key", "ts_us", "event_id", "value")).persist()
    for i in range(3):
        src.insert_batch(
            kv.filter(F.pmod("event_id", F.lit(3)) == i), row_count=1)
    l1.flush()
    l2.flush()
    # the cascade's read side: finalized level-2 rollup, source untouched
    return l2.query_all().select(
        "day_us",
        F.col("value_sum").cast("double").alias("value_sum"),
        "n_rows")


@declared_query(
    "q_sharded_engine",
    oracle=f"""
        SELECT DISTINCT user_id AS key, epoch_us(ts) AS ts_us
        FROM events WHERE user_id BETWEEN {RANGE_START} AND {RANGE_END}
    """,
)
def q_sharded_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``Distributed`` engine end-to-end (extension): a
    4-shard table — inserts route by ``pmod(xxhash64(key), 4)`` computed
    INSIDE the insert job, each shard an independent SparkMergeTree with
    its own parts/manifest/merges — then a fanned-out range read with
    per-shard manifest pruning and shard-local (key, ts) dedup.

    Shard-local dedup equals global dedup because the sharding key is
    the sorting key: a version group can never span shards — asserted
    here by checking a point lookup touches exactly one shard. At
    100 TB this layer is what keeps compaction scalable: merge
    scheduling, part budgets, and skipping indexes are per-shard, and
    point lookups touch 1/N of the deployment. The oracle checks the
    same deduped (key, ts) pair set as q_mergetree_engine."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (MergeTreeConfig,
                                                   ShardedMergeTree)

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12,
                          max_parts=2, key_col="key", ts_col="ts_us")
    table = ShardedMergeTree(spark, scratch_dir("q_sharded_"),
                             n_shards=4, schema=schema, config=cfg)
    # 4 shard writes each filter this frame; cache the scan+projection so
    # the parquet read runs once, not once per shard flush.
    kv = _kv(spark, sf_dir).persist()
    table.insert_batch(kv, row_count=1)
    table.flush()
    table.optimize()
    # routing invariants: every shard holds rows, and a point lookup
    # touches exactly one shard
    stats = table.shard_stats()
    assert all(s["rows"] > 0 for s in stats), stats
    probe = table.shard_of(POINT_KEY)
    # the 4 per-shard probe counts are independent jobs — run concurrent
    from clickhouse_mergetree_spark.parallel import run_concurrently

    ns = run_concurrently([
        (lambda s=s: s.query_key(POINT_KEY).count()) for s in table.shards])
    for j, n in enumerate(ns):
        assert (n > 0) == (j == probe), (j, probe, n)
    return table.query(RANGE_START, RANGE_END).select("key", "ts_us")


@declared_query(
    "q_attach_from",
    oracle=f"""
        WITH kv AS ({_dedup_first_sql(_KV_SQL)})
        SELECT key, ts_us, event_id, event_type, value FROM kv
        WHERE (key > {RANGE_END} AND event_type <> 'signup')
           OR (key <= {RANGE_END}
               AND event_type IN ('purchase', 'signup'))
    """,
)
def q_attach_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALTER TABLE ... ATTACH/REPLACE PARTITION FROM src`` end-to-end
    (ClickHouse analog — extension): a staging table holds the small-key
    half of events and the main table the large-key half, both
    partitioned by event_type. The 'purchase' partition is ATTACHed
    (copied) and the 'signup' partition REPLACEd (dest partition
    swapped) from staging into main — both as hardlink + manifest
    commits, zero rows read (asserted: part count moves by exactly the
    staged partition's parts, and the query plan is the ordinary
    manifest-pruned read).

    This is the 100 TB backfill idiom: load into a scratch table,
    validate, then swap partitions into production as O(files) metadata
    work. The oracle reconstructs the expected union: main's original
    rows (minus the replaced partition) plus staging's two moved
    partitions."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                          key_col="key", ts_col="ts_us",
                          partition_col="event_type")
    # Both staging/main loads consume the same full-table dedup; persist
    # so the window shuffle runs once, not once per part-write action.
    kv = _dedup_first(_kv(spark, sf_dir)).persist()
    src = SparkMergeTree(spark, scratch_dir("q_attachfrom_src_"),
                         schema=schema, config=cfg)
    dst = SparkMergeTree(spark, scratch_dir("q_attachfrom_dst_"),
                         schema=schema, config=cfg)
    src.insert_batch(kv.filter(F.col("key") <= RANGE_END), row_count=1)
    dst.insert_batch(kv.filter(F.col("key") > RANGE_END), row_count=1)
    # the two tables are independent engines over one cached input —
    # flush them as concurrent jobs (each flush itself parallelizes its
    # per-partition part writes), the same wall-clock shape a real
    # two-table backfill would have
    from clickhouse_mergetree_spark.parallel import run_concurrently

    run_concurrently([src.flush, dst.flush])
    before = dst.part_count()
    moved = len(src.parts_in_partition("purchase"))
    dst.attach_partition_from(src, "purchase")
    assert dst.part_count() == before + moved  # metadata-only commit
    dst.attach_partition_from(src, "signup", replace=True)
    return dst.query_all().select(
        "key", "ts_us", "event_id", "event_type", "value")


@declared_query(
    "q_merge_table",
    oracle=f"""
        SELECT key, ts_us, event_id,
               CASE WHEN key <= {RANGE_END} THEN 'events_cold'
                    ELSE 'events_hot' END AS _table
        FROM ({_dedup_first_sql(_KV_SQL)})
    """,
)
def q_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Merge`` table engine end-to-end (ClickHouse ``Merge(db,
    'regex')`` analog — extension): a hot/cold split — two independent
    MergeTree tables — read as ONE table through a MergeTable view, each
    row tagged with the virtual ``_table`` column naming its member.
    Member selection by name regex happens BEFORE any Spark plan exists
    (asserted: a pattern narrowed to one member plans only that member's
    parts), the coarsest prune there is; each member branch then applies
    its own manifest pruning and (key, ts) collapse, and the union adds
    no shuffle.

    The 100 TB shape this models: yearly/monthly tables queried as one,
    where name-level pruning drops whole tables before their manifests
    are even consulted."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MergeTable, MergeTreeConfig, SparkMergeTree)

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                          key_col="key", ts_col="ts_us")
    kv = _dedup_first(_kv(spark, sf_dir)).persist()  # shared by both loads
    cold = SparkMergeTree(spark, scratch_dir("q_mergetbl_cold_"),
                          schema=schema, config=cfg)
    hot = SparkMergeTree(spark, scratch_dir("q_mergetbl_hot_"),
                         schema=schema, config=cfg)
    # NOT parallelized (r13 measured): the shared kv dedup-window cache
    # dominates this fixture; overlapping the two ~0.4s part writes
    # requires materializing the cache in its own job first, which costs
    # exactly what the overlap saves (interleaved A/B flat at ~2.9s).
    cold.insert_batch(kv.filter(F.col("key") <= RANGE_END), row_count=1)
    cold.flush()
    hot.insert_batch(kv.filter(F.col("key") > RANGE_END), row_count=1)
    hot.flush()
    m = MergeTable({"events_cold": cold, "events_hot": hot})
    # name-level member pruning: one member matched -> one member planned
    assert [n for n, _ in m.member_tables("events_hot")] == ["events_hot"]
    assert m.query_all(pattern="events_hot").count() == hot.total_rows()
    return m.query_all().select("key", "ts_us", "event_id", "_table")


@declared_query(
    "q_optimize_dedup",
    oracle=f"""
        SELECT key, ts_us, event_id, event_type, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY key
                ORDER BY ts_us, event_id, event_type, value) AS rn
            FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        ) WHERE rn = 1
    """,
)
def q_optimize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``OPTIMIZE TABLE ... FINAL DEDUPLICATE BY key`` end-to-end
    (ClickHouse analog — extension): the manual cleanup for
    double-loaded data. The same batch is inserted TWICE (a replayed
    load), then the table force-merges each partition to one part while
    keeping exactly one row per ``key`` — the deterministic survivor,
    minimal in the remaining columns' sort order (ts_us, event_id,
    event_type, value), where ClickHouse keeps an arbitrary one. The
    oracle replays the identical window rule.

    Scale shape: one merge job per partition — the dedup adds a single
    row_number window on the merge's existing sort, no extra shuffle
    beyond what the rewrite already pays."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_optdedup_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
    for _ in range(2):  # replayed load
        table.insert_batch(kv, row_count=1)
        table.flush()
    stats = table.optimize_deduplicate(by=("key",))
    assert table.part_count() == 1
    assert stats["rows_after"] < stats["rows_before"]
    return table.query_all().select(
        "key", "ts_us", "event_id", "event_type", "value")


@declared_query(
    "q_sharded_agg",
    oracle=f"""
        SELECT event_type, count(*) AS cnt,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                    AS DOUBLE) AS sum_value,
               max(ts_us) AS max_ts
        FROM ({_dedup_first_sql(_KV_SQL)})
        GROUP BY event_type
    """,
)
def q_sharded_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed two-level aggregation over the sharded engine
    (ClickHouse ``Distributed`` read contract — extension): each of 4
    hash-routed shards computes a PARTIAL aggregate (count/sum/max) over
    its own collapsed rows, and the initiator merges the partials —
    counts and sums re-sum, max re-maxes. What crosses the final
    exchange is |groups| rows per shard, not the table: at 100 TB with a
    handful of event types this shuffles kilobytes. Sums run in
    decimal(18,6) end-to-end so partial-merge order cannot perturb the
    result; the oracle aggregates the same deduped rows globally —
    associativity makes shard-local-then-merge equal global."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (MergeTreeConfig,
                                                   ShardedMergeTree)

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DecimalType(18, 6), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = ShardedMergeTree(spark, scratch_dir("q_shardagg_"),
                             n_shards=4, schema=schema, config=cfg)
    # 4 shard part-writes reuse one cached dedup instead of 4 window runs
    kv = _dedup_first(_kv(spark, sf_dir)).select(
        "key", "ts_us", "event_id", "event_type",
        F.col("value").cast("decimal(18,6)").alias("value")).persist()
    table.insert_batch(kv, row_count=1)
    table.flush()
    assert all(s["rows"] > 0 for s in table.shard_stats())
    out = table.query_grouped(
        ("event_type",),
        {"cnt": ("count", ""), "sum_value": ("sum", "value"),
         "max_ts": ("max", "ts_us")})
    return out.select(
        "event_type", "cnt",
        F.col("sum_value").cast("decimal(18,6)").cast("double")
        .alias("sum_value"),
        "max_ts")


@declared_query(
    "q_system_columns",
    oracle="""
        SELECT * FROM (VALUES
            (0, 'key',   'bigint',        'original',
             CAST(NULL AS VARCHAR), TRUE,  0, CAST(NULL AS VARCHAR)),
            (1, 'ts_us', 'bigint',        'original',
             CAST(NULL AS VARCHAR), TRUE,  0, CAST(NULL AS VARCHAR)),
            (2, 'score', 'decimal(18,6)', 'original+modified',
             CAST(NULL AS VARCHAR), FALSE, 1, CAST(NULL AS VARCHAR)),
            (3, 'label', 'string',        'original+renamed',
             CAST(NULL AS VARCHAR), FALSE, 1, 'renamed from tag'),
            (4, 'note',  'string',        'added',
             'x',                   FALSE, 1, CAST(NULL AS VARCHAR))
        ) AS t(position, name, type, origin, "default",
               is_structural, parts_lagging, comment)
    """,
)
def q_system_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``system.columns`` introspection end-to-end (ClickHouse analog —
    extension): after a scripted ALTER sequence — ADD COLUMN note
    DEFAULT 'x', RENAME tag→label, MODIFY score → decimal(18,6) — the
    table reports each column's position, declared type, ALTER
    provenance, declared default, structural role (sorting-key columns),
    and how many live parts still lag the declaration physically (the
    count MATERIALIZE COLUMN would rewrite). The one pre-ALTER part lags
    on all three altered columns; the sorting key lags on none.

    Metadata-sized at any table scale: one row per column straight from
    the manifest, zero data files opened — exactly how ClickHouse serves
    system.columns. The oracle pins the full expected relation as
    literals (the DDL script is fixed, so the output is too)."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("tag", T.StringType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_syscols_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
    table.insert_batch(
        kv.select("key", "ts_us", F.col("value").alias("score"),
                  F.col("event_type").alias("tag")), row_count=1)
    table.flush()
    table.add_column("note", "string", default="x")
    table.comment_column("tag", "renamed from tag")
    table.rename_column("tag", "label")  # the comment must follow
    table.modify_column("score", "decimal(18,6)")
    return table.system_columns()


@declared_query(
    "q_sharded_join",
    oracle=f"""
        WITH kv AS ({_dedup_first_sql(_KV_SQL)}),
        dim AS (SELECT event_type, count(*) AS type_n
                FROM kv GROUP BY event_type)
        SELECT k.key, k.ts_us, k.event_id, k.event_type, d.type_n
        FROM kv k JOIN dim d USING (event_type)
    """,
)
def q_sharded_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GLOBAL JOIN`` over the Distributed engine (ClickHouse analog —
    extension): the join key (event_type) is NOT the sharding key
    (key), so a shard-local join would silently drop every match that
    hashes elsewhere — the classic Distributed-join footgun. GLOBAL
    evaluates the dimension once and broadcasts it to each of the 4
    shards, which join their own collapsed rows locally; fact rows
    never cross the network (asserted: every shard branch plans a
    BroadcastHashJoin, no shuffle on the fact side).

    At 100 TB this is THE distributed-join decision: broadcast
    node-memory-sized dimensions, reshard on the join key for anything
    bigger. The oracle joins the same deduped rows globally —
    broadcast-per-shard ∪ equals the global join because shards
    partition the fact rows."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (MergeTreeConfig,
                                                   ShardedMergeTree)

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = ShardedMergeTree(spark, scratch_dir("q_shardjoin_"),
                             n_shards=4, schema=schema, config=cfg)
    # 4 shard part-writes reuse one cached dedup instead of 4 window runs
    kv = _dedup_first(_kv(spark, sf_dir)).persist()
    table.insert_batch(kv, row_count=1)
    table.flush()
    dim = (table.query_all().groupBy("event_type")
           .agg(F.count("*").alias("type_n")))
    out = table.query_join_global(dim, ["event_type"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4, "shard joins not broadcast"
    return out.select("key", "ts_us", "event_id", "event_type", "type_n")


LATE_K = 100


@declared_query(
    "q_late_materialize",
    oracle=f"""
        SELECT e.event_id, e.user_id, e.event_type,
               epoch_us(e.ts) AS ts_us, e.value
        FROM events e
        JOIN (SELECT event_id FROM events
              ORDER BY value DESC, event_id LIMIT {LATE_K}) t
        USING (event_id)
    """,
)
def q_late_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late materialization — the columnar top-k idiom (ClickHouse does
    this implicitly via PREWHERE + ORDER BY ... LIMIT reading lazy
    columns; Spark needs it spelled out): phase 1 scans ONLY the 2-column
    (event_id, value) projection to find the top-{LATE_K} ids
    (TakeOrderedAndProject over a narrow scan — asserted on ReadSchema),
    phase 2 joins the {LATE_K}-row id set back (broadcast) to fetch the
    wide columns for just those rows.

    At 100 TB the difference is reading 2 columns of everything + all
    columns of {LATE_K} rows, versus all columns of everything — on a
    wide events table (long text props, nested payloads) that is an
    order-of-magnitude scan saving. Deterministic under value ties via
    the event_id tiebreak."""
    ev = load(spark, sf_dir, "events")
    top_ids = (ev.select("event_id", "value")
               .orderBy(F.col("value").desc(), "event_id")
               .limit(LATE_K).select("event_id"))
    plan = top_ids._jdf.queryExecution().executedPlan().toString()
    # the phase-1 scan must read ONLY the 2 needed columns
    assert "ReadSchema: struct<event_id:bigint,value:double>" in plan, plan
    out = ev.join(F.broadcast(top_ids), "event_id")
    return out.select("event_id", "user_id", "event_type",
                      F.unix_micros("ts").alias("ts_us"), "value")


@declared_query(
    "q_system_mutations",
    oracle=f"""
        WITH kv AS ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
        SELECT CAST(1 AS INT) AS mutation_id, 'delete' AS kind,
               CAST(1 AS INT) AS parts_scanned,
               CAST(1 AS INT) AS parts_rewritten,
               (SELECT count(*) FROM kv WHERE key = {POINT_KEY})
                   AS rows_affected,
               TRUE AS is_done
        UNION ALL
        SELECT 2, 'update', 1, 1,
               (SELECT count(*) FROM kv
                WHERE key <> {POINT_KEY} AND event_type = 'click'), TRUE
        UNION ALL
        SELECT 3, 'lw_delete', 1, 0, CAST(NULL AS BIGINT), TRUE
        UNION ALL
        SELECT 4, 'apply_mask', 1, 1,
               (SELECT count(*) FROM kv WHERE key = 3), TRUE
    """,
)
def q_system_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``system.mutations`` introspection end-to-end (ClickHouse analog —
    extension): after a scripted mutation sequence — ALTER DELETE (key =
    {POINT_KEY}), ALTER UPDATE (zero the click values), a lightweight
    ``DELETE FROM`` mask on key = 3, then APPLY DELETED MASK — the table
    reports each mutation's kind, parts scanned/rewritten, rows
    affected, and completion state. Each ledger row commits in the SAME
    manifest save as its mutation's own metadata (crash-consistent
    history), and a lightweight delete flips to is_done only when no
    live mask entry carries its id — the deferred delete has become
    physical, ClickHouse's is_done contract for _row_exists mutations.

    Metadata-sized at any scale (one row per mutation from the
    manifest); the oracle recomputes the affected-row counts
    relationally and pins the full expected ledger. The is_done=False
    window is also asserted in-flight, between the mask commit and its
    materialization."""
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_sysmut_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
    table.insert_batch(kv, row_count=1)
    table.flush()
    table.delete_where(F.col("key") == POINT_KEY)
    table.update_where(F.col("event_type") == "click",
                       {"value": F.lit(0.0)})
    table.lightweight_delete("key = 3")
    pending = {r["mutation_id"]: r["is_done"]
               for r in table.system_mutations().collect()}
    assert pending[3] is False, "mask not yet materialized ⇒ not done"
    table.materialize_deletes()
    return table.system_mutations().select(
        "mutation_id", "kind", "parts_scanned", "parts_rewritten",
        "rows_affected", "is_done")


PATH_FLOW_TOP = 20


@declared_query(
    "q_path_flow",
    oracle=f"""
        WITH seq AS (
            SELECT event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type AS src, next_type AS dst,
               count(*) AS n_transitions
        FROM seq
        WHERE next_type IS NOT NULL
        GROUP BY src, dst
        ORDER BY n_transitions DESC, src, dst
        LIMIT {PATH_FLOW_TOP}
    """,
)
def q_path_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-path flow analysis (the sankey/behavior-flow query —
    ClickHouse ships it as the sequenceCount/path dashboards): for every
    consecutive pair of events per user, count src→dst transitions and
    rank the heaviest edges.

    One window (partitioned by user_id, the natural key — millions of
    small partitions, no skew) computes each row's successor via lead();
    the edge count is then an ordinary partial+final hash aggregate on
    the (src, dst) pair — two shuffles total, both on well-distributed
    keys, no self-join (the naive formulation joins events to itself on
    adjacent ranks and doubles the shuffled bytes). (ts, event_id)
    ordering makes the successor deterministic under timestamp ties.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return (
        seq.groupBy("src", "dst").agg(F.count("*").alias("n_transitions"))
        .orderBy(F.col("n_transitions").desc(), "src", "dst")
        .limit(PATH_FLOW_TOP)
    )


@declared_query(
    "q_kill_mutation",
    oracle=_dedup_first_sql(
        _KV_SQL, f"key <= {RANGE_END} AND event_type <> 'error'"),
)
def q_kill_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KILL MUTATION end-to-end (ClickHouse ops staple — extension): two
    lightweight deletes go live ('click' rows, then 'error' rows), the
    first is KILLed — its mask stops applying and the click rows
    reappear, rows being still physical in the unrewritten parts — and
    the second is materialized, physically removing the error rows. The
    returned read proves both directions: click rows present (killed
    delete left no trace), error rows absent (surviving delete applied).
    system.mutations is asserted mid-flight: the killed mutation shows
    is_killed and never is_done, the materialized one completes.

    Kill is one versioned metadata commit — zero rows read or written at
    any table size; the restore costs nothing because the deferred
    delete never touched the parts in the first place.
    """
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MergeTreeConfig, SparkMergeTree)

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_killmut_"),
                           schema=schema, config=cfg)
    kv = _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
    table.insert_batch(kv, row_count=1)
    table.flush()
    n_all = table.query_all().count()
    table.lightweight_delete("event_type = 'click'")
    table.lightweight_delete("event_type = 'error'")
    assert table.query_all().count() < n_all
    r = table.kill_mutation(1)
    assert r["mutation_id"] == 1 and r["parts_unmasked"] > 0
    table.materialize_deletes()
    muts = {m["mutation_id"]: m
            for m in table.system_mutations().collect()}
    assert muts[1]["is_killed"] and not muts[1]["is_done"]
    assert muts[2]["is_done"] and not muts[2]["is_killed"]
    return table.query_all().select(
        "key", "ts_us", "event_id", "event_type", "value")


@declared_query(
    "q_move_partition",
    oracle=f"""
        SELECT *,
               CASE WHEN event_type = 'click' THEN 'dst' ELSE 'src' END
                   AS tbl
        FROM ({_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}")})
    """,
)
def q_move_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOVE PARTITION TO TABLE end-to-end (ClickHouse's resharding/
    tiering primitive — extension), run as the real runbook sequence:
    SYSTEM STOP MERGES on the source, bulk load, SYSTEM START MERGES,
    then move the 'click' partition into a second table. The returned
    union (each row tagged with its table) proves the move is exact and
    destructive: click rows live only in the destination, everything
    else only in the source.

    The move itself is hardlink + two manifest commits — zero rows read
    at any table size — which is why partition moves are how 100 TB
    re-tiers between tables. The stop/start bracket is the standard
    guard that keeps the merge scheduler from compacting mid-load parts
    the move is about to take.
    """
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MergeTreeConfig, SparkMergeTree)

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = dict(memtable_flush_threshold=10**12, max_parts=10,
               partition_col="event_type", key_col="key", ts_col="ts_us")
    src = SparkMergeTree(spark, scratch_dir("q_movesrc_"),
                         schema=schema, config=MergeTreeConfig(**cfg))
    dst = SparkMergeTree(spark, scratch_dir("q_movedst_"),
                         schema=schema, config=MergeTreeConfig(**cfg))
    src.stop_merges()
    kv = _kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)
    src.insert_batch(kv, row_count=1)
    src.flush()
    src.start_merges()
    moved = src.move_partition_to(dst, "click")
    assert moved > 0
    assert "click" not in src.partitions()
    assert dst.partitions() == ["click"]
    tag = lambda df, t: df.select(  # noqa: E731
        "key", "ts_us", "event_id", "event_type", "value",
        F.lit(t).alias("tbl"))
    return tag(src.query_all(), "src").unionAll(tag(dst.query_all(), "dst"))


@declared_query(
    "q_projection_sort",
    oracle=_dedup_first_sql(_KV_SQL, "value BETWEEN 1.0 AND 50.0"),
)
def q_projection_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort projection end-to-end (ClickHouse ``PROJECTION p (SELECT *
    ORDER BY col)`` — the secondary-index read path): the table is
    keyed on user_id, the query filters on VALUE — the access pattern
    the primary sort order serves worst. A sort projection gives every
    part a copy re-sorted by value, so the range filter pushes into
    monotone parquet row-group stats and prunes INSIDE each part;
    without it the filter scans every row-group because values are
    scattered across the key-sorted layout.

    Routing is asserted: the planned scan reads projection files, not
    primary part files. Dirty parts (live delete masks, lagging schema)
    fall back to the evolved primary path automatically, so correctness
    never depends on materialization state. At 100 TB this is the
    difference between a secondary-key range query scanning the table
    and scanning the few row-groups whose [min,max] intersect.
    """
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MergeTreeConfig, ProjectionSpec, SparkMergeTree)

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(
        memtable_flush_threshold=10**12, max_parts=10,
        projections=(ProjectionSpec("by_value", (), {}, ("value",)),),
        key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_projsort_"),
                           schema=schema, config=cfg)
    kv = _kv(spark, sf_dir)
    half = kv.filter(F.col("event_id") % 2 == 0)
    table.insert_batch(half, row_count=1)
    table.flush()
    table.insert_batch(kv.subtract(half), row_count=1)
    table.flush()
    df = table.query_col_range("value", 1.0, 50.0)
    assert any("proj_by_value" in f for f in df.inputFiles()), \
        "sort projection did not serve the read"
    return df.select("key", "ts_us", "event_id", "event_type", "value")


@declared_query(
    "q_sharded_global_in",
    oracle=f"""
        WITH kv AS ({_dedup_first_sql(_KV_SQL)}),
        counts AS (
            SELECT event_type, count(*) AS n FROM kv GROUP BY event_type
        ), hot AS (
            SELECT event_type FROM counts
            WHERE n > (SELECT avg(n) FROM counts)
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS value_sum
        FROM kv
        WHERE event_type IN (SELECT event_type FROM hot)
        GROUP BY event_type
    """,
)
def q_sharded_global_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GLOBAL IN`` over the Distributed engine (ClickHouse analog —
    extension): the membership subquery — event types with
    above-average row counts — reads the SHARDED TABLE ITSELF, the
    exact case where non-GLOBAL IN is wrong (each shard would compute
    'above-average' from its own slice and filter against a different
    set). GLOBAL evaluates the set once over all shards, broadcasts it,
    and each shard filters locally with a LEFT SEMI join — fact rows
    never cross the network.

    At 100 TB the set side is |event types| rows — node-memory trivially
    — while the fact side stays shard-local; the semi-join (never inner)
    guarantees set duplicates cannot multiply fact rows.
    """
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (MergeTreeConfig,
                                                   ShardedMergeTree)

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=10,
                          key_col="key", ts_col="ts_us")
    table = ShardedMergeTree(spark, scratch_dir("q_shardin_"),
                             n_shards=4, schema=schema, config=cfg)
    kv = _dedup_first(_kv(spark, sf_dir)).persist()
    table.insert_batch(kv, row_count=1)
    table.flush()
    counts = table.query_all().groupBy("event_type").agg(
        F.count("*").alias("n"))
    # above-average gate via an unpartitioned window — counts is |types|
    # rows (post-aggregation), so the single-partition window is trivial
    hot = (counts.withColumn("nbar", F.avg("n").over(W.partitionBy()))
           .filter(F.col("n") > F.col("nbar")).select("event_type"))
    return (
        table.query_in_global(hot, ["event_type"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.col("value").cast("decimal(18,6)"))
             .cast("double").alias("value_sum"))
    )


@declared_query(
    "q_null_engine",
    oracle=f"""
        SELECT event_type,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS value_sum,
               count(*) AS n_rows
        FROM ({_KV_SQL}) WHERE key <= {RANGE_END}
        GROUP BY event_type
    """,
)
def q_null_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ENGINE = Null`` ingest pipeline (ClickHouse's standard
    ingest-transform pattern — extension): raw blocks INSERT into a Null
    table that stores nothing; an attached materialized view pushes each
    block into a summing-mode rollup target. Three batches flow through;
    the Null source is asserted empty, and the returned rollup carries
    every row — proving the MV trigger fired on all blocks even though
    the source discarded them.

    The 100 TB case for Null: when queries only ever read rollups,
    storing the raw stream is pure cost — the Null source keeps the MV
    maintenance machinery (batch-local partial aggregation, merge-time
    summation) and drops the storage. Measures are DECIMAL so the
    incremental == one-shot hash comparison is order-independent.
    """
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (
        MaterializedView, MergeTreeConfig, NullTable, SparkMergeTree)

    src_schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    mv_schema = T.StructType([
        T.StructField("event_type", T.StringType(), False),
        T.StructField("marker_ts", T.LongType(), False),
        T.StructField("value_sum", T.DecimalType(18, 6), True),
        T.StructField("n_rows", T.LongType(), False),
    ])

    def rollup(df: DataFrame) -> DataFrame:
        return (df.groupBy("event_type")
                .agg(F.sum(F.col("value").cast("decimal(18,6)"))
                     .cast("decimal(18,6)").alias("value_sum"),
                     F.count("*").alias("n_rows"))
                .select("event_type", F.lit(0).alias("marker_ts"),
                        "value_sum", "n_rows"))

    src = NullTable(spark, src_schema)
    mv = MaterializedView(
        SparkMergeTree(
            spark, scratch_dir("q_null_tgt_"), schema=mv_schema,
            config=MergeTreeConfig(memtable_flush_threshold=10**12,
                                   max_parts=2, mode="summing",
                                   key_col="event_type",
                                   ts_col="marker_ts")),
        rollup)
    src.attach_view(mv)
    kv = (_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END)).persist()
    for i in range(3):
        src.insert_batch(kv.filter(F.pmod(F.col("event_id"), F.lit(3)) == i))
    src.flush()
    assert src.query_all().count() == 0 and src.total_rows() == 0
    return mv.query().select("event_type", F.col("value_sum")
                             .cast("double"), "n_rows")


@declared_query(
    "q_seq_next_node",
    oracle="""
        WITH r AS (
            SELECT user_id, event_type, ts, event_id,
                   lead(event_type) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                     AS next_type,
                   row_number() OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                     AS rn
            FROM events
        ),
        firsts AS (
            SELECT user_id, next_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY rn)
                     AS k
            FROM r WHERE event_type = 'signup'
        )
        SELECT user_id, next_type AS after_first_signup
        FROM firsts WHERE k = 1
    """,
)
def q_seq_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode('forward', 'head')``: for each user,
    the event that IMMEDIATELY follows the first occurrence of the base
    condition (here: first signup) in time order — the "what happens
    next" primitive behind onboarding-path analysis. NULL when the
    signup is the user's last event; users who never sign up are absent.

    One hash(user_id) shuffle serves everything: lead() and both
    row_numbers ride the same (ts, event_id) sort, so Spark plans a
    single Window operator stack over one exchange, then a filter —
    per-user state is one row, corpus order never re-shuffles. The
    deterministic tiebreak (event_id) makes "first" and "next"
    well-defined under timestamp ties on both engines.
    """
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.row_number().over(w).alias("rn"),
    )
    firsts = (
        r.filter(F.col("event_type") == "signup")
        .select("user_id", "next_type",
                F.row_number().over(
                    W.partitionBy("user_id").orderBy("rn")).alias("k"))
    )
    return firsts.filter(F.col("k") == 1).select(
        "user_id", F.col("next_type").alias("after_first_signup"))


@declared_query(
    "q_events_markov",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type AS cur,
                   lead(event_type) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                     AS nxt
            FROM events
        ),
        c AS (
            SELECT cur, nxt, count(*) AS n
            FROM seq WHERE nxt IS NOT NULL
            GROUP BY cur, nxt
        )
        SELECT cur, nxt, n,
               round(CAST(n AS DOUBLE)
                     / sum(n) OVER (PARTITION BY cur), 9) AS p
        FROM c
    """,
)
def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next = b | current = a) with transition counts — the
    model behind next-action prediction and funnel-leak diagnosis
    (ClickHouse users build this exact matrix with sequence functions +
    array joins; here it is one window + one aggregate).

    One hash(user_id) exchange feeds the lead() window (per-user time
    order, event_id tiebreak); transitions then collapse in a
    partial+final agg keyed by (cur, next) — at most |types|² rows reach
    the final stage regardless of corpus size, and the row-normalization
    window runs over that vocabulary-sized table for free.
    """
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"))
    c = (seq.filter(F.col("nxt").isNotNull())
         .groupBy("cur", "nxt").agg(F.count("*").alias("n")))
    wrow = W.partitionBy("cur")
    return c.select(
        "cur", "nxt", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wrow), 9)
        .alias("p"))


@declared_query(
    "q_events_rfm",
    oracle="""
        WITH base AS (
            SELECT user_id,
                   max(epoch_us(ts)) AS last_us,
                   CAST(count(*) AS BIGINT) AS frequency,
                   round(sum(value), 6) AS monetary
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        anchor AS (SELECT max(last_us) AS now_us FROM base)
        SELECT user_id,
               CAST(floor((now_us - last_us) / 86400000000.0) AS BIGINT)
                 AS recency_days,
               frequency, monetary,
               CAST(ntile(5) OVER (ORDER BY last_us, user_id) AS INT)
                 AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INT)
                 AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary, user_id) AS INT)
                 AS m_score
        FROM base CROSS JOIN anchor
    """,
)
def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) over purchase
    events — the classic CRM scoring every analytics engine gets asked
    for: days since last purchase (anchored at the corpus max so the
    query is deterministic), purchase count, spend sum, and quintile
    scores 1–5 for each axis (ntile with a user_id tiebreak so both
    engines cut identical quintiles).

    One partial+final agg on user_id collapses the corpus to one row per
    purchaser; everything after — the 1-row anchor broadcast and three
    ntile windows — runs over the user-cardinality table, not the event
    stream. The three windows are the honest cost of exact quintiles
    (three sorts of |users| rows); at extreme user counts they bucket
    the same way q_stat_mannwhitney's rank note documents.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase")
    base = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count("*").alias("frequency"),
        F.round(F.sum("value"), 6).alias("monetary"))
    anchor = base.agg(F.max("last_us").alias("now_us"))
    return (
        base.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.floor((F.col("now_us") - F.col("last_us")) / 86400000000.0)
            .cast("bigint").alias("recency_days"),
            "frequency", "monetary",
            F.ntile(5).over(W.orderBy("last_us", "user_id"))
            .cast("int").alias("r_score"),
            F.ntile(5).over(W.orderBy("frequency", "user_id"))
            .cast("int").alias("f_score"),
            F.ntile(5).over(W.orderBy("monetary", "user_id"))
            .cast("int").alias("m_score"),
        )
    )


GAP_THRESHOLD_US = 6 * 3600 * 1000000  # 6 hours


@declared_query(
    "q_ts_gaps",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                   lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                     AS prev_us
            FROM events
        )
        SELECT user_id, prev_us AS gap_start_us, ts_us AS gap_end_us,
               ts_us - prev_us AS gap_us
        FROM seq
        WHERE prev_us IS NOT NULL
          AND ts_us - prev_us > {GAP_THRESHOLD_US}
    """,
)
def q_ts_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap detection: every silent interval longer than 6
    hours in each user's event stream, with its boundaries — the
    monitoring primitive behind "did ingestion stall?" and "which
    devices went dark?" dashboards (the complement of WITH FILL, which
    papers over the gaps this query surfaces).

    One lag() over the per-user (ts, event_id) order — a single
    hash(user_id) exchange and sort, O(1) state per row, then a
    stateless filter. The deterministic tiebreak makes gap boundaries
    well-defined under equal timestamps on both engines. At 100 TB this
    is the cheapest possible shape for the question: no self-join, no
    windowing by wall-clock buckets, no densification.
    """
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"))
    return (
        seq.filter(F.col("prev_us").isNotNull()
                   & (F.col("ts_us") - F.col("prev_us") > GAP_THRESHOLD_US))
        .select("user_id",
                F.col("prev_us").alias("gap_start_us"),
                F.col("ts_us").alias("gap_end_us"),
                (F.col("ts_us") - F.col("prev_us")).alias("gap_us"))
    )


@declared_query(
    "q_events_cohort_matrix",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT e.user_id, f.cohort_week,
                   CAST(floor(date_diff('day', f.cohort_week,
                                        CAST(date_trunc('week', e.ts)
                                             AS DATE)) / 7.0) AS BIGINT)
                     AS week_offset
            FROM events e JOIN firsts f ON e.user_id = f.user_id
        ),
        sizes AS (
            SELECT cohort_week, count(*) AS cohort_size
            FROM firsts GROUP BY cohort_week
        )
        SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort_week,
               a.week_offset,
               CAST(count(*) AS BIGINT) AS n_active,
               s.cohort_size,
               round(count(*) * 1.0 / s.cohort_size, 6) AS retention
        FROM activity a JOIN sizes s ON a.cohort_week = s.cohort_week
        GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    """,
)
def q_events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    each cell = share of the cohort active in week N after joining —
    the classic product-analytics triangle (q_events_retention's day-N
    check generalized to the full grid).

    Three aggregates, all user-keyed or cohort-keyed: first-week per
    user (one agg), distinct (user, week-offset) activity (one agg over
    the firsts join — the join key is user_id, co-partitioned with the
    first agg's output so AQE plans it shuffle-free on the fact side's
    existing partitioning), cohort sizes (aggregating the tiny firsts
    table). The matrix itself is |cohorts × offsets| rows — dashboard-
    sized at any corpus scale.
    """
    ev = load(spark, sf_dir, "events")
    week = F.to_date(F.date_trunc("week", "ts"))
    firsts = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select("user_id", "cohort_week",
                F.floor(F.datediff(week, F.col("cohort_week")) / 7.0)
                .cast("bigint").alias("week_offset"))
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size"))
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset", "n_active", "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6)
            .alias("retention"))
    )


ANOMALY_WINDOW = 20
ANOMALY_Z = 3.0


@declared_query(
    "q_events_anomaly",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
                   avg(value) OVER w AS mu,
                   stddev_samp(value) OVER w AS sigma,
                   count(*) OVER w AS n_hist
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {ANOMALY_WINDOW} PRECEDING
                                  AND 1 PRECEDING)
        )
        SELECT user_id, event_id, ts_us, value,
               round(mu, 6) AS mu,
               round((value - mu) / sigma, 6) AS z
        FROM seq
        WHERE n_hist >= 10 AND sigma > 0
          AND abs((value - mu) / sigma) > {ANOMALY_Z}
    """,
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: every event whose value sits
    more than {ANOMALY_Z}σ from its own user's trailing-{ANOMALY_WINDOW}
    mean — the self-baselining monitor that flags per-entity outliers
    without any global threshold (a user whose values run hot isn't
    flagged for being hot, only for deviating from their own history).

    One window spec computes mean, sample std, and history count over
    the same bounded trailing frame — a single hash(user_id) exchange
    and per-user sort, O(frame) state per row, stateless filter after.
    The warm-up guard (≥10 prior points) and σ>0 keep the statistic
    defined; both engines share Bessel-corrected stddev_samp exactly.
    """
    ev = load(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-ANOMALY_WINDOW, -1))
    seq = ev.select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("ts_us"), "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_hist"))
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        seq.filter((F.col("n_hist") >= 10) & (F.col("sigma") > 0)
                   & (F.abs(z) > ANOMALY_Z))
        .select("user_id", "event_id", "ts_us", "value",
                F.round("mu", 6).alias("mu"),
                F.round(z, 6).alias("z"))
    )


@declared_query(
    "q_events_dau_wau",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        days AS (SELECT DISTINCT day FROM pairs)
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
               CAST(count(DISTINCT CASE WHEN p.day = d.day
                                        THEN p.user_id END) AS BIGINT)
                 AS dau,
               CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau,
               round(count(DISTINCT CASE WHEN p.day = d.day
                                         THEN p.user_id END) * 1.0
                     / count(DISTINCT p.user_id), 6) AS stickiness
        FROM days d
        JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
    """,
)
def q_events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / stickiness per day (the engagement dashboard's
    headline row): daily distinct actives, trailing-7-day distinct
    actives, and their ratio. Distinct-over-a-sliding-window does NOT
    decompose into window aggregates (distinct isn't subtractable), so
    the standard exact shape is: dedup the corpus to (day, user) pairs
    ONCE, then join the day spine onto the pairs with a 7-day band and
    count distinct per day.

    Cost at scale: the corpus-sized work is the ONE (day, user) dedup
    agg; each pair then EXPLODES to the ≤7 spine days it covers (a fixed
    ×7 multiplier — turning the range condition into an EQUI key, so the
    spine attach is a broadcast hash join, never a nested loop), and the
    final distinct-count agg runs over |days × daily-actives × 7| — the
    engagement table, not the event stream. ClickHouse does the same via
    uniqExact over range-joined days (or uniqState merges for the
    approximate tier, which is this plan with the HLL swap).
    """
    ev = load(spark, sf_dir, "events")
    pairs = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = pairs.select("day").distinct()
    d = days.select(F.col("day").alias("spine_day"))
    expanded = pairs.select(
        "day", "user_id",
        F.explode(F.sequence(
            F.col("day"), F.date_add(F.col("day"), 6))).alias("spine_day"))
    # inner equi-join to the observed-day spine drops synthetic spine
    # days past the corpus edge (exactly the oracle's days set)
    joined = expanded.join(F.broadcast(d), "spine_day")
    return (
        joined.groupBy("spine_day")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("spine_day"),
                       F.col("user_id"))).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .select(
            F.date_format("spine_day", "yyyy-MM-dd").alias("day"),
            "dau", "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"))
    )


# ---------------------------------------------------------------------------
# Round 8: windowFunnel + transition dwell times
# ---------------------------------------------------------------------------

FUNNEL_WINDOW_US = 6 * 3600 * 1_000_000  # 6 hours


@declared_query(
    "q_window_funnel",
    defer=True,
    oracle=f"""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
                   FROM events
                   WHERE event_type IN ('view', 'click', 'purchase')),
        l1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
        l2 AS (SELECT DISTINCT v.user_id FROM e v JOIN e c USING (user_id)
               WHERE v.event_type = 'view' AND c.event_type = 'click'
                 AND c.t > v.t AND c.t - v.t <= {FUNNEL_WINDOW_US}),
        l3 AS (SELECT DISTINCT v.user_id FROM e v
               JOIN e c ON v.user_id = c.user_id
               JOIN e p ON p.user_id = v.user_id
               WHERE v.event_type = 'view' AND c.event_type = 'click'
                 AND p.event_type = 'purchase'
                 AND c.t > v.t AND p.t > c.t
                 AND p.t - v.t <= {FUNNEL_WINDOW_US}),
        u AS (SELECT DISTINCT user_id FROM e)
        SELECT user_id,
               CASE WHEN user_id IN (SELECT user_id FROM l3) THEN 3
                    WHEN user_id IN (SELECT user_id FROM l2) THEN 2
                    WHEN user_id IN (SELECT user_id FROM l1) THEN 1
                    ELSE 0 END AS funnel_level
        FROM u
    """,
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(window)(ts, cond1, cond2, cond3)``: per
    user, the deepest funnel prefix view -> click -> purchase completed
    with STRICTLY increasing timestamps and the whole chain inside a
    6-hour window of its first event — the conversion-depth aggregate
    every product dashboard runs (q_events_funnel is the unwindowed
    step-count variant; this is the real windowed CH semantics).

    ONE shuffle on user_id, then a per-user sorted fold (exactly CH's
    aggregate-state algorithm): events sorted by (t, step DESC) — ties
    process deeper steps first, so an equal-timestamp pair can never
    chain — and a 3-slot state of chain-START timestamps where a step-k
    event extends the best (latest-start) level-(k-1) chain iff
    t - start <= window. Greedy max-start is exact: a chain's future
    extensions depend only on its start, and starts are monotone over
    the scan. State is 3 longs per user regardless of corpus size; the
    oracle cross-proves with the independent EXISTS-join formulation.
    """
    neg = -(2 ** 63)
    e = (load(spark, sf_dir, "events")
         .filter(F.col("event_type").isin("view", "click", "purchase"))
         .select("user_id",
                 F.unix_micros("ts").alias("t"),
                 F.when(F.col("event_type") == "view", 1)
                 .when(F.col("event_type") == "click", 2)
                 .otherwise(3).alias("step")))
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(
            F.struct("t", (3 - F.col("step")).alias("o"), "step")))
        .alias("evs"))
    fold = F.expr(f"""
        aggregate(
            evs,
            named_struct('l1', CAST(NULL AS BIGINT),
                         'l2', CAST(NULL AS BIGINT),
                         'l3', CAST(NULL AS BIGINT)),
            (acc, e) -> named_struct(
                'l1', IF(e.step = 1,
                         greatest(coalesce(acc.l1, {neg}L), e.t), acc.l1),
                'l2', IF(e.step = 2 AND acc.l1 IS NOT NULL
                         AND e.t - acc.l1 <= {FUNNEL_WINDOW_US},
                         greatest(coalesce(acc.l2, {neg}L), acc.l1),
                         acc.l2),
                'l3', IF(e.step = 3 AND acc.l2 IS NOT NULL
                         AND e.t - acc.l2 <= {FUNNEL_WINDOW_US},
                         greatest(coalesce(acc.l3, {neg}L), acc.l2),
                         acc.l3)))
    """)
    return per_user.select(
        "user_id",
        F.when(fold.getField("l3").isNotNull(), 3)
        .when(fold.getField("l2").isNotNull(), 2)
        .when(fold.getField("l1").isNotNull(), 1)
        .otherwise(0).alias("funnel_level"))


@declared_query(
    "q_path_dwell",
    defer=True,
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, epoch_us(ts) AS t,
                   lag(event_type) OVER w AS prev_type,
                   lag(epoch_us(ts)) OVER w AS prev_t
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT prev_type, event_type AS next_type,
               count(*) AS n,
               round(avg(t - prev_t) / 1000000.0, 3) AS avg_dwell_sec
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    """,
)
def q_path_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition dwell times: for every (prev event -> next event) pair
    in each user's timeline, the transition count and mean dwell — the
    edge weights of a time-annotated Sankey / user-journey graph
    (q_path_flow gives the topology; this adds the latency dimension).

    One shuffle on user_id feeds the lag window; the (prev, next) rollup
    reuses the partial+final agg path with a 25-key result (|types|²) —
    no per-pair self-join, no corpus-global ordering. Ties inside a
    user's timeline break on the unique event_id in BOTH engines, so the
    lag pairing is deterministic.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id",
        F.unix_micros("ts").alias("t"))
    seq = e.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
        (F.col("t") - F.lag("t").over(w)).alias("dwell_us"))
    return (seq.filter(F.col("prev_type").isNotNull())
            .groupBy("prev_type", "next_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("dwell_us") / 1_000_000.0, 3)
                 .alias("avg_dwell_sec")))


_EXCHANGE_DDL = """
    CREATE TABLE {name} (
        key        UInt64,
        ts_us      Int64,
        event_id   Nullable(Int64),
        event_type String,
        value      Nullable(Float64)
    ) ENGINE = MergeTree()
    ORDER BY (key, ts_us)
"""


@declared_query(
    "q_exchange_tables",
    oracle=f"""
        WITH kv AS ({_dedup_first_sql(_KV_SQL)})
        SELECT 'events_live' AS tbl, key, ts_us, event_id, event_type,
               value
        FROM kv WHERE key <= {RANGE_END}
        UNION ALL
        SELECT 'events_staged', key, ts_us, event_id, event_type, value
        FROM kv WHERE key > {RANGE_END}
    """,
    defer=True,
)
def q_exchange_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``EXCHANGE TABLES a AND b`` end-to-end (extension —
    the atomic blue/green swap): staging is loaded and validated, then
    swaps identities with the live table in ONE registry commit — no
    window where either name is missing, which is exactly what a RENAME
    chain through a temp name cannot give. The post-swap read goes
    through the session's SELECT router under the PUBLIC names, so the
    hash proves both names now serve the other table's rows.

    Metadata-only at any scale: the swap moves two registry pointers
    (ClickHouse swaps two StorageIDs); zero part files are touched —
    asserted via object identity across the exchange.
    """
    from clickhouse_mergetree_spark.chsql import ClickHouseSession
    from clickhouse_mergetree_spark.scratch import scratch_dir

    sess = ClickHouseSession(spark, scratch_dir("q_exchange_"))
    sess.execute(_EXCHANGE_DDL.format(name="events_live"))
    sess.execute(_EXCHANGE_DDL.format(name="events_staged"))
    kv = _dedup_first(_kv(spark, sf_dir)).persist()
    # live serves the old (large-key) half; staging loads the new cut.
    # NOT parallelized (r13 measured): same shared-cache economics as
    # q_merge_table — the overlap of two small writes costs a cache
    # materialization job that cancels the saving (A/B flat ~2.8s).
    sess.tables["events_live"].insert_batch(
        kv.filter(F.col("key") > RANGE_END), row_count=1)
    sess.tables["events_live"].flush()
    sess.tables["events_staged"].insert_batch(
        kv.filter(F.col("key") <= RANGE_END), row_count=1)
    sess.tables["events_staged"].flush()
    live_obj = sess.tables["events_live"]
    staged_obj = sess.tables["events_staged"]
    sess.execute("EXCHANGE TABLES events_live AND events_staged")
    # pointer swap, not a copy: the OBJECTS traded names, parts untouched
    assert sess.tables["events_live"] is staged_obj
    assert sess.tables["events_staged"] is live_obj
    cols = ["key", "ts_us", "event_id", "event_type", "value"]
    live = sess.execute("SELECT * FROM events_live")
    staged = sess.execute("SELECT * FROM events_staged")
    return (live.select(F.lit("events_live").alias("tbl"), *cols)
            .unionAll(staged.select(F.lit("events_staged").alias("tbl"),
                                    *cols)))


@declared_query(
    "q_system_tables",
    oracle=f"""
        WITH kv AS ({_dedup_first_sql(_KV_SQL)})
        SELECT 'events_big' AS name, 'MergeTree' AS engine,
               3 AS active_parts,
               (SELECT count(*) FROM kv WHERE key <= {RANGE_END})
                 AS total_rows
        UNION ALL
        SELECT 'events_small', 'MergeTree', 1,
               (SELECT count(*) FROM kv WHERE key > {RANGE_END})
    """,
    defer=True,
)
def q_system_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``system.tables`` introspection end-to-end (the companion of
    E59's system.parts and E111's system.columns): one row per table the
    session knows — name, engine, live part count, total rows — straight
    from each table's in-memory manifest, metadata-only at any table
    size (no part file opens; CH reads the same numbers from
    StorageMergeTree's data-parts vector).

    The fixture makes every ledger cell deterministic: events_big takes
    three event_id-banded inserts (3 parts), events_small one insert
    (1 part), so the oracle recomputes part counts as literals and row
    counts relationally — a hash match proves the manifest's table-level
    stats agree with the data's truth.
    """
    from clickhouse_mergetree_spark.chsql import ClickHouseSession
    from clickhouse_mergetree_spark.scratch import scratch_dir

    sess = ClickHouseSession(spark, scratch_dir("q_systables_"))
    sess.execute(_EXCHANGE_DDL.format(name="events_big"))
    sess.execute(_EXCHANGE_DDL.format(name="events_small"))
    kv = _dedup_first(_kv(spark, sf_dir)).persist()
    big = sess.tables["events_big"]
    small = sess.tables["events_small"]

    # big's 3-part banded loop is sequential WITHIN its table (the part
    # ids/bands are the fixture's point); small is an independent table,
    # so its single load overlaps big's loop as a concurrent job
    from clickhouse_mergetree_spark.parallel import run_concurrently

    def load_big() -> None:
        for i in range(3):
            big.insert_batch(kv.filter((F.col("key") <= RANGE_END)
                                       & (F.pmod("event_id", F.lit(3)) == i)),
                             row_count=1)
            big.flush()

    def load_small() -> None:
        small.insert_batch(kv.filter(F.col("key") > RANGE_END), row_count=1)
        small.flush()

    run_concurrently([load_big, load_small])
    rows = [(name, "MergeTree", t.part_count(), t.total_rows())
            for name, t in sorted(sess.tables.items())]
    return spark.createDataFrame(
        rows, "name string, engine string, active_parts int, "
              "total_rows long")


@declared_query(
    "q_backup_restore",
    oracle=_dedup_first_sql(_KV_SQL, f"key <= {RANGE_END}"),
    defer=True,
)
def q_backup_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``BACKUP TABLE`` / ``RESTORE`` end-to-end via the FREEZE machinery
    (ClickHouse 22.8's BACKUP is FREEZE + a manifest, and the manual
    restore flow is cp-into-detached + ATTACH — both reproduced here):
    freeze the whole table (hardlinks, zero copy), destroy data with a
    physical ``ALTER DELETE`` rewrite, then restore the backup and read.
    The (key, ts) dedup read collapses the restored/live duplicates, so
    a hash match against the ORIGINAL content proves the frozen bytes
    survived a mutation that rewrote the live parts — the actual
    disaster-recovery contract, not just "files exist".

    O(files) metadata work at any scale on both sides of the round trip:
    freeze links inodes (merges create new dirs, so later rewrites
    cannot touch frozen bytes), restore re-links them back under fresh
    part ids. The only data-sized work is the deliberate delete rewrite
    in the middle.
    """
    from pyspark.sql import types as T

    from clickhouse_mergetree_spark.engine import (MergeTreeConfig,
                                                   SparkMergeTree)
    from clickhouse_mergetree_spark.scratch import scratch_dir

    schema = T.StructType([
        T.StructField("key", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                          key_col="key", ts_col="ts_us")
    table = SparkMergeTree(spark, scratch_dir("q_backup_"),
                           schema=schema, config=cfg)
    kv = _dedup_first(_kv(spark, sf_dir).filter(F.col("key") <= RANGE_END))
    table.insert_batch(kv, row_count=1)
    table.flush()
    n_before = table.total_rows()
    snap = table.freeze_partition(backup_name="pre_incident")
    assert snap["parts_frozen"] >= 1 and snap["files"] >= 1
    # the incident: a physical rewrite drops every 'click' row
    table.delete_where(F.col("event_type") == "click")
    assert table.total_rows() < n_before
    restored = table.restore_frozen("pre_incident")
    assert restored["parts_restored"] == snap["parts_frozen"]
    # dedup read collapses live/restored duplicates back to the original
    return table.query_all().select(
        "key", "ts_us", "event_id", "event_type", "value")
