"""Source/sink format surface — CSV and JSON-lines round trips.

The reference stores its own binary parts and nothing else; a usable
analytics engine also has to EXPORT results and INGEST foreign text
formats (ClickHouse's ``INTO OUTFILE ... FORMAT CSV`` / ``FORMAT
JSONEachRow`` and file() table function). Spark has both directions
built in (``df.write.csv/json``, ``spark.read.csv/json``); the value
verified here is LOSSLESSNESS of the round trip — types, nulls, and
full double precision survive text serialization — hash-checked against
the original parquet rows.

Scale notes: both writers are plain per-partition narrow jobs (no
shuffle) producing one file per partition — at 100 TB export
parallelism equals partition count, and the readers are splittable
scans with explicitly provided schemas (inference reads the data
twice and can mistype empty columns; never at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.scratch import scratch_dir
from clickhouse_mergetree_spark.tables import load

_RT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("ts_us", T.LongType(), True),
    T.StructField("value", T.DoubleType(), True),
])


@declared_query(
    "q_format_roundtrip",
    oracle="""
        SELECT t.fmt, e.event_id, e.user_id, e.event_type,
               epoch_us(e.ts) AS ts_us, e.value
        FROM events e CROSS JOIN (VALUES ('csv'), ('jsonl')) AS t(fmt)
    """,
)
def q_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV + JSON-lines sink/source round trip (ClickHouse ``INTO
    OUTFILE FORMAT CSV`` / ``FORMAT JSONEachRow`` + ``file()`` analog):
    the events table is exported to both text formats and read back
    with explicit schemas; the union of both read-backs, tagged by
    format, must hash-match two copies of the original parquet rows —
    proving longs, strings, NULLs, and doubles (shortest-round-trip
    decimal rendering) survive each serialization exactly.

    Timestamps travel as epoch-microsecond longs — the one column class
    where text formats genuinely lose information (sub-second precision
    and timezone are formatter-dependent in both engines), so the
    export schema makes the encoding explicit instead of trusting a
    formatter default. That is the production contract at any scale:
    text interchange gets integer timestamps."""
    base = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("ts_us"), "value")
    csv_dir = scratch_dir("q_fmt_csv_")
    json_dir = scratch_dir("q_fmt_jsonl_")
    base.write.mode("overwrite").option("header", True).csv(csv_dir)
    base.write.mode("overwrite").json(json_dir)
    csv_back = (spark.read.schema(_RT_SCHEMA).option("header", True)
                .csv(csv_dir).withColumn("fmt", F.lit("csv")))
    json_back = (spark.read.schema(_RT_SCHEMA).json(json_dir)
                 .withColumn("fmt", F.lit("jsonl")))
    return csv_back.unionByName(json_back).select(
        "fmt", "event_id", "user_id", "event_type", "ts_us", "value")


@declared_query(
    "q_format_orc",
    oracle="""
        SELECT e.event_id, e.user_id, e.event_type,
               epoch_us(e.ts) AS ts_us, e.value, e.props
        FROM events e
    """,
)
def q_format_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source round trip (ClickHouse ``FORMAT ORC`` — its
    binary columnar interchange format alongside Parquet): the events
    table, INCLUDING the JSON-payload column ``props`` that the text
    round trip deliberately drops, exports to ORC and reads back —
    proving the second columnar container preserves longs, strings,
    doubles, and opaque JSON payloads bit-exactly.

    ORC files are splittable columnar with embedded schema and
    min/max stripe statistics, so the read-back is a pushdown-capable
    scan exactly like parquet — at 100 TB ORC interchange costs one
    narrow per-partition write and a stats-pruned read, no shuffle in
    either direction.
    """
    base = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("ts_us"), "value", "props")
    orc_dir = scratch_dir("q_fmt_orc_")
    base.write.mode("overwrite").orc(orc_dir)
    back = spark.read.orc(orc_dir)
    return back.select(
        "event_id", "user_id", "event_type", "ts_us", "value", "props")
