"""``ENGINE = Null`` analog (ClickHouse — extension; the reference has no
view layer): a table that stores NOTHING — every inserted block is
discarded after the attached materialized views have seen it.

This is ClickHouse's standard ingest-transform pattern: raw feeds INSERT
into a Null table and MVs fan the blocks out into real (summing/rollup)
targets, so the pipeline keeps the MV trigger semantics and rollup
maintenance WITHOUT paying raw-block storage — at 100 TB/day of raw
events whose queries only ever touch rollups, the Null source is the
difference between storing 100 TB/day and storing the rollups.

Kept deliberately tiny: the whole value of Null is what it does NOT do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class NullTable:
    """Insert-only sink with MV fan-out and no storage.

    Mirrors the SparkMergeTree ingest surface (``insert_batch`` /
    ``insert_rows`` / ``attach_view`` / ``query_all`` / ``flush`` /
    ``close``) so materialized views and ingest code are interchangeable
    between a stored source and a Null source.
    """

    def __init__(self, spark: SparkSession, schema: T.StructType):
        self.spark = spark
        self.schema = schema
        self._views: list = []

    def attach_view(self, view, populate: bool = False) -> None:
        """Bind a MaterializedView. ``populate=True`` is refused: a Null
        table has no current contents to backfill from (ClickHouse
        equally errors on POPULATE from Null)."""
        if populate:
            raise ValueError("POPULATE from a Null table is meaningless "
                             "(it stores no rows)")
        self._views.append(view)

    def insert_batch(self, df: DataFrame, row_count: int | None = None
                     ) -> None:
        """MV trigger semantics, minus storage: each attached view sees
        the block once, then the block is dropped."""
        for v in self._views:
            v.on_batch(df)

    def insert_rows(self, rows: list[tuple]) -> None:
        if not rows or not self._views:
            return
        from clickhouse_mergetree_spark.tables import values_df
        cols = [(f.name, f.dataType.simpleString())
                for f in self.schema.fields]
        self.insert_batch(values_df(self.spark, rows, cols))

    def query_all(self) -> DataFrame:
        """Always empty — the defining property."""
        return self.spark.createDataFrame([], self.schema)

    def total_rows(self) -> int:
        return 0

    def flush(self) -> None:
        for v in self._views:
            v.flush()

    def close(self) -> None:
        for v in self._views:
            v.close()

    def __enter__(self) -> "NullTable":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
