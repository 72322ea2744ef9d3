"""Spark connectors for SparkMergeTree tables."""

from clickhouse_mergetree_spark.sources.mergetree_source import (  # noqa: F401
    MergeTreeDataSource,
    mergetree_batch_scan,
    register_mergetree,
)
