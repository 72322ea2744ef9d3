"""Structured Streaming surface — importing registers E26–E29."""

from clickhouse_mergetree_spark.streaming import streams  # noqa: F401
from clickhouse_mergetree_spark.streaming.streams import (  # noqa: F401
    read_events_stream,
    run_to_memory,
)
