"""MergeTable — the ClickHouse ``Merge`` engine / ``merge()`` function analog.

A ClickHouse ``Merge(db, 'regex')`` table is a zero-copy read-only view
over every table whose name matches the regex: reads fan out to the
underlying tables (each applying its own indexes/pruning), results union,
and the virtual ``_table`` column says which table produced each row.
The classic use is time-sliced tables (``events_2024``, ``events_2025``,
…) queried as one, or a hot/cold split where recent data lives in a
small fast table and history in a big compacted one.

Spark-first shape: each member read is the member's own lazy plan —
manifest part pruning, skipping indexes, read-time collapse all happen
per member exactly as for a direct read — and the union is a plain
``unionByName``, which Spark executes as independent scan branches (no
shuffle added by the union itself). At 100 TB the virtual ``_table``
predicate is the coarsest prune there is: ``member_tables()`` filters on
name BEFORE any plan is built, so a query touching one year of a decade
of yearly tables plans one member, ClickHouse's ``_table IN`` contract.

No reference counterpart (the reference has a single table); ClickHouse
semantics from the public Merge-engine docs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.engine.merge_tree import SparkMergeTree

TABLE_VCOL = "_table"


class MergeTable:
    """Read-only union view over named SparkMergeTree tables."""

    def __init__(self, tables: dict[str, SparkMergeTree],
                 pattern: str = ".*"):
        if not tables:
            raise ValueError("MergeTable needs at least one member table")
        self.tables = dict(tables)
        self.pattern = re.compile(pattern)

    # ------------------------------------------------------------ members

    def member_tables(self, pattern: str | None = None
                      ) -> list[tuple[str, SparkMergeTree]]:
        """(name, table) pairs matching the (optional override) regex —
        the name-level prune that happens before any Spark plan exists."""
        rx = re.compile(pattern) if pattern is not None else self.pattern
        return sorted((n, t) for n, t in self.tables.items()
                      if rx.fullmatch(n))

    # -------------------------------------------------------------- reads

    def _union(self, frames: list[DataFrame]) -> DataFrame:
        out = frames[0]
        for d in frames[1:]:
            # members may have drifted schemas (an ALTERed member); the
            # union serves the column superset, absent columns as NULL —
            # ClickHouse Merge reads a missing member column as default
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def query_all(self, pattern: str | None = None) -> DataFrame:
        """Union of member ``query_all()`` reads, each row tagged with the
        virtual ``_table`` column (selected last, like ClickHouse prints
        virtuals after physical columns)."""
        members = self.member_tables(pattern)
        if not members:
            raise ValueError("no member table matches the pattern")
        return self._union([
            t.query_all().withColumn(TABLE_VCOL, F.lit(name))
            for name, t in members
        ])

    def query(self, start_key, end_key,
              pattern: str | None = None) -> DataFrame:
        """Range scan fan-out: every member prunes its own parts by
        manifest min/max before its scan plans."""
        members = self.member_tables(pattern)
        if not members:
            raise ValueError("no member table matches the pattern")
        return self._union([
            t.query(start_key, end_key).withColumn(TABLE_VCOL, F.lit(name))
            for name, t in members
        ])

    def query_key(self, key, pattern: str | None = None) -> DataFrame:
        """Point lookup fan-out; members whose manifests exclude the key
        contribute an empty (pruned-to-zero-parts) branch."""
        members = self.member_tables(pattern)
        if not members:
            raise ValueError("no member table matches the pattern")
        return self._union([
            t.query_key(key).withColumn(TABLE_VCOL, F.lit(name))
            for name, t in members
        ])

    # ------------------------------------------------------- introspection

    def total_rows(self) -> int:
        return sum(t.total_rows() for _, t in self.member_tables())

    def part_count(self) -> int:
        return sum(t.part_count() for _, t in self.member_tables())
