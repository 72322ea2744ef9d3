"""Randomized ALTER-DDL × streaming-ingest fuzz (VERDICT r7 item 8).

The untested cross-product after r7: ALTER statements applied WHILE a
foreachBatch stream feeds the same table, interacting with the
exactly-once batch ledger (q_stream_exactly_once's pattern: the ledger
entry and the batch's part publish in one atomic manifest commit) and
with schema evolution (metadata-only ADD/DROP/RENAME/MODIFY/CLEAR whose
transforms replay lazily over parts written BEFORE the ALTER).

Shape: a seeded directory of small parquet files replayed as a
maxFilesPerTrigger=1 file stream -> one micro-batch per file; the feed
callback (driver-side, like every engine write) rolls a per-batch-id
seeded RNG to interleave ALTERs before/after each insert, adapts the
fixed stream schema to the table's CURRENT schema (the materialized-view
transform a real deployment owns), and flushes so part + ledger commit
together. A plain-Python model tracks expected contents. After the
stream: batch 0 is redelivered (must be a ledger no-op even though the
schema evolved since it first committed), contents are compared, the
table is reopened with the ORIGINAL schema (the ALTER replay path), and
compared again.

Determinism: the RNG is keyed on (walk seed, batch_id), not on callback
order; value domains are ints and halves so double casts are exact.
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

N_FILES = 6
ROWS_PER_FILE = 12
WIDEN = {"int": ["bigint", "double"], "bigint": ["double"], "double": []}

SCHEMA0 = T.StructType([
    T.StructField("key", T.LongType(), False),
    T.StructField("ts", T.LongType(), False),
    T.StructField("v", T.DoubleType(), True),
])

CFG = dict(memtable_flush_threshold=10**9, max_parts=3,
           key_col="key", ts_col="ts")


def _gen_value(rng, typ):
    if typ in ("int",):
        return rng.randrange(-100, 100)
    if typ == "bigint":
        return rng.randrange(-10**6, 10**6)
    if typ == "double":
        return rng.randrange(-1000, 1000) / 2.0
    return f"s{rng.randrange(1000)}"


def _cast(value, typ):
    if value is None:
        return None
    if typ in ("int", "bigint"):
        return int(value)
    if typ == "double":
        return float(value)
    return str(value)


def _write_stream_files(seed: int) -> tuple[str, dict[int, list[tuple]]]:
    """N_FILES parquet files of (key, ts, v) rows, globally unique keys.
    Returns (dir, {file_index: rows}) — file order == batch order under
    maxFilesPerTrigger=1 with lexicographic part names."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(7000 + seed)
    d = tempfile.mkdtemp(prefix="stream_alter_src_")
    rows_by_file: dict[int, list[tuple]] = {}
    k = 0
    for i in range(N_FILES):
        rows = []
        for _ in range(ROWS_PER_FILE):
            rows.append((k, k, rng.randrange(-1000, 1000) / 2.0))
            k += 1
        rows_by_file[i] = rows
        pq.write_table(
            pa.table({
                "key": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "v": pa.array([r[2] for r in rows], pa.float64()),
            }),
            f"{d}/part-{i:04d}.parquet")
    return d, rows_by_file


class Model:
    """Expected contents: ordered payload cols + rows keyed by (key, ts).
    ``v_name`` tracks the streamed column through renames (None once
    dropped — stream values for it are then discarded, exactly what the
    adapting transform does)."""

    def __init__(self):
        self.cols: list[tuple[str, str]] = [("v", "double")]
        self.defaults: dict[str, object] = {"v": None}
        self.rows: dict[tuple[int, int], dict] = {}
        self.v_name: str | None = "v"

    def insert_stream_rows(self, rows):
        for k, ts, v in rows:
            vals = {}
            for name, _typ in self.cols:
                if name == self.v_name:
                    vals[name] = v
                else:
                    vals[name] = self.defaults.get(name)
            self.rows[(k, ts)] = vals

    def expected(self):
        names = [n for n, _t in self.cols]
        types = dict(self.cols)
        return sorted(
            (k, ts, *[_cast(v.get(n), types[n]) for n in names])
            for (k, ts), v in self.rows.items())


def _apply_random_alter(rng, t, m, counter):
    op = rng.choice(["none", "none", "add", "drop", "rename", "modify",
                     "clear", "optimize", "final"])
    if op == "none":
        return
    if op == "add":
        name = f"c{counter[0]}"
        counter[0] += 1
        typ = rng.choice(["int", "bigint", "double", "string"])
        default = None if rng.random() < 0.3 else _gen_value(rng, typ)
        t.add_column(name, typ, default=default)
        m.cols.append((name, typ))
        m.defaults[name] = default
        for v in m.rows.values():
            v[name] = default
        return
    if not m.cols:
        return
    name, typ = rng.choice(m.cols)
    if op == "drop":
        try:
            t.drop_column(name)
        except ValueError:
            return
        m.cols = [(n, ty) for n, ty in m.cols if n != name]
        if m.v_name == name:
            m.v_name = None
        for v in m.rows.values():
            v.pop(name, None)
    elif op == "rename":
        new = f"c{counter[0]}"
        counter[0] += 1
        try:
            t.rename_column(name, new)
        except ValueError:
            return
        m.cols = [(new, ty) if n == name else (n, ty) for n, ty in m.cols]
        m.defaults[new] = m.defaults.pop(name, None)
        if m.v_name == name:
            m.v_name = new
        for v in m.rows.values():
            if name in v:
                v[new] = v.pop(name)
    elif op == "modify":
        targets = WIDEN.get(typ, [])
        if not targets:
            return
        new_typ = rng.choice(targets)
        try:
            t.modify_column(name, new_typ)
        except ValueError:
            return
        m.cols = [(n, new_typ) if n == name else (n, ty)
                  for n, ty in m.cols]
    elif op == "clear":
        try:
            t.clear_column(name)
        except ValueError:
            return
        for v in m.rows.values():
            v[name] = m.defaults.get(name)
    elif op == "optimize":
        t.optimize()
    elif op == "final":
        t.optimize(final=True)


def _adapt_to_schema(t, m, batch_df):
    """The MV-transform a real deployment owns: project the fixed stream
    schema (key, ts, v) onto the table's CURRENT schema — renamed v
    follows, dropped v is discarded, post-ALTER columns fill with their
    declared default literal."""
    cols = [F.col("key"), F.col("ts")]
    for f in t.schema.fields:
        if f.name in ("key", "ts"):
            continue
        if f.name == m.v_name:
            cols.append(F.col("v").cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(m.defaults.get(f.name))
                        .cast(f.dataType).alias(f.name))
    return batch_df.select(*cols)


def _check(t, m, where):
    got = sorted(tuple(r) for r in t.query_all().collect())
    assert got == m.expected(), (
        f"{where}: engine={got[:3]}... model={m.expected()[:3]}... "
        f"cols={m.cols}")


@pytest.mark.parametrize("seed", range(6))
def test_stream_alter_fuzz(spark, seed):
    src_dir, rows_by_file = _write_stream_files(seed)
    base = tempfile.mkdtemp(prefix="stream_alter_tbl_")
    t = SparkMergeTree(spark, base, schema=SCHEMA0,
                       config=MergeTreeConfig(**CFG))
    m = Model()
    counter = [0]
    batches_seen: list[int] = []

    def feed(batch_df, batch_id):
        tm = t.manifest.table_meta
        done = tm.setdefault("ingested_batches", [])
        if batch_id in done:
            return  # redelivered: already durably committed
        rng = random.Random(9000 + seed * 101 + int(batch_id))
        _apply_random_alter(rng, t, m, counter)
        rows = sorted(tuple(r) for r in batch_df.collect())
        t.insert_batch(_adapt_to_schema(t, m, batch_df), len(rows))
        m.insert_stream_rows(rows)
        done.append(int(batch_id))
        batches_seen.append(int(batch_id))
        t.flush()  # part + ledger publish in ONE manifest commit
        _apply_random_alter(rng, t, m, counter)

    try:
        q = (
            spark.readStream.schema(SCHEMA0).option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .writeStream.foreachBatch(feed)
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix="ckpt_alter_fuzz_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert len(batches_seen) == N_FILES, batches_seen
        _check(t, m, "after stream")

        # redeliver the FIRST batch with the post-ALTER schema gap: the
        # ledger must no-op it even though columns were added/dropped/
        # renamed since it committed
        first = batches_seen[0]
        n_before = t.total_rows()
        redelivered = spark.createDataFrame(
            rows_by_file[0], schema=SCHEMA0)
        feed(redelivered, first)
        assert t.total_rows() == n_before, "redelivered batch re-applied"
        _check(t, m, "after redelivery")

        # recovery: reopen with the ORIGINAL schema — the ALTER chain and
        # the ledger must both replay from the manifest
        t.close()
        t2 = SparkMergeTree(spark, base, schema=SCHEMA0,
                            config=MergeTreeConfig(**CFG))
        assert sorted(t2.manifest.table_meta.get(
            "ingested_batches", [])) == sorted(batches_seen), \
            "exactly-once ledger lost across reopen"
        _check(t2, m, "after reopen")
        t2.close()
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(base, ignore_errors=True)
