"""Randomized summing-mode fuzz: colliding keys + ALTERs vs a model.

The mode family's collapse runs at READ over possibly-partial parts and
at MERGE physically; both must agree with a row-level model under any
interleaving of colliding inserts, flushes, merges, ADD COLUMN defaults,
CLEAR COLUMN, and row TTL. The model keeps every inserted row and
collapses per (key, ts) at check time: sum for the declared measure,
MIN over non-null values for carried columns — exactly the engine's
summing contract (merge-schedule-independent because both aggregates
are associative).
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

SCHEMA = T.StructType([
    T.StructField("key", T.LongType(), False),
    T.StructField("ts", T.LongType(), False),
    T.StructField("s", T.LongType(), True),
    T.StructField("tag", T.StringType(), True),
])

CFG = dict(memtable_flush_threshold=10**9, max_parts=3,
           key_col="key", ts_col="ts", mode="summing", sum_cols=("s",))


def _expected(inserts, added_cols):
    groups: dict = {}
    for r in inserts:
        groups.setdefault((r["key"], r["ts"]), []).append(r)
    out = []
    for (k, ts), rs in sorted(groups.items()):
        s = sum(r["s"] for r in rs if r["s"] is not None)
        tags = [r["tag"] for r in rs if r["tag"] is not None]
        row = [k, ts, s if any(r["s"] is not None for r in rs) else None,
               min(tags) if tags else None]
        for name, _typ in added_cols:
            vals = [r.get(name) for r in rs if r.get(name) is not None]
            row.append(min(vals) if vals else None)
        out.append(tuple(row))
    return sorted(out)


@pytest.mark.parametrize("seed", range(5))
def test_summing_fuzz(spark, seed):
    rng = random.Random(4000 + seed)
    base = tempfile.mkdtemp(prefix="sumfuzz_tbl_")
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    inserts: list[dict] = []
    added_cols: list = []
    counter = 0
    try:
        for _ in range(14):
            op = rng.choice(["insert", "insert", "insert", "flush",
                             "optimize", "final", "add", "clear",
                             "expire"])
            if op == "insert":
                batch = []
                for _ in range(rng.randrange(1, 6)):
                    r = {"key": rng.randrange(5), "ts": rng.randrange(4),
                         "s": rng.randrange(100),
                         "tag": f"t{rng.randrange(10)}"}
                    for name, typ in added_cols:
                        r[name] = rng.randrange(50)
                    inserts.append(r)
                    batch.append(tuple(r[c] for c in
                                       ["key", "ts", "s", "tag"]
                                       + [n for n, _ in added_cols]))
                t.insert_rows(batch)
            elif op == "flush":
                t.flush()
            elif op == "optimize":
                t.optimize()
            elif op == "final":
                t.optimize(final=True)
            elif op == "add" and len(added_cols) < 2:
                name = f"a{counter}"
                counter += 1
                default = rng.choice([None, 7])
                t.add_column(name, "bigint", default=default)
                added_cols.append((name, "bigint"))
                for r in inserts:
                    r[name] = default
            elif op == "clear":
                t.flush()          # clear marks flushed parts only
                t.clear_column("tag")
                for r in inserts:
                    r["tag"] = None
            elif op == "expire" and inserts:
                cut = rng.choice(sorted({r["ts"] for r in inserts})) + 1
                t.expire(cut)
                inserts = [r for r in inserts if r["ts"] >= cut]
        t.flush()
        got = sorted(tuple(r) for r in t.query_all().collect())
        assert got == _expected(inserts, added_cols)
        t.close()
        t = SparkMergeTree(spark, base, schema=SCHEMA,
                           config=MergeTreeConfig(**CFG))
        got = sorted(tuple(r) for r in t.query_all().collect())
        assert got == _expected(inserts, added_cols)
    finally:
        t.close()
        shutil.rmtree(base, ignore_errors=True)
