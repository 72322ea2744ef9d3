"""Randomized time-travel fuzz: every committed version replays exactly.

Seeded walks of insert / lightweight delete / row TTL / UPDATE mutation /
optimize / FINAL on a snapshot-retaining table; after each op the model
state is recorded against ``current_version()``, and at the end EVERY
recorded version is read back via ``query_at_version`` and compared.
Pins the version-consistency contract across the whole data-op surface:
lw masks are version-gated, expired/mutated/merged-away parts stay
readable as tombstones, and vacuumless retention keeps all of it exact.
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

SCHEMA = T.StructType([
    T.StructField("key", T.LongType(), False),
    T.StructField("ts", T.LongType(), False),
    T.StructField("v", T.LongType(), True),
])

CFG = dict(memtable_flush_threshold=10**9, max_parts=4,
           key_col="key", ts_col="ts", snapshot_retention=50)


@pytest.mark.parametrize("seed", range(5))
def test_timetravel_fuzz(spark, seed):
    rng = random.Random(3000 + seed)
    base = tempfile.mkdtemp(prefix="ttfuzz_tbl_")
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    rows: dict = {}
    nk = 0
    snaps = []
    try:
        for _ in range(12):
            op = rng.choice(["insert", "insert", "lw", "expire", "update",
                             "optimize", "final"])
            if op == "insert":
                batch = []
                for _ in range(rng.randrange(1, 5)):
                    rows[(nk, nk)] = rng.randrange(100)
                    batch.append((nk, nk, rows[(nk, nk)]))
                    nk += 1
                t.insert_rows(batch)
            elif op == "lw" and rows:
                lo = rng.choice(sorted(k for k, _ in rows))
                t.lightweight_delete(f"key >= {lo} AND key < {lo + 4}")
                rows = {kt: v for kt, v in rows.items()
                        if not (lo <= kt[0] < lo + 4)}
            elif op == "expire" and rows:
                cut = rng.choice(sorted(ts for _, ts in rows)) + 1
                t.expire(cut)
                rows = {kt: v for kt, v in rows.items() if kt[1] >= cut}
            elif op == "update" and rows:
                lo = rng.choice(sorted(k for k, _ in rows))
                t.update_where(
                    (F.col("key") >= lo) & (F.col("key") < lo + 6),
                    {"v": F.lit(7).cast("bigint")})
                for kt in rows:
                    if lo <= kt[0] < lo + 6:
                        rows[kt] = 7
            elif op == "optimize":
                t.optimize()
            elif op == "final":
                t.optimize(final=True)
            t.flush()
            snaps.append((t.current_version(),
                          sorted((k, ts, v)
                                 for (k, ts), v in rows.items())))
        for ver, want in snaps:
            got = sorted(tuple(r)
                         for r in t.query_at_version(ver).collect())
            assert got == want, f"version {ver} diverged"
    finally:
        t.close()
        shutil.rmtree(base, ignore_errors=True)
