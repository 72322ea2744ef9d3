"""Seeded crash-point recovery fuzz (R33 atomic swap / R34 recovery).

Simulates the on-disk states a crash can leave between a part write and
its manifest commit — orphan part directories, torn manifest.json.tmp
files, resurrected stale part dirs, a truncated manifest, and a save()
that dies before os.replace — then REOPENS the table from disk and
asserts the deduped read equals the tracked committed content exactly.

Invariants pinned:
- a VALID manifest is the single source of truth: orphan/stale/tmp
  debris on disk never changes query results;
- a TORN manifest falls back to directory-scan recovery, which adopts
  every self-describing immutable part dir (committed + orphans) —
  deterministic, dedup-safe, never corrupt;
- a crash inside save() (before the atomic replace) leaves the LAST
  committed state readable.
"""

from __future__ import annotations

import os
import random
import shutil

import pytest
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree
from clickhouse_mergetree_spark.tables import values_df

SCHEMA = T.StructType([
    T.StructField("key", T.LongType(), False),
    T.StructField("ts_us", T.LongType(), False),
    T.StructField("value", T.DoubleType(), True),
])
COLS = [("key", "bigint"), ("ts_us", "bigint"), ("value", "double")]


def _cfg() -> MergeTreeConfig:
    return MergeTreeConfig(memtable_flush_threshold=10**12, max_parts=100,
                           key_col="key", ts_col="ts_us")


def _read(spark, path) -> set[tuple]:
    t = SparkMergeTree(spark, path, schema=SCHEMA, config=_cfg())
    try:
        return {(r["key"], r["ts_us"], r["value"])
                for r in t.query_all().collect()}
    finally:
        t.close()


def _part_dirs(path) -> list[str]:
    return sorted(d for d in os.listdir(path)
                  if d.startswith("part_")
                  and os.path.isdir(os.path.join(path, d)))


@pytest.mark.parametrize("seed", range(8))
def test_crash_recovery_fuzz(spark, tmp_path, seed):
    rng = random.Random(4200 + seed)
    path = str(tmp_path / "t")
    committed: set[tuple] = set()
    orphans: set[tuple] = set()  # rows living only in uncommitted dirs
    next_row = 0

    def fresh_rows(n):
        nonlocal next_row
        rows = [(1000 + next_row + i, 10_000 + next_row + i,
                 float(next_row + i)) for i in range(n)]
        next_row += n
        return rows

    table = SparkMergeTree(spark, path, schema=SCHEMA, config=_cfg())
    for _ in range(rng.randint(2, 4)):
        rows = fresh_rows(rng.randint(2, 5))
        table.insert_batch(values_df(spark, rows, COLS), row_count=1)
        table.flush()
        committed |= set(rows)
    if rng.random() < 0.5:
        table.optimize(final=True)
    table.close()

    for _ in range(rng.randint(1, 3)):
        action = rng.choice(["orphan", "tmp", "stale", "crash_save",
                             "torn_manifest"])
        dirs = _part_dirs(path)
        if action == "orphan":
            # a part written by a crashed insert, never committed: with a
            # valid manifest it must be INVISIBLE
            src = os.path.join(path, rng.choice(dirs))
            dst = os.path.join(path, f"part_{900 + rng.randint(0, 50)}")
            if not os.path.exists(dst):
                shutil.copytree(src, dst)
                # its rows are duplicates of committed rows -> dedup-safe
                # whether or not a later torn-manifest scan adopts it
        elif action == "tmp":
            with open(os.path.join(path, "manifest.json.tmp"), "w") as f:
                f.write('{"parts": [TRUNCATED')
        elif action == "stale":
            # an old dir a crashed merge failed to delete: same rule
            src = os.path.join(path, rng.choice(dirs))
            dst = os.path.join(path, "part_1" if "part_1" not in dirs
                               else f"part_{800 + rng.randint(0, 50)}")
            if not os.path.exists(dst):
                shutil.copytree(src, dst)
        elif action == "crash_save":
            # save() dies BEFORE the atomic replace: last committed state
            # must survive (the part files may exist; the commit does not)
            t2 = SparkMergeTree(spark, path, schema=SCHEMA, config=_cfg())
            rows = fresh_rows(2)
            from clickhouse_mergetree_spark.engine import manifest as mmod
            real_save = mmod.Manifest.save

            def dying_save(self):
                raise OSError("injected crash before manifest replace")

            mmod.Manifest.save = dying_save
            try:
                with pytest.raises(Exception):
                    t2.insert_batch(values_df(spark, rows, COLS),
                                    row_count=1)
                    t2.flush()
            finally:
                mmod.Manifest.save = real_save
                try:
                    t2.close()
                except Exception:
                    pass
            orphans |= set(rows)  # on disk at most; never committed
        elif action == "torn_manifest":
            mf = os.path.join(path, "manifest.json")
            with open(mf) as f:
                doc = f.read()
            with open(mf, "w") as f:
                f.write(doc[: rng.randint(1, max(2, len(doc) // 3))])
            # recovery scans dirs: adopts committed parts AND any planted
            # orphan/stale copies (dup rows, dedup-safe) AND any
            # crash_save part dirs that did get written
            got = _read(spark, path)
            assert committed <= got <= committed | orphans, (
                seed, sorted(committed - got)[:3],
                sorted(got - committed - orphans)[:3])
            committed = got  # the adopted state is now the committed one
            orphans = set()
            continue

        got = _read(spark, path)
        assert got == committed, (
            seed, action, sorted(committed - got)[:3],
            sorted(got - committed)[:3])

    # closing sanity: a clean reopen + optimize keeps content identical
    t3 = SparkMergeTree(spark, path, schema=SCHEMA, config=_cfg())
    t3.optimize(final=True)
    final = {(r["key"], r["ts_us"], r["value"])
             for r in t3.query_all().collect()}
    t3.close()
    assert final == committed, (seed, len(final), len(committed))
