"""Lifecycle fuzz under a live background-merge thread.

The same random ALTER/data-op walks as tests/test_lifecycle_fuzz.py, but
with background maintenance merging aggressively (50 ms interval,
max_parts=2) underneath every operation. Background merges must never
change logical content — any divergence from the model is a race in the
merge/ALTER/mutation lock discipline. 24 exploratory seeds passed; 4
pinned to bound suite time.
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree
from tests.test_lifecycle_fuzz import (BASE_FIELDS, CFG, ORIG_PAYLOAD,
                                       Model, _apply_random_op, _check,
                                       _schema)

BG_CFG = dict(CFG, enable_background_merge=True,
              merge_interval_seconds=0.05, max_parts=2)


@pytest.mark.parametrize("seed", range(4))
def test_background_merge_fuzz(spark, seed):
    rng = random.Random(5000 + seed)
    base = tempfile.mkdtemp(prefix="bgfuzz_tbl_")
    counter = [0]
    m = Model()
    schema0 = _schema(BASE_FIELDS + ORIG_PAYLOAD)
    t = SparkMergeTree(spark, base, schema=schema0,
                       config=MergeTreeConfig(**BG_CFG))
    try:
        for _ in range(12):
            _apply_random_op(rng, t, m, counter)
        t.flush()
        _check(t, m)
        t.close()
        t = SparkMergeTree(spark, base, schema=schema0,
                           config=MergeTreeConfig(**BG_CFG))
        _check(t, m)
    finally:
        t.close()
        shutil.rmtree(base, ignore_errors=True)
