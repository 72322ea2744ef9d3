"""run_concurrently contract (clickhouse_mergetree_spark/parallel.py).

The helper backs rollback-sensitive paths (flush's all-or-nothing part
commit), so the contract under test is exactly what those paths rely
on: results in INPUT order regardless of completion order, every thunk
runs to completion even when an earlier one fails (drain), and the
FIRST failure by input position is the one re-raised. Pure Python — no
Spark session needed.
"""

from __future__ import annotations

import threading
import time

import pytest

from clickhouse_mergetree_spark.parallel import run_concurrently


def test_results_in_input_order_despite_completion_order():
    def slow():
        time.sleep(0.2)
        return "slow"

    def fast():
        return "fast"

    assert run_concurrently([slow, fast]) == ["slow", "fast"]


def test_empty_and_single_run_inline():
    assert run_concurrently([]) == []
    tid = threading.get_ident()
    # single thunk must run on the calling thread (no pool hop) — code
    # under an engine lock relies on reentrancy staying single-threaded
    assert run_concurrently([threading.get_ident]) == [tid]


def test_drains_all_thunks_before_raising_first_error():
    ran = []

    def ok(i):
        def f():
            time.sleep(0.05 * i)
            ran.append(i)
            return i
        return f

    def boom():
        raise ValueError("boom-0")

    def boom_late():
        time.sleep(0.15)
        raise RuntimeError("boom-late")

    with pytest.raises(ValueError, match="boom-0"):
        # first error by INPUT position wins even though boom_late is
        # still running when it's raised; the slow ok(3) must still
        # complete (drain) so rollback paths see every side effect
        run_concurrently([boom, ok(1), boom_late, ok(3)])
    assert sorted(ran) == [1, 3]
