"""Driver-gate rotation policy (VERDICT r4 item 8).

The driver verifies the FIRST 50 entries of queries(). Round 5 computes
that order from the committed CORRECTNESS_r*.json artifacts instead of a
hand-maintained list: never-checked and last-failed queries sort first,
then oldest-green, ties in registration order. These tests pin the policy
against the real artifacts in the repo so a regression (e.g. a new query
landing outside the window, or a failed row not re-entering) is caught at
commit time, not at the next round's gate.
"""

from __future__ import annotations

import glob
import json
import os
import re

import clickhouse_mergetree_spark.registry as reg
from clickhouse_mergetree_spark.registry import _last_ok_round, all_queries

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(reg.__file__)))


def _artifact_rows() -> dict[int, dict]:
    out = {}
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            out[rnd] = json.load(f)
    return out


def test_never_checked_queries_lead_the_window():
    names = list(all_queries())
    rows = _artifact_rows()
    seen = set().union(*[set(r) for r in rows.values()])
    never = [n for n in names if n not in seen]
    window = set(names[:50])
    missing = [n for n in never if n not in window]
    # Every never-checked query fits in the 50-row window — unless more
    # than 50 queries are simultaneously prioritized (last-failed +
    # never-checked), in which case the overflow must be exactly the
    # LAST-registered never-checked queries: a never-checked query
    # spilled while a green keeper holds a slot is a sort bug.
    n_failed = sum(
        1 for n, r in (rows[max(rows)] if rows else {}).items()
        if isinstance(r, dict) and r.get("hash_match") is False
    )
    overflow = max(0, n_failed + len(never) - 50)
    assert len(missing) == overflow, (
        f"never-checked queries outside gate window: {missing} "
        f"(allowed overflow: {overflow})"
    )
    assert missing == never[-overflow:] if overflow else not missing, (
        f"spilled queries are not the latest-registered: {missing}"
    )


def test_last_failed_queries_reenter_the_window():
    rows = _artifact_rows()
    if not rows:
        return
    latest = rows[max(rows)]
    failed = [n for n, r in latest.items()
              if isinstance(r, dict) and r.get("hash_match") is False]
    names = list(all_queries())
    window = set(names[:50])
    out = [n for n in failed if n in names and n not in window]
    assert not out, f"last-failed queries outside gate window: {out}"


def test_green_queries_ordered_oldest_first():
    lo, lh = _last_ok_round()
    queries = all_queries()
    names = list(queries)

    def rank(n):
        r = lo.get(n, 0)
        # r6 rule: an oracle-bearing query whose driver ledger has only
        # rows-only OKs (no hash-pass ever) re-enters as never-checked
        if r > 0 and queries[n].oracle is not None and n not in lh:
            return 0
        return r

    ranks = [rank(n) for n in names]
    assert ranks == sorted(ranks), "check order is not last-ok-round sorted"


def test_oracle_upgraded_queries_reenter_the_window():
    """A query that gained a DuckDB oracle AFTER its last driver slot has
    a rows-only ledger row but no hash row — it must re-enter the gate
    window so the oracle actually gets driver-verified (r6 rule; the six
    r5 ANN oracle upgrades are the motivating case)."""
    lo, lh = _last_ok_round()
    queries = all_queries()
    names = list(queries)
    window = set(names[:50])
    upgraded = [n for n in names
                if lo.get(n, 0) > 0 and queries[n].oracle is not None
                and n not in lh]
    out = [n for n in upgraded if n not in window]
    assert not out, f"oracle-upgraded queries outside gate window: {out}"


def test_deferred_newcomers_queue_behind_the_backlog():
    """defer=True (r8 rule): a brand-new query sorts AFTER every older
    never-checked query — it can never steal a gate slot from the
    backlog it was added alongside — but still ahead of green keepers.
    Expires once the query has any driver row."""
    lo, lh = _last_ok_round()
    queries = all_queries()
    names = list(queries)
    seen = set(lo)
    first_keeper = next(
        (i for i, n in enumerate(names) if lo.get(n, 0) > 0
         and not (queries[n].oracle is not None and n not in lh)),
        len(names))
    for i, n in enumerate(names):
        if queries[n].defer and n not in seen:
            older_after = [
                o for o in names[i + 1:]
                if o not in seen and not queries[o].defer]
            assert not older_after, (
                f"deferred {n} sorted before never-checked {older_after}")
            assert i < first_keeper, (
                f"deferred {n} sorted after a green keeper")


def test_rotation_handles_missing_artifacts(monkeypatch):
    # In a tree with no CORRECTNESS files (round 1), everything is rank 0
    # and the order degrades to registration order — no crash, no reorder.
    monkeypatch.setattr(glob, "glob", lambda pat: [])
    assert _last_ok_round() == ({}, {})


def test_gate_order_is_call_path_independent():
    """The driver smoke-runs entry() BEFORE queries(); entry imports the
    operators package while queries() imports streaming too. Raw dict
    insertion order therefore differs between call paths — the explicit
    _MODULE_RANK tie-break must make the gate window identical either
    way. Pinned via two subprocesses (imports are process-global, so
    both orders cannot be observed in one process)."""
    import subprocess
    import sys as _sys

    script = """
import sys; sys.path.insert(0, {root!r})
{prelude}
from clickhouse_mergetree_spark.registry import all_queries
print("\\n".join(list(all_queries())[:60]))
"""
    root = _ROOT
    # path A: operators imported first (what entry() does)
    a = subprocess.run(
        [_sys.executable, "-c", script.format(
            root=root,
            prelude="import clickhouse_mergetree_spark.operators")],
        capture_output=True, text=True, check=True).stdout
    # path B: nothing pre-imported (queries() alone)
    b = subprocess.run(
        [_sys.executable, "-c", script.format(root=root, prelude="")],
        capture_output=True, text=True, check=True).stdout
    assert a == b, "gate window depends on import call path"
