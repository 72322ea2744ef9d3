"""Declared-query registry (SURVEY.md §2 → __spark_entry__.py contract).

Each operator module registers its queries with @declared_query. A query is a
callable ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, the
equivalent DuckDB oracle SQL over the same parquet tables. Column names must
match between the two — the driver sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does a rows-only check
    doc: str = ""
    # defer=True: a brand-new query yields its first gate slot to any
    # OLDER never-checked query (sort key 0.5 vs 0 — see sort_round).
    # Use for additions made while a backlog of never-checked queries is
    # queued for the next gate window (VERDICT r7 item 1: a new query
    # must never steal a slot from the backlog it was added alongside).
    # Expires on the first driver row: once checked, staleness rules.
    defer: bool = False
    # Oracle validity bound (ADVICE r12): some oracles embed FIXTURE
    # parameter literals (LSH bit count, audit block count) while the
    # Spark side switches formulas past the fixture sizes. Such an
    # oracle is exact at every driver SF (sf0.001/0.01/0.1) but MUST NOT
    # be run against a scaled corpus — the mismatch would surface as a
    # spurious parity failure rather than "unsupported". When set, local
    # verification tools (tools/correctness_check.py,
    # tools/signed_zero_sweep.py) count rows of ``oracle_fixture_table``
    # and refuse the comparison loudly past the bound. None = oracle
    # valid at any scale.
    oracle_fixture_max_rows: int | None = None
    oracle_fixture_table: str = "embeddings"


REGISTRY: dict[str, DeclaredQuery] = {}


def declared_query(name: str, oracle: str | None = None,
                   defer: bool = False,
                   oracle_fixture_max_rows: int | None = None,
                   oracle_fixture_table: str = "embeddings",
                   ) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query {name!r}")
        REGISTRY[name] = DeclaredQuery(
            name, fn, oracle, (fn.__doc__ or "").strip(), defer,
            oracle_fixture_max_rows, oracle_fixture_table)
        return fn
    return deco


# Check-order for the driver's CORRECTNESS gate, which verifies the FIRST 50
# entries of queries() in dict order. Rounds 3-4 maintained a hand-written
# priority list, which is exactly how 13 round-4 queries ended up committed
# after the gate ran and 17 queries reached round 5 with no driver row.
# Round 5 computes the order from the committed CORRECTNESS_r*.json artifacts
# instead (VERDICT r4 item 8): a query's sort key is the most recent round in
# which its driver row was OK (hash-pass, or a rows-only row for an
# oracle-less query). Queries whose latest driver row FAILED sort as -1 —
# strictly first, since a failed row is a live regression signal whose fix
# must be re-verified before anything else gets a slot — then never-checked
# queries at 0, then green keepers by staleness; ties preserve registration
# order. With ~150 queries and a 50-row window this is a round-robin that
# bounds staleness at ~3 rounds with no list to maintain.


def _last_ok_round() -> tuple[dict[str, int], dict[str, int]]:
    """(last_ok, last_hash): per name, the most recent round with an OK
    driver CORRECTNESS row, and the most recent round with a HASH-pass.

    OK = hash_match is True, or err == "no_oracle" with a non-null row
    count (the driver's rows-only check for declared-approximate queries).
    A later FAILED row (hash_match False or a real err) resets the query
    to -1 so it re-enters the gate window ahead of even never-checked
    queries (which default to 0). last_hash lets the caller detect queries
    whose only driver OK predates their oracle (rows-only ledger rows) —
    those re-enter the window as if never checked, so a query that GAINS
    an oracle automatically gets a hash slot the next round.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_ok: dict[str, int] = {}
    last_hash: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            hashed = row.get("hash_match") is True
            ok = hashed or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if hashed:
                last_hash[name] = max(last_hash.get(name, 0), rnd)
            if last_seen.get(name, -1) < rnd:
                last_seen[name] = rnd
                if ok:
                    last_ok[name] = max(last_ok.get(name, 0), rnd)
                else:
                    last_ok[name] = -1  # latest row failed -> re-check first
            elif ok and last_ok.get(name, 0) >= 0:
                last_ok[name] = max(last_ok.get(name, 0), rnd)
    return last_ok, last_hash


# Tie-break rank within a priority class: long-standing core surfaces
# (streaming, engine, SQL, dedup, similarity) outrank the fast-growing
# batch modules, so a burst of new dialect queries can never push an
# older unchecked core query out of the 50-row gate window. An explicit
# table — NOT raw registration order, which varies with whichever module
# a caller happens to import first (entry() imports operators before
# queries() imports streaming, so insertion order is call-path-dependent).
_MODULE_RANK = {
    "streams": 0,
    "engine_queries": 1,
    "sql_queries": 2,
    "dedup": 3,
    "similarity": 4,
    "relational": 5,
    "text_analysis": 6,
    "multimodal": 7,
    "udfs": 8,
    "web": 9,
}


def all_queries() -> dict[str, DeclaredQuery]:
    # Import streaming + operator modules for their registration side
    # effects (idempotent; order here does not matter — see _MODULE_RANK).
    from clickhouse_mergetree_spark import operators, streaming  # noqa: F401

    last_ok, last_hash = _last_ok_round()
    # per-module sequence: stable regardless of cross-module interleaving
    seq: dict[str, int] = {}
    reg_key: dict[str, tuple[int, int]] = {}
    for name, q in REGISTRY.items():
        mod = q.fn.__module__.rsplit(".", 1)[-1]
        rank = _MODULE_RANK.get(mod, len(_MODULE_RANK))
        reg_key[name] = (rank, seq.get(mod, 0))
        seq[mod] = seq.get(mod, 0) + 1

    def sort_round(n: str) -> float:
        r = last_ok.get(n, 0)
        # A query that HAS an oracle but whose driver ledger only shows
        # rows-only OKs gained its oracle after its last gate slot; its
        # hash has never been driver-verified, so it re-enters the window
        # as never-checked (r6 rule — covers the 6 ANN queries whose
        # oracles landed in r5 and any future oracle upgrade).
        if r > 0 and REGISTRY[n].oracle is not None and n not in last_hash:
            return 0
        # deferred newcomers queue BEHIND the existing never-checked
        # backlog (0 < 0.5) but still ahead of green keepers (r8 rule)
        if r == 0 and REGISTRY[n].defer and n not in last_ok:
            return 0.5
        return r

    ordered_names = sorted(
        REGISTRY, key=lambda n: (sort_round(n), reg_key[n])
    )
    return {name: REGISTRY[name] for name in ordered_names}
