"""Property-based engine check (SURVEY §5.4): SparkMergeTree vs naive model.

Hypothesis drives random op sequences (insert / flush / merge / reopen)
against both the real engine and a trivially-correct in-memory model; after
every sequence, range and point queries must agree exactly. The model is
the reference's user-visible contract distilled: a (key, ts) → row multimap
with dedup-on-read and (key ASC, ts ASC) order.

Examples are kept small (Spark jobs per op), but the op mix covers the
interesting interleavings: flush mid-stream, merge with dups across parts,
reopen losing the buffer (flush-on-close keeps it), duplicate (key, ts)
collisions.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

KEYS = ["a", "b", "c"]
TS = [1, 2, 3]

op = st.one_of(
    st.tuples(st.just("insert"), st.sampled_from(KEYS), st.sampled_from(TS),
              st.integers(0, 99)),
    st.just(("flush",)),
    st.just(("merge",)),
    st.just(("reopen",)),
    # lightweight delete of one key: masks data present NOW (the call
    # flushes the buffer first); later inserts of the same key reappear
    st.tuples(st.just("lwdelete"), st.sampled_from(KEYS)),
    # APPLY DELETED MASK: physical state change, visible rows unchanged
    st.just(("materialize",)),
)


class NaiveModel:
    """Dict-of-dicts reference model of the engine contract."""

    def __init__(self):
        self.rows: dict[tuple[str, int], str] = {}

    def insert(self, key: str, ts: int, value: str) -> None:
        # exact (key, ts) dup → one row survives; which value is unspecified
        # in both engines, so the model only tracks presence for dup keys
        self.rows.setdefault((key, ts), value)

    def lwdelete(self, key: str) -> None:
        # masks every row of `key` present at the call; later inserts of
        # the same (key, ts) are NEW rows and reappear (setdefault re-adds)
        self.rows = {k: v for k, v in self.rows.items() if k[0] != key}

    def query(self, lo: str, hi: str) -> list[tuple[str, int]]:
        return sorted(k for k in self.rows if lo <= k[0] <= hi)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=st.lists(op, min_size=1, max_size=12))
def test_engine_matches_naive_model(spark, tmp_path_factory, ops):
    base = str(tmp_path_factory.mktemp("prop") / "table")
    cfg = MergeTreeConfig(memtable_flush_threshold=10**9, max_parts=2)
    t = SparkMergeTree(spark, base, config=cfg)
    model = NaiveModel()
    try:
        for o in ops:
            if o[0] == "insert":
                _, key, ts, vn = o
                t.insert(key, f"v{vn}", ts)
                model.insert(key, ts, f"v{vn}")
            elif o[0] == "flush":
                t.flush()
            elif o[0] == "merge":
                t.perform_merge()
            elif o[0] == "lwdelete":
                t.lightweight_delete(f"key = '{o[1]}'")
                model.lwdelete(o[1])
            elif o[0] == "materialize":
                t.materialize_deletes()
            elif o[0] == "reopen":
                t.close()  # flush-on-close: no buffered row may be lost
                t = SparkMergeTree(spark, base, config=cfg)

        got = [(r["key"], r["timestamp"])
               for r in t.query("a", "c").collect()]
        assert got == model.query("a", "c")

        for key in KEYS:
            got_k = [(r["key"], r["timestamp"])
                     for r in t.query_key(key).collect()]
            assert got_k == model.query(key, key)

        assert t.total_rows() >= len(model.query("a", "c"))
    finally:
        t.close()
