"""Randomized ClickHouseSession runbook fuzz (round 8).

The router's seams — statement parsing, per-statement table dispatch,
view refresh after mutations, multi-table sessions, column lifecycle
through the DDL front end — exercised by random runbooks of literal
ClickHouse statements (strings only; never the Python API), checked
after every step against a plain-Python model. Engine semantics are
already fuzzed at the engine level (test_lifecycle_fuzz); this walk
targets the STATEMENT surface a migrating runbook actually drives.

Determinism: unique (k, ts) keys per table (the engine's dedup has its
own fuzz), exact value domains (ints / halves / short strings).
"""

from __future__ import annotations

import random
import tempfile

import pytest

CH_TYPES = {"Int64": "int", "Float64": "double", "String": "string"}


def _gen_value(rng, typ):
    if typ == "Int64":
        return rng.randrange(-1000, 1000)
    if typ == "Float64":
        return rng.randrange(-1000, 1000) / 2.0
    return f"s{rng.randrange(100)}"


def _lit(v, typ):
    if v is None:
        return "NULL"
    if typ == "String":
        return f"'{v}'"
    return repr(v)


class TableModel:
    def __init__(self):
        self.cols: list[tuple[str, str]] = []   # payload (name, CH type)
        self.defaults: dict[str, object] = {}
        self.rows: dict[tuple[str, int], dict] = {}
        self.next_id = 0

    def expected(self):
        names = [n for n, _t in self.cols]
        return sorted(
            (k, ts, *[v.get(n) for n in names])
            for (k, ts), v in self.rows.items())


def _check(sess, name, m):
    names = ["k", "ts"] + [n for n, _t in m.cols]
    got = sorted(
        tuple(r[n] for n in names)
        for r in sess.execute(f"SELECT * FROM {name}").collect())
    assert got == m.expected(), (
        f"{name}: engine={got[:3]}... model={m.expected()[:3]}... "
        f"cols={m.cols}")
    n = sess.execute(f"SELECT count() AS n FROM {name}").collect()[0]["n"]
    assert n == len(m.rows)


@pytest.mark.parametrize("seed", range(5))
def test_session_runbook_fuzz(spark, seed):
    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    rng = random.Random(8800 + seed)
    sess = ClickHouseSession(spark, tempfile.mkdtemp(prefix="sess_fuzz_"))
    tables: dict[str, TableModel] = {}
    counter = [0]

    def create():
        name = f"t{counter[0]}"
        counter[0] += 1
        n_cols = rng.randrange(1, 3)
        m = TableModel()
        col_ddl = []
        for _ in range(n_cols):
            cname = f"c{counter[0]}"
            counter[0] += 1
            ctype = rng.choice(list(CH_TYPES))
            m.cols.append((cname, ctype))
            col_ddl.append(f"{cname} {ctype}")
        sess.execute(
            f"CREATE TABLE {name} (k String, ts UInt64, "
            f"{', '.join(col_ddl)}) ENGINE = MergeTree() ORDER BY (k, ts)")
        tables[name] = m

    create()
    for _step in range(rng.randrange(15, 25)):
        if not tables:
            create()
            continue
        name = rng.choice(sorted(tables))
        m = tables[name]
        op = rng.choice(
            ["insert", "insert", "insert", "select", "optimize",
             "add", "create", "truncate", "drop_table", "drop_col"])
        if op == "create" and len(tables) < 3:
            create()
        elif op == "insert":
            vals = []
            for _ in range(rng.randrange(1, 5)):
                k, ts = f"k{m.next_id}", m.next_id
                m.next_id += 1
                row = {n: _gen_value(rng, t) for n, t in m.cols}
                m.rows[(k, ts)] = row
                vals.append(
                    f"('{k}', {ts}, "
                    + ", ".join(_lit(row[n], t) for n, t in m.cols) + ")")
            sess.execute(f"INSERT INTO {name} VALUES {', '.join(vals)}")
        elif op == "select":
            _check(sess, name, m)
        elif op == "optimize":
            sess.execute(
                f"OPTIMIZE TABLE {name}"
                + (" FINAL" if rng.random() < 0.5 else ""))
        elif op == "add":
            cname = f"c{counter[0]}"
            counter[0] += 1
            ctype = rng.choice(list(CH_TYPES))
            default = _gen_value(rng, ctype)
            sess.execute(
                f"ALTER TABLE {name} ADD COLUMN {cname} {ctype} "
                f"DEFAULT {_lit(default, ctype)}")
            m.cols.append((cname, ctype))
            m.defaults[cname] = default
            for v in m.rows.values():
                v[cname] = default
        elif op == "drop_col" and len(m.cols) > 1:
            cname, _t = rng.choice(m.cols)
            try:
                sess.execute(f"ALTER TABLE {name} DROP COLUMN {cname}")
            except ValueError:
                continue  # structural column — refused, fine
            m.cols = [(n, t) for n, t in m.cols if n != cname]
            for v in m.rows.values():
                v.pop(cname, None)
        elif op == "truncate":
            sess.execute(f"TRUNCATE TABLE {name}")
            m.rows.clear()
        elif op == "drop_table" and len(tables) > 1:
            sess.execute(f"DROP TABLE {name}")
            del tables[name]
    for name, m in sorted(tables.items()):
        _check(sess, name, m)
        sess.execute(f"DROP TABLE {name}")


# ---------------------------------------------------------------------------
# Round 9: structural routes × live engine state (VERDICT r8 item 7).
# The chsql-route fuzz (test_chsql_fuzz) drives routes over STATIC
# parquet views; this family drives them through ClickHouseSession over
# MUTATING engine tables — FINAL over pending lightweight-delete masks,
# SAMPLE over evolved schemas, LIMIT BY / WITH TOTALS / ARRAY JOIN /
# WITH FILL over tables mid-merge — checked after every step against a
# plain-Python model (first-wins (k, ts) dedup, the engine contract).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(5))
def test_session_route_fuzz(spark, seed):
    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    rng = random.Random(9900 + seed)
    sess = ClickHouseSession(spark, tempfile.mkdtemp(prefix="route_fuzz_"))
    name = "rt"
    sess.execute(f"CREATE TABLE {name} (k String, ts UInt64, a Int64) "
                 f"ENGINE = MergeTree() ORDER BY (k, ts) SAMPLE BY k")
    rows: dict[tuple[str, int], dict] = {}   # model: (k, ts) -> payload
    cols: list[tuple[str, str]] = [("a", "Int64")]
    next_id = [0]

    def insert(dup: bool) -> None:
        vals = []
        for _ in range(rng.randrange(1, 6)):
            if dup and rows and rng.random() < 0.7:
                # exact duplicate row: plain-mode dedup
                # (dropDuplicates) picks an arbitrary physical copy, so
                # only byte-identical dups have a deterministic read;
                # re-inserting them exercises dedup across parts, lw
                # masks, and merges without a versioned model
                k, ts = rng.choice(sorted(rows))
                payload = dict(rows[(k, ts)])
            else:
                k, ts = f"k{next_id[0] % 7}", next_id[0]
                next_id[0] += 1
                payload = {n: _gen_value(rng, t) for n, t in cols}
                rows[(k, ts)] = payload
            vals.append(f"('{k}', {ts}, " + ", ".join(
                _lit(payload[n], t) for n, t in cols) + ")")
        sess.execute(f"INSERT INTO {name} VALUES {', '.join(vals)}")

    def probe_final() -> None:
        got = sorted(
            (r["k"], r["ts"], *[r[n] for n, _t in cols])
            for r in sess.execute(f"SELECT * FROM {name} FINAL").collect())
        exp = sorted((k, ts, *[v.get(n) for n, _t in cols])
                     for (k, ts), v in rows.items())
        assert got == exp

    def probe_sample() -> None:
        q = f"SELECT k, ts FROM {name} SAMPLE 0.5"
        got1 = sorted((r["k"], r["ts"])
                      for r in sess.execute(q).collect())
        got2 = sorted((r["k"], r["ts"])
                      for r in sess.execute(q).collect())
        assert got1 == got2  # deterministic
        assert set(got1) <= set(rows)  # subset of live rows
        # per-entity: a sampled key is in or out with ALL its rows
        in_keys = {k for k, _ts in got1}
        assert all((k, ts) in set(got1)
                   for (k, ts) in rows if k in in_keys)
        sub = sorted((r["k"], r["ts"]) for r in sess.execute(
            f"SELECT k, ts FROM {name} SAMPLE 0.25").collect())
        assert set(sub) <= set(got1)  # nested

    def probe_limit_by() -> None:
        got = sorted((r["k"], r["ts"]) for r in sess.execute(
            f"SELECT k, ts FROM {name} ORDER BY ts LIMIT 1 BY k"
        ).collect())
        exp = sorted((k, min(t for kk, t in rows if kk == k))
                     for k in {k for k, _t in rows})
        assert got == exp

    def probe_with_totals() -> None:
        got = {r["k"]: r["n"] for r in sess.execute(
            f"SELECT k, count() AS n FROM {name} GROUP BY k WITH TOTALS"
        ).collect()}
        exp = {}
        for k, _ts in rows:
            exp[k] = exp.get(k, 0) + 1
        if rows:
            # over an EMPTY input Spark's GROUPING SETS yields no rows
            # at all — the pinned WITH TOTALS deviation (sweep seed 16;
            # see _rewrite_with_totals and the companion unit test)
            exp[None] = len(rows)
        assert got == exp

    def probe_array_join() -> None:
        got = sorted((r["k"], r["ts"], r["e"]) for r in sess.execute(
            f"SELECT k, ts, e FROM {name} "
            f"ARRAY JOIN range(modulo(ts, 3)) AS e").collect())
        exp = sorted((k, ts, e)
                     for (k, ts) in rows for e in range(ts % 3))
        assert got == exp

    def probe_with_fill() -> None:
        if not rows:
            return
        got = [(r["ts"], r["n"]) for r in sess.execute(
            f"SELECT ts, count() AS n FROM {name} "
            f"GROUP BY ts ORDER BY ts WITH FILL").collect()]
        counts = {}
        for _k, ts in rows:
            counts[ts] = counts.get(ts, 0) + 1
        lo, hi = min(counts), max(counts)
        exp = [(t, counts.get(t, 0)) for t in range(lo, hi + 1)]
        assert got == exp

    def probe_subq_limit_by() -> None:
        # routed construct INSIDE a FROM-subquery (the r9 subquery
        # pre-pass) over the live table: outer agg of a LIMIT 2 BY
        got = sorted((r["k"], r["n"]) for r in sess.execute(
            f"SELECT k, count() AS n FROM ("
            f"SELECT k, ts FROM {name} ORDER BY ts LIMIT 2 BY k"
            f") GROUP BY k").collect())
        per_k: dict[str, int] = {}
        for k, _ts in rows:
            per_k[k] = per_k.get(k, 0) + 1
        exp = sorted((k, min(n, 2)) for k, n in per_k.items())
        assert got == exp

    probes = [probe_final, probe_sample, probe_limit_by,
              probe_with_totals, probe_array_join, probe_with_fill,
              probe_subq_limit_by]
    insert(dup=False)
    for _step in range(rng.randrange(12, 18)):
        op = rng.choice(["insert", "insert", "dup_insert", "lw_delete",
                         "add_col", "optimize"])
        if op == "insert":
            insert(dup=False)
        elif op == "dup_insert":
            insert(dup=True)
        elif op == "lw_delete":
            cut = rng.randrange(-500, 500)
            sess.execute(f"ALTER TABLE {name} DELETE WHERE a < {cut}")
            for key in [key for key, v in rows.items()
                        if v["a"] is not None and v["a"] < cut]:
                del rows[key]
        elif op == "add_col":
            cname = f"x{len(cols)}"
            ctype = rng.choice(list(CH_TYPES))
            default = _gen_value(rng, ctype)
            sess.execute(f"ALTER TABLE {name} ADD COLUMN {cname} {ctype} "
                         f"DEFAULT {_lit(default, ctype)}")
            cols.append((cname, ctype))
            for v in rows.values():
                v[cname] = default
        elif op == "optimize":
            sess.execute(f"OPTIMIZE TABLE {name}"
                         + (" FINAL" if rng.random() < 0.5 else ""))
        rng.choice(probes)()
    for p in probes:  # full route sweep over the final mutated state
        p()
    sess.execute(f"DROP TABLE {name}")
