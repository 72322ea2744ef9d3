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
