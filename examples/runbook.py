"""ClickHouse migration runbook demo — one ClickHouseSession executes a
realistic dashboard runbook top-to-bottom, every statement in ClickHouse
SQL, unchanged: DDL (tables, a SummingMergeTree materialized view, a
dictionary), dialect INSERT ... SELECT backfills, and the SELECT
constructs with no 1:1 Spark string form (FINAL, SAMPLE, LIMIT n BY,
WITH TOTALS, ASOF JOIN, ARRAY JOIN, WITH FILL, dictGet) — each routed to
the engine read or DataFrame plan that owns its semantics.

Run: python examples/runbook.py     (writes under a temp dir, cleans up)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_mergetree_spark.chsql import ClickHouseSession
from clickhouse_mergetree_spark.session import get_spark

RUNBOOK = """
CREATE TABLE trades (
    sym String,
    ts UInt64,
    px Float64,
    qty UInt64
) ENGINE = MergeTree() ORDER BY (sym, ts) SAMPLE BY sym;

INSERT INTO trades VALUES
    ('AAPL', 100, 190.0, 10), ('AAPL', 200, 191.5, 20),
    ('AAPL', 200, 191.5, 20), ('AAPL', 300, 189.0, 5),
    ('MSFT', 150, 410.0, 7),  ('MSFT', 250, 412.0, 9),
    ('NVDA', 120, 880.0, 3),  ('NVDA', 260, 905.0, 4);

CREATE TABLE quotes (
    sym String,
    ts UInt64,
    bid Float64
) ENGINE = MergeTree() ORDER BY (sym, ts);

INSERT INTO quotes VALUES
    ('AAPL', 150, 189.9), ('AAPL', 250, 191.0),
    ('MSFT', 100, 409.5), ('NVDA', 500, 900.0);

CREATE MATERIALIZED VIEW volume_mv
ENGINE = SummingMergeTree() ORDER BY (sym)
POPULATE
AS SELECT sym, sum(qty) AS vol FROM trades GROUP BY sym;

CREATE TABLE names (
    sym String,
    ts UInt64,
    cname String
) ENGINE = MergeTree() ORDER BY (sym, ts);

INSERT INTO names VALUES
    ('AAPL', 1, 'Apple'), ('MSFT', 1, 'Microsoft');

CREATE DICTIONARY name_dict (sym String, cname String)
PRIMARY KEY sym
SOURCE(CLICKHOUSE(TABLE 'names'))
LAYOUT(FLAT()) LIFETIME(300);
"""

QUERIES = {
    "FINAL (collapsed engine read)":
        "SELECT sym, count() AS n FROM trades FINAL GROUP BY sym",
    "WITH TOTALS":
        "SELECT sym, sum(qty) AS vol FROM trades GROUP BY sym WITH TOTALS",
    "LIMIT 1 BY sym (best price per symbol)":
        "SELECT sym, px FROM trades ORDER BY px DESC LIMIT 1 BY sym",
    "SAMPLE 0.5 (deterministic entity sample)":
        "SELECT sym, count() AS n FROM trades SAMPLE 0.5 GROUP BY sym",
    "ARRAY JOIN (per-symbol tag expansion)":
        "SELECT sym, tag, count() AS n FROM trades "
        "ARRAY JOIN splitByChar('.', concat(sym, '.EQ')) AS tag "
        "GROUP BY sym, tag",
    "ASOF JOIN (trade as-of each quote)":
        "SELECT q.sym, q.ts, t.px FROM quotes q ASOF LEFT JOIN trades t "
        "ON q.sym = t.sym AND q.ts >= t.ts",
    "WITH FILL (densified tick axis)":
        "SELECT ts, count() AS n FROM trades WHERE sym = 'AAPL' "
        "GROUP BY ts ORDER BY ts WITH FILL FROM 100 TO 400 STEP 100",
    "dictGet + countIf dialect":
        "SELECT dictGetOrDefault('name_dict', 'cname', sym, sym) AS who, "
        "countIf(px > 200) AS n_big FROM trades GROUP BY who",
    "materialized view rollup":
        "SELECT sym, vol FROM volume_mv",
    "star modifiers (wide-table audit)":
        "SELECT sym, COLUMNS('^(px|qty)$') "
        "REPLACE(px * qty AS px) APPLY(sum) "
        "FROM trades GROUP BY ALL ORDER BY ALL",
    "EXPLAIN (plan eyeball)":
        "EXPLAIN SELECT sym, sum(qty) FROM trades GROUP BY sym",
}

EPILOGUE = """
CREATE TABLE daily ENGINE = MergeTree() ORDER BY (sym)
AS SELECT sym, countIf(px > 200) AS n_big, round(sum(qty), 2) AS vol
FROM trades GROUP BY sym;

RENAME TABLE daily TO daily_rollup;

CREATE TABLE daily_next ENGINE = MergeTree() ORDER BY (sym)
AS SELECT sym, countIf(px > 150) AS n_big, round(sum(qty), 2) AS vol
FROM trades GROUP BY sym;

EXCHANGE TABLES daily_rollup AND daily_next;

DROP TABLE daily_next;

SHOW TABLES;
"""


def main() -> None:
    spark = get_spark("runbook-demo", cpus=4)
    root = tempfile.mkdtemp(prefix="runbook_")
    try:
        sess = ClickHouseSession(spark, root)
        for stmt in RUNBOOK.split(";"):
            if stmt.strip():
                sess.execute(stmt)
        for title, q in QUERIES.items():
            print(f"\n=== {title} ===\n    {q}")
            for row in sess.execute(q).collect():
                print("   ", tuple(row))
        print("\n=== CTAS + RENAME + SHOW TABLES ===")
        out = None
        for stmt in EPILOGUE.split(";"):
            if stmt.strip():
                out = sess.execute(stmt)
        for row in out.collect():
            print("   ", tuple(row))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
