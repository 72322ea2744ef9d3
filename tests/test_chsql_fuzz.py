"""Randomized fuzz over the chsql structural routes (round 8).

The hand-written cases in test_chsql.py pin one shape per construct;
these walks generate random parameterizations — group keys, aggregate
mixes, ORDER BY directions, LIMIT BY group expressions, fill bounds and
steps, every ASOF inequality direction × join type — and compare each
against a PROGRAMMATICALLY BUILT DuckDB equivalent (window formulations
for LIMIT BY, GROUPING SETS for TOTALS, generate_series for FILL, and
DuckDB's native ASOF JOIN with shift/negate tricks for the strict and
forward directions). The routes' parsers, not just their happy paths,
are the target: every query string here goes through ch_sql end-to-end.
"""

from __future__ import annotations

import random

import pytest

from clickhouse_mergetree_spark.chsql import ch_sql
from tests.oracle_compare import compare


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    from clickhouse_mergetree_spark.tables import register_views

    register_views(spark, sf_dir)
    yield


@pytest.fixture(scope="module")
def duckv(duck, spark, views):
    # (user, t)-deduped asof inputs on BOTH engines: no rank ambiguity
    clicks = ("SELECT user_id, epoch_us(ts) AS t, max(event_id) AS eid, "
              "max(value) AS cval FROM events WHERE event_type = 'click' "
              "GROUP BY user_id, epoch_us(ts)")
    purch = ("SELECT user_id, epoch_us(ts) AS t, max(value) AS pval "
             "FROM events WHERE event_type = 'purchase' "
             "GROUP BY user_id, epoch_us(ts)")
    duck.execute(f"CREATE OR REPLACE VIEW fz_clicks AS {clicks}")
    duck.execute(f"CREATE OR REPLACE VIEW fz_purch AS {purch}")
    spark.sql(clicks.replace("epoch_us(ts)", "unix_micros(ts)")) \
        .createOrReplaceTempView("fz_clicks")
    spark.sql(purch.replace("epoch_us(ts)", "unix_micros(ts)")) \
        .createOrReplaceTempView("fz_purch")
    yield duck
    duck.execute("DROP VIEW fz_clicks")
    duck.execute("DROP VIEW fz_purch")


GROUPS = [("event_type", "event_type"),
          ("modulo(user_id, 7)", "user_id % 7"),
          ("toYear(ts)", "CAST(year(ts) AS BIGINT)")]
AGGS = [("count() AS n", "count(*) AS n"),
        ("countIf(value > {x}) AS nb", "count(*) FILTER (value > {x}) AS nb"),
        ("round(sum(value), 4) AS sv", "round(sum(value), 4) AS sv"),
        ("uniqExact(user_id) AS uu", "count(DISTINCT user_id) AS uu"),
        ("max(event_id) AS mx", "max(event_id) AS mx")]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_with_totals(spark, duckv, views, seed):
    rng = random.Random(4200 + seed)
    g_ch, g_dk = rng.choice(GROUPS)
    x = rng.randrange(0, 100)
    aggs = rng.sample(AGGS, rng.randrange(1, 4))
    ch_aggs = ", ".join(a[0].format(x=x) for a in aggs)
    dk_aggs = ", ".join(a[1].format(x=x) for a in aggs)
    got = ch_sql(spark, f"""
        SELECT {g_ch} AS g, {ch_aggs} FROM events
        GROUP BY g WITH TOTALS
    """)
    compare(got, duckv, f"""
        SELECT {g_dk} AS g, {dk_aggs} FROM events
        GROUP BY GROUPING SETS (({g_dk}), ())
    """)


ORDERS = [("value DESC, event_id", "value DESC, event_id"),
          ("ts, event_id", "ts, event_id"),
          ("event_id DESC", "event_id DESC")]
BYS = [("user_id", "user_id"), ("event_type", "event_type"),
       ("modulo(user_id, 5)", "user_id % 5")]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_limit_by(spark, duckv, views, seed):
    rng = random.Random(5200 + seed)
    o_ch, o_dk = rng.choice(ORDERS)
    b_ch, b_dk = rng.choice(BYS)
    n = rng.randrange(1, 4)
    where = rng.choice(["", f"WHERE value > {rng.randrange(0, 60)}"])
    outer = rng.choice(["", f"LIMIT {rng.randrange(5, 40)}"])
    got = ch_sql(spark, f"""
        SELECT event_id, user_id, event_type, value FROM events
        {where} ORDER BY {o_ch} LIMIT {n} BY {b_ch} {outer}
    """)
    m = outer.split()[-1] if outer else None
    limit_sql = f"LIMIT {m}" if m else ""
    exp_sql = f"""
        SELECT event_id, user_id, event_type, value FROM (
            SELECT *, row_number() OVER (PARTITION BY {b_dk}
                                         ORDER BY {o_dk}) AS rn
            FROM events {where}
        ) WHERE rn <= {n} ORDER BY {o_dk} {limit_sql}
    """
    # outer LIMIT makes the result a prefix of a totally-ordered list on
    # both sides; without it the comparison is order-insensitive anyway
    compare(got, duckv, exp_sql)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_with_fill(spark, duckv, views, seed):
    rng = random.Random(6200 + seed)
    k = rng.randrange(2, 9)
    step = rng.choice([1, 2, 5])
    lo = rng.randrange(0, 3)
    hi = lo + step * rng.randrange(3, 12)
    bounds = rng.choice(["explicit", "derived"])
    fill = (f"WITH FILL FROM {lo} TO {hi} STEP {step}"
            if bounds == "explicit" else f"WITH FILL STEP {step}")
    got = ch_sql(spark, f"""
        SELECT modulo(user_id, {k}) * {step} AS b, count() AS n,
               max(event_type) AS mt
        FROM events GROUP BY b ORDER BY b {fill}
    """)
    if bounds == "explicit":
        axis = f"SELECT unnest(generate_series({lo}, {hi - 1}, {step})) AS b"
    else:
        axis = (f"SELECT unnest(generate_series("
                f"(SELECT min(b) FROM base), (SELECT max(b) FROM base), "
                f"{step})) AS b")
    exp_sql = f"""
        WITH base AS (
            SELECT (user_id % {k}) * {step} AS b, count(*) AS n,
                   max(event_type) AS mt
            FROM events GROUP BY b
        ),
        axis AS ({axis})
        SELECT a.b AS b, coalesce(base.n, 0) AS n,
               coalesce(base.mt, '') AS mt
        FROM axis a LEFT JOIN base ON base.b = a.b
        UNION ALL
        SELECT b, n, mt FROM base
        WHERE b NOT IN (SELECT b FROM axis)
    """
    compare(got, duckv, exp_sql)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_asof_join(spark, duckv, views, seed):
    rng = random.Random(7200 + seed)
    op = rng.choice([">=", ">", "<=", "<"])
    how = rng.choice(["", "LEFT "])
    got = ch_sql(spark, f"""
        SELECT c.user_id, c.t, c.eid, p.pval
        FROM fz_clicks c ASOF {how}JOIN fz_purch p
        ON c.user_id = p.user_id AND c.t {op} p.t
    """)
    # DuckDB oracle: native ASOF supports >= directly; strict adds a
    # one-microsecond shift, forward negates the (integer) time axis
    if op in (">=", ">"):
        shift = "t + 1" if op == ">" else "t"
        right = f"SELECT user_id, {shift} AS t2, pval FROM fz_purch"
        probe_t = "c.t"
    else:
        shift = "-t + 1" if op == "<" else "-t"
        right = f"SELECT user_id, {shift} AS t2, pval FROM fz_purch"
        probe_t = "-c.t"
    exp_sql = f"""
        SELECT c.user_id, c.t, c.eid, p.pval
        FROM fz_clicks c ASOF {how or ''}JOIN ({right}) p
        ON c.user_id = p.user_id AND {probe_t} >= p.t2
    """
    compare(got, duckv, exp_sql)


AJ_ITEMS = [
    # (ch item, duckdb element expr, element alias)
    ("splitByChar('-', o_orderpriority) AS tag",
     "unnest(string_split(o_orderpriority, '-'))", "tag"),
    ("splitByString('E', o_orderstatus) AS part",
     "unnest(string_split(o_orderstatus, 'E'))", "part"),
    ("arrayMap(x -> x * 2, range(modulo(o_orderkey, 4))) AS dbl",
     "unnest(list_transform(range(0, CAST(o_orderkey % 4 AS INTEGER)), "
     "x -> x * 2))", "dbl"),
]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_array_join(spark, duckv, views, seed):
    """ARRAY JOIN route × WHERE/GROUP BY tails. LEFT variants are pinned
    against an explicit join-back oracle in test_chsql.py; here the
    plain form is fuzzed against DuckDB's unnest (which drops empties,
    matching plain ARRAY JOIN)."""
    rng = random.Random(8200 + seed)
    item_ch, item_dk, alias = rng.choice(AJ_ITEMS)
    kmax = rng.randrange(60, 400)
    shape = rng.choice(["plain", "group"])
    if shape == "plain":
        got = ch_sql(spark, f"""
            SELECT o_orderkey, {alias}
            FROM orders ARRAY JOIN {item_ch}
            WHERE o_orderkey <= {kmax}
        """)
        exp_sql = f"""
            SELECT o_orderkey, {item_dk} AS {alias}
            FROM orders WHERE o_orderkey <= {kmax}
        """
    else:
        got = ch_sql(spark, f"""
            SELECT {alias}, count() AS n, round(sum(o_totalprice), 4) AS s
            FROM orders ARRAY JOIN {item_ch}
            WHERE o_orderkey <= {kmax}
            GROUP BY {alias}
        """)
        exp_sql = f"""
            SELECT {alias}, count(*) AS n, round(sum(o_totalprice), 4) AS s
            FROM (SELECT o_totalprice, {item_dk} AS {alias}
                  FROM orders WHERE o_orderkey <= {kmax})
            GROUP BY {alias}
        """
    compare(got, duckv, exp_sql)
