"""Generative fuzz for the ClickHouse-dialect translator (round 9).

test_chsql.py pins one static translation per rule; this generates
random NESTED dialect expressions — scalar trees composed from the
function-rename table, -If combinator aggregates over them, dialect
group keys and predicates — and runs each full query through ch_sql
against a DuckDB recomputation built from an independent template
table. Targets the translator's bottom-up rewriting (nested calls,
args that are themselves dialect calls), where a static case table
can't reach.

Determinism notes: argMax keys on the unique event_id so ties cannot
make the engines pick different rows; float aggregates are rounded to
4 dp on BOTH sides (the repo's usual cross-engine float contract).
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


# scalar templates: (ch_template, duck_template, child types)
NUM_LEAVES = [
    ("value", "value"),
    ("toFloat64(value)", "CAST(value AS DOUBLE)"),
    ("toFloat64(user_id)", "CAST(user_id AS DOUBLE)"),
]
NUM_OPS = [
    ("abs({0})", "abs({0})", 1),
    ("round({0}, 2)", "round({0}, 2)", 1),
    ("greatest({0}, {1})", "greatest({0}, {1})", 2),
    ("least({0}, {1})", "least({0}, {1})", 2),
    ("({0} + {1})", "({0} + {1})", 2),
    ("multiIf({0} > 50, {1}, {0})", "CASE WHEN {0} > 50 THEN {1} ELSE {0} END", 2),
    ("if({0} > 25, {1}, {0})", "CASE WHEN {0} > 25 THEN {1} ELSE {0} END", 2),
]
STR_LEAVES = [
    ("event_type", "event_type"),
    ("toString(user_id)", "CAST(user_id AS VARCHAR)"),
]
STR_OPS = [
    ("lower({0})", "lower({0})", 1),
    ("upper({0})", "upper({0})", 1),
    ("concat({0}, '_x')", "concat({0}, '_x')", 1),
    ("substring({0}, 1, 3)", "substring({0}, 1, 3)", 1),
]
PREDS = [
    ("value > {c}", "value > {c}"),
    ("modulo(user_id, {m}) = 1", "(user_id % {m}) = 1"),
    ("event_type != 'click'", "event_type != 'click'"),
    ("toYear(ts) >= 2023", "year(ts) >= 2023"),
]
GROUPS = [
    ("event_type", "event_type"),
    ("modulo(user_id, {m})", "user_id % {m}"),
    ("toYear(ts)", "CAST(year(ts) AS BIGINT)"),
    ("toDate(toStartOfMonth(ts))", "CAST(date_trunc('month', ts) AS DATE)"),
]


def _gen_num(rng: random.Random, depth: int) -> tuple[str, str]:
    if depth <= 0 or rng.random() < 0.35:
        return rng.choice(NUM_LEAVES)
    ch_t, dk_t, arity = rng.choice(NUM_OPS)
    kids = [_gen_num(rng, depth - 1) for _ in range(arity)]
    return (ch_t.format(*[k[0] for k in kids]),
            dk_t.format(*[k[1] for k in kids]))


def _gen_str(rng: random.Random, depth: int) -> tuple[str, str]:
    if depth <= 0 or rng.random() < 0.4:
        return rng.choice(STR_LEAVES)
    ch_t, dk_t, _ = rng.choice(STR_OPS)
    kid = _gen_str(rng, depth - 1)
    return ch_t.format(kid[0]), dk_t.format(kid[1])


def _gen_aggs(rng: random.Random) -> list[tuple[str, str]]:
    n_ch, n_dk = _gen_num(rng, rng.randrange(1, 4))
    s_ch, s_dk = _gen_str(rng, rng.randrange(1, 3))
    p_ch, p_dk = rng.choice(PREDS)
    c, m = rng.randrange(10, 80), rng.randrange(2, 6)
    p_ch, p_dk = p_ch.format(c=c, m=m), p_dk.format(c=c, m=m)
    pool = [
        (f"countIf({p_ch}) AS a{{i}}",
         f"count(*) FILTER ({p_dk}) AS a{{i}}"),
        (f"round(sumIf({n_ch}, {p_ch}), 4) AS a{{i}}",
         f"round(coalesce(sum({n_dk}) FILTER ({p_dk}), 0), 4) AS a{{i}}"),
        (f"round(avg({n_ch}), 4) AS a{{i}}",
         f"round(avg({n_dk}), 4) AS a{{i}}"),
        (f"uniqExact({s_ch}) AS a{{i}}",
         f"count(DISTINCT {s_dk}) AS a{{i}}"),
        (f"argMax({s_ch}, event_id) AS a{{i}}",
         f"arg_max({s_dk}, event_id) AS a{{i}}"),
        (f"round(min({n_ch}) + max({n_ch}), 4) AS a{{i}}",
         f"round(min({n_dk}) + max({n_dk}), 4) AS a{{i}}"),
        (f"round(quantileExact(0.5)({n_ch}), 4) AS a{{i}}",
         f"round(quantile_cont({n_dk}, 0.5), 4) AS a{{i}}"),
    ]
    picks = rng.sample(pool, rng.randrange(1, 4))
    return [(ch.format(i=i), dk.format(i=i))
            for i, (ch, dk) in enumerate(picks)]


@pytest.mark.parametrize("seed", range(12))
def test_dialect_expression_fuzz(spark, duck, views, seed):
    rng = random.Random(11_000 + seed)
    g_ch, g_dk = rng.choice(GROUPS)
    m = rng.randrange(2, 7)
    g_ch, g_dk = g_ch.format(m=m), g_dk.format(m=m)
    aggs = _gen_aggs(rng)
    w_ch, w_dk = rng.choice(PREDS)
    c, m2 = rng.randrange(5, 90), rng.randrange(2, 8)
    w_ch, w_dk = w_ch.format(c=c, m=m2), w_dk.format(c=c, m=m2)
    where = rng.choice(["", "where"])
    ch_aggs = ", ".join(a[0] for a in aggs)
    dk_aggs = ", ".join(a[1] for a in aggs)
    ch_q = (f"SELECT {g_ch} AS g, {ch_aggs} FROM events "
            + (f"PREWHERE {w_ch} " if where else "")
            + "GROUP BY g")
    dk_q = (f"SELECT {g_dk} AS g, {dk_aggs} FROM events "
            + (f"WHERE {w_dk} " if where else "")
            + "GROUP BY g")
    compare(ch_sql(spark, ch_q), duck, dk_q)
