"""Generative differential fuzz for the star-modifier expansion
(chsql._rewrite_star_modifiers): random EXCEPT subsets, REPLACE
expressions, APPLY chains, and COLUMNS patterns over a typed view,
checked against an independently hand-built explicit SELECT. Seeded —
failures replay exactly.
"""

from __future__ import annotations

import random

import pytest

COLS = [("id", "bigint"), ("grp", "string"), ("v", "double"),
        ("w", "double"), ("cnt", "bigint")]
NUMERIC = ["id", "v", "w", "cnt"]
AGG_FNS = ["sum", "avg", "min", "max"]
SCALAR_FNS = ["abs", "round"]  # chained AFTER the aggregate (CH refuses
# nested aggregates exactly like Spark, so agg->agg chains are invalid
# statements, not a translation case)


@pytest.fixture(scope="module")
def star_view(spark):
    rows = [(i, f"g{i % 3}", i * 0.5, 10.0 - i, i * i) for i in range(12)]
    schema = ", ".join(f"{c} {t}" for c, t in COLS)
    spark.createDataFrame(rows, schema).createOrReplaceTempView("star_fuzz")
    yield "star_fuzz"


@pytest.mark.parametrize("seed", range(15))
def test_star_modifier_fuzz(spark, star_view, seed):
    from clickhouse_mergetree_spark.chsql import ch_sql

    rng = random.Random(7000 + seed)
    names = [c for c, _ in COLS]
    # random modifier statement over the numeric columns
    keep_str = rng.random() < 0.5  # keep grp as a group key or drop all
    except_cols = {"grp"} if not keep_str else set()
    except_cols |= set(rng.sample(NUMERIC, rng.randint(0, 2)))
    survivors = [c for c in names if c not in except_cols]
    if not survivors:
        survivors, except_cols = names, set()
    replace_col = rng.choice([c for c in survivors if c in NUMERIC]
                             or [None])
    applies = [rng.choice(AGG_FNS)]
    if rng.random() < 0.5:
        applies.append(rng.choice(SCALAR_FNS))
    if "grp" in survivors:
        # aggregating a string column is an error on both engines
        except_cols.add("grp")
        survivors = [c for c in survivors if c != "grp"]

    mods = ""
    if except_cols:
        mods += f" EXCEPT ({', '.join(sorted(except_cols))})"
    repl_expr = None
    if replace_col and replace_col in survivors and rng.random() < 0.7:
        repl_expr = f"{replace_col} * 2 + 1"
        mods += f" REPLACE({repl_expr} AS {replace_col})"
    for f in applies:
        mods += f" APPLY({f})"
    stmt = f"SELECT grp, *{mods} FROM star_fuzz GROUP BY ALL ORDER BY ALL"

    # independent hand expansion
    items = []
    for c in survivors:
        e = repl_expr if (repl_expr and c == replace_col) else f"`{c}`"
        for f in applies:
            e = f"{f}({e})"
        items.append(f"{e} AS `{'_'.join([*reversed(applies), c])}`")
    ref_sql = (f"SELECT grp, {', '.join(items)} FROM star_fuzz "
               f"GROUP BY grp ORDER BY grp")

    got = ch_sql(spark, stmt)
    ref = spark.sql(ref_sql)
    assert got.columns == ref.columns, (stmt, got.columns, ref.columns)
    assert [tuple(r) for r in got.collect()] == \
           [tuple(r) for r in ref.collect()], stmt


@pytest.mark.parametrize("seed", range(10))
def test_columns_matcher_fuzz(spark, star_view, seed):
    from clickhouse_mergetree_spark.chsql import ch_sql

    rng = random.Random(8000 + seed)
    pat = rng.choice(["^v$", "^[vw]$", "id|cnt", "^c", "t$", "^(id|w)$"])
    import re as _re

    matched = [c for c, _ in COLS if _re.search(pat, c)]
    fn = rng.choice(AGG_FNS)
    stmt = f"SELECT COLUMNS('{pat}') APPLY({fn}) FROM star_fuzz"
    if not matched:
        with pytest.raises(ValueError, match="matched no columns"):
            ch_sql(spark, stmt)
        return
    got = ch_sql(spark, stmt)
    assert got.columns == [f"{fn}_{c}" for c in matched], (stmt, got.columns)
    ref = spark.sql(
        "SELECT " + ", ".join(f"{fn}(`{c}`)" for c in matched)
        + " FROM star_fuzz")
    assert [tuple(r) for r in got.collect()] == \
           [tuple(r) for r in ref.collect()], stmt
