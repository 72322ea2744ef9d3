"""Dictionary-family semantics on crafted inputs (oracle parity covers the
full tables; these pin the lookup contracts: default substitution on miss,
range-boundary inclusion, ancestor-chain order) plus the broadcast plan
shape the module's docstring promises.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_mergetree_spark.operators.dictionaries import (
    DICT_MISS_DEFAULT,
    q_dict_get_default,
    q_dict_hierarchy,
    q_dict_range,
)


def test_dict_default_and_has_agree(spark, sf_dir):
    df = q_dict_get_default(spark, sf_dir)
    # miss rows: shifted_has False <=> shifted_name is the default
    bad = df.filter(
        (F.col("shifted_has") & (F.col("shifted_name")
                                 == DICT_MISS_DEFAULT))
        | (~F.col("shifted_has") & (F.col("shifted_name")
                                    != DICT_MISS_DEFAULT))
    ).count()
    assert bad == 0
    # nationkeys 0-24, shift +13 => keys 12..24 miss (13..37 vs 0..24)
    misses = df.filter(~F.col("shifted_has")).count()
    assert misses > 0
    hits = df.filter(F.col("shifted_has")).count()
    assert hits > 0


def test_dict_lookups_broadcast(spark, sf_dir):
    for q in (q_dict_get_default, q_dict_range):
        plan = (q(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan, plan[:800]
        assert "SortMergeJoin" not in plan, (
            "dictionary probe shuffled the fact side:\n" + plan[:800])


def test_dict_range_resolves_single_period(spark, sf_dir):
    # every (region, year) group must resolve to exactly one rate period
    df = q_dict_range(spark, sf_dir)
    bad = df.filter(F.col("rate_min") != F.col("rate_max")).count()
    assert bad == 0
    assert df.count() > 0


def test_dict_hierarchy_chain_shape(spark, sf_dir):
    rows = q_dict_hierarchy(spark, sf_dir).collect()
    assert rows and all(r["depth"] == 2 for r in rows)
    for r in rows:
        chain = [int(x) for x in r["hierarchy"].split(",")]
        assert len(chain) == 3
        assert chain[0] == r["node"]          # self first
        assert 100 <= chain[1] < 1000         # nation node
        assert 0 <= chain[2] < 100            # region root
        assert r["in_region_2"] == (chain[2] == 2)
