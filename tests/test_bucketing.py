"""Bucketed co-located join — the pre-shuffle scale technique.

At 100 TB the dominant cost of a repeated fact⨝fact join is re-shuffling
both sides on the join key every query. Bucketing pays that shuffle ONCE
at write time: both tables are hash-partitioned into the same number of
buckets on the join key (and sorted within buckets), so Catalyst plans a
SortMergeJoin with ZERO Exchange operators — each task zips bucket i of
both sides locally. This test pins that plan shape and its correctness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.tables import load

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    load(spark, sf_dir, "orders").write.bucketBy(
        N_BUCKETS, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite").saveAsTable("orders_b")
    load(spark, sf_dir, "lineitem").write.bucketBy(
        N_BUCKETS, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite").saveAsTable("lineitem_b")
    return None


def _colocated_join(spark):
    # disable broadcast so the plan must choose shuffle vs co-located SMJ
    return (
        spark.table("lineitem_b")
        .hint("merge")
        .join(spark.table("orders_b"),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )


def test_bucketed_join_has_no_exchange(spark, bucketed):
    plan = (_colocated_join(spark)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, (
        "bucketed tables must join without shuffling either side")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    got = _colocated_join(spark).count()
    expect = (
        load(spark, sf_dir, "lineitem")
        .join(load(spark, sf_dir, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert got == expect


def test_bucketed_groupby_needs_no_shuffle(spark, bucketed):
    # aggregation on the bucket key also reuses the bucketing layout
    df = spark.table("orders_b").groupBy("o_orderkey").agg(
        F.count("*").alias("n"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
