"""Tolerance tests for the sketch aggregates.

Sketch internals differ across engines BY DESIGN, so the driver oracle
for q_agg_approx_distinct / q_agg_approx_percentile / q_uniq_state_merge
is an inequality relation (r9): the estimates persist as a side table
and DuckDB asserts them inside the published envelope against its own
exact answers. These tests bound the same estimates in-session (HLL++
at rsd=0.02, percentile_approx at accuracy=10000, HLL lgK=14) and pin
that the envelope oracle actually REJECTS poisoned estimates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_mergetree_spark.registry import all_queries
from clickhouse_mergetree_spark.tables import load


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = all_queries()["q_agg_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    exact = {
        r["l_returnflag"]: r["exact"]
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact"))
        .collect()
    }
    for r in rows:
        e = exact[r["l_returnflag"]]
        # rsd 0.02 → 5 sigma + small-count floor
        assert abs(r["approx_parts"] - e) <= max(3, 0.10 * e), (r, e)


def test_approx_percentile_within_rank_tolerance(spark, sf_dir):
    rows = all_queries()["q_agg_approx_percentile"].fn(spark, sf_dir).collect()
    assert rows
    li = load(spark, sf_dir, "lineitem")
    by_flag_qty: dict[str, list[float]] = {}
    by_flag_price: dict[str, list[float]] = {}
    for r in li.select("l_returnflag", "l_quantity", "l_extendedprice").collect():
        by_flag_qty.setdefault(r["l_returnflag"], []).append(r["l_quantity"])
        by_flag_price.setdefault(r["l_returnflag"], []).append(
            r["l_extendedprice"])
    for v in by_flag_qty.values():
        v.sort()
    for v in by_flag_price.values():
        v.sort()

    def rank_window(vals, q, tol=0.02):
        n = len(vals)
        lo = vals[max(0, int((q - tol) * n) - 1)]
        hi = vals[min(n - 1, int(min(1.0, q + tol) * n))]
        return lo, hi

    for r in rows:
        flag = r["l_returnflag"]
        lo, hi = rank_window(by_flag_qty[flag], r["quantile_level"])
        assert lo <= r["qty_quantile"] <= hi, (flag, r, lo, hi)
        lo, hi = rank_window(by_flag_price[flag], 0.5)
        assert lo <= r["median_price"] <= hi, (flag, r, lo, hi)


def test_uniq_state_merge_within_hll_error(spark, sf_dir):
    """Merged day-states must estimate per-type distinct users inside
    the lgK=14 HLL envelope (rse ≈ 1.04/√2^14 ≈ 0.8%; allow 3σ)."""
    rows = all_queries()["q_uniq_state_merge"].fn(spark, sf_dir).collect()
    assert rows
    exact = {
        r["event_type"]: r["exact"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        e = exact[r["event_type"]]
        assert abs(r["approx_users"] - e) <= max(1, 0.025 * e), (
            r["event_type"], r["approx_users"], e)


def test_envelope_oracle_rejects_poisoned_estimates(spark, sf_dir, duck):
    """r9: the sketch queries' driver contract is an inequality relation
    — DuckDB recomputes the exact answers and checks the PERSISTED
    estimates against the published envelope. A garbage estimate must
    flip the oracle's boolean (which breaks the driver's value hash)."""
    import pandas as pd

    from clickhouse_mergetree_spark.operators.relational import (
        _approx_distinct_dir, _uniq_state_dir,
    )
    from clickhouse_mergetree_spark.registry import all_queries

    qs = all_queries()
    # honest run first: oracle says every group is inside the envelope
    qs["q_agg_approx_distinct"].fn(spark, sf_dir).collect()
    ok = duck.execute(qs["q_agg_approx_distinct"].oracle).fetchdf()
    assert ok["within_envelope"].all() and len(ok) > 0
    qs["q_uniq_state_merge"].fn(spark, sf_dir).collect()
    ok2 = duck.execute(qs["q_uniq_state_merge"].oracle).fetchdf()
    assert ok2["within_envelope"].all() and len(ok2) > 0

    # poison the persisted estimates (corpus marker kept honest so the
    # flip is attributable to the ESTIMATE check): every boolean flips
    try:
        spark.createDataFrame(
            pd.DataFrame({"l_returnflag": ok["l_returnflag"],
                          "approx_parts": [10 ** 9] * len(ok),
                          "n_rows": ok["n_rows"]})
        ).coalesce(1).write.mode("overwrite") \
            .parquet(_approx_distinct_dir())
        bad = duck.execute(qs["q_agg_approx_distinct"].oracle).fetchdf()
        assert not bad["within_envelope"].any()
        spark.createDataFrame(
            pd.DataFrame({"event_type": ok2["event_type"],
                          "approx_users": [1] * len(ok2),
                          "n_rows": ok2["n_rows"]})
        ).coalesce(1).write.mode("overwrite").parquet(_uniq_state_dir())
        bad2 = duck.execute(qs["q_uniq_state_merge"].oracle).fetchdf()
        assert not bad2["within_envelope"].any()
    finally:
        # restore honest side tables for any later consumer in-session
        qs["q_agg_approx_distinct"].fn(spark, sf_dir).collect()
        qs["q_uniq_state_merge"].fn(spark, sf_dir).collect()


def test_envelope_oracle_rejects_stale_corpus(spark, sf_dir, duck):
    """ADVICE r9: the side tables live at a fixed machine-wide path, so
    a stale write left by a run at a different scale factor could feed
    the oracle someone else's estimates. The persisted n_rows corpus
    marker must flip the verdict when it disagrees with the oracle's own
    count — even when the estimate itself happens to sit in-envelope."""
    import pandas as pd

    from clickhouse_mergetree_spark.operators.relational import (
        _approx_distinct_dir, _approx_pctl_dir, _uniq_state_dir,
    )

    qs = all_queries()
    ok = None
    try:
        # honest estimates, WRONG corpus marker (as a different-SF run
        # would leave behind): every verdict must flip
        qs["q_agg_approx_distinct"].fn(spark, sf_dir).collect()
        ok = duck.execute(qs["q_agg_approx_distinct"].oracle).fetchdf()
        assert ok["within_envelope"].all()
        spark.createDataFrame(
            pd.DataFrame({"l_returnflag": ok["l_returnflag"],
                          "approx_parts": ok["approx_parts"],
                          "n_rows": ok["n_rows"] * 10})
        ).coalesce(1).write.mode("overwrite") \
            .parquet(_approx_distinct_dir())
        stale = duck.execute(qs["q_agg_approx_distinct"].oracle).fetchdf()
        assert not stale["within_envelope"].any()

        qs["q_agg_approx_percentile"].fn(spark, sf_dir).collect()
        okp = duck.execute(qs["q_agg_approx_percentile"].oracle).fetchdf()
        assert okp["qty_within"].all() and okp["med_within"].all()
        spark.createDataFrame(
            pd.DataFrame({"l_returnflag": okp["l_returnflag"],
                          "quantile_level": okp["quantile_level"],
                          "qty_quantile": okp["qty_quantile"],
                          "median_price": okp["median_price"],
                          "n_rows": okp["n_rows"] * 10})
        ).coalesce(1).write.mode("overwrite").parquet(_approx_pctl_dir())
        stalep = duck.execute(
            qs["q_agg_approx_percentile"].oracle).fetchdf()
        assert not stalep["qty_within"].any()
        assert not stalep["med_within"].any()

        qs["q_uniq_state_merge"].fn(spark, sf_dir).collect()
        oku = duck.execute(qs["q_uniq_state_merge"].oracle).fetchdf()
        assert oku["within_envelope"].all()
        spark.createDataFrame(
            pd.DataFrame({"event_type": oku["event_type"],
                          "approx_users": oku["approx_users"],
                          "n_rows": oku["n_rows"] * 10})
        ).coalesce(1).write.mode("overwrite").parquet(_uniq_state_dir())
        staleu = duck.execute(qs["q_uniq_state_merge"].oracle).fetchdf()
        assert not staleu["within_envelope"].any()
    finally:
        qs["q_agg_approx_distinct"].fn(spark, sf_dir).collect()
        qs["q_agg_approx_percentile"].fn(spark, sf_dir).collect()
        qs["q_uniq_state_merge"].fn(spark, sf_dir).collect()
