"""Semantic tests for the stats family — oracle parity (test_oracle_parity)
proves Spark==DuckDB; these prove both match the DEFINITION on crafted
inputs: the EMA fold equals the unbounded recurrence, sequenceCount's
prefix-deficit closed form equals the greedy matcher, Mann-Whitney's
tie-averaged ranks equal the hand computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _greedy_pairs(seq: str) -> int:
    """Reference greedy matcher for click(c)→purchase(p) chains."""
    open_clicks = pairs = 0
    for ch in seq:
        if ch == "c":
            open_clicks += 1
        elif ch == "p" and open_clicks:
            pairs += 1
            open_clicks -= 1
    return pairs


def test_seq_count_closed_form_equals_greedy(spark):
    cases = ["cpcpp", "ppcp", "cccp", "p", "c", "", "pcpcpc", "ccpppp"]
    rows = []
    for uid, seq in enumerate(cases):
        for i, ch in enumerate(seq):
            rows.append((uid, i, {"c": "click", "p": "purchase"}[ch]))
    df = spark.createDataFrame(rows or [(0, 0, "view")],
                               "user_id long, ts long, event_type string")
    from pyspark.sql import Window as W
    w = (W.partitionBy("user_id").orderBy("ts")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    p_run = F.sum(F.when(F.col("event_type") == "purchase", 1)
                  .otherwise(0)).over(w)
    c_run = F.sum(F.when(F.col("event_type") == "click", 1)
                  .otherwise(0)).over(w)
    got = {
        r["user_id"]: r["pairs"]
        for r in df.select("user_id", p_run.alias("p"), c_run.alias("c"))
        .groupBy("user_id")
        .agg((F.max("p") - F.greatest(F.max(F.col("p") - F.col("c")),
                                      F.lit(0))).alias("pairs"))
        .collect()
    }
    for uid, seq in enumerate(cases):
        if seq:
            assert got[uid] == _greedy_pairs(seq), (uid, seq)


def test_ema_fold_equals_recurrence(spark, sf_dir):
    """The declared query's 32-row-frame fold must equal the unbounded
    EMA recurrence to double precision on real per-user histories."""
    from clickhouse_mergetree_spark.operators.stats import q_ema

    got = {(r["user_id"], r["event_id"]): r["ema"]
           for r in q_ema(spark, sf_dir).collect()}
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("user_id") < 5)
          .select("user_id", "event_id", "ts", "value")
          .collect())
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    n_checked = 0
    for uid, rows in by_user.items():
        ema = None
        for r in rows:
            ema = r["value"] if ema is None else 0.5 * ema + 0.5 * r["value"]
            # compare against the UNROUNDED recurrence: the query rounds
            # half-up to 6dp (|rounded−true| ≤ 0.5e-6) and the 32-row
            # frame truncates (< 5e-8 at this value range), so 1e-6
            # bounds both; comparing two independently-rounded values
            # instead would trip on exact .5-ulp boundaries where
            # Python's banker's rounding and Spark's HALF_UP disagree
            # (seen: true EMA 61.1746875).
            assert abs(got[(uid, r["event_id"])] - ema) < 1e-6, (
                uid, r["event_id"])
            n_checked += 1
    assert n_checked == len(got) and n_checked > 0


def test_mannwhitney_hand_case(spark, monkeypatch, tmp_path):
    """click=[1,2,2], view=[2,3]: joint sorted 1,2,2,2,3 → avg rank of the
    2s = 3; R1 = 1+3+3 = 7; U1 = 7 − 3·4/2 = 1; U2 = 3·2 − 1 = 5."""
    import pandas as pd

    df = pd.DataFrame({
        "event_id": range(5),
        "ts": pd.to_datetime(["2024-01-01"] * 5),
        "user_id": [1, 1, 1, 2, 2],
        "event_type": ["click", "click", "click", "view", "view"],
        "value": [1.0, 2.0, 2.0, 2.0, 3.0],
        "props": [""] * 5,
    })
    # the 'view' rows carry values [2,3]; clicks [1,2,2]
    df.loc[df.event_type == "view", "value"] = [2.0, 3.0]
    df.to_parquet(tmp_path / "events.parquet")
    from clickhouse_mergetree_spark.operators.stats import q_stat_mannwhitney

    row = q_stat_mannwhitney(spark, str(tmp_path)).collect()[0]
    assert (row["n1"], row["n2"]) == (3, 2)
    assert row["u1"] == 1.0 and row["u2"] == 5.0


def test_paste_join_truncates_to_shorter_side(spark, sf_dir):
    from clickhouse_mergetree_spark.operators.relational import q_join_paste

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_click = ev.filter(F.col("event_type") == "click").count()
    n_view = ev.filter(F.col("event_type") == "view").count()
    df = q_join_paste(spark, sf_dir)
    assert df.count() == min(n_click, n_view)
    # positional zip of two ascending sorts ⇒ both columns non-decreasing
    rows = df.orderBy("pos").collect()
    for a, b in zip(rows, rows[1:]):
        assert b["click_value"] >= a["click_value"]
        assert b["view_value"] >= a["view_value"]


def test_ks_hand_case(spark, tmp_path):
    """click=[1,2,3], view=[2,3,4]: D = 1/3 (ECDF gap constant at 1/3
    over [1,4)), lambda = (1/3)*sqrt(9/6)."""
    import math

    import pandas as pd

    df = pd.DataFrame({
        "event_id": range(6),
        "ts": pd.to_datetime(["2024-01-01"] * 6),
        "user_id": [1] * 6,
        "event_type": ["click"] * 3 + ["view"] * 3,
        "value": [1.0, 2.0, 3.0, 2.0, 3.0, 4.0],
        "props": [""] * 6,
    })
    df.to_parquet(tmp_path / "events.parquet")
    from clickhouse_mergetree_spark.operators.stats import q_stat_ks

    row = q_stat_ks(spark, str(tmp_path)).collect()[0]
    assert (row["n1"], row["n2"]) == (3, 3)
    assert abs(row["d_stat"] - 1 / 3) < 1e-9
    lam = (1 / 3) * math.sqrt(9 / 6)
    assert abs(row["lambda"] - lam) < 1e-6
    p = sum((2.0 if k % 2 else -2.0) * math.exp(-2 * k * k * lam * lam)
            for k in range(1, 101))
    assert abs(row["p_approx"] - p) < 1e-5


def test_lttb_matches_python_reference(spark, sf_dir):
    """Bucket-anchor LTTB: re-derive the selection in plain Python per
    user and compare point-for-point (buckets, edges, tie-breaks)."""
    from clickhouse_mergetree_spark.operators.stats import (
        LTTB_BUCKETS, q_lttb)

    got = {(r["user_id"], r["bucket"]): (r["sel_ts_us"], r["sel_value"])
           for r in q_lttb(spark, sf_dir).collect()}
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter("user_id < 20 AND value IS NOT NULL")
          .selectExpr("user_id", "unix_micros(ts) AS x", "value AS y",
                      "event_id")
          .collect())
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["x"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append((r["x"], r["y"]))
    n_checked = 0
    for uid, pts in by_user.items():
        n = len(pts)
        if n < LTTB_BUCKETS:
            continue
        buckets: dict[int, list] = {}
        for rn, (x, y) in enumerate(pts):
            buckets.setdefault(rn * LTTB_BUCKETS // n, []).append((rn, x, y))
        means = {b: (sum(x for _, x, _ in v) / len(v),
                     sum(y for _, _, y in v) / len(v))
                 for b, v in buckets.items()}
        order = sorted(buckets)
        for i, b in enumerate(order):
            if i == 0 or i == len(order) - 1:
                rn, x, y = min(buckets[b])      # edge: first point
            else:
                px, py = means[order[i - 1]]
                nx, ny = means[order[i + 1]]
                rn, x, y = max(
                    buckets[b],
                    key=lambda p: (abs((px - nx) * (p[2] - py)
                                       - (px - p[1]) * (ny - py)) / 2,
                                   -p[0]))
            assert got[(uid, b)] == (x, y), (uid, b)
            n_checked += 1
    assert n_checked == len(got) and n_checked > 0


def _events_frame(rows):
    """rows: (event_id, epoch_s, user_id, event_type, value)."""
    import pandas as pd

    return pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [r[4] for r in rows],
        "props": [""] * len(rows),
    })


def test_rankcorr_hand_cases(spark, tmp_path):
    """'click' x=[1,2,2,3] over t=1..4: tie-averaged ranks give
    rho = 4.5/sqrt(4.5*5) = 0.948683; 'view' strictly decreasing → -1."""
    rows = ([(i, i + 1, 1, "click", v)
             for i, v in enumerate([1.0, 2.0, 2.0, 3.0])]
            + [(10 + i, i + 1, 1, "view", v)
               for i, v in enumerate([9.0, 7.0, 5.0, 3.0])])
    _events_frame(rows).to_parquet(tmp_path / "events.parquet")
    from clickhouse_mergetree_spark.operators.stats import q_stat_rankcorr

    got = {r["event_type"]: (r["n"], r["rho"])
           for r in q_stat_rankcorr(spark, str(tmp_path)).collect()}
    assert got["click"] == (4, 0.948683)
    assert got["view"] == (4, -1.0)


def test_bounding_ratio_hand_case(spark, tmp_path):
    """First point (t=0, v=10), last (t=10, v=20): slope 1.0/s; the
    middle spike must not matter; a single-point group emits NULL."""
    rows = [(0, 100, 1, "click", 10.0), (1, 105, 1, "click", 99.0),
            (2, 110, 1, "click", 20.0), (3, 50, 2, "view", 7.0)]
    _events_frame(rows).to_parquet(tmp_path / "events.parquet")
    from clickhouse_mergetree_spark.operators.stats import q_bounding_ratio

    got = {r["event_type"]: r["slope_per_s"]
           for r in q_bounding_ratio(spark, str(tmp_path)).collect()}
    assert got["click"] == 1.0
    assert got["view"] is None


def test_interval_length_sum_union_semantics(spark, tmp_path):
    """[0,10)+[5,15) overlap → 15s once; [20,25) disjoint → 20s total;
    a fully-contained interval adds nothing."""
    rows = [(0, 1000, 1, "click", 10.0),   # [1000, 1010)
            (1, 1005, 1, "click", 10.0),   # [1005, 1015) → +5
            (2, 1006, 1, "click", 1.0),    # contained → +0
            (3, 1020, 1, "click", 5.0)]    # [1020, 1025) → +5
    _events_frame(rows).to_parquet(tmp_path / "events.parquet")
    from clickhouse_mergetree_spark.operators.stats import (
        q_interval_length_sum,
    )

    row = q_interval_length_sum(spark, str(tmp_path)).collect()[0]
    assert row["n_intervals"] == 4
    assert row["covered_us"] == 20_000_000


def test_counter_rate_reset_semantics(spark, tmp_path):
    """10→30 over 10s = 2.0/s; a drop to 5 is a reset: rate 5/10 = 0.5,
    never negative (the nonNegativeDerivative contract)."""
    rows = [(0, 0, 1, "click", 10.0), (1, 10, 1, "click", 30.0),
            (2, 20, 1, "click", 5.0)]
    _events_frame(rows).to_parquet(tmp_path / "events.parquet")
    from clickhouse_mergetree_spark.operators.relational import q_counter_rate

    got = {r["event_id"]: r["rate_per_s"]
           for r in q_counter_rate(spark, str(tmp_path)).collect()}
    assert got == {1: 2.0, 2: 0.5}


def test_anova_hand_case(spark, tmp_path):
    """click=[1,2,3], view=[4,5,6]: SSB=13.5, SSW=4 → MSB=13.5, MSW=1,
    F=13.5."""
    rows = ([(i, i, 1, "click", v) for i, v in enumerate([1.0, 2.0, 3.0])]
            + [(10 + i, i, 2, "view", v)
               for i, v in enumerate([4.0, 5.0, 6.0])])
    _events_frame(rows).to_parquet(tmp_path / "events.parquet")
    from clickhouse_mergetree_spark.operators.stats import q_stat_anova

    row = q_stat_anova(spark, str(tmp_path)).collect()[0]
    assert (row["n_groups"], row["n_all"]) == (2, 6)
    assert (row["ms_between"], row["ms_within"]) == (13.5, 1.0)
    assert row["f_stat"] == 13.5


def test_time_weighted_avg_hand_case(spark, tmp_path):
    """v=10 held 10s then v=20 held 30s: (10*10 + 20*30)/40 = 17.5;
    the last observation (no successor) contributes no segment."""
    rows = [(0, 0, 1, "click", 10.0), (1, 10, 1, "click", 20.0),
            (2, 40, 1, "click", 99.0)]
    _events_frame(rows).to_parquet(tmp_path / "events.parquet")
    from clickhouse_mergetree_spark.operators.stats import (
        q_time_weighted_avg,
    )

    row = q_time_weighted_avg(spark, str(tmp_path)).collect()[0]
    assert (row["user_id"], row["n_segments"], row["tw_avg"]) == (1, 2, 17.5)


def test_corr_matrix_hand_case(spark, tmp_path):
    """Perfectly correlated / anti-correlated / constant columns:
    corr(q, p)=1 (p = 2q), corr(q, d)=-1 (d = -q), tax constant → NULL
    against everything, diagonal = 1 for non-degenerate columns."""
    import pandas as pd

    q = [1.0, 2.0, 3.0, 4.0]
    pd.DataFrame({
        "l_quantity": q,
        "l_extendedprice": [2 * x for x in q],
        "l_discount": [-x for x in q],
        "l_tax": [5.0] * 4,
    }).to_parquet(tmp_path / "lineitem.parquet")
    from clickhouse_mergetree_spark.operators.stats import q_corr_matrix

    got = {(r["i"], r["j"]): r["corr"]
           for r in q_corr_matrix(spark, str(tmp_path)).collect()}
    assert got[(0, 0)] == 1.0 and got[(1, 1)] == 1.0 and got[(2, 2)] == 1.0
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == -1.0 and got[(1, 2)] == -1.0
    assert got[(0, 3)] is None and got[(3, 3)] is None
    assert len(got) == 10
