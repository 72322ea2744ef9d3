"""spark.sql over register_views — the ad-hoc SQL surface users switch to."""

from __future__ import annotations

from clickhouse_mergetree_spark.tables import TABLE_NAMES, register_views


def test_register_views_and_sql(spark, sf_dir, duck):
    register_views(spark, sf_dir)
    for t in TABLE_NAMES:
        assert spark.catalog.tableExists(t)

    sql = """
        SELECT n.n_name AS nation, count(*) AS n_customers,
               CAST(sum(c.c_acctbal) AS DOUBLE) AS total_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation
    """
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert abs(g[2] - w[2]) < 1e-6


def test_sql_over_events_view(spark, sf_dir, duck):
    """The view carries the ns→µs ts conversion, so event-time SQL works."""
    register_views(spark, sf_dir)
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT user_id) AS u FROM events"
    ).collect()[0]
    want = duck.execute(
        "SELECT count(*), count(DISTINCT user_id) FROM events").fetchone()
    assert (got["n"], got["u"]) == want


def test_basket_lift_hand_case(spark, tmp_path):
    """Baskets {A,B}, {A,B}, {A}: pair (A,B) n=2, support 2/3,
    confidence 2/3 (against A's 3 baskets), lift 2*3/(3*2) = 1.0."""
    import pandas as pd

    pd.DataFrame({
        "l_orderkey": [1, 1, 2, 2, 3, 3],
        "l_partkey": [10, 20, 10, 20, 10, 10],  # dup (3,10) collapses
    }).to_parquet(tmp_path / "lineitem.parquet")
    from clickhouse_mergetree_spark.operators.sql_queries import (
        q_basket_lift,
    )

    rows = q_basket_lift(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["pk_a"], r["pk_b"], r["pair_n"]) == (10, 20, 2)
    assert (r["support"], r["confidence"], r["lift"]) == (
        0.666667, 0.666667, 1.0)


def test_point_in_polygon_concave_cases(spark, tmp_path):
    """The chevron notch (20, 15) sits inside the bbox but OUTSIDE the
    polygon — the case a bbox test gets wrong; a wing point (10, 5) is
    inside; a point past the bbox (45, 5) is outside."""
    import pandas as pd

    # derive custkeys whose (k*37%500/10, k*73%400/10) grid points land
    # where we want by solving small cases directly is brittle — instead
    # exercise the predicate via the declared query on crafted keys whose
    # coordinates are known: k=0 -> (0.0, 0.0) boundary-origin,
    # and check the full-corpus invariant inside => n_crossings odd.
    pd.DataFrame({"c_custkey": list(range(1, 400))}).to_parquet(
        tmp_path / "customer.parquet")
    from clickhouse_mergetree_spark.operators.web import (
        _EDGES, q_fn_point_in_polygon,
    )

    def ref_inside(px, py):
        n = 0
        for x1, y1, x2, y2 in _EDGES:
            if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (
                    y2 - y1) + x1:
                n += 1
        return n % 2 == 1

    rows = q_fn_point_in_polygon(spark, str(tmp_path)).collect()
    assert len(rows) == 399
    mism = [r for r in rows
            if r["inside"] != ref_inside(r["px"], r["py"])]
    assert not mism, mism[:3]
    # the concave notch region must actually occur and read OUTSIDE
    notch = [r for r in rows
             if 10 < r["px"] < 30 and 10 < r["py"] < 30
             and r["py"] > abs(r["px"] - 20) + 10]
    assert notch and all(not r["inside"] for r in notch)
    assert any(r["inside"] for r in rows)
