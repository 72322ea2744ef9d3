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
