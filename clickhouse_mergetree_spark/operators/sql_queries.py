"""Declared queries expressed through the plain-SQL surface.

The same SQL text runs on BOTH engines: ``spark.sql`` over
``register_views`` and DuckDB as the oracle — so these rows verify the
SQL front-end end-to-end (parsing, analysis, decimal semantics, date
literals), not just the DataFrame API. The shapes are the classic TPC-H
multi-join aggregates (Q3/Q5 adapted to the fixture columns), which also
exercise Catalyst's join ordering and AQE on 3- and 6-table plans.

All money arithmetic is exact DECIMAL until one final cast to double, so
the values are bit-identical across engines.

Scale notes: both plans are chains of equi-joins on uniformly
distributed keys — Catalyst broadcast-joins the dimensions
(region/nation/supplier/customer after filter) and shuffles only the
fact tables; the final GROUP BY keys are tiny (orderkey groups of ≤7
lineitems; 25 nations), so partial aggregation collapses nearly all of
the map output before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.tables import register_views

_REVENUE = (
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)

_Q3_SQL = f"""
    SELECT l_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           {_REVENUE} AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 20
"""

_Q5_SQL = f"""
    SELECT n_name, {_REVENUE} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
"""


# Q1/Q6 averages are written as double-sum / count — Spark's avg(DECIMAL)
# widens to DECIMAL(22,6) while DuckDB's returns DOUBLE, so dividing two
# already-identical doubles is the only formulation that is bit-identical
# across engines.
_Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""

_Q6_SQL = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
"""


_Q10_SQL = f"""
    SELECT c_custkey, c_name, n_name,
           {_REVENUE} AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""

_Q18_SQL = """
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
"""


_GROUPING_SETS_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
"""


_Q4_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

_Q12_SQL = """
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""

# Each sum is exact DECIMAL, cast to DOUBLE, and only then divided: Spark
# and DuckDB disagree on DECIMAL-division result scale, while double/double
# division of identical doubles is bit-identical (same trick as Q1's
# averages).
_Q14_SQL = """
    SELECT 100.00 * CAST(sum(CASE WHEN p_type = 'ECONOMY'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
"""


@declared_query("q_sql_tpch_q4", oracle=_Q4_SQL)
def q_sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape via spark.sql: order-priority checking — a
    correlated EXISTS against the fact table under a date window (the
    fixture lacks commit/receipt dates, so the inner predicate is a
    returnflag; the plan shape is identical). Catalyst decorrelates the
    EXISTS into a left-semi hash join on orderkey with both scans
    filtered before the join — at 100 TB the semi join moves only
    distinct qualifying orderkeys, never lineitem payloads. The identical
    SQL text is the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)


@declared_query("q_sql_tpch_q12", oracle=_Q12_SQL)
def q_sql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape via spark.sql: two conditional counts over a
    fact-fact equi-join under a ship-date window (priority classes stand
    in for the fixture's missing shipmode). The CASE sums fold into the
    partial aggregate, so the exchange carries one row per returnflag —
    the canonical pivot-without-pivot shape. The identical SQL text is
    the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q12_SQL)


@declared_query("q_sql_tpch_q14", oracle=_Q14_SQL)
def q_sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape via spark.sql: promo-revenue ratio — a
    conditional-share aggregate over lineitem ⨝ part in one pass
    ('ECONOMY' stands in for the PROMO% class on the fixture's p_type).
    part is broadcast after the month filter prunes lineitem; both CASE
    branches ride the same partial aggregate, so the ratio costs one scan
    and a 1-row reduce. DECIMAL until the final cast, like every money
    query here. The identical SQL text is the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q14_SQL)


@declared_query("q_sql_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10+ via the SQL surface: arbitrary GROUPING SETS — the general
    form that rollup/cube specialize — with grouping() flags
    disambiguating real NULLs from subtotal rows. Spark plans ONE scan +
    Expand (each input row replicated once per set) + a single hash
    aggregate: subtotals cost one shuffle total, not one scan per set.
    The identical SQL text is the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@declared_query("q_sql_tpch_q10", oracle=_Q10_SQL)
def q_sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape via spark.sql: returned-item reporting — customer ⨝
    orders ⨝ lineitem ⨝ nation with a returnflag filter, revenue lost per
    customer, top 20. Catalyst broadcasts nation (25 rows) and the
    date-filtered customer side; the top-k plans as
    TakeOrderedAndProject. The identical SQL text is the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q10_SQL)


@declared_query("q_sql_tpch_q18", oracle=_Q18_SQL)
def q_sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape via spark.sql: large-volume customers — a
    HAVING-filtered semi-join (IN subquery) back onto the same fact
    table. Catalyst plans the subquery as an aggregate + left-semi hash
    join, reusing one lineitem scan lineage per side; the qualifying-key
    side is tiny after HAVING, so AQE converts the semi join to
    broadcast at runtime. The identical SQL text is the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q18_SQL)


@declared_query("q_sql_tpch_q1", oracle=_Q1_SQL)
def q_sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape via spark.sql: the pricing-summary full-scan
    aggregate — 8 aggregates over 2 grouping keys in one pass. The classic
    map-side-combine showcase: 4 output groups mean the exchange moves a
    few dozen partial-agg rows regardless of SF, so the query is scan-bound
    at any scale. The identical SQL text is the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q1_SQL)


@declared_query("q_sql_tpch_q6", oracle=_Q6_SQL)
def q_sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape via spark.sql: the forecast-revenue filter-scan —
    three pushable range predicates and a single global sum (no exchange
    beyond the final 1-row reduce). At 100 TB this is the pure predicate
    pushdown + scan-throughput benchmark: shipdate/discount/quantity
    bounds all reach the parquet reader as PushedFilters and prune row
    groups via column statistics. The identical SQL text is the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q6_SQL)


@declared_query("q_sql_tpch_q3", oracle=_Q3_SQL)
def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape via spark.sql: segment-filtered customer ⨝ orders ⨝
    lineitem, revenue per urgent order, top 20. The identical SQL text is
    the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q3_SQL)


@declared_query("q_sql_tpch_q5", oracle=_Q5_SQL)
def q_sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape via spark.sql: 6-table join (fact chain + 3 broadcast
    dimensions) with local-supplier predicate, revenue per nation. The
    identical SQL text is the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q5_SQL)
