"""Relational operator surface (SURVEY.md §2.B E1-E19, E26 batch analog).

These capabilities are absent in the reference (SURVEY §2.9 — no joins,
aggregations, windows, or scalar functions anywhere in its 2,084 LoC); they
enter via the driver's north star and are expressed as pure DataFrame plans
so Catalyst gets full freedom: filter/projection pushdown to parquet,
broadcast-vs-sortmerge join selection, partial aggregation, AQE re-planning.

Determinism rules for the DuckDB-oracle hash compare:
- money aggregates are computed in exact DECIMAL on both sides and cast to
  double at the end — double addition is order-dependent and `round()` can
  land on a .xx5 boundary where the engines disagree; decimal sums are exact,
  so the final double cast is bit-identical;
- averages divide the exact decimal sum (as double) by the count — identical
  operands → identical IEEE division;
- ranking windows always carry a unique tie-break column;
- temporal outputs are DATE or formatted strings, never raw timestamps;
- raw stored doubles pass through unrounded (same bits on both sides).

Scale notes inline per query; the general shape: dimension joins broadcast
(customer/supplier/nation are ~1e5 rows even at TPC-H SF1k), fact-fact
joins shuffle on the join key once, aggregations are partial+final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.tables import load


def _dec(col, prec: int = 18, scale: int = 2):
    """Cast a 2-decimal-place money/ratio double to exact DECIMAL."""
    col = F.col(col) if isinstance(col, str) else col
    return col.cast(f"decimal({prec},{scale})")


def _dsum(col) -> F.Column:
    """Exact decimal sum of a 2dp double column, returned as double."""
    return F.sum(_dec(col)).cast("double")


# --------------------------------------------------------------------------
# E1 projection / E2 filter
# --------------------------------------------------------------------------

@declared_query(
    "q_projection",
    oracle="SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity FROM lineitem",
)
def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: column pruning — ReadSchema must show only 4 of 11 columns."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )


_FILTER_PRED = (
    "l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 30 "
    "AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '2000-01-01' "
    "AND (l_discount > 0.05 OR l_tax < 0.03)"
)


@declared_query(
    "q_filter_compound",
    oracle=f"""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount, l_tax
        FROM lineitem WHERE {_FILTER_PRED}
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: compound predicate (IN / BETWEEN / range / OR) — all pushed to parquet."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(_FILTER_PRED)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
                "l_discount", "l_tax")
    )


# --------------------------------------------------------------------------
# E3-E7 joins
# --------------------------------------------------------------------------

@declared_query(
    "q_join_inner",
    oracle="""
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: inner equi-join chain (TPC-H Q3 shape).

    Scale: customer is a dimension → explicit broadcast (no shuffle of the
    lineitem fact for that join); orders⨝lineitem shuffles once on orderkey.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", 8)))
             .cast("double").alias("revenue"))
    )


@declared_query(
    "q_join_outer",
    oracle="""
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
               CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
                 AS total_spend
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: left outer join — customers with zero orders survive with count 0.

    Scale: orders is pre-aggregated by o_custkey *before* the join (Spark
    does not push aggregates through joins), so the join probes one row per
    customer instead of shuffling the full fact table through it.
    """
    c = load(spark, sf_dir, "customer")
    o_agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"),
             F.sum(_dec("o_totalprice")).alias("spend_dec"))
    )
    return (
        c.join(o_agg, c.c_custkey == o_agg.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("spend_dec").cast("double"), F.lit(0.0))
            .alias("total_spend"),
        )
    )


@declared_query(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: left semi join (EXISTS) — big-ticket customers."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@declared_query(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: left anti join (NOT EXISTS) — customers with no orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


_BAND_US = 5 * 60 * 1_000_000  # 5-minute band in microseconds


@declared_query(
    "q_join_range",
    oracle=f"""
        SELECT e1.user_id, count(*) AS n_pairs
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND epoch_us(e2.ts) > epoch_us(e1.ts)
         AND epoch_us(e2.ts) <= epoch_us(e1.ts) + {_BAND_US}
        GROUP BY e1.user_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: band (range) join — same-user event pairs within 5 minutes.

    Scale path: a naive theta-join is O(n²) broadcast-nested-loop. We bucket
    ts into band-width buckets and equi-join on (user_id, bucket), probing
    each right-side row into its own bucket and the previous one — turns the
    range join into a hash join whose cost is pairs-per-bucket, not n².
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    e1 = ev.withColumn("bucket", (F.col("ts_us") / _BAND_US).cast("long"))
    e2 = ev.select(
        F.col("user_id").alias("user_id2"), F.col("ts_us").alias("ts2_us"),
        F.explode(F.array(
            (F.col("ts_us") / _BAND_US).cast("long"),
            (F.col("ts_us") / _BAND_US).cast("long") - 1,
        )).alias("bucket"),
    )
    pairs = e1.join(
        e2,
        (e1.user_id == e2.user_id2) & (e1.bucket == e2.bucket)
        & (e2.ts2_us > e1.ts_us) & (e2.ts2_us <= e1.ts_us + _BAND_US),
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


@declared_query(
    "q_join_asof",
    oracle="""
        SELECT event_id, user_id, ts_us, asof_purchase_value FROM (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS asof_purchase_value
            FROM events
        )
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: as-of join — for each event, the value of the latest strictly-earlier
    purchase by the same user.

    Scale path: instead of a per-row range join, one sort within user_id
    partitions + `last(... ignorenulls)` over a preceding-rows frame — a
    single shuffle on user_id, linear within partition. (This is the
    sort-based as-of join; a two-table variant unions tagged streams first.)
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pval"),
    )
    w = (W.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    return ev.select(
        "event_id", "user_id", "ts_us",
        F.last("pval", ignorenulls=True).over(w).alias("asof_purchase_value"),
    )


# --------------------------------------------------------------------------
# E8-E10 aggregation
# --------------------------------------------------------------------------

@declared_query(
    "q_agg_basic",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(8,2))) AS DECIMAL(24,4))
                        * (1 + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
                 AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
                 AS avg_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / count(*), 6)
                 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8: hash aggregation, TPC-H Q1 shape — partial+final agg, one shuffle
    on a 6-value grouping key (trivially skew-free at any SF)."""
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount", 8))
    charge = disc_price.cast("decimal(24,4)") * (1 + _dec("l_tax", 8))
    cnt = F.count("*")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity").alias("sum_qty"),
        _dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.round(_dsum("l_quantity") / cnt, 6).alias("avg_qty"),
        F.round(_dsum("l_extendedprice") / cnt, 6).alias("avg_price"),
        F.round(F.sum(_dec("l_discount", 8)).cast("double") / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@declared_query(
    "q_agg_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: exact distinct aggregation (expand + two-phase agg under the hood)."""
    return load(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


APPROX_DISTINCT_RSD = 0.02
APPROX_DISTINCT_BOUND = 0.10  # 5 sigma of the configured rsd


def _approx_distinct_dir() -> str:
    from clickhouse_mergetree_spark.scratch import fixed_scratch_dir

    return fixed_scratch_dir("q_approx_distinct_est")


@declared_query(
    "q_agg_approx_distinct",
    oracle=f"""
        WITH est AS (
            SELECT l_returnflag,
                   CAST(approx_parts AS BIGINT) AS approx_parts,
                   CAST(n_rows AS BIGINT) AS est_n_rows
            FROM read_parquet('{{_approx_distinct_dir}}/*.parquet')
        ), ex AS (
            SELECT l_returnflag,
                   count(DISTINCT l_partkey) AS exact_parts,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT ex.l_returnflag, est.approx_parts, ex.n_rows,
               (est.est_n_rows = ex.n_rows AND
                abs(est.approx_parts - ex.exact_parts)
                <= greatest(3, {APPROX_DISTINCT_BOUND} * ex.exact_parts))
                 AS within_envelope
        FROM est JOIN ex USING (l_returnflag)
    """.replace("{_approx_distinct_dir}", _approx_distinct_dir()),
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: approx_count_distinct (HyperLogLog++) — the scale path for
    distinct counts (no expand, mergeable sketches). Sketch estimates
    are engine-specific, so no oracle can hash-match the raw value;
    instead (r9, VERDICT r8 item 3) the estimates PERSIST as a side
    table and the oracle turns the driver check into an inequality
    relation: DuckDB computes the EXACT distinct counts itself and
    asserts the persisted estimate lands inside the published envelope
    (rsd={APPROX_DISTINCT_RSD} -> 5-sigma bound {APPROX_DISTINCT_BOUND}).
    The Spark side returns within_envelope=true as its CLAIM; a sketch
    outside the envelope makes the oracle emit false and the value hash
    break. Group keys and n_rows stay independently computed on both
    engines."""
    li = load(spark, sf_dir, "lineitem")
    est = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct(
            "l_partkey", APPROX_DISTINCT_RSD).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )
    # n_rows persists alongside the estimate as a CORPUS MARKER
    # (ADVICE r9): the side table lives at a fixed machine-wide path, so
    # a stale write from a run at another scale factor (or a concurrent
    # run) could otherwise feed the envelope oracle someone else's
    # numbers silently — the oracle folds est_n_rows = ex.n_rows into
    # the verdict so a corpus mismatch fails loudly (hash break).
    est.select("l_returnflag", "approx_parts", "n_rows").coalesce(1) \
        .write.mode("overwrite").parquet(_approx_distinct_dir())
    return est.select(
        "l_returnflag", "approx_parts", "n_rows",
        F.lit(True).alias("within_envelope"))


@declared_query(
    "q_agg_rollup",
    oracle="""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10: rollup — hierarchical grouping sets in one pass (Expand operator)."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(_dsum("l_quantity").alias("sum_qty"),
             F.count("*").alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty", "n_rows",
        )
    )


@declared_query(
    "q_agg_cube",
    oracle="""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10: cube — all 2^k grouping sets in one pass. Like rollup, the Expand
    operator replicates each input row once per grouping set BEFORE the
    shuffle, so partial aggregation still combines map-side and the exchange
    carries ~4 aggregated rows per flag pair, not 4× the data. grouping()
    flags disambiguate real NULLs from subtotal rows."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(_dsum("l_quantity").alias("sum_qty"),
             F.count("*").alias("n_rows"),
             F.grouping("l_returnflag").cast("long").alias("g_flag"),
             F.grouping("l_linestatus").cast("long").alias("g_status"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag", "g_status", "sum_qty", "n_rows",
        )
    )


@declared_query(
    "q_agg_pivot",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'F')
                    AS DOUBLE) AS F_qty,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'O')
                    AS DOUBLE) AS O_qty,
               count(*) FILTER (l_linestatus = 'F') AS F_rows,
               count(*) FILTER (l_linestatus = 'O') AS O_rows
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10+: pivot — rotate l_linestatus values into columns. With the
    pivot values listed explicitly, Spark skips the extra
    distinct-values job and plans a single partial+final agg whose
    aggregate list is the cross product (value × measure) — exactly the
    conditional-aggregation plan the oracle spells out with FILTER."""
    l = load(spark, sf_dir, "lineitem")
    out = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(_dsum("l_quantity").alias("qty"),
             F.count(F.lit(1)).alias("rows"))
    )
    return out.select(
        "l_returnflag",
        F.col("F_qty"), F.col("O_qty"),
        F.col("F_rows"), F.col("O_rows"),
    )


@declared_query(
    "q_agg_unpivot",
    oracle="""
        SELECT s_suppkey, 'acctbal' AS measure,
               CAST(s_acctbal AS DOUBLE) AS value
        FROM supplier
        UNION ALL
        SELECT s_suppkey, 'nationkey' AS measure,
               CAST(s_nationkey AS DOUBLE) AS value
        FROM supplier
    """,
)
def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10+: unpivot/melt — rotate columns into (measure, value) rows.
    Plans as a row-local Expand (each input row emitted once per
    measure) — no shuffle, the exact dual of pivot."""
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_acctbal").cast("double").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    )
    return s.unpivot(
        ids=["s_suppkey"], values=["acctbal", "nationkey"],
        variableColumnName="measure", valueColumnName="value",
    )


@declared_query(
    "q_agg_percentile",
    oracle="""
        SELECT l_returnflag,
               CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS p25_qty,
               CAST(quantile_disc(l_quantity, 0.5)  AS DOUBLE) AS p50_qty,
               CAST(quantile_disc(l_extendedprice, 0.9) AS DOUBLE) AS p90_price,
               CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty_cont
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9+: exact percentiles — discrete (nearest-rank) and continuous
    (interpolated) inverse-distribution aggregates.

    percentile_disc returns the smallest group value whose cumulative
    distribution reaches p — identical to DuckDB's quantile_disc, so the
    oracle is exact, no rounding needed. Exact percentiles sort each group;
    at 100 TB switch to approx_percentile (mergeable t-digest sketch, no
    per-group sort) — the same trade as q_agg_approx_distinct."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)")
        .cast("double").alias("p25_qty"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
        .cast("double").alias("p50_qty"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)")
        .cast("double").alias("p90_price"),
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)")
        .cast("double").alias("median_qty_cont"),
    )


@declared_query(
    "q_fn_conditional",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
               greatest(o_totalprice, 150000.0) AS floor_price,
               least(o_totalprice, 150000.0) AS capped_price,
               CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS f_price
        FROM orders
    """,
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15+: conditional expressions — CASE/WHEN bands, nullif/coalesce,
    greatest/least (null-skipping in both engines), and a NULL-producing
    partial CASE. Row-local, zero shuffles, all whole-stage codegen."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low").alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN"))
        .alias("status_or_open"),
        F.greatest("o_totalprice", F.lit(150000.0)).alias("floor_price"),
        F.least("o_totalprice", F.lit(150000.0)).alias("capped_price"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        .alias("f_price"),
    )


@declared_query(
    "q_fn_map",
    oracle="""
        SELECT o_orderkey,
               m['priority'][1] AS priority,
               m['status'][1] AS status,
               cardinality(m) AS n_entries,
               array_to_string(map_keys(m), ',') AS keys_csv
        FROM (
            SELECT o_orderkey,
                   MAP {'priority': o_orderpriority,
                        'status': o_orderstatus} AS m
            FROM orders
        )
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18+: map functions — create_map / element_at / map_keys / size.
    The map is built and consumed in one projection; the oracle checks
    both lookups, the cardinality, and the key ORDER (create_map and
    DuckDB MAP literals both preserve insertion order)."""
    o = load(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("priority"), F.col("o_orderpriority"),
        F.lit("status"), F.col("o_orderstatus"))
    return o.select(
        "o_orderkey",
        F.element_at(m, "priority").alias("priority"),
        F.element_at(m, "status").alias("status"),
        F.size(m).alias("n_entries"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


N_SALT = 8


@declared_query(
    "q_join_salted",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: SALTED equi-join, hash-verified equivalent
    to the plain join (same oracle).

    A hot join key sends all its rows to one reducer; salting splits it by
    widening the key: the big (probe) side appends salt = f(row) ∈ [0,N),
    the small (build) side is exploded N× with every salt value, and the
    join runs on (key, salt) — each hot key now spreads over N reducers at
    the cost of replicating the build side N×. This is the manual fallback
    when AQE's runtime skew-split (on by default in session.py) can't help
    — e.g. a skewed aggregation feeding a join, or a build side too big for
    broadcast but cheap to replicate 8×. Salt here is derived
    deterministically (pmod of linenumber) so the result is reproducible.
    """
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_linenumber"
    ).withColumn("salt", F.pmod("l_linenumber", F.lit(N_SALT)))
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)])))
    joined = l.join(
        o, (F.col("l_orderkey") == F.col("o_orderkey"))
        & (l["salt"] == o["salt"]))
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        _dsum("l_extendedprice").alias("sum_price"),
    )


# --------------------------------------------------------------------------
# E11-E13 windows / top-k
# --------------------------------------------------------------------------

@declared_query(
    "q_window_rank",
    oracle="""
        SELECT s_suppkey, s_nationkey,
               row_number() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal DESC, s_suppkey) AS rn,
               rank()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
               dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drnk,
               ntile(4)     OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal DESC, s_suppkey) AS quartile
        FROM supplier
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11: ranking windows — one shuffle on the partition key, sort within."""
    s = load(spark, sf_dir, "supplier")
    by_bal = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    by_bal_uniq = W.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey", "s_nationkey",
        F.row_number().over(by_bal_uniq).alias("rn"),
        F.rank().over(by_bal).alias("rnk"),
        F.dense_rank().over(by_bal).alias("drnk"),
        F.ntile(4).over(by_bal_uniq).alias("quartile"),
    )


@declared_query(
    "q_window_frame",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_run AS DOUBLE)
                 AS running_spend,
               lag(o_totalprice)  OVER w_ord AS prev_price,
               lead(o_totalprice) OVER w_ord AS next_price,
               CAST(first_value(o_orderdate) OVER w_run AS DATE) AS first_order_date
        FROM orders
        WINDOW
          w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
          w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12: analytic windows with explicit frames — running sum, lag/lead."""
    o = load(spark, sf_dir, "orders")
    w_ord = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w_run).cast("double").alias("running_spend"),
        F.lag("o_totalprice").over(w_ord).alias("prev_price"),
        F.lead("o_totalprice").over(w_ord).alias("next_price"),
        F.first("o_orderdate").over(w_run).cast("date").alias("first_order_date"),
    )


@declared_query(
    "q_window_dist",
    oracle="""
        SELECT s_suppkey, s_nationkey,
               round(percent_rank() OVER w, 9) AS pct_rank,
               round(cume_dist() OVER w, 9) AS cume,
               first_value(s_suppkey) OVER w AS richest,
               nth_value(s_suppkey, 2) OVER w AS second_richest
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey
                     ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11+: distribution window functions — percent_rank / cume_dist /
    first_value / nth_value over a deterministic (unique-key) ordering.
    Same single shuffle-and-sort on the partition key as q_window_rank;
    the ratios are int/int in double, rounded as belt-and-braces."""
    s = load(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey", "s_nationkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.first("s_suppkey").over(w).alias("richest"),
        F.nth_value("s_suppkey", 2).over(w).alias("second_richest"),
    )


SESSION_GAP_MIN = 30


@declared_query(
    "q_window_sessionize",
    oracle=f"""
        WITH marked AS (
            SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
                   CASE WHEN epoch_us(ts)
                          - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
                          > {SESSION_GAP_MIN} * 60 * 1000000
                        OR lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ), numbered AS (
            SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
                                             ORDER BY ts_us, event_id
                                             ROWS UNBOUNDED PRECEDING)
                           AS BIGINT) AS session_id
            FROM marked
        )
        SELECT user_id, session_id,
               min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS session_value
        FROM numbered GROUP BY user_id, session_id
    """,
)
def q_window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the batch analog of q_stream_session, and the
    lag+cumsum idiom every clickstream pipeline uses): events are split
    into sessions wherever a user goes quiet for > {30} minutes, then
    aggregated per session.

    Two windows and the final groupBy all share ONE partitioning (user_id)
    — Catalyst reuses a single exchange+sort for the lag, the running sum,
    and (via partial aggregation) the session rollup, so the whole query
    is one shuffle at any scale. The session ordering key includes
    event_id so ties on ts are deterministic across engines."""
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "value")
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    is_new = (prev.isNull() | (F.col("ts_us") - prev > gap_us)).cast("bigint")
    numbered = ev.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
        .alias("session_value"),
    )


APPROX_PCTL_RANK_TOL = 0.02  # rank tolerance (accuracy=10000 -> 1e-4;
# 200x slack still rejects a sketch answering min/max/garbage)


def _approx_pctl_dir() -> str:
    from clickhouse_mergetree_spark.scratch import fixed_scratch_dir

    return fixed_scratch_dir("q_approx_pctl_est")


@declared_query(
    "q_agg_approx_percentile",
    oracle=f"""
        WITH est AS (
            SELECT l_returnflag,
                   CAST(quantile_level AS DOUBLE) AS quantile_level,
                   CAST(qty_quantile AS DOUBLE) AS qty_quantile,
                   CAST(median_price AS DOUBLE) AS median_price,
                   CAST(n_rows AS BIGINT) AS est_n
            FROM read_parquet('{{_approx_pctl_dir}}/*.parquet')
        ), chk AS (
            SELECT e.l_returnflag, e.quantile_level, e.qty_quantile,
                   e.median_price, e.est_n,
                   count(*) AS n,
                   count(*) FILTER (l.l_quantity <= e.qty_quantile) AS q_le,
                   count(*) FILTER (l.l_quantity <  e.qty_quantile) AS q_lt,
                   count(*) FILTER (l.l_extendedprice <= e.median_price)
                     AS p_le,
                   count(*) FILTER (l.l_extendedprice <  e.median_price)
                     AS p_lt
            FROM est e JOIN lineitem l USING (l_returnflag)
            GROUP BY e.l_returnflag, e.quantile_level, e.qty_quantile,
                     e.median_price, e.est_n
        )
        SELECT l_returnflag, quantile_level, qty_quantile, median_price,
               n AS n_rows,
               (est_n = n AND
                q_le >= (quantile_level - {APPROX_PCTL_RANK_TOL}) * n AND
                q_lt <= (quantile_level + {APPROX_PCTL_RANK_TOL}) * n)
                 AS qty_within,
               (est_n = n AND
                p_le >= (0.5 - {APPROX_PCTL_RANK_TOL}) * n AND
                p_lt <= (0.5 + {APPROX_PCTL_RANK_TOL}) * n) AS med_within
        FROM chk
    """.replace("{_approx_pctl_dir}", _approx_pctl_dir()),
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9+ scale path for percentiles: approx_percentile — a mergeable
    sketch built with partial aggregation, no per-group sort. This is
    what replaces q_agg_percentile's exact inverse-distribution
    aggregates at 100 TB (same trade as HLL vs countDistinct).

    Sketch values are engine-specific, so (r9, VERDICT r8 item 3) the
    per-(flag, level) estimates PERSIST as a side table and the oracle
    is an inequality relation: DuckDB re-ranks every persisted estimate
    against the raw column and asserts its rank sits within
    ±{APPROX_PCTL_RANK_TOL} of the requested level (the sketch's
    documented rank-error contract, with slack). Spark returns the
    claims as literal true; a mis-ranked estimate flips the oracle's
    boolean and fails the value hash. n_rows is computed independently
    on both engines.

    The quantile array is exploded to one scalar row per (flag, level)
    so downstream consumers (and the driver's canonicalizer) never see
    an array-typed cell."""
    l = load(spark, sf_dir, "lineitem")
    levels = [0.25, 0.5, 0.9]
    g = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", levels, 10000).alias("qs"),
        F.percentile_approx("l_extendedprice", 0.5, 10000)
        .alias("median_price"),
        F.count("*").alias("n_rows"),
    )
    est = (
        g.select(
            "l_returnflag",
            "median_price",
            "n_rows",
            F.posexplode("qs").alias("qpos", "qty_quantile"),
        )
        .withColumn(
            "quantile_level",
            F.element_at(F.array(*[F.lit(x) for x in levels]),
                         F.col("qpos") + 1),
        )
        .drop("qpos")
    )
    # n_rows persists as the corpus marker (ADVICE r9): a stale side
    # table from a run at another SF makes est_n <> n and flips both
    # verdict booleans — a loud hash break instead of a silent check of
    # someone else's estimates
    est.select("l_returnflag", "quantile_level", "qty_quantile",
               "median_price", "n_rows").coalesce(1) \
        .write.mode("overwrite").parquet(_approx_pctl_dir())
    return est.select(
        "l_returnflag",
        F.col("quantile_level").cast("double").alias("quantile_level"),
        F.col("qty_quantile").cast("double").alias("qty_quantile"),
        F.col("median_price").cast("double").alias("median_price"),
        "n_rows",
        F.lit(True).alias("qty_within"),
        F.lit(True).alias("med_within"))


@declared_query(
    "q_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13: top-k — plans as TakeOrderedAndProject (per-partition heap + merge
    on the driver), never a global sort."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# E14 set ops
# --------------------------------------------------------------------------

@declared_query(
    "q_set_ops",
    oracle="""
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         EXCEPT
         SELECT o_custkey AS c_custkey FROM orders)
        UNION
        (SELECT o_custkey AS c_custkey FROM orders
         INTERSECT
         SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14: UNION / INTERSECT / EXCEPT with SQL distinct-set semantics."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    negative = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return (
        building.subtract(with_orders)
        .union(with_orders.intersect(negative))
        .distinct()
    )


# --------------------------------------------------------------------------
# E15-E19 scalar functions
# --------------------------------------------------------------------------

@declared_query(
    "q_fn_string",
    oracle="""
        SELECT c_custkey,
               lower(c_name) AS lname,
               upper(c_mktsegment) AS useg,
               substring(c_name, 1, 8) AS prefix,
               length(c_name) AS name_len,
               concat(c_mktsegment, '/', c_name) AS tagged,
               trim(c_mktsegment) AS seg_trim,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits
        FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15: string scalar functions — all JVM-side, codegen'd."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("/", "c_mktsegment", "c_name").alias("tagged"),
        F.trim("c_mktsegment").alias("seg_trim"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
    )


@declared_query(
    "q_fn_date",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS yr,
               month(o_orderdate) AS mo,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16: date/time scalar functions."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .alias("days_since"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@declared_query(
    "q_fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 1) AS price_r1,
               round(abs(l_discount - 0.05), 6) AS disc_dev,
               round(pow(l_quantity, 2), 4) AS qty_sq,
               round(sqrt(l_extendedprice), 6) AS price_sqrt,
               round(ln(l_extendedprice), 6) AS price_ln
        FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17: math scalar functions."""
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
    )


@declared_query(
    "q_fn_array",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               list_contains(string_split(text, ' '), 'spark') AS has_spark,
               list_max(list_transform(string_split(text, ' '), t -> length(t))) AS max_token_len
        FROM documents
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18: array functions — split / size / distinct / contains / transform+max."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_max(F.transform(toks, lambda t: F.length(t))).alias("max_token_len"),
    )


@declared_query(
    "q_fn_json",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E19: JSON extraction over events.props."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# --------------------------------------------------------------------------
# E26 batch analog: tumbling window aggregation
# --------------------------------------------------------------------------

@declared_query(
    "q_window_tumbling",
    oracle="""
        SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E26 (batch analog): tumbling 1-hour window aggregation over event time.

    The streaming version (readStream + watermark) lives in
    streaming/windows.py and is checked against this batch recomputation.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(_dec("value")).cast("double").alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


# --------------------------------------------------------------------------
# ClickHouse SQL-dialect staples: LIMIT BY, argMax/argMin, -If combinators
# --------------------------------------------------------------------------

@declared_query(
    "q_limit_by",
    oracle="""
        SELECT event_type, event_id, user_id,
               CAST(value AS DOUBLE) AS value
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_type
                ORDER BY value DESC, event_id) AS rn
            FROM events
        ) WHERE rn <= 2
    """,
)
def q_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LIMIT n BY group`` analog: the top-2 rows per
    event_type (by value, event_id tiebreak for determinism) — the
    idiomatic "first N of each group" that plain LIMIT can't express.
    Spark plans it as a running row_number window + filter, which AQE
    executes with one shuffle on the group key; at 100 TB the window's
    rank-limit pushes TopNPerGroup-style early pruning into each
    partition rather than sorting whole groups."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("event_type", "event_id", "user_id",
                F.col("value").cast("double").alias("value"))
    )


@declared_query(
    "q_agg_argminmax",
    oracle="""
        SELECT user_id,
               arg_max(event_id, ts) AS latest_event,
               arg_min(event_id, ts) AS first_event,
               arg_max(event_type, value) AS biggest_type
        FROM events GROUP BY user_id
    """,
)
def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``argMax/argMin`` analog via Spark ``max_by/min_by``:
    the value of one column at another column's extreme — the idiomatic
    "latest state per key" read that otherwise costs a self-join or a
    window. One hash aggregate, partial+final, single shuffle on the
    group key; ties broken identically in both engines because (ts,
    event_id) extremes are unique per user in the fixture."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.max_by("event_id", "ts").alias("latest_event"),
        F.min_by("event_id", "ts").alias("first_event"),
        F.max_by("event_type", "value").alias("biggest_type"),
    )


@declared_query(
    "q_agg_if",
    oracle="""
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
               CAST(coalesce(sum(CAST(value AS DECIMAL(18,2)))
                   FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE)
                   AS purchase_value,
               count(*) FILTER (WHERE event_type = 'error') AS n_errors
        FROM events GROUP BY user_id
    """,
)
def q_agg_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``countIf/sumIf`` combinator analog: conditional
    aggregates fused into ONE pass over the data (the alternative — one
    filtered subquery per condition — rescans the fact table per metric).
    Spark: count_if + sum(when(...)); oracle: ANSI FILTER clauses. All
    branches ride the same partial aggregate, so N metrics cost exactly
    one scan and one shuffle at any SF."""
    e = load(spark, sf_dir, "events")
    purchase = F.col("event_type") == "purchase"
    return e.groupBy("user_id").agg(
        F.count_if(purchase).alias("n_purchases"),
        F.coalesce(F.sum(F.when(purchase, _dec("value"))),
                   F.lit(0).cast("decimal(18,2)"))
        .cast("double").alias("purchase_value"),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
    )


@declared_query(
    "q_array_join",
    oracle="""
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
        FROM (SELECT doc_id,
                     string_split_regex(lower(text), '[^a-z0-9]+') AS toks
              FROM documents) d,
             LATERAL (SELECT unnest(generate_series(1, len(d.toks))) AS i) g
        WHERE toks[i] <> ''
    """,
)
def q_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ARRAY JOIN`` analog: lateral expansion of an array
    column to one row per element WITH its position — Spark's
    ``posexplode`` (Generate operator, zero shuffles: the expansion is
    row-local and pipelines inside the scan stage). The oracle replays it
    with a LATERAL index walk (DuckDB lacks WITH ORDINALITY), so the hash
    match pins both element order and position numbering. At 100 TB the
    Generate's fan-out multiplies rows map-side only — no exchange exists
    for skew to hurt."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), "[^a-z0-9]+")
    return (
        docs.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    )


# ---------------------------------------------------------------------------
# Round 5: ClickHouse dialect staples — groupArray family, multi-quantiles
# ---------------------------------------------------------------------------

GROUPARRAY_N = 5


@declared_query(
    "q_agg_grouparray",
    oracle=f"""
        SELECT user_id,
               count(*) AS n_events,
               array_to_string(
                   list_sort(list_distinct(list(event_type))), ',')
                   AS types_uniq,
               array_to_string(
                   list_transform(
                       (list(value ORDER BY ts, event_id))[1:{GROUPARRAY_N}],
                       x -> CASE WHEN x IS NULL THEN 'NULL'
                            ELSE printf('%.9f', round(x, 9)) END), ',')
                   AS first_values
        FROM events GROUP BY user_id
    """,
)
def q_agg_grouparray(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupUniqArray`` + ``groupArray(N)`` analogs: per user,
    the sorted distinct event-type set and the FIRST {GROUPARRAY_N} values
    in (ts, event_id) time order — array-building aggregation, the shape
    behind per-entity feature vectors and session replies.

    One partial+final agg on user_id. groupArray(N) semantics need a
    deterministic order, which Spark's collect_list alone does not give —
    so the elements carry their (ts_us, event_id) sort key into the
    aggregation as a struct, and the truncation to N happens AFTER
    sort_array, row-locally. Map-side combine still applies (collect
    partials merge associatively); at scale the per-group state is
    bounded by the collect, so groupArray(N) on a hot key is the one
    aggregate you cap with N, exactly why ClickHouse ships the N form.

    Result arrays are emitted in their canonical scalar serialization —
    comma-joined, values round(9)-then-%.9f-formatted (round-to-9dp first
    makes the subsequent fixed-point format tie-free on both engines) —
    the q_agg_summap pattern, so the whole array is one hash-verifiable
    string on any comparator.
    """
    ev = load(spark, sf_dir, "events")
    tagged = F.struct(
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").alias("event_id"),
        F.col("value").alias("value"))
    sorted_vals = F.sort_array(F.collect_list(tagged))
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.array_join(
                F.array_sort(F.collect_set("event_type")), ",")
            .alias("types_uniq"),
            F.array_join(
                F.transform(
                    F.slice(sorted_vals, 1, GROUPARRAY_N),
                    # NULL elements serialize to the literal 'NULL' on
                    # BOTH engines: Java's format_string would render
                    # 'null' while DuckDB printf yields SQL NULL (which
                    # array_to_string silently drops) — an explicit
                    # sentinel keeps the serializations identical
                    lambda r: F.when(r["value"].isNull(), F.lit("NULL"))
                    .otherwise(F.format_string(
                        "%.9f", F.round(r["value"], 9)))), ",")
            .alias("first_values"),
        )
    )


QUANTILES = (0.25, 0.5, 0.75, 0.9)


@declared_query(
    "q_quantiles_multi",
    oracle=f"""
        SELECT event_type,
               count(*) AS n,
               array_to_string(
                   list_transform(
                       quantile_cont(value, {list(QUANTILES)}),
                       x -> CASE WHEN x IS NULL THEN 'NULL'
                            ELSE printf('%.9f', round(x, 9)) END), ',')
                   AS quantiles
        FROM events GROUP BY event_type
    """,
)
def q_quantiles_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantiles(0.25, 0.5, 0.75, 0.9)(x)`` analog: one pass,
    one aggregate, an ARRAY of exact quantiles per group — amortizes the
    sort across all requested quantile levels instead of one aggregate
    per level.

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` both use the
    same linear-interpolation definition (type-7), verified to agree at
    9 dp on this data. Exact quantiles shuffle the group's values to one
    reducer per group — correct for bounded group counts like this
    5-value event_type key; an unbounded key at 100 TB switches to the
    approx_percentile sketch (q_agg_approx_percentile), which is the
    mergeable t-digest path.

    The quantile array is emitted in its canonical scalar serialization
    (comma-joined, round(9)-then-%.9f per element — the q_agg_summap
    pattern) so the result is hash-verifiable on any comparator.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.array_join(
                F.transform(
                    F.percentile("value", F.lit(list(QUANTILES))),
                    # NULL-safe serialization (all-NULL group): Java
                    # format_string renders 'null', DuckDB printf yields
                    # NULL which array_to_string drops — a shared 'NULL'
                    # sentinel keeps both sides identical
                    lambda x: F.when(x.isNull(), F.lit("NULL"))
                    .otherwise(F.format_string("%.9f", F.round(x, 9)))),
                ",").alias("quantiles"),
        )
    )


@declared_query(
    "q_with_fill",
    oracle="""
        WITH p AS (
            SELECT user_id, time_bucket(INTERVAL 1 DAY, ts) AS day,
                   count(*) AS n, round(sum(value), 9) AS revenue
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ),
        span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
                 FROM p GROUP BY 1),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span
        )
        SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
               CAST(coalesce(p.n, 0) AS BIGINT) AS n_purchases,
               coalesce(p.revenue, 0.0) AS revenue
        FROM grid g LEFT JOIN p ON p.user_id = g.user_id AND p.day = g.day
    """,
)
def q_with_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY ... WITH FILL`` analog, per-group: each
    user's daily purchase series densified with zero rows for silent days
    between that user's first and last purchase.

    Unlike q_events_timeseries (one broadcastable global axis), the fill
    axis here is PER KEY, so it is generated distributed — sequence() over
    each user's (min, max) day inside the span agg, then exploded — never
    collected or broadcast. Shape: count agg on (user, day), span agg on
    user, explode, one equi-join back on (user, day). All shuffle keys
    carry user_id, so a 1000-executor run stays key-parallel; the axis
    size is bounded by span·keys, not corpus rows.
    """
    ev = load(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("day", "ts").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 9).alias("revenue"))
    )
    grid = (
        p.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence(
            "d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"))
    )
    return (
        grid.join(p, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_purchases"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
    )


# SCD2 split point: changes before this instant form the existing
# dimension; changes at/after it are the incoming merge batch.
SCD2_SPLIT_US = 1_705_363_200_000_000  # 2024-01-16 00:00:00 UTC


@declared_query(
    "q_scd2_merge",
    oracle="""
        WITH ch AS (
            SELECT user_id, event_type AS status, epoch_us(ts) AS ts_us,
                   event_id
            FROM events
        )
        SELECT user_id, status,
               ts_us AS valid_from,
               lead(ts_us) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS valid_to,
               lead(ts_us) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) IS NULL
                   AS is_current
        FROM ch
    """,
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension maintenance via MERGE-INTO emulation (the
    join + union + window pattern used where Delta's MERGE is
    unavailable): an existing history table (built from changes before
    SCD2_SPLIT_US, open rows carrying valid_to = NULL) absorbs a new
    change batch — touched users' open rows are CLOSED at the batch's
    first change (the update arm), the batch's own rows chain into new
    versions with the last left open (the insert arm), untouched rows
    pass through unchanged.

    Verified by the SCD2 invariant: incrementally merging the batch must
    equal rebuilding the whole history in one window pass — which is
    exactly what the oracle computes, so the hash match proves the merge
    logic (same contract style as the materialized-view queries).

    Scale shape: one window over (user, ts) per side plus one equi-join
    of the dimension against the per-user batch minimum — every shuffle
    keyed by user_id, no broadcast of anything unbounded; at 100 TB this
    is the standard daily-partition dimension merge."""
    ch = load(spark, sf_dir, "events").select(
        "user_id", F.col("event_type").alias("status"),
        F.unix_micros("ts").alias("ts_us"), "event_id")
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")

    dim_src = ch.filter(F.col("ts_us") < SCD2_SPLIT_US)
    batch = ch.filter(F.col("ts_us") >= SCD2_SPLIT_US)

    dim = dim_src.select(
        "user_id", "status", F.col("ts_us").alias("valid_from"),
        F.lead("ts_us").over(w).alias("valid_to"))

    first_new = batch.groupBy("user_id").agg(
        F.min("ts_us").alias("first_new_us"))

    # update arm: close touched users' open rows at the batch's first
    # change; closed rows and untouched users pass through unchanged
    merged_dim = (
        dim.join(first_new, "user_id", "left")
        .select(
            "user_id", "status", "valid_from",
            F.when(F.col("valid_to").isNull(),
                   F.col("first_new_us")).otherwise(F.col("valid_to"))
            .alias("valid_to"))
    )
    # insert arm: the batch's own version chain, last row left open
    new_rows = batch.select(
        "user_id", "status", F.col("ts_us").alias("valid_from"),
        F.lead("ts_us").over(w).alias("valid_to"))

    return (
        merged_dim.unionByName(new_rows)
        .select("user_id", "status", "valid_from", "valid_to",
                F.col("valid_to").isNull().alias("is_current"))
    )


@declared_query(
    "q_running_diff",
    oracle="""
        SELECT user_id, event_id,
               value - lag(value) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                 AS delta_value,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                 AS gap_us,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)
                 AS prev_type
        FROM events
    """,
)
def q_running_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``runningDifference`` / ``neighbor(col, -1)`` analog,
    done right: those functions are block-order-dependent in ClickHouse
    (results change with read order); the deterministic re-expression is
    an explicit lag() window over (user, ts, id) — per-event value delta,
    inter-event gap in µs, and the previous event's type, with NULL at
    each user's first event on both engines.

    Scale: one hash(user_id) shuffle then a per-key sorted scan —
    the minimal shape for any per-entity sequential feature; deltas of
    raw stored doubles are identical bits cross-engine (subtraction of
    identical operands), so no rounding is needed.
    """
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w))
        .alias("gap_us"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


TIES_LIMIT = 10


@declared_query(
    "q_limit_ties",
    oracle=f"""
        WITH r AS (
            SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
                   o_totalprice,
                   rank() OVER (ORDER BY CAST(o_orderdate AS DATE) DESC)
                     AS rk
            FROM orders
        )
        SELECT o_orderkey, order_date, o_totalprice, rk
        FROM r WHERE rk <= {TIES_LIMIT}
    """,
)
def q_limit_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ORDER BY ... LIMIT n WITH TIES`` (ClickHouse / ANSI FETCH WITH
    TIES): the most recent orders, extended past the LIMIT boundary to
    include every row tying with the last one — expressed as the
    rank() <= n filter, which IS the WITH TIES contract (rank, not
    row_number, so the cut never splits a tie group; dates tie heavily,
    making the distinction observable).

    Scale: an unpartitioned ranking window normally serializes on one
    task, but rank() <= n is top-n-per-partition pushable — Spark plans
    a WindowGroupLimit (partial top-n in each map task) before the
    single-partition final window, so the serial step sees only
    n·partitions pre-filtered rows, the same shape TakeOrderedAndProject
    uses for plain LIMIT.
    """
    o = load(spark, sf_dir, "orders")
    w = W.orderBy(F.col("order_date").desc())
    return (
        o.select("o_orderkey",
                 F.col("o_orderdate").cast("date").alias("order_date"),
                 "o_totalprice")
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= TIES_LIMIT)
    )


HIST_LO, HIST_HI, HIST_BINS = 800.0, 600000.0, 20
_HIST_W = (HIST_HI - HIST_LO) / HIST_BINS


@declared_query(
    "q_agg_histogram",
    oracle=f"""
        SELECT CAST(least(greatest(floor((o_totalprice - {HIST_LO})
                                   / {_HIST_W}), 0), {HIST_BINS - 1})
                    AS INTEGER) AS bin,
               CAST({HIST_LO} + CAST(least(greatest(
                        floor((o_totalprice - {HIST_LO}) / {_HIST_W}), 0),
                        {HIST_BINS - 1}) AS INTEGER) * {_HIST_W}
                    AS DOUBLE) AS bin_lo,
               CAST(count(*) AS BIGINT) AS n,
               min(o_totalprice) AS lo,
               max(o_totalprice) AS hi
        FROM orders
        GROUP BY 1, 2
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``histogram(N)(x)`` in its deterministic fixed-grid form:
    equal-width bins over a declared [lo, hi) with edge clamping, per-bin
    count and observed min/max. (ClickHouse's adaptive variant re-centers
    bins from a streaming sample — non-deterministic across merges by its
    own documentation — so the verifiable contract is the fixed grid,
    which is also what dashboards actually render.)

    One partial+final count agg on a derived integer key: map-side combine
    collapses each partition to ≤ N rows before the shuffle, so at 100 TB
    the exchange carries bins, not rows.
    """
    o = load(spark, sf_dir, "orders")
    bin_ = F.least(
        F.greatest(F.floor((F.col("o_totalprice") - HIST_LO) / _HIST_W),
                   F.lit(0)),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    return (
        o.select("o_totalprice", bin_.alias("bin"))
        .groupBy("bin", (HIST_LO + F.col("bin") * _HIST_W).alias("bin_lo"))
        .agg(F.count("*").alias("n"),
             F.min("o_totalprice").alias("lo"),
             F.max("o_totalprice").alias("hi"))
    )


@declared_query(
    "q_fn_array_advanced",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '),
                                  w -> CAST(length(w) AS BIGINT)) AS lens
            FROM documents
        )
        SELECT doc_id,
               array_to_string(
                   list_transform(range(1, len(lens) + 1),
                       i -> CAST(list_sum(list_slice(lens, 1, i)) AS BIGINT)),
                   ',') AS cum,
               array_to_string(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(2, len(lens) + 1),
                                      i -> lens[i] - lens[i - 1])),
                   ',') AS diff,
               array_to_string(
                   list_filter(lens, (x, i) -> i = 1 OR x != lens[i - 1]),
                   ',') AS compact,
               CAST(len(list_distinct(lens)) AS BIGINT) AS n_distinct_lens
        FROM t
    """,
)
def q_fn_array_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse array-function family, the stateful half: arrayCumSum
    (running prefix sums), arrayDifference (deltas, leading 0), and
    arrayCompact (drop consecutive duplicates), over per-token lengths —
    integer arithmetic, so every element is bit-exact cross-engine. The
    Spark side builds cumsum with one left-to-right aggregate() fold
    carrying (prefix array, running total); the oracle recomputes each
    prefix independently — a hash match proves the fold against the
    definition, not implementation-vs-itself.

    Row-local higher-order functions: no shuffle, no explode — the arrays
    never leave their row, so corpus-scale cost is one map stage. Result
    arrays are emitted comma-joined (integer elements, bit-exact string
    form on both engines) so every column is a hash-verifiable scalar.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("transform(split(text, ' '), w -> CAST(length(w) AS BIGINT))")
        .alias("lens"),
    ).select(
        "doc_id",
        # fold: acc = (prefix sums so far, running total); one pass
        F.expr("""
            array_join(
                aggregate(lens,
                          struct(CAST(array() AS ARRAY<BIGINT>) AS pre,
                                 CAST(0 AS BIGINT) AS tot),
                          (acc, x) -> struct(concat(acc.pre,
                                                    array(acc.tot + x)),
                                             acc.tot + x),
                          acc -> acc.pre), ',')
        """).alias("cum"),
        F.expr("""
            array_join(
                CASE WHEN size(lens) = 0 THEN CAST(array() AS ARRAY<BIGINT>)
                     ELSE concat(array(CAST(0 AS BIGINT)),
                                 zip_with(slice(lens, 2, size(lens) - 1),
                                          slice(lens, 1, size(lens) - 1),
                                          (a, b) -> a - b))
                END, ',')
        """).alias("diff"),
        F.expr(
            "array_join(filter(lens, (x, i) -> i = 0 OR x != lens[i - 1]),"
            " ',')")
        .alias("compact"),
        F.expr("CAST(size(array_distinct(lens)) AS BIGINT)")
        .alias("n_distinct_lens"),
    )


@declared_query(
    "q_with_fill_interpolate",
    oracle="""
        WITH p AS (
            SELECT user_id, time_bucket(INTERVAL 1 DAY, ts) AS day,
                   round(sum(value), 9) AS revenue
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ),
        span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
                 FROM p GROUP BY 1),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span
        ),
        j AS (
            SELECT g.user_id, g.day, p.revenue
            FROM grid g LEFT JOIN p ON p.user_id = g.user_id
                                   AND p.day = g.day
        ),
        a AS (
            SELECT user_id, day, revenue,
                   last_value(revenue IGNORE NULLS) OVER w_back AS prev_v,
                   last_value(CASE WHEN revenue IS NOT NULL THEN day END
                              IGNORE NULLS) OVER w_back AS prev_d,
                   first_value(revenue IGNORE NULLS) OVER w_fwd AS next_v,
                   first_value(CASE WHEN revenue IS NOT NULL THEN day END
                               IGNORE NULLS) OVER w_fwd AS next_d
            FROM j
            WINDOW
              w_back AS (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              w_fwd AS (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               revenue IS NOT NULL AS is_observed,
               CASE WHEN revenue IS NOT NULL THEN revenue
                    ELSE prev_v + (next_v - prev_v)
                         * (CAST(date_diff('day', prev_d, day) AS DOUBLE)
                            / CAST(date_diff('day', prev_d, next_d)
                                   AS DOUBLE))
               END AS revenue_filled
        FROM a
    """,
)
def q_with_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH FILL ... INTERPOLATE`` analog (ClickHouse's value-carrying
    fill / TimescaleDB ``interpolate()``): each user's daily purchase
    series densified, with silent days LINEARLY interpolated between the
    neighboring observed days — prev/next anchors found by IGNORE NULLS
    running windows, so no self-join against the observation set. The
    grid spans each user's [first, last] purchase day, so every gap has
    both anchors by construction (no edge extrapolation case).

    Scale shape: same as q_with_fill (per-key axis generated distributed,
    one (user, day) join) plus two frame-bounded windows that reuse the
    SAME hash(user_id) partitioning — Catalyst plans one Exchange for the
    join and both windows. Anchor revenues are 9-dp rounded on both
    engines before the interpolation arithmetic, which is then the same
    IEEE expression tree on identical operands."""
    ev = load(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("day", "ts").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(F.round(F.sum("value"), 9).alias("revenue"))
    )
    grid = (
        p.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence(
            "d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"))
    )
    j = grid.join(p, ["user_id", "day"], "left")
    w_back = (W.partitionBy("user_id").orderBy("day")
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_fwd = (W.partitionBy("user_id").orderBy("day")
             .rowsBetween(W.currentRow, W.unboundedFollowing))
    obs_day = F.when(F.col("revenue").isNotNull(), F.col("day"))
    a = j.select(
        "user_id", "day", "revenue",
        F.last("revenue", ignorenulls=True).over(w_back).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("prev_d"),
        F.first("revenue", ignorenulls=True).over(w_fwd).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("next_d"),
    )
    frac = (F.datediff("day", "prev_d").cast("double")
            / F.datediff("next_d", "prev_d").cast("double"))
    return a.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("revenue").isNotNull().alias("is_observed"),
        F.when(F.col("revenue").isNotNull(), F.col("revenue"))
        .otherwise(F.col("prev_v")
                   + (F.col("next_v") - F.col("prev_v")) * frac)
        .alias("revenue_filled"),
    )


@declared_query(
    "q_topk_weighted",
    oracle="""
        SELECT user_id,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS weight,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
        ORDER BY weight DESC, user_id LIMIT 10
    """,
)
def q_topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topKWeighted(N)(x, w)`` in its exact form: the N
    heaviest keys by accumulated weight (top spenders by purchase
    value), with a deterministic key tie-break. (ClickHouse's version is
    a space-saving sketch — approximate under heavy hitters churn; the
    verifiable contract is the exact weighted top-N, which is also what
    a batch job should compute when it CAN see all the data.)

    Plan: partial+final sum agg (map-side combine carries one row per
    key per partition), then TakeOrderedAndProject — per-partition heaps
    merged on the driver, never a global sort. Weights accumulate in
    exact DECIMAL so the final double is order-independent.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(_dec("value", 18, 6)).cast("double").alias("weight"),
             F.count("*").alias("n_events"))
        .orderBy(F.col("weight").desc(), "user_id")
        .limit(10)
    )


@declared_query(
    "q_window_ntile",
    oracle="""
        SELECT c_custkey, c_nationkey,
               CAST(ntile(4) OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal, c_custkey)
                    AS INTEGER) AS balance_quartile,
               CAST(ntile(10) OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal, c_custkey)
                    AS INTEGER) AS balance_decile
        FROM customer
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing — the windowed quantile-assignment op behind
    customer scoring / stratified splits: per-nation account-balance
    quartiles and deciles in one pass. The unique-key tie-break makes
    bucket boundaries deterministic (ANSI ntile semantics are identical
    across engines only when the order is total).

    One hash(c_nationkey) shuffle feeds BOTH windows (same partitioning
    and ordering → one Window operator, one sort); buckets are computed
    streaming over each sorted partition — no second pass, no
    percentile precomputation.
    """
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", "c_nationkey",
        F.ntile(4).over(w).cast("int").alias("balance_quartile"),
        F.ntile(10).over(w).cast("int").alias("balance_decile"),
    )


@declared_query(
    "q_agg_summap",
    oracle="""
        WITH g AS (
            SELECT user_id, event_type,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id,
               string_agg(event_type || '=' ||
                          CASE WHEN s IS NULL THEN 'NULL'
                               ELSE printf('%.6f', s) END, ','
                          ORDER BY event_type) AS sum_map,
               string_agg(event_type || '=' || CAST(n AS STRING), ','
                          ORDER BY event_type) AS count_map,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM g GROUP BY user_id
    """,
)
def q_agg_summap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap`` / ``countMap`` analog: per user, a map of
    event_type → summed value (and → count), i.e. key-wise map-merge
    aggregation. Spark's MapType is unhashable cross-engine, so the map
    is emitted in its canonical serialization — key-sorted
    'k=v' pairs, values %.6f-formatted from exact DECIMAL sums — which
    makes the whole map one hash-verifiable scalar.

    Plan: partial+final agg on (user, type) — the map-side combine does
    the key-wise merging, exactly what ClickHouse's sumMap combinator
    state does — then a per-user sorted fold. Both shuffles carry
    user_id; the second input is already |users × types| small.
    """
    ev = load(spark, sf_dir, "events")
    g = (
        ev.groupBy("user_id", "event_type")
        .agg(F.sum(_dec("value", 18, 6)).cast("double").alias("s"),
             F.count("*").alias("n"))
    )
    pair_s = F.struct(
        F.col("event_type"),
        # all-NULL groups sum to NULL: serialize as the shared 'NULL'
        # sentinel on BOTH engines (Java format_string would render
        # 'null' while DuckDB's printf NULL makes string_agg drop the
        # whole element) — the q_agg_grouparray contract
        F.when(F.col("s").isNull(), F.lit("NULL"))
        .otherwise(F.format_string("%.6f", F.col("s"))).alias("sv"),
        F.col("n").cast("string").alias("nv"))
    return (
        g.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(pair_s)),
                    lambda r: F.concat(r["event_type"], F.lit("="), r["sv"]),
                ), ",").alias("sum_map"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(pair_s)),
                    lambda r: F.concat(r["event_type"], F.lit("="), r["nv"]),
                ), ",").alias("count_map"),
            F.count("*").alias("n_keys"),
        )
    )


UNIQ_UPTO_N = 8


@declared_query(
    "q_agg_uniq_upto",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(least(count(DISTINCT l_quantity), {UNIQ_UPTO_N + 1})
                    AS BIGINT) AS uniq_qty_upto,
               count(DISTINCT l_quantity) <= {UNIQ_UPTO_N}
                 AS qty_within_cap,
               CAST(least(count(DISTINCT l_linenumber), {UNIQ_UPTO_N + 1})
                    AS BIGINT) AS uniq_line_upto
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_uniq_upto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo(N)(x)``: exact distinct count while ≤ N,
    N+1 as the saturated "more than N" answer — the cardinality-triage
    aggregate ("does this group have few enough variants to enumerate?")
    that ClickHouse answers with O(N) state per group. Expressed as
    least(count distinct, N+1): Catalyst's distinct-agg expansion keeps
    per-group state exact, and the cap is applied at the end — same
    observable contract, verified by hash.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.least(F.countDistinct("l_quantity"), F.lit(UNIQ_UPTO_N + 1))
            .alias("uniq_qty_upto"),
            (F.countDistinct("l_quantity") <= UNIQ_UPTO_N)
            .alias("qty_within_cap"),
            F.least(F.countDistinct("l_linenumber"), F.lit(UNIQ_UPTO_N + 1))
            .alias("uniq_line_upto"),
        )
    )


@declared_query(
    "q_dict_get",
    oracle="""
        SELECT n.n_name AS nation_name, r.r_name AS region_name,
               count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS acctbal_sum
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    """,
)
def q_dict_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse external-dictionary lookup (``dictGet('nation_dict',
    'n_name', c_nationkey)``) analog: tiny dimension tables become
    in-memory hash maps and fact rows resolve attributes by LOOKUP, not
    by join — no shuffle, no build side, no join operator in the plan at
    all.

    The Spark re-expression: collect the KB-scale dimensions once on the
    driver (nation: 25 rows, region: 5 — the same boundedness contract
    ClickHouse dictionaries assume) and compile them into literal
    ``F.create_map`` expressions. The chained dictGet
    (customer → nation → region) becomes two map lookups INSIDE
    whole-stage codegen over the fact scan — the plan is scan → project
    → one aggregate, zero joins (vs the oracle's two). At 100 TB this is
    the difference between two broadcast joins (build + probe per
    executor, plan branches) and a constant-folded expression riding the
    scan; for dims past driver scale, F.broadcast joins are the
    fallback with the same result. Account balances aggregate in
    DECIMAL(18,2), the exact-sum contract."""
    nation = load(spark, sf_dir, "nation").collect()
    region = load(spark, sf_dir, "region").collect()
    rmap = {r["r_regionkey"]: r["r_name"] for r in region}
    name_pairs = []
    region_pairs = []
    for n in nation:
        name_pairs += [F.lit(n["n_nationkey"]), F.lit(n["n_name"])]
        # chain the second dictGet at compile time: nation key → region
        # NAME directly (dictionaries compose into one flat lookup)
        region_pairs += [F.lit(n["n_nationkey"]),
                         F.lit(rmap[n["n_regionkey"]])]
    nation_dict = F.create_map(*name_pairs)
    region_dict = F.create_map(*region_pairs)
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            nation_dict[F.col("c_nationkey")].alias("nation_name"),
            region_dict[F.col("c_nationkey")].alias("region_name"),
            F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        )
        .groupBy("nation_name", "region_name")
        .agg(F.count("*").alias("n_customers"),
             F.sum("bal").cast("double").alias("acctbal_sum"))
    )


@declared_query(
    "q_join_any",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               o.o_orderkey AS first_orderkey,
               epoch_us(o.o_orderdate) AS first_orderdate_us,
               o.o_totalprice AS first_totalprice
        FROM customer c
        LEFT JOIN (
            SELECT * FROM (
                SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS rn
                FROM orders
            ) WHERE rn = 1
        ) o ON o.o_custkey = c.c_custkey
    """,
)
def q_join_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ANY LEFT JOIN`` analog: each left row pairs with AT
    MOST ONE right row — the join that answers "a customer and their
    first order" without multiplying rows. ClickHouse's ANY picks an
    arbitrary match; this pins the deterministic variant (earliest
    (o_orderdate, o_orderkey)), the only version two engines can agree
    on byte-for-byte.

    Spark re-expression: the right side collapses FIRST — one
    ``min(struct(orderdate, orderkey, totalprice))`` per customer key, a
    partial+final hash agg with map-side combine — and only then joins.
    Collapse-before-join is the scale-defining choice: the join's right
    side shrinks from |orders| to |customers| BEFORE the shuffle, the
    join is 1:≤1 (no row explosion), and a hot customer's orders combine
    map-side instead of skewing a join task — where the oracle's
    row_number() formulation would shuffle every order row to a window
    sort first."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    first = (
        o.groupBy("o_custkey")
        .agg(F.min(F.struct(
            F.unix_micros("o_orderdate").alias("d"),
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("p"))).alias("f"))
    )
    return (
        c.join(first, c.c_custkey == first.o_custkey, "left")
        .select(
            "c_custkey", "c_name",
            F.col("f.k").alias("first_orderkey"),
            F.col("f.d").alias("first_orderdate_us"),
            F.col("f.p").alias("first_totalprice"),
        )
    )


@declared_query(
    "q_quantile_weighted",
    oracle="""
        WITH t AS (
            SELECT l_returnflag AS flag, l_extendedprice AS price,
                   CAST(l_quantity AS DECIMAL(18,6)) AS w
            FROM lineitem
        ), c AS (
            SELECT flag, price,
                   sum(w) OVER (PARTITION BY flag ORDER BY price
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(w) OVER (PARTITION BY flag) AS tot
            FROM t
        )
        SELECT flag,
               min(CASE WHEN cum * 4 >= tot THEN price END) AS wq25,
               min(CASE WHEN cum * 2 >= tot THEN price END) AS wmedian,
               min(CASE WHEN cum * 4 >= tot * 3 THEN price END) AS wq75
        FROM c GROUP BY flag
    """,
)
def q_quantile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted(q)(x, w)`` analog: per group,
    the exact weighted quantiles of extended price with quantity as the
    weight — the first value whose cumulative weight reaches q x total,
    the textbook definition.

    One sorted window pass computes the running AND total weight per
    group; three conditional MINs then read off p25/p50/p75 from the
    same pass — one shuffle-sort per group serves every requested
    quantile, the amortization ClickHouse's multi-q form exists for.
    Weights accumulate in DECIMAL(18,6), so the threshold comparisons
    are exact and order-independent: within a run of tied values the
    run's END cumulative weight is permutation-invariant, so whichever
    row crosses the threshold, the captured value is the same — the
    property that lets two engines agree byte-for-byte without a shared
    sort tiebreak. Thresholds compare as cum*k >= tot*m (integer
    multiples, no division), keeping the arithmetic in exact decimal."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("decimal(18,6)").alias("w"))
    w_cum = (W.partitionBy("flag").orderBy("price")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_all = (W.partitionBy("flag")
             .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    c = li.select(
        "flag", "price",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_all).alias("tot"))
    return c.groupBy("flag").agg(
        F.min(F.when(F.col("cum") * 4 >= F.col("tot"),
                     F.col("price"))).alias("wq25"),
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"),
                     F.col("price"))).alias("wmedian"),
        F.min(F.when(F.col("cum") * 4 >= F.col("tot") * 3,
                     F.col("price"))).alias("wq75"),
    )


@declared_query(
    "q_agg_foreach",
    oracle="""
        WITH ex AS (
            SELECT label, vec_id, unnest(embedding) AS elem,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ),
        per_pos AS (
            SELECT label, pos, avg(CAST(elem AS DOUBLE)) AS a,
                   count(*) AS cnt
            FROM ex GROUP BY label, pos
        )
        SELECT label,
               CAST(max(cnt) AS BIGINT) AS n_vecs,
               CAST(count(*) AS INT) AS dim,
               array_to_string(
                   list(CASE WHEN a IS NULL THEN 'NULL'
                        ELSE printf('%.6f', round(a, 6)) END
                        ORDER BY pos), ',') AS centroid
        FROM per_pos GROUP BY label
    """,
)
def q_agg_foreach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``avgForEach`` / ``sumForEach`` combinator analog:
    element-wise aggregation of array columns — per label, the
    position-wise mean of every embedding vector (the per-class
    centroid), plus the vector count and dimensionality.

    Spark-first shape: posexplode → ONE partial+final hash aggregate on
    (label, pos) → per-label reassembly via sort_array(collect_list).
    The alternative — collecting whole arrays per group and reducing
    driver- or UDF-side — holds every vector of a group in one task's
    memory; the exploded form instead shuffles fixed-width (label, pos,
    partial) rows with map-side combine, so a label with a billion
    vectors at 100 TB still aggregates in parallel across the cluster,
    bounded only by |labels|×dim finalize rows. Sums run on float64
    (each float32 element is exactly representable) and the centroid
    serializes in the canonical round(6)-%.6f array-string form.
    """
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", "vec_id",
        F.posexplode("embedding").alias("pos0", "elem"))
    per_pos = (
        ex.groupBy("label", F.col("pos0").alias("pos"))
        .agg(F.avg(F.col("elem").cast("double")).alias("a"),
             F.count("*").alias("cnt"))
    )
    return (
        per_pos.groupBy("label")
        .agg(
            F.max("cnt").alias("n_vecs"),
            F.count("*").cast("int").alias("dim"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "a"))),
                    lambda r: F.when(r["a"].isNull(), F.lit("NULL"))
                    .otherwise(
                        F.format_string("%.6f", F.round(r["a"], 6)))),
                ",").alias("centroid"),
        )
    )


MOVING_W = 3


@declared_query(
    "q_moving_agg",
    oracle=f"""
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               round(sum(value) OVER w, 9) AS mov_sum,
               round(avg(value) OVER w, 9) AS mov_avg,
               round(max(value) OVER w, 9) AS mov_max
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN {MOVING_W - 1} PRECEDING AND CURRENT ROW)
    """,
)
def q_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayMovingSum(N)`` / ``groupArrayMovingAvg(N)``
    analog: per user in (ts, event_id) order, the trailing-{MOVING_W}
    moving sum, average, and max of ``value`` — the smoothing/trend
    primitive behind rate dashboards and anomaly baselines.

    One window spec, three frame aggregates: Spark plans a single sort
    per user partition and streams the O(1)-state frame over it — no
    per-row re-scan, no Python. At 100 TB the cost is exactly one
    shuffle on user_id (skew lands on hot users; salt or pre-bucket if
    one user dominates). The frame order carries event_id as a
    tie-break so replays are deterministic; both engines accumulate the
    identical frame left-to-right, and round(9) absorbs the last-ulp
    difference.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "value")
    w = (W.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(-(MOVING_W - 1), 0))
    return ev.select(
        "user_id", "ts_us", "event_id",
        F.round(F.sum("value").over(w), 9).alias("mov_sum"),
        F.round(F.avg("value").over(w), 9).alias("mov_avg"),
        F.round(F.max("value").over(w), 9).alias("mov_max"),
    )


@declared_query(
    "q_agg_stats",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               round(stddev_pop(value), 6) AS sd_pop,
               round(var_pop(value), 6) AS var_p,
               round(covar_pop(value, CAST(user_id AS DOUBLE)), 6) + 0.0
                   AS covar_p,
               round(corr(value, CAST(user_id AS DOUBLE)), 6) + 0.0 AS corr_vu
        FROM events GROUP BY event_type
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse statistical aggregate family (``stddevPop`` /
    ``varPop`` / ``covarPop`` / ``corr``): per event type, the population
    spread of value and its covariance/correlation with the user id —
    the second-moment family behind variance pruning, feature screening,
    and drift monitors.

    All four are single-pass partial+final hash aggregates in Spark
    (each partial carries fixed-size moment state — count, mean, M2 /
    co-moment — merged associatively), so one shuffle on event_type
    serves the whole family at any scale. Population (not sample) forms
    are used on both engines — identical definitions with no Bessel
    ambiguity — and round(6) absorbs the accumulation-order ulps.
    """
    ev = load(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.stddev_pop("value"), 6).alias("sd_pop"),
            F.round(F.var_pop("value"), 6).alias("var_p"),
            (F.round(F.covar_pop(F.col("value"), u), 6)
             + F.lit(0.0)).alias("covar_p"),
            (F.round(F.corr(F.col("value"), u), 6)
             + F.lit(0.0)).alias("corr_vu"),
        )
    )


@declared_query(
    "q_with_totals",
    oracle="""
        SELECT coalesce(event_type, 'TOTALS') AS event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY ROLLUP(event_type)
    """,
)
def q_with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``GROUP BY ... WITH TOTALS``: the per-group rows plus
    one extra grand-total row carrying the aggregate over ALL groups —
    the dashboard staple (rows for the table body, TOTALS for the footer)
    without a second scan.

    Spark has no WITH TOTALS modifier; ``rollup`` on the single key is
    the exact equivalent — Catalyst expands it to one Expand + one hash
    aggregate, so the totals row costs a second copy of each input row in
    the SAME shuffle, not a second pass over the data (at 100 TB the
    alternative — union of two aggregates — scans twice). The NULL
    grouping key is relabeled 'TOTALS' (event_type is non-null in the
    fixture, so the label cannot collide). Decimal-exact summation makes
    the double result accumulation-order independent.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.rollup("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").alias("value_sum"),
        )
        .select(
            F.coalesce("event_type", F.lit("TOTALS")).alias("event_type"),
            "n", "value_sum",
        )
    )


UNIQ_STATE_BOUND = 0.025  # lgK=14 -> rse ~0.81%; 3-sigma bound


def _uniq_state_dir() -> str:
    from clickhouse_mergetree_spark.scratch import fixed_scratch_dir

    return fixed_scratch_dir("q_uniq_state_est")


@declared_query(
    "q_uniq_state_merge",
    oracle=f"""
        WITH est AS (
            SELECT event_type,
                   CAST(approx_users AS BIGINT) AS approx_users,
                   CAST(n_rows AS BIGINT) AS est_n_rows
            FROM read_parquet('{{_uniq_state_dir}}/*.parquet')
        ), ex AS (
            SELECT event_type,
                   count(DISTINCT user_id) AS exact_users,
                   count(*) AS n_rows,
                   count(DISTINCT date_trunc('day', ts)) AS n_days
            FROM events GROUP BY event_type
        )
        SELECT ex.event_type, est.approx_users, ex.n_rows, ex.n_days,
               (est.est_n_rows = ex.n_rows AND
                abs(est.approx_users - ex.exact_users)
                <= greatest(1, {UNIQ_STATE_BOUND} * ex.exact_users))
                 AS within_envelope
        FROM est JOIN ex USING (event_type)
    """.replace("{_uniq_state_dir}", _uniq_state_dir()),
)
def q_uniq_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqState`` / ``uniqMerge`` (the AggregatingMergeTree
    sketch-state pattern): per-(event_type, day) Datasketches-HLL states
    are built ONCE (``hll_sketch_agg`` — binary, mergeable), persisted as
    a rollup side table, and daily-state merges (``hll_union_agg``)
    answer the per-type distinct-user question WITHOUT rescanning rows —
    the pre-aggregation contract that lets a 100 TB events table serve
    distinct-count dashboards from a days × types state table.

    The merge step consumes ONLY the persisted states (asserted: the
    estimate column derives from the stored binary sketches), so the
    expensive pass is the one groupBy building day states; every later
    question over any day range is state-sized. The same pattern rides
    the engine's aggregating mode for sum/min/max states
    (q_aggregating_merge); HLL completes it for distincts, where no
    exact partial is mergeable at fixed size.

    Driver contract (r9, VERDICT r8 item 3): the merged estimates
    PERSIST as a side table and the oracle asserts — as literal
    arithmetic over its OWN exact distinct counts — that each estimate
    sits inside the lgK=14 envelope (rse ~0.81%, 3-sigma bound
    {UNIQ_STATE_BOUND}). Spark claims within_envelope=true; a drifting
    sketch flips the oracle boolean and fails the hash. n_rows and
    n_days stay independently computed on both engines.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "user_id")
    states = (
        ev.groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("state"),
             F.count("*").alias("n_rows"))
        .persist()
    )
    merged = (
        states.groupBy("event_type")
        .agg(F.hll_sketch_estimate(
                 F.hll_union_agg("state")).alias("approx_users"),
             F.sum("n_rows").alias("n_rows"),
             F.count("*").alias("n_days"))
    )
    # n_rows persists as the corpus marker (ADVICE r9) — a stale side
    # table from another SF flips within_envelope instead of silently
    # checking the wrong run's estimates
    merged.select("event_type", "approx_users", "n_rows").coalesce(1) \
        .write.mode("overwrite").parquet(_uniq_state_dir())
    return merged.select(
        "event_type", "approx_users", "n_rows", "n_days",
        F.lit(True).alias("within_envelope"))


@declared_query(
    "q_bitmap_segments",
    oracle="""
        WITH m AS (
            SELECT DISTINCT event_type, user_id FROM events
        ), sizes AS (
            SELECT event_type, count(*) AS n FROM m GROUP BY event_type
        ), inter AS (
            SELECT a.event_type AS seg_a, b.event_type AS seg_b,
                   count(*) AS n_and
            FROM m a JOIN m b ON a.user_id = b.user_id
            WHERE a.event_type < b.event_type
            GROUP BY seg_a, seg_b
        )
        SELECT i.seg_a, i.seg_b, i.n_and,
               sa.n + sb.n - i.n_and AS n_or,
               round(i.n_and * 1.0 / (sa.n + sb.n - i.n_and), 9)
                   AS jaccard
        FROM inter i
        JOIN sizes sa ON i.seg_a = sa.event_type
        JOIN sizes sb ON i.seg_b = sb.event_type
    """,
)
def q_bitmap_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse bitmap segment analytics (``groupBitmapAnd`` /
    ``groupBitmapOr`` over per-segment user bitmaps): audience overlap
    between every pair of event-type segments — intersection size,
    union size, and Jaccard — the ad-tech/cohort question bitmap
    engines exist to answer.

    Re-expressed set-algebraically (Spark has no roaring bitmaps, and
    doesn't need them for exactness): distinct (segment, user)
    membership — one dedup shuffle — then a self-equi-join on user_id
    counts intersections (each user contributes its own segment pairs;
    per-user fan-out is |segments|², bounded by the segment vocabulary,
    never the corpus), and inclusion-exclusion derives unions from the
    tiny per-segment size table. At 100 TB the join key is user_id —
    uniform, the same shape bitmap construction would shard on anyway.
    """
    ev = load(spark, sf_dir, "events")
    m = ev.select("event_type", "user_id").distinct()
    sizes = m.groupBy("event_type").agg(F.count("*").alias("n"))
    a = m.select(F.col("event_type").alias("seg_a"), "user_id")
    b = m.select(F.col("event_type").alias("seg_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b").agg(F.count("*").alias("n_and"))
    )
    sa = sizes.select(F.col("event_type").alias("seg_a"),
                      F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("seg_b"),
                      F.col("n").alias("nb"))
    n_or = F.col("na") + F.col("nb") - F.col("n_and")
    return (
        inter.join(F.broadcast(sa), "seg_a").join(F.broadcast(sb), "seg_b")
        .select("seg_a", "seg_b", "n_and", n_or.alias("n_or"),
                F.round(F.col("n_and") / n_or, 9).alias("jaccard"))
    )


@declared_query(
    "q_agg_deltasum",
    oracle="""
        WITH d AS (
            SELECT user_id,
                   value - lag(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS delta
            FROM events
        )
        SELECT user_id,
               round(CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END)
                          AS DOUBLE), 6) AS delta_sum,
               count(*) - 1 AS n_steps,
               CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_resets
        FROM d
        GROUP BY user_id
    """,
)
def q_agg_deltasum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum`` (the monotonic-counter aggregate): per
    user, the sum of POSITIVE value deltas over the time-ordered event
    series, ignoring drops — how telemetry pipelines total a counter
    that resets (process restarts, rollovers) without double-counting
    the reset cliff. Reset count reported alongside, the monitoring
    signal itself.

    One window (per-user lag over (ts, event_id) — deterministic under
    timestamp ties) then a per-user hash aggregate: two shuffles on the
    uniform user key, no self-join. DECIMAL-free because deltas sum in
    double with round(6) — the aggregate is per-user-sized, not
    corpus-sized, so accumulation-order ulps stay inside the rounding.
    """
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"))
    return (
        d.groupBy("user_id")
        .agg(
            F.round(F.sum(F.when(F.col("delta") > 0, F.col("delta"))
                          .otherwise(F.lit(0.0))).cast("double"), 6)
            .alias("delta_sum"),
            (F.count("*") - 1).alias("n_steps"),
            F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
            .alias("n_resets"),
        )
    )


@declared_query(
    "q_max_intersections",
    oracle="""
        WITH iv AS (
            SELECT event_type, epoch_us(ts) AS t0,
                   epoch_us(ts) + CAST(value * 1000000 AS BIGINT) AS t1,
                   event_id
            FROM events
        ), pts AS (
            SELECT event_type, t0 AS t, 1 AS d, event_id FROM iv
            UNION ALL
            SELECT event_type, t1 AS t, -1 AS d, event_id FROM iv
        ), sweep AS (
            SELECT event_type,
                   sum(d) OVER (
                       PARTITION BY event_type
                       ORDER BY t, d DESC, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS live
            FROM pts
        )
        SELECT event_type, CAST(max(live) AS BIGINT) AS max_concurrent
        FROM sweep
        GROUP BY event_type
    """,
)
def q_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``maxIntersections`` (peak concurrency): per event
    type, the maximum number of simultaneously-open intervals — sessions
    live at once, calls in flight, rooms occupied — over intervals
    [ts, ts + value seconds]. The sweep-line algorithm: every interval
    contributes a +1 open and a −1 close point, the points sort by time,
    and the peak of the running sum is the answer.

    Touching endpoints count as overlapping (opens sort before closes at
    equal t — ClickHouse's convention), and event_id makes the sweep
    order fully deterministic. The running sum is a per-type window over
    2 rows per interval: one shuffle on event_type; the per-type sort is
    the real cost at scale, exactly as in any engine — maxIntersections
    is Θ(n log n) by nature.
    """
    ev = load(spark, sf_dir, "events")
    t0 = F.unix_micros("ts")
    t1 = t0 + (F.col("value") * 1_000_000).cast("bigint")
    opens = ev.select("event_type", t0.alias("t"), F.lit(1).alias("d"),
                      "event_id")
    closes = ev.select("event_type", t1.alias("t"), F.lit(-1).alias("d"),
                       "event_id")
    w = (W.partitionBy("event_type")
         .orderBy("t", F.col("d").desc(), "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    sweep = opens.unionAll(closes).select(
        "event_type", F.sum("d").over(w).alias("live"))
    return (sweep.groupBy("event_type")
            .agg(F.max("live").alias("max_concurrent")))


@declared_query(
    "q_agg_linreg",
    oracle="""
        SELECT event_type, count(*) AS n,
               round(regr_slope(value, CAST(user_id AS DOUBLE)), 6) + 0.0
                   AS slope,
               round(regr_intercept(value, CAST(user_id AS DOUBLE)), 6) + 0.0
                   AS intercept,
               round(regr_r2(value, CAST(user_id AS DOUBLE)), 6) AS r2
        FROM events
        GROUP BY event_type
    """,
)
def q_agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``simpleLinearRegression`` (per-group OLS fit): slope,
    intercept, and R² of value ~ user_id per event type — the one-pass
    regression every drift monitor and trend panel runs.

    Both engines implement the textbook covariance/variance form over
    identical inputs, and the state is fixed-size power sums (Σx, Σy,
    Σxy, Σx², n) merged associatively — a single partial+final hash
    aggregate, one shuffle on event_type at any scale. round(6) absorbs
    the engines' different accumulation orders.
    """
    ev = load(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.round(F.regr_slope(F.col("value"), u), 6)
             + F.lit(0.0)).alias("slope"),
            (F.round(F.regr_intercept(F.col("value"), u), 6) + F.lit(0.0))
            .alias("intercept"),
            F.round(F.regr_r2(F.col("value"), u), 6).alias("r2"),
        )
    )


@declared_query(
    "q_agg_moments",
    oracle="""
        WITH s AS (
            SELECT event_type, count(*) AS n,
                   sum(value) AS s1,
                   sum(value * value) AS s2,
                   sum(value * value * value) AS s3,
                   sum(value * value * value * value) AS s4
            FROM events GROUP BY event_type
        )
        SELECT event_type, n,
               round((s2 / n) - pow(s1 / n, 2), 6) AS m2,
               round((s3 - 3 * (s1 / n) * s2 + 2 * n * pow(s1 / n, 3))
                     / n / pow((s2 / n) - pow(s1 / n, 2), 1.5), 6) + 0.0
                   AS skew_pop,
               round((s4 - 4 * (s1 / n) * s3 + 6 * pow(s1 / n, 2) * s2
                      - 3 * n * pow(s1 / n, 4))
                     / n / pow((s2 / n) - pow(s1 / n, 2), 2), 6)
                   AS kurt_pop
        FROM s
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``skewPop`` / ``kurtPop`` (3rd/4th standardized
    moments): per event type, population skewness m₃/m₂^1.5 and
    kurtosis m₄/m₂² of value — the distribution-shape screens behind
    outlier detection and drift alarms.

    Spark's and DuckDB's built-in skewness/kurtosis disagree on
    DEFINITION (population g vs sample G vs excess), so both sides
    compute from raw POWER SUMS (Σx..Σx⁴) with the identical central-
    moment expansion — definitional drift is impossible and the state is
    five doubles per group: one partial+final hash aggregate, one
    shuffle, at any scale. round(6) absorbs accumulation-order ulps.
    """
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s1"), F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"), F.sum(v * v * v * v).alias("s4"))
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = (s2 / n) - mu * mu
    m3 = (s3 - 3 * mu * s2 + 2 * n * mu * mu * mu) / n
    m4 = (s4 - 4 * mu * s3 + 6 * mu * mu * s2 - 3 * n * mu**4) / n
    return g.select(
        "event_type", "n",
        F.round(m2, 6).alias("m2"),
        (F.round(m3 / F.pow(m2, 1.5), 6) + F.lit(0.0)).alias("skew_pop"),
        F.round(m4 / (m2 * m2), 6).alias("kurt_pop"),
    )


@declared_query(
    "q_array_join_left",
    oracle="""
        WITH t AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split(o_orderpriority, '-') END AS tags
            FROM orders
        )
        SELECT o_orderkey,
               CASE WHEN len(tags) = 0 THEN NULL ELSE u.tag END AS tag,
               len(tags) AS n_tags
        FROM t LEFT JOIN
             (SELECT o_orderkey AS k, unnest(tags) AS tag FROM t) u
             ON t.o_orderkey = u.k
    """,
)
def q_array_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LEFT ARRAY JOIN``: lateral array expansion that KEEPS
    rows whose array is empty (as one row with a NULL element) — the
    variant plain ARRAY JOIN silently drops, and the difference that
    matters when the array is "labels that may be absent" and absent
    rows must stay countable.

    Spark's ``explode_outer`` is the exact built-in: still a row-local
    Generate (zero shuffles, fan-out map-side only). Every third order's
    tag array is emptied so both behaviors are exercised; the oracle
    re-derives the outer expansion with a LEFT JOIN against the unnest
    (DuckDB's unnest drops empties too — the join-back is the
    independent formulation of the same semantics).
    """
    o = load(spark, sf_dir, "orders")
    tags = F.when(F.col("o_orderkey") % 3 == 0,
                  F.array().cast("array<string>")) \
        .otherwise(F.split("o_orderpriority", "-"))
    return (
        o.select("o_orderkey", tags.alias("tags"))
        .select("o_orderkey", F.explode_outer("tags").alias("tag"),
                F.size("tags").cast("bigint").alias("n_tags"))
    )


@declared_query(
    "q_join_paste",
    oracle="""
        WITH c AS (
            SELECT row_number() OVER (ORDER BY value, event_id) AS pos,
                   value AS click_value
            FROM events WHERE event_type = 'click'
        ),
        v AS (
            SELECT row_number() OVER (ORDER BY value, event_id) AS pos,
                   value AS view_value
            FROM events WHERE event_type = 'view'
        )
        SELECT c.pos, c.click_value, v.view_value,
               round(c.click_value - v.view_value, 6) + 0.0 AS qq_diff
        FROM c JOIN v USING (pos)
    """,
)
def q_join_paste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``PASTE JOIN`` (positional zip of two independently
    ordered result sets, CH 24.2+): here in its canonical analytics use,
    a Q-Q alignment — click values sorted ascending pasted against view
    values sorted ascending, so row i compares the i-th order statistic
    of each cohort (the distribution-shift diagnostic behind
    q_stat_mannwhitney's single-number z). The inner join on position
    reproduces PASTE JOIN's truncate-to-shorter-side contract.

    Positions come from row_number over an explicitly deterministic
    (value, event_id) order. A global row_number is a single-reducer
    window — fine here because each side is ONE cohort's value column,
    already reduced; for corpus-sized sides the scale path is two-pass
    global numbering (per-partition counts broadcast as offsets, i.e.
    zipWithIndex re-expressed), or at Q-Q granularity approx quantiles.
    The position join itself is an equi-join AQE handles normally.
    """
    ev = load(spark, sf_dir, "events")

    def side(tag: str, out: str) -> DataFrame:
        w = W.orderBy("value", "event_id")
        return (
            ev.filter(F.col("event_type") == tag)
            .select(F.row_number().over(w).alias("pos"),
                    F.col("value").alias(out))
        )

    c, v = side("click", "click_value"), side("view", "view_value")
    return c.join(v, "pos").select(
        "pos", "click_value", "view_value",
        (F.round(F.col("click_value") - F.col("view_value"), 6)
         + F.lit(0.0)).alias("qq_diff"),
    )


@declared_query(
    "q_window_range",
    oracle="""
        SELECT event_id, user_id,
               count(*) OVER w AS cnt_1h,
               CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse RANGE-frame windows (``RANGE BETWEEN 1 HOUR PRECEDING
    AND CURRENT ROW``): per user, the trailing-one-hour event count and
    value sum at every event — the rate-limiter / rolling-activity
    primitive that ROWS frames (q_window_frame, q_moving_agg) cannot
    express because it bounds by TIME, not row count.

    Both engines order by epoch microseconds with the frame as an
    integer range (±3 600 000 000 µs), so timestamp-tie handling is
    identical by construction: a RANGE frame includes ALL peers of the
    boundary value, making the result independent of tie order — no
    event_id tiebreak needed, unlike every ROWS-frame query here. One
    hash(user_id) shuffle + per-partition sort; Spark's WindowExec keeps
    a sliding frame pointer, so cost is O(n log n) in partition size
    regardless of how many rows fall in an hour. DECIMAL accumulation
    makes the double sum accumulation-order independent.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id",
        F.count("*").over(w).alias("cnt_1h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w)
        .cast("double").alias("sum_1h"),
    )


@declared_query(
    "q_set_ops_all",
    oracle="""
        WITH b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
             f AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS copies, 'except' AS op
        FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM f) GROUP BY o_custkey
        UNION ALL
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS copies,
               'intersect' AS op
        FROM (SELECT * FROM b INTERSECT ALL SELECT * FROM f)
        GROUP BY o_custkey
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXCEPT ALL`` / ``INTERSECT ALL`` — BAG semantics (q_set_ops is
    the distinct-set family): a customer with 3 open orders and 1
    expensive order keeps 2 copies in the EXCEPT ALL and 1 in the
    INTERSECT ALL, the multiplicity arithmetic ClickHouse (and the SQL
    standard) define and DISTINCT set ops destroy.

    Spark plans both as a single hash aggregate computing per-row
    multiplicities on each side then replicating min/difference counts
    (generate_replicate) — one shuffle per operator on the row value,
    no sort. The result is grouped back to (key, copies) so the hash
    compare is order-insensitive while still pinning multiplicities.
    """
    o = load(spark, sf_dir, "orders")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")

    def counted(df: DataFrame, tag: str) -> DataFrame:
        return (df.groupBy("o_custkey")
                .agg(F.count("*").alias("copies"))
                .withColumn("op", F.lit(tag)))

    return counted(b.exceptAll(f), "except").unionByName(
        counted(b.intersectAll(f), "intersect"))


@declared_query(
    "q_agg_minmax_map",
    oracle="""
        WITH g AS (
            SELECT user_id, event_type,
                   min(value) AS mn, max(value) AS mx
            FROM events WHERE value IS NOT NULL
            GROUP BY user_id, event_type
        )
        SELECT user_id,
               string_agg(event_type || '=' || printf('%.6f', mn), ','
                          ORDER BY event_type) AS min_map,
               string_agg(event_type || '=' || printf('%.6f', mx), ','
                          ORDER BY event_type) AS max_map,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM g GROUP BY user_id
    """,
)
def q_agg_minmax_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``minMap`` / ``maxMap``: per user, key-wise map-merge
    with min/max combine — the sibling of q_agg_summap's sumMap, same
    canonical key-sorted 'k=v' serialization so the whole map is one
    hash-verifiable scalar (no DECIMAL needed: min/max pick an input
    verbatim, so %.6f of a double is already engine-stable).

    Same two-shuffle shape as sumMap: partial+final agg on (user, type)
    — map-side combine IS the key-wise min/max merge — then a per-user
    sorted fold over |users × types| rows.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    )
    pair = F.struct(
        F.col("event_type"),
        F.format_string("%.6f", F.col("mn")).alias("mnv"),
        F.format_string("%.6f", F.col("mx")).alias("mxv"))
    return (
        g.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(pair)),
                            lambda r: F.concat(r["event_type"], F.lit("="),
                                               r["mnv"])), ",")
            .alias("min_map"),
            F.array_join(
                F.transform(F.sort_array(F.collect_list(pair)),
                            lambda r: F.concat(r["event_type"], F.lit("="),
                                               r["mxv"])), ",")
            .alias("max_map"),
            F.count("*").alias("n_keys"),
        )
    )


@declared_query(
    "q_join_asof_forward",
    oracle="""
        SELECT event_id, user_id, ts_us, next_purchase_value,
               next_purchase_us FROM (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   first_value(CASE WHEN event_type = 'purchase'
                                    THEN value END IGNORE NULLS)
                     OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN 1 FOLLOWING
                                    AND UNBOUNDED FOLLOWING)
                     AS next_purchase_value,
                   first_value(CASE WHEN event_type = 'purchase'
                                    THEN epoch_us(ts) END IGNORE NULLS)
                     OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN 1 FOLLOWING
                                    AND UNBOUNDED FOLLOWING)
                     AS next_purchase_us
            FROM events
        )
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD ASOF join (ClickHouse ``ASOF JOIN ... ON l.ts <= r.ts``,
    the `>=`-default's mirror): for every event, the NEXT purchase by
    the same user — value and time — the time-to-conversion primitive
    (q_join_asof is the backward twin).

    Same single-window re-expression: an ASOF join where the right side
    is a filtered view of the left collapses to first_value IGNORE NULLS
    over a FOLLOWING frame — one hash(user_id) exchange, one per-user
    sort shared by both outputs, no join operator, no row explosion.
    Deterministic under timestamp ties via the event_id tiebreak.
    """
    ev = load(spark, sf_dir, "events")
    w = (W.partitionBy("user_id")
         .orderBy(F.unix_micros("ts"), "event_id")
         .rowsBetween(1, W.unboundedFollowing))
    pval = F.when(F.col("event_type") == "purchase", F.col("value"))
    pts = F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
    return ev.select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.first(pval, ignorenulls=True).over(w)
        .alias("next_purchase_value"),
        F.first(pts, ignorenulls=True).over(w)
        .alias("next_purchase_us"),
    )


# ---------------------------------------------------------------------------
# Round 8: retention() combinator
# ---------------------------------------------------------------------------


@declared_query(
    "q_agg_retention",
    defer=True,
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                     AS c1,
                   max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                     AS c2,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS c3
            FROM events GROUP BY user_id
        )
        SELECT CAST(sum(c1) AS BIGINT) AS r1,
               CAST(sum(c1 * c2) AS BIGINT) AS r2,
               CAST(sum(c1 * c3) AS BIGINT) AS r3,
               round(CAST(sum(c1 * c2) AS DOUBLE)
                     / NULLIF(sum(c1), 0), 6) AS ratio2,
               round(CAST(sum(c1 * c3) AS DOUBLE)
                     / NULLIF(sum(c1), 0), 6) AS ratio3
        FROM per_user
    """,
)
def q_agg_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention(cond1, ..., condN)``: per user, an array of
    flags where cond1 GATES the rest (slot k = cond1 AND condK) — summed
    across users into the funnel-retention counters r1..rN and their
    conversion ratios. The canonical CH marketing query
    (q_events_retention is the day-cohort variant; this is the literal
    combinator semantics).

    One partial+final agg per user (max-of-flag == EXISTS, no distinct
    blowup), then a second 1-row reduce over the |users| flag rows —
    both shuffles carry 3 ints per user, nothing corpus-width. The gate
    multiplies flags instead of re-scanning per condition, exactly how
    the CH aggregate state is laid out.
    """
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1)
              .otherwise(0)).alias("c1"),
        F.max(F.when(F.col("event_type") == "click", 1)
              .otherwise(0)).alias("c2"),
        F.max(F.when(F.col("event_type") == "purchase", 1)
              .otherwise(0)).alias("c3"),
    )
    return per_user.agg(
        F.sum("c1").alias("r1"),
        F.sum(F.col("c1") * F.col("c2")).alias("r2"),
        F.sum(F.col("c1") * F.col("c3")).alias("r3"),
        F.round(F.sum(F.col("c1") * F.col("c2")).cast("double")
                / F.nullif(F.sum("c1"), F.lit(0)), 6).alias("ratio2"),
        F.round(F.sum(F.col("c1") * F.col("c3")).cast("double")
                / F.nullif(F.sum("c1"), F.lit(0)), 6).alias("ratio3"),
    )


# --------------------------------------------------------------------------
# Round 10: E199 topK frequency aggregate, E200 tolerance as-of join
# --------------------------------------------------------------------------

TOPK_K = 3


@declared_query(
    "q_agg_topk",
    oracle=f"""
        SELECT o_orderstatus, rnk, o_orderpriority, cnt FROM (
            SELECT o_orderstatus, o_orderpriority, cnt,
                   row_number() OVER (PARTITION BY o_orderstatus
                                      ORDER BY cnt DESC, o_orderpriority)
                     AS rnk
            FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
                  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        ) WHERE rnk <= {TOPK_K}
    """,
    defer=True,
)
def q_agg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E199: ClickHouse ``topK(k)(x)`` — the k most frequent values per
    group. CH's implementation is an approximate space-saving sketch;
    this is the EXACT two-phase formulation (the one a migrating user
    should adopt unless cardinality forces the sketch): partial+final
    count on (group, value), then a per-group rank window keeping the
    top k, ties broken by value for determinism (CH's sketch order is
    engine-specific, so exact-with-tiebreak is also the only
    hash-verifiable contract).

    Scale shape: the first agg's key space is |groups| x |distinct
    values| — for categorical columns (the topK use case) that is tiny
    regardless of corpus size, and map-side combine collapses the fact
    rows before the one exchange. The rank window then runs over that
    bounded aggregate, never the corpus. Result is exploded to scalar
    rows (group, rank, value, count) rather than CH's array cell, which
    the driver's canonicalizer cannot hash.
    """
    o = load(spark, sf_dir, "orders")
    counts = (o.groupBy("o_orderstatus", "o_orderpriority")
              .agg(F.count("*").alias("cnt")))
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority"))
    return (counts.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOPK_K)
            .select("o_orderstatus", "rnk", "o_orderpriority", "cnt"))


ASOF_TOLERANCE_US = 3_600_000_000  # 1 hour in microseconds


@declared_query(
    "q_join_asof_tolerance",
    oracle=f"""
        SELECT event_id, user_id, ts_us,
               CASE WHEN ts_us - m_ts <= {ASOF_TOLERANCE_US}
                    THEN m_val END AS recent_purchase_value
        FROM (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   last_value(CASE WHEN event_type = 'purchase'
                                   THEN value END IGNORE NULLS)
                     OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS m_val,
                   last_value(CASE WHEN event_type = 'purchase'
                                   THEN epoch_us(ts) END IGNORE NULLS)
                     OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS m_ts
            FROM events
        )
    """,
    defer=True,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E200: as-of join with a TOLERANCE — the latest strictly-earlier
    purchase by the same user, but only if it happened within the last
    hour; older matches return NULL (pandas ``merge_asof(tolerance=...)``
    / QuestDB ``ASOF JOIN TOLERANCE`` semantics — the form used for
    feature freshness windows, where a stale feature is worse than none).

    Same scale shape as q_join_asof (one shuffle on user_id, a linear
    preceding-rows frame within each partition — no range join): the
    frame carries BOTH the candidate value and its timestamp, and the
    tolerance is a row-local post-filter on the matched timestamp. At
    100 TB this stays a single sort-shuffle; the tolerance adds zero
    data movement.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_type") == "purchase",
               F.col("value")).alias("pval"),
        F.when(F.col("event_type") == "purchase",
               F.unix_micros("ts")).alias("pts"),
    )
    w = (W.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    return ev.select(
        "event_id", "user_id", "ts_us",
        F.when(
            F.col("ts_us") - F.last("pts", ignorenulls=True).over(w)
            <= F.lit(ASOF_TOLERANCE_US),
            F.last("pval", ignorenulls=True).over(w),
        ).alias("recent_purchase_value"),
    )


@declared_query(
    "q_counter_rate",
    oracle="""
        SELECT user_id, event_id,
               CASE WHEN ts_us > prev_ts
                    THEN round((CASE WHEN value >= prev_v
                                     THEN value - prev_v
                                     ELSE value END)
                               / ((ts_us - prev_ts) / 1e6), 6) + 0.0
               END AS rate_per_s
        FROM (
            SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
                   lag(value) OVER w AS prev_v,
                   lag(epoch_us(ts)) OVER w AS prev_ts
            FROM events
            WHERE user_id < 5 AND value IS NOT NULL
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id)
        )
        WHERE prev_v IS NOT NULL
    """,
    defer=True,
)
def q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E209: Prometheus ``rate()`` counter-reset semantics: the
    per-second derivative of a per-entity counter series, treating a
    value DROP as a counter reset (the post-reset value IS the increase)
    — the monitoring idiom for ingest/QPS counters that restart from
    zero. NOTE this deliberately differs from ClickHouse's
    ``nonNegativeDerivative``, which clamps a negative delta to 0
    instead of taking the new value as the increase; and since the reset
    branch emits the raw new value, a series that can go NEGATIVE can
    emit a negative "rate" here (Prometheus counters are nonnegative by
    contract, so this only matters for misuse on gauge-like inputs).
    user_id < 5 bounds the emitted rows (q_ema's reporting convention);
    the computation shape is corpus-wide.

    One lag window inside a single user_id sort-shuffle; the reset CASE
    and the division are row-local, so at 100 TB this is exactly the
    q_running_diff plan with one extra codegen expression. Tie-breaking
    the order on event_id and guarding dt > 0 keeps the division
    deterministic on both engines (same-timestamp pairs emit NULL, as CH
    does when x does not advance).
    """
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev = (load(spark, sf_dir, "events")
          .filter((F.col("user_id") < 5) & F.col("value").isNotNull())
          .select("user_id", "event_id", "value",
                  F.unix_micros("ts").alias("ts_us")))
    lagged = ev.select(
        "user_id", "event_id", "value", "ts_us",
        F.lag("value").over(w).alias("prev_v"),
        F.lag("ts_us").over(w).alias("prev_ts"),
    ).filter(F.col("prev_v").isNotNull())
    delta = F.when(F.col("value") >= F.col("prev_v"),
                   F.col("value") - F.col("prev_v")).otherwise(F.col("value"))
    rate = F.when(
        F.col("ts_us") > F.col("prev_ts"),
        F.round(delta / ((F.col("ts_us") - F.col("prev_ts")) / F.lit(1e6)), 6)
        + F.lit(0.0))
    return lagged.select("user_id", "event_id", rate.alias("rate_per_s"))
