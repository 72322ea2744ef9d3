"""External-dictionary lookups (SURVEY.md §2.B dictionary family).

ClickHouse external dictionaries (``dictGet`` / ``dictGetOrDefault`` /
``dictHas`` over flat/hashed layouts, ``range_hashed`` for effective-dated
attributes, ``dictGetHierarchy`` / ``dictIsIn`` over hierarchical ones) are
the idiomatic way to enrich a fact scan with a small dimension without
writing a join. The reference engine has no dictionary layer (it is a
storage engine, ``src/merge_tree.cpp``); this family re-expresses the
lookup semantics Spark-first.

Scale design: a dictionary IS a broadcast join. Every lookup here builds
the dimension as a (small) DataFrame and joins it with
``F.broadcast(...)`` — the dimension ships once per executor, the fact
table never shuffles, and Catalyst plans a BroadcastHashJoin whose probe
side stays in whole-stage codegen. ``range_hashed`` adds a non-equi range
conjunct to the same broadcast equi-join (Spark keeps the hash join on the
equi key and applies the range as a join filter). The hierarchy walk is a
fixed number of self-joins against the broadcast parent map — depth many,
NOT rows many. No Python runs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.tables import load

# ---------------------------------------------------------------------------
# flat/hashed layout: dictGet + dictGetOrDefault + dictHas
# ---------------------------------------------------------------------------

DICT_MISS_DEFAULT = "unknown"


@declared_query(
    "q_dict_get_default",
    oracle=f"""
        WITH dim AS (
            SELECT n_nationkey AS key, n_name AS nation_name,
                   r_name AS region_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
        )
        SELECT c_custkey,
               d1.nation_name,
               d1.region_name,
               coalesce(d2.nation_name, '{DICT_MISS_DEFAULT}')
                 AS shifted_name,
               (d2.key IS NOT NULL) AS shifted_has
        FROM customer
        LEFT JOIN dim d1 ON d1.key = c_nationkey
        LEFT JOIN dim d2 ON d2.key = c_nationkey + 13
    """,
)
def q_dict_get_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``dictGet`` / ``dictGetOrDefault`` / ``dictHas`` over a
    hashed-layout dictionary: the nation dimension (key → name + region
    name, region attribute resolved at dictionary build time) probed per
    customer row. The shifted probe (``c_nationkey + 13``) exercises the
    miss path: ``dictGetOrDefault`` substitutes the default, ``dictHas``
    reports membership — both must agree row-by-row.

    The dictionary is a broadcast: 25 rows ship once, the customer scan
    never shuffles, and both probes are BroadcastHashJoins in one
    whole-stage-codegen pipeline. At 100 TB of facts this plan is
    unchanged — dictionary size bounds memory, fact size only bounds scan
    time. ClickHouse evaluates dictGet the same way (in-memory hash probe
    per row); the left join + coalesce IS that semantics relationally.
    """
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    dim = (
        nation.join(F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").alias("key"),
                F.col("n_name").alias("nation_name"),
                F.col("r_name").alias("region_name"))
    )
    cust = load(spark, sf_dir, "customer")
    d1 = F.broadcast(dim).alias("d1")
    d2 = F.broadcast(dim.select(F.col("key"),
                                F.col("nation_name").alias("nn2"))).alias("d2")
    return (
        cust.join(d1, F.col("c_nationkey") == F.col("d1.key"), "left")
        .join(d2, F.col("c_nationkey") + 13 == F.col("d2.key"), "left")
        .select(
            "c_custkey",
            F.col("d1.nation_name").alias("nation_name"),
            F.col("d1.region_name").alias("region_name"),
            F.coalesce(F.col("d2.nn2"), F.lit(DICT_MISS_DEFAULT))
            .alias("shifted_name"),
            F.col("d2.key").isNotNull().alias("shifted_has"),
        )
    )


# ---------------------------------------------------------------------------
# range_hashed layout: effective-dated attribute lookup
# ---------------------------------------------------------------------------

@declared_query(
    "q_dict_range",
    oracle="""
        WITH cust_region AS (
            SELECT c_custkey, n_regionkey AS rkey
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        ),
        rates AS (
            SELECT n.n_regionkey AS rkey,
                   CAST(date_trunc('year', l_shipdate) AS DATE) AS lo,
                   CAST(date_trunc('year', l_shipdate)
                        + INTERVAL 1 YEAR - INTERVAL 1 DAY AS DATE) AS hi,
                   round(avg(l_discount), 9) AS rate
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n ON s_nationkey = n.n_nationkey
            GROUP BY 1, 2, 3
        )
        SELECT r_name AS region,
               CAST(year(o_orderdate) AS INT) AS order_year,
               count(*) AS n_orders,
               round(min(rates.rate), 9) AS rate_min,
               round(max(rates.rate), 9) AS rate_max
        FROM orders
        JOIN cust_region ON o_custkey = c_custkey
        JOIN region ON r_regionkey = cust_region.rkey
        LEFT JOIN rates ON rates.rkey = cust_region.rkey
                       AND o_orderdate BETWEEN rates.lo AND rates.hi
        GROUP BY 1, 2
    """,
)
def q_dict_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``range_hashed`` dictionary: an effective-dated rate
    table — (region, [year_start, year_end], avg supplier-side discount
    that year) — probed per order with ``dictGet('rates', 'rate',
    region, o_orderdate)``: the range lookup selects the period containing
    the order date, the BETWEEN semantics exactly. Output rolls the
    per-order lookups up per (region, year); min=max proves every order in
    the group resolved to the same period's rate, i.e. the range probe is
    what joined, not an accident of aggregation.

    The rate dimension is ~35 rows (5 regions × 7 ship years), broadcast;
    Spark plans the equi key (region) as a BroadcastHashJoin and applies
    the date-range conjunct as the join filter — the fact side streams, no
    shuffle before the final rollup. The dimension is derived from
    lineitem (one agg over a pruned 3-column scan), mirroring how a real
    range dictionary is loaded from a query source. At 100 TB the dim
    stays KB-scale, so the probe plan is unchanged.
    """
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    supplier = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_discount")
    rates = (
        li.join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_regionkey").alias("rkey"),
            F.to_date(F.date_trunc("year", "l_shipdate")).alias("lo"))
        .agg(F.round(F.avg("l_discount"), 9).alias("rate"))
        .withColumn("hi", F.date_sub(F.add_months(F.col("lo"), 12), 1))
    )
    cust_region = (
        load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation.select("n_nationkey",
                                        F.col("n_regionkey").alias("crkey"))),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "crkey")
    )
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    probed = (
        orders.join(cust_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(rates),
              (F.col("crkey") == F.col("rkey"))
              & F.col("o_orderdate").between(F.col("lo"), F.col("hi")),
              "left")
        .join(F.broadcast(region),
              F.col("crkey") == F.col("r_regionkey"))
    )
    return (
        probed.groupBy(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(F.count("*").alias("n_orders"),
             F.round(F.min("rate"), 9).alias("rate_min"),
             F.round(F.max("rate"), 9).alias("rate_max"))
    )


# ---------------------------------------------------------------------------
# hierarchical layout: dictGetHierarchy + dictIsIn
# ---------------------------------------------------------------------------

# Unified node-id space for the 3-level geography hierarchy:
#   customer node = 1000 + c_custkey   (leaf)
#   nation node   =  100 + n_nationkey (parent of its customers)
#   region node   =        r_regionkey (root; parent of its nations)
_CUST_BASE = 1000
_NATION_BASE = 100

_HIER_SQL = f"""
        WITH parent_map AS (
            SELECT {_CUST_BASE} + c_custkey AS node,
                   {_NATION_BASE} + c_nationkey AS parent
            FROM customer
            UNION ALL
            SELECT {_NATION_BASE} + n_nationkey AS node,
                   n_regionkey AS parent
            FROM nation
        ),
        leaves AS (
            SELECT {_CUST_BASE} + c_custkey AS node
            FROM customer WHERE c_custkey <= 200
        ),
        chain AS (
            SELECT node AS start, node, 0 AS depth FROM leaves
            UNION ALL
            SELECT c.start, p.parent, c.depth + 1
            FROM chain c JOIN parent_map p ON p.node = c.node
        )
"""


@declared_query(
    "q_dict_hierarchy",
    oracle=f"""
        WITH RECURSIVE {_HIER_SQL.split("WITH", 1)[1]}
        SELECT start AS node,
               array_to_string(list(node ORDER BY depth), ',')
                 AS hierarchy,
               max(depth) AS depth,
               max(CASE WHEN depth > 0 AND node = 2 THEN 1 ELSE 0 END) = 1
                 AS in_region_2
        FROM chain
        GROUP BY start
    """,
)
def q_dict_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse hierarchical dictionary: ``dictGetHierarchy(node)``
    returns the self-to-root ancestor chain, ``dictIsIn(node, ancestor)``
    tests containment — here over a 3-level geography (customer → nation →
    region) in a unified node-id space, for the first 200 customers.

    The parent map is a dictionary (broadcast, one row per non-root
    node); the chain is built by DEPTH-many self-joins against it — the
    hierarchy depth is a property of the dictionary (3 here, ~5-10 for
    real org/category trees), never of the fact volume, so the loop count
    is fixed and each step is one BroadcastHashJoin over the frontier.
    This is exactly how ClickHouse evaluates dictGetHierarchy (repeated
    parent probes in the in-memory layout), re-expressed as data-parallel
    joins. The chain serializes in its canonical comma-joined form (the
    q_agg_grouparray pattern) so the whole array is one hash-verifiable
    string; the oracle rebuilds the same chains with a recursive CTE.
    """
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    parent_map = (
        cust.select(
            (F.lit(_CUST_BASE) + F.col("c_custkey")).alias("node"),
            (F.lit(_NATION_BASE) + F.col("c_nationkey")).alias("parent"))
        .unionByName(nation.select(
            (F.lit(_NATION_BASE) + F.col("n_nationkey")).alias("node"),
            F.col("n_regionkey").alias("parent")))
    )
    frontier = (
        cust.filter(F.col("c_custkey") <= 200)
        .select((F.lit(_CUST_BASE) + F.col("c_custkey")).alias("start"))
        .withColumn("node", F.col("start"))
        .withColumn("depth", F.lit(0))
    )
    chains = frontier
    # depth-many parent probes: customer -> nation -> region (fixed by the
    # dictionary's declared depth, independent of row counts)
    for step in range(2):
        pm = F.broadcast(parent_map).alias(f"pm{step}")
        fr = frontier.alias(f"fr{step}")
        frontier = (
            fr.join(pm, F.col(f"fr{step}.node") == F.col(f"pm{step}.node"))
            .select(F.col(f"fr{step}.start").alias("start"),
                    F.col(f"pm{step}.parent").alias("node"),
                    (F.col(f"fr{step}.depth") + 1).alias("depth"))
        )
        chains = chains.unionByName(frontier)
    tagged = F.struct(F.col("depth").alias("depth"),
                      F.col("node").alias("node"))
    return (
        chains.groupBy("start")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(tagged)),
                            lambda r: r["node"].cast("string")), ",")
            .alias("hierarchy"),
            F.max("depth").alias("depth"),
            F.max(F.when((F.col("depth") > 0) & (F.col("node") == 2), 1)
                  .otherwise(0)).cast("boolean").alias("in_region_2"),
        )
        .select(F.col("start").alias("node"),
                "hierarchy", "depth", "in_region_2")
    )
