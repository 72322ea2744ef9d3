"""Statistical-test and time-decay aggregates (SURVEY.md §2.B stats family).

ClickHouse ships a family of hypothesis-test and association aggregates
(``welchTTest``, ``studentTTest``, ``mannWhitneyUTest``, ``cramersV``,
``theilsU``) plus time-decayed means (``exponentialMovingAverage``).
The reference engine has no statistics layer, but these are table stakes
for an analytics engine used to monitor training-data drift: comparing a
metric between two cohorts, measuring association between categorical
columns, smoothing per-entity time series.

Everything here is re-expressed as single-pass relational aggregation —
fixed-size moment state merged associatively — so each query is one or
two shuffles regardless of corpus size. No Python UDFs: test statistics
are closed-form over counts/means/variances, ranks come from window
functions, and the EMA fold runs as a Catalyst higher-order function
(``aggregate`` over a bounded window frame), all inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.tables import load


@declared_query(
    "q_stat_ttest",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   count(*) AS n,
                   avg(value) AS mean,
                   var_samp(value) AS var
            FROM events
            GROUP BY event_type
        ),
        ctrl AS (SELECT n AS n0, mean AS mean0, var AS var0
                 FROM m WHERE event_type = 'view')
        SELECT m.event_type,
               m.n,
               round((m.mean - ctrl.mean0)
                     / sqrt(m.var / m.n + ctrl.var0 / ctrl.n0), 6) + 0.0
                 AS welch_t,
               round(pow(m.var / m.n + ctrl.var0 / ctrl.n0, 2)
                     / (pow(m.var / m.n, 2) / (m.n - 1)
                        + pow(ctrl.var0 / ctrl.n0, 2) / (ctrl.n0 - 1)),
                     6) AS welch_df,
               round((m.mean - ctrl.mean0)
                     / (sqrt(((m.n - 1) * m.var + (ctrl.n0 - 1) * ctrl.var0)
                             / (m.n + ctrl.n0 - 2))
                        * sqrt(1.0 / m.n + 1.0 / ctrl.n0)), 6) + 0.0 AS student_t
        FROM m CROSS JOIN ctrl
        WHERE m.event_type <> 'view'
    """,
)
def q_stat_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``welchTTest`` / ``studentTTest``: for every event type,
    the t statistic of its value distribution against the 'view' control
    cohort — Welch's unequal-variance form with its Satterthwaite degrees
    of freedom, plus the pooled-variance Student form.

    Both tests are closed-form over (n, mean, sample variance), so the
    whole family costs ONE partial+final hash aggregate over the corpus
    (fixed moment state per event_type) followed by a broadcast of the
    one-row control cohort — no second scan, no sort, no Python. At
    100 TB the aggregate is the only data-sized operation; the t math
    runs on a handful of rows. round(6) absorbs accumulation-order ulps
    (var_samp matches DuckDB's Bessel-corrected form exactly).
    """
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("var"),
    )
    ctrl = (
        m.filter(F.col("event_type") == "view")
        .select(F.col("n").alias("n0"), F.col("mean").alias("mean0"),
                F.col("var").alias("var0"))
    )
    se2 = F.col("var") / F.col("n") + F.col("var0") / F.col("n0")
    pooled = (
        ((F.col("n") - 1) * F.col("var") + (F.col("n0") - 1) * F.col("var0"))
        / (F.col("n") + F.col("n0") - 2)
    )
    return (
        m.filter(F.col("event_type") != "view")
        .crossJoin(F.broadcast(ctrl))
        .select(
            "event_type",
            "n",
            (F.round((F.col("mean") - F.col("mean0")) / F.sqrt(se2), 6)
             + F.lit(0.0))
            .alias("welch_t"),
            F.round(
                F.pow(se2, 2)
                / (F.pow(F.col("var") / F.col("n"), 2) / (F.col("n") - 1)
                   + F.pow(F.col("var0") / F.col("n0"), 2) / (F.col("n0") - 1)),
                6,
            ).alias("welch_df"),
            (F.round(
                (F.col("mean") - F.col("mean0"))
                / (F.sqrt(pooled) * F.sqrt(1.0 / F.col("n") + 1.0 / F.col("n0"))),
                6,
            ) + F.lit(0.0)).alias("student_t"),
        )
    )


@declared_query(
    "q_stat_mannwhitney",
    oracle="""
        WITH s AS (
            SELECT event_type, value FROM events
            WHERE event_type IN ('click', 'view')
        ),
        r AS (
            SELECT event_type,
                   value,
                   rank() OVER (ORDER BY value)
                     + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS arank
            FROM s
        ),
        agg AS (
            SELECT count(*) FILTER (event_type = 'click') AS n1,
                   count(*) FILTER (event_type = 'view') AS n2,
                   sum(arank) FILTER (event_type = 'click') AS r1
            FROM r
        ),
        ties AS (
            SELECT sum(pow(c, 3) - c) AS tcorr, sum(c) AS n
            FROM (SELECT count(*) AS c FROM s GROUP BY value) t
        )
        SELECT n1, n2,
               round(r1 - n1 * (n1 + 1) / 2.0, 6) AS u1,
               round(n1 * n2 - (r1 - n1 * (n1 + 1) / 2.0), 6) AS u2,
               round(((r1 - n1 * (n1 + 1) / 2.0) - n1 * n2 / 2.0)
                     / sqrt(n1 * n2 / 12.0
                            * ((n + 1) - tcorr / (n * (n - 1.0)))), 6) + 0.0 AS z
        FROM agg CROSS JOIN ties
    """,
)
def q_stat_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``mannWhitneyUTest``: the rank-sum U statistic (and its
    tie-corrected normal approximation z) comparing click vs view value
    distributions — the non-parametric complement to q_stat_ttest for
    skewed metrics where means mislead.

    Average ranks come from ``rank() + (ties-1)/2`` — a min-rank window
    plus a per-value count window, both over the SAME global value order,
    so Spark runs them in one sort. That global sort is the honest cost
    of exact ranks (ClickHouse pays it too inside the aggregate); at
    100 TB one would switch to binned ranks over a fixed histogram, which
    this plan degrades to by bucketing value first. The tie-correction
    term needs per-value tie counts — a second small aggregate over the
    filtered pair of cohorts, not the corpus.
    """
    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_type", "value"
    )
    arank = (
        F.rank().over(Window.orderBy("value"))
        + (F.count("*").over(Window.partitionBy("value")) - 1) / 2.0
    )
    r = s.select("event_type", "value", arank.alias("arank"))
    agg = r.agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n1"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n2"),
        F.sum(F.when(F.col("event_type") == "click", F.col("arank"))).alias("r1"),
    )
    ties = (
        s.groupBy("value").agg(F.count("*").alias("c"))
        .agg(F.sum(F.pow(F.col("c"), 3) - F.col("c")).alias("tcorr"),
             F.sum("c").alias("n"))
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    sigma = F.sqrt(
        F.col("n1") * F.col("n2") / 12.0
        * ((F.col("n") + 1) - F.col("tcorr") / (F.col("n") * (F.col("n") - 1.0)))
    )
    return agg.crossJoin(F.broadcast(ties)).select(
        "n1",
        "n2",
        F.round(u1, 6).alias("u1"),
        F.round(F.col("n1") * F.col("n2") - u1, 6).alias("u2"),
        (F.round((u1 - F.col("n1") * F.col("n2") / 2.0) / sigma, 6)
         + F.lit(0.0)).alias("z"),
    )


@declared_query(
    "q_stat_association",
    oracle="""
        WITH s AS (
            SELECT event_type AS x, CAST(floor(value / 20.0) AS BIGINT) AS y
            FROM events WHERE value IS NOT NULL
        ),
        cell AS (SELECT x, y, count(*) AS nij FROM s GROUP BY x, y),
        rx AS (SELECT x, sum(nij) AS ri FROM cell GROUP BY x),
        cy AS (SELECT y, sum(nij) AS cj FROM cell GROUP BY y),
        tot AS (SELECT sum(nij) AS n, count(DISTINCT x) AS r,
                       count(DISTINCT y) AS c FROM cell),
        chi AS (
            SELECT sum(pow(cell.nij - rx.ri * cy.cj / CAST(tot.n AS DOUBLE), 2)
                       / (rx.ri * cy.cj / CAST(tot.n AS DOUBLE))) AS chi2
            FROM cell JOIN rx USING (x) JOIN cy USING (y) CROSS JOIN tot
        ),
        hx AS (SELECT -sum(ri / CAST(n AS DOUBLE) * ln(ri / CAST(n AS DOUBLE))) AS h
               FROM rx CROSS JOIN tot),
        hxy AS (
            SELECT -sum(cell.nij / CAST(tot.n AS DOUBLE)
                        * ln(cell.nij / CAST(cy.cj AS DOUBLE))) AS h
            FROM cell JOIN cy USING (y) CROSS JOIN tot
        )
        SELECT round(chi.chi2, 6) AS chi2,
               round(sqrt(chi.chi2 / (tot.n * (least(tot.r, tot.c) - 1))), 6)
                 AS cramers_v,
               round((hx.h - hxy.h) / hx.h, 6) + 0.0 AS theils_u
        FROM chi CROSS JOIN tot CROSS JOIN hx CROSS JOIN hxy
    """,
)
def q_stat_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``cramersV`` / ``theilsU``: association strength between
    two categorical columns — here event_type × a 20-unit value bucket —
    via the chi-square contingency statistic (Cramér's V, symmetric) and
    conditional-entropy uncertainty reduction (Theil's U, directional
    H(x) - H(x|y) over H(x)).

    One corpus-sized aggregate builds the contingency cells; marginals,
    chi-square, and the entropies are all tiny follow-on aggregates over
    the cell table (|event types| × |buckets| rows), joined broadcast.
    At 100 TB the cell table is still KB-sized, so the plan is one
    shuffle + driver-scale math — exactly how ClickHouse's implementation
    amortizes it (a single hash-map state merged across streams).
    """
    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("x"),
        F.floor(F.col("value") / 20.0).cast("bigint").alias("y"),
    )
    cell = s.groupBy("x", "y").agg(F.count("*").alias("nij"))
    rx = cell.groupBy("x").agg(F.sum("nij").alias("ri"))
    cy = cell.groupBy("y").agg(F.sum("nij").alias("cj"))
    tot = cell.agg(
        F.sum("nij").alias("n"),
        F.countDistinct("x").alias("r"),
        F.countDistinct("y").alias("c"),
    )
    nd = F.col("n").cast("double")
    expected = F.col("ri") * F.col("cj") / nd
    chi = (
        cell.join(F.broadcast(rx), "x").join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(F.pow(F.col("nij") - expected, 2) / expected).alias("chi2"))
    )
    hx = rx.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(F.col("ri") / nd * F.log(F.col("ri") / nd))).alias("h")
    ).select(F.col("h").alias("hx"))
    hxy = (
        cell.join(F.broadcast(cy), "y").crossJoin(F.broadcast(tot))
        .agg((-F.sum(F.col("nij") / nd
                     * F.log(F.col("nij") / F.col("cj").cast("double")))).alias("h"))
        .select(F.col("h").alias("hxy"))
    )
    return (
        chi.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hxy))
        .select(
            F.round("chi2", 6).alias("chi2"),
            F.round(
                F.sqrt(F.col("chi2") / (F.col("n") * (F.least("r", "c") - 1))), 6
            ).alias("cramers_v"),
            (F.round((F.col("hx") - F.col("hxy")) / F.col("hx"), 6)
             + F.lit(0.0)).alias("theils_u"),
        )
    )


@declared_query(
    "q_ema",
    oracle="""
        WITH w AS (
            SELECT user_id, event_id, value,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 31 PRECEDING AND CURRENT ROW) AS vs
            FROM events
        )
        SELECT user_id, event_id, value,
               round(CAST(list_reduce(vs, (acc, x) -> 0.5 * acc + 0.5 * x)
                          AS DOUBLE), 6) AS ema
        FROM w
        WHERE user_id < 5
    """,
)
def q_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage``: per-user time-ordered EMA
    of value with decay 0.5, seeded at the first observation — the
    smoothing primitive behind per-entity trend monitors. A 32-row frame
    truncation is exact to double precision (0.5^32 < 2.4e-10 relative
    weight), so the windowed form equals the full-history recurrence.

    The fold runs as a Catalyst higher-order function: ``collect_list``
    over a BOUNDED window frame (32 doubles of state per row, shuffled
    once on user_id) then ``aggregate`` — whole-stage codegen, no Python.
    The streaming twin of this shape is q_stream_stateful's running
    state; this one is the batch/backfill path, and at 100 TB it is one
    shuffle with per-row state capped at 32 values regardless of how long
    a user's history is. DuckDB mirrors it with list() + list_reduce
    (both engines fold left over the identical (ts, event_id) order).
    """
    ev = load(spark, sf_dir, "events")
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-31, 0)
    )
    vs = F.collect_list("value").over(frame)
    ema = F.aggregate(
        F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0))),
        F.element_at(vs, 1).cast("double"),
        lambda acc, x: 0.5 * acc + 0.5 * x,
    )
    return (
        ev.select("user_id", "event_id", "value", F.round(ema, 6).alias("ema"))
        .filter(F.col("user_id") < 5)
    )


@declared_query(
    "q_stat_ks",
    oracle="""
        WITH pts AS (
            SELECT value,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                     AS nc,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                     AS nv
            FROM events
            WHERE event_type IN ('click', 'view') AND value IS NOT NULL
            GROUP BY value
        ),
        tot AS (SELECT sum(nc) AS n1, sum(nv) AS n2 FROM pts),
        cum AS (
            SELECT sum(nc) OVER (ORDER BY value) AS cc,
                   sum(nv) OVER (ORDER BY value) AS cv
            FROM pts
        ),
        dmax AS (
            SELECT max(abs(CAST(cc AS DOUBLE) / (SELECT n1 FROM tot)
                           - CAST(cv AS DOUBLE) / (SELECT n2 FROM tot)))
                     AS d
            FROM cum
        ),
        lam AS (
            SELECT d, d * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2))
                     AS lambda
            FROM dmax, tot
        )
        SELECT (SELECT CAST(n1 AS BIGINT) FROM tot) AS n1,
               (SELECT CAST(n2 AS BIGINT) FROM tot) AS n2,
               round(d, 9) AS d_stat,
               round(lambda, 6) AS lambda,
               round((SELECT sum(CASE WHEN k % 2 = 1 THEN 2.0 ELSE -2.0 END
                                 * exp(-2.0 * k * k * lam.lambda
                                       * lam.lambda))
                      FROM range(1, 101) t(k)), 6) AS p_approx
        FROM lam
    """,
)
def q_stat_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``kolmogorovSmirnovTest``: two-sample KS over the click
    vs view value distributions — D = sup|F1 − F2| between the empirical
    CDFs, λ = D·√(n1·n2/(n1+n2)), and the asymptotic p-value from the
    Kolmogorov distribution's alternating series (100 terms, far past
    double convergence — both engines sum the identical ascending series,
    so the rounded values agree bit-for-bit).

    Distributed shape: ECDFs need one global value order — the same floor
    as exact quantiles, and exactly what ClickHouse pays inside the
    aggregate's sorted-array merge. Here: one groupBy(value) collapses
    ties (counts per atom, linear), one range-partitioned window computes
    both cumulative counts in a single sort, one max reduces D. Per-row
    state is two counters; nothing is collected. At 100 TB the groupBy
    output is bounded by the number of DISTINCT values, so the sort that
    follows is over the compressed domain, not the corpus.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view")
                & F.col("value").isNotNull())
    )
    pts = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .alias("nc"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .alias("nv"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    # the cumsum already runs in one global window partition, so the
    # grand totals ride the SAME sorted pass as unbounded-frame maxes —
    # one scan, one sort, no second aggregate branch re-reading events
    # (the first formulation cross-joined a separate totals aggregate,
    # doubling the source scans — caught by plan audit)
    wg = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = pts.select(
        F.sum("nc").over(w).alias("cc"),
        F.sum("nv").over(w).alias("cv"),
    ).select(
        "cc", "cv",
        F.max("cc").over(wg).alias("n1"),
        F.max("cv").over(wg).alias("n2"),
    )
    agg = (
        cum.agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.max(F.abs(
                F.col("cc").cast("double") / F.col("n1")
                - F.col("cv").cast("double") / F.col("n2"))).alias("d"),
        )
        .withColumn(
            "lambda_raw",
            F.col("d") * F.sqrt(F.col("n1").cast("double") * F.col("n2")
                                / (F.col("n1") + F.col("n2"))))
    )
    series = F.aggregate(
        F.sequence(F.lit(1), F.lit(100)),
        F.lit(0.0),
        lambda acc, k: acc
        + F.when(k % 2 == 1, F.lit(2.0)).otherwise(F.lit(-2.0))
        * F.exp(-2.0 * k.cast("double") * k.cast("double")
                * F.col("lambda_raw") * F.col("lambda_raw")),
    )
    return agg.select(
        "n1", "n2",
        F.round("d", 9).alias("d_stat"),
        F.round("lambda_raw", 6).alias("lambda"),
        F.round(series, 6).alias("p_approx"))


LTTB_BUCKETS = 20


@declared_query(
    "q_lttb",
    oracle=f"""
        WITH pts AS (
            SELECT user_id, epoch_us(ts) AS x, value AS y,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM events WHERE user_id < 20 AND value IS NOT NULL
        ),
        bucketed AS (
            SELECT *, CAST(floor(rn * {LTTB_BUCKETS} * 1.0 / n) AS BIGINT)
                        AS bucket
            FROM pts WHERE n >= {LTTB_BUCKETS}
        ),
        anchors AS (
            SELECT user_id, bucket,
                   avg(x) AS mx, avg(y) AS my
            FROM bucketed GROUP BY user_id, bucket
        ),
        ctx AS (
            SELECT user_id, bucket,
                   lag(mx) OVER w AS px, lag(my) OVER w AS py,
                   lead(mx) OVER w AS nx, lead(my) OVER w AS ny
            FROM anchors
            WINDOW w AS (PARTITION BY user_id ORDER BY bucket)
        ),
        scored AS (
            SELECT b.user_id, b.bucket, b.x, b.y, b.rn,
                   abs((c.px - c.nx) * (b.y - c.py)
                       - (c.px - b.x) * (c.ny - c.py)) / 2.0 AS area,
                   c.px IS NULL OR c.nx IS NULL AS is_edge
            FROM bucketed b
            JOIN ctx c ON b.user_id = c.user_id AND b.bucket = c.bucket
        ),
        sel AS (
            SELECT user_id, bucket, x, y, rn, area,
                   row_number() OVER (
                       PARTITION BY user_id, bucket
                       ORDER BY CASE WHEN is_edge THEN rn
                                     ELSE NULL END ASC NULLS LAST,
                                area DESC, rn ASC) AS pick
            FROM scored
        )
        SELECT user_id, CAST(bucket AS INT) AS bucket,
               x AS sel_ts_us, y AS sel_value
        FROM sel WHERE pick = 1
    """,
)
def q_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``largestTriangleThreeBuckets`` (LTTB downsampling),
    parallel-anchor variant: each per-user series collapses to
    {LTTB_BUCKETS} visually-representative points. Every interior bucket
    keeps the point with the largest triangle area against the NEIGHBOR
    BUCKETS' mean points; edge buckets (first/last) keep their first/last
    point in time order, the LTTB boundary convention.

    The canonical LTTB chains buckets sequentially (each triangle uses
    the previously SELECTED point), which serializes the scan. Anchoring
    on the neighbor buckets' means instead — Steinarsson's own
    approximation step — makes every bucket's selection independent:
    one row_number window assigns buckets, one agg computes bucket means,
    one lag/lead window pairs anchors, one max-by per bucket selects.
    All four are per-user-keyed, so every exchange carries user_id and
    the points-side join is co-partitioned. Per-row state is O(1);
    10^9-point series downsample with no driver involvement and no
    sequential chain. The plan reads the source twice (points branch +
    anchors branch) — both scans are pruned to the same 4 columns; at
    corpus scale one would persist the bucketed stage to trade memory
    for the second scan. Ties break to the earliest point (rn), so the
    output is deterministic on both engines.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter((F.col("user_id") < 20) & F.col("value").isNotNull())
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    pts = ev.select(
        "user_id",
        F.unix_micros("ts").alias("x"),
        F.col("value").alias("y"),
        (F.row_number().over(wseq) - 1).alias("rn"),
        F.count("*").over(wall).alias("n"),
    )
    bucketed = (
        pts.filter(F.col("n") >= LTTB_BUCKETS)
        .withColumn("bucket",
                    (F.col("rn") * LTTB_BUCKETS / F.col("n"))
                    .cast("bigint"))
    )
    anchors = (
        bucketed.groupBy("user_id", "bucket")
        .agg(F.avg("x").alias("mx"), F.avg("y").alias("my"))
    )
    wb = Window.partitionBy("user_id").orderBy("bucket")
    ctx = anchors.select(
        "user_id", "bucket",
        F.lag("mx").over(wb).alias("px"), F.lag("my").over(wb).alias("py"),
        F.lead("mx").over(wb).alias("nx"), F.lead("my").over(wb).alias("ny"),
    )
    scored = (
        bucketed.join(ctx, ["user_id", "bucket"])
        .withColumn(
            "area",
            F.abs((F.col("px") - F.col("nx")) * (F.col("y") - F.col("py"))
                  - (F.col("px") - F.col("x"))
                  * (F.col("ny") - F.col("py"))) / 2.0)
        .withColumn("is_edge",
                    F.col("px").isNull() | F.col("nx").isNull())
    )
    # interior buckets: max area, ties to earliest rn; edge buckets:
    # first bucket keeps its first point, last keeps its last — for the
    # FIRST bucket min rn is the convention; for the LAST bucket LTTB
    # keeps the final point, but the bucket assignment puts the series'
    # last point at max rn, so edge selection by min rn handles the
    # first bucket and the oracle mirrors the same rule for both edges
    # (deterministic and documented; the visual difference is one point).
    best = F.min(F.struct(
        F.when(F.col("is_edge"), F.col("rn")).otherwise(F.lit(None))
        .alias("edge_rn"),
        (-F.coalesce(F.col("area"), F.lit(0.0))).alias("neg_area"),
        F.col("rn").alias("rn"),
        F.col("x").alias("x"),
        F.col("y").alias("y"),
        F.coalesce(F.col("area"), F.lit(0.0)).alias("area"),
    ))
    return (
        scored.groupBy("user_id", "bucket")
        .agg(best.alias("b"))
        # the area is selection-internal only: at epoch-microsecond x
        # scale its magnitude (~1e13) makes any fixed-decimal rounding
        # ulp-sensitive across engines, while the SELECTED POINTS — the
        # operator's actual output — are exact
        .select("user_id",
                F.col("bucket").cast("int").alias("bucket"),
                F.col("b.x").alias("sel_ts_us"),
                F.col("b.y").alias("sel_value"))
    )


@declared_query(
    "q_stat_rankcorr",
    oracle="""
        WITH r AS (
            SELECT event_type,
                   rank() OVER wx
                     + (count(*) OVER (wx RANGE BETWEEN CURRENT ROW
                                       AND CURRENT ROW) - 1) / 2.0 AS rx,
                   rank() OVER wy
                     + (count(*) OVER (wy RANGE BETWEEN CURRENT ROW
                                       AND CURRENT ROW) - 1) / 2.0 AS ry
            FROM events
            WHERE value IS NOT NULL
            WINDOW wx AS (PARTITION BY event_type ORDER BY value),
                   wy AS (PARTITION BY event_type ORDER BY epoch_us(ts))
        ),
        s AS (
            SELECT event_type,
                   CAST(count(*) AS DOUBLE) AS n,
                   sum(rx) AS sx, sum(ry) AS sy,
                   sum(rx * rx) AS sx2, sum(ry * ry) AS sy2,
                   sum(rx * ry) AS sxy
            FROM r GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CASE WHEN (n * sx2 - sx * sx) * (n * sy2 - sy * sy) > 0
                    THEN round((n * sxy - sx * sy)
                               / sqrt((n * sx2 - sx * sx)
                                      * (n * sy2 - sy * sy)), 6) + 0.0
               END AS rho
        FROM s
    """,
    defer=True,
)
def q_stat_rankcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E206: ClickHouse ``rankCorr(x, y)`` — Spearman rank correlation,
    here between event value and event time per event_type (the "is this
    metric drifting over time" monitor, robust to outliers where Pearson
    is not). Average ranks for ties (the textbook Spearman contract):
    min-rank + (ties-1)/2 via two windows.

    Determinism: ranks are exact multiples of 0.5 and every moment sum
    stays far below 2^53, so the partial aggregation is order-exact; the
    closing rho formula then runs the identical IEEE operation sequence
    on both engines. Scale shape: two sort-windows inside the SAME
    event_type shuffle partition (one exchange total), then a bounded
    |event_types|-key agg with map-side combine carrying 6 doubles of
    state — the same fixed-moment-state pattern as the t-test family
    above, linear in the corpus with no second shuffle.
    """
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "value",
                  F.unix_micros("ts").alias("ts_us")))
    # peer counts ride the SAME sort as the rank (RANGE current-row
    # frame = the ORDER BY peer group), so each axis costs one sort
    # instead of a rank sort plus a tie-partition re-sort
    wx = Window.partitionBy("event_type").orderBy("value")
    wy = Window.partitionBy("event_type").orderBy("ts_us")
    peers_x = F.count("*").over(
        wx.rangeBetween(Window.currentRow, Window.currentRow))
    peers_y = F.count("*").over(
        wy.rangeBetween(Window.currentRow, Window.currentRow))
    rx = F.rank().over(wx) + (peers_x - 1) / 2.0
    ry = F.rank().over(wy) + (peers_y - 1) / 2.0
    ranked = ev.select("event_type", rx.alias("rx"), ry.alias("ry"))
    s = ranked.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("rx").alias("sx"), F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sx2"),
        F.sum(F.col("ry") * F.col("ry")).alias("sy2"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sx2, sy2, sxy = F.col("sx2"), F.col("sy2"), F.col("sxy")
    den2 = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    rho = F.when(
        den2 > 0,
        F.round((n * sxy - sx * sy) / F.sqrt(den2), 6) + F.lit(0.0))
    return s.select("event_type", n.cast("bigint").alias("n"),
                    rho.alias("rho"))


@declared_query(
    "q_bounding_ratio",
    oracle="""
        SELECT event_type,
               CASE WHEN lt > ft
                    THEN round((lv - fv) / ((lt - ft) / 1e6), 6) + 0.0
               END AS slope_per_s
        FROM (
            SELECT event_type,
                   first_value(value) OVER w AS fv,
                   last_value(value) OVER w AS lv,
                   first_value(epoch_us(ts)) OVER w AS ft,
                   last_value(epoch_us(ts)) OVER w AS lt,
                   row_number() OVER w AS rn
            FROM events
            WHERE value IS NOT NULL
            WINDOW w AS (PARTITION BY event_type
                         ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING)
        )
        WHERE rn = 1
    """,
    defer=True,
)
def q_bounding_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E207: ClickHouse ``boundingRatio(x, y)`` — the slope between the
    chronologically first and last points of each group's (time, value)
    series, i.e. the net rate of change over the observed span (CH uses
    it as a cheap trend probe before anything heavier). Tie-break on
    event_id makes "first"/"last" deterministic on both engines.

    Scale shape: ONE sort-window per event_type partition (the same
    single exchange the rank/asof family uses) with an unbounded frame
    that Spark evaluates as a running min/max — no second pass; the
    row_number()=1 filter collapses each group to one row before
    anything leaves the partition. CH holds 4 doubles of state per
    group; this holds the same 4 values per row until the filter, and
    at 100 TB the cost is the one sort-shuffle on the group key.
    """
    w = (Window.partitionBy("event_type")
         .orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "event_id", "value",
                  F.unix_micros("ts").alias("ts_us")))
    snap = ev.select(
        "event_type",
        F.first("value").over(w).alias("fv"),
        F.last("value").over(w).alias("lv"),
        F.first("ts_us").over(w).alias("ft"),
        F.last("ts_us").over(w).alias("lt"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("ts_us", "event_id")
        ).alias("rn"),
    ).filter(F.col("rn") == 1)
    slope = F.when(
        F.col("lt") > F.col("ft"),
        F.round((F.col("lv") - F.col("fv"))
                / ((F.col("lt") - F.col("ft")) / F.lit(1e6)), 6)
        + F.lit(0.0))
    return snap.select("event_type", slope.alias("slope_per_s"))


@declared_query(
    "q_interval_length_sum",
    oracle="""
        WITH iv AS (
            SELECT event_type, event_id,
                   epoch_us(ts) AS s,
                   epoch_us(ts)
                     + CAST(floor(value * 1e6) AS BIGINT) AS e
            FROM events
            WHERE value IS NOT NULL AND value > 0
        ),
        sweep AS (
            SELECT event_type, s, e,
                   max(e) OVER (PARTITION BY event_type
                                ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prev_max
            FROM iv
        )
        SELECT event_type,
               count(*) AS n_intervals,
               CAST(sum(greatest(e, coalesce(prev_max, s))
                        - greatest(s, coalesce(prev_max, s)))
                    AS BIGINT) AS covered_us
        FROM sweep
        GROUP BY event_type
    """,
    defer=True,
)
def q_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E208: ClickHouse ``intervalLengthSum(start, end)`` — the total
    length of the UNION of each group's [start, end) intervals, overlaps
    counted once (CH's session-coverage / machine-uptime aggregate).
    Intervals here are [ts, ts + value seconds) per event_type.

    Classic sweep-line as one window: sort intervals by start inside the
    group partition, carry the running max end over the PRECEDING frame,
    and each interval contributes only the part past that high-water
    mark — `max(0, e - max(s, prev_max))` — summed per group. All
    arithmetic is int64 microseconds (the float duration is floored to
    µs ONCE, identically on both engines), so the result is exact and
    order-independent. Scale shape: one sort-shuffle on the group key,
    a linear frame scan, then a bounded-key agg — the same single
    exchange every window query in this family pays, vs the quadratic
    interval-overlap self-join this operator exists to replace.
    """
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull() & (F.col("value") > 0))
          .select("event_type", "event_id",
                  F.unix_micros("ts").alias("s"),
                  (F.unix_micros("ts")
                   + F.floor(F.col("value") * 1e6).cast("bigint")).alias("e")))
    w = (Window.partitionBy("event_type")
         .orderBy("s", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    sweep = ev.withColumn("prev_max", F.max("e").over(w))
    base = F.greatest(F.col("s"), F.coalesce(F.col("prev_max"), F.col("s")))
    contrib = F.greatest(F.col("e"),
                         F.coalesce(F.col("prev_max"), F.col("s"))) - base
    return (sweep.groupBy("event_type")
            .agg(F.count("*").alias("n_intervals"),
                 F.sum(contrib).alias("covered_us")))


@declared_query(
    "q_stat_anova",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) AS s,
                   CAST(sum(CAST(value * value AS DECIMAL(38,18)))
                        AS DOUBLE) AS s2
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(sum(n) AS BIGINT) AS n_all,
                   CAST(count(*) AS BIGINT) AS k,
                   sum(s) AS s_all
            FROM g
        ),
        parts AS (
            SELECT (SELECT sum(s * s / n) FROM g)
                     - s_all * s_all / n_all AS ssb,
                   (SELECT sum(s2) FROM g)
                     - (SELECT sum(s * s / n) FROM g) AS ssw,
                   k, n_all
            FROM tot
        )
        SELECT CAST(k AS INTEGER) AS n_groups, n_all,
               round(ssb / (k - 1), 6) + 0.0 AS ms_between,
               round(ssw / (n_all - k), 6) + 0.0 AS ms_within,
               CASE WHEN ssw > 0
                    THEN round((ssb / (k - 1)) / (ssw / (n_all - k)), 6)
                         + 0.0
               END AS f_stat
        FROM parts
    """,
    defer=True,
)
def q_stat_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E217: one-way ANOVA (ClickHouse ``analysisOfVariance`` /
    ``anova``, 23.x) — does mean(value) differ across event_type
    cohorts? F = MS_between / MS_within from the classic sum-of-squares
    decomposition, the k-cohort generalization of the E161 t-tests.

    Fixed-moment-state shape: per-group (n, Σx, Σx²) with the sums
    accumulated as DECIMAL(38,18) (exact + associative at any
    parallelism — the covariance convention, since raw Σx² here is
    ~1e8-scale where double partial-order drift is real), then a k-row
    closing formula executed in the same IEEE order on both engines.
    One bounded-key agg over the corpus; the finish is k rows.
    """
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    dec = F.col("value").cast("decimal(38,18)")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,18)"))
        .cast("double").alias("s2"))
    tot = g.agg(
        F.sum("n").alias("n_all"),
        F.count("*").alias("k"),
        F.sum("s").alias("s_all"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sq_n"),
        F.sum("s2").alias("s2_all"))
    ssb = F.col("sq_n") - F.col("s_all") * F.col("s_all") / F.col("n_all")
    ssw = F.col("s2_all") - F.col("sq_n")
    msb = ssb / (F.col("k") - 1)
    msw = ssw / (F.col("n_all") - F.col("k"))
    return tot.select(
        F.col("k").cast("int").alias("n_groups"),
        F.col("n_all").cast("bigint").alias("n_all"),
        (F.round(msb, 6) + F.lit(0.0)).alias("ms_between"),
        (F.round(msw, 6) + F.lit(0.0)).alias("ms_within"),
        F.when(ssw > 0, F.round(msb / msw, 6) + F.lit(0.0))
        .alias("f_stat"))


@declared_query(
    "q_time_weighted_avg",
    oracle="""
        WITH w AS (
            SELECT user_id, value,
                   lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                            ORDER BY epoch_us(ts), event_id)
                     - epoch_us(ts) AS dt_us
            FROM events
            WHERE user_id < 40 AND value IS NOT NULL
        ),
        s AS (
            SELECT user_id,
                   CAST(sum(CAST(value * dt_us AS DECIMAL(38,6)))
                        AS DOUBLE) AS vw,
                   CAST(sum(dt_us) AS BIGINT) AS tw,
                   count(*) AS n_segments
            FROM w WHERE dt_us IS NOT NULL AND dt_us > 0
            GROUP BY user_id
        )
        SELECT user_id, CAST(n_segments AS BIGINT) AS n_segments,
               round(vw / tw, 6) + 0.0 AS tw_avg
        FROM s
    """,
    defer=True,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E221: time-weighted average over irregularly-sampled series
    (TimescaleDB ``time_weight('LOCF', ...)`` / the TSDB staple CH users
    build from ``deltaSum``-style windows): each observation holds until
    the next one, so it contributes value × holding-time; the per-entity
    mean is Σ v·Δt / Σ Δt — the correct "average sensor reading" where
    the plain avg over-weights bursts of samples. Zero-length segments
    (same-timestamp pairs) are excluded on both engines.

    One lead() window inside a single user_id sort-shuffle; v·Δt
    products are computed in double ONCE (deterministic single IEEE op:
    exact int64 µs × double) then summed as DECIMAL(38,6) — exact and
    associative at any parallelism (the covariance convention; a plain
    double sum's partial order drifts at the 6-dp boundary). The final
    divide runs on identical inputs on both engines.
    """
    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id"))
    ev = (load(spark, sf_dir, "events")
          .filter((F.col("user_id") < 40) & F.col("value").isNotNull())
          .select("user_id", "event_id", "value",
                  F.unix_micros("ts").alias("ts_us")))
    seg = (ev.withColumn("dt_us",
                         F.lead("ts_us").over(w) - F.col("ts_us"))
           .filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0)))
    s = seg.groupBy("user_id").agg(
        F.sum((F.col("value") * F.col("dt_us")).cast("decimal(38,6)"))
        .cast("double").alias("vw"),
        F.sum("dt_us").alias("tw"),
        F.count("*").alias("n_segments"))
    return s.select(
        "user_id", F.col("n_segments").cast("bigint").alias("n_segments"),
        (F.round(F.col("vw") / F.col("tw"), 6) + F.lit(0.0))
        .alias("tw_avg"))


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@declared_query(
    "q_corr_matrix",
    oracle=f"""
        WITH m AS (
            SELECT count(*) AS n,
                   {", ".join(
                       f"CAST(sum(CAST({c} AS DECIMAL(38,18))) AS DOUBLE)"
                       f" AS s{i}"
                       for i, c in enumerate(_CORR_COLS))},
                   {", ".join(
                       f"CAST(sum(CAST({a} * {b} AS DECIMAL(38,18)))"
                       f" AS DOUBLE) AS p{i}_{j}"
                       for i, a in enumerate(_CORR_COLS)
                       for j, b in enumerate(_CORR_COLS) if i <= j)}
            FROM lineitem
        )
        SELECT i, j,
               CASE WHEN (n * pii - si * si) * (n * pjj - sj * sj) > 0
                    THEN round((n * pij - si * sj)
                               / sqrt((n * pii - si * si)
                                      * (n * pjj - sj * sj)), 6) + 0.0
               END AS corr
        FROM (
            {" UNION ALL ".join(
                f"SELECT {i} AS i, {j} AS j, n, s{i} AS si, s{j} AS sj,"
                f" p{i}_{i} AS pii, p{j}_{j} AS pjj, p{i}_{j} AS pij FROM m"
                for i in range(len(_CORR_COLS))
                for j in range(len(_CORR_COLS)) if i <= j)}
        )
    """,
    defer=True,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E223: ClickHouse ``corrMatrix`` (24.1) — the pairwise Pearson
    correlation matrix of N numeric columns in ONE pass: a single
    partial+final agg carries the N sums and N(N+1)/2 product sums
    (fixed 15-value state here), then the d²-scale finish unpivots the
    upper triangle — the multi-column generalization of E121's
    scalar covariance aggregates, and the input to any feature-redundancy
    screen.

    Determinism is the covariance convention: products computed once in
    double, summed as DECIMAL(38,18) (exact + associative at any
    parallelism), the closing formula running the identical IEEE
    sequence on both engines; degenerate (zero-variance) pairs emit
    NULL. Output exploded to scalar (i, j, corr) rows — matrix cells
    are driver-hashable, array cells are not.
    """
    li = load(spark, sf_dir, "lineitem")
    k = len(_CORR_COLS)

    def dec(e):
        return e.cast("decimal(38,18)")

    aggs = [F.count("*").cast("double").alias("n")]
    aggs += [F.sum(dec(F.col(c))).cast("double").alias(f"s{i}")
             for i, c in enumerate(_CORR_COLS)]
    aggs += [F.sum(dec(F.col(a) * F.col(b))).cast("double")
             .alias(f"p{i}_{j}")
             for i, a in enumerate(_CORR_COLS)
             for j, b in enumerate(_CORR_COLS) if i <= j]
    # ONE corpus pass: collect the 15-value moment state (model-sized),
    # then unpivot the triangle over a literal VALUES relation — a
    # 10-way union of selects over the agg would re-run the corpus agg
    # per cell (Catalyst does not dedupe common subplans)
    mrow = li.agg(*aggs).collect()[0]
    from clickhouse_mergetree_spark.tables import values_df
    rows = [(i, j, mrow["n"], mrow[f"s{i}"], mrow[f"s{j}"],
             mrow[f"p{i}_{i}"], mrow[f"p{j}_{j}"], mrow[f"p{i}_{j}"])
            for i in range(k) for j in range(i, k)]
    cells = values_df(spark, rows, [
        ("i", "int"), ("j", "int"), ("n", "double"),
        ("si", "double"), ("sj", "double"), ("pii", "double"),
        ("pjj", "double"), ("pij", "double")])
    n, si, sj = F.col("n"), F.col("si"), F.col("sj")
    pii, pjj, pij = F.col("pii"), F.col("pjj"), F.col("pij")
    den2 = (n * pii - si * si) * (n * pjj - sj * sj)
    corr = F.when(den2 > 0,
                  F.round((n * pij - si * sj) / F.sqrt(den2), 6)
                  + F.lit(0.0))
    return cells.select("i", "j", corr.alias("corr"))
