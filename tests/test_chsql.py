"""ClickHouse SELECT-dialect translator: string-level rule tests plus
end-to-end runs against DuckDB recomputing the same semantics in plain
SQL (an independent formulation — the translator is never trusted to
check itself)."""

from __future__ import annotations

import pytest

from clickhouse_mergetree_spark.chsql import ch_sql, translate_select


# ---------------------------------------------------------------------------
# string-level rules
# ---------------------------------------------------------------------------

CASES = [
    ("SELECT countIf(value > 5) FROM events",
     "SELECT count_if(value > 5) FROM events"),
    ("SELECT sumIf(value, event_type = 'click') FROM events",
     # coalesce: ClickHouse sumIf over zero matching rows is 0, not NULL
     "SELECT coalesce(sum(if(event_type = 'click', value, NULL)), 0) "
     "FROM events"),
    ("SELECT quantile(0.9)(value) FROM events",
     "SELECT percentile(value, 0.9) FROM events"),
    ("SELECT quantiles(0.5, 0.9)(value) FROM events",
     "SELECT percentile(value, array(0.5, 0.9)) FROM events"),
    ("SELECT multiIf(a > 1, 'x', a > 0, 'y', 'z') FROM t",
     "SELECT CASE WHEN a > 1 THEN 'x' WHEN a > 0 THEN 'y' "
     "ELSE 'z' END FROM t"),
    ("SELECT toStartOfDay(ts), toYYYYMM(ts) FROM events",
     "SELECT date_trunc('day', ts), "
     "CAST(date_format(ts, 'yyyyMM') AS INT) FROM events"),
    ("SELECT toQuarterOfYear(ts) FROM events",
     None),  # unknown fn passes through untouched (Spark errors loudly)
    ("SELECT toStartOfMonth(ts) FROM events",
     "SELECT date_trunc('month', ts) FROM events"),
    ("SELECT toUInt32(value), toString(user_id) FROM events",
     "SELECT CAST(value AS bigint), CAST(user_id AS string) FROM events"),
    ("SELECT argMax(event_type, ts) FROM events",
     "SELECT max_by(event_type, ts) FROM events"),
    ("SELECT groupArray(event_type) FROM events",
     "SELECT collect_list(event_type) FROM events"),
    ("SELECT uniq(user_id), uniqExact(user_id) FROM events",
     "SELECT approx_count_distinct(user_id), count(DISTINCT user_id) "
     "FROM events"),
    ("SELECT intDiv(user_id, 7), modulo(user_id, 7) FROM events",
     "SELECT (user_id DIV 7), (user_id % 7) FROM events"),
    ("SELECT splitByChar(',', props) FROM events",
     "SELECT split(props, ',') FROM events"),
    ("SELECT position(props, 'k') FROM events",
     "SELECT instr(props, 'k') FROM events"),
    # nested dialect calls translate bottom-up
    ("SELECT sumIf(toFloat64(value), toYear(ts) = 2024) FROM events",
     "SELECT coalesce(sum(if(year(ts) = 2024, CAST(value AS double), "
     "NULL)), 0) FROM events"),
    # PREWHERE merges into WHERE
    ("SELECT count() FROM events PREWHERE user_id < 5",
     "SELECT count(*) FROM events WHERE user_id < 5"),
    # FORMAT / SETTINGS suffixes stripped
    ("SELECT 1 FORMAT JSONEachRow", "SELECT 1"),
    ("SELECT 1 SETTINGS max_threads = 4", "SELECT 1"),
    ("SELECT user_id GLOBAL IN (SELECT user_id FROM events) FROM events",
     "SELECT user_id IN (SELECT user_id FROM events) FROM events"),
    # quote safety: function names inside string literals untouched
    ("SELECT 'uniq(x)' FROM t", "SELECT 'uniq(x)' FROM t"),
]


@pytest.mark.parametrize("src,expected", CASES)
def test_translate_rules(src, expected):
    got = translate_select(src)
    if expected is not None:
        assert got == expected, got
    else:
        assert "toQuarterOfYear(ts)" in got  # untouched passthrough


def test_prewhere_and_where_conjoin():
    got = translate_select(
        "SELECT count() FROM events PREWHERE user_id < 5 "
        "WHERE event_type = 'click' GROUP BY user_id")
    assert "WHERE (user_id < 5) AND (event_type = 'click')" in got
    assert "PREWHERE" not in got


@pytest.mark.parametrize("sql,frag", [
    ("SELECT x FROM t LIMIT 3 BY user_id", "LIMIT n BY"),
    ("SELECT x FROM t SAMPLE 0.1", "SAMPLE"),
    ("SELECT x FROM t FINAL", "FINAL"),
    ("SELECT a ASOF JOIN b ON a.k = b.k AND a.t >= b.t", "ASOF"),
    ("SELECT topK(3)(x) FROM t", "topK"),
])
def test_refusals_are_loud(sql, frag):
    # the STRING translator refuses these; ch_sql / ClickHouseSession
    # route them as DataFrame plans (tested end-to-end below)
    with pytest.raises(ValueError, match="no (?:1:1 Spark translation|exact)"):
        translate_select(sql)


def test_with_totals_translates_to_grouping_sets():
    got = translate_select(
        "SELECT event_type, sum(value) FROM events "
        "GROUP BY event_type WITH TOTALS")
    assert "GROUP BY GROUPING SETS ((event_type), ())" in got
    assert "TOTALS" not in got
    got2 = translate_select(
        "SELECT a, b, count() FROM t GROUP BY a, b WITH TOTALS")
    assert "GROUPING SETS ((a, b), ())" in got2


def test_multiif_arity_checked():
    with pytest.raises(ValueError, match="odd argument count"):
        translate_select("SELECT multiIf(a, b) FROM t")


# ---------------------------------------------------------------------------
# end-to-end: translated CH SQL on Spark == plain SQL on DuckDB
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    # use the shared registrar (and do NOT drop at teardown): other test
    # modules and the plan-shape lints rely on the same session views,
    # and register_views memoizes per session — a drop here left the
    # memo stale and broke every later register_views caller (caught by
    # the full-suite order interaction, r7)
    from clickhouse_mergetree_spark.tables import register_views

    register_views(spark, sf_dir)
    yield


def test_ch_aggregate_query_end_to_end(spark, duck, views):
    got = {
        (r["day"].isoformat(), r["event_type"]):
            (r["n_big"], round(r["med"], 6), r["top_user"])
        for r in ch_sql(spark, """
            SELECT toDate(toStartOfDay(ts)) AS day, event_type,
                   countIf(value > 50) AS n_big,
                   quantile(0.5)(value) AS med,
                   argMax(user_id, value) AS top_user
            FROM events
            PREWHERE user_id < 40
            GROUP BY day, event_type
            SETTINGS max_threads = 8
        """).collect()
    }
    exp = {
        (str(r[0]), r[1]): (r[2], round(r[3], 6), r[4])
        for r in duck.execute("""
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
                   count(*) FILTER (value > 50) AS n_big,
                   quantile_cont(value, 0.5) AS med,
                   arg_max(user_id, value) AS top_user
            FROM events WHERE user_id < 40
            GROUP BY day, event_type
        """).fetchall()
    }
    assert set(got) == set(exp)
    for k, (n, med, top) in exp.items():
        assert got[k][0] == n, k
        # percentile (exact interpolated) == quantile_cont
        assert abs(got[k][1] - med) < 1e-6, k
        assert got[k][2] == top, k


def test_ch_scalar_query_end_to_end(spark, duck, views):
    got = {r["user_id"]: (r["b"], r["m"]) for r in ch_sql(spark, """
        SELECT user_id,
               multiIf(value > 75, 'hi', value > 25, 'mid', 'lo') AS b,
               modulo(toUInt64(user_id), 7) AS m
        FROM events WHERE event_id < 50
    """).collect()}
    exp = {r[0]: (r[1], r[2]) for r in duck.execute("""
        SELECT user_id,
               CASE WHEN value > 75 THEN 'hi'
                    WHEN value > 25 THEN 'mid' ELSE 'lo' END AS b,
               CAST(user_id AS BIGINT) % 7 AS m
        FROM events WHERE event_id < 50
    """).fetchall()}
    assert got == exp


def test_ch_arrayjoin_end_to_end(spark, views):
    rows = ch_sql(spark, """
        SELECT user_id, arrayJoin(splitByChar(',', props)) AS piece
        FROM events WHERE event_id < 3
    """).collect()
    raw = spark.sql(
        "SELECT props FROM events WHERE event_id < 3").collect()
    expected_pieces = sum(len(r["props"].split(",")) for r in raw)
    assert len(rows) == expected_pieces


def test_translate_lambda_array_functions():
    from clickhouse_mergetree_spark.chsql import translate_select

    got = translate_select(
        "SELECT arrayMap(x -> x * 2, xs) AS m, "
        "arrayFilter(x -> x > 1, xs) AS f, "
        "arrayExists(x -> x = 3, xs) AS e, "
        "arrayAll(x -> x > 0, xs) AS a, "
        "arrayCount(x -> x > 1, xs) AS c, "
        "arrayFirst(x -> x > 1, xs) AS fst, "
        "arraySum(xs) AS s1, arraySum(x -> x * x, xs) AS s2 FROM t")
    assert "transform(xs, x -> x * 2)" in got
    assert "filter(xs, x -> x > 1)" in got
    assert "exists(xs, x -> x = 3)" in got
    assert "forall(xs, x -> x > 0)" in got
    assert "size(filter(xs, x -> x > 1))" in got
    assert "try_element_at(filter(xs, x -> x > 1), 1)" in got
    assert "aggregate(xs, CAST(0 AS DOUBLE), (acc, x) -> acc + x)" in got
    assert ("aggregate(transform(xs, x -> x * x), CAST(0 AS DOUBLE), "
            "(acc, x) -> acc + x)") in got


def test_lambda_array_functions_refuse_wrong_arity():
    import pytest

    from clickhouse_mergetree_spark.chsql import translate_select

    with pytest.raises(ValueError, match="arrayCount"):
        translate_select("SELECT arrayCount(xs) FROM t")
    with pytest.raises(ValueError, match="2-argument"):
        translate_select("SELECT arrayMap(xs) FROM t")


def test_translate_string_date_json_functions(spark, sf_dir):
    from clickhouse_mergetree_spark.chsql import translate_select

    got = translate_select(
        "SELECT startsWith(s, 'a') AS a, trimBoth(s) AS b, "
        "replaceAll(s, 'x', 'y') AS c, "
        "replaceRegexpAll(s, '[0-9]+', '#') AS d, "
        "dateDiff('day', t1, t2) AS e, "
        "formatDateTime(t1, '%Y-%m-%d %H:%M:%S') AS f, "
        "JSONExtractString(j, 'name') AS g, "
        "JSONExtractInt(j, 'size') AS h, "
        "isNull(s) AS i2, isNotNull(s) AS j2 FROM t")
    assert "startswith(s, 'a')" in got
    assert "trim(s)" in got
    assert "replace(s, 'x', 'y')" in got
    assert "regexp_replace(s, '[0-9]+', '#')" in got
    assert "timestampdiff(DAY, t1, t2)" in got
    assert "date_format(t1, 'yyyy-MM-dd HH:mm:ss')" in got
    assert "get_json_object(j, '$.name')" in got
    assert "CAST(get_json_object(j, '$.size') AS BIGINT)" in got
    assert "(s IS NULL)" in got and "(s IS NOT NULL)" in got
    # the translated expressions must actually RUN as Spark SQL
    from clickhouse_mergetree_spark.chsql import ch_sql
    from clickhouse_mergetree_spark.tables import register_views
    register_views(spark, sf_dir)
    row = ch_sql(spark, """
        SELECT formatDateTime(ts, '%Y-%m') AS ym,
               dateDiff('hour', ts, ts) AS zero_h,
               JSONExtractString('{"name":"x"}', 'name') AS nm
        FROM events LIMIT 1
    """).collect()
    # register_views happened in other tests; ensure independent here
    assert row == [] or (row[0]["zero_h"] == 0 and row[0]["nm"] == "x")


def test_translate_refuses_dynamic_arguments():
    import pytest

    from clickhouse_mergetree_spark.chsql import translate_select

    with pytest.raises(ValueError, match="literal unit"):
        translate_select("SELECT dateDiff(u, a, b) FROM t")
    with pytest.raises(ValueError, match="literal key"):
        translate_select("SELECT JSONExtractString(j, k) FROM t")
    with pytest.raises(ValueError, match="literal format"):
        translate_select("SELECT formatDateTime(t, f) FROM t")
    with pytest.raises(ValueError, match="no 1:1 Java format"):
        translate_select("SELECT formatDateTime(t, '%Q') FROM t")


def test_translate_stat_aggregates():
    from clickhouse_mergetree_spark.chsql import translate_select

    got = translate_select(
        "SELECT median(v) AS m, stddevPop(v) AS sp, varSamp(v) AS vs, "
        "covarPop(a, b) AS cp, corr(a, b) AS r FROM t GROUP BY g")
    assert "percentile(v, 0.5)" in got
    assert "stddev_pop(v)" in got and "var_samp(v)" in got
    assert "covar_pop(a, b)" in got and "corr(a, b)" in got


def test_every_rename_translation_parses_in_spark(spark):
    """Safety net over the whole rename/cast/trunc tables: each
    translated call must at least PARSE as Spark SQL (catalyst analysis
    against a typed dummy view) — catches rename-table typos and
    arity drift without hand-writing a case per function."""
    from clickhouse_mergetree_spark import chsql

    spark.sql(
        "SELECT 'a,b' AS s, 1.5d AS x, 7L AS i, "
        "CAST('2024-01-02 03:04:05' AS TIMESTAMP) AS ts_c, "
        "array(1, 2) AS arr"
    ).createOrReplaceTempView("chsql_parse_probe")
    # (ch_name, args) — typed so analysis succeeds, not just parsing
    arg_for = {
        "todate": "ts_c", "todatetime": "s", "toyear": "ts_c",
        "tomonth": "ts_c", "todayofmonth": "ts_c", "todayofweek": "ts_c",
        "tohour": "ts_c", "tominute": "ts_c", "tosecond": "ts_c",
        "grouparray": "i", "groupargray": "i", "groupuniqarray": "i",
        "uniq": "i", "any": "i", "anylast": "i",
        "argmax": "i, x", "argmin": "i, x",
        "has": "arr, 1", "indexof": "arr, 1", "arrayelement": "arr, 1",
        "arraysort": "arr", "arrayreverse": "arr",
        "arrayconcat": "arr, arr", "arrayuniq": "arr",
        "arrayflatten": "array(arr)",
        "lengthutf8": "s", "lowerutf8": "s", "upperutf8": "s",
        "lcase": "s", "ucase": "s", "position": "s, 'a'",
        "ifnull": "s, 'd'", "startswith": "s, 'a'", "endswith": "s, 'a'",
        "trimboth": "s", "trimleft": "s", "trimright": "s",
        "replaceall": "s, 'a', 'b'",
        "replaceregexpall": "s, 'a', 'b'",
        "tounixtimestamp": "ts_c", "fromunixtimestamp": "i",
        "stddevpop": "x", "stddevsamp": "x", "varpop": "x",
        "varsamp": "x", "covarpop": "x, x", "covarsamp": "x, x",
        "corr": "x, x", "assumenotnull": "s",
        "toquarter": "ts_c", "todayofyear": "ts_c", "todate32": "ts_c",
        "arraymin": "arr", "arraymax": "arr", "arrayslice": "arr, 1, 1",
        "arraypushback": "arr, 3", "arraypushfront": "arr, 3",
        "arrayintersect": "arr, arr",
        "leftpad": "s, 5, ' '", "rightpad": "s, 5, ' '",
        "concatwithseparator": "'-', s, s", "substringutf8": "s, 1, 2",
    }
    missing = set(chsql._RENAMES) - set(arg_for)
    assert not missing, f"add probe args for {missing}"
    for low, args in arg_for.items():
        sql = chsql.translate_select(
            f"SELECT {low}({args}) AS r FROM chsql_parse_probe")
        spark.sql(sql).schema  # forces full catalyst analysis
    for low in chsql._TRUNC:
        spark.sql(chsql.translate_select(
            f"SELECT {low}(ts_c) AS r FROM chsql_parse_probe")).schema
    for low in chsql._CASTS:
        spark.sql(chsql.translate_select(
            f"SELECT {low}(i) AS r FROM chsql_parse_probe")).schema
    spark.catalog.dropTempView("chsql_parse_probe")


def test_round8_dispatch_batch(spark):
    """Date arithmetic, bit ops, array ops, split variants, YYYYMM keys:
    each new dispatch must analyze AND evaluate correctly."""
    from clickhouse_mergetree_spark.chsql import ch_sql, translate_select

    got = translate_select(
        "SELECT addDays(t, 3) AS a, subtractHours(t, 2) AS b, "
        "dateAdd(QUARTER, 1, t) AS c, dateSub('day', 7, t) AS d, "
        "bitAnd(i, 6) AS e, bitShiftLeft(i, 2) AS f, bitNot(i) AS g, "
        "toYYYYMM(t) AS h, arrayAvg(xs) AS i2, arrayEnumerate(xs) AS j, "
        "arrayPopBack(xs) AS k, hasAll(xs, needles) AS l, "
        "splitByString('::', s) AS m, splitByWhitespace(s) AS n2 "
        "FROM t")
    assert "timestampadd(DAY, 3, t)" in got
    assert "timestampadd(HOUR, -(2), t)" in got
    assert "timestampadd(QUARTER, 1, t)" in got
    assert "timestampadd(DAY, -(7), t)" in got
    assert "(i & 6)" in got and "(i << 2)" in got and "(~i)" in got
    assert "CAST(date_format(t, 'yyyyMM') AS INT)" in got
    assert "sequence(1, size(xs))" in got
    assert "slice(xs, 1, greatest(size(xs) - 1, 0))" in got
    assert "forall(needles, x -> array_contains(xs, x))" in got
    row = ch_sql(spark, """
        SELECT addDays(CAST('2024-01-30 00:00:00' AS TIMESTAMP), 3) AS a,
               toYYYYMM(CAST('2024-03-05' AS DATE)) AS ym,
               bitXor(12, 10) AS bx,
               arrayAvg(array(1, 2, 3, 6)) AS av,
               arrayPopFront(array(7, 8, 9)) AS pf,
               hasAny(array(1, 2), array(5, 2)) AS ha,
               splitByString('::', 'a::b::c') AS sp,
               leftPad('7', 3, '0') AS lp
    """).collect()[0]
    assert str(row["a"]).startswith("2024-02-02")
    assert row["ym"] == 202403
    assert row["bx"] == 6
    assert row["av"] == 3.0
    assert list(row["pf"]) == [8, 9]
    assert row["ha"] is True
    assert list(row["sp"]) == ["a", "b", "c"]
    assert row["lp"] == "007"


def test_arraystringconcat_optional_separator():
    from clickhouse_mergetree_spark.chsql import translate_select

    assert translate_select("SELECT arrayStringConcat(a) FROM t") \
        == "SELECT array_join(a, '') FROM t"
    assert translate_select("SELECT arrayStringConcat(a, '-') FROM t") \
        == "SELECT array_join(a, '-') FROM t"


def test_with_totals_end_to_end(spark, duck, views):
    got = {(r["event_type"],): (r["n"], round(r["s"], 4))
           for r in ch_sql(spark, """
               SELECT event_type, count() AS n,
                      sumIf(value, value > 10) AS s
               FROM events GROUP BY event_type WITH TOTALS
           """).collect()}
    exp = {(r[0],): (r[1], round(r[2], 4)) for r in duck.execute("""
        SELECT event_type, count(*) AS n,
               coalesce(sum(value) FILTER (value > 10), 0) AS s
        FROM events GROUP BY GROUPING SETS ((event_type), ())
    """).fetchall()}
    assert got == exp
    assert (None,) in got  # the TOTALS row rode the same aggregate


def test_limit_by_end_to_end(spark, duck, views):
    got = [(r["user_id"], r["event_id"]) for r in ch_sql(spark, """
        SELECT user_id, event_id, value FROM events
        ORDER BY value DESC, event_id ASC
        LIMIT 2 BY user_id
        LIMIT 10
    """).collect()]
    exp = [(r[0], r[1]) for r in duck.execute("""
        SELECT user_id, event_id FROM (
            SELECT user_id, event_id, value, row_number() OVER (
                PARTITION BY user_id ORDER BY value DESC, event_id ASC
            ) AS rn FROM events
        ) WHERE rn <= 2 ORDER BY value DESC, event_id ASC LIMIT 10
    """).fetchall()]
    assert got == exp


def test_limit_by_expression_group(spark, duck, views):
    # BY on a dialect expression, no outer LIMIT
    got = sorted((r["g"], r["event_id"]) for r in ch_sql(spark, """
        SELECT modulo(user_id, 3) AS g, event_id FROM events
        ORDER BY event_id LIMIT 1 BY g
    """).collect())
    exp = sorted((r[0], r[1]) for r in duck.execute("""
        SELECT g, event_id FROM (
            SELECT user_id % 3 AS g, event_id, row_number() OVER (
                PARTITION BY user_id % 3 ORDER BY event_id) AS rn
            FROM events
        ) WHERE rn <= 1
    """).fetchall())
    assert got == exp


@pytest.fixture()
def asof_views(spark, duck, views):
    # clicks probe stream + per-(user, ts) deduped purchase quotes, on
    # BOTH engines, so ties can't make either engine's pick ambiguous
    clicks = ("SELECT event_id, user_id, ts, value FROM events "
              "WHERE event_type = 'click'")
    purch = ("SELECT user_id, ts, max(value) AS pval FROM events "
             "WHERE event_type = 'purchase' GROUP BY user_id, ts")
    spark.sql(clicks).createOrReplaceTempView("asof_clicks")
    spark.sql(purch).createOrReplaceTempView("asof_purch")
    duck.execute(f"CREATE OR REPLACE VIEW asof_clicks AS {clicks}")
    duck.execute(f"CREATE OR REPLACE VIEW asof_purch AS {purch}")
    yield
    duck.execute("DROP VIEW asof_clicks")
    duck.execute("DROP VIEW asof_purch")


def test_asof_left_join_end_to_end(spark, duck, asof_views):
    got = {r["event_id"]: r["pval"] for r in ch_sql(spark, """
        SELECT c.event_id, p.pval
        FROM asof_clicks c ASOF LEFT JOIN asof_purch p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    """).collect()}
    exp = {r[0]: r[1] for r in duck.execute("""
        SELECT c.event_id, p.pval
        FROM asof_clicks c ASOF LEFT JOIN asof_purch p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    """).fetchall()}
    assert got == exp
    assert any(v is None for v in got.values())  # LEFT kept unmatched


def test_asof_inner_join_strict_end_to_end(spark, duck, asof_views):
    # strict backward (>) drops equal-ts matches; INNER drops unmatched.
    # DuckDB's ASOF supports only >=, so the oracle shifts: a.ts > b.ts
    # over integer-microsecond timestamps == a.ts >= b.ts + 1us.
    got = {r["event_id"]: r["pval"] for r in ch_sql(spark, """
        SELECT c.event_id, p.pval
        FROM asof_clicks c ASOF JOIN asof_purch p
        ON c.user_id = p.user_id AND c.ts > p.ts
    """).collect()}
    exp = {r[0]: r[1] for r in duck.execute("""
        WITH shifted AS (
            SELECT user_id, ts + INTERVAL 1 MICROSECOND AS ts, pval
            FROM asof_purch
        )
        SELECT c.event_id, p.pval
        FROM asof_clicks c ASOF JOIN shifted p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    """).fetchall()}
    assert got == exp


def test_with_fill_end_to_end(spark, duck, views):
    got = [(r["user_id"], r["n"]) for r in ch_sql(spark, """
        SELECT user_id, count() AS n FROM events
        WHERE user_id < 20 GROUP BY user_id
        ORDER BY user_id WITH FILL FROM 0 TO 25
    """).collect()]
    exp = [(r[0], r[1]) for r in duck.execute("""
        WITH base AS (
            SELECT user_id, count(*) AS n FROM events
            WHERE user_id < 20 GROUP BY user_id
        )
        SELECT a.u AS user_id, coalesce(b.n, 0) AS n
        FROM (SELECT unnest(generate_series(0, 24)) AS u) a
        LEFT JOIN base b ON b.user_id = a.u
        UNION ALL
        SELECT user_id, n FROM base WHERE user_id NOT BETWEEN 0 AND 24
        ORDER BY user_id
    """).fetchall()]
    assert got == exp
    assert len(got) >= 25  # the axis, plus any out-of-range originals


def test_with_fill_derived_bounds_and_step(spark, duck, views):
    got = [(r["b"], r["n"]) for r in ch_sql(spark, """
        SELECT intDiv(user_id, 10) * 10 AS b, count() AS n FROM events
        WHERE modulo(user_id, 10) = 3 GROUP BY b
        ORDER BY b WITH FILL STEP 10
    """).collect()]
    # derived bounds: every multiple of 10 between observed min and max
    bs = [b for b, _ in got]
    assert bs == sorted(bs)
    assert bs == list(range(bs[0], bs[-1] + 1, 10))
    nz = {b: n for b, n in got if n != 0}
    exp = {r[0]: r[1] for r in duck.execute("""
        SELECT (user_id // 10) * 10 AS b, count(*) AS n FROM events
        WHERE user_id % 10 = 3 GROUP BY b
    """).fetchall()}
    assert nz == exp


def test_with_fill_refuses_unsupported_shapes():
    with pytest.raises(ValueError, match="no 1:1|WITH FILL"):
        translate_select("SELECT x FROM t ORDER BY x WITH FILL")
    from clickhouse_mergetree_spark.chsql import _run_with_fill
    with pytest.raises(ValueError, match="unsupported WITH FILL"):
        _run_with_fill(None, "SELECT x FROM t ORDER BY x DESC WITH FILL")


def test_composed_routes_limit_by_over_totals(spark, duck, views):
    # WITH TOTALS inside a LIMIT BY query: both routes compose
    got = sorted((tuple(r) for r in ch_sql(spark, """
        SELECT event_type, count() AS n FROM events
        GROUP BY event_type WITH TOTALS
        ORDER BY n DESC, event_type LIMIT 1 BY modulo(n, 2)
    """).collect()), key=repr)
    exp = sorted((tuple(r) for r in duck.execute("""
        SELECT event_type, n FROM (
            SELECT event_type, n, row_number() OVER (
                PARTITION BY n % 2 ORDER BY n DESC, event_type) AS rn
            FROM (SELECT event_type, count(*) AS n FROM events
                  GROUP BY GROUPING SETS ((event_type), ()))
        ) WHERE rn <= 1
    """).fetchall()), key=repr)
    assert got == exp


def test_composed_routes_asof_then_limit_by(spark, duck, asof_views):
    # ASOF JOIN inside a LIMIT BY query: the LIMIT BY route recurses
    # into ch_sql, which routes the ASOF plan
    got = sorted(tuple(r) for r in ch_sql(spark, """
        SELECT c.event_id, c.user_id, p.pval
        FROM asof_clicks c ASOF JOIN asof_purch p
        ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY p.pval DESC, c.event_id LIMIT 1 BY c.user_id
    """).collect())
    exp = sorted(tuple(r) for r in duck.execute("""
        SELECT event_id, user_id, pval FROM (
            SELECT c.event_id, c.user_id, p.pval, row_number() OVER (
                PARTITION BY c.user_id ORDER BY p.pval DESC, c.event_id
            ) AS rn
            FROM asof_clicks c ASOF JOIN asof_purch p
            ON c.user_id = p.user_id AND c.ts >= p.ts
        ) WHERE rn <= 1
    """).fetchall())
    assert got == exp


def test_topk_route_end_to_end(spark, duck, views):
    got = {r["user_id"]: list(r["top_types"]) for r in ch_sql(spark, """
        SELECT user_id, topK(2)(event_type) AS top_types
        FROM events WHERE user_id < 10 GROUP BY user_id
    """).collect()}
    exp = {}
    for uid, et in duck.execute("""
        SELECT user_id, event_type FROM (
            SELECT user_id, event_type, count(*) AS c, row_number() OVER (
                PARTITION BY user_id ORDER BY count(*) DESC, event_type
            ) AS rn FROM events WHERE user_id < 10
            GROUP BY user_id, event_type
        ) WHERE rn <= 2 ORDER BY user_id, rn
    """).fetchall():
        exp.setdefault(uid, []).append(et)
    assert got == exp


def test_topk_route_global_and_weighted(spark, duck, views):
    got = ch_sql(spark, "SELECT topK(3)(event_type) FROM events") \
        .collect()[0]["topk"]
    exp = [r[0] for r in duck.execute("""
        SELECT event_type FROM events GROUP BY event_type
        ORDER BY count(*) DESC, event_type LIMIT 3
    """).fetchall()]
    assert list(got) == exp
    gotw = ch_sql(spark, """
        SELECT topKWeighted(2)(event_type, value) AS tw FROM events
    """).collect()[0]["tw"]
    expw = [r[0] for r in duck.execute("""
        SELECT event_type FROM events GROUP BY event_type
        ORDER BY sum(value) DESC, event_type LIMIT 2
    """).fetchall()]
    assert list(gotw) == expw


def test_topk_route_refuses_mixed_aggregates(spark, views):
    with pytest.raises(ValueError, match="non-key select item"):
        ch_sql(spark, "SELECT user_id, count() AS n, "
                      "topK(2)(event_type) AS t "
                      "FROM events GROUP BY user_id")


def test_asof_join_plan_has_no_range_join(spark, asof_views):
    df = ch_sql(spark, """
        SELECT c.event_id, p.pval
        FROM asof_clicks c ASOF LEFT JOIN asof_purch p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    """)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_clickhouse_session_runbook(spark, tmp_path):
    """A CH runbook executes top-to-bottom through one router: CREATE,
    INSERTs, ALTER, OPTIMIZE, dialect SELECT observing the writes,
    DESCRIBE, DROP."""
    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    sess = ClickHouseSession(spark, str(tmp_path))
    sess.execute("""
        CREATE TABLE kv (
            k String,
            ts UInt64,
            score Float64
        ) ENGINE = MergeTree() ORDER BY (k, ts)
    """)
    sess.execute("INSERT INTO kv VALUES ('a', 1, 1.5), ('b', 2, 2.5)")
    sess.execute("INSERT INTO kv VALUES ('a', 3, 9.0)")
    sess.execute("ALTER TABLE kv ADD COLUMN boost Float64 DEFAULT 1.0")
    sess.execute("OPTIMIZE TABLE kv FINAL")
    rows = {r["k"]: r for r in sess.execute(
        "SELECT k, argMax(score, ts) AS last_score, "
        "sumIf(boost, score > 2) AS hot_boost "
        "FROM kv GROUP BY k").collect()}
    # dedup mode: (a,3) supersedes (a,1)
    assert rows["a"]["last_score"] == 9.0
    assert rows["b"]["last_score"] == 2.5
    desc = {r["name"] for r in sess.execute("DESCRIBE TABLE kv").collect()}
    assert desc == {"k", "ts", "score", "boost"}
    sess.execute("DROP TABLE kv")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown table"):
        sess.execute("OPTIMIZE TABLE kv")


def test_clickhouse_session_routes_all_dialect_constructs(spark, tmp_path):
    """The five constructs the translator refuses all execute through
    the session router: FINAL, SAMPLE, LIMIT n BY, WITH TOTALS, ASOF
    JOIN — the statements a migrating ClickHouse dashboard actually
    contains, pasted unchanged."""
    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    sess = ClickHouseSession(spark, str(tmp_path))
    sess.execute("""
        CREATE TABLE quotes (
            sym String,
            ts UInt64,
            px Float64
        ) ENGINE = MergeTree() ORDER BY (sym, ts) SAMPLE BY sym
    """)
    sess.execute(
        "INSERT INTO quotes VALUES "
        "('a', 10, 1.0), ('a', 20, 2.0), ('a', 20, 9.0), "
        "('b', 10, 5.0), ('b', 30, 6.0), ('c', 15, 7.0)")
    sess.execute("""
        CREATE TABLE trades (
            sym String,
            ts UInt64,
            qty Float64
        ) ENGINE = MergeTree() ORDER BY (sym, ts)
    """)
    sess.execute(
        "INSERT INTO trades VALUES "
        "('a', 15, 100.0), ('a', 25, 200.0), ('b', 5, 50.0), "
        "('d', 40, 75.0)")

    # FINAL: engine reads always collapse -> (a,20) deduped to one row
    rows = sess.execute(
        "SELECT sym, ts, px FROM quotes FINAL WHERE sym = 'a' "
        "ORDER BY ts").collect()
    assert [(r["sym"], r["ts"]) for r in rows] == [("a", 10), ("a", 20)]
    assert rows[1]["px"] == 2.0  # (key, ts) dedup is first-wins (R14)

    # WITH TOTALS: per-sym rows + one grand-total row (NULL key)
    tot = {r["sym"]: r["n"] for r in sess.execute(
        "SELECT sym, count() AS n FROM quotes GROUP BY sym WITH TOTALS"
    ).collect()}
    assert tot[None] == tot["a"] + tot["b"] + tot["c"]

    # LIMIT n BY: top-1 quote per symbol by price
    top = {r["sym"]: r["px"] for r in sess.execute(
        "SELECT sym, px FROM quotes ORDER BY px DESC LIMIT 1 BY sym"
    ).collect()}
    assert top == {"a": 2.0, "b": 6.0, "c": 7.0}  # (a,20,9.0) deduped away

    # SAMPLE f: deterministic SAMPLE BY bucket read — a strict subset
    # of symbols, every row of a kept symbol in or out together
    full = {r["sym"] for r in sess.execute(
        "SELECT sym FROM quotes").collect()}
    half = [r for r in sess.execute(
        "SELECT sym, count() AS n FROM quotes SAMPLE 0.5 GROUP BY sym"
    ).collect()]
    per_sym = {r["sym"]: r["n"] for r in sess.execute(
        "SELECT sym, count() AS n FROM quotes GROUP BY sym").collect()}
    assert {r["sym"] for r in half} < full
    for r in half:  # whole entities sampled, never partial rows
        assert r["n"] == per_sym[r["sym"]]

    # ASOF JOIN: latest trade at-or-before each quote tick
    asof = {(r["sym"], r["ts"]): r["qty"] for r in sess.execute("""
        SELECT q.sym, q.ts, t.qty
        FROM quotes q ASOF LEFT JOIN trades t
        ON q.sym = t.sym AND q.ts >= t.ts
    """).collect()}
    assert asof[("a", 10)] is None        # no trade yet at ts=10
    assert asof[("a", 20)] == 100.0       # trade@15 is latest <= 20
    assert asof[("b", 30)] == 50.0        # trade@5
    assert asof[("c", 15)] is None        # sym never traded

    # INSERT INTO ... SELECT keeps the CH dialect (countIf + LIMIT BY
    # route) — the MV-backfill statement every migration runbook has
    sess.execute("""
        CREATE TABLE summary (
            sym String,
            ts UInt64,
            n_hot UInt64
        ) ENGINE = MergeTree() ORDER BY (sym, ts)
    """)
    sess.execute("""
        INSERT INTO summary
        SELECT sym, max(ts) AS ts, countIf(px > 5) AS n_hot
        FROM quotes GROUP BY sym
    """)
    summ = {r["sym"]: r["n_hot"] for r in sess.execute(
        "SELECT sym, n_hot FROM summary").collect()}
    assert summ == {"a": 0, "b": 1, "c": 1}

    sess.execute("DROP TABLE summary")
    sess.execute("DROP TABLE quotes")
    sess.execute("DROP TABLE trades")


def test_clickhouse_session_ctas_rename_exists_show(spark, tmp_path):
    """CTAS derives the schema from a dialect SELECT; RENAME/EXISTS/SHOW
    complete the catalog statements a runbook drives."""
    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    sess = ClickHouseSession(spark, str(tmp_path))
    sess.execute("""
        CREATE TABLE raw (
            k String,
            ts UInt64,
            v Float64
        ) ENGINE = MergeTree() ORDER BY (k, ts)
    """)
    sess.execute("INSERT INTO raw VALUES "
                 "('a', 1, 2.0), ('a', 2, 4.0), ('b', 1, 10.0)")
    sess.execute("""
        CREATE TABLE agg ENGINE = MergeTree() ORDER BY (k)
        AS SELECT k, countIf(v > 3) AS n_big, round(sum(v), 4) AS sv
        FROM raw GROUP BY k
    """)
    rows = {r["k"]: (r["n_big"], r["sv"]) for r in sess.execute(
        "SELECT k, n_big, sv FROM agg").collect()}
    assert rows == {"a": (1, 6.0), "b": (1, 10.0)}
    # the CTAS table is a REAL engine table: ALTER + OPTIMIZE work
    sess.execute("ALTER TABLE agg ADD COLUMN tag String DEFAULT 'x'")
    sess.execute("OPTIMIZE TABLE agg FINAL")
    assert {r["tag"] for r in sess.execute(
        "SELECT tag FROM agg").collect()} == {"x"}

    assert sess.execute("EXISTS TABLE agg").collect()[0]["result"] == 1
    assert sess.execute("EXISTS nope").collect()[0]["result"] == 0
    assert {r["name"] for r in sess.execute("SHOW TABLES").collect()} \
        == {"raw", "agg"}
    sess.execute("RENAME TABLE agg TO rollup")
    assert sess.execute("EXISTS TABLE agg").collect()[0]["result"] == 0
    assert sess.execute(
        "SELECT count() AS n FROM rollup").collect()[0]["n"] == 2
    sess.execute("DROP TABLE rollup")
    sess.execute("DROP TABLE raw")


def test_clickhouse_session_explain(spark, tmp_path):
    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    sess = ClickHouseSession(spark, str(tmp_path))
    sess.execute("CREATE TABLE e1 (k String, ts UInt64, v Float64) "
                 "ENGINE = MergeTree() ORDER BY (k, ts)")
    sess.execute("INSERT INTO e1 VALUES ('a', 1, 2.0)")
    lines = [r["explain"] for r in sess.execute(
        "EXPLAIN SELECT k, count() AS n FROM e1 GROUP BY k").collect()]
    assert any("HashAggregate" in ln for ln in lines), lines[:5]
    sess.execute("DROP TABLE e1")


def test_clickhouse_session_dictionary(spark, tmp_path):
    """CREATE DICTIONARY + dictGet/dictGetOrDefault/dictHas in session
    SELECTs: lookups become correlated scalar subqueries Catalyst
    decorrelates into (broadcastable) joins; a dictGet miss returns the
    attribute TYPE's default ('' for String — ClickHouse semantics,
    ADVICE r8) and dictGetOrDefault the explicit default; a source-table
    INSERT re-snapshots the dictionary (the in-session LIFETIME
    reload)."""
    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    sess = ClickHouseSession(spark, str(tmp_path))
    sess.execute("""
        CREATE TABLE countries (
            code String,
            ts UInt64,
            cname String
        ) ENGINE = MergeTree() ORDER BY (code, ts)
    """)
    sess.execute("INSERT INTO countries VALUES "
                 "('us', 1, 'United States'), ('de', 1, 'Germany')")
    sess.execute("""
        CREATE DICTIONARY country_dict (code String, cname String)
        PRIMARY KEY code
        SOURCE(CLICKHOUSE(TABLE 'countries'))
        LAYOUT(FLAT()) LIFETIME(300)
    """)
    sess.execute("""
        CREATE TABLE visits (
            vid UInt64,
            ts UInt64,
            country String
        ) ENGINE = MergeTree() ORDER BY (vid, ts)
    """)
    sess.execute("INSERT INTO visits VALUES "
                 "(1, 1, 'us'), (2, 1, 'de'), (3, 1, 'fr')")
    rows = {r["vid"]: (r["nm"], r["nm_d"], r["known"])
            for r in sess.execute("""
        SELECT vid,
               dictGet('country_dict', 'cname', country) AS nm,
               dictGetOrDefault('country_dict', 'cname', country, '?') AS nm_d,
               dictHas('country_dict', country) AS known
        FROM visits
    """).collect()}
    assert rows[1] == ("United States", "United States", True)
    assert rows[2] == ("Germany", "Germany", True)
    assert rows[3] == ("", "?", False)  # miss -> String type default

    # source insert -> dictionary re-snapshot
    sess.execute("INSERT INTO countries VALUES ('fr', 1, 'France')")
    got = sess.execute(
        "SELECT dictGet('country_dict', 'cname', 'fr') AS nm").collect()
    assert got[0]["nm"] == "France"

    # regression: probe column NAME == dictionary key column name — the
    # correlated reference must bind to the OUTER scope, not capture the
    # dictionary's own column (which would match every row)
    sess.execute("""
        CREATE TABLE collide (
            code String,
            ts UInt64,
            n UInt64
        ) ENGINE = MergeTree() ORDER BY (code, ts)
    """)
    sess.execute("INSERT INTO collide VALUES ('us', 1, 1), ('zz', 1, 2)")
    crows = {r["code"]: r["nm"] for r in sess.execute(
        "SELECT code, dictGetOrDefault('country_dict', 'cname', code, '?')"
        " AS nm FROM collide").collect()}
    assert crows == {"us": "United States", "zz": "?"}
    sess.execute("DROP TABLE collide")

    sess.execute("DROP DICTIONARY country_dict")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="registered dictionary"):
        sess.execute("SELECT dictGet('country_dict', 'cname', 'us') AS x")
    sess.execute("DROP TABLE visits")
    sess.execute("DROP TABLE countries")


def test_clickhouse_session_materialized_view(spark, tmp_path):
    """CREATE MATERIALIZED VIEW routes through the session: the MV is a
    readable/DROPpable table, SELECTs observe rollups from inserts that
    happened AFTER the create (trigger semantics), POPULATE backfills,
    and DROP TABLE mv detaches it (later inserts stop flowing)."""
    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    sess = ClickHouseSession(spark, str(tmp_path))
    sess.execute("""
        CREATE TABLE hits (
            site String,
            ts UInt64,
            n UInt64
        ) ENGINE = MergeTree() ORDER BY (site, ts)
    """)
    sess.execute("INSERT INTO hits VALUES ('a', 1, 10), ('b', 2, 20)")
    sess.execute("""
        CREATE MATERIALIZED VIEW hits_daily
        ENGINE = SummingMergeTree() ORDER BY (site)
        POPULATE
        AS SELECT site, sum(n) AS total FROM hits GROUP BY site
    """)
    # POPULATE saw the pre-create rows; the next insert flows via trigger
    sess.execute("INSERT INTO hits VALUES ('a', 3, 5)")
    rolled = {r["site"]: r["total"] for r in sess.execute(
        "SELECT site, total FROM hits_daily").collect()}
    assert rolled == {"a": 15, "b": 20}
    # DROP detaches: later inserts no longer reach the (dropped) target
    sess.execute("DROP TABLE hits_daily")
    sess.execute("INSERT INTO hits VALUES ('c', 4, 7)")
    got = {r["site"] for r in sess.execute(
        "SELECT site FROM hits").collect()}
    assert got == {"a", "b", "c"}
    sess.execute("DROP TABLE hits")


# ---------------------------------------------------------------------------
# ARRAY JOIN clause route (round 9 — the last dialect construct)
# ---------------------------------------------------------------------------


def test_array_join_alias_end_to_end(spark, duck, views):
    # expr item with AS alias: source column kept, element added
    got = sorted(tuple(r) for r in ch_sql(spark, """
        SELECT o_orderkey, tag
        FROM orders ARRAY JOIN splitByChar('-', o_orderpriority) AS tag
        WHERE o_orderkey <= 100
    """).collect())
    exp = sorted(tuple(r) for r in duck.execute("""
        SELECT o_orderkey, unnest(string_split(o_orderpriority, '-')) AS tag
        FROM orders WHERE o_orderkey <= 100
    """).fetchall())
    assert got == exp and len(got) > 0


def test_array_join_bare_column_replaces(spark, views):
    # bare-column item: the element REPLACES the array column (CH rule)
    spark.sql("""
        SELECT 1 AS id, array('a', 'b') AS tags
        UNION ALL SELECT 2, array('c')
        UNION ALL SELECT 3, array()
    """).createOrReplaceTempView("aj_probe")
    got = sorted(tuple(r) for r in ch_sql(
        spark, "SELECT id, tags FROM aj_probe ARRAY JOIN tags").collect())
    assert got == [(1, "a"), (1, "b"), (2, "c")]  # id=3 dropped
    left = sorted((r["id"], r["tags"]) for r in ch_sql(
        spark,
        "SELECT id, tags FROM aj_probe LEFT ARRAY JOIN tags").collect())
    assert left == [(1, "a"), (1, "b"), (2, "c"), (3, None)]


def test_array_join_multi_items_zip(spark, views):
    # multiple items zip in lockstep, never cross-product
    spark.sql("""
        SELECT 1 AS id, array(10, 20) AS a, array('x', 'y') AS b
    """).createOrReplaceTempView("aj_zip_probe")
    got = sorted(tuple(r) for r in ch_sql(spark, """
        SELECT id, a, b FROM aj_zip_probe ARRAY JOIN a, b
    """).collect())
    assert got == [(1, 10, "x"), (1, 20, "y")]


def test_array_join_composes_with_group_by_and_limit_by(spark, duck, views):
    # the route re-enters ch_sql: GROUP BY + dialect fns + LIMIT BY all
    # apply to the unnested relation
    got = sorted(tuple(r) for r in ch_sql(spark, """
        SELECT tag, count() AS n
        FROM orders ARRAY JOIN splitByChar('-', o_orderpriority) AS tag
        GROUP BY tag ORDER BY n DESC, tag LIMIT 2 BY modulo(n, 2)
    """).collect())
    exp = sorted(tuple(r) for r in duck.execute("""
        SELECT tag, n FROM (
            SELECT tag, n, row_number() OVER (
                PARTITION BY n % 2 ORDER BY n DESC, tag) AS rn
            FROM (SELECT tag, count(*) AS n
                  FROM (SELECT unnest(string_split(o_orderpriority, '-'))
                            AS tag FROM orders)
                  GROUP BY tag)
        ) WHERE rn <= 2
    """).fetchall())
    assert got == exp and len(got) > 0


def test_array_join_subquery_relation(spark, duck, views):
    got = sorted(tuple(r) for r in ch_sql(spark, """
        SELECT k, e FROM (
            SELECT o_orderkey AS k, splitByChar('-', o_orderpriority) AS ps
            FROM orders WHERE o_orderkey <= 40
        ) t ARRAY JOIN t.ps AS e
    """).collect())
    exp = sorted(tuple(r) for r in duck.execute("""
        SELECT o_orderkey AS k,
               unnest(string_split(o_orderpriority, '-')) AS e
        FROM orders WHERE o_orderkey <= 40
    """).fetchall())
    assert got == exp and len(got) > 0


def test_array_join_refuses_unroutable_shapes(spark, views):
    with pytest.raises(ValueError, match="relation shape"):
        ch_sql(spark, """
            SELECT 1 FROM orders o JOIN lineitem l ON o.o_orderkey =
            l.l_orderkey ARRAY JOIN splitByChar('-', o_orderpriority) AS t
        """)
    with pytest.raises(ValueError, match="AS alias"):
        ch_sql(spark,
               "SELECT 1 FROM orders ARRAY JOIN arrayConcat(a, b)")
    # a parenthesized tuple is not an array (CH rejects it too): loud
    # refusal with the lockstep rewrite, not a posexplode analysis error
    with pytest.raises(ValueError, match="parenthesized tuple"):
        ch_sql(spark,
               "SELECT 1 FROM orders ARRAY JOIN (a, b) AS t")
    # ...but single-element parens are plain grouping (valid CH):
    # unwrapped and routed normally (r11 review find)
    got = sorted(r["t"] for r in ch_sql(spark, """
        SELECT t FROM orders
        ARRAY JOIN (splitByChar('-', o_orderpriority)) AS t
        WHERE o_orderkey = 1
    """).collect())
    assert len(got) == 2  # '1-URGENT'-style priority splits into 2 tokens
    # the string-level translator still refuses loudly
    with pytest.raises(ValueError, match="no 1:1 Spark translation"):
        translate_select("SELECT x FROM t ARRAY JOIN xs AS x")


def test_arraypop_empty_and_range(spark):
    # ADVICE r8: arrayPopBack/Front on [] must return [], not throw;
    # range() is end-exclusive and empty on end <= start (CH semantics)
    row = ch_sql(spark, """
        SELECT arrayPopBack(CAST(array() AS ARRAY<INT>)) AS pb,
               arrayPopFront(CAST(array() AS ARRAY<INT>)) AS pf,
               arrayPopBack(array(1, 2, 3)) AS pb3,
               arrayPopFront(array(1, 2, 3)) AS pf3,
               range(4) AS r1, range(2, 5) AS r2,
               range(1, 8, 3) AS r3, range(0) AS r0, range(5, 2) AS rneg
    """).first()
    assert row["pb"] == [] and row["pf"] == []
    assert row["pb3"] == [1, 2] and row["pf3"] == [2, 3]
    assert row["r1"] == [0, 1, 2, 3] and row["r2"] == [2, 3, 4]
    assert row["r3"] == [1, 4, 7]
    assert row["r0"] == [] and row["rneg"] == []


def test_with_totals_scanner_is_quote_and_scope_aware(spark, duck, views):
    # ADVICE r8: literal text must not be rewritten
    got = translate_select(
        "SELECT 'GROUP BY x WITH TOTALS' AS note, event_type, count() "
        "FROM events GROUP BY event_type, note WITH TOTALS")
    assert "'GROUP BY x WITH TOTALS'" in got
    assert "GROUPING SETS ((event_type, note), ())" in got
    # two GROUP BYs at different depths: the inner subquery's GROUP BY
    # must not be captured by the outer WITH TOTALS
    got2 = translate_select("""
        SELECT g, count() FROM (
            SELECT user_id % 3 AS g, count(*) AS c FROM events
            GROUP BY user_id % 3
        ) GROUP BY g WITH TOTALS
    """)
    assert "GROUP BY user_id % 3" in got2
    assert "GROUP BY GROUPING SETS ((g), ())" in got2
    # subquery-level WITH TOTALS rewrites at its own depth
    got3 = translate_select("""
        SELECT max(n) FROM (
            SELECT event_type, count() AS n FROM events
            GROUP BY event_type WITH TOTALS
        )
    """)
    assert "GROUP BY GROUPING SETS ((event_type), ())" in got3


def test_with_totals_refuses_having(spark):
    # ADVICE r8: totals_mode=before_having cannot be reproduced by a
    # GROUPING SETS rewrite — refuse rather than silently diverge
    with pytest.raises(ValueError, match="WITH TOTALS combined with "
                                         "HAVING"):
        translate_select(
            "SELECT event_type, sum(value) AS s FROM events "
            "GROUP BY event_type WITH TOTALS HAVING sum(value) < 10")
    # HAVING in an OUTER query around a TOTALS subquery is fine
    got = translate_select("""
        SELECT g, sum(n) FROM (
            SELECT event_type AS g, count() AS n FROM events
            GROUP BY event_type WITH TOTALS
        ) GROUP BY g HAVING sum(n) > 0
    """)
    assert "GROUPING SETS ((event_type), ())" in got


def test_rename_table_rebinds_matview_and_dictionary_sources(spark, tmp_path):
    """ADVICE r8: RENAME TABLE must rewrite the SOURCE binding of every
    matview/dictionary referencing the old name — else DROP TABLE mv
    can't detach the view and dictionary re-snapshots go stale."""
    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    sess = ClickHouseSession(spark, str(tmp_path))
    sess.execute("CREATE TABLE src9 (k String, ts UInt64, v UInt64) "
                 "ENGINE = MergeTree() ORDER BY (k, ts)")
    sess.execute("INSERT INTO src9 VALUES ('a', 1, 10)")
    sess.execute("CREATE MATERIALIZED VIEW mv9 "
                 "ENGINE = SummingMergeTree() ORDER BY (k, ts) "
                 "AS SELECT k, ts, sum(v) AS v FROM src9 GROUP BY k, ts")
    sess.execute("CREATE DICTIONARY dict9 (k String, v UInt64) "
                 "PRIMARY KEY k SOURCE(CLICKHOUSE(TABLE 'src9')) "
                 "LAYOUT(FLAT()) LIFETIME(300)")
    sess.execute("RENAME TABLE src9 TO src9r")
    assert sess.matviews["mv9"][1] == "src9r"
    assert sess.dictionaries["dict9"][1] == "src9r"
    # dictionary re-snapshot after a mutation on the RENAMED source
    sess.execute("INSERT INTO src9r VALUES ('b', 1, 20)")
    got = sess.execute(
        "SELECT dictGet('dict9', 'v', 'b') AS v").collect()[0]["v"]
    assert got == 20
    # DROP of the MV detaches it from the renamed source: later inserts
    # must not flow into the dropped MV (no exception, clean detach)
    sess.execute("DROP TABLE mv9")
    sess.execute("INSERT INTO src9r VALUES ('c', 1, 30)")
    sess.execute("DROP DICTIONARY dict9")
    sess.execute("DROP TABLE src9r")


def test_dictget_miss_numeric_default(spark, tmp_path):
    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    sess = ClickHouseSession(spark, str(tmp_path))
    sess.execute("CREATE TABLE nsrc (k String, ts UInt64, v UInt64) "
                 "ENGINE = MergeTree() ORDER BY (k, ts)")
    sess.execute("INSERT INTO nsrc VALUES ('a', 1, 10)")
    sess.execute("CREATE DICTIONARY ndict (k String, v UInt64) "
                 "PRIMARY KEY k SOURCE(CLICKHOUSE(TABLE 'nsrc')) "
                 "LAYOUT(FLAT()) LIFETIME(300)")
    row = sess.execute(
        "SELECT dictGet('ndict', 'v', 'zz') AS miss, "
        "dictGet('ndict', 'v', 'a') AS hit").collect()[0]
    assert row["miss"] == 0 and row["hit"] == 10  # numeric type default
    sess.execute("DROP DICTIONARY ndict")
    sess.execute("DROP TABLE nsrc")


def test_splitbychar_metachar_separators(spark):
    # '.' and '|' are regex metachars: the translation must escape them
    # through Spark's backslash-eating string literals (r9 runbook bug)
    row = ch_sql(spark, """
        SELECT splitByChar('.', 'a.b.c') AS dots,
               splitByChar('|', 'x|y') AS pipes,
               splitByChar(',', 'p,q') AS commas
    """).first()
    assert row["dots"] == ["a", "b", "c"]
    assert row["pipes"] == ["x", "y"]
    assert row["commas"] == ["p", "q"]


def test_with_totals_empty_input_deviation(spark):
    """Pinned deviation (r9 route-x-state fuzz, seed 16): Spark's
    GROUPING SETS yields NO rows over an empty input, where ClickHouse
    still emits a zero-aggregate totals block. The route documents this
    rather than reproducing it (string-level select-list surgery)."""
    spark.sql("SELECT 'a' AS k, 1 AS v WHERE false") \
        .createOrReplaceTempView("totals_empty_probe")
    got = ch_sql(spark, "SELECT k, count() AS n FROM totals_empty_probe "
                        "GROUP BY k WITH TOTALS").collect()
    assert got == []  # no data rows AND no totals row on empty input


def test_sumif_empty_match_returns_zero(spark):
    """r9 dialect-fuzz find (seeds 22/50): ClickHouse sumIf over zero
    matching rows in a group returns 0 (CH aggregates yield defaults
    over empty sets), where a bare sum(if(..., NULL)) is NULL."""
    spark.sql("SELECT 'g1' AS g, 5 AS v UNION ALL SELECT 'g2', 50") \
        .createOrReplaceTempView("sumif_probe")
    rows = {r["g"]: r["s"] for r in ch_sql(spark, """
        SELECT g, sumIf(v, v > 10) AS s FROM sumif_probe GROUP BY g
    """).collect()}
    assert rows == {"g1": 0, "g2": 50}  # g1 has no matches -> 0, not NULL


def test_array_join_staging_view_is_dropped(spark, duck, views):
    """r9: the route's staging view must not accumulate in the catalog
    (one per routed statement in a long-lived session); the returned
    plan is already analyzed so collect() works after the drop."""
    before = {t.name for t in spark.catalog.listTables()
              if t.name.startswith("__ch_array_join_")}
    df = ch_sql(spark, """
        SELECT o_orderkey, tag
        FROM orders ARRAY JOIN splitByChar('-', o_orderpriority) AS tag
        WHERE o_orderkey <= 40
    """)
    after = {t.name for t in spark.catalog.listTables()
             if t.name.startswith("__ch_array_join_")}
    assert after == before  # no staging view survived the call
    assert df.count() > 0   # and the plan still executes


def test_routed_constructs_inside_subqueries_compose(spark, duck, views):
    """r9: a FROM-subquery holding a routed-only construct routes
    recursively instead of refusing (nested LIMIT BY / ARRAY JOIN /
    WITH FILL — common dashboard shapes)."""
    # outer aggregate over a LIMIT BY subquery
    got = sorted(tuple(r) for r in ch_sql(spark, """
        SELECT user_id, count() AS n FROM (
            SELECT user_id, event_id, value FROM events
            ORDER BY value DESC LIMIT 2 BY user_id
        ) GROUP BY user_id
    """).collect())
    exp = sorted(tuple(r) for r in duck.execute("""
        SELECT user_id, count(*) AS n FROM (
            SELECT user_id FROM (
                SELECT user_id, row_number() OVER (
                    PARTITION BY user_id ORDER BY value DESC,
                    event_id ASC) AS rn
                FROM events) WHERE rn <= 2
        ) GROUP BY user_id
    """).fetchall())
    # ties on value make rank order engine-specific; compare group sizes
    assert dict(got).keys() == dict(exp).keys()
    assert all(n <= 2 for _u, n in got)
    # outer GROUP BY over an ARRAY JOIN subquery
    got2 = sorted(tuple(r) for r in ch_sql(spark, """
        SELECT tag, count() AS n FROM (
            SELECT o_orderkey, tag
            FROM orders ARRAY JOIN splitByChar('-', o_orderpriority)
                AS tag
            WHERE o_orderkey <= 200
        ) GROUP BY tag
    """).collect())
    exp2 = sorted(tuple(r) for r in duck.execute("""
        SELECT tag, count(*) AS n FROM (
            SELECT unnest(string_split(o_orderpriority, '-')) AS tag
            FROM orders WHERE o_orderkey <= 200
        ) GROUP BY tag
    """).fetchall())
    assert got2 == exp2 and len(got2) > 0
    # outer select over a WITH FILL subquery
    got3 = sorted(tuple(r) for r in ch_sql(spark, """
        SELECT b, n FROM (
            SELECT modulo(user_id, 5) AS b, count() AS n
            FROM events GROUP BY b ORDER BY b
            WITH FILL FROM 0 TO 8
        ) WHERE n = 0
    """).collect())
    assert got3 == [(5, 0), (6, 0), (7, 0)]
    # staging views cleaned up
    leftovers = [t.name for t in spark.catalog.listTables()
                 if t.name.startswith("__ch_subq_")]
    assert leftovers == []


# ---------------------------------------------------------------------------
# Round-10 ADVICE fixes: ARRAY JOIN case/length edges, CTE named totals,
# dictGet type-default anchoring
# ---------------------------------------------------------------------------


def test_array_join_bare_column_case_insensitive(spark, views):
    # ADVICE r9: Spark resolves identifiers case-insensitively; a
    # differently-cased bare item must still REPLACE the source column
    # (pre-fix it silently returned the un-exploded array per element)
    spark.sql("SELECT 1 AS id, array('a', 'b') AS tags") \
        .createOrReplaceTempView("aj_case_probe")
    got = sorted(tuple(r) for r in ch_sql(
        spark,
        "SELECT id, TAGS FROM aj_case_probe ARRAY JOIN TAGS").collect())
    assert got == [(1, "a"), (1, "b")]
    # an item matching no base column refuses loudly (CH rejects it too)
    with pytest.raises(ValueError, match="not found"):
        ch_sql(spark, "SELECT id FROM aj_case_probe ARRAY JOIN nope")


def test_array_join_multi_items_unequal_lengths(spark, views):
    # documented deviation: the FIRST array drives the row count, the
    # others are NULL past their end (CH errors on unequal sizes). Under
    # ANSI mode a plain element_at throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    # past a shorter array (ADVICE r9) — try_element_at delivers the
    # documented semantics.
    spark.sql(
        "SELECT 1 AS id, array(10, 20, 30) AS a, array('x') AS b"
    ).createOrReplaceTempView("aj_unequal_probe")
    got = sorted(
        (tuple(r) for r in ch_sql(
            spark,
            "SELECT id, a, b FROM aj_unequal_probe ARRAY JOIN a, b"
        ).collect()),
        key=lambda t: (t[0], t[1]),
    )
    assert got == [(1, 10, "x"), (1, 20, None), (1, 30, None)]


def test_with_totals_cte_named_totals_untouched(spark, views):
    # ADVICE r9: a CTE named `totals` matches the WITH TOTALS token
    # sequence — the rewriter must leave the definition alone
    sql = "WITH totals AS (SELECT 1 AS x) SELECT x FROM totals"
    assert translate_select(sql) == sql
    assert [tuple(r) for r in ch_sql(spark, sql).collect()] == [(1,)]
    # ...and still rewrite a genuine modifier later in the statement
    got = translate_select(
        "WITH totals AS (SELECT 1 AS x) "
        "SELECT event_type, count() FROM events "
        "GROUP BY event_type WITH TOTALS")
    assert "WITH totals AS (SELECT 1 AS x)" in got
    assert "GROUPING SETS ((event_type), ())" in got


def test_dict_type_default_interval_not_numeric():
    # ADVICE r9: startswith("int") also matched "interval ..." dtypes,
    # emitting CAST(0 AS INTERVAL ...)
    from clickhouse_mergetree_spark.chsql import _dict_type_default

    assert _dict_type_default("interval day") is None
    assert _dict_type_default("int") == "CAST(0 AS int)"
    assert _dict_type_default("bigint") == "CAST(0 AS bigint)"
    assert _dict_type_default("decimal(10,2)") == "CAST(0 AS decimal(10,2))"
    assert _dict_type_default("double") == "CAST(0 AS double)"
    assert _dict_type_default("string") == "''"


def test_if_combinator_empty_match_family(spark):
    """r10 (VERDICT r9 item 6): CH 24.x empty-match behavior per -If
    family — countIf/sumIf return 0, avgIf returns nan (0/0, emulated
    via a typed coalesce since avg is always double), minIf/maxIf
    return the value type's default in CH but stay NULL here (the
    documented deviation: no schema at the string level)."""
    import math

    spark.sql("SELECT 'g1' AS g, 5 AS v UNION ALL SELECT 'g2', 50") \
        .createOrReplaceTempView("ifagg_probe")
    rows = {r["g"]: r for r in ch_sql(spark, """
        SELECT g, countIf(v > 10) AS c, sumIf(v, v > 10) AS s,
               avgIf(v, v > 10) AS a, minIf(v, v > 10) AS mn,
               maxIf(v, v > 10) AS mx, uniqIf(v, v > 10) AS u
        FROM ifagg_probe GROUP BY g
    """).collect()}
    g1, g2 = rows["g1"], rows["g2"]
    assert g1["c"] == 0 and g1["s"] == 0          # CH-exact defaults
    assert math.isnan(g1["a"])                     # CH-exact: 0/0 = nan
    assert g1["u"] == 0                            # CH-exact: uniq() = 0
    assert g1["mn"] is None and g1["mx"] is None   # documented deviation
    assert (g2["c"], g2["s"], g2["a"], g2["mn"], g2["mx"], g2["u"]) == (
        1, 50, 50.0, 50, 50, 1)


def test_numbers_table_function(spark):
    # CH numbers(N) / numbers(offset, count) -> Spark range() subquery
    got = sorted(r["number"] for r in ch_sql(
        spark, "SELECT number FROM numbers(3)").collect())
    assert got == [0, 1, 2]
    got2 = sorted(r["number"] for r in ch_sql(
        spark, "SELECT number FROM numbers(5, 3)").collect())
    assert got2 == [5, 6, 7]
    # composes with expressions and WHERE
    got3 = sorted(tuple(r) for r in ch_sql(spark, """
        SELECT number, number * number AS sq FROM numbers(10)
        WHERE modulo(number, 2) = 0
    """).collect())
    assert got3 == [(0, 0), (2, 4), (4, 16), (6, 36), (8, 64)]


def test_select_except_and_group_by_all_passthrough(spark):
    # CH `SELECT * EXCEPT (col)` and `GROUP BY ALL` are Spark-4-native:
    # pin the passthroughs so a translator regression can't break them
    spark.sql("SELECT 1 AS a, 2 AS b, 3 AS c").createOrReplaceTempView(
        "except_probe")
    row = ch_sql(spark, "SELECT * EXCEPT (b) FROM except_probe").first()
    assert row.asDict() == {"a": 1, "c": 3}
    rows = sorted(tuple(r) for r in ch_sql(spark, """
        SELECT event_type, count() AS n FROM
        (SELECT 'a' AS event_type UNION ALL SELECT 'a' UNION ALL
         SELECT 'b') GROUP BY ALL
    """).collect())
    assert rows == [("a", 2), ("b", 1)]


def test_exchange_tables_swaps_atomically(spark, tmp_path):
    """EXCHANGE TABLES swaps the two objects under their public names in
    one commit; SELECTs via the router observe the swap; self-exchange
    and unknown names refuse loudly."""
    import pytest

    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    sess = ClickHouseSession(spark, str(tmp_path))
    for name, val in (("blue", 1.0), ("green", 2.0)):
        sess.execute(f"""
            CREATE TABLE {name} (
                k String, ts UInt64, score Float64
            ) ENGINE = MergeTree() ORDER BY (k, ts)
        """)
        sess.execute(f"INSERT INTO {name} VALUES ('x', 1, {val})")
    blue_obj = sess.tables["blue"]
    sess.execute("EXCHANGE TABLES blue AND green")
    assert sess.tables["green"] is blue_obj  # pointer swap, no copy
    got = {n: sess.execute(f"SELECT max(score) AS s FROM {n}")
           .collect()[0]["s"] for n in ("blue", "green")}
    assert got == {"blue": 2.0, "green": 1.0}
    with pytest.raises(ValueError, match="distinct"):
        sess.execute("EXCHANGE TABLES blue AND blue")
    with pytest.raises(ValueError, match="unknown table"):
        sess.execute("EXCHANGE TABLES blue AND nope")
    # DROP under the post-exchange name closes the exchanged object
    sess.execute("DROP TABLE green")
    assert "green" not in sess.tables and "blue" in sess.tables


def test_star_modifier_expansion(spark):
    """* EXCEPT/REPLACE/APPLY and COLUMNS('re') expand against the FROM
    schema; bare * EXCEPT passes through natively; refusals are loud."""
    import pytest

    from clickhouse_mergetree_spark.chsql import ch_sql

    spark.createDataFrame(
        [(1, "a", 2.0, 3.0), (2, "b", 3.0, 4.0)],
        "id long, s string, v double, w double",
    ).createOrReplaceTempView("star_t")
    got = ch_sql(spark, "SELECT * EXCEPT (s, id) APPLY(sum) APPLY(round)"
                        " FROM star_t")
    assert got.columns == ["round_sum_v", "round_sum_w"]
    assert got.collect()[0][:] == (5.0, 7.0)
    rep = ch_sql(spark, "SELECT * REPLACE(v * 2 AS v) FROM star_t")
    assert rep.columns == ["id", "s", "v", "w"]
    assert {r["v"] for r in rep.collect()} == {4.0, 6.0}
    cols = ch_sql(spark, "SELECT s, COLUMNS('^[vw]') APPLY(sum) "
                         "FROM star_t GROUP BY ALL ORDER BY ALL")
    assert cols.columns == ["s", "sum_v", "sum_w"]
    native = ch_sql(spark, "SELECT * EXCEPT (s) FROM star_t")
    assert native.columns == ["id", "v", "w"]
    for bad, msg in [
        ("SELECT * APPLY(sum) FROM (SELECT 1 AS x)", "single named table"),
        ("SELECT * REPLACE(v AS zz) FROM star_t", "unknown column"),
        ("SELECT COLUMNS('zzz') FROM star_t", "matched no columns"),
        ("SELECT * APPLY(a b) FROM star_t", "bare function name"),
    ]:
        with pytest.raises(ValueError, match=msg):
            ch_sql(spark, bad)


def test_star_except_paren_less_and_chained(spark):
    """ADVICE r10: the CH-valid paren-less `* EXCEPT col` and chained
    `* EXCEPT(a) EXCEPT(b)` forms both normalize to the ONE
    parenthesized list Spark's native `* EXCEPT` accepts — including
    over a subquery, where the schema-based expander would refuse."""
    from clickhouse_mergetree_spark.chsql import ch_sql

    spark.createDataFrame(
        [(1, "a", 2.0, 3.0), (2, "b", 3.0, 4.0)],
        "id long, s string, v double, w double",
    ).createOrReplaceTempView("star_t2")
    bare = ch_sql(spark, "SELECT * EXCEPT s FROM star_t2")
    assert bare.columns == ["id", "v", "w"]
    chained = ch_sql(spark, "SELECT * EXCEPT(s) EXCEPT(w) FROM star_t2")
    assert chained.columns == ["id", "v"]
    mixed = ch_sql(spark, "SELECT * EXCEPT s EXCEPT(w) FROM star_t2")
    assert mixed.columns == ["id", "v"]
    # EXCEPT-only collapse needs no schema: subqueries still work
    sub = ch_sql(spark, "SELECT * EXCEPT v EXCEPT(w) FROM "
                        "(SELECT * FROM star_t2) q")
    assert sub.columns == ["id", "s"]
    # a set-operation EXCEPT after FROM must NOT trip the gate
    setop = ch_sql(spark, "SELECT * FROM star_t2 EXCEPT "
                          "SELECT * FROM star_t2 WHERE id = 2")
    assert [r["id"] for r in setop.collect()] == [1]
    # r11 review finds: native `* EXCEPT (col)` WITH a space before the
    # paren must stay out of the gate (backtracking trap) — including
    # inside a CTE, where the rewriter would refuse loudly...
    cte = ch_sql(spark, "WITH q AS (SELECT id, s, v FROM star_t2) "
                        "SELECT * EXCEPT (s) FROM q")
    assert cte.columns == ["id", "v"]
    # ...and an identifier merely STARTING with 'except' after a `*`
    # must not look like a star modifier
    spark.createDataFrame([(2, 3)], "id long, exceptions long") \
        .createOrReplaceTempView("star_t3")
    ident = ch_sql(spark, "WITH q AS (SELECT id, exceptions FROM star_t3)"
                          " SELECT id * exceptions AS x FROM q")
    assert [r["x"] for r in ident.collect()] == [6]
    # ADVICE r11: the paren-less and chained EXCEPT-only forms need no
    # schema either, so they must work after a WITH too — the
    # normalization is textual, not top-level-SELECT-bound
    cte_bare = ch_sql(spark, "WITH q AS (SELECT id, s, v FROM star_t2) "
                             "SELECT * EXCEPT s FROM q")
    assert cte_bare.columns == ["id", "v"]
    cte_chain = ch_sql(spark, "WITH q AS (SELECT * FROM star_t2) "
                              "SELECT * EXCEPT(s) EXCEPT(w) FROM q")
    assert cte_chain.columns == ["id", "v"]
    cte_mixed = ch_sql(spark, "WITH q AS (SELECT * FROM star_t2) "
                              "SELECT * EXCEPT s EXCEPT (w) FROM q "
                              "WHERE id = 1")
    assert cte_mixed.columns == ["id", "v"]
    assert cte_mixed.count() == 1
    # EXCEPT-only inside the CTE body itself
    cte_body = ch_sql(spark, "WITH q AS (SELECT * EXCEPT w FROM star_t2)"
                             " SELECT * EXCEPT s FROM q")
    assert cte_body.columns == ["id", "v"]


def test_enum_non_lexical_order_translates_to_ch_semantics(spark, tmp_path):
    """VERDICT r11 item 5: Enum columns whose declared label order
    diverges from lexical order must ORDER BY / min / max by the
    declared NUMERIC value (ClickHouse semantics), via the persisted
    table_meta["enum_values"] mapping — and order-sensitive shapes the
    rewrite can't prove safe must refuse loudly, never answer wrong."""
    import pytest

    from clickhouse_mergetree_spark.chsql import ClickHouseSession

    sess = ClickHouseSession(spark, str(tmp_path / "enumdb"))
    # lexical order: high < low < medium; CH numeric order:
    # high(1) < medium(2) < low(3)
    sess.execute("""
        CREATE TABLE prio (
            id UInt64, ts UInt64,
            level Enum8('low' = 3, 'medium' = 2, 'high' = 1)
        ) ENGINE = MergeTree() ORDER BY (id, ts)
    """)
    sess.execute("INSERT INTO prio VALUES "
                 "(1, 1, 'low'), (2, 2, 'high'), (3, 3, 'medium')")
    got = [r["level"] for r in sess.execute(
        "SELECT level FROM prio ORDER BY level").collect()]
    assert got == ["high", "medium", "low"]  # numeric, not lexical
    got = [r["level"] for r in sess.execute(
        "SELECT level FROM prio ORDER BY level DESC, id").collect()]
    assert got == ["low", "medium", "high"]
    # min/max are the CH numeric extremes, not the string extremes
    row = sess.execute(
        "SELECT min(level) AS lo, max(level) AS hi FROM prio").first()
    assert (row["lo"], row["hi"]) == ("high", "low")
    # grouped + window ORDER BY both translate
    row = sess.execute(
        "SELECT id, level FROM prio ORDER BY level, id LIMIT 1").first()
    assert row["level"] == "high"
    # a range comparison over the stored labels cannot match CH — loud
    with pytest.raises(ValueError, match="non-lexical"):
        sess.execute("SELECT * FROM prio WHERE level > 'high'")
    # an enum buried in a compound ORDER BY expression — loud
    with pytest.raises(ValueError, match="too complex"):
        sess.execute("SELECT * FROM prio ORDER BY concat(level, 'x')")
    # a LEXICAL-consistent enum is untouched (no rewrite, no refusal)
    sess.execute("""
        CREATE TABLE oks (
            id UInt64, ts UInt64,
            st Enum8('a' = 1, 'b' = 2)
        ) ENGINE = MergeTree() ORDER BY (id, ts)
    """)
    sess.execute("INSERT INTO oks VALUES (1, 1, 'b'), (2, 2, 'a')")
    got = [r["st"] for r in sess.execute(
        "SELECT st FROM oks ORDER BY st").collect()]
    assert got == ["a", "b"]
    assert sess.execute(
        "SELECT * FROM oks WHERE st > 'a'").count() == 1  # no refusal
