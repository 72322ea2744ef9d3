"""URL / IP / geo scalar-function families (ClickHouse's URL functions,
IPv4 functions, and geoDistance — SURVEY §2.9 function-surface widening).

The reference engine has no scalar function layer at all; ClickHouse
ships ~40 URL helpers (domain, topLevelDomain, path, extractURLParameter),
IPv4NumToString/IPv4StringToNum, and greatCircleDistance/geoDistance.
These queries re-express each family over deterministic synthetic inputs
derived arithmetically from table keys (the same fixture technique as
q_pii_scrub's injected PII), so every output is hash-verified cross-engine.

All three are pure row-local projection work — zero shuffles, fused into
whole-stage codegen behind whatever scan feeds them; at 100 TB they run
as map stages at full cluster width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.tables import load

# Deterministic URL fixture: host/path/query all derived from o_orderkey,
# mirrored literally in the oracle so both engines parse the same strings.
_URL_SQL_EXPR = (
    "concat('https://shop', CAST(o_orderkey % 50 AS STRING), "
    "'.example.', CASE CAST(o_orderkey % 3 AS INTEGER) WHEN 0 THEN 'com' "
    "WHEN 1 THEN 'net' ELSE 'org' END, "
    "'/cat/', CAST(o_orderkey % 7 AS STRING), "
    "'/item/', CAST(o_orderkey % 97 AS STRING), "
    "'?id=', CAST(o_orderkey AS STRING), '&pri=', "
    "replace(o_orderpriority, ' ', '_'))"
)


@declared_query(
    "q_fn_url",
    oracle=f"""
        WITH u AS (
            SELECT o_orderkey, {_URL_SQL_EXPR} AS url FROM orders
        )
        SELECT o_orderkey, url,
               regexp_extract(url, '^https?://([^/]+)', 1) AS host,
               regexp_extract(url, '^https?://[^/]*\\.([a-z]+)(/|$)', 1)
                 AS tld,
               regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
               CAST(len(string_split(
                   regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1), '/'))
                   - 1 AS INTEGER) AS path_depth,
               CAST(regexp_extract(url, 'id=([0-9]+)', 1) AS BIGINT)
                 AS param_id,
               regexp_extract(url, 'pri=([^&]*)', 1) AS param_pri
        FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse URL function family — domain(), topLevelDomain(),
    path(), extractURLParameter() — via Spark's parse_url() plus one
    regexp for the TLD. The oracle re-derives every field with RE2
    regexps over the identical synthesized URLs, so the hash match
    verifies Spark's native URL parser against an independent
    implementation, not regex-vs-same-regex.
    """
    o = load(spark, sf_dir, "orders")
    url = F.expr(_URL_SQL_EXPR)
    u = o.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey", "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.regexp_extract(F.parse_url("url", F.lit("HOST")),
                         r"\.([a-z]+)$", 1).alias("tld"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        (F.size(F.split(F.parse_url("url", F.lit("PATH")), "/")) - 1)
        .cast("int").alias("path_depth"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).cast("bigint")
        .alias("param_id"),
        F.parse_url("url", F.lit("QUERY"), F.lit("pri"))
        .alias("param_pri"),
    )


# Fixed reference point for the distance fixture (an arbitrary city).
_REF_LAT = 48.8566
_REF_LON = 2.3522
_EARTH_KM = 6371.0

# Synthetic coordinates: exact decimal-tenth grids derived from the key,
# identical arithmetic in both engines.
_LAT_SQL = "(CAST(c_custkey * 37 % 1600 AS DOUBLE) / 10.0 - 80.0)"
_LON_SQL = "(CAST(c_custkey * 73 % 3600 AS DOUBLE) / 10.0 - 180.0)"


@declared_query(
    "q_fn_geo",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
            FROM customer
        )
        SELECT c_custkey, lat, lon,
               round(2 * {_EARTH_KM} * asin(sqrt(
                   pow(sin(radians(lat - {_REF_LAT}) / 2), 2)
                   + cos(radians({_REF_LAT})) * cos(radians(lat))
                     * pow(sin(radians(lon - {_REF_LON}) / 2), 2)
               )), 3) AS dist_km,
               lat BETWEEN 35.0 AND 60.0 AND lon BETWEEN -10.0 AND 30.0
                 AS in_europe_bbox
        FROM pts
    """,
)
def q_fn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse greatCircleDistance/geoDistance + pointInPolygon's
    bounding-box fast path: haversine distance (km) from each synthetic
    customer location to a fixed reference point, plus a bbox membership
    flag. Rounded to 3 dp (meter-level) — the transcendental chain
    (sin/cos/asin) can differ by an ulp between libm and java.lang.Math,
    exactly like q_fn_math's log/sqrt outputs, and the rounding
    convention there applies here.
    """
    c = load(spark, sf_dir, "customer")
    lat = F.expr(_LAT_SQL)
    lon = F.expr(_LON_SQL)
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    dlat = F.radians(F.col("lat") - F.lit(_REF_LAT)) / 2
    dlon = F.radians(F.col("lon") - F.lit(_REF_LON)) / 2
    hav = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians(F.lit(_REF_LAT))) * F.cos(F.radians("lat"))
        * F.pow(F.sin(dlon), 2)
    )
    return pts.select(
        "c_custkey", "lat", "lon",
        F.round(2 * _EARTH_KM * F.asin(F.sqrt(hav)), 3).alias("dist_km"),
        (F.col("lat").between(35.0, 60.0)
         & F.col("lon").between(-10.0, 30.0)).alias("in_europe_bbox"),
    )


# Synthetic IPv4 fixture: 10.x.y.z derived from o_orderkey (pure integer
# arithmetic — bit-exact in both engines).
_IP_NUM_SQL = (
    "(CAST(10 * 16777216 AS BIGINT) + (o_orderkey % 64) * 65536 "
    "+ ((o_orderkey // 7) % 256) * 256 + o_orderkey % 256)"
)


@declared_query(
    "q_fn_ip",
    oracle=f"""
        WITH ips AS (
            SELECT o_orderkey, {_IP_NUM_SQL} AS ip_num FROM orders
        ), s AS (
            SELECT o_orderkey, ip_num,
                   concat(CAST(ip_num // 16777216 AS STRING), '.',
                          CAST(ip_num // 65536 % 256 AS STRING), '.',
                          CAST(ip_num // 256 % 256 AS STRING), '.',
                          CAST(ip_num % 256 AS STRING)) AS ip_str
            FROM ips
        )
        SELECT concat(CAST(ip_num // 16777216 AS STRING), '.',
                      CAST(ip_num // 65536 % 256 AS STRING), '.',
                      CAST(ip_num // 256 % 256 AS STRING), '.0/24')
                 AS subnet,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(min(ip_num) AS BIGINT) AS min_ip,
               CAST(max(ip_num) AS BIGINT) AS max_ip,
               min(ip_str) AS first_ip_str
        FROM s
        GROUP BY 1
    """,
)
def q_fn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IPv4NumToString/IPv4StringToNum + /24 subnet rollup:
    synthesize an IPv4 per order, render it dotted-quad, aggregate per
    /24 subnet (the classic abuse/telemetry rollup). The Spark side
    derives the subnet by re-PARSING its own dotted-quad string
    (StringToNum ∘ NumToString round trip), while the oracle derives it
    from the integer directly — the hash match proves the round trip is
    lossless, not just that both sides share arithmetic.
    """
    o = load(spark, sf_dir, "orders")
    ip_num = F.expr(_IP_NUM_SQL.replace("//", " div "))
    octets = [
        (F.col("ip_num").bitwiseAND(0xFF000000) / 16777216).cast("long"),
        (F.col("ip_num").bitwiseAND(0xFF0000) / 65536).cast("long"),
        (F.col("ip_num").bitwiseAND(0xFF00) / 256).cast("long"),
        F.col("ip_num").bitwiseAND(0xFF),
    ]
    s = (
        o.select("o_orderkey", ip_num.alias("ip_num"))
        .withColumn("ip_str", F.concat_ws(".", *[
            oc.cast("string") for oc in octets]))
    )
    # StringToNum: parse the dotted-quad back (split + weighted sum)
    parts = F.split("ip_str", r"\.")
    reparsed = (
        parts.getItem(0).cast("bigint") * 16777216
        + parts.getItem(1).cast("bigint") * 65536
        + parts.getItem(2).cast("bigint") * 256
        + parts.getItem(3).cast("bigint")
    )
    return (
        s.withColumn("rp", reparsed)
        .select(
            F.concat_ws(".", parts.getItem(0), parts.getItem(1),
                        parts.getItem(2), F.lit("0/24")).alias("subnet"),
            "ip_str", "rp",
        )
        .groupBy("subnet")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("rp").alias("min_ip"),
            F.max("rp").alias("max_ip"),
            F.min("ip_str").alias("first_ip_str"),
        )
    )


# URL-dedup fixture: groups of 4 orderkeys share one logical URL, each
# rendered as a different non-canonical variant (scheme/host case, a
# utm_source or ref tracking param, a trailing slash, a #fragment). The
# id param is constructed FIRST in the query string, so stripping a
# tracking param never leaves a dangling '?&' (documented fixture
# guarantee — a production canonicalizer would normalize that too).
_RAW_URL_SQL = (
    "CASE CAST(o_orderkey % 4 AS INTEGER) "
    "WHEN 0 THEN concat('https://shop', CAST((o_orderkey // 4) % 50 AS STRING), "
    "  '.example.com/item/', CAST(o_orderkey // 4 AS STRING), "
    "  '?id=', CAST(o_orderkey // 4 AS STRING)) "
    "WHEN 1 THEN concat('HTTPS://SHOP', CAST((o_orderkey // 4) % 50 AS STRING), "
    "  '.EXAMPLE.COM/item/', CAST(o_orderkey // 4 AS STRING), "
    "  '?id=', CAST(o_orderkey // 4 AS STRING), '&utm_source=feed') "
    "WHEN 2 THEN concat('https://shop', CAST((o_orderkey // 4) % 50 AS STRING), "
    "  '.example.com/item/', CAST(o_orderkey // 4 AS STRING), "
    "  '/?id=', CAST(o_orderkey // 4 AS STRING), '&ref=abc') "
    "ELSE concat('https://shop', CAST((o_orderkey // 4) % 50 AS STRING), "
    "  '.example.com/item/', CAST(o_orderkey // 4 AS STRING), "
    "  '?id=', CAST(o_orderkey // 4 AS STRING), '#frag') END"
)

# Canonicalization pipeline, identical regexp chain on both engines:
# strip #fragment -> drop utm_*/ref tracking params -> drop the trailing
# slash before '?' or at end -> lowercase the scheme://host prefix.
_CANON_STEPS_SQL = (
    "concat("
    "  lower(regexp_extract({u}, '^([a-zA-Z]+://[^/?#]+)', 1)),"
    "  regexp_replace(regexp_replace(regexp_replace("
    "      regexp_extract({u}, '^[a-zA-Z]+://[^/?#]+([^#]*)', 1),"
    "    '[&](utm_[a-z]+|ref)=[^&]*', ''),"
    "    '/[?]', '?'),"
    "    '/$', ''))"
)


@declared_query(
    "q_url_dedup",
    oracle=f"""
        WITH raw AS (
            SELECT o_orderkey, {_RAW_URL_SQL} AS url FROM orders
        ), c AS (
            SELECT o_orderkey, url,
                   {_CANON_STEPS_SQL.format(u="url")} AS canon_url
            FROM raw
        )
        SELECT canon_url,
               CAST(count(*) AS BIGINT) AS n_variants,
               CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_raw,
               CAST(min(o_orderkey) AS BIGINT) AS keeper
        FROM c GROUP BY canon_url
    """,
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the first pass of every web-crawl
    corpus pipeline: the same logical page arrives under scheme/host case
    variants, tracking parameters (utm_*, ref), trailing slashes, and
    fragments; canonicalize (strip fragment → drop tracking params →
    trim trailing slash → lowercase scheme+host) and elect one keeper
    per canonical URL. The fixture constructs 4 variants per logical URL,
    so a correct canonicalizer collapses exactly 4:1 — and the oracle
    runs the identical regexp chain, so the hash pins every rule.

    Row-local regexp work then ONE groupBy(canon_url) — the same
    one-shuffle shape as content-hash dedup; at crawl scale the map side
    fuses into the fetch-output scan."""
    o = load(spark, sf_dir, "orders")
    raw = o.select("o_orderkey",
                   F.expr(_RAW_URL_SQL.replace(" // ", " div "))
                   .alias("url"))
    canon = raw.withColumn(
        "canon_url", F.expr(_CANON_STEPS_SQL.format(u="url")))
    return canon.groupBy("canon_url").agg(
        F.count("*").alias("n_variants"),
        F.countDistinct("url").alias("n_distinct_raw"),
        F.min("o_orderkey").alias("keeper"),
    )


@declared_query(
    "q_fn_fuzzy",
    oracle="""
        WITH t AS (
            SELECT p_partkey, lower(p_name) AS a, lower(p_type) AS b,
                   list_distinct(string_split(lower(p_name), ' ')) AS ta,
                   list_distinct(string_split(lower(p_type), ' ')) AS tb
            FROM part
        )
        SELECT p_partkey,
               CAST(levenshtein(a, b) AS BIGINT) AS lev,
               CAST(1.0 - CAST(levenshtein(a, b) AS DOUBLE)
                    / greatest(length(a), length(b), 1) AS DOUBLE)
                 AS lev_sim,
               CAST(len(list_filter(ta, x -> list_contains(tb, x)))
                    AS BIGINT) AS tok_common,
               CAST(CAST(len(list_filter(ta, x -> list_contains(tb, x)))
                         AS DOUBLE)
                    / (len(ta) + len(tb)
                       - len(list_filter(ta, x -> list_contains(tb, x))))
                    AS DOUBLE) AS tok_jaccard
        FROM t
    """,
)
def q_fn_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching — ClickHouse editDistance /
    stringJaccardIndex family: per-row Levenshtein distance between part
    name and type, its normalized similarity, and distinct-token overlap
    / Jaccard. Spark's native levenshtein() is verified against DuckDB's
    independent implementation (same classic DP definition — the hash
    match proves it); token Jaccard is spelled out with identical
    set-algebra on both engines. Integer edit distances and
    exact-operand divisions keep every value bit-stable.

    Row-local scalar work, zero shuffles — the similarity-scoring inner
    loop of fuzzy dedup / entity resolution runs as a pure map stage at
    any scale.
    """
    p = load(spark, sf_dir, "part")
    a = F.lower(F.col("p_name"))
    b = F.lower(F.col("p_type"))
    ta = F.array_distinct(F.split(a, " "))
    tb = F.array_distinct(F.split(b, " "))
    common = F.size(F.array_intersect(ta, tb))
    lev = F.levenshtein(a, b)
    return p.select(
        "p_partkey",
        lev.cast("bigint").alias("lev"),
        (1.0 - lev.cast("double")
         / F.greatest(F.length(a), F.length(b), F.lit(1)))
        .cast("double").alias("lev_sim"),
        common.cast("bigint").alias("tok_common"),
        (common.cast("double") / (F.size(ta) + F.size(tb) - common))
        .cast("double").alias("tok_jaccard"),
    )


@declared_query(
    "q_fn_bits",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS b_and,
               o_orderkey | 4096 AS b_or,
               xor(o_orderkey, 1365) AS b_xor,
               (o_orderkey & 65535) << 2 AS b_shl,
               o_orderkey >> 3 AS b_shr,
               bit_count(CAST(o_orderkey AS BIGINT)) AS b_pop
        FROM orders
    """,
)
def q_fn_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse bit-function family (bitAnd/bitOr/bitXor/
    bitShiftLeft/bitShiftRight/bitCount) analog — flag fields, bitmap
    codes, and hash mixing all route through these. Pure row-local
    projection, fused into whole-stage codegen behind the scan: at
    100 TB this is a map stage at full cluster width, zero shuffles.
    Both engines implement two's-complement semantics on BIGINT, so
    every output hash-matches without tolerance."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(4096)).alias("b_or"),
        k.bitwiseXOR(F.lit(1365)).alias("b_xor"),
        F.shiftleft(k.bitwiseAND(F.lit(65535)), 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
        F.bit_count(k.cast("bigint")).alias("b_pop"),
    )


@declared_query(
    "q_fn_encode",
    oracle="""
        SELECT c_custkey,
               hex(encode(c_name)) AS name_hex,
               base64(encode(c_name)) AS name_b64,
               md5(c_name) AS name_md5,
               octet_length(encode(c_name)) AS name_bytes
        FROM customer
    """,
)
def q_fn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse encoding-function family (hex / base64Encode / MD5 /
    byte length) analog — ID munging, cache keys, and binary-safe
    export paths. Row-local projection in codegen, zero shuffles.
    DuckDB's hex() of a BLOB uppercases and Spark's hex() of binary
    does too; base64 follows RFC 4648 on both; md5 returns lowercase
    hex on both — each pinned by the value hash."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.hex(F.encode("c_name", "UTF-8")).alias("name_hex"),
        F.base64(F.encode("c_name", "UTF-8")).alias("name_b64"),
        F.md5("c_name").alias("name_md5"),
        F.octet_length("c_name").alias("name_bytes"),
    )


# Nested CIDR dimension for the ip_trie lookup: (label, a.b.c.d/plen) as
# integer components so BOTH engines derive lo/hi from the same integer
# arithmetic (lo = packed octets, hi = lo + 2^(32-plen) - 1) — no
# hand-computed range literals to drift. Prefix lengths 8..25, nested
# three deep (corp ⊃ region ⊃ dc/rack/subnet) so the longest-prefix
# election is actually exercised, not just a range probe.
_CIDR_DIM = (
    ("corp-net",        10, 0,  0,   0, 8),
    ("region-west",     10, 16, 0,   0, 12),
    ("dc-8",            10, 8,  0,   0, 16),
    ("dc-9",            10, 9,  0,   0, 16),
    ("rack-w32",        10, 16, 32,  0, 20),
    ("rack-24-low",     10, 24, 0,   0, 21),
    ("subnet-3-7",      10, 3,  7,   0, 24),
    ("subnet-3-7-high", 10, 3,  7, 128, 25),
)

_CIDR_VALUES_SQL = ", ".join(
    f"('{label}', {a}, {b}, {c}, {d}, {plen})"
    for label, a, b, c, d, plen in _CIDR_DIM)


@declared_query(
    "q_ip_cidr",
    oracle=f"""
        WITH ips AS (
            SELECT o_orderkey, {_IP_NUM_SQL} AS ip_num FROM orders
        ), dim AS (
            SELECT label, plen,
                   ((a * 256 + b) * 256 + c) * 256 + d AS lo,
                   ((a * 256 + b) * 256 + c) * 256 + d
                       + CAST(pow(2, 32 - plen) AS BIGINT) - 1 AS hi
            FROM (VALUES {_CIDR_VALUES_SQL}) v(label, a, b, c, d, plen)
        ), matched AS (
            SELECT o_orderkey, ip_num, label, plen,
                   row_number() OVER (
                       PARTITION BY o_orderkey
                       ORDER BY plen DESC, label) AS rn
            FROM ips JOIN dim ON ip_num BETWEEN lo AND hi
        )
        SELECT label, plen,
               CAST(count(*) AS BIGINT) AS n_ips,
               CAST(min(ip_num) AS BIGINT) AS min_ip,
               CAST(max(ip_num) AS BIGINT) AS max_ip
        FROM matched WHERE rn = 1
        GROUP BY label, plen
    """,
)
def q_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ip_trie dictionary analog (``dictGet`` over a CIDR
    layout): enrich each order's IPv4 with the LONGEST matching prefix
    from a nested CIDR dimension — the geo-IP / network-attribution
    lookup every telemetry pipeline runs.

    The dimension is node-memory-sized (real route tables are ≤ a few M
    rows), so it broadcasts and the containment join is a
    broadcast-nested-loop against 8 rows — zero shuffle of the fact
    side. The longest-prefix election is a per-ip row_number over
    (plen DESC); at 100 TB the same plan holds because the window key is
    the fact's own row id (no skew, no global sort). For route tables
    too large to broadcast, the standard rewrite is prefix expansion to
    a fixed stride (each CIDR exploded to its covering /K blocks) which
    turns containment into an equi-join on the ip's /K block — same
    result, shuffle-join scalable.
    """
    from clickhouse_mergetree_spark.tables import values_df

    o = load(spark, sf_dir, "orders")
    ip_num = F.expr(_IP_NUM_SQL.replace("//", " div "))
    ips = o.select("o_orderkey", ip_num.alias("ip_num"))
    dim = values_df(
        spark, list(_CIDR_DIM),
        [("label", "string"), ("a", "bigint"), ("b", "bigint"),
         ("c", "bigint"), ("d", "bigint"), ("plen", "int")],
    ).select(
        "label", "plen",
        (((F.col("a") * 256 + F.col("b")) * 256 + F.col("c")) * 256
         + F.col("d")).alias("lo"),
        (((F.col("a") * 256 + F.col("b")) * 256 + F.col("c")) * 256
         + F.col("d")
         + F.pow(F.lit(2), F.lit(32) - F.col("plen")).cast("bigint")
         - 1).alias("hi"),
    )
    from pyspark.sql import Window as W
    matched = ips.join(
        F.broadcast(dim),
        (F.col("ip_num") >= F.col("lo")) & (F.col("ip_num") <= F.col("hi")),
    )
    rn = F.row_number().over(
        W.partitionBy("o_orderkey").orderBy(F.col("plen").desc(), "label"))
    return (
        matched.withColumn("rn", rn).filter(F.col("rn") == 1)
        .groupBy("label", "plen")
        .agg(F.count("*").alias("n_ips"),
             F.min("ip_num").alias("min_ip"),
             F.max("ip_num").alias("max_ip"))
    )


@declared_query(
    "q_fn_bitops",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS low_byte,
               o_orderkey | 4096 AS with_flag,
               xor(o_orderkey, 170) AS xored,
               CAST(o_orderkey * 256 AS BIGINT) AS shifted_l,
               CAST(o_orderkey // 16 AS BIGINT) AS shifted_r,
               bit_count(o_orderkey) AS popcount
        FROM orders
    """,
)
def q_fn_bitops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse bit-function family (``bitAnd`` / ``bitOr`` /
    ``bitXor`` / ``bitShiftLeft`` / ``bitShiftRight`` / ``bitCount``):
    the flag-packing / hash-mixing primitives every telemetry schema
    leans on. All row-local integer ops inside whole-stage codegen —
    zero shuffles at any scale. Shifts are pinned against the oracle's
    multiplication/division forms (shift-by-constant ≡ ×2ᵏ / ÷2ᵏ for
    non-negative keys), so the hash match proves the semantics, not
    just that both engines share an opcode.
    """
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(255).alias("low_byte"),
        k.bitwiseOR(4096).alias("with_flag"),
        k.bitwiseXOR(170).alias("xored"),
        F.shiftleft(k, 8).cast("bigint").alias("shifted_l"),
        F.shiftright(k, 4).cast("bigint").alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
    )


@declared_query(
    "q_fn_multisearch",
    oracle="""
        SELECT p_partkey,
               (p_type LIKE '%BRASS%' OR p_type LIKE '%COPPER%'
                OR p_type LIKE '%TIN%') AS any_hit,
               CASE WHEN p_type LIKE '%BRASS%' THEN 1
                    WHEN p_type LIKE '%COPPER%' THEN 2
                    WHEN p_type LIKE '%TIN%' THEN 3
                    ELSE 0 END AS first_idx,
               CAST((CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END)
                  + (CASE WHEN p_type LIKE '%COPPER%' THEN 1 ELSE 0 END)
                  + (CASE WHEN p_type LIKE '%TIN%' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits,
               CAST(strpos(lower(p_type), 'steel') AS BIGINT) AS ci_pos
        FROM part
    """,
)
def q_fn_multisearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse multi-needle search family (``multiSearchAny`` /
    ``multiSearchFirstIndex`` / count-of-needles / ``positionCaseInsensitive``)
    over part type strings — the screening primitive behind blocklist
    and taxonomy filters.

    All row-local contains/locate calls fused in one codegen projection —
    zero shuffles, and a needle list of size k is k scalar ops per row,
    not a join (ClickHouse's Volnitsky multi-pattern automaton is an
    optimization of the same semantics; at 100 TB with large needle
    lists the relational form is a broadcast join against the needle
    table instead, which q_contamination implements). The oracle
    re-derives every function from LIKE/CASE arithmetic — an independent
    formulation, so the hash pins semantics, not implementation.
    """
    p = load(spark, sf_dir, "part")
    needles = ["BRASS", "COPPER", "TIN"]
    hits = [F.col("p_type").contains(n) for n in needles]
    first_idx = F.when(hits[0], 1).when(hits[1], 2).when(hits[2], 3).otherwise(0)
    n_hits = sum(h.cast("long") for h in hits)
    return p.select(
        "p_partkey",
        (hits[0] | hits[1] | hits[2]).alias("any_hit"),
        first_idx.alias("first_idx"),
        n_hits.alias("n_hits"),
        F.instr(F.lower("p_type"), "steel").cast("bigint").alias("ci_pos"),
    )


# Concave test polygon (a chevron: the notch at (20,10) makes bbox tests
# wrong for ~a quarter of the box — the case E85's bbox check cannot
# decide). Closed edge list generated once, embedded as literals in BOTH
# engines' expressions.
_POLY = [(0.0, 0.0), (40.0, 0.0), (40.0, 30.0), (20.0, 10.0), (0.0, 30.0)]
_EDGES = [(x1, y1, x2, y2)
          for (x1, y1), (x2, y2) in zip(_POLY, _POLY[1:] + _POLY[:1])]
_PX_SQL = "(CAST(c_custkey * 37 % 500 AS DOUBLE) / 10.0)"
_PY_SQL = "(CAST(c_custkey * 73 % 400 AS DOUBLE) / 10.0)"
# even-odd ray cast: an edge crosses the +x ray from (px, py) iff it
# spans py and the intersection sits right of px
_CROSS = ("(({y1} > py) <> ({y2} > py)) AND "
          "px < ({x2} - {x1}) * (py - {y1}) / ({y2} - {y1}) + {x1}")


def _crossing_pred(x1: float, y1: float, x2: float, y2: float) -> str:
    return _CROSS.format(x1=x1, y1=y1, x2=x2, y2=y2)


@declared_query(
    "q_fn_point_in_polygon",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey, {_PX_SQL} AS px, {_PY_SQL} AS py
            FROM customer
        )
        SELECT c_custkey, px, py,
               CAST({" + ".join(
                   f"CASE WHEN {_crossing_pred(*e)} THEN 1 ELSE 0 END"
                   for e in _EDGES)} AS BIGINT) AS n_crossings,
               ({" + ".join(
                   f"CASE WHEN {_crossing_pred(*e)} THEN 1 ELSE 0 END"
                   for e in _EDGES)}) % 2 = 1 AS inside
        FROM pts
    """,
    defer=True,
)
def q_fn_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E222: ``pointInPolygon`` with the REAL even-odd ray cast over a
    CONCAVE polygon — the case E85's bounding-box containment cannot
    decide (the chevron notch is inside the bbox but outside the
    polygon). Each point counts the polygon edges its +x ray crosses;
    odd = inside — the textbook algorithm CH runs per point, here
    unrolled over the 5 literal edges so the whole predicate is one
    codegen'd branch-free-ish expression per row.

    Zero shuffles, scan throughput at any size: the polygon is a
    literal (CH loads it as a constant too), points derive from the key
    as exact decimal tenths, and the crossing test is pure comparisons
    plus one deterministic division per spanning edge — identical IEEE
    arithmetic on both engines, no rounding needed anywhere. A polygon
    with thousands of edges would swap the unrolled sum for the same
    predicate folded over an edge-array column (E87's HOF pattern);
    5 literal edges inline better.
    """
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 500).cast("double") / 10.0).alias("px"),
        ((F.col("c_custkey") * 73 % 400).cast("double") / 10.0).alias("py"))

    def crossing(x1, y1, x2, y2):
        spans = (F.lit(y1) > F.col("py")) != (F.lit(y2) > F.col("py"))
        xint = (F.lit(x2 - x1) * (F.col("py") - F.lit(y1))
                / F.lit(y2 - y1) + F.lit(x1))
        return F.when(spans & (F.col("px") < xint), 1).otherwise(0)

    n_cross = sum((crossing(*e) for e in _EDGES), F.lit(0))
    return pts.select(
        "c_custkey", "px", "py",
        n_cross.cast("bigint").alias("n_crossings"),
        (n_cross % 2 == 1).alias("inside"))


# Many-edge polygon for the FOLD variant (E225): a 16-tooth comb — 67
# edges, strongly concave (the slits carve 16 disjoint notches out of
# the bbox). Every coordinate is an exact half (integer/2), so decimal
# literals parse to bit-identical doubles on both engines and the ray
# cast needs no rounding anywhere.
def _comb_edges() -> list[tuple[float, float, float, float]]:
    pts = [(0.0, 0.0), (48.0, 0.0), (48.0, 30.0)]
    for k in range(16):
        xr = 46.5 - 3.0 * k
        xl = xr - 1.5
        pts += [(xr, 30.0), (xr, 12.0), (xl, 12.0), (xl, 30.0)]
    return [(x1, y1, x2, y2)
            for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1])]


_COMB = _comb_edges()
_COMB_SPARK = "array(" + ", ".join(
    f"named_struct('x1', CAST({x1!r} AS DOUBLE), 'y1', CAST({y1!r} AS DOUBLE), "
    f"'x2', CAST({x2!r} AS DOUBLE), 'y2', CAST({y2!r} AS DOUBLE))"
    for x1, y1, x2, y2 in _COMB) + ")"
_COMB_DUCK = "[" + ", ".join(
    f"struct_pack(x1 := CAST({x1!r} AS DOUBLE), y1 := CAST({y1!r} AS DOUBLE), "
    f"x2 := CAST({x2!r} AS DOUBLE), y2 := CAST({y2!r} AS DOUBLE))"
    for x1, y1, x2, y2 in _COMB) + "]"
_FOLD_CROSS = ("((e.y1 > py) <> (e.y2 > py)) AND "
               "px < (e.x2 - e.x1) * (py - e.y1) / (e.y2 - e.y1) + e.x1")


@declared_query(
    "q_point_in_polygon_fold",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey, {_PX_SQL} AS px, {_PY_SQL} AS py
            FROM customer
        )
        SELECT c_custkey, px, py,
               CAST(list_sum(list_transform({_COMB_DUCK},
                    e -> CASE WHEN {_FOLD_CROSS} THEN 1 ELSE 0 END))
                    AS BIGINT) AS n_crossings,
               list_sum(list_transform({_COMB_DUCK},
                    e -> CASE WHEN {_FOLD_CROSS} THEN 1 ELSE 0 END))
                    % 2 = 1 AS inside
        FROM pts
    """,
    defer=True,
)
def q_point_in_polygon_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E225: many-edge ``pointInPolygon`` — the scale path E222's
    docstring promises: instead of unrolling one CASE per edge (fine at
    5 edges, absurd at 5,000), the polygon is ONE array-of-structs
    literal and the even-odd crossing count is a single ``aggregate``
    higher-order function folded over it (E87's HOF pattern). The
    67-edge comb polygon is strongly concave (16 slits inside the
    bbox), so bbox or convexity shortcuts would misclassify ~30% of the
    box — the fold must actually walk the edges.

    Scale shape: still zero shuffles and pure scan throughput. The HOF
    evaluates JVM-side inside codegen (no Python), the polygon constant
    is broadcast as part of the plan (exactly how CH ships the constant
    polygon to every core), and cost is O(rows x edges) row-local work
    — at a real 5,000-edge polygon the same plan holds, or the edge
    array moves to a broadcast-joined dimension table with one struct
    row per edge and a groupBy-parity finish. Coordinates are exact
    halves so both engines fold bit-identical doubles — no rounding,
    no signed-zero hazard (counts and booleans out).

    Reference: ClickHouse ``pointInPolygon((x, y), [(x1, y1), ...])``
    — the reference engine has no geo layer (SURVEY §2.A n/a); CH's
    grid-index optimization applies above ~1e4 edges, below which it
    runs this same linear walk per point.
    """
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 500).cast("double") / 10.0).alias("px"),
        ((F.col("c_custkey") * 73 % 400).cast("double") / 10.0).alias("py"))
    n_cross = F.expr(
        f"aggregate({_COMB_SPARK}, 0L, (acc, e) -> acc + "
        f"IF({_FOLD_CROSS.replace('<>', '!=')}, 1L, 0L))")
    return pts.select(
        "c_custkey", "px", "py",
        n_cross.alias("n_crossings"),
        (n_cross % 2 == 1).alias("inside"))
