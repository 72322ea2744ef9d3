"""Text-analysis operators for LLM training-data pipelines (SURVEY §2.B E23).

Everything here is built from pyspark.sql.functions array/string built-ins
(whole-stage-codegen, no Python in the hot path) over the ``documents``
table: term frequency, per-document quality metrics, heuristic language ID,
and shingle fingerprinting. All four are DuckDB-expressible → hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.scratch import fixed_scratch_dir
from clickhouse_mergetree_spark.tables import load, values_df

TF_TOP_N = 50

# Tiny per-language stopword lists for the n-gram/stopword-vote heuristic.
# Deliberately minimal — the point is the distributed argmax pattern, not
# linguistic accuracy.
_EN_STOP = ("the", "a", "of", "and", "to", "in", "is")
_ES_STOP = ("el", "la", "de", "y", "que", "en", "es")
_DE_STOP = ("der", "die", "das", "und", "zu", "ist", "ein")


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


@declared_query(
    "q_text_tf",
    oracle=f"""
        SELECT token, count(*) AS tf
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY tf DESC, token
        LIMIT {TF_TOP_N}
    """,
)
def q_text_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23: corpus term frequency, top-N tokens.

    explode → partial+final count agg (map-side combine collapses each
    partition's counts before the shuffle) → TakeOrderedAndProject. The
    classic word-count; at 100 TB the only knob is shuffle partitions.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(TF_TOP_N)
    )


@declared_query(
    "q_text_quality",
    oracle="""
        SELECT doc_id,
               length(text) AS n_chars_actual,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_unique,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS unique_ratio,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')) AS avg_token_len,
               CAST(len(list_filter(string_split(text, ' '),
                        t -> list_contains(['the','a','of','and','to','in','is'], t)))
                    AS DOUBLE)
                 / len(string_split(text, ' ')) AS stopword_ratio
        FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23: per-document quality metrics — length, lexical diversity,
    average token length, stopword ratio.

    Standard pre-training quality filters (cf. C4/Gopher rules). Pure
    row-local array arithmetic: zero shuffles, scales embarrassingly.
    All ratios are int/int divisions in double — bit-identical to the
    oracle.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stops = F.array(*[F.lit(w) for w in _EN_STOP])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tokens)
        .alias("unique_ratio"),
        (F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens)
        .alias("avg_token_len"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
    )


@declared_query(
    "q_text_langid",
    oracle=f"""
        SELECT doc_id, lang,
               CASE
                 WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
                 WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
                 WHEN de_hits > 0 THEN 'de'
                 ELSE 'und'
               END AS pred_lang,
               en_hits, es_hits, de_hits
        FROM (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '),
                       t -> list_contains([{_sql_list(_EN_STOP)}], t))) AS en_hits,
                   len(list_filter(string_split(text, ' '),
                       t -> list_contains([{_sql_list(_ES_STOP)}], t))) AS es_hits,
                   len(list_filter(string_split(text, ' '),
                       t -> list_contains([{_sql_list(_DE_STOP)}], t))) AS de_hits
            FROM documents
        )
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23: heuristic language ID by stopword vote, with a deterministic
    argmax tie-break (en > es > de > und). Row-local; no shuffle."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def hits(words: tuple[str, ...]) -> F.Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scored = d.select(
        "doc_id", "lang",
        hits(_EN_STOP).alias("en_hits"),
        hits(_ES_STOP).alias("es_hits"),
        hits(_DE_STOP).alias("de_hits"),
    )
    pred = (
        F.when((F.col("en_hits") >= F.col("es_hits"))
               & (F.col("en_hits") >= F.col("de_hits"))
               & (F.col("en_hits") > 0), F.lit("en"))
        .when((F.col("es_hits") >= F.col("de_hits"))
              & (F.col("es_hits") > 0), F.lit("es"))
        .when(F.col("de_hits") > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )
    return scored.select("doc_id", "lang", pred.alias("pred_lang"),
                         "en_hits", "es_hits", "de_hits")


# Fixed (per-process deterministic) location for the hashed-shingle side
# table: the oracle SQL is a static string built at import time, so the
# path cannot be a per-call mkdtemp. The Spark query overwrites it on
# every run; atexit reclaims it.
_FP_HASH_DIR = fixed_scratch_dir("q_text_fp_hashes")

# The r3→r4 history of this query: r3 used xxhash64 (fast, JVM intrinsic)
# with a rows-only check; r4 switched to per-shingle md5 to make the
# oracle cross-engine replayable and went 0.60s → 3.28s at sf0.1 (md5 per
# 3-gram is the wrong CPU shape at 100 TB). r5 keeps xxhash64 in the hot
# path and verifies via a persisted hashed-shingle parquet instead:
# Spark persists (doc_id, hashes[]) as a side table; DuckDB recomputes
# the min/max/distinct AGGREGATION independently from the persisted
# hashes, and recomputes n_shingles from the RAW TEXT — so a shingling
# bug (missed/extra/mangled shingles) still hash-fails the row even
# though the hash function itself is not replayed in SQL.
_FP_ORACLE = f"""
    WITH persisted AS (
        SELECT doc_id, h
        FROM read_parquet('{_FP_HASH_DIR}/*.parquet')
    ),
    from_text AS (
        SELECT doc_id, count(DISTINCT shingle) AS n_shingles
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2]
                   )) AS shingle
            FROM documents
        )
        GROUP BY doc_id
    )
    SELECT p.doc_id,
           min(p.h) AS fp_min,
           max(p.h) AS fp_max,
           CAST(any_value(t.n_shingles) AS BIGINT) AS n_shingles
    FROM persisted p JOIN from_text t USING (doc_id)
    GROUP BY p.doc_id
"""


@declared_query("q_text_fingerprint", oracle=_FP_ORACLE)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23: shingle-hash document fingerprint (min/max xxhash64 over 3-gram
    shingles — a 1-permutation MinHash). Equal fingerprints ⇒ near-identical
    leading content; used as a cheap pre-filter before full near-dedup.

    CPU shape chosen by measurement at sf0.1 (this query regressed 5.5×
    in r4 when the hash became per-shingle md5 for oracle replay):
    - xxhash64, a JVM intrinsic, ~20× cheaper per shingle than md5;
    - the 3-gram is hashed DIRECTLY from its three tokens via
      multi-argument xxhash64 — the shingle string is never concatenated;
    - NO higher-order-function lambdas: transform()/element_at chains are
      interpreted per element (measured 4.3s single-core), while
      slice + arrays_zip + explode + xxhash64 + hash-aggregate all stay
      inside whole-stage codegen (0.44s, 10×). The one shuffle carries
      per-doc partial (min, max, distinct-hash) states only.
    n_shingles counts distinct shingle HASHES; it equals the oracle's
    text-derived distinct-shingle count unless xxhash64 collides within
    one document (~1e-15 at 10³ shingles/doc). The persisted (doc_id, h)
    side table exists only so the DuckDB oracle can verify shingling +
    aggregation independently (_FP_ORACLE).

    redistribute=False: the per-row work is now cheap codegen (no md5,
    no interpreted lambdas), so the single-row-group widening exchange
    costs more than the map work it parallelizes (measured 3.0s → 0.9s
    at sf0.1). On real multi-file layouts load() adds no exchange and
    the scan parallelizes by itself."""
    d = load(spark, sf_dir, "documents", redistribute=False)
    toks = F.split("text", " ")
    ln = F.greatest(F.size(toks) - 2, F.lit(0))
    tri = F.arrays_zip(
        F.slice(toks, 1, ln).alias("t1"),
        F.slice(toks, 2, ln).alias("t2"),
        F.slice(toks, 3, ln).alias("t3"),
    )
    pairs = d.select("doc_id", F.explode(tri).alias("t")) \
             .select("doc_id", F.xxhash64("t.t1", "t.t2", "t.t3").alias("h"))
    # Persist the (doc_id, h) pairs for the oracle, then aggregate from
    # the lineage: the shingle pass re-runs (it's cheap codegen), which
    # measured faster than a read-back job's scan + scheduling. Either
    # path is verified — a corrupt write would make the oracle's
    # persisted-hash aggregates disagree with the lineage result.
    pairs.write.mode("overwrite").parquet(_FP_HASH_DIR)
    return pairs.groupBy("doc_id").agg(
        F.min("h").alias("fp_min"),
        F.max("h").alias("fp_max"),
        F.countDistinct("h").alias("n_shingles"),
    )


# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs — the
# split shape GPT-2-style byte-pair pre-tokenization produces, minus the
# byte-level details. Chosen so Spark (Java regex) and DuckDB (RE2) agree
# exactly on every input.
_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


@declared_query(
    "q_text_tokens",
    oracle=f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS ws_tokens,
               len(regexp_extract_all(text, '{_TOKEN_RE}')) AS bpe_tokens,
               CAST(length(text) AS DOUBLE)
                 / NULLIF(len(regexp_extract_all(text, '{_TOKEN_RE}')), 0)
                 AS chars_per_token
        FROM documents
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    pre-tokenization (letter/digit/punct runs), plus chars-per-token — the
    standard cost estimator for LLM training corpora. Row-local regex work
    at full map width (content-table redistribute); no shuffle.
    """
    d = load(spark, sf_dir, "documents")
    bpe = F.expr(f"regexp_extract_all(text, '{_TOKEN_RE}', 0)")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(bpe).alias("bpe_tokens"),
        # try_divide: a token-less document (whitespace-only text) yields
        # NULL, not a divide-by-zero under ANSI mode
        F.try_divide(F.length("text").cast("double"), F.size(bpe))
        .alias("chars_per_token"),
    )


_MIN_TOKENS = 10
_MIN_UNIQUE_RATIO = 0.3


@declared_query(
    "q_pipeline_prep",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')) AS unique_ratio,
                   len(list_filter(string_split(text, ' '),
                       t -> list_contains([{_sql_list(_EN_STOP)}], t))) AS en_hits,
                   len(list_filter(string_split(text, ' '),
                       t -> list_contains([{_sql_list(_ES_STOP)}], t))) AS es_hits,
                   len(list_filter(string_split(text, ' '),
                       t -> list_contains([{_sql_list(_DE_STOP)}], t))) AS de_hits
            FROM documents
        ), kept AS (
            SELECT * FROM scored
            WHERE n_tokens >= {_MIN_TOKENS}
              AND unique_ratio >= {_MIN_UNIQUE_RATIO}
              AND en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0
        )
        SELECT sha256(text) AS content_hash,
               min(doc_id) AS keeper_doc,
               count(*) AS n_copies,
               min(n_tokens) AS n_tokens
        FROM kept GROUP BY sha256(text)
    """,
)
def q_pipeline_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep: quality filter → language filter →
    exact dedup, composed as ONE declarative plan.

    The canonical corpus-cleaning pass (C4-style): drop short and
    low-diversity documents, keep predicted-English only (stopword-vote
    argmax, same rule as q_text_langid), then collapse exact duplicates on
    the content hash keeping the lowest doc_id. Because it is one DataFrame
    expression, Catalyst fuses all three row-local filters into the scan
    stage — a document is hashed only if it survives every filter — and the
    single shuffle is the final dedup groupBy on a uniform 256-bit key.
    That plan shape (all filters map-side, one agg shuffle) is exactly what
    you want at 100 TB.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    unique_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens

    def hits(words: tuple[str, ...]) -> F.Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    en, es, de = hits(_EN_STOP), hits(_ES_STOP), hits(_DE_STOP)
    kept = (
        d.select("doc_id", "text", n_tokens.alias("n_tokens"),
                 unique_ratio.alias("unique_ratio"),
                 en.alias("en_hits"), es.alias("es_hits"), de.alias("de_hits"))
        .filter(
            (F.col("n_tokens") >= _MIN_TOKENS)
            & (F.col("unique_ratio") >= _MIN_UNIQUE_RATIO)
            & (F.col("en_hits") >= F.col("es_hits"))
            & (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") > 0)
        )
    )
    return kept.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.min("doc_id").alias("keeper_doc"),
        F.count("*").alias("n_copies"),
        F.min("n_tokens").alias("n_tokens"),
    )


@declared_query(
    "q_sample_deterministic",
    oracle="""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE substring(md5(text), 1, 1) IN ('0', '1')
    """,
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling — a 2/16 sample keyed on the md5
    prefix of the document text.

    The reproducible alternative to df.sample() for pipeline debugging and
    A/B corpus cuts: the same document lands in the same bucket on every
    engine, every run, every cluster size (sampling by VALUE, not by
    position or RNG), and the filter is row-local so it composes with any
    downstream operator without a shuffle. Rate tuning = widening the
    prefix set (1/16 granularity per hex char).
    """
    d = load(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5("text"), 1, 1).isin("0", "1")
    ).select("doc_id", "lang", "n_chars")


TFIDF_TOP_N = 50


@declared_query(
    "q_text_tfidf",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, token,
               round(tf * ln(CAST(n_docs AS DOUBLE) / df), 9) AS tfidf
        FROM tf JOIN df USING (token), n
        ORDER BY tfidf DESC, doc_id, token
        LIMIT {TFIDF_TOP_N}
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23: tf-idf — top-N (doc, token) scores across the corpus.

    Three aggregations sharing one tokenized scan: per-doc term frequency,
    corpus document frequency, and the doc count; the df side is a
    token-level aggregate (small — vocabulary-sized) and is broadcast into
    the join, so the only large shuffle is the (doc_id, token) tf groupBy.
    The doc count enters as a broadcast 1-row aggregate cross-joined into
    the plan — ONE job end-to-end, no separate driver-side count action.
    Top-N plans as TakeOrderedAndProject — per-partition heaps, no global
    sort.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df"))
    # the count joins in as a broadcast 1-row nested loop: O(n·1), the
    # one shape where a nested-loop join is the right plan (whitelisted
    # in tests/test_plan_shapes.py alongside q_sim_search's 1-row probe)
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    score = F.round(
        F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 9)
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "token", score.alias("tfidf"))
        .orderBy(F.col("tfidf").desc(), "doc_id", "token")
        .limit(TFIDF_TOP_N)
    )


PMI_MIN_COUNT = 5
PMI_TOP_N = 200


@declared_query(
    "q_text_bigram_pmi",
    oracle=f"""
        WITH toks AS (
            SELECT string_split(text, ' ') AS t FROM documents
        ), bigrams AS (
            SELECT unnest(list_transform(
                       range(1, len(t)),
                       i -> t[i] || ' ' || t[i + 1])) AS bigram
            FROM toks
        ), unigrams AS (
            SELECT unnest(t) AS token FROM toks
        ), bc AS (
            SELECT bigram, count(*) AS c_ab FROM bigrams GROUP BY bigram
        ), uc AS (
            SELECT token, count(*) AS c FROM unigrams GROUP BY token
        ), nb AS (SELECT count(*) AS n_b FROM bigrams),
           nu AS (SELECT count(*) AS n_u FROM unigrams)
        SELECT bc.bigram, bc.c_ab,
               round(ln((CAST(bc.c_ab AS DOUBLE) / n_b)
                        / ((CAST(a.c AS DOUBLE) / n_u)
                           * (CAST(b.c AS DOUBLE) / n_u))), 6) + 0.0 AS pmi
        FROM bc, nb, nu
        JOIN uc a ON a.token = string_split(bc.bigram, ' ')[1]
        JOIN uc b ON b.token = string_split(bc.bigram, ' ')[2]
        WHERE bc.c_ab >= {PMI_MIN_COUNT}
        ORDER BY pmi DESC, bigram
        LIMIT {PMI_TOP_N}
    """,
)
def q_text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23+: bigram collocation mining via pointwise mutual information —
    PMI(a,b) = ln(P(ab) / (P(a)·P(b))) over adjacent token pairs, the
    classic phrase/tokenizer-vocab discovery pass in LLM data pipelines
    (adjacent bigrams, not windowed pairs, so the work is LINEAR in
    corpus size — the scale-sane collocation formulation).

    One tokenized scan feeds both the bigram and unigram aggregates; the
    count tables are vocabulary-sized, so the bigram→unigram joins
    broadcast, and the corpus totals enter as broadcast 1-row aggregates
    — the only data-sized shuffles are the two count groupBys, both with
    map-side partial aggregation. PMI is rounded to 6 dp: ln() may
    differ in the last ulp across engines' libm.
    """
    d = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    toks = d.select(t.alias("t"))
    bigrams = toks.select(F.explode(F.zip_with(
        F.slice("t", 1, F.size("t") - 1),
        F.slice("t", 2, F.size("t") - 1),
        lambda a, b: F.concat_ws(" ", a, b))).alias("bigram"))
    unigrams = toks.select(F.explode("t").alias("token"))
    bc = bigrams.groupBy("bigram").agg(F.count("*").alias("c_ab"))
    uc = unigrams.groupBy("token").agg(F.count("*").alias("c"))
    nb = bigrams.agg(F.count("*").cast("double").alias("n_b"))
    nu = unigrams.agg(F.count("*").cast("double").alias("n_u"))
    a_tok = F.split(F.col("bigram"), " ")[0]
    b_tok = F.split(F.col("bigram"), " ")[1]
    pmi = F.round(F.log(
        (F.col("c_ab") / F.col("n_b"))
        / ((F.col("a_c") / F.col("n_u")) * (F.col("b_c") / F.col("n_u")))),
        6) + F.lit(0.0)
    return (
        bc.filter(F.col("c_ab") >= PMI_MIN_COUNT)
        .join(F.broadcast(uc.select(F.col("token").alias("a_t"),
                                    F.col("c").alias("a_c"))),
              a_tok == F.col("a_t"))
        .join(F.broadcast(uc.select(F.col("token").alias("b_t"),
                                    F.col("c").alias("b_c"))),
              b_tok == F.col("b_t"))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select("bigram", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(PMI_TOP_N)
    )


# ---------------------------------------------------------------------------
# Round 5: repetition quality + benchmark-contamination screening
# ---------------------------------------------------------------------------

@declared_query(
    "q_text_repetition",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        tok AS (SELECT doc_id, unnest(tk) AS w FROM t),
        tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
        tt AS (SELECT doc_id, max(c) AS top_token_n FROM tc GROUP BY doc_id),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tk)),
                          i -> tk[i] || ' ' || tk[i+1])) AS b
            FROM t WHERE len(tk) >= 2
        ),
        bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        bt AS (SELECT doc_id, max(c) AS top_bigram_n FROM bc GROUP BY doc_id)
        SELECT t.doc_id,
               len(tk) AS n_tokens,
               len(list_distinct(tk)) AS n_distinct,
               tt.top_token_n,
               coalesce(bt.top_bigram_n, 0) AS top_bigram_n,
               round(1.0 - len(list_distinct(tk)) * 1.0 / len(tk), 9)
                   AS dup_frac
        FROM t
        JOIN tt ON tt.doc_id = t.doc_id
        LEFT JOIN bt ON bt.doc_id = t.doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition screening (Rae et al. 2021 §A1.1): the
    within-document repetition signals used to drop boilerplate/spam from
    LLM training corpora — most-frequent-token count, most-frequent-bigram
    count, and the duplicate-token fraction 1 − |distinct|/|tokens|.

    Plan shape: one explode per gram order feeding a partial+final count
    agg keyed on (doc_id, gram) — fine-grained keys, no skew, map-side
    combine collapses each partition's repeats before the exchange. The
    per-doc argmax is a second tiny agg on doc_id; the row-local stats
    (n_tokens, n_distinct) ride along without any shuffle. At 100 TB each
    doc's grams stay row-local until the count agg, and every shuffle key
    includes doc_id — parallelism is per-document, never corpus-global.
    """
    d = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    base = d.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        t.alias("tk"),
    )
    top_tok = (
        base.select("doc_id", F.explode("tk").alias("w"))
        .groupBy("doc_id", "w").agg(F.count("*").alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("top_token_n"))
    )
    bigrams = F.zip_with(
        F.slice("tk", 1, F.size("tk") - 1),
        F.slice("tk", 2, F.size("tk") - 1),
        lambda a, b: F.concat_ws(" ", a, b))
    top_bg = (
        base.filter(F.size("tk") >= 2)
        .select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b").agg(F.count("*").alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("top_bigram_n"))
    )
    return (
        base.drop("tk")
        .join(top_tok, "doc_id")
        .join(top_bg, "doc_id", "left")
        .select(
            "doc_id", "n_tokens", "n_distinct", "top_token_n",
            F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
            F.round(
                F.lit(1.0)
                - F.col("n_distinct") * F.lit(1.0) / F.col("n_tokens"),
                9).alias("dup_frac"),
        )
    )


# Benchmark-contamination screening: which "training" documents contain
# 3-gram overlap with a held-out benchmark partition. The benchmark here is
# the source='src0' slice of the corpus — in production it would be the
# eval-suite text (GSM8K/MMLU/...), which is always tiny relative to the
# corpus, hence the broadcast membership join.
CONTAM_BENCH_SOURCE = "src0"


@declared_query(
    "q_contamination",
    oracle=f"""
        WITH sh AS (
            SELECT DISTINCT doc_id, source, shingle FROM (
                SELECT doc_id, source,
                       unnest(list_transform(
                           range(1, len(string_split(text, ' ')) - 1),
                           i -> string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2]
                       )) AS shingle
                FROM documents)
        ),
        bench AS (SELECT DISTINCT shingle FROM sh
                  WHERE source = '{CONTAM_BENCH_SOURCE}'),
        ev AS (SELECT doc_id, shingle FROM sh
               WHERE source <> '{CONTAM_BENCH_SOURCE}')
        SELECT ev.doc_id,
               count(*) AS n_shingles,
               count(b.shingle) AS n_contaminated,
               round(count(b.shingle) * 1.0 / count(*), 9)
                   AS contamination_frac
        FROM ev LEFT JOIN bench b ON ev.shingle = b.shingle
        GROUP BY ev.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check (the n-gram overlap decontamination
    step of GPT-3/Llama-style corpus prep): for every training document,
    the fraction of its distinct 3-gram shingles that appear anywhere in
    the benchmark partition (source='src0' stands in for eval-suite text).

    Plan shape: the benchmark's distinct-shingle set is aggregated once
    and BROADCAST — eval suites are KBs-to-MBs while the corpus is TBs, so
    the membership probe is a broadcast hash join against the full-width
    corpus scan; the only shuffle is the per-doc count agg on doc_id.
    Identical 3-gram definition to the dedup family (dedup._shingles);
    string shingles (not xxhash64) so the oracle replays membership
    byte-for-byte — production would hash both sides to 8-byte keys.
    """
    from clickhouse_mergetree_spark.operators.dedup import _shingles

    docs = load(spark, sf_dir, "documents")
    bench_sh = (
        _shingles(docs.filter(F.col("source") == CONTAM_BENCH_SOURCE),
                  hashed=False)
        .select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    eval_sh = _shingles(docs.filter(F.col("source") != CONTAM_BENCH_SOURCE),
                        hashed=False)
    return (
        eval_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("hit").alias("n_contaminated"),
            F.round(F.count("hit") * F.lit(1.0) / F.count("*"), 9)
            .alias("contamination_frac"),
        )
    )


@declared_query(
    "q_source_mix",
    oracle="""
        WITH s AS (
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY source
        ),
        t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM s)
        SELECT source, n_docs, n_tokens,
               round(n_tokens * 1.0 / total, 9) AS token_share
        FROM s, t
    """,
)
def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture report: per-source document and token counts plus
    each source's share of total corpus tokens — the number every data
    recipe (The Pile, Dolma, RefinedWeb) is specified in, and the first
    thing checked after any filtering stage shifts the mixture.

    One partial+final agg on source (token counting is row-local before
    the agg), then the corpus total joins back as a BROADCAST 1-row
    aggregate — the same O(n·1) pattern as q_text_tfidf's document count;
    no second scan of the corpus and no single-partition window.
    """
    d = load(spark, sf_dir, "documents")
    s = (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        )
    )
    total = s.agg(F.sum("n_tokens").alias("total"))
    return (
        s.crossJoin(F.broadcast(total))
        .select(
            "source", "n_docs", "n_tokens",
            F.round(F.col("n_tokens") * F.lit(1.0) / F.col("total"), 9)
            .alias("token_share"),
        )
    )


# Mixture rates: sources with an even number keep 2/16 of docs, odd keep
# 8/16 — standing in for a per-domain sampling-rate config table.
_STRAT_RATES = tuple((f"src{i}", 2 if i % 2 == 0 else 8) for i in range(20))


@declared_query(
    "q_sample_stratified",
    oracle=f"""
        WITH rates(source, n_buckets) AS (VALUES
            {", ".join(f"('{s}', {n})" for s, n in _STRAT_RATES)}
        )
        SELECT d.doc_id, d.source, d.lang, d.n_chars
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE strpos('0123456789abcdef', substring(md5(d.text), 1, 1)) - 1
              < r.n_buckets
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: each source keeps a per-domain
    fraction of documents (2/16 or 8/16 here), sampled by content hash —
    how a training mixture is re-weighted (downsample boilerplate web,
    upsample books/code) while staying reproducible across engines, runs,
    and cluster sizes.

    The rate table is a broadcast dimension (a mixture config is tens of
    rows); the bucket test is row-local on the first md5 hex digit, so
    the whole operator is scan → broadcast hash join → filter with no
    shuffle of the corpus at any scale.
    """
    d = load(spark, sf_dir, "documents")
    rates = values_df(spark, list(_STRAT_RATES),
                      [("source", "string"), ("n_buckets", "int")])
    digit = F.substring(F.md5("text"), 1, 1)
    return (
        d.join(F.broadcast(rates), "source")
        .filter(F.conv(digit, 16, 10).cast("int") < F.col("n_buckets"))
        .select("doc_id", "source", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# Round 5 (cont.): entropy quality, PII scrubbing, line-level boilerplate
# ---------------------------------------------------------------------------

@declared_query(
    "q_text_entropy",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct,
               round(log2(CAST(sum(c) AS DOUBLE))
                     - sum(c * log2(CAST(c AS DOUBLE)))
                       / CAST(sum(c) AS DOUBLE), 9) + 0.0 AS entropy,
               CASE WHEN count(*) > 1 THEN
                   round((log2(CAST(sum(c) AS DOUBLE))
                          - sum(c * log2(CAST(c AS DOUBLE)))
                            / CAST(sum(c) AS DOUBLE))
                         / log2(CAST(count(*) AS DOUBLE)), 9) + 0.0
               ELSE 0.0 END AS norm_entropy
        FROM tc GROUP BY doc_id
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document — the cheap
    perplexity proxy used as a quality screen (low entropy = repetitive
    boilerplate/spam; cf. the Gopher rules' repetition family, which this
    complements with a single scalar).

    Uses the identity H = log2(n) − (Σ c·log2 c)/n so the whole metric is
    two count aggs: explode → (doc_id, token) counts (map-side combine)
    → per-doc sum/count. Both shuffle keys include doc_id — per-document
    parallelism, no corpus-global state, no skew at any corpus size.
    """
    d = load(spark, sf_dir, "documents")
    tc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    )
    agg = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c") * F.log2("c")).alias("s"),
    )
    h = (F.log2(F.col("n_tokens").cast("double"))
         - F.col("s") / F.col("n_tokens").cast("double"))
    return agg.select(
        "doc_id", "n_tokens", "n_distinct",
        (F.round(h, 9) + F.lit(0.0)).alias("entropy"),
        F.when(F.col("n_distinct") > 1,
               F.round(h / F.log2(F.col("n_distinct").cast("double")), 9)
               + F.lit(0.0))
        .otherwise(F.lit(0.0)).alias("norm_entropy"),
    )


# PII patterns — deliberately simple character-class regexes that parse
# identically under Java regex (Spark) and RE2 (DuckDB): no lookaround,
# no backreferences, no shorthand classes beyond \\d.
PII_EMAIL = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
PII_IP = r"\d+\.\d+\.\d+\.\d+"
PII_PHONE = r"555-\d{4}"

# The synthetic corpus contains no organic PII, so the screen injects a
# deterministic PII suffix derived from doc_id (docs ≡ 2 mod 3 stay
# clean) and then detects/redacts it — the operator and the oracle still
# verify the real regex semantics end-to-end on both engines.
_PII_SUFFIX_SQL = """
    CASE doc_id % 3
      WHEN 0 THEN text || ' contact bob' || CAST(doc_id AS VARCHAR)
                  || '@mail.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.7'
      WHEN 1 THEN text || ' call 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' or alice@corp.net'
      ELSE text
    END
"""


@declared_query(
    "q_pii_scrub",
    oracle=f"""
        WITH p AS (SELECT doc_id, {_PII_SUFFIX_SQL} AS pii_text
                   FROM documents),
        r AS (
            SELECT doc_id, pii_text,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(pii_text,
                               '{PII_EMAIL}', '<EMAIL>', 'g'),
                           '{PII_IP}', '<IP>', 'g'),
                       '{PII_PHONE}', '<PHONE>', 'g') AS clean
            FROM p
        )
        SELECT doc_id,
               len(regexp_extract_all(pii_text, '{PII_EMAIL}')) AS n_email,
               len(regexp_extract_all(pii_text, '{PII_IP}')) AS n_ip,
               len(regexp_extract_all(pii_text, '{PII_PHONE}')) AS n_phone,
               length(clean) AS n_chars_clean,
               md5(clean) AS clean_hash
        FROM r
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction screen (emails, IPv4 addresses, phone
    numbers) — the compliance pass every training corpus goes through
    before tokenization. Counts each PII type per document and replaces
    matches with typed placeholder tags; the full redacted text is
    verified across engines by md5.

    Entirely row-local regexp work inside whole-stage codegen — zero
    shuffles, scales embarrassingly; at 100 TB this runs as a pure map
    stage fused into whatever scan feeds it. Patterns are kept to the
    regex subset Java and RE2 interpret identically (docstring above).
    """
    d = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    pii_text = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit(" contact bob"), did,
                        F.lit("@mail.com at 10.0."),
                        (F.col("doc_id") % 256).cast("string"),
                        F.lit(".7")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.col("text"), F.lit(" call 555-"),
                       F.lpad((F.col("doc_id") % 10000).cast("string"),
                              4, "0"),
                       F.lit(" or alice@corp.net")))
        .otherwise(F.col("text"))
    )
    p = d.select("doc_id", pii_text.alias("pii_text"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("pii_text", PII_EMAIL, "<EMAIL>"),
            PII_IP, "<IP>"),
        PII_PHONE, "<PHONE>")
    return p.select(
        "doc_id",
        F.regexp_count("pii_text", F.lit(PII_EMAIL)).alias("n_email"),
        F.regexp_count("pii_text", F.lit(PII_IP)).alias("n_ip"),
        F.regexp_count("pii_text", F.lit(PII_PHONE)).alias("n_phone"),
        F.length(clean).alias("n_chars_clean"),
        F.md5(clean).alias("clean_hash"),
    )


# C4-style line unit: the corpus has no newlines, so a "line" is a fixed
# 10-token window — the same stand-in the substring-dedup screen uses.
LINE_TOKENS = 10


@declared_query(
    "q_boilerplate_lines",
    oracle=f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
                   FROM documents),
        l0 AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(CAST(ceil(len(tk) / {LINE_TOKENS}.0) AS BIGINT)),
                       i -> struct_pack(
                           line_idx := i,
                           line := array_to_string(
                               tk[(i*{LINE_TOKENS}+1):(i*{LINE_TOKENS}+{LINE_TOKENS})],
                               ' ')))) AS u
            FROM t
        ),
        l AS (SELECT doc_id, u.line_idx AS line_idx, u.line AS line,
                     doc_id * 1000000 + u.line_idx AS k
              FROM l0),
        keeper AS (SELECT line, min(k) AS kk FROM l GROUP BY line),
        j AS (SELECT l.doc_id, l.line_idx, l.line, (l.k = keeper.kk) AS kept
              FROM l JOIN keeper ON l.line = keeper.line)
        SELECT doc_id,
               count(*) AS n_lines,
               CAST(count(*) - sum(CASE WHEN kept THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_lines,
               CAST(coalesce(sum(CASE WHEN kept
                        THEN len(string_split(line, ' ')) END), 0)
                    AS BIGINT) AS n_kept_tokens,
               md5(coalesce(string_agg(line, ' ' ORDER BY line_idx)
                            FILTER (WHERE kept), '')) AS clean_hash
        FROM j GROUP BY doc_id
    """,
)
def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-global line deduplication: every distinct line is
    kept only at its FIRST occurrence (lowest doc_id, then line position);
    later occurrences are boilerplate and dropped. Reports per-doc kept /
    dropped line counts and an md5 of the cleaned document, so the full
    reconstruction is cross-engine verified.

    Plan: row-local chunking into {LINE_TOKENS}-token lines (posexplode),
    one groupBy(line) min-agg to elect keepers (map-side combine eats
    per-partition repeats of hot boilerplate lines), one hash join back
    on line, one per-doc agg. The keeper key packs (doc_id, line_idx)
    into a single BIGINT for engine-identical min semantics — at real
    corpus scale use min(struct(doc_id, line_idx)) or a 128-bit pack;
    the packing bound (line_idx < 1e6) is asserted by construction here.
    """
    d = load(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    n_lines = F.ceil(F.size("tk") / F.lit(float(LINE_TOKENS))).cast("int")
    lines = (
        d.select("doc_id", tk.alias("tk"))
        .select("doc_id", F.posexplode(F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(
                F.slice("tk", i * LINE_TOKENS + 1, LINE_TOKENS), " "),
        )).alias("line_idx", "line"))
        .withColumn("k", F.col("doc_id") * 1000000 + F.col("line_idx"))
    )
    keeper = lines.groupBy("line").agg(F.min("k").alias("kk"))
    j = (
        lines.join(keeper, "line")
        .select("doc_id", "line_idx", "line",
                (F.col("k") == F.col("kk")).alias("kept"))
    )
    kept_struct = F.when(
        F.col("kept"), F.struct("line_idx", "line"))
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        (F.count("*") - F.sum(F.when(F.col("kept"), 1).otherwise(0)))
        .alias("n_dup_lines"),
        F.coalesce(
            F.sum(F.when(F.col("kept"),
                         F.size(F.split("line", " ")))), F.lit(0))
        .alias("n_kept_tokens"),
        F.md5(F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x.getField("line")), " "))
        .alias("clean_hash"),
    )


# --------------------------------------------------------------------------
# Sequence packing + corpus shuffle — the two order-sensitive steps of a
# training-data pipeline (everything upstream is set-oriented; these two
# define the byte order the trainer actually consumes).
# --------------------------------------------------------------------------

PACK_BUDGET = 2048  # tokens per packed context window


@declared_query(
    "q_token_pack",
    oracle=f"""
        WITH t AS (
            SELECT source, doc_id,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), c AS (
            SELECT source, doc_id, n_tokens,
                   CAST(coalesce(sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS cum_before
            FROM t
        )
        SELECT source, doc_id, n_tokens,
               cum_before // {PACK_BUDGET} AS pack_id,
               cum_before % {PACK_BUDGET} AS pack_offset
        FROM c
    """,
)
def q_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents shard-by-shard in
    deterministic (doc_id) order and cut every {PACK_BUDGET} tokens —
    each doc is assigned the pack in which it STARTS, plus its token
    offset inside that pack. This is the contiguous-packing layout
    trainers consume (docs are not reordered to fill bins — greedy
    best-fit packing is inherently sequential and changes data order;
    contiguous packing is what large pipelines actually ship).

    Scale: one window per `source` shard — the cumulative sum is a
    running aggregate within each shard's sort order, so the shuffle is
    hash(source) and each shard packs independently, exactly how a
    1000-executor run would pack per input shard. No global sort, no
    driver state.
    """
    d = load(spark, sf_dir, "documents")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.size(F.split("text", " "))).over(w), F.lit(0)
    ).cast("long")
    return (
        d.select(
            "source", "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            cum_before.alias("cum_before"),
        )
        .select(
            "source", "doc_id", "n_tokens",
            F.expr(f"cum_before div {PACK_BUDGET}").alias("pack_id"),
            (F.col("cum_before") % PACK_BUDGET).alias("pack_offset"),
        )
    )


SHUFFLE_SEED = "epoch0"
N_SHARDS = 8


@declared_query(
    "q_corpus_shuffle",
    oracle=f"""
        WITH k AS (
            SELECT doc_id,
                   md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR))
                     AS shuffle_key
            FROM documents
        ), p AS (
            SELECT doc_id, shuffle_key,
                   row_number() OVER (ORDER BY shuffle_key, doc_id) - 1
                     AS pos
            FROM k
        )
        SELECT doc_id, shuffle_key,
               pos % {N_SHARDS} AS shard,
               pos // {N_SHARDS} AS pos_in_shard
        FROM p
    """,
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: order documents by
    md5(seed || doc_id) — a keyed permutation that is stable across
    engines, runs, and partitionings (rand() is none of those) — then
    deal them round-robin into {N_SHARDS} shards. Changing the seed
    string re-shuffles for the next epoch without touching the data.

    Scale note: the row_number over a global order is the one
    inherently-global step of shuffling; at 100 TB you'd range-partition
    on shuffle_key (md5 is uniform, so equal-width hex ranges are
    balanced) and compute per-range offsets from partition counts — the
    semantics here (position in the md5 order) are exactly that layout's
    output, and the oracle pins them.
    """
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit(f"{SHUFFLE_SEED}:"),
                         F.col("doc_id").cast("string")))
    pos = (
        F.row_number().over(W.orderBy("shuffle_key", "doc_id")) - 1
    ).cast("long")
    return (
        d.select("doc_id", key.alias("shuffle_key"))
        .select("doc_id", "shuffle_key", pos.alias("pos"))
        .select(
            "doc_id", "shuffle_key",
            (F.col("pos") % N_SHARDS).alias("shard"),
            F.expr(f"pos div {N_SHARDS}").alias("pos_in_shard"),
        )
    )


@declared_query(
    "q_text_perplexity",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        ),
        big AS (
            SELECT doc_id, w AS w1,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks
        ),
        bg AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1)
        SELECT doc_id, count(*) AS n_bigrams,
               round(avg(-ln(CAST(c12 AS DOUBLE) / c1)), 6) + 0.0 AS surprisal
        FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        GROUP BY doc_id
    """,
)
def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality scoring (the KenLM-perplexity screen of
    CCNet/RedPajama, self-trained): a word-bigram model is fit on the
    corpus itself — P(w2|w1) = c(w1,w2)/c(w1) — and every document is
    scored by its mean bigram surprisal, avg(-ln P). High scores mark
    text whose word transitions are rare in the corpus: boilerplate-free
    gibberish, OCR noise, wrong-language fragments — the standard
    "perplexity filter" knob in LLM data pipelines.

    Spark-first shape: tokenize via the corpus-standard space split,
    bigrams from one lead() window per doc, model = two partial+final
    count aggregates (the model is a DataFrame, never driver-side), then
    two equi-joins to score. Every stage shuffles on bounded keys (doc,
    bigram, unigram); at 100 TB the model tables are vocabulary-sized —
    orders smaller than the corpus — and Spark's AQE broadcast-converts
    them when they fit. Self-scoring is deliberately leave-in: the
    standard pipeline trains on a reference corpus, which here IS the
    corpus, keeping the oracle exactly replayable."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    big = toks.select(
        "doc_id", F.col("w").alias("w1"),
        F.lead("w").over(
            W.partitionBy("doc_id").orderBy("pos")).alias("w2"))
    bg = big.filter(F.col("w2").isNotNull())
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    return (
        bg.join(c12, ["w1", "w2"]).join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.round(F.avg(-F.log(F.col("c12").cast("double")
                                  / F.col("c1"))), 6)
             + F.lit(0.0)).alias("surprisal"))
    )


QM_VOCAB = 256


@declared_query(
    "q_quality_model",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        alpha AS (
            SELECT doc_id, tok FROM toks
            WHERE regexp_matches(tok, '^[a-z]+$')
        ),
        vocab AS (
            SELECT tok,
                   (length(tok) * 37 + ascii(tok)) % 21 - 10 AS w_int
            FROM (
                SELECT tok, count(DISTINCT doc_id) AS df
                FROM alpha GROUP BY tok
                ORDER BY df DESC, tok LIMIT {QM_VOCAB}
            )
        )
        SELECT a.doc_id,
               count(*) AS n_tokens,
               count(v.w_int) AS n_vocab_hits,
               sum(COALESCE(v.w_int, 0)) / (10.0 * count(*)) AS score,
               CASE WHEN sum(COALESCE(v.w_int, 0)) > 0
                    THEN 1 ELSE 0 END AS keep
        FROM alpha a LEFT JOIN vocab v USING (tok)
        GROUP BY a.doc_id
    """,
)
def q_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (fastText-classifier pipeline shape —
    LLM-data extension): score every document with a linear model over
    lexical token features and emit a keep/drop verdict — the
    "classifier filter" stage every production corpus pass runs after
    the cheap heuristic screens (q_text_quality).

    The model is a (token -> weight) table over the corpus's top-{QM_VOCAB}
    document-frequency tokens; weights here are a deterministic function
    of the token string so the oracle can recompute them exactly (a
    trained model would ship the same shape: a small weights table).
    Scoring is the scalable idiom for "apply a bag-of-words model at
    100 TB": explode to tokens, BROADCAST-join the node-memory-sized
    weights table onto the token stream (map-side, no fact shuffle),
    then one partial+final agg keyed by doc_id — the only exchange.
    Out-of-vocabulary tokens contribute 0, exactly like a hashed linear
    model's missing buckets. The score stays rational (integer weight
    sum / 10.0·n) so both engines produce bit-identical doubles."""
    d = load(spark, sf_dir, "documents")
    alpha = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok").rlike("^[a-z]+$"))
    w_int = ((F.length("tok") * 37 + F.ascii("tok")) % 21 - 10).alias("w_int")
    vocab = (
        alpha.distinct()
        .groupBy("tok").agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "tok").limit(QM_VOCAB)
        .select("tok", w_int)
    )
    sum_w = F.sum(F.coalesce("w_int", F.lit(0)))
    return (
        alpha.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count("w_int").alias("n_vocab_hits"),
            (sum_w / (F.lit(10.0) * F.count("*"))).alias("score"),
            F.when(sum_w > 0, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
        )
    )


BPE_TOP_PAIRS = 30


@declared_query(
    "q_bpe_pairs",
    oracle=f"""
        WITH freq AS (
            SELECT w, count(*) AS c
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
                      AS w
                  FROM documents)
            WHERE length(w) >= 2
            GROUP BY w
        ), pairs AS (
            SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, c
            FROM (SELECT w, c,
                         unnest(generate_series(1, length(w) - 1)) AS i
                  FROM freq)
        )
        SELECT pair, CAST(sum(c) AS BIGINT) AS n
        FROM pairs
        GROUP BY pair
        ORDER BY n DESC, pair
        LIMIT {BPE_TOP_PAIRS}
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training step: corpus-wide adjacent-symbol pair
    counts — the statistic the first merge rule of byte-pair encoding is
    chosen from (Sennrich et al. 2016, the tokenizer behind most LLM
    vocabularies).

    The scale trick is the one real BPE trainers use: collapse the corpus
    to the VOCABULARY first (word → frequency, one shuffle proportional
    to corpus size), then enumerate character pairs over distinct words
    only, weighted by word frequency — pair counting costs O(vocab ×
    word-length), not O(corpus), so at 100 TB the expensive stage is a
    single map-side-combined word count and the pair stage runs on a
    few-million-row vocab table. Pair expansion is transform(sequence)
    + explode, all codegen, no Python.
    """
    d = load(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w")
    ).filter(F.length("w") >= 2)
    freq = words.groupBy("w").agg(F.count("*").alias("c"))
    pairs = freq.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1),"
                   " i -> substring(w, i, 2))")
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair").agg(F.sum("c").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(BPE_TOP_PAIRS)
    )


MIX_ALPHA = 0.7          # mixture temperature (GPT-3/PaLM convention)
MIX_BUDGET = 100_000     # target documents in the mixed corpus


@declared_query(
    "q_mix_temperature",
    oracle=f"""
        WITH counts AS (
            SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        ), probs AS (
            SELECT source, n_docs,
                   n_docs * 1.0 / sum(n_docs) OVER () AS p,
                   pow(n_docs * 1.0 / sum(n_docs) OVER (), {MIX_ALPHA})
                       AS wt
            FROM counts
        )
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               round(p, 9) AS p_raw,
               round(wt / sum(wt) OVER (), 9) AS w_mix,
               CAST(floor(wt / sum(wt) OVER () * {MIX_BUDGET}) AS BIGINT)
                   AS budget_docs
        FROM probs
    """,
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data-mixture weights (the GPT-3/PaLM mixing
    rule: sample source i with weight p_i^α / Σ p_j^α, α<1 upweights
    small high-quality sources without drowning the head) plus the
    per-source document budget it implies at a target corpus size — the
    planning step every LLM pretraining data recipe starts from.

    One corpus-sized shuffle (the per-source count); everything after
    runs on |sources| rows, where the unpartitioned windows are free —
    at 100 TB the mixture math costs the same as at 100 MB. The weights
    then DRIVE q_sample_deterministic-style hash sampling per source;
    this query is the exact-arithmetic contract for that driver table
    (round(9) absorbs pow()'s last-ulp differences across engines).
    """
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    w_all = W.partitionBy()
    p = F.col("n_docs") / F.sum("n_docs").over(w_all)
    wt = F.pow(p, F.lit(MIX_ALPHA))
    w_mix = wt / F.sum(wt).over(w_all)
    return counts.select(
        "source", "n_docs",
        F.round(p, 9).alias("p_raw"),
        F.round(w_mix, 9).alias("w_mix"),
        F.floor(w_mix * MIX_BUDGET).cast("bigint").alias("budget_docs"),
    )


CHUNK_TOKENS = 40        # tokens per chunk
CHUNK_STRIDE = 30        # tokens between chunk starts (25% overlap)


@declared_query(
    "q_doc_chunks",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS tk
            FROM documents
        ), starts AS (
            SELECT doc_id, tk,
                   unnest(generate_series(
                       1, greatest(len(tk) - {CHUNK_TOKENS // 2}, 1),
                       {CHUNK_STRIDE})) AS s
            FROM toks
        )
        SELECT doc_id, CAST((s - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               CAST(s AS BIGINT) AS tok_start,
               CAST(least(s + {CHUNK_TOKENS} - 1, len(tk)) AS BIGINT)
                   AS tok_end,
               array_to_string(tk[CAST(s AS INTEGER):
                   CAST(least(s + {CHUNK_TOKENS} - 1, len(tk))
                        AS INTEGER)], ' ') AS chunk_text
        FROM starts
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (the RAG / embedding-
    pipeline prep step: every embedding index is built over chunks, not
    documents): fixed 40-token windows advancing by a 30-token
    stride (25% overlap so no boundary sentence is lost), each chunk
    carrying its (doc_id, chunk_id, token span, text). Tail windows
    shorter than half a chunk merge into the previous one (no
    fragment-chunks of 3 tokens).

    Entirely row-local: tokenize once per document (materialized column,
    not re-split per window), generate start offsets with sequence(),
    slice per offset — zero shuffles, embarrassingly parallel, the same
    plan at 100 TB. Chunk ids are derived from offsets (deterministic,
    engine-independent), not from any row numbering.
    """
    d = load(spark, sf_dir, "documents")
    tk = F.col("__tk")
    n = F.size(tk)
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(CHUNK_TOKENS // 2), F.lit(1)),
        F.lit(CHUNK_STRIDE))
    end = F.least(F.col("s") + CHUNK_TOKENS - 1, F.size(tk))
    return (
        d.withColumn("__tk", F.split("text", " "))
        .select("doc_id", tk.alias("__tk"),
                F.explode(starts).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / CHUNK_STRIDE).cast("bigint")
            .alias("chunk_id"),
            F.col("s").cast("bigint").alias("tok_start"),
            end.cast("bigint").alias("tok_end"),
            F.concat_ws(" ", F.slice(F.col("__tk"), F.col("s"),
                                     end - F.col("s") + 1))
            .alias("chunk_text"),
        )
    )


CURRICULUM_BANDS = 5


@declared_query(
    "q_curriculum_order",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, n_chars,
                   ntile({CURRICULUM_BANDS}) OVER (ORDER BY n_chars, doc_id)
                     AS band,
                   md5(CAST(doc_id AS VARCHAR) || ':curriculum')
                     AS shuffle_key
            FROM documents
        )
        SELECT doc_id, CAST(band AS INT) AS band,
               CAST(row_number() OVER (ORDER BY band, shuffle_key, doc_id)
                    AS BIGINT) AS position
        FROM scored
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training: documents banded easy→hard by a
    difficulty proxy (length, the standard first-order curriculum
    signal), then deterministically SHUFFLED within each band — the
    "sorted between bands, random within" layout curriculum-learning
    data loaders consume. The shuffle key is a seeded hash of doc_id, so
    the order is reproducible run-to-run and engine-to-engine (the
    q_corpus_shuffle contract: md5 of the seeded id, identical text on
    both engines).

    Two global sorts over (doc_id, n_chars)-wide rows — the honest cost
    of a total order, exactly what writing the final dataset requires
    anyway; no data moves besides the ids. Band count is fixed; at
    100 TB the banding degrades gracefully to range-partitioned writes
    per band with the same keys.
    """
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.ntile(CURRICULUM_BANDS)
        .over(W.orderBy("n_chars", "doc_id")).alias("band"),
        F.md5(F.concat(F.col("doc_id").cast("string"),
                       F.lit(":curriculum"))).alias("shuffle_key"),
    )
    return scored.select(
        "doc_id",
        F.col("band").cast("int").alias("band"),
        F.row_number().over(
            W.orderBy("band", "shuffle_key", "doc_id"))
        .cast("bigint").alias("position"))


ZIPF_TOP_N = 200


@declared_query(
    "q_text_zipf",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        freq AS (
            SELECT token, count(*) AS n FROM tok
            WHERE token <> '' GROUP BY token
        ),
        ranked AS (
            SELECT token, n,
                   row_number() OVER (ORDER BY n DESC, token) AS rnk
            FROM freq
        ),
        top AS (
            SELECT ln(rnk) AS x, ln(n) AS y FROM ranked
            WHERE rnk <= {ZIPF_TOP_N}
        ),
        m AS (
            SELECT count(*) AS c, avg(x) AS mx, avg(y) AS my,
                   avg(x * y) AS mxy, avg(x * x) AS mxx
            FROM top
        )
        SELECT CAST(c AS BIGINT) AS n_ranks,
               round((mxy - mx * my) / (mxx - mx * mx), 6) + 0.0 AS zipf_slope,
               round(my - (mxy - mx * my) / (mxx - mx * mx) * mx, 6) + 0.0
                 AS zipf_intercept
        FROM m
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token-frequency distribution: OLS slope
    of log(frequency) on log(rank) over the top {ZIPF_TOP_N} tokens —
    the sanity statistic corpus-quality reports lead with (natural text
    sits near −1; templated/generated corpora drift shallow or steep).

    One token-count aggregate compresses the corpus to its vocabulary,
    one window ranks it, and the regression is a closed-form moment
    aggregate over {ZIPF_TOP_N} rows (the q_agg_linreg shape). The only
    corpus-sized operation is the token count — explode + partial+final
    hash agg, exactly q_text_tf's plan.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
    freq = (tok.filter(F.col("token") != "")
            .groupBy("token").agg(F.count("*").alias("n")))
    ranked = freq.select(
        "n", F.row_number().over(W.orderBy(F.desc("n"), "token"))
        .alias("rnk"))
    top = ranked.filter(F.col("rnk") <= ZIPF_TOP_N).select(
        F.log(F.col("rnk").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"))
    m = top.agg(
        F.count("*").alias("c"), F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"))
    slope = (F.col("mxy") - F.col("mx") * F.col("my")) \
        / (F.col("mxx") - F.col("mx") * F.col("mx"))
    return m.select(
        F.col("c").alias("n_ranks"),
        (F.round(slope, 6) + F.lit(0.0)).alias("zipf_slope"),
        (F.round(F.col("my") - slope * F.col("mx"), 6) + F.lit(0.0))
        .alias("zipf_intercept"))


@declared_query(
    "q_dataset_card",
    oracle="""
        WITH per_doc AS (
            SELECT source, lang, n_chars,
                   sha256(text) AS h,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(avg(n_chars), 6) AS mean_chars,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
               round(1.0 - count(DISTINCT h) * 1.0 / count(*), 6)
                 AS dup_rate,
               string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs
        FROM per_doc
        GROUP BY source
    """,
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics per source — the summary table a corpus
    release ships (HuggingFace dataset-card style): document and token
    counts, size, exact-dup rate (1 − distinct content hashes / docs),
    and the language inventory as a canonical sorted string.

    One pass: per-doc projections (hash, whitespace token count) ride
    the scan row-locally, then a single partial+final agg per source.
    countDistinct over the 256-bit hash is the exact-dup measurement —
    at 100 TB one swaps it for the HLL state (q_uniq_state_merge) with
    a documented error bar; everything else is O(sources) output.
    """
    d = load(spark, sf_dir, "documents")
    per_doc = d.select(
        "source", "lang", "n_chars",
        F.sha2("text", 256).alias("h"),
        F.size(F.split("text", " ")).alias("n_tokens"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.countDistinct("h").alias("n_unique"),
            F.round(1.0 - F.countDistinct("h") / F.count("*"), 6)
            .alias("dup_rate"),
            F.array_join(F.array_sort(F.collect_set("lang")), ",")
            .alias("langs"),
        )
    )


# ---------------------------------------------------------------------------
# Round 8: tokenizer fertility audit
# ---------------------------------------------------------------------------


@declared_query(
    "q_token_fertility",
    defer=True,
    oracle=f"""
        SELECT source, lang,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                 AS ws_tokens,
               CAST(sum(len(regexp_extract_all(text, '{_TOKEN_RE}')))
                 AS BIGINT) AS bpe_tokens,
               round(CAST(sum(len(regexp_extract_all(text, '{_TOKEN_RE}')))
                          AS DOUBLE)
                     / sum(len(string_split(text, ' '))), 6) AS fertility,
               round(CAST(sum(length(text)) AS DOUBLE)
                     / sum(len(regexp_extract_all(text, '{_TOKEN_RE}'))), 6)
                 AS bytes_per_token
        FROM documents
        GROUP BY source, lang
    """,
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per (source, language): BPE-ish tokens
    per whitespace word ("fertility") and bytes per token — the standard
    tokenizer-efficiency report that decides how many TEXT bytes a token
    budget actually buys per corpus slice (high-fertility slices burn
    budget; the GPT/Llama papers all tabulate this before mixing).

    Row-local regex counting (same _TOKEN_RE both engines, pinned by
    q_text_tokens) feeding ONE partial+final agg on the bounded
    (source, lang) key — corpus-linear scan work, |sources|·|langs|
    reduce state, no shuffle wider than the group key at any corpus
    size. Ratios divide the SUMS (corpus-level fertility), not averages
    of per-doc ratios, so short docs don't skew the budget estimate.
    """
    d = load(spark, sf_dir, "documents")
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{_TOKEN_RE}', 0)"))
    per = d.select(
        "source", "lang",
        F.size(F.split("text", " ")).alias("ws"),
        bpe.alias("bpe"),
        F.length("text").alias("chars"))
    return (per.groupBy("source", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("ws").alias("ws_tokens"),
                 F.sum("bpe").alias("bpe_tokens"),
                 F.round(F.sum("bpe").cast("double") / F.sum("ws"), 6)
                 .alias("fertility"),
                 F.round(F.sum("chars").cast("double") / F.sum("bpe"), 6)
                 .alias("bytes_per_token")))


# ---------------------------------------------------------------------------
# Round 10: E205 — length-bucketed batching audit (padding-waste report)
# ---------------------------------------------------------------------------

BUCKET_MIN = 16  # floor bucket capacity (tokens)


@declared_query(
    "q_length_buckets",
    oracle=f"""
        WITH t AS (
            SELECT source,
                   len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_tok
            FROM documents
        ), b AS (
            SELECT source, n_tok,
                   CAST(greatest({BUCKET_MIN},
                        power(2, ceil(log2(greatest(n_tok, 1)))))
                        AS BIGINT) AS bucket_cap
            FROM t
        )
        SELECT source, bucket_cap,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
               round(1.0 - CAST(sum(n_tok) AS DOUBLE)
                         / (count(*) * bucket_cap), 6) AS padding_frac
        FROM b GROUP BY source, bucket_cap
    """,
    defer=True,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E205: length-bucketed batching audit — documents assigned to
    power-of-two token-capacity buckets (floor {BUCKET_MIN}), reporting
    per-(source, bucket) document counts, token mass, and the padding
    fraction a fixed-capacity batcher would waste. This is the dynamic-
    batching design report for trainer dataloaders: bucketing by length
    is what keeps padding waste low WITHOUT the global sort that
    q_token_pack's contiguous packing needs, and the padding_frac column
    is the quantity you trade off when choosing bucket granularity.

    Row-local tokenize (the shared BPE-ish regex, pinned by E23) +
    row-local bucket arithmetic inside codegen, then ONE partial+final
    agg on (source, bucket) — a bounded key space (|sources| x
    O(log max_len) buckets), so the shuffle carries aggregates, never
    documents. Scan throughput at any corpus size.
    """
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.expr(f"regexp_extract_all(text, '{_TOKEN_RE}', 0)"))
    cap = F.greatest(
        F.lit(BUCKET_MIN),
        F.pow(F.lit(2.0),
              F.ceil(F.log2(F.greatest(n_tok, F.lit(1)).cast("double"))))
    ).cast("bigint")
    return (
        d.select("source", n_tok.alias("n_tok"), cap.alias("bucket_cap"))
        .groupBy("source", "bucket_cap")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tok").alias("sum_tokens"),
             F.round(F.lit(1.0) - F.sum("n_tok").cast("double")
                     / (F.count("*") * F.col("bucket_cap")), 6)
             .alias("padding_frac"))
    )


# DSIR hashed-feature space: 64 buckets via a portable first/last-char
# polynomial — evaluable identically in Spark SQL and DuckDB (no engine
# hash function is shared between the two). Diffusion is adequate for
# importance estimation; the real pipeline swaps in any keyed hash.
DSIR_BUCKETS = 64
_DSIR_BUCKET_SQL = ("(31 * length(tok) + 7 * ascii(substr(tok, 1, 1))"
                    " + ascii(substr(tok, length(tok), 1))) % 64")


@declared_query(
    "q_dsir_weights",
    oracle=f"""
        WITH b AS (
            SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS bucket
            FROM (SELECT doc_id, lang,
                         unnest(regexp_extract_all(lower(text), '[a-z]+'))
                           AS tok
                  FROM documents)
        ),
        db AS (
            SELECT doc_id, bucket, count(*) AS n_db
            FROM b GROUP BY doc_id, bucket
        ),
        stats AS (
            SELECT bucket,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS ct_b,
                   count(*) AS cr_b
            FROM b GROUP BY bucket
        ),
        tot AS (
            SELECT CAST(sum(ct_b) AS BIGINT) AS ct,
                   CAST(sum(cr_b) AS BIGINT) AS cr
            FROM stats
        ),
        terms AS (
            SELECT db.doc_id, db.bucket, db.n_db,
                   db.n_db * (ln((stats.ct_b + 1.0) / (tot.ct + 64.0))
                              - ln((stats.cr_b + 1.0) / (tot.cr + 64.0)))
                     AS term
            FROM db JOIN stats USING (bucket), tot
        )
        SELECT doc_id,
               CAST(sum(n_db) AS BIGINT) AS n_tokens,
               round(list_reduce(list(term ORDER BY bucket),
                                 (a, b) -> a + b), 6) + 0.0 AS dsir_logw
        FROM terms
        GROUP BY doc_id
    """,
    defer=True,
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E210: DSIR importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by log p_target(x) − log p_raw(x) under hashed unigram
    bag-of-words models — here target = the English subset, raw = the
    whole corpus — the weight used to resample web-scale data toward a
    quality distribution. Laplace-smoothed bucket probabilities over a
    64-bucket portable feature hash.

    Scale shape — fit then transform, the k-means/PCA model-build
    pattern: pass 1 aggregates BOTH feature models in one bounded
    64-key agg over the tokens (map-side combine carries ≤64 counters
    per partition, so only 64×P rows shuffle) and collects the 64-row
    model to the driver; pass 2 re-embeds it as literal maps, so
    scoring is per-doc bucket counts (one doc_id-keyed shuffle) with a
    row-local map lookup — ZERO joins in the scoring plan (the naive
    formulation Catalyst would otherwise run re-scans the corpus three
    times and nested-loop-joins the totals; the oracle deliberately
    keeps that independent formulation, cross-proving both). The log
    stays a Spark expression (Java Math.log), keeping transcendental
    parity with the oracle unchanged. The per-doc score folds its ≤64
    terms in SORTED bucket order (array_sort → aggregate on Spark,
    list(ORDER BY) → list_reduce in the oracle) so the double summation
    is order-deterministic on both engines — the covariance-family
    discipline.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"))
    bucket = ((31 * F.length("tok")
               + 7 * F.ascii(F.col("tok").substr(F.lit(1), F.lit(1)))
               + F.ascii(F.col("tok").substr(F.length("tok"), F.lit(1))))
              % DSIR_BUCKETS)
    b = toks.select("doc_id", "lang", bucket.alias("bucket"))
    # pass 1 (model build): both models in one 64-key agg, collected —
    # model-sized (≤64 rows), like the centroid/PCA builds
    model = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct_b"),
        F.count("*").alias("cr_b")).collect()
    ct = sum(r["ct_b"] for r in model)
    cr = sum(r["cr_b"] for r in model)
    ct_map = F.create_map(
        *[x for r in model for x in (F.lit(r["bucket"]),
                                     F.lit(int(r["ct_b"])))])
    cr_map = F.create_map(
        *[x for r in model for x in (F.lit(r["bucket"]),
                                     F.lit(int(r["cr_b"])))])
    # pass 2 (scoring): per-doc bucket counts + literal-map lookups
    db = b.groupBy("doc_id", "bucket").agg(F.count("*").alias("n_db"))
    ctb = F.element_at(ct_map, F.col("bucket"))
    crb = F.element_at(cr_map, F.col("bucket"))
    terms = db.select(
        "doc_id", "bucket", "n_db",
        (F.col("n_db")
         * (F.log((ctb + 1.0) / F.lit(ct + float(DSIR_BUCKETS)))
            - F.log((crb + 1.0) / F.lit(cr + float(DSIR_BUCKETS)))))
        .alias("term"))
    folded = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "term"))),
            lambda s: s["term"]),
        F.lit(0.0), lambda a, x: a + x)
    return (terms.groupBy("doc_id")
            .agg(F.sum("n_db").alias("n_tokens"),
                 (F.round(folded, 6) + F.lit(0.0)).alias("dsir_logw")))


@declared_query(
    "q_text_readability",
    oracle="""
        SELECT doc_id, n_words, n_sentences,
               round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                     - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 3) + 0.0
                 AS flesch_ease,
               round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                     + 11.8 * (CAST(n_syll AS DOUBLE) / n_words) - 15.59, 3)
                 + 0.0 AS fk_grade
        FROM (
            SELECT doc_id,
                   len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
                   greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                     AS n_sentences,
                   len(regexp_extract_all(lower(text), '[aeiouy]+'))
                     AS n_syll
            FROM documents
        )
        WHERE n_words > 0
    """,
    defer=True,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E211: Flesch reading ease + Flesch-Kincaid grade level — the
    classic readability screens used as cheap curriculum/quality signals
    (syllables approximated as vowel-group runs, the standard
    dictionary-free estimator; sentences as terminal-punctuation runs,
    floored at 1 so headline-like fragments stay defined).

    Pure row-local regex counting — identical patterns evaluate under
    Java regex and DuckDB RE2 because the classes are ASCII-explicit
    (the E201 discipline) — then a closed-form in doubles with the same
    operation order on both engines. Zero shuffles, embarrassingly
    parallel, scan-throughput at any corpus size.
    """
    d = load(spark, sf_dir, "documents")
    counted = d.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .alias("n_words"),
        F.greatest(F.regexp_count("text", F.lit("[.!?]+")), F.lit(1))
        .alias("n_sentences"),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .alias("n_syll"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syll").cast("double") / F.col("n_words")
    return counted.select(
        "doc_id", "n_words", "n_sentences",
        (F.round(F.lit(206.835) - 1.015 * wps - 84.6 * spw, 3)
         + F.lit(0.0)).alias("flesch_ease"),
        (F.round(0.39 * wps + 11.8 * spw - 15.59, 3)
         + F.lit(0.0)).alias("fk_grade"),
    )


# Data-constrained scaling (Muennighoff et al. 2023): repeating data
# beyond ~4 epochs returns rapidly diminishing value, so a budget
# allocator caps per-source repetition there. Budget = 2x corpus tokens.
EPOCH_BUDGET_MULT = 2
EPOCH_CAP = 4


@declared_query(
    "q_epoch_schedule",
    oracle=f"""
        WITH s AS (
            SELECT source,
                   CAST(sum(len(regexp_extract_all(text, '{_TOKEN_RE}')))
                        AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
                       count(*) AS k FROM s)
        SELECT source, n_tokens,
               ({EPOCH_BUDGET_MULT} * t) // k AS alloc_tokens,
               least(({EPOCH_BUDGET_MULT} * t) // k,
                     {EPOCH_CAP} * n_tokens) AS effective_tokens,
               round(CAST(least(({EPOCH_BUDGET_MULT} * t) // k,
                                {EPOCH_CAP} * n_tokens) AS DOUBLE)
                     / n_tokens, 6) AS epochs
        FROM s, tot
        WHERE n_tokens > 0
    """,
    defer=True,
)
def q_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E218: epoch-repetition schedule under a token budget (Muennighoff
    et al. 2023, "Scaling Data-Constrained Language Models"): give every
    source an equal slice of a 2×-corpus training budget, cap repetition
    at 4 epochs (the paper's diminishing-returns knee), and report the
    tokens each source actually contributes — the planning report a
    data-mixture owner reads before E146's temperature weights pick the
    sampling distribution.

    All-integer arithmetic end to end (token counts are exact regex
    sums, the allocator is integer floor-division, the cap is least())
    — hash-stable at any parallelism with no decimal machinery; the
    closing epochs ratio divides two exact int64s. ONE bounded-key agg
    over the corpus, collected (|sources| rows — report-sized at any
    corpus size); totals and the allocator then run over the local
    relation in Spark expressions (NOT driver Python: Spark round is
    HALF_UP like the oracle's, Python round is banker's), so the naive
    plan's second corpus pass for the totals branch never happens.
    """
    d = load(spark, sf_dir, "documents")
    rows = (d.select("source",
                     F.size(F.expr(
                         f"regexp_extract_all(text, '{_TOKEN_RE}', 0)"))
                     .alias("toks"))
            .groupBy("source").agg(F.sum("toks").alias("n_tokens"))
            .collect())
    t = sum(r["n_tokens"] for r in rows)  # exact Python ints
    k = len(rows)
    s = values_df(spark, [(r["source"], r["n_tokens"]) for r in rows],
                  [("source", "string"), ("n_tokens", "bigint")])
    alloc = F.lit((EPOCH_BUDGET_MULT * t) // k).cast("bigint")
    eff = F.least(alloc, EPOCH_CAP * F.col("n_tokens"))
    return (s.filter(F.col("n_tokens") > 0)
            .select("source", "n_tokens",
                    alloc.alias("alloc_tokens"),
                    eff.alias("effective_tokens"),
                    F.round(eff.cast("double") / F.col("n_tokens"), 6)
                    .alias("epochs")))


@declared_query(
    "q_text_scripts",
    oracle=r"""
        WITH c AS (
            SELECT doc_id, lang,
                   len(regexp_extract_all(text, '[A-Za-z]')) AS n_latin,
                   len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))
                     AS n_cjk,
                   len(regexp_extract_all(text, '[\x{0400}-\x{04ff}]'))
                     AS n_cyrillic,
                   length(regexp_replace(text, '[ \t\r\n]+', '', 'g'))
                     AS n_chars
            FROM documents
        )
        SELECT doc_id, lang, n_latin, n_cjk, n_cyrillic,
               CASE WHEN n_latin >= n_cjk AND n_latin >= n_cyrillic
                    THEN 'latin'
                    WHEN n_cjk >= n_cyrillic THEN 'cjk'
                    ELSE 'cyrillic' END AS script,
               round(CAST(n_latin AS DOUBLE)
                     / greatest(n_chars, 1), 6) AS latin_ratio
        FROM c
    """,
    defer=True,
)
def q_text_scripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E224: Unicode-script detection — per-document Latin / CJK /
    Cyrillic character counts, the dominant script, and the Latin
    ratio. The routing signal upstream of language-ID (E23): script is
    decidable from raw code points with zero models, so pipelines use it
    to shard documents to per-script tokenizers/filters before anything
    heavier runs.

    Row-local regex counting over explicit code-point ranges — the same
    CLASSES evaluate identically under Java regex (``\\u4e00``) and RE2
    (``\\x{{4e00}}``); only the escape syntax differs, which is why the
    oracle is hand-written rather than string-shared (the E201
    ASCII-explicit discipline, extended to Unicode ranges). Zero
    shuffles, scan throughput at any corpus size; the dominant-script
    CASE has a fixed deterministic tie order.
    """
    d = load(spark, sf_dir, "documents")
    c = d.select(
        "doc_id", "lang",
        F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z]', 0)"))
        .alias("n_latin"),
        F.size(F.expr(r"regexp_extract_all(text, '[\\u4e00-\\u9fff]', 0)"))
        .alias("n_cjk"),
        F.size(F.expr(r"regexp_extract_all(text, '[\\u0400-\\u04ff]', 0)"))
        .alias("n_cyrillic"),
        F.length(F.regexp_replace("text", "[ \t\r\n]+", ""))
        .alias("n_chars"))
    script = (F.when((F.col("n_latin") >= F.col("n_cjk"))
                     & (F.col("n_latin") >= F.col("n_cyrillic")), "latin")
              .when(F.col("n_cjk") >= F.col("n_cyrillic"), "cjk")
              .otherwise("cyrillic"))
    return c.select(
        "doc_id", "lang", "n_latin", "n_cjk", "n_cyrillic",
        script.alias("script"),
        F.round(F.col("n_latin").cast("double")
                / F.greatest(F.col("n_chars"), F.lit(1)), 6)
        .alias("latin_ratio"))
