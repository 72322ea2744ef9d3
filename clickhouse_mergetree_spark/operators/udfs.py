"""Pandas-UDF surface (SURVEY §2.B E25).

Demonstrates the two Arrow-batched escape hatches for logic the built-in
functions can't express — always `pandas_udf` / `applyInPandas`, never
row-at-a-time `udf` (10-100× slower; see /opt/skills guide):

- q_udf_scalar: vectorized scalar pandas_udf (BPE-ish regex token count);
- q_udf_grouped: applyInPandas grouped-map (per-source document stats).

Both are deliberately SQL-expressible so the DuckDB oracle hash-checks the
UDF machinery itself (Arrow round-trip, batch semantics), not just "did it
run".
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.tables import load

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count():
    """Build the scalar pandas_udf lazily.

    Lazy for two reasons: parsing the DDL return type at module import
    would require an active SparkSession, and the worker function must be a
    self-contained closure (module-level functions are cloudpickled by
    reference and executors may not have this repo on their PYTHONPATH).
    """
    pat = _BPE_RE

    def count_series(text: pd.Series) -> pd.Series:
        # one vectorized str.count over the whole Arrow batch
        return text.str.count(pat).astype("int64")

    return pandas_udf(count_series, "long")


@declared_query(
    "q_udf_scalar",
    oracle=f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
               n_chars
        FROM documents
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E25: scalar pandas_udf — BPE-ish token count per document.

    Arrow ships the text column to Python in columnar batches; the regex
    count runs vectorized in pandas. Row-local → zero shuffles; scales with
    executor cores like any map.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        bpe_token_count()("text").alias("n_bpe_tokens"),
        "n_chars",
    )


_GROUP_SCHEMA = (
    "source string, n_docs long, total_chars long, "
    "avg_chars double, max_chars long"
)


def make_source_stats():
    """Self-contained grouped-map closure (see bpe_token_count on why)."""

    def source_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        n = pdf["n_chars"]
        return _pd.DataFrame({
            "source": [pdf["source"].iloc[0]],
            "n_docs": [len(pdf)],
            "total_chars": [int(n.sum())],
            # int sums divided as doubles — exact, matches SQL avg bit-for-bit
            "avg_chars": [float(n.sum()) / len(pdf)],
            "max_chars": [int(n.max())],
        })

    return source_stats


@declared_query(
    "q_udf_grouped",
    oracle="""
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
               max(n_chars) AS max_chars
        FROM documents GROUP BY source
    """,
)
def q_udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E25: applyInPandas grouped-map — per-source corpus stats.

    One shuffle on the grouping key, then each group arrives as a single
    pandas DataFrame. (For these particular stats groupBy().agg() would be
    faster — this query exists to exercise and verify the grouped-map path
    used when per-group logic genuinely needs pandas.)
    """
    d = load(spark, sf_dir, "documents").select("source", "n_chars")
    return d.groupBy("source").applyInPandas(make_source_stats(), schema=_GROUP_SCHEMA)


def make_weighted_mean():
    """GROUPED_AGG pandas_udf built lazily as a self-contained closure
    (same rationale as bpe_token_count)."""

    def wmean(disc: pd.Series, qty: pd.Series) -> float:
        return float((disc * qty).sum() / qty.sum())

    return pandas_udf(wmean, "double")


@declared_query(
    "q_udaf_weighted",
    oracle="""
        SELECT l_returnflag,
               round(sum(CAST(l_discount AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2)))
                     / sum(CAST(l_quantity AS DECIMAL(8,2))), 9) AS wavg_disc
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E25+: grouped-aggregate pandas UDF (UDAF surface) — quantity-weighted
    mean discount per return flag.

    The third Arrow escape hatch next to scalar and grouped-map: the whole
    group's columns arrive as pandas Series and reduce to one scalar.
    Plans as a full-shuffle ObjectHashAggregate (no partial agg — the UDAF
    is opaque to Catalyst), which is the documented cost of custom
    aggregates vs built-ins; Spark also rejects mixing it with non-pandas
    aggregates in the same agg, so this stays a single-measure query.
    Discount values are small (≤0.1) so the float64 reduction matches the
    oracle's exact decimal at 9 dp.
    """
    from pyspark.sql import functions as F2

    d = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_discount", "l_quantity")
    return d.groupBy("l_returnflag").agg(
        F2.round(make_weighted_mean()("l_discount", "l_quantity"), 9)
        .alias("wavg_disc"),
    )


@declared_query(
    "q_udtf_sentences",
    oracle="""
        SELECT doc_id, pos, sentence
        FROM (
            SELECT doc_id,
                   unnest(range(0, len(string_split(text, '. ')))) AS pos,
                   unnest(string_split(text, '. ')) AS sentence
            FROM documents
        ) WHERE sentence <> ''
    """,
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E25+: Python UDTF (table function) — one row per sentence with its
    position, applied per document via a LATERAL join.

    The UDTF surface is the row-expanding escape hatch (parsing,
    tokenization-with-state, record splitting) when the expansion logic
    doesn't fit `explode(transform(...))`. The class is defined inside
    this function so cloudpickle ships it by value. Row-at-a-time by
    construction — documented as the slow path; the built-in-function
    equivalent IS this query's oracle, which also hash-proves the UDTF
    machinery end-to-end.
    """
    from pyspark.sql.functions import lit, udtf

    from clickhouse_mergetree_spark.tables import load as _load

    @udtf(returnType="pos int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                if s:
                    yield i, s

    spark.udtf.register("split_sentences", SplitSentences)
    _load(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql("""
        SELECT d.doc_id, s.pos, s.sentence
        FROM __docs_udtf d, LATERAL split_sentences(d.text) s
    """)
