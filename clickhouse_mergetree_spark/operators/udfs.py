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
               sum(n_chars) AS total_chars,
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
