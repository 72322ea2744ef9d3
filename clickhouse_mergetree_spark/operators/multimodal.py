"""Multimodal-column operators (SURVEY §2.B E24 + binary-payload plumbing).

Two families:
- embedding-vector ops (E24): norms / dims / dot products on
  array<float> via zip_with + aggregate — JVM-side, no UDF;
- opaque binary media columns: payload + typed metadata, with
  feature extraction as an Arrow-batched ``mapInPandas`` pipeline. The
  image/audio decode itself is STUBBED (`decode_media` raises
  NotImplementedError — the decode libraries are not in this container);
  the Spark-side plumbing (schema, batch iteration, partition mapping) is
  real and is what carries to a 1000-executor cluster. A deterministic
  byte-statistics extractor stands in for the decoder so results are
  testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.tables import load

N_FAKE_FEATURES = 8


@declared_query(
    "q_embed_norm",
    oracle="""
        SELECT vec_id, label,
               len(embedding) AS dims,
               round(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 9) AS l2_norm,
               round(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE))) / len(embedding), 9) AS mean_val
        FROM embeddings
    """,
)
def q_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E24: embedding L2 norm / dims / mean — row-local array arithmetic,
    zero shuffles. Float→double casts are exact; sequential list
    accumulation matches DuckDB bit-for-bit (rounded to 9 dp anyway)."""
    e = load(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"))
    val_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return e.select(
        "vec_id", "label",
        F.size("embedding").alias("dims"),
        F.round(F.sqrt(sq_sum), 9).alias("l2_norm"),
        F.round(val_sum / F.size("embedding"), 9).alias("mean_val"),
    )


# ---------------------------------------------------------------------------
# Binary media columns
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("n_features", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def decode_media(payload: bytes, media_type: str):
    """Decode an image/audio/video payload to a numpy tensor.

    STUB: the decode libraries (PIL/opencv/torchaudio) are not available in
    this environment. The Spark-side plumbing around this call — schema,
    Arrow batching, partition mapping — is real; swap this function for a
    real decoder in production.
    """
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires an image/audio library "
        "not present in this container")


def make_extractor(n_features: int = N_FAKE_FEATURES):
    """Build the mapInPandas worker function as a self-contained closure.

    Worker-shipped functions must be nested (pickled BY VALUE by
    cloudpickle) and reference no module globals — a module-level function
    would be pickled as "import clickhouse_mergetree_spark...", which fails
    on executors that don't have the repo on their PYTHONPATH.
    """

    def byte_stat_features(payload: bytes) -> list[float]:
        # deterministic stand-in for decode+feature-extract: byte stats
        if not payload:
            return [0.0] * n_features
        n = len(payload)
        return [
            float(n),
            float(payload[0]),
            float(payload[-1]),
            float(sum(payload) % 997),
            float(min(payload)),
            float(max(payload)),
            float(sum(payload) / n),
            float(len(set(payload))),
        ]

    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # whole Arrow batches, never row-at-a-time; each executor core
        # streams batches independently — no shuffle
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "n_features": n_features,
                "features": pdf["payload"].map(byte_stat_features),
            })

    return extract_features


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media table synthesized from documents (the container
    has no real image fixtures; text bytes stand in for the payload)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


@declared_query(
    "q_media_features",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               8 AS n_features
        FROM documents
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media feature extraction via Arrow-batched mapInPandas.

    The full pipeline runs (binary payload → batched pandas → per-payload
    feature vector); the oracle checks the plumbing-visible outputs
    (payload byte length, feature count) — the feature values themselves
    are covered by the pytest suite.
    """
    media = media_table(spark, sf_dir)
    feats = media.mapInPandas(make_extractor(), schema=FEATURES_SCHEMA)
    return feats.select("doc_id", "n_bytes", "n_features")
