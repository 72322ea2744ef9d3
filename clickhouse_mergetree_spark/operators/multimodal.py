"""Multimodal-column operators (SURVEY §2.B E24 + binary-payload plumbing).

Two families:
- embedding-vector ops (E24): norms / dims / dot products on
  array<float> via zip_with + aggregate — JVM-side, no UDF;
- opaque binary media columns: payload + typed metadata, with
  feature extraction as an Arrow-batched ``mapInPandas`` pipeline.
  Decoding is REAL for the formats this container can decode without
  third-party libraries — binary PGM images (numpy) and WAV audio
  (stdlib ``wave``), see ``q_media_decode``, whose decoded statistics
  are hash-verified against an independent oracle. Compressed formats
  (JPEG/PNG/...) route through the PIL import guard in
  ``make_extractor`` (``real_decode``); where no decoder exists the
  deterministic byte-statistics extractor keeps the pipeline testable
  end-to-end (``decode_media`` documents that contract).
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
                     x -> CAST(x AS DOUBLE))) / len(embedding), 9) + 0.0
                 AS mean_val
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
        (F.round(val_sum / F.size("embedding"), 9)
         + F.lit(0.0)).alias("mean_val"),
    )


@declared_query(
    "q_embed_quantize",
    oracle="""
        WITH base AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), mm AS (
            SELECT vec_id, label, v,
                   list_min(v) AS vmin, list_max(v) AS vmax
            FROM base
        ), coded AS (
            SELECT vec_id, label, vmin, vmax,
                   CASE WHEN vmax > vmin THEN list_transform(v,
                        x -> CAST(floor((x - vmin) * 255.0 / (vmax - vmin)
                                        + 0.5) AS BIGINT))
                        ELSE list_transform(v, x -> CAST(0 AS BIGINT))
                   END AS codes
            FROM mm
        )
        SELECT vec_id, label,
               round(vmin, 9) + 0.0 AS v_min,
               round((vmax - vmin) / 255.0, 9) AS scale,
               CAST(list_sum(codes) AS BIGINT) AS code_sum,
               list_min(codes) AS code_min,
               list_max(codes) AS code_max
        FROM coded
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E24+: per-vector int8 scalar quantization — the standard 4×
    compression step in front of a vector index (what an IVF index stores
    instead of float32 codes). Each vector maps to codes
    floor((x - min) * 255 / (max - min) + 0.5) ∈ [0, 255] with an affine
    (min, scale) dequantizer per row.

    Row-local array arithmetic only — transform/aggregate lambdas, zero
    shuffles, whole rows stay inside codegen; at 100 TB this runs at scan
    throughput. floor(r + 0.5) replaces round() because half-way rounding
    modes differ across engines while floor is IEEE-identical; the output
    is scalar summaries (sum/min/max of codes — integer-exact) so the
    result is hashable by the driver and order-independent."""
    e = load(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    d = e.select("vec_id", "label", v.alias("v"))
    d = d.withColumn("vmin", F.array_min("v")) \
         .withColumn("vmax", F.array_max("v"))
    code = lambda x: F.floor(  # noqa: E731
        (x - F.col("vmin")) * 255.0 / (F.col("vmax") - F.col("vmin")) + 0.5
    ).cast("bigint")
    codes = F.when(
        F.col("vmax") > F.col("vmin"), F.transform("v", code)
    ).otherwise(F.transform("v", lambda x: F.lit(0).cast("bigint")))
    d = d.withColumn("codes", codes)
    return d.select(
        "vec_id", "label",
        (F.round("vmin", 9) + F.lit(0.0)).alias("v_min"),
        F.round((F.col("vmax") - F.col("vmin")) / 255.0, 9).alias("scale"),
        F.aggregate("codes", F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("code_sum"),
        F.array_min("codes").alias("code_min"),
        F.array_max("codes").alias("code_max"),
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


def make_extractor(n_features: int = N_FAKE_FEATURES,
                   real_decode: bool | str = False):
    """Build the mapInPandas worker function as a self-contained closure.

    Worker-shipped functions must be nested (pickled BY VALUE by
    cloudpickle) and reference no module globals — a module-level function
    would be pickled as "import clickhouse_mergetree_spark...", which fails
    on executors that don't have the repo on their PYTHONPATH.

    ``real_decode=True`` routes every payload through ``decode_media``
    first — the production wiring. In this container that raises
    NotImplementedError inside the worker (no decode libraries), which is
    exactly what the stub contract promises; the deterministic byte-stat
    extractor below is the default stand-in that keeps the pipeline
    testable end-to-end. ``real_decode="auto"`` uses the real decoder
    for payloads it can decode (PIL importable AND an image/* media
    type) and falls back to byte stats per payload otherwise — the
    deploy-anywhere wiring.
    """

    def byte_stat_features(payload: bytes) -> list[float]:
        # deterministic stand-in for decode+feature-extract: byte stats.
        # numpy over a zero-copy view of the buffer — one C pass per stat
        # instead of Python-level byte iteration (~6× on 2 KB payloads).
        import numpy as _np

        if not payload:
            return [0.0] * n_features
        a = _np.frombuffer(payload, dtype=_np.uint8)
        total = int(a.sum(dtype=_np.int64))
        return [
            float(a.size),
            float(a[0]),
            float(a[-1]),
            float(total % 997),
            float(a.min()),
            float(a.max()),
            float(total / a.size),
            float(_np.unique(a).size),
        ]

    def decode_then_extract(payload: bytes, media_type: str) -> list[float]:
        # production path: decode to a tensor, then featurize. Import-
        # guarded: uses PIL when the worker has it, otherwise raises the
        # stub contract's NotImplementedError. INLINED (not a call to
        # module-level decode_media): the closure ships to workers by
        # value and must not reference module globals.
        import io as _io

        import numpy as _np

        try:
            from PIL import Image as _Image
        except ImportError as exc:
            raise NotImplementedError(
                f"media decoding for {media_type!r} requires an image "
                "library (PIL) not present in this container") from exc
        if not media_type.startswith("image/"):
            raise NotImplementedError(
                f"no decoder wired for media type {media_type!r}")
        img = _Image.open(_io.BytesIO(payload)).convert("L").resize((8, 8))
        a = _np.asarray(img, dtype=_np.float64) / 255.0
        return [
            float(a.size),
            float(a[0, 0]),
            float(a[-1, -1]),
            float(a.sum() % 997),
            float(a.min()),
            float(a.max()),
            float(a.mean()),
            float(_np.unique(a).size),
        ][:n_features]

    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # whole Arrow batches, never row-at-a-time; each executor core
        # streams batches independently — no shuffle
        import pandas as _pd

        def auto_extract(payload: bytes, media_type: str) -> list[float]:
            try:
                return decode_then_extract(payload, media_type)
            except NotImplementedError:
                return byte_stat_features(payload)

        for pdf in batches:
            if real_decode == "auto":
                feats = [
                    auto_extract(p, m)
                    for p, m in zip(pdf["payload"], pdf["media_type"])
                ]
            elif real_decode:
                feats = [
                    decode_then_extract(p, m)
                    for p, m in zip(pdf["payload"], pdf["media_type"])
                ]
            else:
                feats = pdf["payload"].map(byte_stat_features)
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "n_features": n_features,
                "features": feats,
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


N_FRAMES = 4
FRAME_BYTES = 16
RESIZE_BYTES = 64


@declared_query(
    "q_media_frames",
    oracle=f"""
        SELECT d.doc_id, f.i AS frame_idx,
               (f.i * octet_length(encode(d.text))) // {N_FRAMES} AS frame_offset,
               least({FRAME_BYTES},
                     octet_length(encode(d.text))
                       - (f.i * octet_length(encode(d.text))) // {N_FRAMES})
                   AS frame_len
        FROM documents d, (SELECT unnest(range({N_FRAMES})) AS i) f
    """,
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque binary media: {N_FRAMES} evenly spaced
    byte windows per payload, sliced inside an Arrow-batched mapInPandas
    worker (the video frame-sample analog; a real decoder would seek to
    these offsets). One row per (payload, frame); no shuffle — each
    partition expands its own batches. The oracle reproduces the offset
    arithmetic; the slices themselves are asserted in the pytest suite.
    """
    return sampled_frames(spark, sf_dir).select(
        "doc_id", "frame_idx", "frame_offset", "frame_len")


def sampled_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full frame-sample pipeline INCLUDING the sliced bytes (the declared
    query projects the oracle-checkable arithmetic; tests check the bytes)."""
    media = media_table(spark, sf_dir)
    n_frames, frame_bytes = N_FRAMES, FRAME_BYTES

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def sample_frames(batches):
        import pandas as _pd

        rows = {"doc_id": [], "frame_idx": [], "frame_offset": [],
                "frame_len": [], "frame": []}
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for i in range(n_frames):
                    off = (i * n) // n_frames
                    chunk = bytes(payload[off:off + frame_bytes])
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame_len"].append(len(chunk))
                    rows["frame"].append(chunk)
            yield _pd.DataFrame(rows)
            rows = {k: [] for k in rows}

    return media.mapInPandas(sample_frames, schema=out_schema)


@declared_query(
    "q_media_resize",
    oracle=f"""
        SELECT doc_id,
               octet_length(encode(text)) AS orig_bytes,
               least({RESIZE_BYTES}, octet_length(encode(text))) AS resized_bytes
        FROM documents
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample plumbing: stride-sample each payload down to at
    most {RESIZE_BYTES} bytes inside the Arrow worker (the image-resize
    analog — same batch shape a real thumbnailer would use). Oracle checks
    the size contract; the sampled bytes are pytest-asserted.
    """
    return resized_media(spark, sf_dir).select(
        "doc_id", "orig_bytes", "resized_bytes")


def resized_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full resize pipeline INCLUDING the downsampled bytes."""
    media = media_table(spark, sf_dir)
    k = RESIZE_BYTES

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ])

    def resize(batches):
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "orig_bytes": [], "resized_bytes": [],
                   "resized": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                if n <= k:
                    small = bytes(payload)
                else:
                    stride = n / k
                    small = bytes(payload[int(j * stride)] for j in range(k))
                out["doc_id"].append(doc_id)
                out["orig_bytes"].append(n)
                out["resized_bytes"].append(len(small))
                out["resized"].append(small)
            yield _pd.DataFrame(out)

    return media.mapInPandas(resize, schema=out_schema)


# ---------------------------------------------------------------------------
# Round 5: REAL media decode, dependency-free (PGM via numpy, WAV via stdlib)
# ---------------------------------------------------------------------------

DECODE_BYTES = 256
_PGM_HEADER = b"P5\n16 16\n255\n"   # binary netpbm: 16x16, 8-bit grayscale


def _wav_header_256() -> bytes:
    """Canonical 44-byte WAV header for 256 frames of 8-bit mono PCM,
    built once at import with the stdlib writer so the reader (also
    stdlib) is guaranteed to accept it."""
    import io
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(1)
    w.setframerate(8000)
    w.writeframes(b"\x00" * DECODE_BYTES)
    w.close()
    return buf.getvalue()[:44]


_WAV_HEADER = _wav_header_256()


def media_decode_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table with REAL decodable payloads, synthesized JVM-side:
    even doc_ids carry a valid binary PGM image (header + 256 gray
    pixels), odd doc_ids a valid WAV file (canonical header + 256 8-bit
    PCM samples). The sample bytes are the doc's first 256 characters
    (space-padded), so an independent oracle can recompute every decoded
    statistic from the text — making the decode pipeline hash-verifiable
    with no image library anywhere."""
    d = load(spark, sf_dir, "documents")
    raw = F.encode(F.rpad(F.substring("text", 1, DECODE_BYTES),
                          DECODE_BYTES, " "), "UTF-8")
    is_img = F.col("doc_id") % 2 == 0
    return d.select(
        "doc_id",
        F.when(is_img, F.lit("image/x-portable-graymap"))
        .otherwise(F.lit("audio/wav")).alias("media_type"),
        F.when(is_img, F.concat(F.lit(_PGM_HEADER), raw))
        .otherwise(F.concat(F.lit(_WAV_HEADER), raw)).alias("payload"),
    )


DECODE_STATS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("first_v", T.DoubleType()),
    T.StructField("last_v", T.DoubleType()),
    T.StructField("min_v", T.DoubleType()),
    T.StructField("max_v", T.DoubleType()),
    T.StructField("mean_v", T.DoubleType()),
])


def make_decoder():
    """mapInPandas worker: REAL per-modality decode with zero third-party
    decode libraries — PGM parsed with numpy (header scan + frombuffer
    + reshape), WAV through the stdlib ``wave`` reader — then shared
    tensor statistics over the normalized [0, 1] samples. Self-contained
    closure (pickled by value; imports inside) per the worker-shipping
    contract. Unknown media types raise — the strict production wiring,
    exercised by the stub tests."""

    def decode(payload: bytes, media_type: str):
        import io as _io

        import numpy as _np

        if media_type == "image/x-portable-graymap":
            # binary netpbm P5: "P5\n<w> <h>\n<maxval>\n" + w*h bytes
            if not payload.startswith(b"P5"):
                raise ValueError("not a P5 PGM payload")
            parts = payload.split(b"\n", 3)
            w, h = (int(x) for x in parts[1].split())
            maxval = int(parts[2])
            a = _np.frombuffer(parts[3][: w * h], dtype=_np.uint8)
            return a.reshape(h, w).astype(_np.float64) / maxval
        if media_type == "audio/wav":
            import wave as _wave

            with _wave.open(_io.BytesIO(payload), "rb") as wf:
                frames = wf.readframes(wf.getnframes())
            return _np.frombuffer(frames, dtype=_np.uint8) \
                .astype(_np.float64) / 255.0
        raise NotImplementedError(
            f"no decoder wired for media type {media_type!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "media_type": [], "n_samples": [],
                   "first_v": [], "last_v": [], "min_v": [], "max_v": [],
                   "mean_v": []}
            for doc_id, mt, payload in zip(
                    pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                a = decode(payload, mt).ravel()
                out["doc_id"].append(doc_id)
                out["media_type"].append(mt)
                out["n_samples"].append(a.size)
                out["first_v"].append(round(float(a[0]), 9))
                out["last_v"].append(round(float(a[-1]), 9))
                out["min_v"].append(round(float(a.min()), 9))
                out["max_v"].append(round(float(a.max()), 9))
                out["mean_v"].append(round(float(a.mean()), 9))
            yield _pd.DataFrame(out)

    return run


@declared_query(
    "q_media_decode",
    oracle=f"""
        WITH p AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'image/x-portable-graymap'
                        ELSE 'audio/wav' END AS media_type,
                   list_transform(range(1, {DECODE_BYTES + 1}),
                       i -> ord(substring(
                                rpad(substring(text, 1, {DECODE_BYTES}),
                                     {DECODE_BYTES}, ' '), i, 1)) / 255.0)
                       AS v
            FROM documents
        )
        SELECT doc_id, media_type,
               {DECODE_BYTES} AS n_samples,
               round(v[1], 9) AS first_v,
               round(v[{DECODE_BYTES}], 9) AS last_v,
               round(list_min(v), 9) AS min_v,
               round(list_max(v), 9) AS max_v,
               round(list_sum(v) / {DECODE_BYTES}, 9) AS mean_v
        FROM p
    """,
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E24 closed: REAL media decoding, end-to-end and hash-verified.
    Every payload is a VALID binary file — even doc_ids a 16×16 PGM
    image, odd doc_ids a 44-byte-header WAV — built JVM-side and decoded
    in Arrow-batched workers by modality-specific decoders that need no
    third-party library (numpy header-parse for PGM, the stdlib ``wave``
    reader for WAV). The decoded tensors' statistics are recomputed
    independently by the oracle from the document characters, so a hash
    match proves the bytes really round-tripped through the decoders.

    This replaces the byte-stat stand-in as the proof the decode path
    works; `make_extractor(real_decode=...)` remains the PIL wiring for
    compressed formats the container cannot decode. Plan shape: scan →
    row-local payload synthesis → ONE mapInPandas pass — no shuffle, scan
    throughput at any corpus size."""
    media = media_decode_table(spark, sf_dir)
    return media.mapInPandas(make_decoder(), schema=DECODE_STATS_SCHEMA)


@declared_query(
    "q_embed_covariance",
    oracle="""
        WITH ex AS (
            SELECT vec_id, CAST(i AS INTEGER) AS i,
                   CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS ei
            FROM (SELECT vec_id, embedding,
                         unnest(generate_series(1, len(embedding))) AS i
                  FROM embeddings)
        ), s AS (
            SELECT a.i AS i, b.i AS j,
                   sum(CAST(a.ei * b.ei AS DECIMAL(38,18))) AS sd,
                   count(*) AS n
            FROM ex a JOIN ex b USING (vec_id)
            WHERE a.i <= b.i
            GROUP BY a.i, b.i
        ), mu AS (
            SELECT i,
                   CAST(sum(CAST(ei AS DECIMAL(38,18))) AS DOUBLE)
                     / count(*) AS m
            FROM ex GROUP BY i
        )
        SELECT s.i, s.j,
               round(CAST(s.sd AS DOUBLE) / s.n - ma.m * mb.m, 6) + 0.0
                 AS cov
        FROM s JOIN mu ma ON s.i = ma.i JOIN mu mb ON s.j = mb.i
    """,
)
def q_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding covariance matrix (the PCA / whitening prep step —
    dimensionality reduction, decorrelation, and drift monitoring all
    start from cov(E)): the upper triangle of the 64×64 covariance of
    the embedding table, computed as Σ e_i e_j / n − μ_i μ_j.

    The scale shape is the point: pairs are generated ROW-LOCALLY
    (nested transform over the array — each vector emits its own d(d+1)/2
    products inside codegen), so the only data-sized shuffle is the
    (i, j)-keyed partial+final sum — d²/2 keys, no self-join of an
    exploded fact table (the naive formulation shuffles the exploded
    corpus TWICE and joins it to itself; the oracle deliberately uses
    that independent formulation, so a hash match cross-proves both).
    μ comes from the same pass's diagonal-friendly per-i sums. At 100 TB
    the reduce state is d² doubles per partition — node-memory no matter
    the corpus size.

    Determinism: the per-cell products are summed as DECIMAL(38,18) —
    the repo convention for parallel sums whose 6-dp rounding sits near a
    half-way boundary (same as E112/E187). A plain double sum's
    accumulation order depends on partitioning: local[32] vs local[8] vs
    DuckDB's serial sum drift by ~1 ulp, and round-8's driver run caught
    cell (43,55) sitting 2.5e-11 below the round(…,6) boundary, flipping
    0.000598↔0.000599. Decimal sums are exact and associative on both
    engines; the double division/round then operates on identical inputs.

    Signed zero (r10, the last red driver cell of r9): a tiny-negative
    covariance rounds to ``0.0`` on Spark (BigDecimal HALF_UP has no
    negative zero) but ``-0.0`` on DuckDB (IEEE round preserves the
    sign), and the driver's hash distinguishes them (cell (6,10) at
    sf0.01). Both sides append ``+ 0.0`` after the round (IEEE
    ``-0.0 + 0.0 = +0.0``) — the repo convention for any rounded float
    output that can sit near zero.
    """
    emb = load(spark, sf_dir, "embeddings")
    # 1-based (i, j, e_i*e_j) triples, generated inside the row;
    # the product is rounded once to DECIMAL(38,18) so the sum is exact
    pairs = emb.select(F.explode(F.expr("""
        flatten(transform(embedding, (x, i) ->
            transform(slice(embedding, i + 1, size(embedding) - i),
                      (y, j) -> struct(i + 1 AS i, i + j + 1 AS j,
                                       CAST(CAST(x AS DOUBLE)
                                            * CAST(y AS DOUBLE)
                                            AS DECIMAL(38,18)) AS p))))
    """)).alias("t")).select("t.i", "t.j", "t.p")
    s = pairs.groupBy("i", "j").agg(F.sum("p").alias("sd"),
                                    F.count("*").alias("n"))
    mu = (emb.select(F.posexplode("embedding").alias("i0", "ei"))
          .groupBy((F.col("i0") + 1).alias("i"))
          .agg((F.sum(F.col("ei").cast("double").cast("decimal(38,18)"))
                .cast("double") / F.count("*")).alias("m")))
    ma = mu.select(F.col("i"), F.col("m").alias("m_i"))
    mb = mu.select(F.col("i").alias("j"), F.col("m").alias("m_j"))
    # `+ 0.0` on BOTH engines (IEEE: -0.0 + 0.0 = +0.0) — the repo's
    # signed-zero convention for rounded float outputs: Spark's round
    # goes through Java BigDecimal HALF_UP (no negative zero) while
    # DuckDB's preserves the IEEE sign, and the driver's value hash is
    # sign-sensitive (the r9 single-cell fail: cell (6,10) rounded to
    # 0.0 on Spark, -0.0 on DuckDB).
    return (s.join(F.broadcast(ma), "i").join(F.broadcast(mb), "j")
            .select("i", "j",
                    (F.round(F.col("sd").cast("double") / F.col("n")
                             - F.col("m_i") * F.col("m_j"), 6)
                     + F.lit(0.0))
                    .alias("cov")))


MRL_DIM = 16


@declared_query(
    "q_embed_mrl",
    oracle=f"""
        WITH m AS (
            SELECT vec_id, label,
                   sqrt(list_sum(list_transform(embedding[1:{MRL_DIM}],
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                     AS knorm,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                     AS fnorm
            FROM embeddings
        )
        SELECT vec_id, label,
               round(knorm, 6) AS trunc_norm,
               round(fnorm, 6) AS full_norm,
               round(knorm / fnorm, 6) AS retained_cos
        FROM m
    """,
)
def q_embed_mrl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) embedding truncation audit: per vector, the L2
    norm of the first {MRL_DIM} dims, the full norm, and the retained
    cosine — cos(full, truncated-zero-padded) = ‖v[:k]‖/‖v‖ — the
    number an embedding pipeline checks before switching ANN search to a
    cheaper truncated index (truncate-and-renormalize serving, the MRL
    deployment pattern).

    Pure row-local Catalyst higher-order math: slice + aggregate fold per
    row, no shuffle at all — the scan IS the plan, so it pipelines at
    I/O speed at any corpus size. The renormalized truncated vector
    never materializes (its direction is v[:k] and its norm is 1 by
    construction); only the audit scalars ship.
    """
    emb = load(spark, sf_dir, "embeddings")
    sq_sum = (lambda col: F.aggregate(
        col, F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double")))
    knorm = F.sqrt(sq_sum(F.slice("embedding", 1, MRL_DIM)))
    fnorm = F.sqrt(sq_sum(F.col("embedding")))
    return emb.select(
        "vec_id", "label",
        F.round(knorm, 6).alias("trunc_norm"),
        F.round(fnorm, 6).alias("full_norm"),
        F.round(knorm / fnorm, 6).alias("retained_cos"))


PHASH_MAX_HAMMING = 3


def _phash_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every PGM image payload and compute its 64-bit average
    hash: 16×16 pixels → 2×2 block sums (64 blocks) → bit b set iff
    64·s_b > Σs (pure integer compare, so both engines agree exactly).
    The hash ships as two 32-bit halves in BIGINTs (no sign-bit overflow)
    plus four 16-bit LSH bands."""
    imgs = media_decode_table(spark, sf_dir).filter(
        F.col("media_type") == "image/x-portable-graymap")

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("hi", T.LongType()),
        T.StructField("lo", T.LongType()),
        T.StructField("b0", T.LongType()),
        T.StructField("b1", T.LongType()),
        T.StructField("b2", T.LongType()),
        T.StructField("b3", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "hi", "lo",
                                   "b0", "b1", "b2", "b3")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parts = bytes(payload).split(b"\n", 3)
                w, h = (int(x) for x in parts[1].split())
                a = _np.frombuffer(parts[3][: w * h],
                                   dtype=_np.uint8).reshape(h, w)
                blocks = a.astype(_np.int64).reshape(
                    h // 2, 2, w // 2, 2).sum(axis=(1, 3)).ravel()
                total = int(blocks.sum())
                bits = [1 if 64 * int(s) > total else 0 for s in blocks]
                val = 0
                for k, b in enumerate(bits):
                    val |= b << k
                out["doc_id"].append(doc_id)
                out["hi"].append((val >> 32) & 0xFFFFFFFF)
                out["lo"].append(val & 0xFFFFFFFF)
                out["b0"].append(val & 0xFFFF)
                out["b1"].append((val >> 16) & 0xFFFF)
                out["b2"].append((val >> 32) & 0xFFFF)
                out["b3"].append((val >> 48) & 0xFFFF)
            yield _pd.DataFrame(out)

    return imgs.mapInPandas(run, schema=schema)


@declared_query(
    "q_media_phash_dedup",
    oracle=f"""
        WITH px AS (
            SELECT doc_id,
                   list_transform(range(0, 64), b ->
                       ord(substring(p, ((b // 8) * 2    ) * 16
                                        + (b % 8) * 2 + 1, 1))
                     + ord(substring(p, ((b // 8) * 2    ) * 16
                                        + (b % 8) * 2 + 2, 1))
                     + ord(substring(p, ((b // 8) * 2 + 1) * 16
                                        + (b % 8) * 2 + 1, 1))
                     + ord(substring(p, ((b // 8) * 2 + 1) * 16
                                        + (b % 8) * 2 + 2, 1))) AS s
            FROM (SELECT doc_id,
                         rpad(substring(text, 1, 256), 256, ' ') AS p
                  FROM documents WHERE doc_id % 2 = 0)
        ),
        hashes AS (
            SELECT doc_id,
                   CAST(list_sum(list_transform(range(0, 32), k ->
                        CASE WHEN 64 * s[k + 33] > list_sum(s)
                             THEN 1 << k ELSE 0 END)) AS BIGINT) AS hi,
                   CAST(list_sum(list_transform(range(0, 32), k ->
                        CASE WHEN 64 * s[k + 1] > list_sum(s)
                             THEN 1 << k ELSE 0 END)) AS BIGINT) AS lo
            FROM px
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.hi, b.hi))
                    + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
        FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.hi, b.hi))
              + bit_count(xor(a.lo, b.lo)) <= {PHASH_MAX_HAMMING}
    """,
)
def q_media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dedup: decode each PGM payload, compute
    the 64-bit AVERAGE HASH (aHash — 2×2 block sums vs the global sum,
    integer-exact so the oracle replays it bit-for-bit from the source
    text), and emit every image pair within Hamming distance
    {PHASH_MAX_HAMMING} — the visual-duplicate screen a multimodal
    training pipeline runs before exact byte dedup can help.

    Pairing is banded LSH over four 16-bit hash bands — and at this
    threshold it is EXACT, not approximate: ≤ 3 differing bits across 4
    bands leaves at least one band identical (pigeonhole), so the
    band-bucket equi-join provably generates every qualifying pair.
    Candidates then verify with two xor+bit_count ops (whole-stage
    codegen). At 100 TB: hashes are 16 bytes/image, the join key is a
    16-bit band value, and no pair outside shared buckets is ever
    materialized — the all-pairs product never exists. The decode+hash
    runs once per image in an Arrow batch (mapInPandas), the join side
    is the hash table, never the payloads. DuckDB's oracle brute-forces
    the same pair set from the raw text at gate scale.
    """
    hashes = _phash_table(spark, sf_dir).persist()
    bands = hashes.select(
        "doc_id", "hi", "lo",
        F.explode(F.array(
            F.struct(F.lit(0).alias("band"), F.col("b0").alias("v")),
            F.struct(F.lit(1).alias("band"), F.col("b1").alias("v")),
            F.struct(F.lit(2).alias("band"), F.col("b2").alias("v")),
            F.struct(F.lit(3).alias("band"), F.col("b3").alias("v")),
        )).alias("bv"))
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("hi").alias("hi_a"), F.col("lo").alias("lo_a"),
                     F.col("bv.band").alias("band"),
                     F.col("bv.v").alias("v"))
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("hi").alias("hi_b"), F.col("lo").alias("lo_b"),
                     F.col("bv.band").alias("band"),
                     F.col("bv.v").alias("v"))
    cand = (
        a.join(b, ["band", "v"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))))
    return (
        cand.select("doc_a", "doc_b",
                    hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
    )


AUDIO_FP_MAX_HAMMING = 3


def _audio_fp_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every WAV payload (stdlib ``wave``, the q_media_decode
    path) and compute a 64-bit delta-coded energy fingerprint: 256
    samples → 64 contiguous 4-sample block sums → bit b set iff
    s_b > s_{b+1} (final bit 0) — the band-energy-delta shape of
    audio fingerprinting (Chromaprint's comparison step), integer-exact
    so the oracle replays it from the source text."""
    auds = media_decode_table(spark, sf_dir).filter(
        F.col("media_type") == "audio/wav")

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("hi", T.LongType()),
        T.StructField("lo", T.LongType()),
        T.StructField("b0", T.LongType()),
        T.StructField("b1", T.LongType()),
        T.StructField("b2", T.LongType()),
        T.StructField("b3", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "hi", "lo",
                                   "b0", "b1", "b2", "b3")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with _wave.open(_io.BytesIO(bytes(payload)), "rb") as wf:
                    frames = wf.readframes(wf.getnframes())
                a = _np.frombuffer(frames, dtype=_np.uint8).astype(_np.int64)
                s = a.reshape(64, 4).sum(axis=1)
                bits = [1 if int(s[b]) > int(s[b + 1]) else 0
                        for b in range(63)] + [0]
                val = 0
                for k, b in enumerate(bits):
                    val |= b << k
                out["doc_id"].append(doc_id)
                out["hi"].append((val >> 32) & 0xFFFFFFFF)
                out["lo"].append(val & 0xFFFFFFFF)
                out["b0"].append(val & 0xFFFF)
                out["b1"].append((val >> 16) & 0xFFFF)
                out["b2"].append((val >> 32) & 0xFFFF)
                out["b3"].append((val >> 48) & 0xFFFF)
            yield _pd.DataFrame(out)

    return auds.mapInPandas(run, schema=schema)


@declared_query(
    "q_media_audio_dedup",
    oracle=f"""
        WITH blk AS (
            SELECT doc_id,
                   list_transform(range(0, 64), b ->
                       ord(substring(p, b * 4 + 1, 1))
                     + ord(substring(p, b * 4 + 2, 1))
                     + ord(substring(p, b * 4 + 3, 1))
                     + ord(substring(p, b * 4 + 4, 1))) AS s
            FROM (SELECT doc_id,
                         rpad(substring(text, 1, 256), 256, ' ') AS p
                  FROM documents WHERE doc_id % 2 = 1)
        ),
        hashes AS (
            SELECT doc_id,
                   CAST(list_sum(list_transform(range(32, 63), k ->
                        CASE WHEN s[k + 1] > s[k + 2]
                             THEN 1 << (k - 32) ELSE 0 END)) AS BIGINT)
                     AS hi,
                   CAST(list_sum(list_transform(range(0, 32), k ->
                        CASE WHEN s[k + 1] > s[k + 2]
                             THEN 1 << k ELSE 0 END)) AS BIGINT) AS lo
            FROM blk
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.hi, b.hi))
                    + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
        FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.hi, b.hi))
              + bit_count(xor(a.lo, b.lo)) <= {AUDIO_FP_MAX_HAMMING}
    """,
)
def q_media_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dedup by delta-coded energy fingerprint: decode each
    WAV payload, fingerprint its 4-sample block-energy envelope (bit b =
    energy rising into block b+1 — Chromaprint's comparison step, pinned
    integer-exact so the oracle replays it from the source text), and
    emit every pair within Hamming distance {AUDIO_FP_MAX_HAMMING} —
    the audio twin of q_media_phash_dedup.

    Same pigeonhole-exact banded pairing: ≤ 3 differing bits across four
    16-bit bands leaves one band identical, so the band-bucket equi-join
    generates every qualifying pair; candidates verify with xor+bit_count
    in codegen. Fingerprints are 16 bytes/clip; payloads never join.
    """
    hashes = _audio_fp_table(spark, sf_dir).persist()
    bands = hashes.select(
        "doc_id", "hi", "lo",
        F.explode(F.array(
            F.struct(F.lit(0).alias("band"), F.col("b0").alias("v")),
            F.struct(F.lit(1).alias("band"), F.col("b1").alias("v")),
            F.struct(F.lit(2).alias("band"), F.col("b2").alias("v")),
            F.struct(F.lit(3).alias("band"), F.col("b3").alias("v")),
        )).alias("bv"))
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("hi").alias("hi_a"), F.col("lo").alias("lo_a"),
                     F.col("bv.band").alias("band"),
                     F.col("bv.v").alias("v"))
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("hi").alias("hi_b"), F.col("lo").alias("lo_b"),
                     F.col("bv.band").alias("band"),
                     F.col("bv.v").alias("v"))
    cand = (
        a.join(b, ["band", "v"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))))
    return (
        cand.select("doc_a", "doc_b",
                    hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= AUDIO_FP_MAX_HAMMING)
    )


# ---------------------------------------------------------------------------
# Round 8: PCA projection audit (covariance -> eigh -> broadcast project)
# ---------------------------------------------------------------------------

_PCA_COMPS_DIR = None  # set lazily (fixed_scratch_dir import kept local)


def _pca_comps_dir() -> str:
    global _PCA_COMPS_DIR
    if _PCA_COMPS_DIR is None:
        from clickhouse_mergetree_spark.scratch import fixed_scratch_dir
        _PCA_COMPS_DIR = fixed_scratch_dir("q_embed_pca_comps")
    return _PCA_COMPS_DIR


def _pca_oracle_sql() -> str:
    return f"""
        WITH comp AS (
            SELECT CAST(pc AS INTEGER) AS pc, comp, mean
            FROM read_parquet('{_pca_comps_dir()}/*.parquet')
        ),
        p AS (
            SELECT e.label, c.pc,
                   list_sum(list_transform(
                       range(1, len(e.embedding) + 1),
                       i -> (CAST(e.embedding[i] AS DOUBLE) - c.mean[i])
                            * c.comp[i])) AS proj
            FROM embeddings e CROSS JOIN comp c
        )
        SELECT label, pc, count(*) AS n,
               round(avg(proj), 6) + 0.0 AS mean_proj,
               round(stddev_samp(proj), 6) AS sd_proj
        FROM p GROUP BY label, pc
    """


@declared_query("q_embed_pca", defer=True, oracle=_pca_oracle_sql())
def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection audit over the embedding corpus: top-2 principal
    components of the embedding covariance, every vector projected onto
    them, per-(label, pc) projection mean/spread — the embedding-drift /
    cluster-separation report (and the whitening prep q_embed_covariance
    stops short of).

    Scale split, same contract as the IVF codebooks: the MODEL BUILD
    (covariance) is the d²-state distributed reduce from
    q_embed_covariance — pairs generated row-locally, one (i, j)-keyed
    agg, collected as d(d+1)/2 + d bounded rows (model metadata, not
    data) — and the eigendecomposition is O(d³) driver numpy on the d×d
    matrix. The PROJECTION is the distributed part: components enter the
    plan as literal arrays and each row's two dot products fold inside
    codegen — zero shuffle before the (label, pc)-keyed agg. Components
    get a deterministic sign (largest-|coordinate| positive) and persist
    as a side table; DuckDB independently recomputes every projection
    and both statistics from them, so the iterative part is verified the
    same way the k-means family is.
    """
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    # --- model build: distributed covariance, driver-side eigh --------
    # same row-local pair generation as q_embed_covariance (1-based i<=j,
    # diagonal included)
    pairs = emb.select(F.explode(F.expr("""
        flatten(transform(embedding, (x, i) ->
            transform(slice(embedding, i + 1, size(embedding) - i),
                      (y, j) -> struct(i + 1 AS i, i + j + 1 AS j,
                                       CAST(x AS DOUBLE)
                                       * CAST(y AS DOUBLE) AS p))))
    """)).alias("t")).select("t.i", "t.j", "t.p")
    s_rows = (pairs.groupBy("i", "j")
              .agg(F.sum("p").alias("s"), F.count("*").alias("n"))
              .collect())
    mu_rows = (emb.select(F.posexplode("embedding").alias("i0", "e"))
               .groupBy("i0").agg(F.avg(F.col("e").cast("double"))
                                  .alias("m")).collect())
    d = len(mu_rows)
    mu = np.zeros(d)
    for r in mu_rows:
        mu[r["i0"]] = r["m"]
    cov = np.zeros((d, d))
    for r in s_rows:
        c = r["s"] / r["n"] - mu[r["i"] - 1] * mu[r["j"] - 1]
        cov[r["i"] - 1, r["j"] - 1] = c
        cov[r["j"] - 1, r["i"] - 1] = c
    vals, vecs = np.linalg.eigh(cov)          # ascending eigenvalues
    comps = []
    for k in range(2):
        v = vecs[:, d - 1 - k]
        sign_ix = int(np.argmax(np.abs(v)))   # deterministic sign
        if v[sign_ix] < 0:
            v = -v
        comps.append((k + 1, float(vals[d - 1 - k]),
                      [float(x) for x in v], [float(x) for x in mu]))
    from clickhouse_mergetree_spark.tables import values_df
    cdf = values_df(spark, comps,
                    [("pc", "int"), ("eigval", "double"),
                     ("comp", "array<double>"), ("mean", "array<double>")])
    cdf.coalesce(1).write.mode("overwrite").parquet(_pca_comps_dir())

    # --- distributed projection: literal components, row-local fold ---
    def _proj(comp: list[float], mean: list[float]):
        clit = F.array(*[F.lit(x) for x in comp])
        mlit = F.array(*[F.lit(x) for x in mean])
        centered = F.zip_with("embedding", mlit,
                              lambda x, m: x.cast("double") - m)
        return F.aggregate(F.zip_with(centered, clit, lambda x, c: x * c),
                           F.lit(0.0), lambda acc, x: acc + x)

    projected = emb.select(
        "label",
        F.explode(F.array(*[
            F.struct(F.lit(pc).alias("pc"),
                     _proj(comp, mean).alias("proj"))
            for pc, _ev, comp, mean in comps
        ])).alias("t"),
    ).select("label", "t.pc", "t.proj")
    return (projected.groupBy("label", "pc")
            .agg(F.count("*").alias("n"),
                 (F.round(F.avg("proj"), 6)
                  + F.lit(0.0)).alias("mean_proj"),
                 F.round(F.stddev_samp("proj"), 6).alias("sd_proj")))


@declared_query(
    "q_embed_drift",
    oracle="""
        WITH ex AS (
            SELECT label, CAST(i AS INTEGER) AS d,
                   CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS v
            FROM (SELECT label, embedding,
                         unnest(generate_series(1, len(embedding))) AS i
                  FROM embeddings)
        ),
        cl AS (
            SELECT label, d,
                   CAST(sum(CAST(v AS DECIMAL(38,18))) AS DOUBLE)
                     / count(*) AS c
            FROM ex GROUP BY label, d
        ),
        g AS (
            SELECT d,
                   CAST(sum(CAST(v AS DECIMAL(38,18))) AS DOUBLE)
                     / count(*) AS gm
            FROM ex GROUP BY d
        ),
        t AS (
            SELECT label, cl.d, c * gm AS xy, c * c AS xx, gm * gm AS yy
            FROM cl JOIN g USING (d)
        ),
        s AS (
            SELECT label,
                   list_reduce(list(xy ORDER BY d), (a, b) -> a + b) AS sxy,
                   list_reduce(list(xx ORDER BY d), (a, b) -> a + b) AS sxx,
                   list_reduce(list(yy ORDER BY d), (a, b) -> a + b) AS syy
            FROM t GROUP BY label
        ),
        nv AS (SELECT label, count(*) AS n_vecs FROM embeddings
               GROUP BY label)
        SELECT s.label, nv.n_vecs,
               CASE WHEN sxx * syy > 0
                    THEN round(sxy / sqrt(sxx * syy), 6) + 0.0
               END AS cos_to_global
        FROM s JOIN nv ON s.label = nv.label
    """,
    defer=True,
)
def q_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E212: embedding-distribution drift audit — the cosine between each
    label cohort's centroid and the global corpus centroid, the standard
    "did this slice's embedding distribution move" monitor (data-mixture
    shift, encoder regressions, per-source contamination all show up
    here first).

    Centroids are per-dimension means whose cross-row sums accumulate as
    DECIMAL(38,18) (the covariance/PCA convention — exact and
    associative, so local[32] and DuckDB's serial sum agree bit-for-bit
    before the divide). The closing cosine folds its 64 per-dimension
    terms in SORTED dimension order on both engines (array_sort →
    aggregate vs list(ORDER BY) → list_reduce), making the double
    summation order-deterministic — the E210 discipline. Scale shape:
    ONE corpus pass — a (label, dim)-keyed partial+final agg of exact
    decimal sums (bounded keys: |labels|×64) from which BOTH the label
    centroids and the global centroid derive (the global per-dim sum is
    the sum of the label partials, exact by decimal associativity, so
    it equals the oracle's direct formulation bit-for-bit); then a
    64-row broadcast join and per-label folds over 64 terms.
    """
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("d0", "v0")
    ).select("label", (F.col("d0") + 1).alias("d"),
             F.col("v0").cast("double").alias("v"))
    dec = F.col("v").cast("decimal(38,18)")
    # one corpus pass: exact per-(label, dim) decimal sums + counts —
    # persisted (|labels|×64 rows) so the cl and g branches below share
    # the materialized agg instead of re-running the corpus explode
    base = (ex.groupBy("label", "d")
            .agg(F.sum(dec).alias("sd"), F.count("*").alias("nld"))
            .persist())
    cl = base.select("label", "d",
                     (F.col("sd").cast("double") / F.col("nld")).alias("c"))
    g = (base.groupBy("d")
         .agg((F.sum("sd").cast("double") / F.sum("nld")).alias("gm")))
    t = (cl.join(F.broadcast(g), "d")
         .select("label", "d",
                 (F.col("c") * F.col("gm")).alias("xy"),
                 (F.col("c") * F.col("c")).alias("xx"),
                 (F.col("gm") * F.col("gm")).alias("yy")))

    def fold(col: str):
        return F.aggregate(
            F.transform(F.array_sort(F.collect_list(F.struct("d", col))),
                        lambda s: s[col]),
            F.lit(0.0), lambda a, x: a + x)

    s = t.groupBy("label").agg(fold("xy").alias("sxy"),
                               fold("xx").alias("sxx"),
                               fold("yy").alias("syy"))
    nv = emb.groupBy("label").agg(F.count("*").alias("n_vecs"))
    cos = F.when(
        F.col("sxx") * F.col("syy") > 0,
        F.round(F.col("sxy") / F.sqrt(F.col("sxx") * F.col("syy")), 6)
        + F.lit(0.0))
    return (s.join(nv, "label")
            .select("label", "n_vecs", cos.alias("cos_to_global")))
