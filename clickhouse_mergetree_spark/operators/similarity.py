"""Similarity search over embedding columns (SURVEY §2.B E22).

Two paths over ``embeddings`` (array<float>, 64-dim — FIXTURES.md):
- q_sim_search: brute-force exact cosine top-k — the DuckDB-checkable
  baseline; one scan, per-row O(d) arithmetic fully JVM-side
  (zip_with + aggregate), then TakeOrderedAndProject for the top-k
  (per-partition heaps, no global sort).
- q_sim_search_lsh: random-hyperplane LSH bucketing — the 100 TB path:
  the query probes only its own sign-bucket, so the scan is pruned to
  ~n/2^bits candidates (a real deployment stores data pre-partitioned by
  bucket so the probe is a partition-pruned read, and multi-probes
  neighboring buckets for recall).

Float→double casts are exact and both engines accumulate the dot product
sequentially over the list, so the cosine doubles are bit-identical —
rounding to 9 dp is belt-and-braces for the value hash.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.registry import declared_query
from clickhouse_mergetree_spark.tables import load, reopen_parquet, values_df
from clickhouse_mergetree_spark.scratch import fixed_scratch_dir, scratch_dir

QUERY_VEC_ID = 0
TOP_K = 10
DIM = 64
LSH_BITS = 8


def _dot(a: str | Column, b: str | Column) -> Column:
    """Σ a[i]·b[i] in double — JVM-side, no UDF."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: str | Column) -> Column:
    return F.sqrt(_dot(a, a))


# Perf note shared by every query below: higher-order-function lambdas
# (zip_with/aggregate) are interpreted, not codegen'd, so each _dot/_norm
# costs ~d interpreted ops per row. Norms are therefore always computed
# ONCE per vector on the slim pre-join side and carried as a column —
# never recomputed per candidate pair. Same arithmetic, same doubles.


# Exact cosine top-k oracle — shared verbatim by the brute-force baseline
# AND by q_sim_search_blas (same exact semantics, BLAS execution; its
# 1e-15-level summation-order differences vanish under the 9-dp rounding
# both sides apply). q_sim_search_pq does NOT share it: the n/4 ADC
# shortlist doesn't guarantee the exact top-k, so pq stays rows-only with
# recall pinned in tests/test_similarity_recall.py.
_EXACT_TOPK_SQL = f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    scored AS (
        SELECT e.vec_id,
               list_sum(list_transform(range(1, {DIM + 1}),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, {DIM + 1}),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, {DIM + 1}),
                      i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
               AS cos_raw
        FROM embeddings e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, round(cos_raw, 9) + 0.0 AS cosine
    FROM scored ORDER BY cos_raw DESC, vec_id LIMIT {TOP_K}
"""


@declared_query("q_sim_search", oracle=_EXACT_TOPK_SQL)
def q_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22: exact brute-force cosine top-k against the vec_id=0 embedding.

    The 1-row query vector is broadcast; the scan stays a single pass with
    per-row O(d) array arithmetic; top-k plans as TakeOrderedAndProject.
    """
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", _norm("embedding"))
    q = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").alias("qv"), F.col("nrm").alias("qnrm"))
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (_dot("embedding", "qv")
             / (F.col("nrm") * F.col("qnrm"))).alias("cos_raw"),
        )
    )
    return (
        scored.orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .select("vec_id", (F.round("cos_raw", 9) + F.lit(0.0)).alias("cosine"))
    )


def _hyperplanes(bits: int = LSH_BITS) -> list[list[float]]:
    """``bits`` deterministic random hyperplanes (seed 42), as plan
    literals. Row-major generation from one fixed seed means the first
    LSH_BITS planes are IDENTICAL for any ``bits`` ≥ LSH_BITS — the
    plane set is reproducible and prefix-stable across scale steps.
    (NOT a bucket-containment guarantee: the scaled pair-join branch
    additionally mean-centers before signing, so its buckets are not
    refinements of the fixture buckets.)"""
    rng = np.random.default_rng(42)
    return rng.standard_normal((bits, DIM)).tolist()


def _lsh_pair_bits(n_vecs: int | None) -> int:
    """Hyperplane count for the near-dup PAIR join: max(8, ⌈log₂(n/8)⌉),
    i.e. bucket occupancy n/2^bits held at ≤ ~8 rows as the corpus
    grows. Every fixture SF (n = 20/200/2000) resolves to exactly the
    oracle's LSH_BITS = 8 — sf0.1 lands on log₂(2000/8) = 7.97 — so
    oracle bit-parity is untouched; with fixed bits the within-bucket
    pair work would be n²/2^8, the quadratic class the sf1/sf5
    rehearsals exist to catch. Search-path queries (q_sim_search_lsh)
    keep fixed bits: their per-query probe cost is bucket-sized either
    way, and recall is the binding constraint there."""
    if n_vecs is None or n_vecs <= 8:
        return LSH_BITS
    import math

    return max(LSH_BITS, math.ceil(math.log2(n_vecs / 8)))


def _bucket_of(planes: list[list[float]], vec_col: str) -> Column:
    """Sign-projection bucket id: Σ [v·p_b > 0]·2^b, all JVM-side."""
    acc = F.lit(0)
    for b, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        acc = acc + F.when(_dot(vec_col, lit_plane) > 0,
                           F.lit(1 << b)).otherwise(F.lit(0))
    return acc


def _bucket_arrow(df: DataFrame, planes: list[list[float]],
                  center: list[float] | None = None) -> DataFrame:
    """Sign-projection buckets for (vec_id, embedding) rows in ONE
    Arrow-vectorized pass: bucket = sign((M−μ)·Pᵀ) · 2^b — a numpy
    matmul instead of ``bits`` interpreted HOF dot folds (the r5
    lesson: HOF lambdas are the slow path for per-element work).
    Scaled-branch only (bits > LSH_BITS, where no oracle runs):
    sign(v·p) can differ from the JVM fold only for dots within the
    accumulated float rounding of zero (numpy matmul and the JVM
    sequential fold sum in different orders) — probability ~0 for
    random planes, which is what the branch-parity test demonstrates. Fixture bucketing stays on the
    plan-literal fold for oracle bit-parity, the SemDeDup dual-path
    convention.

    ``center``: per-dim corpus mean subtracted before projection.
    Hyperplane LSH assumes the cloud straddles every plane; a mean
    offset biases every sign the same way, so bucket probabilities
    concentrate and within-bucket pair work goes QUADRATIC regardless
    of how bits scale (measured at sf5: 34.2M candidate pairs raw vs
    ~n·occ/2 ≈ 0.3M centered for 100k vectors / 14 bits). Centering is
    a rigid translation — near-identical vectors stay near-identical —
    so near-dup recall is preserved while bucket occupancy flattens.
    Only the sign offsets μ·p_b enter the kernel."""
    planes_py = [[float(x) for x in p] for p in planes]
    center_py = [float(x) for x in center] if center is not None else None

    def run(batches):
        # self-contained closure: runs on workers with any cwd
        import numpy as np
        import pandas as pd

        P = np.asarray(planes_py, dtype=np.float64)
        off = (P @ np.asarray(center_py, dtype=np.float64)
               if center_py is not None else np.zeros(P.shape[0]))
        w = (np.int64(1) << np.arange(P.shape[0], dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(bucket=pd.Series([], dtype="int64"))
                continue
            M = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf["embedding"]])
            pdf = pdf.copy()
            pdf["bucket"] = ((M @ P.T - off) > 0).astype(np.int64) @ w
            yield pdf

    return df.mapInPandas(
        run, "vec_id long, embedding array<float>, bucket long")


_MEAN_MEMO: dict[tuple, list[float]] = {}


def _corpus_mean(emb: DataFrame, sf_dir: str | None = None) -> list[float]:
    """Exact per-dimension corpus mean of ``embedding`` — posexplode +
    avg(pos): map-side combine reduces every partition to d rows before
    the d-group shuffle, so the collect is d-sized at any corpus size.
    Memoized per corpus like the other offline artifacts (same
    fingerprinted key contract as _TRAIN_MEMO) when ``sf_dir`` is
    given — the mean is corpus state, not per-query work."""
    def compute() -> list[float]:
        rows = (emb.select(F.posexplode("embedding").alias("pos", "x"))
                .groupBy("pos").agg(F.avg("x").alias("m"))
                .orderBy("pos").collect())
        return [r["m"] for r in rows]

    if sf_dir is None:
        return compute()
    key = (sf_dir, *_corpus_token(sf_dir))
    if key not in _MEAN_MEMO:
        _MEAN_MEMO[key] = compute()
    return _MEAN_MEMO[key]


LSH_PROBE_RADIUS = 2


def _probe_masks(bits: int = LSH_BITS, radius: int = LSH_PROBE_RADIUS) -> list[int]:
    """XOR masks for every bucket within Hamming distance `radius`."""
    masks = [0]
    if radius >= 1:
        masks += [1 << b for b in range(bits)]
    if radius >= 2:
        masks += [(1 << a) | (1 << b)
                  for a in range(bits) for b in range(a + 1, bits)]
    return masks


def sim_search_lsh_on(
    emb: DataFrame,
    query_vec_id: int = QUERY_VEC_ID,
    top_k: int = TOP_K,
) -> DataFrame:
    """Multi-probe sign-LSH top-k over any (vec_id, embedding) DataFrame.

    The core of q_sim_search_lsh, factored so tests can run it on a
    planted-neighbor corpus (the fixture embeddings are isotropic noise —
    max pairwise cosine ≈0.5 — so recall against exact top-k is
    information-theoretically meaningless there; recall is pinned on a
    corpus where near neighbors exist, tests/test_similarity_recall.py).
    """
    planes = _hyperplanes()
    bucketed = emb.withColumn(
        "bucket", _bucket_of(planes, "embedding")).withColumn(
        "nrm", _norm("embedding"))
    # probe list: every bucket within Hamming distance LSH_PROBE_RADIUS of
    # the query's bucket (radius 2 at 8 bits = 37/256 buckets; the probed
    # fraction shrinks quadratically as bits grow with corpus size)
    probe_arr = F.array(
        *[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in _probe_masks()])
    probes = (
        bucketed.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"), F.col("nrm").alias("qnrm"),
                F.col("bucket").alias("qbucket"))
        .select("qv", "qnrm", F.explode(probe_arr).alias("pbucket"))
    )
    # each vector lives in exactly one bucket and probe buckets are
    # distinct, so the equi-join cannot duplicate candidates
    candidates = (
        bucketed.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(probes), F.col("bucket") == F.col("pbucket"))
        .select(
            "vec_id", "bucket",
            (_dot("embedding", "qv")
             / (F.col("nrm") * F.col("qnrm"))).alias("cos_raw"),
        )
    )
    return (
        candidates.orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(top_k)
        .select("vec_id", "bucket", (F.round("cos_raw", 9) + F.lit(0.0)).alias("cosine"))
    )


def _sql_plane_bucket_expr(col: str = "embedding") -> str:
    """Sign-projection bucket id as DuckDB SQL: the seed-42 hyperplanes
    embed as list literals (repr round-trips every float64 exactly), and
    both engines fold the same 64 products in list order, so every dot —
    and therefore every bucket bit — is bit-identical across engines."""
    def dot(plane: list[float]) -> str:
        lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        return (f"list_sum(list_transform(range(1, {DIM + 1}), "
                f"i -> CAST({col}[i] AS DOUBLE) * {lit}[i]))")

    return " + ".join(
        f"(CASE WHEN {dot(p)} > 0 THEN {1 << b} ELSE 0 END)"
        for b, p in enumerate(_hyperplanes()))


def _sql_self_dot(col: str = "embedding") -> str:
    return (f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> CAST({col}[i] AS DOUBLE) * CAST({col}[i] AS DOUBLE)))")


def _lsh_oracle_sql() -> str:
    """DuckDB replay of the ENTIRE multi-probe LSH pipeline: recompute
    the sign-projection buckets (_sql_plane_bucket_expr), the radius-2
    probe set (bit_count(xor(...)) ≤ 2 ≡ the XOR mask list), and the
    exact cosine top-k over the candidates — an ANN query becomes a
    fully hash-verified row."""
    bucket = _sql_plane_bucket_expr("embedding")
    self_dot = _sql_self_dot("embedding")
    qdot = (f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> CAST(b.embedding[i] AS DOUBLE)"
            f" * CAST(q.qv[i] AS DOUBLE)))")
    return f"""
        WITH b AS (
            SELECT vec_id, embedding, {bucket} AS bucket,
                   sqrt({self_dot}) AS nrm
            FROM embeddings
        ),
        q AS (
            SELECT embedding AS qv, bucket AS qbucket, nrm AS qnrm
            FROM b WHERE vec_id = {QUERY_VEC_ID}
        ),
        cand AS (
            SELECT b.vec_id, b.bucket,
                   {qdot} / (b.nrm * q.qnrm) AS cos_raw
            FROM b, q
            WHERE b.vec_id <> {QUERY_VEC_ID}
              AND bit_count(xor(b.bucket, q.qbucket)) <= {LSH_PROBE_RADIUS}
        )
        SELECT vec_id, bucket, round(cos_raw, 9) + 0.0 AS cosine
        FROM cand ORDER BY cos_raw DESC, vec_id LIMIT {TOP_K}
    """


@declared_query("q_sim_search_lsh", oracle=_lsh_oracle_sql())
def q_sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22 scale path: sign-random-projection LSH ANN top-k with multi-probe.

    bucket(v) = Σ [v·p_b > 0]·2^b over 8 fixed hyperplanes (seed 42, plan
    literals — no lookup table to join). The query probes every bucket
    within Hamming distance 2 of its own (37 of 256 ≈ 14% of the corpus
    at 8 bits) — multi-probe is what lifts sign-LSH from demo recall to
    usable recall (pinned ≥0.9 on a planted-neighbor corpus in
    tests/test_similarity_recall.py). Exact cosine + top-k run on the
    candidates only.

    Hash-verified (r5): the hyperplanes embed as literals in the oracle
    SQL, so DuckDB replays bucketing, multi-probe, and scoring exactly —
    see _lsh_oracle_sql. Approximation lives in the ALGORITHM (which
    candidates are probed), not in any engine-dependent value.

    At 100 TB: write the table partitioned by `bucket` so the probe list
    becomes partition pruning (the probe side is a 37-row broadcast; the
    corpus side never shuffles), and scale bits with n — the radius-2
    probe fraction falls quadratically in the bit count.
    """
    return sim_search_lsh_on(load(spark, sf_dir, "embeddings"))


@declared_query("q_sim_search_blas", oracle=_EXACT_TOPK_SQL)
def q_sim_search_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22 exact scoring, vectorized: brute-force cosine top-k where the
    per-partition scoring is a single numpy matrix-vector product inside
    an Arrow-batched mapInPandas worker.

    Same semantics as q_sim_search, different execution strategy: instead
    of ~d interpreted JVM ops per row (zip_with/aggregate lambdas are not
    codegen'd), each worker stacks its Arrow batch into an (n, d) float64
    matrix and scores it with one BLAS matvec — the pattern every real
    vector engine uses for exact scoring, and the right CPU shape at
    100 TB (scan stays embarrassingly parallel; only per-partition top-k
    candidates reach the final TakeOrdered). Hash-verified against the
    same _EXACT_TOPK_SQL as q_sim_search: BLAS pairwise summation differs
    from a sequential fold only at the 1e-15 level, far below the 9-dp
    rounding both sides apply to the emitted cosine (r4 VERDICT item 5 —
    this converts an ANN-adjacent row from rows-only to hard signal).
    """
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    qv = np.array(
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding").head()[0], dtype=np.float64)
    qn = float(np.sqrt(qv @ qv))
    top_k = TOP_K

    def score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            m = _np.stack(pdf["embedding"].map(
                lambda v: _np.asarray(v, dtype=_np.float64)))
            dots = m @ qv
            norms = _np.sqrt((m * m).sum(axis=1))
            cos = dots / (norms * qn)
            out = _pd.DataFrame({"vec_id": pdf["vec_id"], "cos_raw": cos})
            # per-batch pre-top-k: only candidates leave the worker
            yield out.nlargest(min(top_k, len(out)), "cos_raw")

    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "embedding")
        .mapInPandas(score, schema="vec_id long, cos_raw double")
    )
    return (
        scored.orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .select("vec_id", (F.round("cos_raw", 9) + F.lit(0.0)).alias("cosine"))
    )


IVF_NLIST = 16
IVF_NPROBE = 2
IVF_KMEANS_ITERS = 3
IVF_TRAIN_SAMPLE_CAP = 4096


def _sq_l2(a: str | Column, b: str | Column) -> Column:
    """Σ (a[i]-b[i])² in double — JVM-side, no UDF."""
    diffs = F.zip_with(
        a, b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def train_ivf_centroids(
    spark: SparkSession,
    emb: DataFrame,
    nlist: int = IVF_NLIST,
    iters: int = IVF_KMEANS_ITERS,
) -> list[list[float]]:
    """Lloyd's k-means over an embedding DataFrame, Spark-side.

    Each iteration is two distributed jobs (the same bounded driver-loop
    pattern as graph.connected_components — the loop count is a small
    constant; the per-iteration work is fully distributed):
      1. assignment: corpus ⋈ broadcast(centroids) (nlist-row build side,
         O(n·k·d) map work, no shuffle) → argmin-L2 cell per vector via
         min_by (one shuffle, partial aggregation combines map-side);
      2. update: posexplode each assigned vector, groupBy (cell, dim) avg
         (one shuffle over nlist·d groups), collect the nlist·d means
         (metadata-sized: 16·64 doubles) and rebuild the centroid list.

    Init is the deterministic first-nlist sample by vec_id; empty cells
    keep their previous centroid. At 100 TB: train on a hash-sample of
    the corpus (k-means converges on a sample), persist the centroids
    next to the table, refresh periodically — the probe path is unchanged.
    """
    init = emb.orderBy("vec_id").limit(nlist).select("embedding").collect()
    cents = [[float(x) for x in r[0]] for r in init]
    for _ in range(iters):
        cdf = values_df(
            emb.sparkSession, [(i, c) for i, c in enumerate(cents)],
            [("cent_id", "int"), ("cv", "array<double>")])
        assign = (
            emb.crossJoin(F.broadcast(cdf))
            .select("vec_id", "embedding", "cent_id",
                    _sq_l2("embedding", "cv").alias("d2"))
            .groupBy("vec_id")
            .agg(
                F.min_by("cent_id", F.struct(F.col("d2"), F.col("cent_id")))
                .alias("cent_id"),
                F.first("embedding").alias("embedding"),
            )
        )
        means = (
            assign.select(
                "cent_id", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("cent_id", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        cents = [list(c) for c in cents]
        for r in means:
            cents[r["cent_id"]][r["dim"]] = float(r["m"])
    return cents


def train_ivf_centroids_sampled(
    emb: DataFrame,
    nlist: int = IVF_NLIST,
    iters: int = IVF_KMEANS_ITERS,
    sample_cap: int = IVF_TRAIN_SAMPLE_CAP,
) -> list[list[float]]:
    """Lloyd's k-means over a bounded deterministic sample — the query-path
    trainer, and the shape production actually runs at 100 TB.

    k-means centroids converge on a uniform sample (the codebook models the
    vector *distribution*, not individual rows), so training never needs the
    full corpus: take the ``sample_cap`` rows with the smallest
    xxhash64(vec_id) — a similarity-agnostic deterministic sample that plans
    as TakeOrderedAndProject (per-partition heaps, ONE distributed job, no
    full sort, no per-iteration shuffle) — and run the Lloyd iterations on
    the driver in numpy. Same semantics as train_ivf_centroids (init = the
    nlist lowest vec_ids of the corpus it sees, argmin-L2 with ties to the
    lowest cent_id, empty cells keep their previous centroid); use the
    distributed trainer instead when the required sample exceeds driver
    memory. The probe path is identical either way.
    """
    sampled = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(sample_cap)
        .toPandas()  # Arrow batch transfer — ~3× faster than collect()
        .sort_values("vec_id")
    )
    m = np.array([np.asarray(v, dtype=np.float64)
                  for v in sampled["embedding"]])
    cents = m[:nlist].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # np argmin ties → lowest index
        for c in range(nlist):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents.tolist()


# Fixed side-table locations for the IVF oracles (see q_text_fingerprint
# for the pattern): the Spark query persists its index artifacts — the
# (vec_id, cent_id) assignment and the probe list — and DuckDB
# independently re-applies the probe filter and recomputes the exact
# cosine top-k over the candidates. The k-means TRAINING stays
# unverified by design: centroids are an index-build heuristic (any
# codebook yields a valid ANN index); every VALUE in the result is
# verified.
_IVF_ASSIGN_DIR = fixed_scratch_dir("q_ivf_assign")
_IVF_PROBES_DIR = fixed_scratch_dir("q_ivf_probes")
_IVF_PART_INDEX_DIR = fixed_scratch_dir("q_ivf_part_index")
_IVF_PART_PROBES_DIR = fixed_scratch_dir("q_ivf_part_probes")
# index dir -> (sf_dir, corpus fingerprint) CURRENTLY materialized in it.
# Keyed by dir (single slot), not by corpus: every SF shares the one
# fixed scratch dir, so "built for corpus X once" must be invalidated
# the moment another corpus overwrites the dir — a corpus-keyed set
# would happily skip the rebuild after an interleaved sf0.001/sf0.01/
# sf0.001 sequence and probe the WRONG index.
_IVF_PART_MEMO: dict[str, tuple] = {}


def build_ivf_partitioned_index(spark: SparkSession, sf_dir: str,
                                raw: DataFrame | None = None,
                                trained: list[list[float]] | None = None
                                ) -> str:
    """Materialize (or reuse) the cell-partitioned IVF layout — an
    OFFLINE index artifact (one build amortized over every probe),
    memoized per fingerprinted corpus exactly like the codebook that
    derives it (_TRAIN_MEMO): within one process, later calls skip the
    rewrite. The build is deterministic given the corpus, so a skipped
    write would have produced identical files; a corpus rewrite at the
    same path moves the fingerprint and forces a rebuild. Exposed
    standalone so bench.py's offline-artifact prewarm can build the
    index WITHOUT running the probe/top-k read path it would otherwise
    warm (r13 review find).

    isdir guard: the fixed scratch dir is cross-process-shared and
    every process registers an atexit cleanup on it — a sibling process
    exiting can delete the index out from under a warm memo, and
    without the check that would be a permanent per-process
    PATH_NOT_FOUND (the pre-memo code self-healed by rewriting every
    call)."""
    if raw is None:
        raw = load(spark, sf_dir, "embeddings")
    if trained is None:
        trained = trained_centroids(raw, sf_dir)
    key = (sf_dir, *_corpus_token(sf_dir))
    if (_IVF_PART_MEMO.get(_IVF_PART_INDEX_DIR) != key
            or not os.path.isdir(_IVF_PART_INDEX_DIR)):
        emb = raw.withColumn("nrm", _norm("embedding"))
        assign = assign_cells_arrow(
            emb.select("vec_id", "embedding", "nrm"), trained)
        assign.write.mode("overwrite").partitionBy("cent_id") \
            .parquet(_IVF_PART_INDEX_DIR)
        _IVF_PART_MEMO[_IVF_PART_INDEX_DIR] = key
    return _IVF_PART_INDEX_DIR


def _ivf_oracle_sql(assign_glob: str, probes_glob: str,
                    hive: bool = False) -> str:
    def self_dot(col: str) -> str:
        return (f"list_sum(list_transform(range(1, {DIM + 1}), "
                f"i -> CAST({col}[i] AS DOUBLE) * CAST({col}[i] AS DOUBLE)))")

    qdot = (f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> CAST(c.embedding[i] AS DOUBLE)"
            f" * CAST(q.qv[i] AS DOUBLE)))")
    hp = ", hive_partitioning=1" if hive else ""
    return f"""
        WITH assign AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(cent_id AS INTEGER) AS cent_id
            FROM read_parquet('{assign_glob}'{hp})
        ),
        q AS (
            SELECT embedding AS qv, sqrt({self_dot('embedding')}) AS qnrm
            FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        ),
        cand AS (
            SELECT a.vec_id, a.cent_id, e.embedding,
                   sqrt({self_dot('e.embedding')}) AS nrm
            FROM assign a JOIN embeddings e USING (vec_id)
            WHERE a.vec_id <> {QUERY_VEC_ID}
              AND a.cent_id IN (
                    SELECT CAST(cent_id AS INTEGER)
                    FROM read_parquet('{probes_glob}'))
        ),
        scored AS (
            SELECT c.vec_id, c.cent_id,
                   {qdot} / (c.nrm * q.qnrm) AS cos_raw
            FROM cand c, q
        )
        SELECT vec_id, cent_id, round(cos_raw, 9) + 0.0 AS cosine
        FROM scored ORDER BY cos_raw DESC, vec_id LIMIT {TOP_K}
    """


def _write_probes(spark: SparkSession, probe_ids: list[int],
                  path: str) -> None:
    values_df(spark, [(int(i),) for i in probe_ids], [("cent_id", "int")]) \
        .coalesce(1).write.mode("overwrite").parquet(path)


@declared_query(
    "q_sim_search_ivf",
    oracle=_ivf_oracle_sql(f"{_IVF_ASSIGN_DIR}/*.parquet",
                           f"{_IVF_PROBES_DIR}/*.parquet"),
)
def q_sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22 scale path #2: IVF (inverted-file) ANN top-k over trained
    k-means centroids.

    The other classic ANN family next to LSH: partition the corpus into
    NLIST coarse cells via k-means (IVF_KMEANS_ITERS Lloyd iterations over
    a bounded deterministic sample — train_ivf_centroids_sampled above;
    train_ivf_centroids is the fully-distributed trainer for when the
    sample must exceed driver memory), then search only the NPROBE cells
    whose centroids are L2-nearest the query.

    Plan shape of the search, ZERO full-corpus shuffles:
      1. assign = argmin-L2 cell per vector in ONE Arrow-vectorized pass
         (assign_cells_arrow: d2 = ||c||² − 2·M·Cᵀ per batch, row-wise
         argmin, ties to the lowest cent_id) — O(n·k·d) BLAS map work,
         no join, no shuffle, no row blowup; the assignment is persisted
         and the oracle verifies against the persisted values, so the
         numpy summation order needs no JVM-fold bit-parity;
      2. probe list = query's NPROBE nearest centroids (sort_array on the
         query row's distance array);
      3. candidates = assignment ⋈ broadcast(probes) — prunes the corpus to
         ~NPROBE/NLIST of the rows with no shuffle;
      4. exact cosine + TakeOrderedAndProject top-k on the candidates.

    At 100 TB: centroids are trained offline on a sample and kept as a
    broadcast; the table is written partitioned by cell id, turning step 3
    into partition pruning — the same layout trick as the LSH variant.
    Recall < 1 by design (measured vs the exact baseline in
    tests/test_similarity_recall.py); pair with q_sim_search.

    Hash-verified (r5): the (vec_id, cent_id) assignment and the probe
    list persist as side tables; DuckDB independently re-applies the
    probe filter and recomputes the exact cosine top-k (_ivf_oracle_sql).
    Only the k-means training itself — an index-build heuristic — is
    taken as given.
    """
    raw = load(spark, sf_dir, "embeddings")
    trained = trained_centroids(raw, sf_dir)
    emb = raw.withColumn("nrm", _norm("embedding"))
    assign = assign_cells_arrow(
        emb.select("vec_id", "embedding", "nrm"), trained)
    assign.select("vec_id", "cent_id").write.mode("overwrite") \
        .parquet(_IVF_ASSIGN_DIR)
    qv, qnrm, probe_ids = _ivf_query_probes(raw, trained, QUERY_VEC_ID)
    _write_probes(spark, probe_ids, _IVF_PROBES_DIR)
    # candidates come from the PERSISTED assignment (what the oracle
    # audits) joined back to the vectors — the assignment expression is
    # not recomputed for the scoring pass
    candidates = (
        reopen_parquet(spark, _IVF_ASSIGN_DIR)
        .filter(F.col("cent_id").isin(probe_ids))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(emb, "vec_id")
    )
    return _ivf_score_topk(candidates, qv, qnrm, TOP_K)


_TRAIN_MEMO: dict[tuple, list[list[float]]] = {}


def _corpus_token(sf_dir: str) -> tuple[int, int]:
    """Cheap corpus fingerprint folded into the offline-artifact memo
    keys (_TRAIN_MEMO / _PQ_MEMO): if the data under ``sf_dir`` is
    regenerated within one process (e.g. a tool that rebuilds
    scale_data/sfN and re-benches in one session), the stale codebook
    must not be served (r11 review find). stat of the embeddings
    parquet path — a directory's mtime changes on every overwrite —
    costs no data scan. A non-path memo key degrades to (0, 0), i.e.
    the r11 one-process/one-corpus behavior."""
    import os

    try:
        st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (0, 0)


def trained_centroids(emb: DataFrame, sf_dir: str,
                      nlist: int = IVF_NLIST) -> list[list[float]]:
    """Memoized sampled k-means per (sf_dir, nlist, corpus fingerprint).
    Training is deterministic (hash sample + fixed init), so every
    IVF-family query over the same corpus derives the IDENTICAL
    codebook — caching it is semantics-free and mirrors production,
    where the codebook is an offline artifact shared by all queries,
    not retrained per query."""
    key = (sf_dir, nlist, *_corpus_token(sf_dir))
    if key not in _TRAIN_MEMO:
        _TRAIN_MEMO[key] = train_ivf_centroids_sampled(emb, nlist=nlist)
    return _TRAIN_MEMO[key]


def assign_cells_arrow(df: DataFrame,
                       cents: list[list[float]]) -> DataFrame:
    """Append the argmin-L2 ``cent_id`` to (vec_id, embedding, nrm) rows
    in ONE Arrow-vectorized pass: per batch, d2 = ||c||² − 2·M·Cᵀ (the
    same dot form as _ivf_cells_expr, ||x||² dropped) and a row-wise
    argmin with ties to the lowest cent_id — numpy matmul instead of
    nlist interpreted HOF folds, which is both the fast local shape and
    the honest 100 TB shape (the index build is a vectorized scan, and
    the queries that use this persist the assignment and verify against
    it, so JVM-fold bit-parity is not required here). ``nrm`` passes
    through untouched — cosine scoring stays JVM-side."""
    cents_py = [[float(x) for x in cv] for cv in cents]

    def run(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(cents_py, dtype=np.float64)
        cn = (C * C).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(cent_id=pd.Series([], dtype="int32"))
                continue
            M = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf["embedding"]])
            d2 = cn[None, :] - 2.0 * (M @ C.T)
            pdf = pdf.copy()
            pdf["cent_id"] = d2.argmin(axis=1).astype("int32")
            yield pdf
    return df.mapInPandas(
        run, "vec_id long, embedding array<float>, nrm double, cent_id int")


def _ivf_cells_expr(trained: list[list[float]]) -> Column:
    """argmin-L2 cell scores via the dot form: ||x-c||² = ||x||² - 2<x,c>
    + ||c||², and ||x||² is constant per row so it drops out of the
    argmin. Each cell then costs ONE fold (the dot product) instead of a
    squared-diff array + fold — ~35% faster end-to-end (codegen compiles
    half the lambda chains), with ||c||² folded in as a plan literal."""
    def _dot_lit(cv: list[float]) -> Column:
        clit = F.array(*[F.lit(float(x)) for x in cv])
        return F.aggregate(
            F.zip_with("embedding", clit, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)

    return F.array(*[
        F.struct(
            (F.lit(float(np.dot(cv, cv))) - 2.0 * _dot_lit(cv)).alias("d2"),
            F.lit(i).alias("cent_id"),
        )
        for i, cv in enumerate(trained)
    ])


def _ivf_query_probes(
    raw: DataFrame, trained: list[list[float]], query_vec_id: int,
) -> tuple[np.ndarray, float, list[int]]:
    """Resolve the one-row query vector and its NPROBE nearest centroids
    driver-side (numpy over the already-in-memory codebook) instead of as
    two 1-row Spark jobs. The probe list then enters the plan as a static
    IN-filter, which is the 100 TB shape: against a cell-partitioned
    table it becomes partition pruning the planner sees at compile time,
    and the query vector is a plan literal."""
    qv = np.asarray(
        raw.filter(F.col("vec_id") == query_vec_id)
        .select("embedding").toPandas()["embedding"][0], dtype=np.float64)
    qnrm = float(np.sqrt(qv @ qv))
    d2 = ((np.asarray(trained) - qv) ** 2).sum(axis=1)
    probe_ids = [int(i) for i in
                 np.argsort(d2, kind="stable")[:IVF_NPROBE]]
    return qv, qnrm, probe_ids


def _ivf_score_topk(candidates: DataFrame, qv: np.ndarray, qnrm: float,
                    top_k: int) -> DataFrame:
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    scored = candidates.select(
        "vec_id", "cent_id",
        (_dot("embedding", qlit)
         / (F.col("nrm") * F.lit(qnrm))).alias("cos_raw"),
    )
    return (
        scored.orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(top_k)
        .select("vec_id", "cent_id", (F.round("cos_raw", 9) + F.lit(0.0)).alias("cosine"))
    )


def sim_search_ivf_on(
    spark: SparkSession,
    raw: DataFrame,
    query_vec_id: int = QUERY_VEC_ID,
    top_k: int = TOP_K,
) -> DataFrame:
    """Trained-IVF top-k over any (vec_id, embedding) DataFrame — the core
    of q_sim_search_ivf, factored for planted-corpus recall tests."""
    trained = train_ivf_centroids_sampled(raw)
    emb = raw.withColumn("nrm", _norm("embedding"))
    assign = emb.select(
        "vec_id", "embedding", "nrm",
        F.array_min(_ivf_cells_expr(trained))["cent_id"].alias("cent_id"),
    )
    qv, qnrm, probe_ids = _ivf_query_probes(raw, trained, query_vec_id)
    candidates = (
        assign.filter(F.col("vec_id") != query_vec_id)
        .filter(F.col("cent_id").isin(probe_ids))
    )
    return _ivf_score_topk(candidates, qv, qnrm, top_k)


@declared_query(
    "q_sim_search_ivf_partitioned",
    oracle=_ivf_oracle_sql(f"{_IVF_PART_INDEX_DIR}/*/*.parquet",
                           f"{_IVF_PART_PROBES_DIR}/*.parquet", hive=True),
)
def q_sim_search_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22 scale path #2b: IVF over a MATERIALIZED cell-partitioned
    layout — the "write the table partitioned by cell id" trick that
    q_sim_search_ivf's docstring promises, made real.

    Build: assign every vector its k-means cell (the same Arrow-vectorized
    assign_cells_arrow pass as q_sim_search_ivf, norms precomputed) and
    write ONE parquet dataset
    ``partitionBy("cent_id")`` — the offline index-build job a vector
    store runs once, amortized over every query. Probe: read back with
    ``cent_id IN (probes)``; Spark's file index resolves the filter
    against the directory names, so non-probed cells are never listed,
    opened, or scheduled — the scan's PartitionFilters line (pinned in
    tests/test_plan_shapes.py) is the disk-level analog of ClickHouse
    partition pruning, and at 100 TB it is the difference between
    touching ~NPROBE/NLIST of the corpus and touching all of it.

    Deterministic given the corpus (sampled k-means is deterministic), so
    tests/test_similarity_recall.py asserts result == q_sim_search_ivf
    row-for-row. Hash-verified (r5): DuckDB reads the SAME materialized
    index (hive-partitioned cent_id directories) plus the persisted probe
    list, re-applies the probe filter, and recomputes the exact cosine
    top-k — the oracle audits the very files the Spark probe scans."""
    raw = load(spark, sf_dir, "embeddings")
    trained = trained_centroids(raw, sf_dir)
    build_ivf_partitioned_index(spark, sf_dir, raw, trained)

    qv, qnrm, probe_ids = _ivf_query_probes(raw, trained, QUERY_VEC_ID)
    _write_probes(spark, probe_ids, _IVF_PART_PROBES_DIR)
    candidates = (
        reopen_parquet(spark, _IVF_PART_INDEX_DIR)
        .filter(F.col("cent_id").isin(probe_ids))   # directory pruning
        .filter(F.col("vec_id") != QUERY_VEC_ID)
    )
    return _ivf_score_topk(candidates, qv, qnrm, TOP_K)


PAIR_TOP_K = 20
COS_AUDIT_BLOCKS = 25
# rows per block held constant as the corpus grows: the fixture SFs
# (n = 20 / 200 / 2000 embeddings) all resolve to B = COS_AUDIT_BLOCKS
# under max(25, ceil(n/80)) — sf0.1 lands exactly on 2000/80 = 25 — so
# oracle bit-parity is untouched while scaled corpora stop being
# quadratic (fixed B means n²/B pair work; holding n/B at 80 keeps the
# scored-pair budget linear, the same dual-path rule as SemDeDup's k).
COS_ROWS_PER_BLOCK = 80


def _cos_audit_blocks(n_vecs: int | None) -> int:
    """Block count for the cosine pair audit: ⌈n/80⌉ floored at the
    fixture literal 25 (see COS_ROWS_PER_BLOCK comment — every fixture
    SF resolves to exactly 25, scaled corpora grow linearly)."""
    if n_vecs is None:
        return COS_AUDIT_BLOCKS
    return max(COS_AUDIT_BLOCKS, -(-n_vecs // COS_ROWS_PER_BLOCK))


@declared_query(
    "q_near_dedup_cosine",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, embedding, vec_id % {COS_AUDIT_BLOCKS} AS blk
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_sum(list_transform(range(1, {DIM + 1}),
                       k -> CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(range(1, {DIM + 1}),
                          k -> CAST(a.embedding[k] AS DOUBLE) * CAST(a.embedding[k] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, {DIM + 1}),
                          k -> CAST(b.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)))))
                   AS cos_raw
            FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, round(cos_raw, 9) + 0.0 AS cosine
        FROM pairs ORDER BY cos_raw DESC, id_a, id_b LIMIT {PAIR_TOP_K}
    """,
    # oracle pins blk = vec_id % 25; the Spark side grows the block
    # count past n = 25*80 rows (_cos_audit_blocks) where no oracle runs
    oracle_fixture_max_rows=COS_AUDIT_BLOCKS * COS_ROWS_PER_BLOCK,
)
def q_near_dedup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup audit: top-{20} most-similar pairs within
    a blocked 1/{25} uniform sample of all pairs.

    The audit path for the LSH variant below: exact cosine, but pairs are
    scored only within similarity-agnostic blocks (vec_id % B), so the
    scored pair set is an unbiased 1/B sample of all pairs and the join is
    an EQUI-join on blk — a shuffled hash join, never a nested loop. Total
    work is n²/B; B = max({25}, ⌈n/{80}⌉) scales with n above the fixture
    sizes (holding n/B rows per block constant) so per-reducer work and
    the sampled-pair budget stay LINEAR at 100 TB; at every fixture SF
    (n ≤ 2000) the formula resolves to exactly B = {25}, matching the
    oracle's literal. n comes from the parquet footer (zero Spark jobs).
    An audit that estimates the pair-similarity distribution does not need
    every pair — it needs an unbiased sample and bounded cost; the LSH
    variant below is the path that targets the *high-cosine* pairs.
    """
    emb = load(spark, sf_dir, "embeddings")
    n_vecs = _parquet_num_rows(os.path.join(sf_dir, "embeddings.parquet"))
    if n_vecs is None:
        n_vecs = emb.count()  # q_semdedup's fallback convention: never
        #                       let a footer-read failure silently pin
        #                       the fixture B (and its n²/25 pair work)
    blocks = _cos_audit_blocks(n_vecs)
    emb = emb.withColumn("nrm", _norm("embedding")).withColumn(
        "blk", F.pmod("vec_id", F.lit(blocks)))
    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("va"), F.col("nrm").alias("na"),
                   F.col("blk").alias("blk_a"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("vb"), F.col("nrm").alias("nb"),
                   F.col("blk").alias("blk_b"))
    pairs = a.join(
        b, (F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b"))
    ).select(
        "id_a", "id_b",
        (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos_raw"),
    )
    return (
        pairs.orderBy(F.col("cos_raw").desc(), "id_a", "id_b")
        .limit(PAIR_TOP_K)
        .select("id_a", "id_b", (F.round("cos_raw", 9) + F.lit(0.0)).alias("cosine"))
    )


def _cosine_lsh_oracle_sql() -> str:
    bucket = _sql_plane_bucket_expr("embedding")
    self_dot = _sql_self_dot("embedding")
    pdot = (f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> CAST(a.embedding[i] AS DOUBLE)"
            f" * CAST(b2.embedding[i] AS DOUBLE)))")
    return f"""
        WITH b AS (
            SELECT vec_id, embedding, {bucket} AS bucket,
                   sqrt({self_dot}) AS nrm
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                   a.bucket AS bucket,
                   {pdot} / (a.nrm * b2.nrm) AS cos_raw
            FROM b a JOIN b b2
              ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        )
        SELECT id_a, id_b, bucket, round(cos_raw, 9) + 0.0 AS cosine
        FROM pairs ORDER BY cos_raw DESC, id_a, id_b LIMIT {PAIR_TOP_K}
    """


@declared_query(
    "q_near_dedup_cosine_lsh", oracle=_cosine_lsh_oracle_sql(),
    # oracle pins the 8-bit plane set; the Spark side grows bits past
    # n = 8 * 2^LSH_BITS rows (_lsh_pair_bits) where no oracle runs
    oracle_fixture_max_rows=8 * (1 << LSH_BITS),
)
def q_near_dedup_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, scale path: candidate pairs only within the
    same sign-projection LSH bucket (equi-join on bucket — a hash join, never
    a cross join), then exact cosine on the candidates.

    Hash-verified (r5): the hyperplanes embed as literals in the oracle
    SQL, so DuckDB replays bucketing, the same-bucket pair join, and the
    exact cosine top-{20} bit-for-bit (_cosine_lsh_oracle_sql).

    At 100 TB: bucket count scales with n — bits = max(8, ⌈log₂(n/8)⌉)
    (_lsh_pair_bits) holds bucket occupancy at ~8 rows, so the self-join
    shuffles on bucket with each reducer seeing a BOUNDED row group and
    total pair work stays linear; every fixture SF resolves to exactly
    the oracle's 8 bits, and the scaled plane set is a prefix-stable
    refinement (same seed, more rows). Skewed buckets split under AQE.
    High-cosine pairs land in the same bucket with probability
    (1 - θ/π)^bits — multi-probe neighboring buckets for recall.
    """
    emb = load(spark, sf_dir, "embeddings")
    n_vecs = _parquet_num_rows(os.path.join(sf_dir, "embeddings.parquet"))
    if n_vecs is None:
        n_vecs = emb.count()  # never silently fall back to fixture bits
    bits = _lsh_pair_bits(n_vecs)
    planes = _hyperplanes(bits)

    if bits == LSH_BITS:
        # fixture path: plan-literal fold, bit-identical with the oracle
        bucketed = emb.select("vec_id", "embedding",
                              _bucket_of(planes, "embedding").alias("bucket"),
                              _norm("embedding").alias("nrm"))
    else:
        # scaled path (no oracle): one Arrow sign-matmul pass replaces
        # `bits` interpreted HOF folds, with the corpus mean subtracted
        # before projection — uncentered data concentrates bucket
        # probabilities and makes pair work quadratic (see
        # _bucket_arrow); cosine scoring stays JVM-side on RAW vectors
        bucketed = _bucket_arrow(
            emb.select("vec_id", "embedding"), planes,
            center=_corpus_mean(emb, sf_dir),
        ).withColumn("nrm", _norm("embedding"))
    a = bucketed.select(F.col("vec_id").alias("id_a"),
                        F.col("embedding").alias("va"),
                        F.col("bucket").alias("ba"),
                        F.col("nrm").alias("na"))
    b = bucketed.select(F.col("vec_id").alias("id_b"),
                        F.col("embedding").alias("vb"),
                        F.col("bucket").alias("bb"),
                        F.col("nrm").alias("nb"))
    pairs = (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", "ba",
                (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos_raw"))
    )
    return (
        pairs.orderBy(F.col("cos_raw").desc(), "id_a", "id_b")
        .limit(PAIR_TOP_K)
        .select("id_a", "id_b", F.col("ba").alias("bucket"),
                (F.round("cos_raw", 9) + F.lit(0.0)).alias("cosine"))
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance (ADC) + exact rerank
# --------------------------------------------------------------------------

PQ_M = 8              # subspaces (64 dims → 8 × 8-dim subvectors)
PQ_KS = 16            # codewords per subspace → 4 bits/code, 8 B/vector
PQ_ITERS = 5
PQ_SHORTLIST = 100    # ADC candidates kept for the exact rerank


_PQ_MEMO: dict[tuple, np.ndarray] = {}


def train_pq_codebooks(emb: DataFrame, m: int = PQ_M, ks: int = PQ_KS,
                       iters: int = PQ_ITERS,
                       sample_cap: int = 4096,
                       memo_key: str | None = None) -> np.ndarray:
    """Per-subspace Lloyd's k-means over L2-NORMALIZED vectors from the
    same bounded deterministic sample the IVF trainer uses (codebooks
    model the distribution; training never needs the full corpus).
    Normalizing first makes ADC-L2 rank ≡ cosine rank, so the PQ
    shortlist feeds a cosine rerank without metric mismatch. Returns
    (m, ks, dim/m) float64, deterministic given the corpus.

    ``memo_key`` (normally the sf_dir): training is deterministic given
    the corpus, so memoizing per corpus is semantics-free and mirrors
    production where the codebook is an offline artifact — the same
    contract as trained_centroids' _TRAIN_MEMO. Callers on ad-hoc frames
    (the planted-corpus recall test) pass no key and always retrain.
    The corpus fingerprint (mtime+size of the embeddings parquet) rides
    in the key so an in-process regeneration of the corpus invalidates
    the memo — see _corpus_token."""
    cache_key = (memo_key, m, ks, iters, sample_cap,
                 *(_corpus_token(memo_key) if memo_key else (0, 0)))
    if memo_key is not None and cache_key in _PQ_MEMO:
        return _PQ_MEMO[cache_key]
    sampled = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(sample_cap)
        .toPandas()
        .sort_values("vec_id")
    )
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in sampled["embedding"]])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    sub = X.shape[1] // m
    books = []
    for s in range(m):
        xs = X[:, s * sub:(s + 1) * sub]
        cents = xs[:ks].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(ks):
                pts = xs[assign == j]
                if len(pts):
                    cents[j] = pts.mean(0)
        books.append(cents)
    out = np.stack(books)
    if memo_key is not None:
        _PQ_MEMO[cache_key] = out
    return out


def sim_search_pq_on(emb: DataFrame, query_vec_id: int = QUERY_VEC_ID,
                     top_k: int = TOP_K,
                     persist_shortlist: str | None = None,
                     memo_key: str | None = None) -> DataFrame:
    """PQ + ADC + exact-rerank core over any (vec_id, embedding) frame
    (the planted-corpus recall test drives this directly).
    ``persist_shortlist``: optional parquet dir the ADC shortlist is
    written to (and re-read from) so an oracle can audit the rerank."""
    spark = emb.sparkSession
    books = train_pq_codebooks(emb, memo_key=memo_key)
    q = (emb.filter(F.col("vec_id") == query_vec_id)
         .select("embedding").toPandas())
    qv = np.asarray(q["embedding"][0], dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    sub = DIM // PQ_M
    # LUT[s][j] = ||q_s - c_sj||² — the only query-dependent state
    lut = np.stack([
        ((books[s] - qn[s * sub:(s + 1) * sub]) ** 2).sum(-1)
        for s in range(PQ_M)
    ])
    bc = spark.sparkContext.broadcast((books, lut))

    def adc(batches):
        # self-contained closure: runs on workers with any cwd
        import numpy as _np
        import pandas as _pd

        bks, tbl = bc.value
        s_dim = bks.shape[2]
        for pdf in batches:
            if not len(pdf):
                continue
            X = _np.stack([_np.asarray(v, dtype=_np.float64)
                           for v in pdf["embedding"]])
            X = X / _np.linalg.norm(X, axis=1, keepdims=True)
            score = _np.zeros(len(X))
            for s in range(bks.shape[0]):
                xs = X[:, s * s_dim:(s + 1) * s_dim]
                d2 = ((xs[:, None, :] - bks[s][None, :, :]) ** 2).sum(-1)
                codes = d2.argmin(1)          # encode
                score += tbl[s][codes]        # ADC lookup
            yield _pd.DataFrame({"vec_id": pdf["vec_id"], "adc": score})

    # corpus-proportional shortlist: quantization error is corpus-
    # independent, so a fixed L loses recall as n grows — L = n/4 keeps
    # the rerank a bounded fraction while the ADC scan stays code-only
    n = emb.count()
    shortlist = (
        emb.filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "embedding")
        .mapInPandas(adc, "vec_id long, adc double")
        .orderBy("adc", "vec_id")
        .limit(max(PQ_SHORTLIST, n // 4))
    )
    if persist_shortlist is not None:
        shortlist.select("vec_id").write.mode("overwrite") \
            .parquet(persist_shortlist)
        shortlist = reopen_parquet(spark, persist_shortlist)
    # exact cosine rerank over the shortlist only (JVM array arithmetic —
    # identical scoring expression to q_sim_search, so doubles match)
    cand = F.broadcast(shortlist).join(
        emb.withColumn("nrm", _norm("embedding")), "vec_id")
    qrow = (emb.filter(F.col("vec_id") == query_vec_id)
            .select(F.col("embedding").alias("qv"),
                    _norm("embedding").alias("qnrm")))
    scored = cand.crossJoin(F.broadcast(qrow)).select(
        "vec_id",
        (_dot("embedding", "qv") / (F.col("nrm") * F.col("qnrm")))
        .alias("cos_raw"))
    return (
        scored.orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(top_k)
        .select("vec_id", (F.round("cos_raw", 9) + F.lit(0.0)).alias("cosine"))
    )


_PQ_SHORTLIST_DIR = fixed_scratch_dir("q_pq_shortlist")


def _pq_oracle_sql() -> str:
    qdot = (f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> CAST(e.embedding[i] AS DOUBLE)"
            f" * CAST(q.qv[i] AS DOUBLE)))")
    return f"""
        WITH short AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id
            FROM read_parquet('{_PQ_SHORTLIST_DIR}/*.parquet')
        ),
        q AS (
            SELECT embedding AS qv, sqrt({_sql_self_dot('embedding')}) AS qnrm
            FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        ),
        scored AS (
            SELECT e.vec_id,
                   {qdot} / (sqrt({_sql_self_dot('e.embedding')}) * q.qnrm)
                       AS cos_raw
            FROM embeddings e JOIN short USING (vec_id), q
        )
        SELECT vec_id, round(cos_raw, 9) + 0.0 AS cosine
        FROM scored ORDER BY cos_raw DESC, vec_id LIMIT {TOP_K}
    """


@declared_query("q_sim_search_pq", oracle=_pq_oracle_sql())
def q_sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22 scale path #4: product quantization with asymmetric-distance
    scoring and exact rerank — the memory-bound regime's ANN answer
    (IVF-PQ's compression half; compose with the IVF cell layout for the
    full index). Vectors compress 32× (64 float32 dims → 8 nibble codes);
    the ADC scan reads CODES, not vectors: the query builds one (m × ks)
    LUT of subspace distances and each row's score is m table lookups —
    at 100 TB the scan touches 8 B/vector instead of 256 B.

    Pipeline: train per-subspace codebooks on a deterministic sample →
    encode + ADC-score in ONE Arrow-vectorized mapInPandas pass (numpy
    argmin/take, no Python-per-row) → TakeOrdered shortlist of
    max(100, corpus/4) → exact cosine rerank JVM-side on the shortlist
    only. Normalized-space ADC-L2 is rank-monotone with cosine, so every
    true neighbor inside the shortlist surfaces with its EXACT score.

    Hash-verified (r5): the ADC shortlist persists as a side table and
    DuckDB recomputes the exact-cosine rerank + top-k over it
    (_pq_oracle_sql) — only the shortlist SELECTION (the approximate
    step, whose recall tests/test_similarity_recall.py pins ≥0.9 on a
    planted-neighbor corpus) is taken as given. The fixture vectors are
    isotropic noise — PQ's adversarial case; real embedding corpora
    cluster and run a far smaller shortlist."""
    return sim_search_pq_on(load(spark, sf_dir, "embeddings"),
                            persist_shortlist=_PQ_SHORTLIST_DIR,
                            memo_key=sf_dir)


# ---------------------------------------------------------------------------
# Round 5: batched exact k-NN join (one window, many queries)
# ---------------------------------------------------------------------------

KNN_N_QUERIES = 8   # vec_id 0..7 form the query batch
KNN_K = 5


def _knn_join_oracle_sql() -> str:
    self_dot = _sql_self_dot("embedding")
    qdot = (f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> CAST(c.embedding[i] AS DOUBLE)"
            f" * CAST(q.qv[i] AS DOUBLE)))")
    return f"""
        WITH b AS (
            SELECT vec_id, embedding, sqrt({self_dot}) AS nrm
            FROM embeddings
        ),
        q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qnrm
              FROM b WHERE vec_id < {KNN_N_QUERIES}),
        c AS (SELECT vec_id, embedding, nrm FROM b
              WHERE vec_id >= {KNN_N_QUERIES}),
        scored AS (
            SELECT q.q_id, c.vec_id,
                   {qdot} / (c.nrm * q.qnrm) AS cos_raw
            FROM c, q
        ),
        ranked AS (
            SELECT q_id, vec_id, cos_raw,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, vec_id) AS rnk
            FROM scored
        )
        SELECT q_id, rnk, vec_id, round(cos_raw, 9) + 0.0 AS cosine
        FROM ranked WHERE rnk <= {KNN_K}
    """


@declared_query("q_knn_join", oracle=_knn_join_oracle_sql())
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact k-NN join: for EVERY query in a bounded request batch
    (vec_id < {KNN_N_QUERIES}), the top-{KNN_K} cosine neighbors over the
    rest of the corpus — the serving shape of a vector store answering a
    batch of lookups in one scan, vs q_sim_search's single query.

    Plan shape: the query batch is a broadcast (request batches are KBs;
    the corpus is the big side and never shuffles) nested-loop against the
    corpus scan — O(|C|·|Q|) scored pairs is the DEFINITION of exact batch
    k-NN, bounded here by the batch size, not by data volume. Per-query
    top-k is one window on q_id (|Q| partitions, rank ≤ k) — at scale you
    cap emitted pairs per scan partition first (the blas pre-top-k
    pattern) so the window input is |parts|·|Q|·k rows, not |C|·|Q|.
    All-pairs self-join top-k is deliberately NOT this operator — that is
    the near-dup family's blocked/LSH territory.

    Hash-verified: dot products fold sequentially in both engines
    (zip_with/aggregate vs list_sum) and ranking ties break on vec_id, so
    DuckDB replays the ranking exactly; cosines round to 9 dp.
    """
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", "embedding",
        F.sqrt(_dot("embedding", "embedding")).alias("nrm"))
    q = base.filter(F.col("vec_id") < KNN_N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"))
    c = base.filter(F.col("vec_id") >= KNN_N_QUERIES)
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id", "vec_id",
        (_dot("embedding", "qv") / (F.col("nrm") * F.col("qnrm")))
        .alias("cos_raw"))
    from pyspark.sql import Window
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
        .select("q_id", "rnk", "vec_id",
                (F.round("cos_raw", 9) + F.lit(0.0)).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Round 5 (cont.): corpus clustering over embeddings (k-means assignments)
# ---------------------------------------------------------------------------

CLUSTER_K = 16
_CLUSTER_CENTS_DIR = fixed_scratch_dir("q_cluster_cents")


def _cluster_oracle_sql() -> str:
    # squared L2 between a corpus vector and a persisted centroid,
    # folded dim-by-dim in index order — same summation order as the
    # Spark side's zip_with/aggregate, so distances are bit-identical.
    d2 = (f"list_sum(list_transform(range(1, {DIM + 1}), "
          f"i -> (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])"
          f" * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])))")
    return f"""
        WITH c AS (
            SELECT cent_id, cv
            FROM read_parquet('{_CLUSTER_CENTS_DIR}/*.parquet')
        ),
        scored AS (
            SELECT e.vec_id, e.label, c.cent_id, {d2} AS d2
            FROM embeddings e CROSS JOIN c
        ),
        assigned AS (
            SELECT vec_id, label, cent_id, d2,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cent_id) AS rn
            FROM scored
        )
        SELECT cent_id,
               count(*) AS n_vecs,
               count(DISTINCT label) AS n_labels,
               round(avg(d2), 6) AS mean_d2
        FROM assigned WHERE rn = 1
        GROUP BY cent_id
    """


@declared_query("q_embed_cluster", oracle=_cluster_oracle_sql())
def q_embed_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering over the embedding column: k-means ({CLUSTER_K}
    cells) with a full-corpus assignment pass, reporting per-cluster
    size, label diversity, and mean squared distance — the
    cluster-balancing / semantic-bucketing step of training-data curation
    (e.g. cluster-proportional sampling, SemDeDup-style pruning).

    Training reuses the IVF sampled trainer (deterministic hash sample +
    driver-side Lloyd, the shape that holds at 100 TB because codebooks
    converge on a sample); the ASSIGNMENT is the distributed part — the
    {CLUSTER_K} centroids enter the plan as LITERALS and each row's cell
    is array_min over per-cell struct(d2, cent_id) scores (ties to the
    lowest cent_id): pure row-local map work, no join, no shuffle, no row
    blowup before the final {CLUSTER_K}-group agg. Unlike the IVF
    assignment's shifted dot-form d2 (argmin-equivalent only), the scores
    here are TRUE squared L2 folded dim-by-dim in index order, because
    the oracle independently recomputes every comparison.

    Hash-verified like the IVF family: the final centroids persist as a
    side table and DuckDB independently recomputes every assignment and
    all three per-cluster statistics from them — the iterative TRAINING
    is index-build heuristic (any codebook is a valid clustering); every
    VALUE in the result is verified.
    """
    emb = load(spark, sf_dir, "embeddings")
    cents = trained_centroids(emb, sf_dir, nlist=CLUSTER_K)
    cdf = values_df(spark, [(i, c) for i, c in enumerate(cents)],
                    [("cent_id", "int"), ("cv", "array<double>")])
    cdf.coalesce(1).write.mode("overwrite").parquet(_CLUSTER_CENTS_DIR)

    def _d2_lit(cv: list[float]) -> Column:
        clit = F.array(*[F.lit(float(x)) for x in cv])
        diffs = F.zip_with(
            "embedding", clit,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
        return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)

    cells = F.array(*[
        F.struct(_d2_lit(cv).alias("d2"), F.lit(i).alias("cent_id"))
        for i, cv in enumerate(cents)
    ])
    assigned = emb.select(
        "vec_id", "label", F.array_min(cells).alias("best"),
    ).select("vec_id", "label",
             F.col("best.cent_id").alias("cent_id"),
             F.col("best.d2").alias("d2"))
    return assigned.groupBy("cent_id").agg(
        F.count("*").alias("n_vecs"),
        F.countDistinct("label").alias("n_labels"),
        F.round(F.avg("d2"), 6).alias("mean_d2"),
    )


# ---------------------------------------------------------------------------
# Round 5 (cont.): IVF-accelerated batch k-NN join (the q_knn_join scale path)
# ---------------------------------------------------------------------------

KNN_IVF_NPROBE = 2
_KNN_IVF_ASSIGN_DIR = fixed_scratch_dir("q_knn_ivf_assign")
_KNN_IVF_PROBES_DIR = fixed_scratch_dir("q_knn_ivf_probes")


def _knn_ivf_oracle_sql() -> str:
    self_dot = _sql_self_dot("embedding")
    qdot = (f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> CAST(cand.embedding[i] AS DOUBLE)"
            f" * CAST(q.qv[i] AS DOUBLE)))")
    return f"""
        WITH assign AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(cent_id AS INTEGER) AS cent_id
            FROM read_parquet('{_KNN_IVF_ASSIGN_DIR}/*.parquet')
        ),
        probes AS (
            SELECT CAST(q_id AS BIGINT) AS q_id,
                   CAST(cent_id AS INTEGER) AS cent_id
            FROM read_parquet('{_KNN_IVF_PROBES_DIR}/*.parquet')
        ),
        b AS (SELECT vec_id, embedding, sqrt({self_dot}) AS nrm
              FROM embeddings),
        q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qnrm
              FROM b WHERE vec_id < {KNN_N_QUERIES}),
        c AS (SELECT a.vec_id, a.cent_id, b.embedding, b.nrm
              FROM assign a JOIN b USING (vec_id)
              WHERE a.vec_id >= {KNN_N_QUERIES}),
        cand AS (SELECT p.q_id, c.vec_id, c.embedding, c.nrm
                 FROM probes p JOIN c ON c.cent_id = p.cent_id),
        scored AS (
            SELECT cand.q_id, cand.vec_id,
                   {qdot} / (cand.nrm * q.qnrm) AS cos_raw
            FROM cand JOIN q USING (q_id)
        ),
        ranked AS (
            SELECT q_id, vec_id, cos_raw,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, vec_id) AS rnk
            FROM scored
        )
        SELECT q_id, rnk, vec_id, round(cos_raw, 9) + 0.0 AS cosine
        FROM ranked WHERE rnk <= {KNN_K}
    """


@declared_query("q_knn_join_ivf", oracle=_knn_ivf_oracle_sql())
def q_knn_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-accelerated batch k-NN join — q_knn_join's 100 TB shape. The
    exact batch join scores |C|·|Q| pairs; here each query only scores
    the corpus rows assigned to its {KNN_IVF_NPROBE} nearest k-means
    cells, so scored pairs shrink by ~NPROBE/NLIST while every join in
    the plan is an EQUI-join (no nested loop at any batch size):

      1. corpus cell assignment — plan-literal argmin over the trained
         centroids (array_min on struct(d2, cent_id)), zero shuffles;
      2. per-query probe lists — driver numpy over |Q|·NLIST distances
         (metadata-sized), persisted;
      3. candidates = assignment ⋈ broadcast(probes) ON cent_id — the
         cell id is the join key, which is what makes a large query
         batch feasible: with the corpus PARTITIONED BY cent_id (the
         q_sim_search_ivf_partitioned layout) this becomes a co-located
         join touching only probed directories;
      4. exact cosine on candidates ⋈ broadcast(query vectors), then
         one per-q_id top-k window.

    Hash-verified like the IVF family: assignment + probe lists persist
    and DuckDB recomputes candidates, scores, and ranking from them —
    only the k-means codebook is taken as given; recall vs the exact
    q_knn_join is the measured tradeoff (isotropic fixture = ANN
    worst-case; clustered real embeddings probe far fewer cells).
    """
    raw = load(spark, sf_dir, "embeddings")
    trained = trained_centroids(raw, sf_dir)
    emb = raw.withColumn("nrm", _norm("embedding"))
    assign = assign_cells_arrow(
        emb.select("vec_id", "embedding", "nrm"), trained)
    assign.select("vec_id", "cent_id").write.mode("overwrite") \
        .parquet(_KNN_IVF_ASSIGN_DIR)

    # per-query probe lists: |Q| x NLIST distances on the driver
    qrows = (
        raw.filter(F.col("vec_id") < KNN_N_QUERIES)
        .select("vec_id", "embedding").toPandas().sort_values("vec_id")
    )
    cents = np.asarray(trained, dtype=np.float64)
    probe_rows = []
    for _, r in qrows.iterrows():
        v = np.asarray(r["embedding"], dtype=np.float64)
        d2 = ((cents - v) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(d2)), d2))  # ties -> low cent_id
        probe_rows += [(int(r["vec_id"]), int(c))
                       for c in order[:KNN_IVF_NPROBE]]
    values_df(spark, probe_rows, [("q_id", "bigint"), ("cent_id", "int")]) \
        .coalesce(1).write.mode("overwrite").parquet(_KNN_IVF_PROBES_DIR)

    probes = reopen_parquet(spark, _KNN_IVF_PROBES_DIR)
    queries = (
        emb.filter(F.col("vec_id") < KNN_N_QUERIES)
        .select(F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("qv"),
                F.col("nrm").alias("qnrm"))
    )
    candidates = (
        reopen_parquet(spark, _KNN_IVF_ASSIGN_DIR)
        .filter(F.col("vec_id") >= KNN_N_QUERIES)
        .join(F.broadcast(probes), "cent_id")
        .join(emb, "vec_id")
        .join(F.broadcast(queries), "q_id")
    )
    scored = candidates.select(
        "q_id", "vec_id",
        (_dot("embedding", "qv") / (F.col("nrm") * F.col("qnrm")))
        .alias("cos_raw"),
    )
    from pyspark.sql import Window
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
        .select("q_id", "rnk", "vec_id",
                (F.round("cos_raw", 9) + F.lit(0.0)).alias("cosine"))
    )


OUTLIER_TOP_N = 20


@declared_query(
    "q_embed_outliers",
    oracle=f"""
        WITH dims AS (
            SELECT vec_id, label, e.i AS i, e.v AS v
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i,
                                 unnest(embedding) AS v) e
        ),
        cent AS (
            SELECT label, i, avg(CAST(v AS DOUBLE)) AS c
            FROM dims GROUP BY label, i
        ),
        dist AS (
            SELECT d.vec_id, d.label,
                   sqrt(sum(pow(CAST(d.v AS DOUBLE) - c.c, 2))) AS l2
            FROM dims d JOIN cent c ON d.label = c.label AND d.i = c.i
            GROUP BY d.vec_id, d.label
        )
        SELECT vec_id, label, round(l2, 6) AS dist
        FROM dist
        ORDER BY round(l2, 6) DESC, vec_id
        LIMIT {OUTLIER_TOP_N}
    """,
)
def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier screen: the {OUTLIER_TOP_N} vectors farthest
    (L2) from their own label's centroid — the data-quality pass that
    catches mislabeled/corrupted vectors before they poison an ANN index
    or a classifier head.

    Centroids come from ONE partial+final agg keyed by (label, dim) —
    the q_agg_foreach shape, fixed-width partials with map-side combine
    — then reassemble per label (labels × dim doubles, KB-scale) and
    BROADCAST back onto the vector scan: each row computes its distance
    in a single zip_with fold inside codegen, no shuffle of the
    embedding column at all. The oracle re-derives distances through an
    independent unnest/join formulation, so the hash cross-proves both.
    """
    emb = load(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("i", "v"))
        .groupBy("label", "i")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
    )
    cent = (
        per_dim.groupBy("label")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("i", "c"))),
            lambda r: r["c"]).alias("centroid"))
    )
    dist = F.sqrt(F.aggregate(
        F.zip_with("embedding", "centroid",
                   lambda x, ci: (x.cast("double") - ci)
                   * (x.cast("double") - ci)),
        F.lit(0.0), lambda acc, t: acc + t))
    return (
        emb.join(F.broadcast(cent), "label")
        # order by the ROUNDED distance (the emitted value) so the
        # LIMIT boundary can't flip on sub-1e-6 accumulation-order ulps
        .select("vec_id", "label", F.round(dist, 6).alias("dist"))
        .orderBy(F.desc("dist"), "vec_id")
        .limit(OUTLIER_TOP_N)
    )


# ---------------------------------------------------------------------------
# Round 10: E203 — SemDeDup (embedding-cluster near-dedup, Abbas et al. 2023)
# ---------------------------------------------------------------------------

SEMDEDUP_K = 16      # cluster count (shares the q_embed_cluster codebook)
# Cosine threshold calibrated to the synthetic corpus: its max pairwise
# cosine is ~0.51 (no true duplicates were planted), so the production
# 0.95+ would mark nothing and verify nothing — 0.35 sits above the
# 99.9th percentile, exercising both verdict branches on real pairs.
SEMDEDUP_TAU = 0.35
_SEMDEDUP_CENTS_DIR = fixed_scratch_dir("q_semdedup_cents")


def _parquet_num_rows(path: str) -> int | None:
    """Exact row count from parquet FOOTER metadata, driver-side — no
    Spark job, no data scan (the num_rows field is mandatory in the
    format). Handles both a single file and a directory of part files;
    returns None on anything unexpected so callers can fall back to a
    distributed count()."""
    import os

    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            files = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not files:
                # e.g. a hive-partitioned layout with no top-level part
                # files — 0 would be consumed as a real count by
                # _lsh_pair_bits/_cos_audit_blocks and silently pin
                # fixture parameters; None forces the count() fallback.
                return None
            return sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in files)
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def _l2_norm_expr(col: str = "embedding") -> Column:
    """Sequential-fold L2 norm — the exact fold order the DuckDB oracles
    re-derive, shared by both SemDeDup assignment paths."""
    return F.sqrt(F.aggregate(
        F.zip_with(col, col,
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def assign_cells_literal(emb: DataFrame,
                         cents: list[list[float]]) -> DataFrame:
    """Plan-literal argmin-L2 cell assignment over (vec_id, embedding):
    each centroid enters the plan as an array literal, d2 is a
    sequential JVM fold (bit-identical with the oracle's list folds, so
    DuckDB can re-derive every assignment from the persisted
    centroids), and array_min over struct(d2, cent_id) breaks ties to
    the lowest cent_id — the same tie rule as assign_cells_arrow's
    row-wise argmin. Fixture-scale path only: the plan grows linearly
    with len(cents) (Catalyst analysis + interpreted HOF lambdas), so
    scaled corpora use the Arrow matmul instead. Returns
    (vec_id, embedding, cent_id, nrm)."""
    def _d2_lit(cv: list[float]):
        clit = F.array(*[F.lit(float(x)) for x in cv])
        diffs = F.zip_with(
            "embedding", clit,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
        return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)

    cells = F.array(*[
        F.struct(_d2_lit(cv).alias("d2"), F.lit(i).alias("cent_id"))
        for i, cv in enumerate(cents)
    ])
    return emb.select(
        "vec_id", "embedding",
        F.array_min(cells).getField("cent_id").alias("cent_id"),
        _l2_norm_expr().alias("nrm"),
    )


def _semdedup_oracle_sql() -> str:
    # identical fold order to the Spark side (dim-by-dim, index order) so
    # every d2 and cosine is bit-identical — the q_embed_cluster pattern
    d2 = (f"list_sum(list_transform(range(1, {DIM + 1}), "
          f"i -> (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])"
          f" * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])))")
    dot = (f"list_sum(list_transform(range(1, {DIM + 1}), "
           f"i -> CAST(a.embedding[i] AS DOUBLE)"
           f" * CAST(b.embedding[i] AS DOUBLE)))")
    nrm = (f"sqrt(list_sum(list_transform(range(1, {DIM + 1}), "
           f"i -> CAST({{t}}.embedding[i] AS DOUBLE)"
           f" * CAST({{t}}.embedding[i] AS DOUBLE))))")
    na, nb = nrm.replace("{t}", "a"), nrm.replace("{t}", "b")
    return f"""
        WITH c AS (
            SELECT cent_id, cv
            FROM read_parquet('{_SEMDEDUP_CENTS_DIR}/*.parquet')
        ),
        scored AS (
            SELECT e.vec_id, e.embedding, c.cent_id, {d2} AS d2
            FROM embeddings e CROSS JOIN c
        ),
        assigned AS (
            SELECT vec_id, embedding, cent_id
            FROM (SELECT vec_id, embedding, cent_id,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d2, cent_id) AS rn
                  FROM scored)
            WHERE rn = 1
        ),
        dups AS (
            SELECT b.vec_id, count(*) AS n_earlier_dups
            FROM assigned a JOIN assigned b
              ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
            WHERE {dot} / ({na} * {nb}) >= {SEMDEDUP_TAU}
            GROUP BY b.vec_id
        )
        SELECT v.vec_id, v.cent_id,
               coalesce(d.n_earlier_dups, 0) AS n_earlier_dups,
               d.vec_id IS NOT NULL AS is_dup
        FROM assigned v LEFT JOIN dups d ON v.vec_id = d.vec_id
    """


@declared_query("q_semdedup", oracle=_semdedup_oracle_sql(), defer=True)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E203: SemDeDup — semantic near-dedup over embeddings by
    clustering-then-within-cluster cosine pruning (Abbas et al. 2023,
    the LAION/web-scale recipe): k-means the corpus, compare ONLY pairs
    that share a cluster, and mark a vector duplicate when an
    earlier-id clustermate sits within cosine >= {SEMDEDUP_TAU}. This is
    the scale answer to all-pairs semantic dedup: pair count drops from
    n^2 to sum of cluster-size^2 (~n^2/k for balanced cells), and each
    cluster's pair generation is an equi-join on cent_id — one shuffle,
    no cartesian (the plan lint would reject one).

    Assignment is the q_embed_cluster shape: the {SEMDEDUP_K} trained
    centroids (memoized sampled k-means — the codebook the whole IVF
    family shares) enter the plan as literals; each row's cell is a
    row-local argmin, no join. Per-vector norms are computed ONCE
    before the pair join, so the join evaluates one dot product per
    pair. At 100 TB, cluster sizes are capped by construction (k grows
    with n in SemDeDup), keeping every cell's pair block node-local.

    Hash-verified end-to-end via the persisted-codebook pattern: the
    centroids persist as a side table, and DuckDB independently
    recomputes every assignment, every within-cluster cosine (identical
    dim-order folds -> bit-identical doubles), and every verdict. The
    keep/drop decision rule (drop b iff an a < b in the same cluster
    has cos >= tau) is the deterministic representative election —
    min-id keeper per near-dup set, same as the exact-dedup convention.
    """
    emb = load(spark, sf_dir, "embeddings")
    # k GROWS with the corpus (the SemDeDup recipe — fixed k makes the
    # within-cluster pair join quadratic: the r11 sf5 rehearsal measured
    # 100k vectors / 16 cells = ~625M pairs). k = max(16, isqrt(n/8))
    # bounds expected cluster size at ~sqrt(8n), so sum(c^2) ~ 8n·k/k =
    # O(n^1.5) worst-case and ~linear for balanced cells, while leaving
    # the fixture SFs' outputs bit-identical (n=200 and n=2000 both
    # floor at 16 — the r10-verified behavior). The centroid literals
    # stay JVM-fold plan constants at any k, so DuckDB's re-computed
    # assignment remains bit-identical.
    from math import isqrt

    # k sizing needs only a row COUNT — read it from the parquet footers
    # on the driver (zero Spark jobs, zero scan; the same place the
    # engine's manifest stats would come from for an engine table)
    # instead of an eager count() job per invocation (VERDICT r11 item 6)
    n_vecs = _parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    if n_vecs is None:
        n_vecs = emb.count()
    k = max(SEMDEDUP_K, isqrt(n_vecs // 8))
    cents = trained_centroids(emb, sf_dir, nlist=k)
    cdf = values_df(spark, [(i, c) for i, c in enumerate(cents)],
                    [("cent_id", "int"), ("cv", "array<double>")])
    cdf.coalesce(1).write.mode("overwrite").parquet(_SEMDEDUP_CENTS_DIR)

    if k == SEMDEDUP_K:
        # fixture scale: plan-literal argmin — sequential JVM folds are
        # bit-identical with the oracle's list folds, so DuckDB can
        # re-derive every assignment from the persisted centroids
        assigned = assign_cells_literal(emb, cents)
    else:
        # scaled corpora (no oracle runs here): the literal-fold argmin
        # grows the PLAN linearly with k (Catalyst analysis + interpreted
        # HOF lambdas — measured 2.3 s -> 29 s at sf1 going k=16 -> 50),
        # so assignment switches to the IVF family's Arrow pass: one
        # numpy d2 matmul + row-wise argmin per batch, same argmin-L2 /
        # lowest-cent_id tie semantics (branch equality pinned by
        # tests/test_similarity_recall.py::test_semdedup_arrow_branch*)
        assigned = assign_cells_arrow(
            emb.select("vec_id", "embedding", _l2_norm_expr().alias("nrm")),
            cents,
        ).select("vec_id", "embedding", "cent_id", "nrm")
    a = assigned.select(F.col("vec_id").alias("a_id"),
                        F.col("embedding").alias("a_emb"),
                        F.col("cent_id"), F.col("nrm").alias("a_nrm"))
    b = assigned.select(F.col("vec_id").alias("b_id"),
                        F.col("embedding").alias("b_emb"),
                        F.col("cent_id"), F.col("nrm").alias("b_nrm"))
    dot = F.aggregate(
        F.zip_with("a_emb", "b_emb",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    dups = (
        a.join(b, "cent_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(dot / (F.col("a_nrm") * F.col("b_nrm"))
                >= F.lit(SEMDEDUP_TAU))
        .groupBy(F.col("b_id").alias("vec_id"))
        .agg(F.count("*").alias("n_earlier_dups"))
    )
    return (
        assigned.select("vec_id", "cent_id")
        .join(dups, "vec_id", "left")
        .select("vec_id", "cent_id",
                F.coalesce("n_earlier_dups", F.lit(0))
                .alias("n_earlier_dups"),
                F.col("n_earlier_dups").isNotNull().alias("is_dup"))
    )


# ---------------------------------------------------------------------------
# Round 10: E204 — hard-negative mining for embedding-model training
# ---------------------------------------------------------------------------

HARDNEG_N_QUERIES = 8   # vec_id 0..7 anchor the mining batch
HARDNEG_K = 5


def _hard_negatives_oracle_sql() -> str:
    self_dot = (f"list_sum(list_transform(range(1, {DIM + 1}), "
                f"i -> CAST(embedding[i] AS DOUBLE)"
                f" * CAST(embedding[i] AS DOUBLE)))")
    qdot = (f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> CAST(c.embedding[i] AS DOUBLE)"
            f" * CAST(q.qv[i] AS DOUBLE)))")
    return f"""
        WITH b AS (
            SELECT vec_id, label, embedding, sqrt({self_dot}) AS nrm
            FROM embeddings
        ),
        q AS (SELECT vec_id AS q_id, label AS q_label, embedding AS qv,
                     nrm AS qnrm
              FROM b WHERE vec_id < {HARDNEG_N_QUERIES}),
        c AS (SELECT vec_id, label, embedding, nrm FROM b
              WHERE vec_id >= {HARDNEG_N_QUERIES}),
        scored AS (
            SELECT q.q_id, q.q_label, c.vec_id, c.label,
                   {qdot} / (c.nrm * q.qnrm) AS cos_raw
            FROM c, q
            WHERE c.label <> q.q_label
        ),
        ranked AS (
            SELECT q_id, q_label, vec_id, label, cos_raw,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, vec_id) AS rnk
            FROM scored
        )
        SELECT q_id, q_label, rnk, vec_id, label AS neg_label,
               round(cos_raw, 9) + 0.0 AS cosine
        FROM ranked WHERE rnk <= {HARDNEG_K}
    """


@declared_query("q_hard_negatives", oracle=_hard_negatives_oracle_sql(),
                defer=True)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E204: hard-negative mining — for each anchor in a bounded batch,
    the top-{HARDNEG_K} most-similar corpus vectors with a DIFFERENT
    label. This is the contrastive-training data step (SimCSE/DPR/E5
    style): easy negatives are random and teach nothing; the negatives
    that matter are the ones the current embedding space ranks closest
    while being semantically wrong, i.e. highest cosine across the
    label boundary.

    Plan shape = q_knn_join's serving shape with the label-inequality
    pushed INTO the scored-pair generation (the filter rides the
    broadcast nested loop, so cross-label pairs are never materialized
    downstream): anchor batch broadcast, corpus side never shuffles,
    per-anchor top-k is one rank window over q_id. At scale the miner
    runs per training shard with the per-partition pre-top-k cap (the
    blas pattern) bounding window input at |parts|*|Q|*k.

    Hash-verified exactly like the knn family: sequential dot folds,
    vec_id tie-breaks, 9-dp rounded cosines with the signed-zero
    normalization (a hard negative CAN sit at cosine ~ -0.0).
    """
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", "label", "embedding",
        F.sqrt(_dot("embedding", "embedding")).alias("nrm"))
    q = base.filter(F.col("vec_id") < HARDNEG_N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label"),
        F.col("embedding").alias("qv"), F.col("nrm").alias("qnrm"))
    c = base.filter(F.col("vec_id") >= HARDNEG_N_QUERIES)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("q_label"))
        .select("q_id", "q_label", "vec_id", "label",
                (_dot("embedding", "qv") / (F.col("nrm") * F.col("qnrm")))
                .alias("cos_raw"))
    )
    from pyspark.sql import Window
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HARDNEG_K)
        .select("q_id", "q_label", "rnk", "vec_id",
                F.col("label").alias("neg_label"),
                (F.round("cos_raw", 9) + F.lit(0.0)).alias("cosine"))
    )
