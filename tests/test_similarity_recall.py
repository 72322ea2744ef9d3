"""Recall of the ANN scale paths (E22) on a planted-neighbor corpus.

The fixture embeddings are isotropic noise — max pairwise cosine ≈0.5 —
so "recall vs exact top-k" there measures nothing: no sublinear index can
distinguish noise-level neighbors (curse of dimensionality), and an index
that could would be scanning everything. The meaningful contract is
"find the genuinely near neighbors when they exist", so these tests build
a corpus with 12 planted neighbors at cosine ≈0.95 around the query and
pin recall of both ANN variants against the exact (numpy) top-k.

The k-means trainer is additionally pinned on the real fixture: Lloyd
iterations must move the centroids and reduce quantization distortion.
"""

from __future__ import annotations

import numpy as np
import pytest

from clickhouse_mergetree_spark.operators.similarity import (
    IVF_NLIST,
    TOP_K,
    sim_search_ivf_on,
    sim_search_lsh_on,
    train_ivf_centroids,
)
from clickhouse_mergetree_spark.tables import load

N_NOISE = 500
N_PLANTED = 12
PLANTED_COS = 0.95
DIM = 64


@pytest.fixture(scope="module")
def planted(spark):
    """(DataFrame, exact_top_k_ids): 500 noise vectors + 12 planted
    neighbors of vec_id 0 at cosine exactly PLANTED_COS, ids 480+ so the
    IVF init sample (first NLIST by vec_id) stays query + noise."""
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((N_NOISE, DIM))
    q = vecs[0] / np.linalg.norm(vecs[0])
    rows = [(int(i), v.astype(np.float32).tolist())
            for i, v in enumerate(vecs)]
    for j in range(N_PLANTED):
        g = rng.standard_normal(DIM)
        r = g - (g @ q) * q
        r /= np.linalg.norm(r)
        v = PLANTED_COS * q + np.sqrt(1.0 - PLANTED_COS**2) * r
        rows.append((1000 + j, v.astype(np.float32).tolist()))

    m = np.array([r[1] for r in rows], dtype=np.float64)
    ids = np.array([r[0] for r in rows])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn[ids == 0][0]
    mask = ids != 0
    order = np.argsort(-cos[mask])
    exact = set(ids[mask][order][:TOP_K].tolist())

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, exact


def _recall(df, exact: set[int]) -> float:
    found = {r["vec_id"] for r in df.select("vec_id").collect()}
    return len(found & exact) / len(exact)


def test_lsh_multiprobe_recall_on_planted_corpus(spark, planted):
    df, exact = planted
    recall = _recall(sim_search_lsh_on(df), exact)
    # radius-2 multi-probe: per-neighbor hit prob ≈0.97 at cosine 0.95
    assert recall >= 0.9, f"LSH multi-probe recall {recall:.2f} < 0.9"


def test_ivf_recall_on_planted_corpus(spark, planted):
    df, exact = planted
    recall = _recall(sim_search_ivf_on(spark, df), exact)
    # the planted cluster collapses into the query's k-means cell, which
    # is always the first probe
    assert recall >= 0.9, f"IVF recall {recall:.2f} < 0.9"


def test_kmeans_training_moves_centroids_and_reduces_distortion(spark, sf_dir):
    """On the real fixture: Lloyd iterations must actually improve the
    codebook — total squared distance to the nearest centroid strictly
    drops vs the init sample, and the centroids move."""
    emb = load(spark, sf_dir, "embeddings")
    vecs = np.array(
        [r[0] for r in emb.select("embedding").collect()], dtype=np.float64)
    init = np.array(
        [[float(x) for x in r[0]]
         for r in emb.orderBy("vec_id").limit(IVF_NLIST)
         .select("embedding").collect()])
    trained = np.array(train_ivf_centroids(spark, emb))

    def distortion(cents: np.ndarray) -> float:
        d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return float(d2.min(axis=1).sum())

    assert not np.allclose(trained, init), "training left the init unchanged"
    assert distortion(trained) < distortion(init), (
        "k-means training did not reduce quantization distortion")


def test_ivf_partitioned_layout_matches_inline_ivf(spark, sf_dir):
    """The materialized cell-partitioned index returns EXACTLY the inline
    IVF result (same trained codebook, same probes, same scoring) — the
    layout changes where the candidate rows come from (directory-pruned
    parquet), not what they are. Also pins that the probe scan's plan
    prunes on partition directories."""
    from clickhouse_mergetree_spark.operators.similarity import (
        q_sim_search_ivf,
        q_sim_search_ivf_partitioned,
    )

    inline = [tuple(r) for r in q_sim_search_ivf(spark, sf_dir).collect()]
    part_df = q_sim_search_ivf_partitioned(spark, sf_dir)
    partitioned = [tuple(r) for r in part_df.collect()]
    assert partitioned == inline

    plan = part_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cent_id" in pf, f"probe filter not applied to partitions: {pf!r}"


def test_pq_adc_recall_on_planted_corpus(spark, planted):
    """PQ+ADC+rerank finds the genuinely-near planted neighbors: the
    planted cluster sits at cosine 0.95, far above quantization noise, so
    ADC ranks it into the shortlist and the exact rerank surfaces it with
    exact scores."""
    from clickhouse_mergetree_spark.operators.similarity import (
        sim_search_pq_on,
    )

    df, exact = planted
    recall = _recall(sim_search_pq_on(df), exact)
    assert recall >= 0.9, f"PQ recall {recall:.2f} < 0.9"


def test_pq_rerank_scores_are_exact(spark, planted):
    """Every vector PQ returns carries its EXACT cosine (the rerank uses
    the same JVM expression as brute force) — approximate candidate set,
    exact scores."""
    import numpy as np

    from clickhouse_mergetree_spark.operators.similarity import (
        sim_search_pq_on,
    )

    df, _ = planted
    pdf = df.toPandas()
    m = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn[ids == 0][0]
    truth = {int(i): round(float(c), 9) for i, c in zip(ids, cos)}
    for r in sim_search_pq_on(df).collect():
        assert abs(truth[r["vec_id"]] - r["cosine"]) < 1e-9


def test_semdedup_arrow_branch_matches_literal_fold(spark, tmp_path):
    """VERDICT r11 item 3: q_semdedup's scaled branch (k > SEMDEDUP_K,
    Arrow matmul assignment) is the one scale path no oracle executes —
    the fixture SFs all floor at k=16. Pin branch equality directly: on
    a corpus big enough that k grows past the floor, the Arrow
    assignment must equal the plan-literal fold assignment row-for-row
    (same argmin-L2, ties to the lowest cent_id), and q_semdedup itself
    must run the scaled branch end-to-end."""
    from math import isqrt

    from pyspark.sql import functions as F

    from clickhouse_mergetree_spark.operators.similarity import (
        SEMDEDUP_K,
        _l2_norm_expr,
        assign_cells_arrow,
        assign_cells_literal,
        q_semdedup,
        trained_centroids,
    )
    from clickhouse_mergetree_spark.tables import load

    n = 2600  # isqrt(2600 / 8) = 18 > SEMDEDUP_K = 16
    rng = np.random.default_rng(12)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(int(i), v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    emb = load(spark, sf_dir, "embeddings")

    k = max(SEMDEDUP_K, isqrt(n // 8))
    assert k > SEMDEDUP_K
    cents = trained_centroids(emb, sf_dir, nlist=k)
    lit = assign_cells_literal(emb, cents).select(
        "vec_id", F.col("cent_id").alias("lit_cid"),
        F.col("nrm").alias("lit_nrm"))
    arr = assign_cells_arrow(
        emb.select("vec_id", "embedding", _l2_norm_expr().alias("nrm")),
        cents,
    ).select("vec_id", F.col("cent_id").alias("arr_cid"),
             F.col("nrm").alias("arr_nrm"))
    joined = lit.join(arr, "vec_id")
    assert joined.count() == n
    assert joined.filter("lit_cid <> arr_cid").count() == 0
    # nrm passes through the Arrow kernel untouched — bit-identical
    assert joined.filter("lit_nrm <> arr_nrm").count() == 0

    # the full query takes the scaled branch end-to-end and stays sane
    out = q_semdedup(spark, sf_dir)
    rows = out.count()
    assert rows == n
    assert out.filter("is_dup AND n_earlier_dups = 0").count() == 0
    assert out.filter("NOT is_dup AND n_earlier_dups > 0").count() == 0


def test_offline_artifact_memo_invalidates_on_corpus_regen(spark, tmp_path):
    """ADVICE r11: the offline-artifact memos (_TRAIN_MEMO / _PQ_MEMO)
    were keyed by sf_dir path + hyperparameters only — regenerating the
    data under the same path within one process served stale codebooks
    silently. The corpus fingerprint (mtime+size of the embeddings
    parquet) now rides in the key."""
    import os
    import time

    from clickhouse_mergetree_spark.operators.similarity import (
        train_pq_codebooks,
        trained_centroids,
    )
    from clickhouse_mergetree_spark.tables import _LOAD_MEMO, load

    sf_dir = str(tmp_path)
    rng = np.random.default_rng(3)

    def write_corpus(seed_shift: int):
        vecs = rng.standard_normal((64, DIM)).astype(np.float32)
        spark.createDataFrame(
            [(int(i), v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    write_corpus(0)
    emb = load(spark, sf_dir, "embeddings")
    c1 = trained_centroids(emb, sf_dir, nlist=8)
    p1 = train_pq_codebooks(emb, memo_key=sf_dir)
    time.sleep(0.02)  # ensure the dir mtime ticks
    write_corpus(1)
    _LOAD_MEMO.clear()  # the load memo caches the file listing
    emb2 = load(spark, sf_dir, "embeddings")
    c2 = trained_centroids(emb2, sf_dir, nlist=8)
    p2 = train_pq_codebooks(emb2, memo_key=sf_dir)
    assert c1 != c2, "stale IVF codebook served after corpus regen"
    assert not np.array_equal(p1, p2), \
        "stale PQ codebook served after corpus regen"


def test_cos_audit_block_count_scales_linearly_past_fixtures(spark, tmp_path):
    """q_near_dedup_cosine's pair-sample blocking: a FIXED block count B
    means n²/B scored pairs — quadratic at scale, the same
    fixed-parameter class the sf1 rehearsal caught in SemDeDup's k. The
    rule is now B = max(25, ⌈n/80⌉): every fixture SF (n = 20/200/2000)
    resolves to EXACTLY the oracle's literal 25 (sf0.1 lands on
    2000/80 = 25), scaled corpora hold n/B rows per block constant.
    Pins the formula AND runs the scaled branch end-to-end against a
    numpy recomputation of the same blocked top-k."""
    from clickhouse_mergetree_spark.operators.similarity import (
        COS_AUDIT_BLOCKS,
        PAIR_TOP_K,
        _cos_audit_blocks,
        q_near_dedup_cosine,
    )

    # fixture parity: every driver SF floors at the oracle literal
    for n in (None, 20, 200, 2000):
        assert _cos_audit_blocks(n) == COS_AUDIT_BLOCKS
    # linear growth past the fixtures (n/B pinned at 80 rows per block)
    assert _cos_audit_blocks(2001) == 26
    assert _cos_audit_blocks(20_000) == 250
    assert _cos_audit_blocks(200_000) == 2_500

    # end-to-end on a corpus big enough to take the scaled branch
    n = 2_600  # B = ceil(2600/80) = 33 > 25
    assert _cos_audit_blocks(n) == 33
    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(int(i), v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    out = q_near_dedup_cosine(spark, sf_dir).collect()
    assert len(out) == PAIR_TOP_K

    # numpy ground truth of the SAME blocked sample at B=33
    v = vecs.astype(np.float64)
    nrm = np.sqrt((v * v).sum(axis=1))
    blk = np.arange(n) % 33
    truth = []
    for b in range(33):
        ids = np.nonzero(blk == b)[0]
        sub = v[ids] @ v[ids].T / np.outer(nrm[ids], nrm[ids])
        iu, ju = np.triu_indices(len(ids), k=1)
        truth += [(int(ids[i]), int(ids[j]), sub[i, j])
                  for i, j in zip(iu, ju)]
    truth.sort(key=lambda t: (-t[2], t[0], t[1]))
    expect = {(a, b) for a, b, _ in truth[:PAIR_TOP_K]}
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert got == expect
    by_pair = {(a, b): c for a, b, c in truth[:PAIR_TOP_K]}
    for r in out:
        assert abs(by_pair[(r["id_a"], r["id_b"])] - r["cosine"]) < 1e-6


def test_lsh_pair_bits_scale_linearly_past_fixtures(spark, tmp_path):
    """q_near_dedup_cosine_lsh's bucket count: fixed LSH_BITS=8 means
    n²/256 within-bucket pair work — the docstring's own 100 TB argument
    ("bucket count scales with n") was not what the code did. Now
    bits = max(8, ⌈log₂(n/8)⌉): every fixture SF resolves to exactly the
    oracle's 8 (sf0.1 lands on log₂(250) = 7.97), occupancy is held at
    ~8 rows per bucket past that, and the plane set is prefix-stable
    (same seed, row-major), so a scaled bucketing refines the fixture
    one. End-to-end: the scaled branch must equal a numpy recomputation
    of the same bucketed top-k."""
    from clickhouse_mergetree_spark.operators.similarity import (
        LSH_BITS,
        PAIR_TOP_K,
        _bucket_arrow,
        _bucket_of,
        _hyperplanes,
        _lsh_pair_bits,
        q_near_dedup_cosine_lsh,
    )
    from clickhouse_mergetree_spark.tables import load

    for n in (None, 8, 20, 200, 2000):
        assert _lsh_pair_bits(n) == LSH_BITS
    assert _lsh_pair_bits(2049) == 9          # first step past the fixture
    assert _lsh_pair_bits(20_000) == 12
    assert _lsh_pair_bits(100_000) == 14
    # prefix stability: plane i is identical at any bits >= i+1
    p8, p14 = _hyperplanes(8), _hyperplanes(14)
    assert np.allclose(np.asarray(p14)[:8], np.asarray(p8))

    n = 2_600  # bits = ceil(log2(325)) = 9 > 8 — the scaled branch
    assert _lsh_pair_bits(n) == 9
    rng = np.random.default_rng(33)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(int(i), v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    # branch parity (SemDeDup convention): the scaled Arrow bucketing
    # must equal the plan-literal fold bucketing row-for-row
    emb = load(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F
    p9 = _hyperplanes(9)
    lit = emb.select("vec_id", _bucket_of(p9, "embedding").alias("b_lit"))
    arr = _bucket_arrow(emb.select("vec_id", "embedding"), p9) \
        .select("vec_id", F.col("bucket").alias("b_arr"))
    j = lit.join(arr, "vec_id")
    assert j.count() == n
    assert j.filter("b_lit <> b_arr").count() == 0

    out = q_near_dedup_cosine_lsh(spark, sf_dir).collect()
    assert len(out) == PAIR_TOP_K

    # numpy ground truth of the same 9-bit MEAN-CENTERED sign-projection
    # bucketing (the scaled branch centers; see _bucket_arrow). Bucket
    # via float32→float64 casts matching the Spark fold order is
    # unnecessary: sign((v−μ)·p) flips only at 0, measure-zero for
    # random p.
    v = vecs.astype(np.float64)
    planes = np.asarray(_hyperplanes(9))
    vc = v - v.mean(axis=0)
    bucket = ((vc @ planes.T) > 0).astype(np.int64) @ (1 << np.arange(9))
    nrm = np.sqrt((v * v).sum(axis=1))
    truth = []
    for b in np.unique(bucket):
        ids = np.nonzero(bucket == b)[0]
        if len(ids) < 2:
            continue
        sub = v[ids] @ v[ids].T / np.outer(nrm[ids], nrm[ids])
        iu, ju = np.triu_indices(len(ids), k=1)
        truth += [(int(ids[i]), int(ids[j]), int(b), sub[i, j])
                  for i, j in zip(iu, ju)]
    truth.sort(key=lambda t: (-t[3], t[0], t[1]))
    expect = {(a, b) for a, b, _, _ in truth[:PAIR_TOP_K]}
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert got == expect
    by_pair = {(a, b): (bk, c) for a, b, bk, c in truth[:PAIR_TOP_K]}
    for r in out:
        bk, c = by_pair[(r["id_a"], r["id_b"])]
        assert r["bucket"] == bk
        assert abs(c - r["cosine"]) < 1e-6
