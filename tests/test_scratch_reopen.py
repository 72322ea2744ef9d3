"""Write→re-read cycles on fixed scratch dirs must survive repetition.

Queries that persist an intermediate (ADC shortlist, IVF assignments,
near-dup candidates) to a FIXED scratch dir and read it back can hit
Spark's shared FileStatusCache serving the pre-overwrite listing on the
SECOND run in one session — the scan then fails with FAILED_READ_FILE
on the deleted part files (observed: q_sim_search_pq rep-2 during the
r12 sf1 rehearsal). tables.reopen_parquet refreshes the path before
re-reading; this pins every such query as re-runnable in one session.
"""

from __future__ import annotations

import pytest

from clickhouse_mergetree_spark.operators.dedup import q_near_dedup
from clickhouse_mergetree_spark.operators.similarity import (
    q_knn_join_ivf,
    q_sim_search_ivf,
    q_sim_search_ivf_partitioned,
    q_sim_search_pq,
)


@pytest.mark.parametrize("q", [
    q_sim_search_pq,
    q_sim_search_ivf,
    q_sim_search_ivf_partitioned,
    q_knn_join_ivf,
    q_near_dedup,
], ids=lambda f: f.__name__)
def test_persisting_query_is_rerunnable_in_one_session(spark, sf_dir, q):
    from clickhouse_mergetree_spark.operators.similarity import (
        _IVF_PART_MEMO,
    )

    first = q(spark, sf_dir)
    rows1 = first.count()
    # second run overwrites the same fixed scratch dir and re-reads it —
    # without the refresh this is where the stale listing detonates.
    # Clear the r13 offline-index memo so the overwrite actually happens
    # for q_sim_search_ivf_partitioned (a warm memo would skip the
    # rewrite and leave this test's scenario unexercised).
    _IVF_PART_MEMO.clear()
    second = q(spark, sf_dir)
    assert second.count() == rows1
    spark.catalog.clearCache()


def test_ivf_partitioned_index_rebuilds_on_corpus_switch(spark):
    """The r13 offline-index memo for q_sim_search_ivf_partitioned is
    keyed dir→corpus (single slot): every SF shares one fixed scratch
    dir, so after an interleaved sf0.001 → sf0.01 → sf0.001 sequence
    the third call MUST rebuild (the dir holds sf0.01's index) — a
    corpus-keyed memo would skip it and probe the wrong index."""
    import os

    from clickhouse_mergetree_spark.operators.similarity import (
        q_sim_search_ivf_partitioned as q,
    )

    # derive both SFs from the conftest convention so a relocated
    # fixture tree (SPARK_GRAFT_TEST_SF_DIR) keeps this test portable
    base = os.path.dirname(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"))
    sf_a, sf_b = os.path.join(base, "sf0.001"), os.path.join(base, "sf0.01")
    for d in (sf_a, sf_b):
        if not os.path.isdir(d):
            pytest.skip(f"fixture dir {d} not present")

    a1 = sorted(tuple(r) for r in q(spark, sf_a).collect())
    b = sorted(tuple(r) for r in q(spark, sf_b).collect())
    a2 = sorted(tuple(r) for r in q(spark, sf_a).collect())
    assert a1 == a2, "stale cross-corpus index served after SF switch"
    assert a1 != b  # the two corpora genuinely differ (guards the test)
    spark.catalog.clearCache()


def test_corpus_mean_memo_invalidates_on_corpus_rewrite(spark, tmp_path):
    """_MEAN_MEMO (r12, corpus-mean centering for the scaled LSH branch)
    keys on (sf_dir, corpus fingerprint) like _TRAIN_MEMO/_PQ_MEMO —
    VERDICT r12 item 5 asks this to be PINNED: rewrite the embeddings
    parquet at the SAME path and assert the fingerprint in the key
    forces recomputation, since a same-session re-run after an
    in-process corpus regeneration would otherwise silently consume the
    stale mean (and mis-center every bucket)."""
    import os

    from pyspark.sql import functions as F

    from clickhouse_mergetree_spark.operators import similarity as S
    from clickhouse_mergetree_spark.tables import reopen_parquet

    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "embeddings.parquet")

    def write(lo: float) -> None:
        (spark.range(8)
         .select(F.col("id").alias("vec_id"),
                 F.array(*[F.lit(lo) for _ in range(4)])
                 .cast("array<float>").alias("embedding"))
         .coalesce(1).write.mode("overwrite").parquet(path))

    write(2.0)
    m1 = S._corpus_mean(reopen_parquet(spark, path), sf_dir)
    assert m1 == pytest.approx([2.0] * 4)

    write(6.0)  # same path, new corpus — dir mtime/size fingerprint moves
    m2 = S._corpus_mean(reopen_parquet(spark, path), sf_dir)
    assert m2 == pytest.approx([6.0] * 4), (
        "stale _MEAN_MEMO entry served after the corpus was rewritten "
        "at the same path — the _corpus_token fingerprint must "
        "invalidate the memo")
