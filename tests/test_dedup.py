

def test_cluster_representative_is_member_and_best(spark, sf_dir):
    """The representative must be IN its cluster and dominate it on
    (n_chars DESC, doc_id ASC); member counts must match the labels."""
    from pyspark.sql import functions as F

    from clickhouse_mergetree_spark.operators.dedup import (
        _prefix_filtered_pairs, q_cluster_representative)
    from clickhouse_mergetree_spark.operators.graph import (
        connected_components)

    reps = {r["cluster_id"]: r
            for r in q_cluster_representative(spark, sf_dir).collect()}
    edges = _prefix_filtered_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(edges, src="doc_a", dst="doc_b")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars")
    members = (labels.select(F.col("node").alias("doc_id"),
                             F.col("label").alias("cluster_id"))
               .join(docs, "doc_id").collect())
    by_cluster: dict[int, list] = {}
    for m in members:
        by_cluster.setdefault(m["cluster_id"], []).append(m)
    assert set(by_cluster) == set(reps)
    for cid, ms in by_cluster.items():
        r = reps[cid]
        assert r["n_members"] == len(ms)
        best = min(ms, key=lambda m: (-m["n_chars"], m["doc_id"]))
        assert (r["rep_doc_id"], r["rep_n_chars"]) == (
            best["doc_id"], best["n_chars"])


def test_dedup_normalized_collapses_reformatted_copies(spark, tmp_path):
    """r10 (E201): casefold/punctuation/whitespace variants of the same
    text must share a normalization key; genuinely different texts must
    not. Exercised on a synthetic corpus so the collapse is forced (the
    sf corpora contain few true reformat-variants)."""
    import pandas as pd

    from clickhouse_mergetree_spark.operators.dedup import (
        q_dedup_normalized)

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["Hello,  World!", "hello world", "HELLO   WORLD.",
                 "goodbye world"],
        "lang": ["en"] * 4,
        "source": ["a", "b", "a", "a"],
        "n_chars": [14, 11, 14, 13],
    })
    d = str(tmp_path / "docs")
    spark.createDataFrame(docs).write.parquet(f"{d}/documents.parquet")
    rows = q_dedup_normalized(spark, d).collect()
    assert len(rows) == 2  # {hello world} x3 + {goodbye world} x1
    big = next(r for r in rows if r["n_copies"] == 3)
    assert big["keeper_doc"] == 1 and big["n_sources"] == 2
    small = next(r for r in rows if r["n_copies"] == 1)
    assert small["keeper_doc"] == 4 and small["n_sources"] == 1
