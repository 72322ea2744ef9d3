"""Invariant tests for the round-5 text/pipeline screens.

The DuckDB oracle already hash-checks these queries value-for-value; the
properties here pin the SEMANTIC contracts that a matching pair of wrong
implementations could still violate together (both engines sharing a bad
formula would pass the hash check but fail these invariants).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clickhouse_mergetree_spark.registry import all_queries


def test_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(n_distinct); norm_entropy in [0, 1]; H == 0 iff the
    doc repeats a single token."""
    rows = all_queries()["q_text_entropy"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        hi = math.log2(r["n_distinct"]) if r["n_distinct"] > 1 else 0.0
        assert -1e-9 <= r["entropy"] <= hi + 1e-9, r
        assert -1e-9 <= r["norm_entropy"] <= 1 + 1e-9, r
        if r["n_distinct"] == 1:
            assert abs(r["entropy"]) < 1e-9


def test_boilerplate_line_accounting(spark, sf_dir):
    """Per doc: dup + kept partitions the line count; globally each
    distinct line is kept exactly once (the C4 first-occurrence
    contract); kept tokens never exceed the doc's token count."""
    from clickhouse_mergetree_spark.tables import load

    res = all_queries()["q_boilerplate_lines"].fn(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    joined = res.join(docs, "doc_id").collect()
    assert joined
    total_lines = 0
    total_kept = 0
    for r in joined:
        kept = r["n_lines"] - r["n_dup_lines"]
        assert 0 <= r["n_dup_lines"] <= r["n_lines"], r
        assert r["n_kept_tokens"] <= r["n_tokens"], r
        total_lines += r["n_lines"]
        total_kept += kept
    # kept lines == corpus-wide distinct lines (each elected exactly once)
    d = load(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    n_lines_expr = F.ceil(F.size("tk") / F.lit(10.0)).cast("int")
    distinct_lines = (
        d.select("doc_id", tk.alias("tk"))
        .select(F.explode(F.transform(
            F.sequence(F.lit(0), n_lines_expr - 1),
            lambda i: F.array_join(F.slice("tk", i * 10 + 1, 10), " "),
        )).alias("line"))
        .select("line").distinct().count()
    )
    assert total_kept == distinct_lines


def test_pii_scrub_clean_docs_untouched(spark, sf_dir):
    """Docs with no injected PII (doc_id % 3 == 2) report zero hits and a
    redacted text identical to the original (hash of the raw text)."""
    from clickhouse_mergetree_spark.tables import load

    res = all_queries()["q_pii_scrub"].fn(spark, sf_dir)
    clean = res.filter(F.col("doc_id") % 3 == 2)
    raw = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 2)
        .select("doc_id", F.md5("text").alias("raw_hash"),
                F.length("text").alias("raw_len"))
    )
    mism = (
        clean.join(raw, "doc_id")
        .filter((F.col("n_email") != 0) | (F.col("n_ip") != 0)
                | (F.col("n_phone") != 0)
                | (F.col("clean_hash") != F.col("raw_hash"))
                | (F.col("n_chars_clean") != F.col("raw_len")))
        .count()
    )
    assert mism == 0
    # and every injected doc has at least one hit of its injected types
    dirty = res.filter(F.col("doc_id") % 3 != 2)
    no_hit = dirty.filter(
        (F.col("n_email") == 0)
        & (F.col("n_ip") == 0) & (F.col("n_phone") == 0)).count()
    assert no_hit == 0


def test_with_fill_axis_dense(spark, sf_dir):
    """Every user's filled series is gapless day-by-day between their
    first and last purchase day, and filled rows are exactly the silent
    days (n_purchases == 0 <=> no purchase that day)."""
    rows = all_queries()["q_with_fill"].fn(spark, sf_dir).collect()
    from collections import defaultdict
    from datetime import date, timedelta

    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(
            (date.fromisoformat(r["day"]), r["n_purchases"]))
    assert per_user
    for uid, days in per_user.items():
        days.sort()
        d0, _ = days[0]
        d1, _ = days[-1]
        assert len(days) == (d1 - d0).days + 1, uid
        for (a, _), (b, _) in zip(days, days[1:]):
            assert b - a == timedelta(days=1), uid
        # endpoints are real purchases by construction of the span
        assert days[0][1] > 0 and days[-1][1] > 0, uid


def test_embed_cluster_partitioning(spark, sf_dir):
    """Cluster sizes partition the corpus and mean_d2 is nonnegative."""
    from clickhouse_mergetree_spark.tables import load

    rows = all_queries()["q_embed_cluster"].fn(spark, sf_dir).collect()
    n_total = load(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_total
    assert all(r["mean_d2"] >= 0 for r in rows)
    assert all(r["n_labels"] >= 1 for r in rows)


def test_readability_hand_case(spark, tmp_path):
    """'The cat sat. The dog ran!': 6 words, 2 sentences, 6 vowel-group
    syllables → FRE 119.19, FKGL -2.62 (negative: exercises the
    signed-zero normalization path)."""
    import pandas as pd

    pd.DataFrame({
        "doc_id": [1], "text": ["The cat sat. The dog ran!"],
        "lang": ["en"], "source": ["src0"], "n_chars": [25],
    }).to_parquet(tmp_path / "documents.parquet")
    from clickhouse_mergetree_spark.operators.text_analysis import (
        q_text_readability,
    )

    row = q_text_readability(spark, str(tmp_path)).collect()[0]
    assert (row["n_words"], row["n_sentences"]) == (6, 2)
    assert row["flesch_ease"] == 119.19
    assert row["fk_grade"] == -2.62


def test_dsir_weights_hand_case(spark, tmp_path):
    """Two docs, disjoint single-token vocabularies: the all-target
    token scores ln((ct_b+1)/(ct+64) / ((cr_b+1)/(cr+64))) per
    occurrence; the non-target token scores the complementary ratio."""
    import math

    import pandas as pd

    pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["aa aa", "bb bb"],
        "lang": ["en", "de"],
        "source": ["src0", "src1"],
        "n_chars": [5, 5],
    }).to_parquet(tmp_path / "documents.parquet")
    from clickhouse_mergetree_spark.operators.text_analysis import (
        q_dsir_weights,
    )

    got = {r["doc_id"]: (r["n_tokens"], r["dsir_logw"])
           for r in q_dsir_weights(spark, str(tmp_path)).collect()}
    # ct=2 (the two 'aa'), cr=4; 'aa' bucket: ct_b=2, cr_b=2;
    # 'bb' bucket: ct_b=0, cr_b=2
    w1 = 2 * math.log((3 / 66) / (3 / 68))
    w2 = 2 * math.log((1 / 66) / (3 / 68))
    assert got[1] == (2, round(w1, 6))
    assert got[2] == (2, round(w2, 6))
    assert got[1][1] > 0 > got[2][1]


def test_embed_drift_hand_case(spark, tmp_path):
    """Two orthogonal label cohorts: each centroid sits at 45° to the
    global centroid → cos 0.707107 for both."""
    import pandas as pd

    pd.DataFrame({
        "vec_id": [1, 2, 3, 4],
        "embedding": [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]],
        "label": [0, 0, 1, 1],
    }).to_parquet(tmp_path / "embeddings.parquet")
    from clickhouse_mergetree_spark.operators.multimodal import q_embed_drift

    got = {r["label"]: (r["n_vecs"], r["cos_to_global"])
           for r in q_embed_drift(spark, str(tmp_path)).collect()}
    assert got == {0: (2, 0.707107), 1: (2, 0.707107)}


def test_epoch_schedule_hand_case(spark, tmp_path):
    """Sources of 10 and 100 tokens under a 2x budget: alloc=110 each;
    the small source caps at 4 epochs (effective 40), the big one gets
    1.1 epochs."""
    import pandas as pd

    pd.DataFrame({
        "doc_id": [1, 2],
        "text": [" ".join(["tok"] * 10), " ".join(["tok"] * 100)],
        "lang": ["en", "en"],
        "source": ["s_small", "s_big"],
        "n_chars": [10, 100],
    }).to_parquet(tmp_path / "documents.parquet")
    from clickhouse_mergetree_spark.operators.text_analysis import (
        q_epoch_schedule,
    )

    got = {r["source"]: (r["n_tokens"], r["alloc_tokens"],
                         r["effective_tokens"], r["epochs"])
           for r in q_epoch_schedule(spark, str(tmp_path)).collect()}
    assert got["s_small"] == (10, 110, 40, 4.0)
    assert got["s_big"] == (100, 110, 110, 1.1)


def test_text_scripts_hand_case(spark, tmp_path):
    """Mixed-script doc counts each range; a CJK-dominant doc routes to
    'cjk'; ties go latin-first (fixed order)."""
    import pandas as pd

    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["ab 汉", "汉字字 a", "Жb"],
        "lang": ["en", "zh", "de"],
        "source": ["s"] * 3,
        "n_chars": [4, 5, 2],
    }).to_parquet(tmp_path / "documents.parquet")
    from clickhouse_mergetree_spark.operators.text_analysis import (
        q_text_scripts,
    )

    got = {r["doc_id"]: (r["n_latin"], r["n_cjk"], r["n_cyrillic"],
                         r["script"]) for r in
           q_text_scripts(spark, str(tmp_path)).collect()}
    assert got[1] == (2, 1, 0, "latin")
    assert got[2] == (1, 3, 0, "cjk")
    assert got[3] == (1, 0, 1, "latin")  # tie -> latin first
