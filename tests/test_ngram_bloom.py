"""N-gram-bloom skipping index suite (ngrambf_v1 + LIKE '%needle%' analog).

Pruning correctness (never a false negative — a part is skipped only
when SOME n-gram of the needle is provably absent), case normalization,
the short-needle no-claim rule, cross-token substring matches (the case
tokenbf cannot serve), merge/mutation index refresh, buffered-row
visibility, and persistence across reopen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("ts_us", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
])

CFG = dict(memtable_flush_threshold=10**12, max_parts=10,
           ngram_bloom_cols=("text",), key_col="doc_id", ts_col="ts_us")


@pytest.fixture()
def table(spark, tmp_path):
    t = SparkMergeTree(spark, str(tmp_path / "t"), schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    t.insert_rows([(i, i, f"alpha beta doc {i}") for i in range(40)])
    t.flush()
    t.insert_rows([(i, i, f"gamma delta doc {i}") for i in range(40, 80)])
    t.flush()
    t.insert_rows([(i, i, f"ERR-{i}: queue overflow") for i in range(80, 90)])
    t.flush()
    yield t
    t.close()


def test_prunes_parts_without_substring(table):
    assert table.part_count() == 3
    assert len(table.parts_for_like("text", "gamma")) == 1
    assert len(table.parts_for_like("text", "overflow")) == 1
    # "doc" appears in two parts
    assert len(table.parts_for_like("text", "doc")) == 2


def test_cross_token_substring_matches(table):
    # "a bet" spans the space between "alpha" and "beta" — tokenbf can't
    # index this; ngrambf can. Only the alpha-beta part survives pruning.
    assert len(table.parts_for_like("text", "a bet")) == 1
    assert table.query_like("text", "a bet").count() == 40


def test_query_like_exact_rows_case_insensitive(table):
    rows = table.query_like("text", "QUEUE OVER").collect()
    assert len(rows) == 10 and all("queue overflow" in r["text"]
                                   for r in rows)


def test_absent_needle_zero_parts_and_rows(table):
    assert table.parts_for_like("text", "zzznothere") == []
    assert table.query_like("text", "zzznothere").count() == 0


def test_short_needle_no_claim_but_exact(table):
    # needle shorter than n=3: index makes no claim (all parts scanned),
    # the exact predicate still filters correctly
    assert len(table.parts_for_like("text", "qu")) == 3
    assert table.query_like("text", "qu").count() == 10


def test_buffered_rows_visible_without_index(table):
    table.insert_rows([(200, 200, "fresh omega row")])
    assert table.query_like("text", "omega").count() == 1


def test_merge_rebuilds_ngram_index(table):
    table.config.max_parts = 1
    table.optimize()
    assert table.part_count() == 1
    assert table.query_like("text", "gamma").count() == 40
    assert table.parts_for_like("text", "zzznothere") == []


def test_mutation_refreshes_ngram_index(table):
    from pyspark.sql import functions as F

    table.delete_where(F.col("doc_id") >= 40)
    assert table.query_like("text", "gamma").count() == 0
    assert table.parts_for_like("text", "overflow") == []


def test_index_persists_across_reopen(spark, tmp_path, table):
    base = table.base_path
    table.close()
    with SparkMergeTree(spark, base, schema=SCHEMA,
                        config=MergeTreeConfig(**CFG)) as t2:
        assert len(t2.parts_for_like("text", "gamma")) == 1
        assert t2.query_like("text", "gamma").count() == 40


# ---------------------------------------------------------------------------
# Property: pruning never loses a match (no false negatives), for ANY data
# and ANY needle — the one guarantee the index must keep under all inputs.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_alph = st.text(alphabet="abcxyz ", min_size=0, max_size=12)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_alph, min_size=1, max_size=6),
       needle=st.text(alphabet="abcxyz ", min_size=1, max_size=5))
def test_ngram_prune_has_no_false_negatives(spark, tmp_path_factory,
                                            texts, needle):
    base = str(tmp_path_factory.mktemp("ngbf") / "t")
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    try:
        # two parts: split the rows so pruning has something to skip
        half = max(1, len(texts) // 2)
        t.insert_rows([(i, i, s) for i, s in enumerate(texts[:half])])
        t.flush()
        if texts[half:]:
            t.insert_rows([(half + i, half + i, s)
                           for i, s in enumerate(texts[half:])])
            t.flush()
        expected = sorted(i for i, s in enumerate(texts)
                          if needle.lower() in s.lower())
        got = sorted(r["doc_id"]
                     for r in t.query_like("text", needle).collect())
        assert got == expected, (texts, needle)
    finally:
        t.close()
