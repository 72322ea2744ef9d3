"""Physical-plan lint over EVERY declared query (scale guardrails).

Correctness at sf0.01 says nothing about behavior at 100 TB — these
assertions pin the *plan shapes* that survive scale-up:

- no unintended cartesian / broadcast-nested-loop joins (O(n·m) at scale);
- no row-at-a-time Python UDFs (BatchEvalPython) — only Arrow-vectorized
  exchange (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas);
- filters reach the parquet reader (PushedFilters) for the scan-shaped
  queries, the Spark analog of the reference's granule pruning (R8/R9).

New queries inherit these checks automatically via the registry sweep.
"""

from __future__ import annotations

import pytest

from clickhouse_mergetree_spark.registry import all_queries

# Queries whose nested-loop join is the documented *point* of the query:
# 1-row broadcast query vector (q_sim_search), the bounded O(n·NLIST)
# centroid-assignment scan of IVF (q_sim_search_ivf — build side is
# exactly 16 rows), or broadcast 1-row corpus-total aggregates
# (q_text_tfidf, q_text_bigram_pmi — O(n·1)). q_near_dedup_cosine no
# longer qualifies: its blocked audit join is an equi-join on the block
# key.
NESTED_LOOP_OK = {"q_sim_search", "q_sim_search_ivf", "q_sim_search_pq",
                  "q_text_tfidf", "q_text_bigram_pmi", "q_source_mix",
                  # broadcast side is the bounded query batch (8 rows) —
                  # O(|C|·|Q|) scored pairs IS exact batch k-NN; the
                  # hard-negative miner is the same serving shape with a
                  # label-inequality predicate riding the scored pairs
                  "q_knn_join", "q_hard_negatives",
                  # broadcast side is the CLUSTER_K=16 centroid table —
                  # the O(n·k) assignment scan IS k-means assignment
                  "q_embed_cluster",
                  # broadcast side is the 8-row CIDR dimension — the
                  # containment join IS longest-prefix matching; the
                  # too-big-to-broadcast rewrite (prefix expansion to a
                  # fixed-stride equi-join) is documented in the query
                  "q_ip_cidr",
                  # broadcast side is a ONE-ROW aggregate (the control
                  # cohort's moments / the tie-correction scalars / the
                  # contingency grand totals) joined onto a KB-scale
                  # grouped relation — O(groups·1), the closed-form
                  # test-statistic shape, never corpus-sized
                  "q_stat_ttest", "q_stat_mannwhitney",
                  "q_stat_association",
                  # 1-row recency anchor broadcast onto the per-user agg
                  "q_events_rfm",
                  # 1-row corpus-total broadcast onto the |sources|-row
                  # grouped relation — O(groups·1), never corpus-sized
                  "q_epoch_schedule"}

_QUERIES = sorted(all_queries())

# DataFrame construction (incl. engine-table builds for the engine-backed
# queries) dominates these sweeps — cache per query name so the three
# registry-wide lints pay it once. DataFrames are immutable; nothing here
# executes them beyond explain()/schema.
_DF_CACHE: dict[str, object] = {}


def _df(spark, sf_dir, name: str):
    if name not in _DF_CACHE:
        _DF_CACHE[name] = all_queries()[name].fn(spark, sf_dir)
    return _DF_CACHE[name]


def _plan(spark, sf_dir, name: str) -> str:
    df = _df(spark, sf_dir, name)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", _QUERIES)
def test_no_unintended_nested_loop_join(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    if name in NESTED_LOOP_OK:
        return
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} plans a nested-loop join — unbounded at scale")


# q_udtf_sentences exists to exercise the Python UDTF surface, which is
# row-expanding Python by construction (its docstring documents it as the
# slow path and its oracle IS the vectorized equivalent).
ROW_PYTHON_OK = {"q_udtf_sentences"}


@pytest.mark.parametrize("name", _QUERIES)
def test_no_row_at_a_time_python_udf(spark, sf_dir, name):
    if name in ROW_PYTHON_OK:
        return
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan, (
        f"{name} uses a row-at-a-time Python UDF — Arrow-vectorize it")


@pytest.mark.parametrize("name", _QUERIES)
def test_no_array_or_map_result_columns(spark, sf_dir, name):
    """Driver-hash-safety lint, Spark side: no declared query may return
    a top-level ARRAY/MAP/STRUCT column. The driver's pandas canonicalizer
    crashes sorting list cells (TypeError: unhashable type: 'list' — the
    r5 q_agg_grouparray/q_quantiles_multi fail class, same bug class as
    r4's HUGEINT). Arrays belong in a canonical scalar serialization:
    comma-joined, %.Nf-formatted floats, sorted 'k=v' pairs (the
    q_agg_summap pattern). The DuckDB-side twin lives in
    test_oracle_types.py / oracle_compare.assert_oracle_types."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = _df(spark, sf_dir, name)
    flagged = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not flagged, (
        f"{name} returns driver-hash-unsafe columns {flagged}; serialize "
        f"them to canonical strings (array_join / sorted 'k=v' pairs)")


@pytest.mark.parametrize(
    "name", ["q_range_scan", "q_point_lookup", "q_filter_compound", "q_join_inner"])
def test_filter_pushdown_reaches_scan(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "PushedFilters: [" in plan
    # at least one pushed predicate — an empty list means a full scan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), f"{name}: no filters pushed to the parquet reader"
