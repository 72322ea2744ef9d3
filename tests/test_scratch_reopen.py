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
    first = q(spark, sf_dir)
    rows1 = first.count()
    # second run overwrites the same fixed scratch dir and re-reads it —
    # without the refresh this is where the stale listing detonates
    second = q(spark, sf_dir)
    assert second.count() == rows1
    spark.catalog.clearCache()
