"""Property-based connector-writer check: random append/overwrite
sequences through ``df.write.format("mergetree")`` vs a naive model.

The model is the sink's contract distilled: the table content is the
concatenation of every batch since the last overwrite. After each
sequence the connector read-back AND the engine's own scan must both
equal the model — pinning writer/manifest/reader agreement, multi-task
staged commits, and overwrite truncation under arbitrary interleavings.
"""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree
from clickhouse_mergetree_spark.sources import register_mergetree

# batches are small key sets; n_parts in writer = repartition width
batch = st.tuples(
    st.sampled_from(["append", "overwrite"]),
    st.lists(st.tuples(st.sampled_from("abcde"), st.integers(0, 3)),
             min_size=1, max_size=6),
    st.integers(1, 3),  # task width
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=st.lists(batch, min_size=1, max_size=4))
def test_writer_matches_naive_model(spark, ops):
    register_mergetree(spark)
    base = tempfile.mkdtemp(prefix="ds_prop_")
    model: list[tuple[str, str, int]] = []
    for i, (mode, rows, width) in enumerate(ops):
        data = [(k, f"v{i}_{j}", ts) for j, (k, ts) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "key string, value string, timestamp long")
        (df.repartition(width).write.format("mergetree")
         .option("path", base).mode(mode).save())
        if mode == "overwrite":
            model = list(data)
        else:
            model.extend(data)

    got = sorted(map(tuple,
                     spark.read.format("mergetree").option("path", base)
                     .load().collect()))
    assert got == sorted(model)

    # the engine opens the same table and sees the same rows (full-row
    # distinct isn't part of query_all's contract; compare the multiset
    # modulo the engine's (key, ts) dedup)
    t = SparkMergeTree(spark, base, config=MergeTreeConfig(
        memtable_flush_threshold=10**12))
    eng = sorted((r.key, r.timestamp) for r in t.query_all().collect())
    expect = sorted({(k, ts) for k, _v, ts in model})
    assert eng == expect

    # filtered connector read agrees with engine range query
    got_f = (spark.read.format("mergetree").option("path", base).load()
             .filter((F.col("key") >= "b") & (F.col("key") <= "d"))
             .select("key", "timestamp").distinct().collect())
    eng_f = (t.query("b", "d").select("key", "timestamp").collect())
    assert sorted(map(tuple, got_f)) == sorted(map(tuple, eng_f))
