"""clickhouse_mergetree_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MergeTree implementation (see SURVEY.md), re-expressed Spark-first:

- ``engine``     — SparkMergeTree storage engine (parts, manifest, compaction),
                   the Spark re-expression of the reference's LSM design
                   (reference: src/merge_tree.h, src/part.h).
- ``operators``  — the declared query library (SURVEY.md §2): relational
                   operators, window functions, dedup family, similarity
                   search, text analysis, multimodal plumbing.
- ``streaming``  — Structured Streaming surface (windows, watermarks,
                   stateful dedup, streaming ingest into SparkMergeTree).
- ``registry``   — declared-query registry that __spark_entry__.py exposes
                   to the driver's DuckDB-oracle harness.
"""

__version__ = "0.1.0"
