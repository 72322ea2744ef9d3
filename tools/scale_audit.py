"""Registry-wide plan-shape audit — the quantitative companion to
tests/test_plan_shapes.py (which only asserts absence of banned shapes).

For every declared query, builds the DataFrame at the given SF and
counts the physical plan's scale-relevant operators: exchanges (shuffle
+ broadcast), parquet scans, sorts, aggregates, joins by strategy, and
Python-eval operators (Arrow-batched vs row-at-a-time). Prints one JSON
line per query plus a summary line; the committed artifact
(SCALE_AUDIT.json) lets a reviewer diff plan regressions across rounds
mechanically instead of re-reading PLANS.md by eye.

Usage: python tools/scale_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METRICS = {
    "shuffles": r"\bExchange hashpartitioning|\bExchange rangepartitioning|"
                r"\bExchange RoundRobinPartitioning|\bExchange SinglePartition",
    "broadcasts": r"\bBroadcastExchange\b",
    "parquet_scans": r"Scan parquet",
    "in_memory_scans": r"InMemoryTableScan",
    "sorts": r"\bSort\b",
    "hash_aggs": r"\bHashAggregate\b|\bObjectHashAggregate\b",
    "sort_aggs": r"\bSortAggregate\b",
    "bhj": r"\bBroadcastHashJoin\b",
    "smj": r"\bSortMergeJoin\b",
    "shj": r"\bShuffledHashJoin\b",
    "bnlj": r"\bBroadcastNestedLoopJoin\b",
    "cartesian": r"\bCartesianProduct\b",
    "arrow_python": r"\bArrowEvalPython\b|\bMapInPandas\b|"
                    r"\bFlatMapGroupsInPandas\b|\bMapInArrow\b",
    "row_python": r"\bBatchEvalPython\b",
    "codegen_spans": r"\*\(\d+\)",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from clickhouse_mergetree_spark.registry import all_queries
    from clickhouse_mergetree_spark.session import get_spark

    spark = get_spark("scale-audit", cpus=8)
    out: dict[str, dict] = {}
    errs: dict[str, str] = {}
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            row = {k: len(re.findall(pat, plan))
                   for k, pat in METRICS.items()}
            out[name] = row
        except Exception:
            errs[name] = traceback.format_exc(limit=1).strip()[-160:]
        print(json.dumps({"query": name, **out.get(name, {}),
                          **({"err": errs[name]} if name in errs else {})}),
              file=sys.stderr)
    totals = {k: sum(r[k] for r in out.values()) for k in METRICS}
    worst = sorted(out.items(), key=lambda kv: -kv[1]["shuffles"])[:10]
    print(json.dumps({
        "sf_dir": sf_dir, "n_queries": len(out), "errors": errs,
        "totals": totals,
        "row_python_queries": [n for n, r in out.items() if r["row_python"]],
        "cartesian_queries": [n for n, r in out.items() if r["cartesian"]],
        "most_shuffles": [{"query": n, "shuffles": r["shuffles"]}
                          for n, r in worst],
        "queries": out,
    }))


if __name__ == "__main__":
    main()
