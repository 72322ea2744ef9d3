"""Time a NAMED SUBSET of declared queries with bench.py's methodology.

Usage: python tools/time_queries.py [--sf DIR] [--reps N] q_name [q_name ...]

Same timed action as bench.py (noop sink — guide §1.4), same build/exec
split, cache cleared between reps; prints one JSON line
{name: {"total": s, "build": s, "reps": [..]}}. For isolating the
before/after of a targeted optimization without paying a full 295-query
sweep (guide §1: measure first, re-measure after).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    names = args
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from clickhouse_mergetree_spark.registry import all_queries
    from clickhouse_mergetree_spark.session import get_spark

    spark = get_spark("time-queries")
    # same JVM/worker warmup as bench.py so rep-1 isn't JIT noise
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()
    qs = all_queries()
    out: dict[str, dict] = {}
    for name in names:
        q = qs[name]
        times: list[float] = []
        builds: list[float] = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
            builds.append(round(t1 - t0, 4))
            spark.catalog.clearCache()
        best = min(range(len(times)), key=lambda i: times[i])
        out[name] = {"total": times[best], "build": builds[best],
                     "reps": times}
        print(f"{name}: {times}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
