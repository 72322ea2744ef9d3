"""Dump explain("formatted") for named queries into per-query files.

Usage:
  python tools/dump_query_plans.py OUT_DIR SUFFIX [--sf DIR] q_name [...]

Writes OUT_DIR/<q_name>_<SUFFIX>.txt — the round's plan evidence files
(plans/rNN/<query>_before.txt / _after.txt). The plan captured is the
returned DataFrame's physical plan (for engine-lifecycle queries that is
the READ path; the fixture build is job-level work that a single plan
cannot show — the timing evidence lives in OPTIMIZATION notes).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    args = sys.argv[1:]
    out_dir, suffix = args[0], args[1]
    args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    names = args
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from clickhouse_mergetree_spark.registry import all_queries
    from clickhouse_mergetree_spark.session import get_spark

    spark = get_spark("dump-query-plans")
    qs = all_queries()
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
