"""Driver-style correctness gate, runnable locally.

Runs every `queries()` entry on a VANILLA SparkSession (mirroring the
driver's environment) and compares against `oracle_sql()` via DuckDB at
the given sf dir (default sf0.01). Prints one JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from tests.oracle_compare import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    from clickhouse_mergetree_spark.registry import REGISTRY

    def oracle_scale_bound(name: str) -> str | None:
        """Non-None = the declared oracle embeds fixture literals and the
        corpus at this sf exceeds its validity bound (registry metadata,
        ADVICE r12) — running it would report a spurious parity failure,
        so refuse loudly as unsupported instead."""
        dq = REGISTRY.get(name)
        if dq is None or dq.oracle_fixture_max_rows is None:
            return None
        n = con.sql(
            f"SELECT count(*) FROM {dq.oracle_fixture_table}").fetchone()[0]
        if n > dq.oracle_fixture_max_rows:
            return (f"oracle_unsupported_at_scale({dq.oracle_fixture_table}="
                    f"{n}>{dq.oracle_fixture_max_rows})")
        return None

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results: dict[str, str] = {}
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, sf_dir)
            bound = oracle_scale_bound(name) if name in oracles else None
            if bound is not None:
                results[name] = bound
            elif name in oracles:
                compare(df, con, oracles[name])
                results[name] = "pass"
            else:
                n = df.count()
                results[name] = f"rows_only({n})"
        except Exception as exc:  # noqa: BLE001
            results[name] = f"FAIL: {exc}"
            traceback.print_exc(file=sys.stderr)
        print(f"{name}: {results[name]}", file=sys.stderr, flush=True)

    n_fail = sum(1 for v in results.values() if v.startswith("FAIL"))
    print(json.dumps({"sf_dir": sf_dir, "n": len(results),
                      "fail": n_fail, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
