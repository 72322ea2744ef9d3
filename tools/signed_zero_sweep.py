"""Repo-wide signed-zero sweep (VERDICT r9 item 1c).

Runs every `queries()` entry at the given SF, collects BOTH the Spark
result and the DuckDB oracle result, and scans every float cell for
IEEE -0.0 on either engine. Spark's round() (BigDecimal HALF_UP) never
emits -0.0 but DuckDB's round() preserves the sign, so any query whose
rounded output can sit at a tiny negative is a latent driver hash-fail
(the r9 q_embed_covariance class). A -0.0 cell is flagged even when
both engines agree — agreement is data-dependent and may flip at
another SF; the repo convention is `round(...) + 0.0` on both sides.

Also runs the strict (sign-preserving, full-repr) parity compare in the
same pass, so one invocation doubles as a full self-sweep.

Usage: python tools/signed_zero_sweep.py [sf_dir] [query ...]
Prints one JSON line; non-zero exit when any -0.0 cell or parity
failure is found.
"""

from __future__ import annotations

import json
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _count_neg_zero(v) -> int:
    if isinstance(v, float):
        return int(v == 0.0 and math.copysign(1.0, v) < 0)
    if isinstance(v, (list, tuple)):
        return sum(_count_neg_zero(x) for x in v)
    if isinstance(v, dict):
        return sum(_count_neg_zero(x) for x in v.values())
    return 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from tests.oracle_compare import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("signed-zero-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    from clickhouse_mergetree_spark.registry import REGISTRY

    def oracle_supported(name: str) -> bool:
        """False when the declared oracle embeds fixture literals and the
        corpus at this sf exceeds its validity bound (registry metadata,
        ADVICE r12): the sweep then skips the oracle side LOUDLY (stderr
        + unsupported ledger) instead of reporting a spurious parity
        failure for a formula the Spark side intentionally outgrew."""
        dq = REGISTRY.get(name)
        if dq is None or dq.oracle_fixture_max_rows is None:
            return True
        n = con.sql(
            f"SELECT count(*) FROM {dq.oracle_fixture_table}").fetchone()[0]
        return n <= dq.oracle_fixture_max_rows

    qs = entry.queries()
    oracles = entry.oracle_sql()
    flagged: dict[str, dict] = {}
    parity_fail: dict[str, str] = {}
    oracle_unsupported: list[str] = []
    n_checked = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, sf_dir)
            s_rows = [tuple(r) for r in df.collect()]
            s_nz = sum(_count_neg_zero(c) for r in s_rows for c in r)
            d_nz = 0
            if name in oracles and not oracle_supported(name):
                oracle_unsupported.append(name)
                print(f"{name}: oracle unsupported at this scale "
                      "(fixture-literal oracle) — Spark side swept, "
                      "parity not compared", file=sys.stderr, flush=True)
            elif name in oracles:
                d_rows = con.sql(oracles[name]).fetchall()
                d_nz = sum(_count_neg_zero(c) for r in d_rows for c in r)
                try:
                    compare(df, con, oracles[name])
                except AssertionError as exc:
                    parity_fail[name] = str(exc)[:300]
            if s_nz or d_nz:
                flagged[name] = {"spark_neg_zero": s_nz,
                                 "duck_neg_zero": d_nz}
            n_checked += 1
            status = "FLAG" if (s_nz or d_nz) else (
                "PARITY-FAIL" if name in parity_fail else "ok")
            print(f"{name}: {status}", file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            parity_fail[name] = f"ERROR: {exc}"[:300]
            traceback.print_exc(file=sys.stderr)

    out = {"sf_dir": sf_dir, "n_checked": n_checked,
           "neg_zero_queries": flagged, "parity_failures": parity_fail,
           "oracle_unsupported_at_scale": oracle_unsupported}
    print(json.dumps(out))
    spark.stop()
    sys.exit(1 if (flagged or parity_fail) else 0)


if __name__ == "__main__":
    main()
