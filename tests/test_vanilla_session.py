"""Regression guard for driver-session config drift (VERDICT r1 finding #2).

The driver supplies its *own* vanilla SparkSession to entry()/queries() —
none of our session.py engine configs exist there. Round 1 shipped 29/29
green local tests while 11 CORRECTNESS rows failed, because the local
fixture session carried spark.sql.legacy.parquet.nanosAsLong and the
driver's didn't. This test reproduces the driver environment exactly: a
fresh Python process, a bare ``SparkSession.builder.getOrCreate()``, then
entry() plus an events-table query.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

_DRIVER_MIRROR = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("vanilla-driver-mirror")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    n = df.count()
    assert n >= 0, "entry() must produce a row count"

    qs = entrymod.queries()
    ev = qs["q_range_scan"](spark, "/root/testdata/sf0.001")
    rows = ev.collect()
    assert rows, "q_range_scan on a vanilla session must return rows"
    print(f"VANILLA_OK entry_rows={n} range_rows={len(rows)}")
    spark.stop()
    """
)


def test_entry_and_events_query_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_MIRROR],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, (
        f"vanilla-session run failed:\nSTDOUT:\n{proc.stdout[-3000:]}\n"
        f"STDERR:\n{proc.stderr[-3000:]}"
    )
    assert "VANILLA_OK" in proc.stdout
