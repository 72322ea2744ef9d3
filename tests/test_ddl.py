"""ClickHouse CREATE TABLE DDL front end (compatibility subset).

parse_create_table maps the DDL a ClickHouse user runs today onto the
engine's schema + config: engines (MergeTree / Replacing / Summing /
Collapsing / VersionedCollapsing), ORDER BY -> (key_col, ts_col),
PARTITION/SAMPLE BY, skipping indexes, CHECK constraints, row TTL,
column DEFAULTs, SETTINGS. create_table_from_ddl builds a working
table; declared TTL fires via apply_declared_ttl; omitted DEFAULT
columns fill at insert.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from clickhouse_mergetree_spark.engine import (
    create_table_from_ddl,
    parse_create_table,
)

DDL = """
CREATE TABLE IF NOT EXISTS logs.events (
    `key`      UInt64,
    ts         Int64,
    tenant     LowCardinality(String),
    score      Nullable(Float64),
    note       String DEFAULT upper(tenant),
    INDEX sc_mm score TYPE minmax GRANULARITY 4,
    INDEX tn_set tenant TYPE set(16),
    CONSTRAINT pos_key CHECK key >= 0
) ENGINE = MergeTree()
ORDER BY (key, ts)
PARTITION BY tenant
TTL ts + INTERVAL 7 DAY
SETTINGS index_granularity = 8192, parts_to_throw_insert = 300
"""


def test_parse_maps_every_clause():
    p = parse_create_table(DDL)
    assert p["name"] == "events"
    assert [(n, t) for n, t, _ in p["fields"]] == [
        ("key", "bigint"), ("ts", "bigint"), ("tenant", "string"),
        ("score", "double"), ("note", "string")]
    cfg = p["config_kwargs"]
    assert cfg["key_col"] == "key" and cfg["ts_col"] == "ts"
    assert cfg["partition_col"] == "tenant"
    assert cfg["minmax_cols"] == ("score",)
    assert cfg["set_index_cols"] == (("tenant", 16),)
    assert cfg["max_parts_to_throw"] == 300
    assert p["constraints"] == [("pos_key", "key >= 0")]
    assert p["defaults"] == {"note": "upper(tenant)"}
    assert p["ttl"] == {"col": "ts", "interval_us": 7 * 86_400_000_000}


def test_engine_variants_map_to_modes():
    base = "CREATE TABLE t (k UInt64, ts UInt64, v Float64, sign Int8,\n"
    base += " ver UInt32) ENGINE = %s ORDER BY (k, ts)"
    assert "mode" not in parse_create_table(
        base % "MergeTree()")["config_kwargs"]
    p = parse_create_table(base % "ReplacingMergeTree(ver)")
    assert p["config_kwargs"]["mode"] == "replacing"
    assert p["config_kwargs"]["version_col"] == "ver"
    p = parse_create_table(base % "SummingMergeTree((v))")
    assert p["config_kwargs"]["mode"] == "summing"
    assert p["config_kwargs"]["sum_cols"] == ("v",)
    p = parse_create_table(base % "CollapsingMergeTree(sign)")
    assert p["config_kwargs"]["mode"] == "collapsing"
    p = parse_create_table(
        base % "VersionedCollapsingMergeTree(sign, ver)")
    assert p["config_kwargs"]["mode"] == "versioned_collapsing"
    with pytest.raises(ValueError, match="unsupported engine"):
        parse_create_table(base % "GraphiteMergeTree()")


def test_single_column_order_by_and_rejects():
    p = parse_create_table(
        "CREATE TABLE t (k UInt64) ENGINE = MergeTree() ORDER BY k")
    assert p["config_kwargs"]["key_col"] == "k"
    assert p["config_kwargs"]["ts_col"] == "k"
    with pytest.raises(ValueError, match="ORDER BY"):
        parse_create_table("CREATE TABLE t (k UInt64) ENGINE = MergeTree()")
    with pytest.raises(ValueError, match="unsupported ClickHouse type"):
        parse_create_table(
            "CREATE TABLE t (k Array(UInt64)) "
            "ENGINE = MergeTree() ORDER BY k")


def test_end_to_end_table_from_ddl(spark):
    base = tempfile.mkdtemp(prefix="ddl_tbl_")
    try:
        t = create_table_from_ddl(spark, base, DDL)
        DAY = 86_400_000_000
        rows = [(1, 1 * DAY, "acme", 0.5), (2, 9 * DAY, "acme", 1.5),
                (3, 10 * DAY, "globex", 2.5)]
        # note omitted: DEFAULT upper(tenant) fills at insert
        t.insert_batch(
            spark.createDataFrame(rows, "key long, ts long, "
                                  "tenant string, score double"))
        t.flush()
        got = {r["key"]: r["note"] for r in t.query_all().collect()}
        assert got == {1: "ACME", 2: "ACME", 3: "GLOBEX"}
        # constraint enforces at insert
        t.insert_batch(spark.createDataFrame(
            [(-1, 0, "x", 0.0)], "key long, ts long, "
            "tenant string, score double"))
        with pytest.raises(ValueError, match="pos_key"):
            t.flush()
        # declared row TTL: now = day 10 -> rows older than day 3 expire
        stats = t.apply_declared_ttl(10 * DAY)
        assert stats["rows_removed"] == 1
        assert sorted(r["key"] for r in t.query_all().collect()) == [2, 3]
        # partition pruning from PARTITION BY tenant
        assert [r["key"] for r in
                t.query_partition("globex").collect()] == [3]
        # reopen through the same DDL: constraints/ttl/defaults idempotent
        t.close()
        r = create_table_from_ddl(spark, base, DDL)
        assert [c["name"] for c in r.constraints()] == ["pos_key"]
        assert sorted(x["key"] for x in r.query_all().collect()) == [2, 3]
        r.close()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ttl_on_non_ts_column_refused(spark):
    base = tempfile.mkdtemp(prefix="ddl_ttl_")
    try:
        t = create_table_from_ddl(
            spark, base,
            "CREATE TABLE t (k UInt64, ts UInt64, other UInt64) "
            "ENGINE = MergeTree() ORDER BY (k, ts) "
            "TTL other + INTERVAL 1 DAY")
        with pytest.raises(ValueError, match="not the ts column"):
            t.apply_declared_ttl(0)
        t.close()
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# execute_ddl: ALTER / OPTIMIZE / TRUNCATE statement surface

from clickhouse_mergetree_spark.engine import execute_ddl  # noqa: E402

BASE_DDL = """
CREATE TABLE t (k UInt64, ts Int64, tenant String, score Float64)
ENGINE = MergeTree() ORDER BY (k, ts) PARTITION BY tenant
"""


@pytest.fixture()
def ddl_table(spark):
    base = tempfile.mkdtemp(prefix="alter_ddl_")
    t = create_table_from_ddl(spark, base, BASE_DDL)
    t.insert_batch(spark.createDataFrame(
        [(1, 10, "acme", 1.0), (2, 20, "acme", 2.0),
         (3, 30, "globex", 3.0), (4, 40, "globex", 4.0)],
        "k long, ts long, tenant string, score double"))
    t.flush()
    yield t
    t.close()
    shutil.rmtree(base, ignore_errors=True)


def test_alter_column_family_via_sql(ddl_table):
    t = ddl_table
    execute_ddl(t, "ALTER TABLE t ADD COLUMN boost Float64 DEFAULT score + 1")
    got = {r["k"]: r["boost"] for r in t.query_all().collect()}
    assert got == {1: 2.0, 2: 3.0, 3: 4.0, 4: 5.0}
    execute_ddl(t, "ALTER TABLE t RENAME COLUMN boost TO lift")
    execute_ddl(t, "ALTER TABLE t MODIFY COLUMN lift Float32")
    assert dict(t.query_all().dtypes)["lift"] == "float"
    execute_ddl(t, "ALTER TABLE t DROP COLUMN lift")
    assert "lift" not in [f.name for f in t.schema.fields]


def test_alter_index_constraint_projection_via_sql(ddl_table):
    t = ddl_table
    execute_ddl(t, "ALTER TABLE t ADD INDEX sc score TYPE minmax")
    assert execute_ddl(t, "ALTER TABLE t MATERIALIZE INDEX sc") == {
        "parts_indexed": 2, "parts_skipped": 0}
    assert len(t.parts_for_col_range("score", 3.5, 9.0)) == 1
    execute_ddl(t, "ALTER TABLE t DROP INDEX sc")
    execute_ddl(t, "ALTER TABLE t ADD CONSTRAINT pos CHECK score > 0")
    execute_ddl(t, "ALTER TABLE t DROP CONSTRAINT pos")
    execute_ddl(
        t, "ALTER TABLE t ADD PROJECTION by_tenant "
           "(SELECT tenant, sum(score) AS s, count(*) AS n GROUP BY tenant)")
    stats = execute_ddl(t, "ALTER TABLE t MATERIALIZE PROJECTION by_tenant")
    assert stats["parts_built"] == 2
    req = {"s": ("sum", "score"), "n": ("count", "k")}
    assert t.routed_projection(("tenant",), {"s": ("sum", "score")}) \
        == "by_tenant"
    execute_ddl(t, "ALTER TABLE t DROP PROJECTION by_tenant")
    assert t.routed_projection(("tenant",), req) is None


def test_mutations_partitions_optimize_via_sql(ddl_table):
    t = ddl_table
    execute_ddl(t, "ALTER TABLE t UPDATE score = score * 10 WHERE k = 1")
    execute_ddl(t, "ALTER TABLE t DELETE WHERE k = 2")
    got = {r["k"]: r["score"] for r in t.query_all().collect()}
    assert got == {1: 10.0, 3: 3.0, 4: 4.0}
    execute_ddl(t, "ALTER TABLE t DETACH PARTITION 'globex'")
    assert sorted(r["k"] for r in t.query_all().collect()) == [1]
    execute_ddl(t, "ALTER TABLE t ATTACH PARTITION 'globex'")
    assert sorted(r["k"] for r in t.query_all().collect()) == [1, 3, 4]
    execute_ddl(t, "OPTIMIZE TABLE t FINAL")
    execute_ddl(t, "ALTER TABLE t DROP PARTITION 'acme'")
    assert sorted(r["k"] for r in t.query_all().collect()) == [3, 4]
    assert execute_ddl(t, "TRUNCATE TABLE t") >= 1
    assert t.total_rows() == 0
    with pytest.raises(ValueError, match="unsupported ALTER clause"):
        execute_ddl(t, "ALTER TABLE t MODIFY ORDER BY (ts)")


def test_modify_and_remove_ttl_via_sql(ddl_table):
    t = ddl_table
    execute_ddl(t, "ALTER TABLE t MODIFY TTL ts + INTERVAL 10 SECOND")
    # now = 25_000_000 us? ts values are 10..40 (raw units) — declared
    # interval is in the ts column's own unit: 10s = 10_000_000 us
    stats = t.apply_declared_ttl(10_000_030)
    assert stats["rows_removed"] == 2  # ts 10 and 20 < now - 10s
    execute_ddl(t, "ALTER TABLE t REMOVE TTL")
    with pytest.raises(ValueError, match="declares no TTL"):
        t.apply_declared_ttl(0)
    with pytest.raises(ValueError, match="unsupported ALTER clause"):
        execute_ddl(t, "ALTER TABLE t MODIFY ORDER BY (k)")


def test_show_create_table_round_trips(spark):
    from clickhouse_mergetree_spark.engine.ddl import show_create_table
    base = tempfile.mkdtemp(prefix="showddl_")
    try:
        t = create_table_from_ddl(spark, base, DDL)
        execute_ddl(t, "ALTER TABLE events ADD COLUMN extra Int64 DEFAULT 7")
        shown = show_create_table(t, "events")
        p = parse_create_table(shown)
        assert p["config_kwargs"]["key_col"] == "key"
        assert p["config_kwargs"]["partition_col"] == "tenant"
        assert p["config_kwargs"]["minmax_cols"] == ("score",)
        assert p["config_kwargs"]["set_index_cols"] == (("tenant", 16),)
        assert ("pos_key", "key >= 0") in p["constraints"]
        assert p["ttl"] == {"col": "ts", "interval_us": 7 * 86_400_000_000}
        assert p["defaults"]["note"] == "upper(tenant)"
        assert p["defaults"]["extra"] == "7"
        assert [n for n, _t, _x in p["fields"]] == [
            "key", "ts", "tenant", "score", "note", "extra"]
        # the reconstructed DDL builds an equivalent table
        base2 = tempfile.mkdtemp(prefix="showddl2_")
        try:
            t2 = create_table_from_ddl(spark, base2, shown)
            assert [f.name for f in t2.schema.fields] == [
                "key", "ts", "tenant", "score", "note", "extra"]
            t2.close()
        finally:
            shutil.rmtree(base2, ignore_errors=True)
        t.close()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_partition_expression_end_to_end(spark):
    """PARTITION BY toYYYYMM(ts): the ClickHouse-typical expression form."""
    base = tempfile.mkdtemp(prefix="ddl_pexpr_")
    try:
        t = create_table_from_ddl(spark, base, """
            CREATE TABLE ev (k UInt64, ts Int64, d DateTime, v Float64)
            ENGINE = MergeTree() ORDER BY (k, ts)
            PARTITION BY toYYYYMM(d)
        """)
        assert t.config.partition_expr == "date_format(d, 'yyyyMM')"
        from datetime import datetime
        rows = [(1, 10, datetime(2026, 1, 5), 1.0),
                (2, 20, datetime(2026, 1, 20), 2.0),
                (3, 30, datetime(2026, 2, 3), 3.0)]
        t.insert_batch(spark.createDataFrame(
            rows, "k long, ts long, d timestamp, v double"))
        t.flush()
        # one part per computed month value
        assert t.partitions() == ["202601", "202602"]
        assert sorted(r["k"] for r in
                      t.query_partition("202601").collect()) == [1, 2]
        # partition ops address computed values, metadata-only
        assert t.drop_partition("202601") == 2
        assert sorted(r["k"] for r in t.query_all().collect()) == [3]
        # renaming a column the partition expression needs is refused
        with pytest.raises(ValueError, match="partition expression"):
            t.rename_column("d", "when_col")
        # SHOW CREATE emits the expression and round-trips
        from clickhouse_mergetree_spark.engine.ddl import show_create_table
        p = parse_create_table(show_create_table(t, "ev"))
        assert p["config_kwargs"]["partition_expr"] \
            == "date_format(d, 'yyyyMM')"
        t.close()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_partition_fn_translation():
    p = parse_create_table(
        "CREATE TABLE t (k UInt64, d Date) ENGINE = MergeTree() "
        "ORDER BY k PARTITION BY intDiv(k, 100)")
    assert p["config_kwargs"]["partition_expr"] == "(k DIV 100)"
    p = parse_create_table(
        "CREATE TABLE t (k UInt64, d Date) ENGINE = MergeTree() "
        "ORDER BY k PARTITION BY cityHash64(k)")
    assert p["config_kwargs"]["partition_expr"] == "xxhash64(k)"
    # plain column still lands in partition_col
    p = parse_create_table(
        "CREATE TABLE t (k UInt64, d Date) ENGINE = MergeTree() "
        "ORDER BY k PARTITION BY d")
    assert p["config_kwargs"].get("partition_col") == "d"
    assert "partition_expr" not in p["config_kwargs"]


def test_create_materialized_view_from_ddl(spark):
    from clickhouse_mergetree_spark.engine.ddl import (
        create_materialized_view_from_ddl)
    base = tempfile.mkdtemp(prefix="mv_ddl_")
    try:
        src = create_table_from_ddl(spark, base + "/src", """
            CREATE TABLE ev (k UInt64, ts Int64, tenant String, v Float64)
            ENGINE = MergeTree() ORDER BY (k, ts)
        """)
        # pre-MV rows: POPULATE must backfill them
        src.insert_batch(spark.createDataFrame(
            [(1, 10, "acme", 1.0), (2, 20, "acme", 2.0)],
            "k long, ts long, tenant string, v double"))
        src.flush()
        mv = create_materialized_view_from_ddl(
            spark, src, base + "/mv", """
            CREATE MATERIALIZED VIEW rollup
            ENGINE = SummingMergeTree() ORDER BY tenant
            POPULATE
            AS SELECT tenant, count(*) AS n, sum(v) AS v_sum
            FROM ev GROUP BY tenant
        """)
        mv.flush()
        got = {r["tenant"]: (r["n"], r["v_sum"])
               for r in mv.query().collect()}
        assert got == {"acme": (2, 3.0)}
        # incremental on top
        src.insert_batch(spark.createDataFrame(
            [(3, 30, "globex", 5.0)],
            "k long, ts long, tenant string, v double"))
        mv.flush()
        got = {r["tenant"]: (r["n"], r["v_sum"])
               for r in mv.query().collect()}
        assert got == {"acme": (2, 3.0), "globex": (1, 5.0)}
        with pytest.raises(ValueError, match="unsupported MV select"):
            create_materialized_view_from_ddl(
                spark, src, base + "/mv2",
                "CREATE MATERIALIZED VIEW x ENGINE = SummingMergeTree() "
                "ORDER BY tenant AS SELECT tenant, avg(v) AS a "
                "FROM ev GROUP BY tenant")
        src.close()
        mv.close()
    finally:
        shutil.rmtree(base, ignore_errors=True)


class TestInsertStatement:
    SCHEMA_DDL = """
        CREATE TABLE kv (
            key UInt64,
            ts_us Int64,
            label String DEFAULT 'none',
            value Float64
        ) ENGINE = MergeTree ORDER BY (key, ts_us)
        SETTINGS memtable_flush_threshold = 1000000000
    """

    def _mk(self, spark, tmp_path):
        from clickhouse_mergetree_spark.engine.ddl import (
            create_table_from_ddl)
        return create_table_from_ddl(spark, str(tmp_path / "ins"),
                                     self.SCHEMA_DDL)

    def test_insert_values_full(self, spark, tmp_path):
        from clickhouse_mergetree_spark.engine.ddl import execute_ddl
        with self._mk(spark, tmp_path) as t:
            n = execute_ddl(
                t, "INSERT INTO kv VALUES (1, 10, 'a', 1.5), "
                   "(2, 20, 'b', 2.5)")
            assert n == 2
            t.flush()
            rows = {r["key"]: (r["label"], r["value"])
                    for r in t.query_all().collect()}
            assert rows == {1: ("a", 1.5), 2: ("b", 2.5)}

    def test_insert_values_column_subset_fills_default(self, spark,
                                                       tmp_path):
        from clickhouse_mergetree_spark.engine.ddl import execute_ddl
        with self._mk(spark, tmp_path) as t:
            n = execute_ddl(
                t, "INSERT INTO kv (key, ts_us, value) "
                   "VALUES (1, 10, 0.5)")
            assert n == 1
            t.flush()
            r = t.query_all().collect()[0]
            assert r["label"] == "none" and r["value"] == 0.5

    def test_insert_omitting_no_default_column_refused(self, spark,
                                                       tmp_path):
        import pytest
        from clickhouse_mergetree_spark.engine.ddl import execute_ddl
        with self._mk(spark, tmp_path) as t:
            with pytest.raises(ValueError, match="no declared DEFAULT"):
                execute_ddl(t, "INSERT INTO kv (key, ts_us, label) "
                               "VALUES (1, 10, 'x')")
            with pytest.raises(ValueError, match="unknown INSERT"):
                execute_ddl(t, "INSERT INTO kv (key, ts_us, nope) "
                               "VALUES (1, 10, 'x')")

    def test_insert_select_positional(self, spark, tmp_path):
        from clickhouse_mergetree_spark.engine.ddl import execute_ddl
        with self._mk(spark, tmp_path) as t:
            spark.range(5).createOrReplaceTempView("seq5")
            n = execute_ddl(
                t, "INSERT INTO kv SELECT id, id * 10, "
                   "concat('r', id), id * 1.0 FROM seq5")
            assert n == 5
            t.flush()
            rows = {r["key"]: r["label"] for r in t.query_all().collect()}
            assert rows == {i: f"r{i}" for i in range(5)}

    def test_insert_select_casts_types(self, spark, tmp_path):
        from clickhouse_mergetree_spark.engine.ddl import execute_ddl
        with self._mk(spark, tmp_path) as t:
            spark.range(3).createOrReplaceTempView("seq3")
            # strings → cast to declared long/double
            n = execute_ddl(
                t, "INSERT INTO kv (key, ts_us, value) "
                   "SELECT CAST(id AS STRING), CAST(id AS STRING), "
                   "CAST(id AS STRING) FROM seq3")
            assert n == 3
            t.flush()
            assert t.query_all().schema["key"].dataType.typeName() == "long"
            assert t.query_all().count() == 3


def test_comment_column_lifecycle(spark, tmp_path):
    from clickhouse_mergetree_spark.engine import (MergeTreeConfig,
                                                   SparkMergeTree)
    from clickhouse_mergetree_spark.engine.ddl import execute_ddl
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
    ])
    base = str(tmp_path / "cc")
    cfg = MergeTreeConfig(memtable_flush_threshold=10**12,
                          key_col="k", ts_col="ts")
    with SparkMergeTree(spark, base, schema=schema, config=cfg) as t:
        execute_ddl(t, "ALTER TABLE t COMMENT COLUMN v 'it''s a value'")
        got = {r["name"]: r["comment"]
               for r in t.system_columns().collect()}
        assert got == {"k": None, "ts": None, "v": "it's a value"}
        t.rename_column("v", "w")
        got = {r["name"]: r["comment"]
               for r in t.system_columns().collect()}
        assert got["w"] == "it's a value"  # comment followed the rename
        with pytest.raises(ValueError, match="unknown column"):
            t.comment_column("nope", "x")
    # persisted across reopen; drop kills it
    with SparkMergeTree(spark, base, schema=schema, config=cfg) as t2:
        got = {r["name"]: r["comment"]
               for r in t2.system_columns().collect()}
        assert got["w"] == "it's a value"
        t2.drop_column("w")
        assert "w" not in t2.manifest.table_meta.get("column_comments", {})
        t2.comment_column("ts", None)  # clearing a non-comment is a no-op


def test_mutation_in_partition_scopes_and_prunes(ddl_table):
    """ALTER ... UPDATE/DELETE ... IN PARTITION p: rows outside p never
    match even when WHERE does, and p's parts are the only ones SCANNED
    (the pruning contract — parts_scanned counts candidate parts after
    manifest pruning, so a partition-scoped mutation of a 2-partition
    table must report 1)."""
    t = ddl_table
    stats = execute_ddl(
        t, "ALTER TABLE t UPDATE score = score + 100 "
           "IN PARTITION 'acme' WHERE k >= 1")
    assert stats["parts_scanned"] == 1  # globex part never opened
    got = {r["k"]: r["score"] for r in t.query_all().collect()}
    assert got == {1: 101.0, 2: 102.0, 3: 3.0, 4: 4.0}

    stats = execute_ddl(
        t, "ALTER TABLE t DELETE IN PARTITION globex WHERE k >= 1")
    assert stats["parts_scanned"] == 1
    assert sorted(r["k"] for r in t.query_all().collect()) == [1, 2]


def test_mutation_in_partition_requires_partitioning(spark, tmp_path):
    t = create_table_from_ddl(spark, str(tmp_path / "np"), """
        CREATE TABLE np (k Int64, ts Int64, score Float64)
        ENGINE = MergeTree ORDER BY (k, ts)
    """)
    try:
        t.insert_batch(spark.createDataFrame(
            [(1, 10, 1.0)], "k long, ts long, score double"))
        t.flush()
        with pytest.raises(ValueError, match="unpartitioned"):
            execute_ddl(
                t, "ALTER TABLE np DELETE IN PARTITION 'x' WHERE k = 1")
    finally:
        t.close()


def test_freeze_unfreeze_via_sql(ddl_table):
    t = ddl_table
    stats = execute_ddl(
        t, "ALTER TABLE t FREEZE PARTITION 'acme' WITH NAME snap1")
    assert stats["backup"] == "snap1" and stats["parts_frozen"] == 1
    execute_ddl(t, "ALTER TABLE t UNFREEZE WITH NAME snap1")
    with pytest.raises(ValueError, match="no backup"):
        t.restore_frozen("snap1")
    with pytest.raises(ValueError, match="no backup"):
        execute_ddl(t, "ALTER TABLE t UNFREEZE WITH NAME snap1")


def test_describe_table_via_sql(ddl_table):
    t = ddl_table
    execute_ddl(t, "ALTER TABLE t ADD COLUMN boost Float64 DEFAULT 1.5")
    execute_ddl(t, "ALTER TABLE t COMMENT COLUMN boost 'per-row boost'")
    rows = {r["name"]: r for r in
            execute_ddl(t, "DESCRIBE TABLE t").collect()}
    assert set(rows) == {"k", "ts", "tenant", "score", "boost"}
    assert rows["boost"]["default"] == "1.5"
    assert rows["boost"]["comment"] == "per-row boost"
    assert rows["k"]["type"] == "bigint"
    # bare DESC shorthand hits the same branch
    assert execute_ddl(t, "DESC t").count() == 5


def test_materialize_column_via_sql(ddl_table):
    t = ddl_table
    execute_ddl(t, "ALTER TABLE t ADD COLUMN boost Float64 DEFAULT 2.5")
    res = execute_ddl(t, "ALTER TABLE t MATERIALIZE COLUMN boost")
    assert res["parts_rewritten"] >= 1
    assert execute_ddl(t, "ALTER TABLE t MATERIALIZE COLUMN boost") == {
        "parts_rewritten": 0, "rows_rewritten": 0}
    rows = t.query_all().collect()
    assert rows and all(r["boost"] == 2.5 for r in rows)


def test_enum_columns_map_to_checked_strings(spark, tmp_path):
    """Enum8/16 -> string with an implicit membership CHECK: valid
    labels insert, an unknown label is rejected at insert time (the CH
    unknown-Enum-value contract), Nullable(Enum8) admits NULL."""
    import pytest

    from clickhouse_mergetree_spark.engine.ddl import create_table_from_ddl
    from clickhouse_mergetree_spark.tables import values_df

    t = create_table_from_ddl(spark, str(tmp_path / "enum_t"), """
        CREATE TABLE et (
            k UInt64,
            ts UInt64,
            state Enum8('new' = 1, 'sent' = 2, 'done' = 3),
            tag Nullable(Enum16('a' = -1, 'b' = 2))
        ) ENGINE = MergeTree() ORDER BY (k, ts)
    """)
    assert [c["name"] for c in t.constraints()] == ["enum_state", "enum_tag"]
    cols = [("k", "bigint"), ("ts", "bigint"),
            ("state", "string"), ("tag", "string")]
    t.insert_batch(values_df(
        spark, [(1, 1, "new", "a"), (2, 2, "done", None)], cols),
        row_count=1)
    t.flush()
    assert t.total_rows() == 2
    with pytest.raises(ValueError, match="enum_state"):
        t.insert_batch(values_df(
            spark, [(3, 3, "bogus", "a")], cols), row_count=1)
        t.flush()
    assert t.total_rows() == 2  # rejected batch left the table untouched
    # the declared label→value mapping is preserved for sort-sensitive
    # consumers (the stored column itself sorts lexically — documented
    # deviation from CH's numeric enum order)
    assert t.manifest.table_meta["enum_values"] == {
        "state": {"new": 1, "sent": 2, "done": 3},
        "tag": {"a": -1, "b": 2},
    }
    t.close()


def test_enum_auto_increment_values(tmp_path):
    """CH value assignment without explicit '=': first label is 1, then
    previous+1; explicit assignments reset the counter."""
    from clickhouse_mergetree_spark.engine.ddl import parse_create_table

    parsed = parse_create_table("""
        CREATE TABLE et2 (
            k UInt64, ts UInt64,
            a Enum8('x', 'y', 'z'),
            b Enum16('p' = 5, 'q', 'r' = -2, 's')
        ) ENGINE = MergeTree() ORDER BY (k, ts)
    """)
    assert parsed["enums"] == {
        "a": {"x": 1, "y": 2, "z": 3},
        "b": {"p": 5, "q": 6, "r": -2, "s": -1},
    }


def test_enum_rejects_duplicates_and_out_of_range(tmp_path):
    """CH rejects the CREATE for duplicate labels, duplicate values, and
    values outside the Enum8/16 storage range — so must the parser
    (r11 review find: these were silently accepted)."""
    import pytest

    from clickhouse_mergetree_spark.engine.ddl import parse_create_table

    def ddl(col_def: str) -> str:
        return (f"CREATE TABLE t (k UInt64, ts UInt64, c {col_def}) "
                "ENGINE = MergeTree() ORDER BY (k, ts)")

    with pytest.raises(ValueError, match="duplicate Enum label"):
        parse_create_table(ddl("Enum8('a' = 1, 'a' = 2)"))
    with pytest.raises(ValueError, match="duplicate Enum value"):
        parse_create_table(ddl("Enum8('a' = 1, 'b' = 1)"))
    with pytest.raises(ValueError, match=r"outside \[-128, 127\]"):
        parse_create_table(ddl("Enum8('x' = 300)"))
    with pytest.raises(ValueError, match=r"outside \[-32768, 32767\]"):
        parse_create_table(ddl("Enum16('x' = 40000)"))
    # auto-increment past the range boundary is also rejected
    with pytest.raises(ValueError, match=r"outside \[-128, 127\]"):
        parse_create_table(ddl("Enum8('a' = 127, 'b')"))
