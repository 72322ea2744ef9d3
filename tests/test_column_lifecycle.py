"""ALTER TABLE DROP COLUMN + column-level TTL (expire_columns).

DROP COLUMN pins: metadata-only commit (zero parts rewritten, part ids
unchanged), reads at the narrowed schema, reopen replay, the
re-ADD-after-DROP contract (pre-drop parts serve the NEW default, never
the stale physical bytes — ClickHouse's "DROP destroys the data"
semantics), and structural-column refusal.

expire_columns pins: the three per-(part, column) cases — metadata-only
whole-part expiry, straddling-part single rewrite, untouched young part —
value correctness, default substitution for evolved columns, merge
materialization of metadata-expired columns, reopen persistence, and
structural-column refusal.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("ts", T.LongType(), False),
    T.StructField("payload", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
])

CFG = dict(memtable_flush_threshold=10**9, max_parts=100,
           key_col="key", ts_col="ts")


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="collife_tbl_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def table(spark, base):
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    yield t
    t.close()


def _flush(table, lo, hi):
    table.insert_rows([(f"k{ts:05d}", ts, f"p{ts}", float(ts))
                       for ts in range(lo, hi)])
    table.flush()


# --------------------------------------------------------------- DROP COLUMN

def test_drop_column_is_metadata_only(table):
    _flush(table, 0, 100)
    _flush(table, 100, 200)
    before_ids = [p.part_id for p in table.manifest.parts]
    table.drop_column("payload")
    assert [p.part_id for p in table.manifest.parts] == before_ids
    assert [f.name for f in table.schema.fields] == ["key", "ts", "score"]
    rows = table.query_all().collect()
    assert len(rows) == 200
    assert set(rows[0].asDict()) == {"key", "ts", "score"}


def test_drop_column_survives_reopen(spark, base):
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    _flush(t, 0, 50)
    t.drop_column("payload")
    t.close()
    # reopen with the ORIGINAL schema: the manifest replays the drop
    t2 = SparkMergeTree(spark, base, schema=SCHEMA,
                        config=MergeTreeConfig(**CFG))
    assert [f.name for f in t2.schema.fields] == ["key", "ts", "score"]
    assert t2.query_all().count() == 50
    t2.close()


def test_drop_then_readd_serves_new_default_not_stale_bytes(table):
    _flush(table, 0, 10)            # part 1: physical payload = p0..p9
    table.drop_column("payload")
    table.add_column("payload", "string", default="redacted")
    # re-added column sits at the END of the schema now
    table.insert_rows([(f"k{ts:05d}", ts, float(ts), f"p{ts}")
                       for ts in range(10, 20)])
    table.flush()                   # part 2: physical payload = p10..p19
    rows = {r["key"]: r["payload"] for r in table.query_all().collect()}
    assert rows["k00000"] == "redacted"   # pre-drop part: never the bytes
    assert rows["k00015"] == "p15"        # post-re-add part: real values
    # inserts after the re-add must carry the column again
    assert [f.name for f in table.schema.fields] == [
        "key", "ts", "score", "payload"]


def test_drop_then_readd_survives_reopen(spark, base):
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    _flush(t, 0, 10)
    t.drop_column("payload")
    t.add_column("payload", "string", default="redacted")
    t.insert_rows([(f"k{ts:05d}", ts, float(ts), f"p{ts}")
                   for ts in range(10, 20)])
    t.flush()
    t.close()
    t2 = SparkMergeTree(spark, base, schema=SCHEMA,
                        config=MergeTreeConfig(**CFG))
    rows = {r["key"]: r["payload"] for r in t2.query_all().collect()}
    assert rows["k00000"] == "redacted" and rows["k00015"] == "p15"
    t2.close()


def test_drop_then_readd_different_type_survives_reopen(spark, base):
    # re-ADD with a DIFFERENT ddl than the original field: the reopened
    # table must serve the NEW type (the drop entry survives the re-add
    # and replays before the add), not the original string type
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    _flush(t, 0, 10)
    t.drop_column("payload")
    t.add_column("payload", "bigint", default=-1)
    t.insert_rows([(f"k{ts:05d}", ts, float(ts), ts * 10)
                   for ts in range(10, 20)])
    t.flush()
    t.close()
    t2 = SparkMergeTree(spark, base, schema=SCHEMA,
                        config=MergeTreeConfig(**CFG))
    assert dict(t2.query_all().dtypes)["payload"] == "bigint"
    assert [f.name for f in t2.schema.fields] == [
        "key", "ts", "score", "payload"]
    rows = {r["key"]: r["payload"] for r in t2.query_all().collect()}
    assert rows["k00000"] == -1 and rows["k00015"] == 150
    t2.close()


def test_single_part_optimize_materializes_pending_drop_of_rename(
        spark, table):
    # ONE part only: plain optimize() must still rewrite it when its
    # physical layout lags the schema (pending rename materialization)
    _flush(table, 0, 20)
    assert table.part_count() == 1
    table.rename_column("payload", "body")
    table.optimize()
    assert table.part_count() == 1
    physical = spark.read.parquet(table.manifest.parts[0].path)
    assert "body" in physical.columns and "payload" not in physical.columns
    # a second optimize is a no-op: the rewrite cleared the pending state
    pid = table.manifest.parts[0].part_id
    table.optimize()
    assert table.manifest.parts[0].part_id == pid


def test_drop_column_refuses_structural_and_unknown(table):
    for col in ("key", "ts"):
        with pytest.raises(ValueError, match="structural"):
            table.drop_column(col)
    with pytest.raises(ValueError, match="unknown"):
        table.drop_column("nope")


def test_merge_physically_sheds_dropped_column(spark, table):
    _flush(table, 0, 50)
    _flush(table, 50, 100)
    table.drop_column("payload")
    table.config.max_parts = 1
    table.optimize()
    assert table.part_count() == 1
    merged = table.manifest.parts[0]
    physical = spark.read.parquet(merged.path)
    assert "payload" not in physical.columns  # lazily shed at the rewrite
    assert table.query_all().count() == 100


# ------------------------------------------------------------- expire_columns

def test_expire_columns_three_cases(table):
    _flush(table, 0, 100)     # max_ts < 150: metadata-only expiry
    _flush(table, 100, 200)   # straddles 150: one rewrite
    _flush(table, 200, 300)   # min_ts >= 150: untouched
    ids_before = {p.part_id for p in table.manifest.parts}
    stats = table.expire_columns({"payload": 150})
    assert stats == {"parts_meta_expired": 1, "parts_rewritten": 1,
                     "cells_cleared": 150}
    # untouched part + metadata part keep their ids; straddler was swapped
    ids_after = {p.part_id for p in table.manifest.parts}
    assert len(ids_before & ids_after) == 2
    rows = {r["ts"]: r for r in table.query_all().collect()}
    assert len(rows) == 300                      # no row dropped
    assert rows[0]["payload"] is None            # metadata-expired part
    assert rows[149]["payload"] is None          # rewritten straddler, old
    assert rows[150]["payload"] == "p150"        # rewritten straddler, young
    assert rows[250]["payload"] == "p250"        # untouched part
    assert rows[0]["score"] == 0.0               # other columns untouched


def test_expire_columns_uses_declared_default(table):
    _flush(table, 0, 10)
    table.add_column("origin", "string", default="backfill")
    table.insert_rows([(f"k{ts:05d}", ts, f"p{ts}", float(ts), "live")
                       for ts in range(10, 20)])
    table.flush()
    table.expire_columns({"origin": 1000})  # everything expires
    vals = {r["ts"]: r["origin"] for r in table.query_all().collect()}
    # expired ⇒ the ADD COLUMN default, for both parts
    assert set(vals.values()) == {"backfill"}


def test_merge_materializes_metadata_expiry(spark, table):
    _flush(table, 0, 100)
    _flush(table, 100, 200)
    table.expire_columns({"payload": 500})   # both parts metadata-expired
    assert all(p.expired_cols == ["payload"] for p in table.manifest.parts)
    table.config.max_parts = 1
    table.optimize()
    merged = table.manifest.parts[0]
    assert merged.expired_cols is None        # physically materialized
    physical = spark.read.parquet(merged.path)
    assert physical.filter(physical.payload.isNotNull()).count() == 0


def test_expire_columns_survives_reopen(spark, base):
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    _flush(t, 0, 50)
    t.expire_columns({"payload": 500})
    t.close()
    t2 = SparkMergeTree(spark, base, schema=SCHEMA,
                        config=MergeTreeConfig(**CFG))
    assert t2.query_all().filter("payload IS NOT NULL").count() == 0
    assert t2.query_all().count() == 50
    t2.close()


def test_expire_columns_refuses_structural_and_unknown(table):
    with pytest.raises(ValueError, match="structural"):
        table.expire_columns({"ts": 10})
    with pytest.raises(ValueError, match="unknown"):
        table.expire_columns({"nope": 10})


def test_expire_columns_idempotent(table):
    _flush(table, 0, 100)
    s1 = table.expire_columns({"payload": 500})
    s2 = table.expire_columns({"payload": 500})
    assert s1["cells_cleared"] == 100
    assert s2 == {"parts_meta_expired": 0, "parts_rewritten": 0,
                  "cells_cleared": 0}


def test_lw_delete_survives_later_column_expiry(table):
    # a live unmaterialized DELETE whose predicate references a column
    # that is LATER expired/cleared must keep filtering against the
    # physical bytes it matched at delete time — the mask applies before
    # the expired-column default substitution in the read path
    _flush(table, 0, 100)
    table.lightweight_delete("payload = 'p42'")
    assert table.query_all().count() == 99
    table.expire_columns({"payload": 10**9})     # every row's payload -> NULL
    out = table.query_all()
    assert out.count() == 99                      # k00042 stays deleted
    assert out.filter("key = 'k00042'").count() == 0
    assert out.filter("payload IS NOT NULL").count() == 0
    # and a rewrite (merge) materializes the same 99-row result
    table.optimize(final=True)
    assert table.query_all().count() == 99


def test_clear_column_covers_tombstoned_snapshot_parts(spark, base):
    # time-travel reads must observe post-CLEAR values: snapshot-retained
    # (tombstoned) parts get the expiry mark too, so cleared/redacted
    # data cannot leak through query_at_version
    cfg = dict(CFG, snapshot_retention=10, max_parts=1)
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**cfg))
    _flush(t, 0, 10)
    _flush(t, 10, 20)
    v0 = t.current_version()
    t.optimize()                       # merge: old parts -> tombstones
    assert t.manifest.tombstones
    t.clear_column("payload")
    snap = t.query_at_version(v0)
    assert snap.count() == 20
    assert snap.filter("payload IS NOT NULL").count() == 0
    t.close()


# -------------------------------------------------------------- RENAME COLUMN

def test_rename_column_is_metadata_only(table):
    _flush(table, 0, 100)
    before_ids = [p.part_id for p in table.manifest.parts]
    table.rename_column("payload", "body")
    assert [p.part_id for p in table.manifest.parts] == before_ids
    assert [f.name for f in table.schema.fields] == [
        "key", "ts", "body", "score"]
    # old part serves its physical bytes under the new logical name
    rows = {r["key"]: r["body"] for r in table.query_all().collect()}
    assert rows["k00042"] == "p42"


def test_rename_column_mixed_parts_and_reopen(spark, base):
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    _flush(t, 0, 10)                      # physical name: payload
    t.rename_column("payload", "body")
    t.insert_rows([(f"k{ts:05d}", ts, f"b{ts}", float(ts))
                   for ts in range(10, 20)])
    t.flush()                             # physical name: body
    rows = {r["key"]: r["body"] for r in t.query_all().collect()}
    assert rows["k00005"] == "p5" and rows["k00015"] == "b15"
    t.close()
    # reopen with the ORIGINAL schema: manifest replays the rename
    t2 = SparkMergeTree(spark, base, schema=SCHEMA,
                        config=MergeTreeConfig(**CFG))
    assert [f.name for f in t2.schema.fields] == [
        "key", "ts", "body", "score"]
    rows = {r["key"]: r["body"] for r in t2.query_all().collect()}
    assert rows["k00005"] == "p5" and rows["k00015"] == "b15"
    t2.close()


def test_rename_chain_and_merge_materializes(spark, table):
    _flush(table, 0, 50)
    table.rename_column("payload", "body")
    table.rename_column("body", "text")   # chain: text <- body <- payload
    rows = {r["key"]: r["text"] for r in table.query_all().collect()}
    assert rows["k00007"] == "p7"
    table.config.max_parts = 1
    table.optimize()
    merged = table.manifest.parts[0]
    physical = spark.read.parquet(merged.path)
    assert "text" in physical.columns and "payload" not in physical.columns


def test_rename_then_drop_then_query(spark, base):
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    _flush(t, 0, 10)
    t.rename_column("payload", "body")
    t.drop_column("body")
    assert [f.name for f in t.schema.fields] == ["key", "ts", "score"]
    assert t.query_all().count() == 10
    t.close()
    t2 = SparkMergeTree(spark, base, schema=SCHEMA,
                        config=MergeTreeConfig(**CFG))
    assert [f.name for f in t2.schema.fields] == ["key", "ts", "score"]
    t2.close()


def test_rename_of_added_column_survives_reopen(spark, base):
    t = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    _flush(t, 0, 10)
    t.add_column("origin", "string", default="backfill")
    t.insert_rows([(f"k{ts:05d}", ts, f"p{ts}", float(ts), "live")
                   for ts in range(10, 20)])
    t.flush()
    t.rename_column("origin", "source")
    vals = {r["ts"]: r["source"] for r in t.query_all().collect()}
    assert vals[0] == "backfill" and vals[15] == "live"
    t.close()
    t2 = SparkMergeTree(spark, base, schema=SCHEMA,
                        config=MergeTreeConfig(**CFG))
    vals = {r["ts"]: r["source"] for r in t2.query_all().collect()}
    assert vals[0] == "backfill" and vals[15] == "live"
    t2.close()


def test_refused_add_leaves_schema_untouched(table):
    # a REFUSED ALTER must be a no-op: re-adding a renamed-away name
    # raises, and the schema must not keep a half-applied column
    # (regression: add_column widened self.schema before the validation)
    _flush(table, 0, 5)
    table.rename_column("payload", "body")
    before = [f.name for f in table.schema.fields]
    with pytest.raises(ValueError, match="reused"):
        table.add_column("payload", "string")
    assert [f.name for f in table.schema.fields] == before
    table.insert_rows([(f"k{ts:05d}", ts, f"b{ts}", float(ts))
                       for ts in range(5, 10)])   # still insertable
    table.flush()
    assert table.query_all().count() == 10


def test_rename_refusals(table):
    _flush(table, 0, 10)
    with pytest.raises(ValueError, match="structural"):
        table.rename_column("key", "k2")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("payload", "score")
    with pytest.raises(ValueError, match="unknown"):
        table.rename_column("nope", "x")
    table.rename_column("payload", "body")
    with pytest.raises(ValueError, match="reused"):
        table.rename_column("score", "payload")
    with pytest.raises(ValueError, match="reused"):
        table.add_column("payload", "string")


# --------------------------------------------------------------- CLEAR COLUMN

def test_clear_column_is_metadata_only(table):
    _flush(table, 0, 100)
    _flush(table, 100, 200)
    ids_before = [p.part_id for p in table.manifest.parts]
    stats = table.clear_column("payload")
    assert stats == {"parts_marked": 2, "cells_cleared": 200}
    assert [p.part_id for p in table.manifest.parts] == ids_before
    out = table.query_all()
    assert out.filter("payload IS NOT NULL").count() == 0
    assert out.count() == 200
    assert out.filter("score IS NULL").count() == 0  # others untouched


def test_clear_column_in_partition(spark):
    base = tempfile.mkdtemp(prefix="clearpart_tbl_")
    schema = T.StructType([
        T.StructField("key", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("cat", T.StringType(), True),
        T.StructField("payload", T.StringType(), True),
    ])
    cfg = MergeTreeConfig(memtable_flush_threshold=10**9, max_parts=100,
                          key_col="key", ts_col="ts", partition_col="cat")
    t = SparkMergeTree(spark, base, schema=schema, config=cfg)
    t.insert_rows([(f"k{i:03d}", i, "a" if i % 2 else "b", f"p{i}")
                   for i in range(100)])
    t.flush()
    stats = t.clear_column("payload", partition="a")
    assert stats["parts_marked"] == 1 and stats["cells_cleared"] == 50
    rows = t.query_all().collect()
    assert all(r["payload"] is None for r in rows if r["cat"] == "a")
    assert all(r["payload"] == f'p{r["ts"]}' for r in rows if r["cat"] == "b")
    t.close()
    shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# ADD COLUMN ... DEFAULT expr (expression defaults)


def test_default_expr_lazy_read_and_merge(table):
    _flush(table, 0, 10)
    ids = [p.part_id for p in table.manifest.parts]
    table.add_column("score2", "double", default_expr="score * 2")
    assert [p.part_id for p in table.manifest.parts] == ids  # O(1)
    rows = {r["key"]: r["score2"] for r in table.query_all().collect()}
    assert rows["k00003"] == 6.0  # computed from the row's own score
    table.config.max_parts = 1
    table.optimize()  # materializes physically
    assert {r["key"]: r["score2"]
            for r in table.query_all().collect()} == rows


def test_default_expr_survives_reopen(table, spark, base):
    _flush(table, 0, 5)
    table.add_column("plen", "bigint", default_expr="length(payload)")
    r = SparkMergeTree(spark, base, schema=SCHEMA,
                       config=MergeTreeConfig(**CFG))
    got = {x["key"]: x["plen"] for x in r.query_all().collect()}
    assert got["k00004"] == len("p4")
    # system.columns reports the expression as the declared default
    col = [c for c in r.system_columns().collect() if c["name"] == "plen"]
    assert col and "DEFAULT length(payload)" in col[0]["default"]


def test_column_ttl_resets_to_expression_default(table):
    _flush(table, 0, 10)   # all-old part (ts 0..9)
    _flush(table, 20, 30)  # young part
    table.add_column("tag", "string", default_expr="upper(payload)")
    stats = table.expire_columns({"tag": 15})
    assert stats["parts_meta_expired"] == 1
    got = {r["key"]: r["tag"] for r in table.query_all().collect()}
    # expired rows re-derive the expression default; young rows too
    # (every part predates the ALTER, so both read lazily)
    assert got["k00003"] == "P3" and got["k00025"] == "P25"


def test_default_expr_validation(table):
    with pytest.raises(ValueError, match="not both"):
        table.add_column("x", "bigint", default=1, default_expr="1")
    with pytest.raises(Exception):  # unknown column in the expression
        table.add_column("x", "bigint", default_expr="nope + 1")
    assert not any(f.name == "x" for f in table.schema.fields)


def test_drop_refuses_default_expr_dependency(table):
    _flush(table, 0, 5)
    table.add_column("plen", "bigint", default_expr="length(payload)")
    with pytest.raises(ValueError, match="default expression of 'plen'"):
        table.drop_column("payload")
    table.drop_column("plen")     # dependent gone first
    table.drop_column("payload")  # now fine
    assert [f.name for f in table.schema.fields] == ["key", "ts", "score"]


# -------------------------------------------------------- MATERIALIZE COLUMN

def test_materialize_column_rewrites_only_lagging_parts(table):
    _flush(table, 0, 10)                      # part 1: pre-ADD
    table.add_column("boost", "DOUBLE", default=1.5)
    table.insert_rows([(f"k{ts:05d}", ts, f"p{ts}", float(ts), 1.5)
                       for ts in range(10, 20)])
    table.flush()                             # part 2: has boost physically
    ids_before = {p.part_id for p in table.manifest.parts}
    res = table.materialize_column("boost")
    assert res == {"parts_rewritten": 1, "rows_rewritten": 10}
    # the post-ADD part is untouched; the pre-ADD part was replaced
    survivors = {p.part_id for p in table.manifest.parts}
    assert len(survivors & ids_before) == 1
    # physical column lists now all carry boost; values unchanged
    for p in table.manifest.parts:
        assert p.columns is None or "boost" in p.columns
    rows = table.query_all().orderBy("ts").collect()
    assert [r["boost"] for r in rows] == [1.5] * 20
    # idempotent: nothing lags anymore
    assert table.materialize_column("boost") == {
        "parts_rewritten": 0, "rows_rewritten": 0}


def test_materialize_column_is_column_scoped(table):
    _flush(table, 0, 10)
    table.add_column("a", "DOUBLE", default=1.0)
    table.add_column("b", "DOUBLE", default=2.0)
    # materializing a also materializes b physically (the rewrite runs at
    # the CURRENT schema — same as any merge), so afterwards b lags in
    # zero parts too: the scoping contract is about which parts are
    # SELECTED, pinned here by the second call being a no-op
    assert table.materialize_column("a")["parts_rewritten"] == 1
    assert table.materialize_column("b")["parts_rewritten"] == 0


def test_materialize_column_after_rename_and_clear(table):
    _flush(table, 0, 10)
    table.rename_column("payload", "body")
    assert table.materialize_column("body")["parts_rewritten"] == 1
    assert table.materialize_column("body")["parts_rewritten"] == 0
    table.clear_column("score")
    assert table.materialize_column("score")["parts_rewritten"] == 1
    rows = table.query_all().collect()
    assert all(r["score"] is None for r in rows)
    assert all(r["body"] == f"p{r['ts']}" for r in rows)


def test_materialize_column_unknown_refused(table):
    with pytest.raises(ValueError, match="unknown column"):
        table.materialize_column("nope")
