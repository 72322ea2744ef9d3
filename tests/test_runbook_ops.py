"""SYSTEM STOP/START MERGES, MOVE PARTITION TO TABLE, KILL MUTATION —
the operational runbook trio (ClickHouse analogs — extension)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine import MergeTreeConfig, SparkMergeTree

SCHEMA = T.StructType([
    T.StructField("key", T.LongType(), False),
    T.StructField("ts_us", T.LongType(), False),
    T.StructField("value", T.DoubleType(), True),
])

CFG = dict(memtable_flush_threshold=10**12, max_parts=2,
           key_col="key", ts_col="ts_us")


@pytest.fixture()
def base_path(tmp_path):
    return str(tmp_path / "table")


def _insert_parts(t, n_parts, rows_per=10, base=0):
    for i in range(n_parts):
        lo = base + i * rows_per
        t.insert_rows([(k, 1000 + k, float(k))
                       for k in range(lo, lo + rows_per)])
        t.flush()


class TestStopStartMerges:
    def test_stop_suppresses_triggered_merges(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            t.stop_merges()
            _insert_parts(t, 6)
            assert t.part_count() == 6  # > max_parts, yet no merge ran
            assert t.should_trigger_merge() is False
            assert t.merge_parts_sync() is False
            assert t.perform_merge() is False

    def test_optimize_refuses_while_stopped(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            _insert_parts(t, 3)
            t.stop_merges()
            with pytest.raises(ValueError, match="merges are stopped"):
                t.optimize()
            with pytest.raises(ValueError, match="merges are stopped"):
                t.optimize(final=True)

    def test_start_resumes_and_drains_backlog(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            t.stop_merges()
            _insert_parts(t, 6)
            t.start_merges()
            assert t.should_trigger_merge() is True
            t.optimize()
            assert t.part_count() <= CFG["max_parts"]
            assert t.query_all().count() == 60

    def test_reads_and_inserts_unaffected(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            t.stop_merges()
            _insert_parts(t, 4)
            assert t.query_all().count() == 40
            assert t.query(5, 15).count() == 11

    def test_flag_does_not_survive_reopen(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            _insert_parts(t, 4)
            t.stop_merges()
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t2:
            assert t2.should_trigger_merge() is True  # in-memory flag only


PCFG = dict(memtable_flush_threshold=10**12, max_parts=10,
            key_col="key", ts_col="ts_us", partition_col="value")


class TestMovePartition:
    def test_move_partition_to(self, spark, tmp_path):
        src = SparkMergeTree(spark, str(tmp_path / "src"), schema=SCHEMA,
                             config=MergeTreeConfig(**PCFG))
        dst = SparkMergeTree(spark, str(tmp_path / "dst"), schema=SCHEMA,
                             config=MergeTreeConfig(**PCFG))
        with src, dst:
            src.insert_rows([(k, 1000 + k, float(k % 2)) for k in range(20)])
            src.flush()
            moved = src.move_partition_to(dst, 1.0)
            assert moved == 10
            assert src.partitions() == ["0.0"]
            assert src.query_all().count() == 10
            assert dst.query_all().count() == 10
            assert {r["key"] % 2 for r in dst.query_all().collect()} == {1}

    def test_move_missing_partition_is_zero(self, spark, tmp_path):
        src = SparkMergeTree(spark, str(tmp_path / "src"), schema=SCHEMA,
                             config=MergeTreeConfig(**PCFG))
        dst = SparkMergeTree(spark, str(tmp_path / "dst"), schema=SCHEMA,
                             config=MergeTreeConfig(**PCFG))
        with src, dst:
            src.insert_rows([(k, 1000 + k, 0.0) for k in range(5)])
            src.flush()
            assert src.move_partition_to(dst, 7.0) == 0
            assert src.query_all().count() == 5


class TestKillMutation:
    def _mutation_rows(self, t):
        return {r["mutation_id"]: r
                for r in t.system_mutations().collect()}

    def test_kill_pending_lw_delete_restores_rows(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            _insert_parts(t, 2)
            t.lightweight_delete("key < 5")
            assert t.query_all().count() == 15
            r = t.kill_mutation(1)
            assert r == {"mutation_id": 1, "parts_unmasked": 2}
            # mask cancelled before any rewrite: rows reappear
            assert t.query_all().count() == 20
            row = self._mutation_rows(t)[1]
            assert row["is_killed"] is True and row["is_done"] is False

    def test_killed_delete_survives_reopen(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            _insert_parts(t, 2)
            t.lightweight_delete("key < 5")
            t.kill_mutation(1)
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t2:
            assert t2.query_all().count() == 20

    def test_kill_does_not_undo_rewritten_parts(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            _insert_parts(t, 2)
            t.lightweight_delete("key < 5")
            t.materialize_deletes()  # physically applies the mask
            with pytest.raises(ValueError, match="already done"):
                t.kill_mutation(1)
            assert t.query_all().count() == 15

    def test_kill_refuses_synchronous_mutations(self, spark, base_path):
        from pyspark.sql import functions as F
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            _insert_parts(t, 2)
            t.delete_where(F.col("key") < 3)
            with pytest.raises(ValueError, match="synchronous"):
                t.kill_mutation(1)
            with pytest.raises(ValueError, match="unknown mutation"):
                t.kill_mutation(99)

    def test_kill_is_versioned_for_time_travel(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(
                                **{**CFG, "snapshot_retention": 10})) as t:
            _insert_parts(t, 2)
            t.lightweight_delete("key < 5")
            v_del = t.manifest.version
            t.kill_mutation(1)
            # snapshot at the delete still masks; current read does not
            assert t.query_at_version(v_del).count() == 15
            assert t.query_all().count() == 20


class TestModifySetting:
    def test_changes_behavior_and_persists(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            _insert_parts(t, 3)
            assert t.should_trigger_merge() is True  # max_parts=2
            t.modify_setting("max_parts", 10)
            assert t.should_trigger_merge() is False
        # reopen with the ORIGINAL config: the override must win
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t2:
            assert t2.config.max_parts == 10
            assert t2.should_trigger_merge() is False

    def test_refuses_unknown_and_structural(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            with pytest.raises(ValueError, match="not modifiable"):
                t.modify_setting("key_col", "other")
            with pytest.raises(ValueError, match="not modifiable"):
                t.modify_setting("no_such_setting", 1)

    def test_ddl_modify_setting(self, spark, base_path):
        from clickhouse_mergetree_spark.engine.ddl import execute_ddl
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            r = execute_ddl(t, "ALTER TABLE t MODIFY SETTING "
                               "max_parts = 7, parts_to_throw_insert = 50")
            assert r == {"max_parts": "7", "max_parts_to_throw": "50"}
            assert t.config.max_parts == 7
            assert t.config.max_parts_to_throw == 50


class TestOptimizePartition:
    def test_scoped_merge_leaves_other_partitions(self, spark, tmp_path):
        with SparkMergeTree(spark, str(tmp_path / "op"), schema=SCHEMA,
                            config=MergeTreeConfig(**PCFG)) as t:
            for _ in range(3):  # 3 parts per partition value
                t.insert_rows([(k, 1000 + k, float(k % 2))
                               for k in range(20)])
                t.flush()
            assert len(t.parts_in_partition(1.0)) == 3
            t.optimize(partition=1.0)
            assert len(t.parts_in_partition(1.0)) == 1
            assert len(t.parts_in_partition(0.0)) == 3  # untouched
            assert t.query_all().count() == 20  # dedup collapses replays

    def test_final_materializes_single_part_transforms(self, spark,
                                                       tmp_path):
        with SparkMergeTree(spark, str(tmp_path / "opf"), schema=SCHEMA,
                            config=MergeTreeConfig(**PCFG)) as t:
            t.insert_rows([(k, 1000 + k, float(k % 2)) for k in range(20)])
            t.flush()
            t.lightweight_delete("key < 4")
            t.optimize(final=True, partition=1.0)
            # partition 1.0's lone part rewrote: its mask is physical
            p1 = t.parts_in_partition(1.0)[0]
            masked = {pid for e in t._lw_entries() for pid in e["parts"]}
            assert p1.part_id not in masked
            # partition 0.0 still carries the mask (untouched)
            p0 = t.parts_in_partition(0.0)[0]
            assert p0.part_id in masked
            assert t.query_all().count() == 16

    def test_ddl_optimize_partition(self, spark, tmp_path):
        from clickhouse_mergetree_spark.engine.ddl import execute_ddl
        with SparkMergeTree(spark, str(tmp_path / "opd"), schema=SCHEMA,
                            config=MergeTreeConfig(**PCFG)) as t:
            for _ in range(2):
                t.insert_rows([(k, 1000 + k, float(k % 2))
                               for k in range(10)])
                t.flush()
            execute_ddl(t, "OPTIMIZE TABLE t PARTITION '0.0' FINAL")
            assert len(t.parts_in_partition(0.0)) == 1
            assert len(t.parts_in_partition(1.0)) == 2
            with pytest.raises(ValueError, match="not supported"):
                execute_ddl(t, "OPTIMIZE TABLE t PARTITION '0.0' "
                               "DEDUPLICATE")

    def test_requires_partitioning(self, spark, base_path):
        with SparkMergeTree(spark, base_path, schema=SCHEMA,
                            config=MergeTreeConfig(**CFG)) as t:
            _insert_parts(t, 2)
            with pytest.raises(ValueError, match="no partitioning"):
                t.optimize(partition="x")
