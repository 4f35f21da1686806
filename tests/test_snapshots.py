"""SnapshotTable semantics that the parity gate can't see: optimistic
conflicts, orphan invisibility, snapshot isolation, history."""

from __future__ import annotations

import os

import pytest

from csv2db_spark.snapshots import NoSuchVersion, SnapshotConflict, SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "t"))


def test_versions_and_history(spark, table):
    table.create(spark.range(5).toDF("id"))
    table.append(spark.range(5, 8).toDF("id"))
    table.overwrite(spark.range(100, 102).toDF("id"))
    assert table.versions() == [1, 2, 3]
    assert [h["op"] for h in table.history()] == ["create", "append", "overwrite"]
    assert table.read(1).count() == 5
    assert table.read(2).count() == 8
    assert table.read(3).count() == 2
    assert table.read().count() == 2  # head


def test_conflict_is_loud_not_lost(spark, table):
    table.create(spark.range(3).toDF("id"))
    # a racing writer publishing the same next version must fail cleanly
    files = table._write_commit_files(spark.range(3, 6).toDF("id"), 2)
    table._publish(2, "append", table._manifest(1)["files"] + files)
    with pytest.raises(SnapshotConflict):
        table._publish(2, "append", files)
    # the winner's manifest is intact
    assert table.read(2).count() == 6


def test_orphans_invisible_and_reported(spark, table):
    table.create(spark.range(4).toDF("id"))
    # simulate a crash: data files written, manifest never published
    table._write_commit_files(spark.range(4, 9).toDF("id"), 2)
    assert table.current_version() == 1
    assert table.read().count() == 4  # reader never sees the orphans
    orphans = table.orphan_files()
    assert orphans and all(o.startswith("data/c2/") for o in orphans)


def test_snapshot_isolation_under_concurrent_commit(spark, table):
    table.create(spark.range(10).toDF("id"))
    old = table.read(1)  # plan pinned to v1's manifest
    table.overwrite(spark.range(1000, 1001).toDF("id"))
    # the pre-commit reader still sees v1 exactly
    assert old.count() == 10
    assert table.read().count() == 1


def test_read_missing_version_raises(spark, table):
    with pytest.raises(NoSuchVersion):
        table.read()
    table.create(spark.range(1).toDF("id"))
    with pytest.raises(NoSuchVersion):
        table.read(7)


def test_incremental_read_is_the_appended_delta(spark, table):
    table.create(spark.range(5).toDF("id"))
    table.append(spark.range(5, 9).toDF("id"))
    inc = table.incremental_read(1, 2)
    assert sorted(r.id for r in inc.collect()) == [5, 6, 7, 8]
    # no change -> empty frame, schema preserved
    assert table.incremental_read(2, 2).count() == 0
    assert table.incremental_read(2, 2).schema == table.read(2).schema


def test_removed_files_after_overwrite(spark, table):
    table.create(spark.range(3).toDF("id"))
    table.overwrite(spark.range(100, 102).toDF("id"))
    assert table.removed_files(1, 2) == table._manifest(1)["files"]
    assert set(table.added_files(1, 2)) == set(table._manifest(2)["files"])


def test_rollback_is_a_forward_commit(spark, table):
    table.create(spark.range(6).toDF("id"))
    table.overwrite(spark.range(1000, 1001).toDF("id"))
    v = table.rollback(1)
    assert v == 3
    assert table.read().count() == 6          # head is v1's content again
    assert table.read(2).count() == 1         # history intact
    assert table.history()[-1]["op"] == "rollback:1"


def test_vacuum_retains_head_and_reclaims(spark, table):
    table.create(spark.range(4).toDF("id"))
    table.overwrite(spark.range(10, 12).toDF("id"))
    table._write_commit_files(spark.range(99).toDF("id"), 9)  # orphans
    deleted = table.vacuum(retain_last=1)
    assert table.versions() == [2]
    assert table.read().count() == 2            # head intact
    assert any(d.startswith("data/c1/") for d in deleted)   # old version gone
    assert any(d.startswith("data/c9/") for d in deleted)   # orphans gone
    assert table.orphan_files() == []
    with pytest.raises(NoSuchVersion):
        table.read(1)


def test_vacuum_retain_all_keeps_time_travel(spark, table):
    table.create(spark.range(3).toDF("id"))
    table.append(spark.range(3, 5).toDF("id"))
    deleted = table.vacuum(retain_last=5)
    assert deleted == []
    assert table.versions() == [1, 2]
    assert table.read(1).count() == 3
