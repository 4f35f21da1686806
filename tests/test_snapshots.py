"""SnapshotTable semantics that the parity gate can't see: optimistic
conflicts, orphan invisibility, snapshot isolation, history."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

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
    assert orphans and all(o.startswith("data/c2-") for o in orphans)


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
    deleted = table.vacuum(retain_last=1, orphan_grace_seconds=0)
    assert table.versions() == [2]
    assert table.read().count() == 2            # head intact
    assert any(d.startswith("data/c1-") for d in deleted)   # old version gone
    assert any(d.startswith("data/c9-") for d in deleted)   # orphans gone
    assert table.orphan_files() == []
    with pytest.raises(NoSuchVersion):
        table.read(1)


def test_vacuum_grace_period_protects_inflight_staging(spark, table):
    """An unreferenced-but-young file is an in-flight writer's staged
    commit, not an orphan: default-grace vacuum must leave it (and its
    staging dir) alone so the writer's subsequent manifest publish
    stays valid; a zero-grace vacuum on a quiet table reclaims it."""
    table.create(spark.range(4).toDF("id"))
    table._write_commit_files(spark.range(9).toDF("id"), 7)  # staged, unpublished
    staged = [f for f in table.orphan_files() if f.startswith("data/c7-")]
    assert staged
    deleted = table.vacuum(retain_last=1)  # default grace: just-written files
    assert all(not d.startswith("data/c7-") for d in deleted)
    assert [f for f in table.orphan_files() if f.startswith("data/c7-")] == staged
    assert table.read().count() == 4
    deleted = table.vacuum(retain_last=1, orphan_grace_seconds=0)
    assert any(d.startswith("data/c7-") for d in deleted)
    assert table.orphan_files() == []


def test_vacuum_retain_all_keeps_time_travel(spark, table):
    table.create(spark.range(3).toDF("id"))
    table.append(spark.range(3, 5).toDF("id"))
    deleted = table.vacuum(retain_last=5)
    assert deleted == []
    assert table.versions() == [1, 2]
    assert table.read(1).count() == 3


def test_delete_where_rewrites_only_affected_files(spark, table):
    from pyspark.sql import functions as F

    # two commits -> head references files from both commit dirs
    table.create(spark.range(0, 50).toDF("id"))
    table.append(spark.range(100, 150).toDF("id"))
    v = table.delete_where(F.col("id") % 10 == 0)
    assert v == 3
    ids = sorted(r.id for r in table.read().collect())
    assert all(i % 10 != 0 for i in ids) and len(ids) == 90
    # time travel unaffected
    assert table.read(2).count() == 100


def test_delete_where_null_predicate_keeps_rows(spark, table):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "drop")], "id long, tag string"
    )
    table.create(df)
    table.delete_where(F.col("tag") == "drop")
    ids = sorted(r.id for r in table.read().collect())
    assert ids == [1, 2]  # NULL tag row survives, SQL DELETE semantics


def test_delete_where_untouched_files_not_rewritten(spark, table):
    from pyspark.sql import functions as F

    table.create(spark.range(0, 10).toDF("id"))
    table.append(spark.range(1000, 1010).toDF("id"))
    c1_files = [f for f in table._manifest(1)["files"]]
    table.delete_where(F.col("id") >= 1000)  # only commit-2 files hold hits
    after = set(table._manifest(3)["files"])
    # every commit-1 file is referenced verbatim — untouched data is
    # never rewritten or copied (empty commit-2 part files may also
    # survive verbatim: they hold no matching rows, which is correct)
    assert set(c1_files) <= after
    ids = sorted(r.id for r in table.read().collect())
    assert ids == list(range(10))


def test_wap_blocks_bad_batch_and_passes_good(spark, table):
    from csv2db_spark.operators.quality import in_range, not_null

    rules = [not_null("id"), in_range("id", 0, 100)]
    v, report = table.write_audit_publish(
        spark.range(0, 5).toDF("id"), rules, op="append"
    )
    assert v == 1 and report.where(~report.passed).count() == 0
    bad = spark.createDataFrame([(None,), (999,)], "id long")
    v2, report2 = table.write_audit_publish(bad, rules, op="append")
    assert v2 is None
    assert report2.where(~report2.passed).count() >= 1
    # nothing published: head unchanged, staged files are orphans
    assert table.current_version() == 1
    assert table.read().count() == 5
    assert table.orphan_files()


def test_merge_into_update_and_insert(spark, table):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, val double"
    )
    table.create(df)
    delta = spark.createDataFrame(
        [(2, 99.0), (4, 40.0)], "id long, val double"
    )
    v = table.merge_into(delta, on="id")
    assert v == 2
    rows = {r.id: r.val for r in table.read().collect()}
    assert rows == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}
    # pre-merge version intact
    assert {r.id: r.val for r in table.read(1).collect()} == {
        1: 10.0, 2: 20.0, 3: 30.0
    }


def test_merge_into_version_col_recency_conditioned(spark, table):
    """version_col makes the merge order-invariant: a STALE delta
    (lower version) must not clobber a fresher matched row, a NEWER one
    must, NULL target versions always lose, and inserts pass through.
    Applying two deltas in either order must land the same table."""
    base = spark.createDataFrame(
        [(1, 10.0, 5), (2, 20.0, 5), (3, 30.0, None)],
        "id long, val double, ver long",
    )
    fresh = spark.createDataFrame(
        [(1, 111.0, 9), (4, 40.0, 1)], "id long, val double, ver long"
    )
    stale = spark.createDataFrame(
        [(1, -1.0, 3), (2, -2.0, 2), (3, 33.0, 1)],
        "id long, val double, ver long",
    )
    table.create(base)
    table.merge_into(fresh, on="id", version_col="ver")
    table.merge_into(stale, on="id", version_col="ver")
    want = {1: (111.0, 9), 2: (20.0, 5), 3: (33.0, 1), 4: (40.0, 1)}
    assert {r.id: (r.val, r.ver) for r in table.read().collect()} == want
    # reversed application order -> identical end state
    import tempfile

    from csv2db_spark.snapshots import SnapshotTable

    t2 = SnapshotTable(spark, tempfile.mkdtemp(prefix="c2s_vmerge_"))
    t2.create(base)
    t2.merge_into(stale, on="id", version_col="ver")
    t2.merge_into(fresh, on="id", version_col="ver")
    assert {r.id: (r.val, r.ver) for r in t2.read().collect()} == want
    # version tie: the source row wins (deterministic, documented)
    tie = spark.createDataFrame([(2, 222.0, 5)], "id long, val double, ver long")
    table.merge_into(tie, on="id", version_col="ver")
    assert {r.id: r.val for r in table.read().collect()}[2] == 222.0


def test_merge_into_pure_insert_keeps_files_verbatim(spark, table):
    table.create(spark.range(0, 10).toDF("id").withColumn("v", F.lit(1.0)))
    before = set(table._manifest(1)["files"])
    delta = spark.createDataFrame([(100, 2.0)], "id long, v double")
    table.merge_into(delta, on="id")
    after = set(table._manifest(2)["files"])
    assert before <= after  # nothing matched -> no target file rewritten
    assert table.read().count() == 11


def test_merge_into_empty_table_creates(spark, table):
    v = table.merge_into(
        spark.createDataFrame([(1, 1.0)], "id long, v double"), on="id"
    )
    assert v == 1 and table.read().count() == 1


def test_compact_preserves_rows_and_shrinks_files(spark, table):
    table.create(spark.range(0, 100).repartition(8).toDF("id"))
    table.append(spark.range(100, 200).repartition(8).toDF("id"))
    n_before = len(table._manifest(2)["files"])
    v = table.compact(target_files=1)
    assert v == 3
    assert len(table._manifest(3)["files"]) < n_before
    assert sorted(r.id for r in table.read().collect()) == list(range(200))
    # history untouched
    assert table.read(1).count() == 100


@pytest.fixture()
def stable(spark, tmp_path):
    """Stats-tracked table over a range-partitioned layout: 4 files with
    disjoint id spans (0-24, 25-49, 50-74, 75-99)."""
    t = SnapshotTable(spark, str(tmp_path / "st"), stats_cols=["id"])
    t.create(spark.range(0, 100).toDF("id").repartitionByRange(4, "id"))
    return t


def test_stats_recorded_per_file(spark, stable):
    stats = stable._manifest(1)["stats"]
    files = stable._manifest(1)["files"]
    assert set(stats) == set(files)
    spans = sorted((s["id"][0], s["id"][1]) for s in stats.values())
    assert spans[0][0] == 0 and spans[-1][1] == 99
    assert all(s["id"][2] == 0 for s in stats.values())  # null counts


def test_read_where_opens_fewer_files(spark, stable):
    pruned = stable.read_where("id", 10, 20)
    assert len(pruned.inputFiles()) < len(stable.read().inputFiles())
    assert sorted(r.id for r in pruned.collect()) == list(range(10, 21))


def test_read_where_empty_selection_keeps_schema(spark, stable):
    out = stable.read_where("id", 1000, 2000)
    assert out.columns == ["id"] and out.count() == 0


def test_delete_range_metadata_only_for_interior_files(spark, stable):
    v1_files = set(stable._manifest(1)["files"])
    disjoint, full, overlap = stable._classify_range(1, "id", 25, 74)
    assert len(full) == 2 and len(disjoint) == 2 and not overlap
    v = stable.delete_range("id", 25, 74)
    m = stable._manifest(v)
    # nothing was rewritten: the new manifest is exactly the two
    # disjoint originals, referenced verbatim; interior files vanished
    # from metadata without ever being read
    assert set(m["files"]) == set(disjoint) <= v1_files
    assert m["op"] == "delete-range(meta:2,rewrite:0)"
    ids = sorted(r.id for r in stable.read().collect())
    assert ids == list(range(0, 25)) + list(range(75, 100))


def test_delete_range_rewrites_straddling_files(spark, stable):
    v = stable.delete_range("id", 10, 60)  # straddles files 1 and 3
    m = stable._manifest(v)
    assert "meta:1" in m["op"] and "rewrite:2" in m["op"]
    ids = sorted(r.id for r in stable.read().collect())
    assert ids == list(range(0, 10)) + list(range(61, 100))
    # stats maintained for the rewritten files too
    assert set(m["stats"]) == set(m["files"])


def test_delete_range_nulls_block_metadata_drop(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tn"), stats_cols=["v"])
    df = spark.createDataFrame([(1, 5.0), (2, None), (3, 6.0)], "id long, v double")
    t.create(df.coalesce(1))
    t.delete_range("v", 0.0, 100.0)  # whole span, but file holds a NULL
    rows = [(r.id, r.v) for r in t.read().collect()]
    assert rows == [(2, None)]  # NULL row survives, SQL DELETE semantics


def test_delete_range_without_stats_falls_back(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tf"))  # no stats_cols
    t.create(spark.range(0, 10).toDF("id"))
    t.delete_range("id", 3, 5)
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 6, 7, 8, 9]


def test_append_stream_batch_replay_skipped(spark, table):
    d1 = spark.range(0, 5).toDF("id")
    assert table.append_stream_batch(d1, 0) == 1
    assert table.append_stream_batch(spark.range(5, 8).toDF("id"), 1) == 2
    # at-least-once replay of batch 1: skipped, not double-appended
    assert table.append_stream_batch(spark.range(5, 8).toDF("id"), 1) is None
    assert table.read().count() == 8
    assert [h["op"] for h in table.history()] == [
        "stream-append:0",
        "stream-append:1",
    ]


def test_append_stream_batch_crash_before_publish_recovers(spark, table):
    table.append_stream_batch(spark.range(0, 3).toDF("id"), 0)
    # crash: batch 1's files staged, manifest never published
    table._write_commit_files(spark.range(10, 13).toDF("id"), 2)
    assert table.current_version() == 1  # orphans invisible
    # replay of batch 1 re-stages the same commit dir and publishes
    v = table.append_stream_batch(spark.range(10, 13).toDF("id"), 1)
    assert v == 2
    assert sorted(r.id for r in table.read().collect()) == [0, 1, 2, 10, 11, 12]


# ----------------------------------------------------- schema evolution


def test_append_with_new_column_null_fills_old_files(spark, table):
    table.create(spark.range(3).toDF("id"))
    table.append(
        spark.range(3, 5).toDF("id").withColumn("lang", F.lit("en"))
    )
    head = table.read().orderBy("id").collect()
    assert [r.asDict() for r in head] == [
        {"id": 0, "lang": None},
        {"id": 1, "lang": None},
        {"id": 2, "lang": None},
        {"id": 3, "lang": "en"},
        {"id": 4, "lang": "en"},
    ]
    # time travel keeps the pre-evolution schema
    assert table.read(1).columns == ["id"]


def test_append_missing_column_null_fills_new_rows(spark, table):
    table.create(
        spark.range(2).toDF("id").withColumn("lang", F.lit("en"))
    )
    table.append(spark.range(2, 4).toDF("id"))
    rows = table.read().orderBy("id").collect()
    assert [r["lang"] for r in rows] == ["en", "en", None, None]
    assert table.read().columns == ["id", "lang"]


def test_append_type_change_refused(spark, table):
    from csv2db_spark.snapshots import SchemaConflict

    table.create(spark.range(2).toDF("id"))
    with pytest.raises(SchemaConflict):
        table.append(
            spark.range(2, 3).toDF("id").select(F.col("id").cast("string"))
        )
    # the refused append left no new version behind
    assert table.versions() == [1]


def test_alter_add_column_is_metadata_only(spark, table):
    table.create(spark.range(3).toDF("id"))
    files_before = table._manifest(1)["files"]
    v = table.alter_add_column("score", "double")
    assert table._manifest(v)["files"] == files_before  # zero rewrite
    assert table.read().columns == ["id", "score"]
    assert [r["score"] for r in table.read().collect()] == [None] * 3
    # a later append can now supply real values
    table.append(
        spark.range(3, 4).toDF("id").withColumn("score", F.lit(1.5))
    )
    got = {r["id"]: r["score"] for r in table.read().collect()}
    assert got[3] == 1.5 and got[0] is None


def test_alter_drop_column_projects_away_and_time_travels(spark, table):
    table.create(
        spark.range(2).toDF("id").withColumn("tmp", F.lit("x"))
    )
    v = table.alter_drop_column("tmp")
    assert table.read().columns == ["id"]
    assert table._manifest(v)["files"] == table._manifest(1)["files"]
    assert table.read(1).columns == ["id", "tmp"]  # history owns its schema
    # rollback restores the column without touching data
    table.rollback(1)
    assert table.read().columns == ["id", "tmp"]


def test_delete_where_on_evolved_column(spark, table):
    table.create(spark.range(4).toDF("id"))
    table.append(
        spark.range(4, 8).toDF("id").withColumn("lang", F.lit("xx"))
    )
    # predicate on the evolved column must bind over pre-evolution files
    table.delete_where(F.col("lang") == "xx")
    assert sorted(r["id"] for r in table.read().collect()) == [0, 1, 2, 3]
    assert table.read().columns == ["id", "lang"]


def test_compact_materializes_evolved_schema(spark, table):
    table.create(spark.range(3).toDF("id"))
    table.alter_add_column("lang", "string")
    v = table.compact(1)
    rows = table.read(v).orderBy("id").collect()
    assert [r["lang"] for r in rows] == [None, None, None]
    assert table.read(v).columns == ["id", "lang"]


def test_merge_stream_batch_replay_skipped_and_bootstrap_marker(spark, table):
    src1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    assert table.merge_stream_batch(src1, 0, "k") == 1
    # bootstrap commit carries the marker: replaying batch 0 is a no-op
    assert table.merge_stream_batch(src1, 0, "k") is None
    src2 = spark.createDataFrame([(2, 99.0), (3, 30.0)], "k long, v double")
    assert table.merge_stream_batch(src2, 1, "k") == 2
    assert table.merge_stream_batch(src2, 1, "k") is None
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}
    assert table.versions() == [1, 2]  # replays created no phantom versions


def test_commit_with_retry_wins_after_race(spark, table):
    table.create(spark.range(3).toDF("id"))
    raced = {"done": False}

    def racing_append(t):
        # a rival publishes the next version the first time through,
        # AFTER we've planned: our O_EXCL publish must lose, and the
        # retry must land on the version after the rival's
        if not raced["done"]:
            raced["done"] = True
            rival_files = t._write_commit_files(
                spark.range(100, 103).toDF("id"), 99
            )
            head = t.current_version()
            t._publish(
                head + 1, "rival", t._manifest(head)["files"] + rival_files
            )
        return t.append(spark.range(10, 12).toDF("id"))

    v = table.commit_with_retry(racing_append)
    assert v == 3  # v2 = rival, v3 = our retried append
    assert table.read().count() == 3 + 3 + 2  # nothing lost on either side


def test_commit_with_retry_exhausts(spark, table):
    table.create(spark.range(1).toDF("id"))

    def always_loses(t):
        raise SnapshotConflict("synthetic")

    with pytest.raises(SnapshotConflict):
        table.commit_with_retry(always_loses, retries=3)


def test_read_as_of_resolution_and_bounds(spark, tmp_path):
    from csv2db_spark.snapshots import NoSuchVersion, SnapshotTable

    ticks = iter([10.0, 20.0, 30.0])
    t = SnapshotTable(spark, str(tmp_path / "t"), clock=lambda: next(ticks))
    t.create(spark.range(0, 3))
    t.append(spark.range(3, 6))
    t.overwrite(spark.range(100, 101))
    assert t.version_as_of(10.0) == 1      # boundary: <= is inclusive
    assert t.version_as_of(29.9) == 2
    assert t.version_as_of(1e9) == 3
    assert t.read_as_of(25.0).count() == 6
    assert [r.id for r in t.read_as_of(35.0).collect()] == [100]
    try:
        t.version_as_of(9.9)
    except NoSuchVersion:
        pass
    else:
        raise AssertionError("pre-history as-of must raise")


def test_read_as_of_legacy_manifest_without_timestamp(spark, tmp_path):
    """Manifests written before committed_at existed resolve as -inf
    (always visible) instead of crashing the reader."""
    import json

    from csv2db_spark.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"), clock=lambda: 50.0)
    t.create(spark.range(5))
    m = tmp_path / "t" / "_snapshots" / "v1.json"
    body = json.loads(m.read_text())
    del body["committed_at"]
    m.write_text(json.dumps(body))
    assert t.version_as_of(0.0) == 1
    assert t.read_as_of(0.0).count() == 5


# ------------------------------------------- round-7 hardening regressions


def test_racing_writers_never_share_a_staging_dir(spark, table):
    """Two writers both computing nxt = head + 1 must stage into
    DIFFERENT directories: with a version-keyed staging dir the second
    writer's write deletes the first's part files, so the O_EXCL publish
    winner can reference files the loser just destroyed — a permanently
    broken version."""
    table.create(spark.range(3).toDF("id"))
    # writer A stages its commit for v2 ...
    a_files = table._write_commit_files(spark.range(10, 14).toDF("id"), 2)
    # ... then writer B (same computed version) stages ITS commit for v2
    b_files = table._write_commit_files(spark.range(20, 22).toDF("id"), 2)
    assert set(a_files).isdisjoint(b_files)
    # A wins the publish; its version must be fully readable
    table._publish(2, "append", table._manifest(1)["files"] + a_files)
    assert sorted(r.id for r in table.read(2).collect()) == [
        0, 1, 2, 10, 11, 12, 13,
    ]
    # B loses cleanly; its staged files are invisible orphans
    with pytest.raises(SnapshotConflict):
        table._publish(2, "append", table._manifest(1)["files"] + b_files)
    assert set(table.orphan_files()) == set(b_files)


def test_vacuum_preserves_stream_batch_markers(spark, table):
    """A vacuum between a streaming sink write and a foreachBatch replay
    must not forget which batch ids were applied: markers from aged-out
    manifests fold into _snapshots/stream_markers.json and still block
    the replay (else the batch double-applies)."""
    table.append_stream_batch(spark.range(0, 3).toDF("id"), 0)
    table.append_stream_batch(spark.range(3, 5).toDF("id"), 1)
    table.overwrite(spark.range(100, 104).toDF("id"))
    table.vacuum(retain_last=1)  # both stream-append manifests age out
    assert table.versions() == [3]
    # replayed batches are STILL skipped after their manifests are gone
    assert table.append_stream_batch(spark.range(0, 3).toDF("id"), 0) is None
    assert table.append_stream_batch(spark.range(3, 5).toDF("id"), 1) is None
    assert table.read().count() == 4


def test_merge_stream_batch_marker_survives_vacuum(spark, table):
    src = spark.createDataFrame([(1, 10.0)], "k long, v double")
    table.merge_stream_batch(src, 0, "k")
    table.overwrite(spark.createDataFrame([(9, 9.0)], "k long, v double"))
    table.vacuum(retain_last=1)
    assert table.merge_stream_batch(src, 0, "k") is None  # replay blocked
    assert {r.k for r in table.read().collect()} == {9}


def test_delete_and_merge_on_percent_encoded_table_path(spark, tmp_path):
    """input_file_name() returns percent-encoded file: URIs; a table
    path with a space must still classify affected files correctly in
    delete_where / merge_into (else deletes silently survive and merges
    duplicate keys)."""
    t = SnapshotTable(spark, str(tmp_path / "dir with space" / "t"))
    t.create(
        spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "k long, v double"
        ).repartition(2)
    )
    t.delete_where(F.col("k") >= 6)
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 3, 4, 5]
    src = spark.createDataFrame([(0, 99.0), (50, 50.0)], "k long, v double")
    t.merge_into(src, "k")
    got = {r.k: r.v for r in t.read().collect()}
    assert got[0] == 99.0 and got[50] == 50.0 and len(got) == 7


def test_concurrent_appenders_lose_nothing(spark, tmp_path):
    """End-to-end multi-writer protocol: N threads race commit_with_retry
    appends against one table. Every row must survive (no writer may
    destroy another's staged files) and versions must be a clean
    1..N+1 chain."""
    import threading

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(spark.range(0, 10).toDF("id"))
    errors: list[Exception] = []

    def writer(lo: int) -> None:
        try:
            t.commit_with_retry(
                lambda tab: tab.append(
                    spark.range(lo, lo + 10).toDF("id")
                ),
                retries=16,
            )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=writer, args=(100 * (i + 1),))
        for i in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    assert t.versions() == [1, 2, 3, 4, 5]
    ids = sorted(r.id for r in t.read().collect())
    want = sorted(
        list(range(10))
        + [100 * (i + 1) + j for i in range(4) for j in range(10)]
    )
    assert ids == want  # nothing lost, nothing duplicated
