"""Partition pruning and salted-join physical checks: the gate queries
prove values; these tests prove the PLAN does what PLANS.md claims."""

from __future__ import annotations

import pyspark.sql.functions as F

from csv2db_spark.operators.skew import salted_join
from csv2db_spark.queries.sources_q import q_sink_partitioned_pruning
from csv2db_spark.sources import load_table


def test_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_part")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # pruned scan must read fewer files than the full table
    full = spark.read.parquet(path)
    assert back.count() < full.count()
    assert back.count() == src.where(F.col("o_orderstatus") == "F").count()


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    plain = li.join(sup, "l_suppkey").groupBy("s_nationkey").count()
    salted = (
        salted_join(li, sup, on="l_suppkey", salt=8)
        .groupBy("s_nationkey")
        .count()
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    # two independent uniform columns: an x-sorted layout gives disjoint
    # x-spans but every file spans y's full domain; the z-ordered layout
    # must bound BOTH so a selective predicate on either column prunes
    # files via the min/max manifest
    from csv2db_spark.sink import write_sorted_parquet, write_zorder_parquet
    from csv2db_spark.sources.skipping import build_minmax_manifest, read_pruned

    import pyspark.sql.functions as F

    df = spark.range(40000).select(
        (F.col("id") * 7919 % 40000).cast("double").alias("x"),
        (F.col("id") * 104729 % 40000).cast("double").alias("y"),
    )
    sorted_dir = str(tmp_path / "xsorted")
    z_dir = str(tmp_path / "zorder")
    write_sorted_parquet(df, sorted_dir, ["x"], target_files=16)
    write_zorder_parquet(df, z_dir, "x", "y", target_files=16)

    def y_span_frac(path):
        m = build_minmax_manifest(spark, path, ["y"]).collect()
        return sum((r["y_max"] - r["y_min"]) / 40000.0 for r in m) / len(m)

    # x-sorted: every file covers ~all of y; z-order: a fraction of it
    assert y_span_frac(sorted_dir) > 0.9
    assert y_span_frac(z_dir) < 0.6

    # a selective y-band read over the z layout opens fewer files AND
    # returns exactly the same rows as the raw filter
    mz = build_minmax_manifest(spark, z_dir, ["y"])
    pruned = read_pruned(spark, mz, "y", 1000.0, 3000.0)
    survivors = {
        r["_file"]
        for r in mz.where(
            (F.col("y_max") >= 1000.0) & (F.col("y_min") <= 3000.0)
        ).collect()
    }
    assert len(survivors) < 16  # genuinely pruned
    want = df.where((F.col("y") >= 1000.0) & (F.col("y") <= 3000.0)).count()
    assert pruned.count() == want

    # and the x dimension still prunes too (the whole point of z-order)
    mx = build_minmax_manifest(spark, z_dir, ["x"])
    x_survivors = mx.where(
        (F.col("x_max") >= 1000.0) & (F.col("x_min") <= 3000.0)
    ).count()
    assert x_survivors < 16


def test_bloom_manifest_prunes_point_lookups(spark, tmp_path):
    # unsorted layout: min/max spans the whole domain (prunes nothing),
    # the bloom manifest must cut a point lookup to ~1 file and return
    # exactly the filter's rows
    import pyspark.sql.functions as F

    from csv2db_spark.sources.skipping import (
        build_bloom_manifest,
        build_minmax_manifest,
        read_bloom_pruned,
    )

    df = spark.range(100000).select(
        (F.col("id") * 2654435761 % 100000).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    path = str(tmp_path / "unsorted")
    df.repartition(16).write.parquet(path)  # hash-spread: no clustering

    # the min/max manifest is useless here — every file spans ~the domain
    mm = build_minmax_manifest(spark, path, ["k"])
    wide = mm.where(
        (F.col("k_max") >= 12345) & (F.col("k_min") <= 12345)
    ).count()
    assert wide == 16

    bloom = build_bloom_manifest(spark, path, "k", log2m=20)
    pruned = read_bloom_pruned(spark, bloom, "k", 12345, log2m=20)
    want = df.where(F.col("k") == 12345).collect()
    got = pruned.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # the lookup genuinely pruned: the surviving file set is small
    survivors = pruned.select(F.input_file_name()).distinct().count()
    assert survivors <= 3

    # missing key: empty result, correct schema
    miss = read_bloom_pruned(spark, bloom, "k", 123456789, log2m=20)
    assert miss.count() == 0
    assert miss.columns == ["k", "v"]


def test_targeted_delete_rewrites_only_affected_files(spark, sf_dir, tmp_path):
    from csv2db_spark.sink import targeted_delete
    from csv2db_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "tdel")
    docs.repartition(16, "doc_id").write.mode("overwrite").parquet(path)
    import pathlib

    before = {
        f.name: f.stat().st_size for f in pathlib.Path(path).glob("*.parquet")
    }
    keys = [int(r.doc_id) for r in docs.limit(3).collect()]
    stats = targeted_delete(spark, path, "doc_id", keys)
    after = {
        f.name: f.stat().st_size for f in pathlib.Path(path).glob("*.parquet")
    }
    # surgical: untouched files survive byte-identical (same name+size)
    untouched = set(before) & set(after)
    assert len(untouched) == stats["files_total"] - stats["files_rewritten"]
    for name in untouched:
        assert before[name] == after[name]
    assert stats["files_rewritten"] < stats["files_total"]
    assert stats["rows_deleted"] == len(keys)
    # no doomed row survives; no innocent row lost
    remaining = spark.read.parquet(path)
    assert remaining.where(F.col("doc_id").isin(keys)).count() == 0
    assert remaining.count() == docs.count() - len(keys)
    # idempotent: deleting the same keys again rewrites the (bloom-hit)
    # files but removes nothing
    stats2 = targeted_delete(spark, path, "doc_id", keys)
    assert stats2["rows_deleted"] == 0
    assert spark.read.parquet(path).count() == docs.count() - len(keys)


def test_zstd_option_reaches_the_writer(spark, sf_dir, tmp_path):
    from csv2db_spark.sources import load_table

    path = str(tmp_path / "zstd")
    load_table(spark, sf_dir, "orders").write.option(
        "compression", "zstd"
    ).parquet(path)
    import pathlib

    files = list(pathlib.Path(path).glob("*.parquet"))
    assert files and all(f.name.endswith(".zstd.parquet") for f in files)


def test_partition_append_never_rewrites_existing(spark, sf_dir, tmp_path):
    import pathlib

    from csv2db_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "papp")
    orders.where("o_orderstatus != 'O'").write.partitionBy(
        "o_orderstatus"
    ).parquet(path)
    before = {
        str(f): f.stat().st_mtime_ns
        for f in pathlib.Path(path).rglob("*.parquet")
    }
    orders.where("o_orderstatus = 'O'").write.mode("append").partitionBy(
        "o_orderstatus"
    ).parquet(path)
    after = {
        str(f): f.stat().st_mtime_ns
        for f in pathlib.Path(path).rglob("*.parquet")
    }
    # every pre-existing file untouched; only the new partition appeared
    for f, m in before.items():
        assert after[f] == m
    new = set(after) - set(before)
    assert new and all("o_orderstatus=O" in f for f in new)


def test_salted_join_rejects_small_side_duplicating_how(spark, sf_dir):
    """Right/full outer would replicate each unmatched small-side row
    once per salt value — the operator must refuse, not silently
    diverge from the unsalted join (round-5 advice)."""
    import pytest

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(li, sup, on="l_suppkey", salt=4, how=how)
    # the preserved-big-side types still work
    assert salted_join(li, sup, on="l_suppkey", salt=4, how="left_semi").count() > 0


def test_targeted_delete_crash_mid_swap_recovers_exactly(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash AFTER the staged replacements moved into the table dir but
    BEFORE backup cleanup: recovery must remove the manifest-listed
    staged parts before restoring backups, else the kept rows of every
    rewritten file exist twice (round-5 advice, medium)."""
    import pathlib
    import shutil

    from csv2db_spark.sink import targeted_delete
    from csv2db_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "tdel_crash")
    docs.repartition(8, "doc_id").write.mode("overwrite").parquet(path)
    n0 = docs.count()
    keys = [int(r.doc_id) for r in docs.limit(3).collect()]

    # simulate the crash: suppress BOTH cleanup rmtrees of the first
    # call, leaving the backup dir (with manifest) AND the staged
    # replacements already swapped into the table dir
    real_rmtree = shutil.rmtree
    monkeypatch.setattr(shutil, "rmtree", lambda *a, **k: None)
    stats1 = targeted_delete(spark, path, "doc_id", keys)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    assert stats1["rows_deleted"] == len(keys)
    bak = pathlib.Path(path + "._delete_bak")
    assert bak.is_dir() and (bak / "_staged_manifest.txt").exists()

    # next call recovers (staged parts removed, backups restored) and
    # re-deletes — totals exact, no duplicated kept rows
    stats2 = targeted_delete(spark, path, "doc_id", keys)
    assert stats2["rows_deleted"] == len(keys)
    assert not bak.exists()
    remaining = spark.read.parquet(path)
    assert remaining.count() == n0 - len(keys)
    assert remaining.where(F.col("doc_id").isin(keys)).count() == 0
    # and every surviving doc_id appears exactly once
    dupes = (
        remaining.groupBy("doc_id").count().where(F.col("count") > 1).count()
    )
    assert dupes == 0
