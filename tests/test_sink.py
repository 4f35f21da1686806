"""Table-mode matrix tests (reference P9-P12, P20, P24) against the
parquet-backed store, plus the batchsize heuristic."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from csv2db_spark.sink import (
    MissingTableError,
    ParquetTableStore,
    TableMode,
    create_table_column_types,
    default_batchsize,
    write_noop,
)


@pytest.fixture
def store(spark, tmp_path):
    return ParquetTableStore(spark, str(tmp_path / "db"))


@pytest.fixture
def df2(spark):
    return spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])


def test_missing_table_as_is_errors(store, df2):
    # manual case 1: missing table + as-is → hard failure
    with pytest.raises(MissingTableError):
        store.write(df2, "t", TableMode.AS_IS)


def test_missing_table_truncate_and_delete_all_error(store, df2):
    for m in (TableMode.TRUNCATE, TableMode.DELETE_ALL):
        with pytest.raises(MissingTableError):
            store.write(df2, "t", m)


def test_create_then_append(store, df2):
    store.write(df2, "t", TableMode.CREATE)
    assert store.read("t").count() == 2
    store.write(df2, "t", TableMode.CREATE)  # exists → append
    assert store.read("t").count() == 4


def test_drop_and_create(store, df2):
    store.write(df2, "t", TableMode.CREATE)
    store.write(df2, "t", TableMode.DROP_AND_CREATE)
    assert store.read("t").count() == 2


def test_truncate_keeps_schema(store, df2):
    store.write(df2, "t", TableMode.CREATE)
    before = store.schema("t")
    store.write(df2, "t", TableMode.TRUNCATE)
    assert store.read("t").count() == 2
    assert store.schema("t") == before


def test_delete_all_then_append(store, df2):
    store.write(df2, "t", TableMode.CREATE)
    store.write(df2, "t", TableMode.DELETE_ALL)
    assert store.read("t").count() == 2


def test_as_is_appends(store, df2):
    store.write(df2, "t", TableMode.CREATE)
    store.write(df2, "t", TableMode.AS_IS)
    assert store.read("t").count() == 4


def test_batchsize_heuristic():
    # 1000/ncols with MySQL's guard (reference: _mysql/mysql.go:143-148)
    assert default_batchsize(10) == 100
    assert default_batchsize(1) == 1000
    assert default_batchsize(3000) == 1
    assert default_batchsize(0) == 1000  # guard the PG div-by-zero bug away


def test_create_table_column_types(df2):
    assert create_table_column_types(df2.schema) == "a BIGINT, b TEXT"


def test_create_table_column_types_derby_dialect(df2):
    # Derby has no TEXT; its registry substitutes VARCHAR
    assert create_table_column_types(df2.schema, "derby") == (
        "a BIGINT, b VARCHAR(32672)"
    )


def test_create_table_column_types_pg_mysql_dialects():
    # the reference's PRIMARY DDL type per kind, per dialect
    # (_postgres/postgres.go:26-34, _mysql/mysql.go:35-43)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("i8", T.LongType(), True),
            T.StructField("i4", T.IntegerType(), True),
            T.StructField("i2", T.ShortType(), True),
            T.StructField("i1", T.ByteType(), True),
            T.StructField("f8", T.DoubleType(), True),
            T.StructField("f4", T.FloatType(), True),
            T.StructField("s", T.StringType(), True),
        ]
    )
    assert create_table_column_types(schema, "postgresql") == (
        "i8 BIGINT, i4 INTEGER, i2 SMALLINT, i1 SMALLINT, "
        "f8 DOUBLE PRECISION, f4 REAL, s CHARACTER VARYING"
    )
    assert create_table_column_types(schema, "mysql") == (
        "i8 BIGINT, i4 INT, i2 SMALLINT, i1 TINYINT, "
        "f8 DOUBLE, f4 FLOAT, s TEXT"
    )


def test_mysql_bool_unregistered_warns_like_reference():
    # the reference registers no bool kind for MySQL: generated DDL for a
    # bool column falls back (with a warning) instead of claiming a type
    import warnings

    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("ok", T.BooleanType(), True)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ddl = create_table_column_types(schema, "mysql")
    assert ddl == ""
    assert any("ok" in str(x.message) for x in w)
    # ...while Postgres maps it (reference registers Bool -> bool)
    assert create_table_column_types(schema, "postgresql") == "ok BOOL"


def test_unregistered_type_warns(spark):
    # reference warns on unmapped types (_postgres/postgres.go:104-108)
    # rather than silently skipping
    import warnings

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ddl = create_table_column_types(schema)
    assert ddl == "a BIGINT"
    assert any("ts" in str(x.message) for x in w)


def test_noop_sink(df2):
    write_noop(df2)  # executes the plan, discards rows, must not raise


def test_write_sorted_parquet_rowgroup_ranges(spark, tmp_path):
    import pyarrow.parquet as pq
    from csv2db_spark.sink import write_sorted_parquet

    df = spark.range(0, 20000).selectExpr(
        "id", "cast(id * 37 % 20000 as long) as k"
    )
    out = str(tmp_path / "sorted")
    write_sorted_parquet(df, out, ["k"], target_files=4)
    files = sorted((tmp_path / "sorted").glob("*.parquet"))
    assert len(files) == 4
    # per-file k ranges must be disjoint (range partitioning) and rows
    # sorted within each file (row-group stats nest inside file range)
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert t == sorted(t)
        ranges.append((t[0], t[-1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_compact_parquet_reduces_files_keeps_rows(spark, tmp_path):
    from csv2db_spark.sink import compact_parquet

    src = str(tmp_path / "frag")
    spark.range(0, 50000).repartition(64).write.parquet(src)
    n_before = len(list((tmp_path / "frag").glob("*.parquet")))
    assert n_before >= 32
    n_after = compact_parquet(spark, src, target_mb=128)
    assert n_after < n_before
    assert spark.read.parquet(src).count() == 50000


def test_compact_parquet_with_sort(spark, tmp_path):
    import pyarrow.parquet as pq
    from csv2db_spark.sink import compact_parquet

    src = str(tmp_path / "frag2")
    spark.range(0, 10000).selectExpr("cast(id * 13 % 10000 as long) as k").repartition(
        16
    ).write.parquet(src)
    compact_parquet(spark, src, target_mb=128, sort_cols=["k"])
    for f in (tmp_path / "frag2").glob("*.parquet"):
        t = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert t == sorted(t)


def test_compact_parquet_rejects_partitioned_dir(spark, tmp_path):
    from csv2db_spark.sink import compact_parquet

    src = str(tmp_path / "parted")
    spark.range(100).selectExpr("id", "id % 3 as p").write.partitionBy(
        "p"
    ).parquet(src)
    try:
        compact_parquet(spark, src)
    except ValueError:
        pass
    else:
        raise AssertionError("partitioned dir must be rejected, not flattened")


def test_compact_parquet_recovers_stranded_old_dir(spark, tmp_path):
    # a crash between the two swap renames leaves the data under
    # path._old and no path; the next call must restore it, not fail
    # or lose rows
    import os

    from csv2db_spark.sink import compact_parquet

    path = str(tmp_path / "t")
    spark.range(1000).repartition(8).write.parquet(path)
    want = 1000
    os.rename(path, path + "._old")  # simulate the mid-swap crash
    compact_parquet(spark, path, target_mb=128)
    assert spark.read.parquet(path).count() == want
    assert not os.path.isdir(path + "._old")
