"""The REAL JDBC writer path, end-to-end against embedded Derby (the
derby jars ship inside pyspark's classpath, so no external database is
needed). Covers the reference's full table-mode matrix including the raw
DELETE FROM of delete-all (common/db.go:103-106) and the missing-table
ERROR cells (csv2db.go:151-156) that Spark's writer alone cannot express.

Derby notes: in-memory databases live for the JVM's lifetime — each test
uses its own database name, dropped in teardown; unquoted identifiers
uppercase on both Spark's generated SQL and our raw statements, so names
stay consistent."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow
from pyspark.sql import Row

from csv2db_spark.sink import MissingTableError, TableMode, write_jdbc


@pytest.fixture
def durl(spark, request):
    name = request.node.name.replace("[", "_").replace("]", "_")
    url = f"jdbc:derby:memory:{name};create=true"
    yield url
    try:
        spark._jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:memory:{name};drop=true"
        )
    except Exception:
        pass  # 08006 "database dropped" is Derby's success signal


@pytest.fixture
def df2(spark):
    return spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])


def read_jdbc(spark, url, table):
    return (
        spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
    )


def rows(spark, url, table):
    return sorted((r[0], r[1]) for r in read_jdbc(spark, url, table).collect())


@pytest.mark.parametrize("mode", ["as-is", "truncate", "delete-all"])
def test_missing_table_errors(spark, durl, df2, mode):
    with pytest.raises(MissingTableError):
        write_jdbc(df2, durl, "t", mode=mode)


def test_create_missing_creates_and_inserts(spark, durl, df2):
    write_jdbc(df2, durl, "t", mode=TableMode.CREATE)
    assert rows(spark, durl, "t") == [(1, "x"), (2, "y")]


def test_create_existing_appends(spark, durl, df2):
    write_jdbc(df2, durl, "t", mode=TableMode.CREATE)
    write_jdbc(df2, durl, "t", mode=TableMode.CREATE)
    assert rows(spark, durl, "t") == [(1, "x"), (1, "x"), (2, "y"), (2, "y")]


def test_as_is_appends_to_existing(spark, durl, df2):
    write_jdbc(df2, durl, "t", mode=TableMode.CREATE)
    write_jdbc(df2, durl, "t", mode=TableMode.AS_IS)
    assert len(rows(spark, durl, "t")) == 4


def test_delete_all_wipes_then_appends(spark, durl, df2):
    write_jdbc(df2, durl, "t", mode=TableMode.CREATE)
    new = spark.createDataFrame([Row(a=9, b="z")])
    write_jdbc(new, durl, "t", mode=TableMode.DELETE_ALL)
    assert rows(spark, durl, "t") == [(9, "z")]


def test_truncate_keeps_ddl_wipes_rows(spark, durl, df2):
    write_jdbc(df2, durl, "t", mode=TableMode.CREATE)
    new = spark.createDataFrame([Row(a=7, b="q")])
    write_jdbc(new, durl, "t", mode=TableMode.TRUNCATE)
    assert rows(spark, durl, "t") == [(7, "q")]


def test_drop_and_create_replaces(spark, durl, df2):
    write_jdbc(df2, durl, "t", mode=TableMode.CREATE)
    new = spark.createDataFrame([Row(a=5, b="n"), Row(a=6, b="m")])
    write_jdbc(new, durl, "t", mode=TableMode.DROP_AND_CREATE)
    assert rows(spark, durl, "t") == [(5, "n"), (6, "m")]


def test_drop_and_create_on_missing_creates(spark, durl, df2):
    write_jdbc(df2, durl, "t", mode=TableMode.DROP_AND_CREATE)
    assert len(rows(spark, durl, "t")) == 2


def test_atomic_single_partition(spark, durl, df2):
    write_jdbc(df2.repartition(4), durl, "t", mode=TableMode.CREATE, atomic=True)
    assert len(rows(spark, durl, "t")) == 2


def test_streaming_csv_to_jdbc(spark, durl, tmp_path):
    # the reference's whole identity, continuous: watch dir -> parse/
    # reconcile/cast -> real JDBC table, via foreachBatch
    from pyspark.sql import types as T

    from csv2db_spark.streaming.ops import stream_to_jdbc, streaming_ingest_csv

    target = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
        ]
    )
    watch = tmp_path / "incoming"
    watch.mkdir()
    (watch / "f1.csv").write_text("a,b\n1,x\n2,y\n")
    (watch / "f2.csv").write_text("a,b\n3,z\n")
    out = streaming_ingest_csv(spark, str(watch), target)
    stream_to_jdbc(out, durl, "t", mode="create")
    assert rows(spark, durl, "t") == [(1, "x"), (2, "y"), (3, "z")]


def test_streaming_restart_does_not_reapply_destructive_mode(spark, durl, tmp_path):
    # checkpointed restart: batches resumed after a restart carry ids > 0,
    # so the destructive first-batch mode must NOT wipe rows committed
    # before the restart
    from pyspark.sql import types as T

    from csv2db_spark.streaming.ops import stream_to_jdbc, streaming_ingest_csv

    target = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
        ]
    )
    watch = tmp_path / "incoming"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (watch / "f1.csv").write_text("a,b\n1,x\n2,y\n")
    out = streaming_ingest_csv(spark, str(watch), target)
    stream_to_jdbc(out, durl, "t", mode="drop-and-create", checkpoint=ckpt)
    assert rows(spark, durl, "t") == [(1, "x"), (2, "y")]

    (watch / "f2.csv").write_text("a,b\n3,z\n")
    out = streaming_ingest_csv(spark, str(watch), target)
    stream_to_jdbc(out, durl, "t", mode="drop-and-create", checkpoint=ckpt)
    # a process-local "first batch" flag would have dropped and recreated
    # the table here, leaving only (3, z)
    assert rows(spark, durl, "t") == [(1, "x"), (2, "y"), (3, "z")]


def test_exists_probe_distinguishes_missing_from_other_errors(spark, durl, df2):
    from csv2db_spark.sink import _jdbc_table_exists

    write_jdbc(df2, durl, "t", mode=TableMode.CREATE)
    assert _jdbc_table_exists(spark, durl, "t", None, None) is True
    # missing relation -> clean False (Derby SQLState 42X05)
    assert _jdbc_table_exists(spark, durl, "no_such_table", None, None) is False
    # a NON-missing failure (syntax error, SQLState 42X01) must propagate,
    # not masquerade as "table missing" and route into a create path
    with pytest.raises(Exception):
        _jdbc_table_exists(spark, durl, "t WHERE (", None, None)


def test_ddl_types_reach_derby(spark, durl, df2):
    # the derby registry swaps TEXT (unsupported) for VARCHAR(32672)
    write_jdbc(df2, durl, "t", mode=TableMode.CREATE)
    schema = {
        f.name.lower(): f.dataType.simpleString()
        for f in read_jdbc(spark, durl, "t").schema
    }
    assert schema["a"] == "bigint"
    assert schema["b"].startswith("string")


def test_jdbc_matrix_script_wiring(spark):
    """scripts/jdbc_matrix.py — the one-command escape hatch for
    validating the PG/MySQL dialect registry entries against a real
    server — must stay runnable; prove the wiring against Derby."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [
            _sys.executable,
            str(root / "scripts" / "jdbc_matrix.py"),
            "--url",
            "jdbc:derby:memory:c2s_mx_wiring;create=true",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(root),
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    import re as _re

    m = _re.search(r"(\d+)/(\d+) cells pass", out.stdout)
    assert m and m.group(1) == m.group(2), out.stdout[-2000:]


def test_partitioned_read_same_rows_more_partitions(spark, durl):
    from csv2db_spark.sources import read_jdbc_table

    df = spark.range(0, 100).selectExpr("id AS a", "CAST(id AS STRING) AS b")
    write_jdbc(df, durl, "T_PART", TableMode.CREATE)
    plain = read_jdbc_table(spark, durl, "T_PART")
    striped = read_jdbc_table(
        spark, durl, "T_PART", partition_col="a", num_partitions=4
    )
    assert striped.rdd.getNumPartitions() == 4  # 4 concurrent range scans
    assert sorted(r["a"] for r in striped.collect()) == sorted(
        r["a"] for r in plain.collect()
    )


def test_partitioned_read_explicit_bounds_loses_nothing(spark, durl):
    from csv2db_spark.sources import read_jdbc_table

    df = spark.range(0, 50).selectExpr("id AS a", "CAST(id AS STRING) AS b")
    write_jdbc(df, durl, "T_BOUNDS", TableMode.CREATE)
    # stale bounds covering only [10, 20): outer stripes are unbounded,
    # so every row still arrives exactly once
    striped = read_jdbc_table(
        spark, durl, "T_BOUNDS", partition_col="a",
        num_partitions=3, bounds=(10, 20),
    )
    assert sorted(r["a"] for r in striped.collect()) == list(range(50))


def test_partitioned_read_empty_table(spark, durl):
    from csv2db_spark.sources import read_jdbc_table

    df = spark.createDataFrame([], "a long, b string")
    write_jdbc(df, durl, "T_EMPTY", TableMode.CREATE)
    out = read_jdbc_table(spark, durl, "T_EMPTY", partition_col="a")
    assert out.count() == 0


def test_jdbc_identifier_injection_refused(spark, durl):
    """Table/column names reach pushed-down SQL by interpolation; a
    crafted value must be refused BEFORE any connection is made."""
    import pytest

    from csv2db_spark.sources import read_jdbc_table
    from csv2db_spark.sources.jdbc import _check_identifier

    for bad in (
        "t; DROP TABLE x--",
        "t) UNION SELECT password FROM users --",
        't" FROM x; --',
        "a.b.c.d",
        "",
    ):
        with pytest.raises(ValueError, match="unsafe"):
            read_jdbc_table(spark, durl, bad)
        with pytest.raises(ValueError, match="unsafe"):
            read_jdbc_table(spark, durl, "T_PART", partition_col=bad)
    # legitimate spellings all pass: bare, qualified, pre-quoted
    for ok in ("t1", "app.t1", '"Weird Name"', "`back tick`", '"S"."T"'):
        assert _check_identifier(ok, "table name") == ok
