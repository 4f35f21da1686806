"""Ported manual test corpus (reference sample/manual_test_cases.md →
SURVEY.md §2.3) plus cast-semantics unit tests.

The reference's golden outputs are reproduced as in-memory assertions on
the reconciled/cast DataFrame; the JDBC sink is replaced by collect()
(tests/test_sink.py covers the table-mode matrix against a local store).
"""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException
from pyspark.sql import types as T

from csv2db_spark.ingest import (
    cast_to_schema,
    ingest_csv,
    ingest_csv_buffer,
    read_csv,
    read_csv_buffer,
    reconcile_by_index,
    reconcile_by_name,
)

# FIXTURES.md A4: canonical existing-table schema (jsonb/date degrade to
# string per _postgres/postgres.go:26-34)
TARGET = T.StructType(
    [
        T.StructField("a", T.LongType(), True),
        T.StructField("b", T.IntegerType(), False),
        T.StructField("c", T.StringType(), True),
        T.StructField("d", T.StringType(), True),
        T.StructField("e", T.StringType(), True),
    ]
)

NO_HEADER = "1,2,qqq,{},2017-01-01\n,4,,,"
HEADER = "a,b,c,d,e\n" + NO_HEADER
HEADER_SHORT = "a,c,d,e\n1,qqq,{},2017-01-01\n,,,"
HEADER_SCRAMBLED = "e,c,a,b,d\n2017-01-01,qqq,1,2,{}\n,,,4,"


@pytest.fixture
def csv_file(tmp_path):
    def write(content: str, name: str = "in.csv") -> str:
        p = tmp_path / name
        p.write_text(content)
        return str(p)

    return write


def test_headerless_synthesized_names(spark, csv_file):
    # manual case 2: headerless create → col0..colN (common/schema.go:157-169)
    df = read_csv(spark, csv_file(NO_HEADER), has_header=False)
    assert df.columns == ["col0", "col1", "col2", "col3", "col4"]
    rows = df.collect()
    assert rows[0].col0 == "1" and rows[0].col3 == "{}"
    assert rows[1].col0 == "" and rows[1].col1 == "4"


def test_header_names(spark, csv_file):
    df = read_csv(spark, csv_file(HEADER))
    assert df.columns == ["a", "b", "c", "d", "e"]


def test_typed_cast_and_empty_null(spark, csv_file):
    # manual cases 3/8: '1'→bigint, '{}' and date ride through as strings,
    # ""→NULL for nullable targets
    df = ingest_csv(spark, csv_file(HEADER), TARGET)
    # types match the target; nullability of computed columns is always
    # True in Spark — NOT NULL is enforced at runtime (test below)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in TARGET.fields
    ]
    r1, r2 = df.collect()
    assert r1.a == 1 and r1.b == 2 and r1.c == "qqq" and r1.d == "{}"
    assert r1.e == "2017-01-01"
    assert r2.a is None and r2.b == 4 and r2.c is None  # "" → NULL (nullable)


def test_not_null_empty_aborts(spark, csv_file):
    # manual case 3: NOT NULL b + empty value → abort the whole load
    bad = "a,b,c,d,e\n1,,x,y,z"
    df = ingest_csv(spark, csv_file(bad), TARGET)
    with pytest.raises(SparkRuntimeException, match="cannot cast"):
        df.collect()


def test_wider_table_null_fill(spark, csv_file):
    # manual case 4: target has column f that the CSV lacks → NULL
    wider = T.StructType(TARGET.fields + [T.StructField("f", T.StringType(), True)])
    df = ingest_csv(spark, csv_file(HEADER), wider)
    assert df.columns == ["a", "b", "c", "d", "e", "f"]
    assert all(r.f is None for r in df.collect())


def test_narrower_table_drops_extra(spark, csv_file):
    # manual case 5: CSV wider than target → extra columns silently dropped
    narrower = T.StructType(TARGET.fields[:3])
    df = ingest_csv(spark, csv_file(HEADER), narrower)
    assert df.columns == ["a", "b", "c"]
    assert df.count() == 2


def test_by_name_reorder(spark, csv_file):
    # manual case 6: header order differs from table order → match by name
    df = ingest_csv(spark, csv_file(HEADER_SCRAMBLED), TARGET)
    r1, r2 = df.collect()
    assert (r1.a, r1.b, r1.c, r1.d, r1.e) == (1, 2, "qqq", "{}", "2017-01-01")
    assert r2.b == 4 and r2.a is None


def test_header_subset_null_fill(spark, csv_file):
    # manual_test_cases.md:207-228: CSV missing column b → NULL (target b
    # nullable in that scenario; a NOT NULL b would abort — next test)
    nullable_b = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in TARGET.fields]
    )
    df = ingest_csv(spark, csv_file(HEADER_SHORT), nullable_b)
    r1, r2 = df.collect()
    assert r1.a == 1 and r1.b is None and r1.c == "qqq"
    assert r2.a is None


def test_header_subset_not_null_aborts(spark, csv_file):
    # missing CSV column for a NOT NULL target → fatal, like the DB
    # rejecting the NULL insert
    df = ingest_csv(spark, csv_file(HEADER_SHORT), TARGET)
    with pytest.raises(SparkRuntimeException, match="cannot cast"):
        df.collect()


def test_by_index_reconcile(spark, csv_file):
    # headerless + existing table → pair by ordinal (common/schema.go:85-105)
    df = ingest_csv(spark, csv_file(NO_HEADER), TARGET, has_header=False)
    r1, _ = df.collect()
    assert r1.a == 1 and r1.b == 2 and r1.e == "2017-01-01"


def test_ragged_row_failfast(spark, csv_file):
    # SURVEY.md §2.3 case 7: inconsistent field count is fatal
    ragged = "a,b,c,d,e\n1,2,3,4,5\n1,2,3"
    df = read_csv(spark, csv_file(ragged))
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        df.collect()


def test_int_strictness(spark, csv_file):
    # Go strconv.ParseInt rejects '1.5' — so do we
    bad = "a,b,c,d,e\n1.5,2,x,y,z"
    df = ingest_csv(spark, csv_file(bad), TARGET)
    with pytest.raises(SparkRuntimeException, match="cannot cast"):
        df.collect()


def test_non_null_string_keeps_empty(spark, csv_file):
    # "" parses to "" for a NOT NULL string target (val_mapper.go:44-46)
    schema = T.StructType([T.StructField("c", T.StringType(), False)])
    df = ingest_csv(spark, csv_file("c\nx\n\"\""), schema)
    vals = [r.c for r in df.collect()]
    assert vals == ["x", ""]


def test_delimiter_and_encoding(spark, csv_file):
    df = read_csv(spark, csv_file("a;b\n1;2"), delimiter=";")
    assert df.columns == ["a", "b"]
    with pytest.raises(ValueError, match="single character"):
        read_csv(spark, csv_file("a,b\n1,2"), delimiter=";;")


def test_latin1_encoding(spark, tmp_path):
    p = tmp_path / "latin1.csv"
    p.write_bytes("name\ncaf\xe9".encode("latin-1"))
    df = read_csv(spark, str(p), encoding="ISO-8859-1")
    assert df.collect()[0].name == "caf\xe9"


def test_latin1_typed_ingest_failfast(spark, tmp_path):
    # P2 parity (csv2db.go:190-199): Latin-1 bytes decode to the same
    # values a UTF-8 load of the equivalent text produces, through the
    # full FAILFAST read→reconcile→cast pipeline
    target = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
        ]
    )
    p = tmp_path / "latin1_typed.csv"
    p.write_bytes("id,name\n1,caf\xe9\n2,na\xefve\n3,".encode("latin-1"))
    got = ingest_csv(spark, str(p), target, encoding="ISO-8859-1").collect()
    assert [(r.id, r.name) for r in got] == [
        (1, "caf\xe9"),
        (2, "na\xefve"),
        (3, None),
    ]


# ------------------------------------------------- stdin-equivalent buffer


def test_buffer_header_and_types(spark):
    df = ingest_csv_buffer(spark, HEADER, TARGET)
    rows = df.collect()
    assert rows[0].a == 1 and rows[0].b == 2 and rows[0].c == "qqq"
    assert rows[1].a is None and rows[1].b == 4 and rows[1].c is None


def test_buffer_headerless_names(spark):
    df = read_csv_buffer(spark, NO_HEADER, has_header=False)
    assert df.columns == ["col0", "col1", "col2", "col3", "col4"]
    assert df.collect()[0].col0 == "1"


def test_buffer_quoted_newline(spark):
    # the driver-side parser keeps full csv quoting semantics
    df = read_csv_buffer(spark, 'a,b\n1,"two\nlines"\n2,x')
    vals = {r.a: r.b for r in df.collect()}
    assert vals["1"] == "two\nlines" and vals["2"] == "x"


def test_buffer_ragged_row_raises(spark):
    with pytest.raises(ValueError, match="fields"):
        read_csv_buffer(spark, "a,b\n1,2,3")


def test_buffer_empty_raises(spark):
    with pytest.raises(ValueError, match="empty"):
        read_csv_buffer(spark, "")


def test_permissive_and_dropmalformed_modes(spark, csv_file):
    # extension beyond the reference's FAILFAST posture: ragged rows are
    # padded (PERMISSIVE) or skipped (DROPMALFORMED) instead of fatal
    ragged = "a,b,c\n1,2,3\nonlyone\n4,5,6"
    p = csv_file(ragged, "ragged.csv")
    perm = read_csv(spark, p, mode="PERMISSIVE").collect()
    assert len(perm) == 3  # short row kept, padded with ""
    assert [r.a for r in perm] == ["1", "onlyone", "4"]
    assert perm[1].b == "" and perm[1].c == ""
    drop = read_csv(spark, p, mode="DROPMALFORMED").collect()
    assert [tuple(r) for r in drop] == [("1", "2", "3"), ("4", "5", "6")]


def test_read_csv_buffer_spill_path_matches_driver_path(spark, tmp_path):
    """The distributed stdin spill (reference streams stdin
    constant-memory, csv2db.go:174-176): past the threshold the buffer
    is chunked at record boundaries to temp files and parsed
    EXECUTOR-side — identical rows to the driver-side csv.reader path,
    including quoted embedded newlines and commas that straddle chunk
    boundaries, and genuinely multi-file so the parse parallelizes."""
    import glob

    rows = []
    for i in range(2000):
        if i % 7 == 0:
            rows.append(f'{i},"line one\nline {i}, two",z{i}')
        else:
            rows.append(f"{i},plain {i},z{i}")
    data = "a,b,c\n" + "\n".join(rows) + "\n"

    want = {
        tuple(r) for r in read_csv_buffer(spark, data).collect()
    }  # driver path: len(data) < default threshold

    spill = str(tmp_path / "spill")
    got_df = read_csv_buffer(
        spark, data, spill_threshold=1024, spill_dir=spill
    )
    assert got_df.columns == ["a", "b", "c"]
    got = {tuple(r) for r in got_df.collect()}
    assert got == want and len(got) == 2000
    chunks = glob.glob(spill + "/chunk-*.csv")
    assert len(chunks) >= 2, "spill must produce multiple executor splits"
    # no chunk starts mid-record: every file parses standalone
    for c in chunks:
        with open(c) as fh:
            assert fh.read(64).split(",")[0].isdigit()


def test_read_csv_buffer_spill_headerless_and_ragged(spark, tmp_path):
    got = read_csv_buffer(
        spark,
        "1,x\n2,y\n3,z\n",
        has_header=False,
        spill_threshold=4,
        spill_dir=str(tmp_path / "s1"),
    )
    assert got.columns == ["col0", "col1"]
    assert {tuple(r) for r in got.collect()} == {("1", "x"), ("2", "y"), ("3", "z")}
    # FAILFAST posture survives the spill: ragged rows still abort (at
    # action time — the distributed scan can't raise at build time)
    import pytest as _pytest

    bad = read_csv_buffer(
        spark,
        "a,b\n1,2\n3,4,5\n",
        spill_threshold=4,
        spill_dir=str(tmp_path / "s2"),
    )
    with _pytest.raises(Exception):
        bad.collect()


def test_charset_matrix_breadth(spark, tmp_path):
    """P2 charset breadth (csv2db.go:190-199 delegates to Go's charset
    package — ANY registered encoding): beyond the UTF-8/latin-1 gates,
    pin shift_jis (multibyte, ASCII-compatible newline), EUC-KR, and
    cp1251 round-trips through the reader's encoding option. Each file
    carries non-ASCII text that decodes DIFFERENTLY (or not at all)
    under the wrong charset, so a silently-ignored option fails the
    value assert, not just the happy path."""
    cases = [
        ("shift_jis", "名前,都市\n太郎,東京\n花子,大阪\n",
         [("太郎", "東京"), ("花子", "大阪")], ["名前", "都市"]),
        ("euc_kr", "이름,도시\n민준,서울\n서연,부산\n",
         [("민준", "서울"), ("서연", "부산")], ["이름", "도시"]),
        ("cp1251", "имя,город\nИван,Москва\nОльга,Киев\n",
         [("Иван", "Москва"), ("Ольга", "Киев")], ["имя", "город"]),
    ]
    for enc, text, want_rows, _names in cases:
        p = tmp_path / f"{enc}.csv"
        p.write_bytes(text.encode(enc))
        df = read_csv(spark, str(p), encoding=enc)
        got = [tuple(r) for r in df.collect()]
        assert got == want_rows, f"{enc}: {got}"


def test_sniff_fallback_glob_non_ascii_header(spark, tmp_path):
    """A glob path can't take the zero-job driver-local sniff, so it
    exercises the CSV-reader fallback — which must still decode a
    non-ASCII header under the requested charset (the r9 fix)."""
    d = tmp_path / "sj"
    d.mkdir()
    (d / "part.csv").write_bytes("名前,都市\n太郎,東京\n".encode("shift_jis"))
    df = read_csv(spark, str(d / "*.csv"), encoding="shift_jis")
    assert df.columns == ["名前", "都市"]
    assert [tuple(r) for r in df.collect()] == [("太郎", "東京")]


def test_sniff_local_uri_spellings_and_strict_decode(spark, tmp_path):
    """ADVICE r10 fixes: every file: URI spelling reaches the zero-job
    local sniff (the old code stripped only the exact 'file://' prefix),
    a file://HOST/ path falls back to the Spark sniff, and header bytes
    invalid in the requested charset fall back instead of silently
    minting U+FFFD column names."""
    from csv2db_spark.ingest import _sniff_local

    p = tmp_path / "u.csv"
    p.write_text("a,b\n1,2\n")
    assert _sniff_local(str(p), ",", "UTF-8") == ["a", "b"]
    assert _sniff_local(f"file:{p}", ",", "UTF-8") == ["a", "b"]
    assert _sniff_local(f"file://{p}", ",", "UTF-8") == ["a", "b"]
    assert _sniff_local(f"file://localhost{p}", ",", "UTF-8") == ["a", "b"]
    # RFC 3986 host comparison is case-insensitive (ADVICE r12: the
    # hand split must lowercase like urlparse did)
    assert _sniff_local(f"file://LOCALHOST{p}", ",", "UTF-8") == ["a", "b"]
    assert _sniff_local(f"file://LocalHost{p}", ",", "UTF-8") == ["a", "b"]
    assert _sniff_local(f"file://otherhost{p}", ",", "UTF-8") is None
    assert _sniff_local(f"file://OTHERHOST{p}", ",", "UTF-8") is None
    # %XX stays LITERAL, matching Hadoop Path semantics: the sniff must
    # read the same file the JVM read will load (code-review r11) —
    # with both x%20y.csv and x y.csv present, file://...x%20y.csv
    # means the literal %20 file, never the space-named decoy
    pct = tmp_path / "x%20y.csv"
    pct.write_text("h1,h2\n1,2\n")
    (tmp_path / "x y.csv").write_text("w1,w2\n1,2\n")
    assert _sniff_local(f"file://{pct}", ",", "UTF-8") == ["h1", "h2"]
    # '#' in a file name is literal to Hadoop Path; urlparse would have
    # truncated the URI at the fragment and silently skipped the local
    # sniff (ADVICE r11). '?' stays a fallback — it's a Hadoop glob char.
    frag = tmp_path / "x#y.csv"
    frag.write_text("f1,f2\n1,2\n")
    assert _sniff_local(f"file://{frag}", ",", "UTF-8") == ["f1", "f2"]
    assert _sniff_local(f"file:{frag}", ",", "UTF-8") == ["f1", "f2"]
    assert _sniff_local(str(frag), ",", "UTF-8") == ["f1", "f2"]
    # invalid bytes under the requested codec: local sniff declines...
    bad = tmp_path / "bad.csv"
    bad.write_bytes("名前,都市\nx,y\n".encode("shift_jis"))
    assert _sniff_local(str(bad), ",", "UTF-8") is None
    # ...and read_csv still works end-to-end via each path
    df = read_csv(spark, f"file:{p}")
    assert df.columns == ["a", "b"]
    df = read_csv(spark, str(bad), encoding="shift_jis")
    assert df.columns == ["名前", "都市"]


def test_multiline_header_sniff_matches_reader_semantics(spark, tmp_path):
    """multiline=True: a quoted newline in a HEADER NAME spans lines in
    both the sniff and the read; multiline=False: the header is one
    physical line to both (the local sniff must not swallow a quoted
    newline the line-based reader won't)."""
    p = tmp_path / "mh.csv"
    p.write_text('a,"b\nc"\n1,2\n')
    df = read_csv(spark, str(p), multiline=True)
    assert df.columns == ["a", "b\nc"]
    assert [tuple(r) for r in df.collect()] == [("1", "2")]


def test_charset_alias_does_not_enable_java_registry(spark, tmp_path):
    """ADVICE r9: 'UTF8' / 'latin1' spellings are native charsets and
    must NOT flip the session-wide legacy.javaCharsets conf; a genuinely
    non-native charset on a non-local path still does."""
    p = tmp_path / "a.csv"
    p.write_text("a,b\n1,2\n")
    spark.conf.unset("spark.sql.legacy.javaCharsets")
    for alias in ("UTF8", "latin1", "L1", "utf_8", "ASCII"):
        read_csv(spark, str(p), encoding=alias).collect()
        assert (
            spark.conf.get("spark.sql.legacy.javaCharsets", None) is None
        ), alias
    # non-native charset via the Spark-reader sniff (glob) sets it
    d = tmp_path / "g"
    d.mkdir()
    (d / "x.csv").write_bytes("a,b\n1,2\n".encode("euc_kr"))
    read_csv(spark, str(d / "*.csv"), encoding="euc_kr").collect()
    assert spark.conf.get("spark.sql.legacy.javaCharsets") == "true"


def test_whitespace_only_rows_survive_spill(spark, tmp_path):
    """ADVICE r9 parity break: a single-column CSV whose rows are
    unquoted spaces kept those rows on the driver-side csv.reader path
    but dropped them on the spill path (flush/_record_chunks skipped
    whitespace-only chunk text). Both paths must agree."""
    import io

    from csv2db_spark.ingest import read_csv_buffer, read_csv_stdin

    data = "c\n \nx\n  \ny\n"
    small = read_csv_buffer(spark, data)
    want = sorted(r.c for r in small.collect())
    assert want == [" ", "  ", "x", "y"]
    # force the spill path with a tiny threshold
    spilled = read_csv_buffer(
        spark, data, spill_threshold=2, spill_dir=str(tmp_path / "sp")
    )
    assert sorted(r.c for r in spilled.collect()) == want
    streamed = read_csv_stdin(
        spark,
        io.StringIO(data),
        spill_threshold=4,
        spill_dir=str(tmp_path / "sp2"),
    )
    assert sorted(r.c for r in streamed.collect()) == want


def test_read_csv_stdin_constant_memory_paths(spark, tmp_path):
    """read_csv_stdin: a pipe ending inside the peek takes the driver
    path; a longer pipe streams to executor-parsed chunks without ever
    holding the whole input — including when the peek boundary cuts a
    QUOTED field mid-record (the head/stream seam)."""
    import io

    from csv2db_spark.ingest import read_csv_stdin

    rows = []
    for i in range(800):
        if i % 5 == 0:
            rows.append(f'{i},"multi\nline {i}, quoted",t{i}')
        else:
            rows.append(f"{i},plain {i},t{i}")
    data = "a,b,c\n" + "\n".join(rows) + "\n"

    small = read_csv_stdin(spark, io.StringIO(data))  # fits in the peek
    want = {tuple(r) for r in small.collect()}
    assert len(want) == 800

    # threshold of 97 chars lands the seam inside a quoted field
    big = read_csv_stdin(
        spark,
        io.StringIO(data),
        spill_threshold=97,
        spill_dir=str(tmp_path / "sp"),
    )
    assert big.columns == ["a", "b", "c"]
    assert {tuple(r) for r in big.collect()} == want
    import glob

    assert len(glob.glob(str(tmp_path / "sp" / "chunk-*.csv"))) >= 2

    # headerless: first record is DATA and must survive the peel-off
    hb = read_csv_stdin(
        spark,
        io.StringIO("1,x\n2,y\n3,z\n"),
        has_header=False,
        spill_threshold=4,
        spill_dir=str(tmp_path / "sp2"),
    )
    assert hb.columns == ["col0", "col1"]
    assert {tuple(r) for r in hb.collect()} == {("1", "x"), ("2", "y"), ("3", "z")}


def test_cli_stdin_still_ingests(spark, tmp_path, monkeypatch):
    """The CLI's -- path through ingest_csv_stdin keeps P1-P8 semantics
    (reconcile by name + typed cast + empty->NULL iff nullable)."""
    import io

    from pyspark.sql import types as T

    from csv2db_spark.ingest import ingest_csv_stdin

    target = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
        ]
    )
    got = ingest_csv_stdin(
        spark, io.StringIO("b,a\nx,1\n,\n"), target=target
    ).collect()
    assert {tuple(r) for r in got} == {(1, "x"), (None, None)}
