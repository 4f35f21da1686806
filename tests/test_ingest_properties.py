"""Property-based tests (hypothesis) for the ingest contract.

The reference's semantics (SURVEY.md §1.3/§2.3) expressed as properties
over random inputs rather than the 8 golden scenarios:

1. empty string -> NULL iff the target column is nullable;
2. parseable numerics roundtrip exactly, for any column order;
3. by-name reconcile is order-insensitive (scrambled CSV == sorted CSV);
4. by-index reconcile drops excess columns / NULL-fills missing ones.

Examples are kept small (each builds a Spark DataFrame); `deadline=None`
because Spark job latency is not the property under test.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csv2db_spark.ingest import (
    cast_to_schema,
    reconcile_by_index,
    reconcile_by_name,
)

_PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# value pools: raw CSV strings that parse for the paired type
_LONGS = st.integers(min_value=-(2**62), max_value=2**62).map(str)
_DOUBLES = st.floats(
    allow_nan=False, allow_infinity=False, width=32
).map(lambda f: repr(float(f)))
_BOOLS = st.sampled_from(["true", "false", "0", "1"])
_STRINGS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), max_size=8
)

_COLTYPES = [
    (T.LongType(), _LONGS),
    (T.DoubleType(), _DOUBLES),
    (T.BooleanType(), _BOOLS),
    (T.StringType(), _STRINGS),
]


@st.composite
def schema_and_rows(draw):
    ncols = draw(st.integers(min_value=1, max_value=5))
    nrows = draw(st.integers(min_value=1, max_value=6))
    fields, pools = [], []
    for i in range(ncols):
        dtype, pool = draw(st.sampled_from(_COLTYPES))
        nullable = draw(st.booleans())
        fields.append(T.StructField(f"c{i}", dtype, nullable))
        pools.append(pool)
    rows = []
    for _ in range(nrows):
        row = []
        for f, pool in zip(fields, pools):
            if f.nullable and draw(st.booleans()):
                row.append("")  # empty cell -> NULL expected
            else:
                row.append(draw(pool))
        rows.append(row)
    return T.StructType(fields), rows


def _raw_df(spark, names, rows):
    schema = T.StructType([T.StructField(n, T.StringType(), True) for n in names])
    return spark.createDataFrame([tuple(r) for r in rows], schema)


@_PROP
@given(data=schema_and_rows())
def test_cast_null_iff_nullable_and_roundtrip(spark, data):
    target, rows = data
    df = _raw_df(spark, target.fieldNames(), rows)
    out = cast_to_schema(reconcile_by_name(df, target), target).collect()
    for raw, got in zip(rows, out):
        for f, cell in zip(target.fields, raw):
            v = got[f.name]
            if cell == "" and f.nullable:
                assert v is None, f"{f.name}: '' must be NULL when nullable"
            elif isinstance(f.dataType, T.StringType):
                assert v == cell
            elif isinstance(f.dataType, T.LongType):
                assert v == int(cell)
            elif isinstance(f.dataType, T.DoubleType):
                assert v == pytest.approx(float(cell), abs=0.0)
            elif isinstance(f.dataType, T.BooleanType):
                assert v == (cell in ("true", "1"))


@_PROP
@given(data=schema_and_rows(), seed=st.randoms(use_true_random=False))
def test_reconcile_by_name_order_insensitive(spark, data, seed):
    target, rows = data
    names = list(target.fieldNames())
    perm = names[:]
    seed.shuffle(perm)
    idx = [names.index(p) for p in perm]
    scrambled_rows = [[r[i] for i in idx] for r in rows]
    a = cast_to_schema(reconcile_by_name(_raw_df(spark, names, rows), target), target)
    b = cast_to_schema(
        reconcile_by_name(_raw_df(spark, perm, scrambled_rows), target), target
    )
    assert a.collect() == b.collect()


@_PROP
@given(data=schema_and_rows(), extra=st.integers(min_value=0, max_value=2))
def test_reconcile_by_index_width_rules(spark, data, extra):
    target, rows = data
    # widen the CSV beyond the target: excess columns must be dropped
    wide_rows = [r + ["junk"] * extra for r in rows]
    names = [f"x{i}" for i in range(len(target.fields) + extra)]
    out = reconcile_by_index(_raw_df(spark, names, wide_rows), target)
    assert out.columns == list(target.fieldNames())
    # narrow the CSV: missing targets must be NULL-filled
    narrow = reconcile_by_index(
        _raw_df(spark, ["x0"], [[r[0]] for r in rows]), target
    )
    got = narrow.collect()
    for f in target.fields[1:]:
        assert all(r[f.name] is None for r in got)
