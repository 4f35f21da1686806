"""Canonicalization self-tests (VERDICT r10 item 5).

q_stream_cdc_upsert sat driver-red for three rounds while every local
check said MATCH, because two defects lined up:

1. The gate's oracle left a DuckDB ``sum(CASE...)`` uncast. DuckDB types
   that HUGEINT, and ``.df()`` converts HUGEINT to float64 — so the
   oracle cell was 30.0 against Spark's int64 30.
2. The local comparator canonicalized with ``iterrows()``, which upcasts
   every row to the widest dtype across ALL columns — so the int64 30
   rendered "30.0" too and the frames compared equal. The driver's
   canonicalizer is per-column, saw "30" vs "30.0", and hashed them
   apart.

These tests pin both fixes so neither can regress silently:
``canonical_rows`` must be per-column (a value-equal int/float pair must
NOT compare equal), ``assert_frames_match`` must reject value-equal but
representation-class-unequal frames, and no registered oracle may type
any result column HUGEINT.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.compare import (
    assert_frames_match,
    canonical_rows,
    column_classes,
    norm_cell,
    type_class,
)


def test_int_float_columns_render_differently():
    """The iterrows() regression: an int64 column must not be upcast to
    float by a float64 sibling column in the same row."""
    df = pd.DataFrame({"a": np.array([3], dtype=np.int64), "b": [1.5]})
    assert canonical_rows(df) == [("3", "1.5")]


def test_frames_int_vs_float_mismatch_detected():
    spark_like = pd.DataFrame(
        {"n": np.array([30], dtype=np.int64), "s": [677.95]}
    )
    oracle_like = pd.DataFrame({"n": [30.0], "s": [677.95]})  # HUGEINT→float64
    with pytest.raises(AssertionError, match="n"):
        assert_frames_match(spark_like, oracle_like, "hugeint_regression")


def test_decimal_vs_float_class_detected():
    from decimal import Decimal

    a = pd.DataFrame({"v": [Decimal("6721.40")]})
    b = pd.DataFrame({"v": [6721.4]})
    # values normalize identically (repr of the same float) ...
    assert canonical_rows(a) == canonical_rows(b)
    # ... but the representation classes must still be flagged
    with pytest.raises(AssertionError, match="representation classes"):
        assert_frames_match(a, b, "decimal_class")


def test_null_cells_share_one_class():
    a = pd.DataFrame({"v": [np.nan, 1.5]})
    b = pd.DataFrame({"v": [None, 1.5]}).astype(float)
    assert_frames_match(a, b, "null_class")
    assert type_class(np.nan) == "null"
    assert norm_cell(np.nan) == "NULL"


def test_column_classes_per_column():
    df = pd.DataFrame(
        {"i": np.array([1], dtype=np.int64), "f": [2.5], "s": ["x"]}
    )
    assert column_classes(df) == {"i": {"int"}, "f": {"float"}, "s": {"str"}}


def test_column_classes_dtype_shortcut_matches_cell_scan():
    """The dtype fast path must agree with a per-cell type_class scan
    (modulo the null class, which the comparison discards) on every
    column shape the gates produce."""
    from decimal import Decimal

    df = pd.DataFrame(
        {
            "i": np.array([1, 2], dtype=np.int64),
            "f": [1.5, np.nan],
            "fnan": [np.nan, np.nan],
            "b": [True, False],
            "t": pd.to_datetime(["2024-01-01", None]),
            "s": ["x", None],
            "d": [Decimal("1.5"), None],
        }
    )
    fast = column_classes(df)
    slow = {c: {type_class(v) for v in df[c].tolist()} for c in df.columns}
    for c in df.columns:
        assert fast[c] - {"null"} == slow[c] - {"null"}, c
    assert fast["fnan"] == {"null"}


def test_comparator_properties_random_frames():
    """Property pass over the comparator itself (it gates every oracle
    in the registry): any frame must match a dtype-preserving copy of itself
    (reflexivity — no false positives from the class check), must
    reject a single perturbed cell (sensitivity), and must reject an
    int column recast to float even though values are numerically equal
    (the cdc class)."""
    import pytest as _pytest

    _pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.pandas import column, data_frames, range_indexes

    frames = data_frames(
        columns=[
            column("i", dtype=np.int64),
            column(
                "f",
                elements=st.floats(
                    allow_nan=False, allow_infinity=False, width=64
                ),
                dtype=np.float64,
            ),
            column(
                "s",
                elements=st.text(
                    alphabet="abcXYZ019 _", min_size=0, max_size=8
                ),
            ),
        ],
        index=range_indexes(min_size=1, max_size=12),
    )

    @settings(max_examples=60, deadline=None)
    @given(df=frames)
    def check(df):
        assert_frames_match(df, df.copy(deep=True), "reflexive")
        # int-vs-float class divergence must be caught even when values
        # are numerically identical (skip rows where the int does not
        # survive the float round-trip — those fail on value already)
        recast = df.copy(deep=True)
        recast["i"] = recast["i"].astype(np.float64)
        with _pytest.raises(AssertionError):
            assert_frames_match(df, recast, "class")
        # single-cell perturbation
        bad = df.copy(deep=True)
        bad.loc[bad.index[0], "i"] = bad.loc[bad.index[0], "i"] ^ 1
        with _pytest.raises(AssertionError):
            assert_frames_match(df, bad, "cell")

    check()


def test_no_oracle_types_hugeint(duck):
    """Registry-wide census: every oracle's DuckDB result schema must be
    HUGEINT-free — an uncast sum(CASE...)/sum(int) becomes float64 in
    pandas and can only ever hash-diverge from a Spark integer column."""
    from csv2db_spark.registry import load_all_queries

    offenders = {}
    for name, qd in load_all_queries().items():
        if not qd.oracle:
            continue
        rel = duck.sql(qd.oracle)
        hug = [
            c
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if hug:
            offenders[name] = hug
    assert not offenders, f"HUGEINT-typed oracle columns: {offenders}"
