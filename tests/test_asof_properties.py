"""Differential property tests for the as-of join family
(operators/asof.py) against pandas.merge_asof — LIBRARY ground truth
for the exact semantics the docstrings claim ("the other half of
pandas merge_asof", "pandas' convention" for nearest ties).

Generator notes: right-side timestamps are unique PER GROUP — with
duplicate right keys at one timestamp, "the most recent right row" is
not a total order and both engines pick an arbitrary-but-different
winner (pandas: last input occurrence; the union+window plan: last in
an unordered tie) — real pipelines dedup the right side first, and the
operators' determinism contract assumes it. Left timestamps duplicate
freely (every left row matches independently). Right payloads are
reassigned to UNIQUE integers so a result row's payload identifies the
matched right row exactly (no back-lookup ambiguity). Integer keys:
pandas merge_asof and the union+window plan both define distance by
plain subtraction, so the integer case pins the same arithmetic the
timestamp fixtures in test_runtime_ops cover.
"""

from __future__ import annotations

import pandas as pd
import pytest

pytestmark = pytest.mark.slow

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv2db_spark.operators.asof import asof_join, asof_join_nearest

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_groups = st.sampled_from(["g1", "g2", "g3"])
_left = st.lists(
    st.tuples(_groups, st.integers(0, 60)), min_size=1, max_size=25
)
_right = st.lists(
    st.tuples(_groups, st.integers(0, 60)), min_size=1, max_size=25
)


def _mk_right(rows):
    """Dedup (g, ts) and assign a unique payload per surviving row."""
    seen, out = set(), []
    for g, ts in rows:
        if (g, ts) not in seen:
            seen.add((g, ts))
            out.append((g, ts, 1000 + len(out)))
    return out


def _frames(spark, left_rows, right_rows):
    left_rows = [(i, g, ts) for i, (g, ts) in enumerate(left_rows)]
    l = spark.createDataFrame(left_rows, "row_id long, g string, ts long")
    r = spark.createDataFrame(right_rows, "g string, ts long, v long")
    lp = pd.DataFrame(left_rows, columns=["row_id", "g", "ts"]).sort_values(
        "ts", kind="stable"
    )
    rp = pd.DataFrame(right_rows, columns=["g", "ts", "v"]).sort_values(
        "ts", kind="stable"
    )
    return l, r, lp, rp


def _norm(x):
    return None if x is None or pd.isna(x) else int(x)


@given(left_rows=_left, right_rows=_right,
       direction=st.sampled_from(["backward", "forward"]))
@settings(**_SETTINGS)
def test_asof_join_matches_pandas(spark, left_rows, right_rows, direction):
    right_rows = _mk_right(right_rows)
    ts_of = {v: ts for (_, ts, v) in right_rows}
    l, r, lp, rp = _frames(spark, left_rows, right_rows)
    got = {
        r_.row_id: (_norm(r_.ts_right), _norm(r_.v))
        for r_ in asof_join(l, r, "ts", "g", direction=direction).collect()
    }
    ref = pd.merge_asof(lp, rp, on="ts", by="g", direction=direction)
    want = {
        int(row.row_id): (
            None if _norm(row.v) is None else ts_of[int(row.v)],
            _norm(row.v),
        )
        for row in ref.itertuples()
    }
    assert got == want, f"direction={direction}"


@given(left_rows=_left, right_rows=_right)
@settings(**_SETTINGS)
def test_asof_join_nearest_matches_pandas(spark, left_rows, right_rows):
    right_rows = _mk_right(right_rows)
    ts_of = {v: ts for (_, ts, v) in right_rows}
    l, r, lp, rp = _frames(spark, left_rows, right_rows)
    got = {
        r_.row_id: (_norm(r_.ts_near), _norm(r_.v_near))
        for r_ in asof_join_nearest(l, r, "ts", "g").collect()
    }
    ref = pd.merge_asof(lp, rp, on="ts", by="g", direction="nearest")
    want = {
        int(row.row_id): (
            None if _norm(row.v) is None else ts_of[int(row.v)],
            _norm(row.v),
        )
        for row in ref.itertuples()
    }
    assert got == want
