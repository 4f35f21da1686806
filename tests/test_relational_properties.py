"""Property tests for interval_overlap_join, scd2_build, and apply_cdc
against brute-force / pure-Python models.

- interval_overlap_join's bin-blocking + first-shared-bin emission must
  return EXACTLY the brute-force overlapping-pair set — once per pair,
  never duplicated across shared bins — for every bin width, including
  widths far smaller and far larger than the interval lengths (the
  regimes where the bins-per-interval explosion and the false-neighbor
  filter respectively do all the work), and for degenerate [x, x)
  intervals (point semantics per the docstring).
- scd2_build's lead()-derived validity intervals must exactly tile each
  key's change sequence under (ts, tiebreak) order with ties present.
- apply_cdc's latest-wins compaction + outer join must equal a dict
  replay of the change feed over the base snapshot.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv2db_spark.operators.merge import apply_cdc, scd2_build
from csv2db_spark.operators.relational import interval_overlap_join

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_interval = st.tuples(st.integers(0, 40), st.integers(0, 12)).map(
    lambda t: (t[0], t[0] + t[1])  # lo <= hi; includes degenerate [x, x)
)
_intervals = st.lists(_interval, min_size=1, max_size=15)


@given(a=_intervals, b=_intervals, width=st.sampled_from([1, 3, 5, 64]))
@settings(**_SETTINGS)
def test_interval_overlap_join_matches_brute_force(spark, a, b, width):
    a_rows = [(i, lo, hi) for i, (lo, hi) in enumerate(a)]
    b_rows = [(j, lo, hi) for j, (lo, hi) in enumerate(b)]
    da = spark.createDataFrame(a_rows, "a_id long, a_lo long, a_hi long")
    db = spark.createDataFrame(b_rows, "b_id long, b_lo long, b_hi long")
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(da, db, width).collect()
    )
    want = sorted(
        (i, j)
        for i, alo, ahi in a_rows
        for j, blo, bhi in b_rows
        if alo < bhi and blo < ahi
    )
    assert got == want, f"width={width}"


_changes = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),
        st.integers(0, 5),  # ts — small range forces ties
        st.integers(-9, 9),  # attr
    ),
    min_size=1,
    max_size=12,
)


@given(changes=_changes)
@settings(**_SETTINGS)
def test_scd2_build_intervals_tile_the_change_sequence(spark, changes):
    rows = [(k, ts, i, v) for i, (k, ts, v) in enumerate(changes)]
    df = spark.createDataFrame(rows, "k string, ts long, eid long, v long")
    got = sorted(
        (r.k, r.version, r.effective_from, r.effective_to, r.is_current, r.v)
        for r in scd2_build(df, ["k"], "ts", "eid", ["v"]).collect()
    )
    want = []
    by_key: dict[str, list] = {}
    for k, ts, eid, v in rows:
        by_key.setdefault(k, []).append((ts, eid, v))
    for k, seq in by_key.items():
        seq.sort()  # (ts, eid) — the same total order as the window
        for n, (ts, _eid, v) in enumerate(seq, 1):
            nxt = seq[n][0] if n < len(seq) else None
            want.append((k, n, ts, nxt, nxt is None, v))
    assert got == sorted(want)


_events = st.lists(
    st.tuples(
        st.sampled_from([1, 2]),  # user
        st.integers(0, 400),  # seconds offset — clusters AND gaps vs 60s
    ),
    min_size=1,
    max_size=20,
)


@given(events=_events)
@settings(**_SETTINGS)
def test_sessionize_matches_gap_replay(spark, events):
    """Gap-based session assignment vs a per-user replay: a session
    breaks exactly when the gap is STRICTLY exceeded (ts == prev + gap
    stays in-session), duplicate timestamps tie-break on event_id, and
    session ids are 1-based per user in time order."""
    import datetime as dt

    from csv2db_spark.operators.sessions import sessionize

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (eid, u, t0 + dt.timedelta(seconds=s))
        for eid, (u, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {
        r.event_id: r.session_id
        for r in sessionize(df, gap="60 seconds").collect()
    }
    want = {}
    by_user: dict[int, list] = {}
    for eid, u, ts in rows:
        by_user.setdefault(u, []).append((ts, eid))
    for u, seq in by_user.items():
        seq.sort()
        sid, prev = 0, None
        for ts, eid in seq:
            if prev is None or (ts - prev).total_seconds() > 60:
                sid += 1
            want[eid] = sid
            prev = ts
    assert got == want


_base = st.dictionaries(
    st.integers(0, 6), st.integers(-9, 9), min_size=0, max_size=5
)
_feed = st.lists(
    st.tuples(
        st.integers(0, 6),  # key
        st.integers(1, 4),  # version
        st.sampled_from(["I", "U", "D"]),
        st.integers(-9, 9),  # new value
    ),
    min_size=1,
    max_size=12,
).filter(
    # the operator's determinism contract: (key, version, op) unique,
    # and never BOTH an I and a U at one (key, version) — the op rank
    # only breaks D-vs-rest ties, so I-vs-U at equal version has no
    # defined winner (same as two U payloads at one version)
    lambda f: len({(k, ver, op) for k, ver, op, _ in f}) == len(f)
    and all(
        len({op for k2, v2, op, _ in f if (k2, v2) == (k, ver) and op != "D"})
        <= 1
        for k, ver, _, _ in f
    )
)


@given(base=_base, feed=_feed)
@settings(**_SETTINGS)
def test_apply_cdc_matches_dict_replay(spark, base, feed):
    bdf = spark.createDataFrame(
        sorted(base.items()), "k long, v long"
    )
    fdf = spark.createDataFrame(
        feed, "k long, version long, op string, v long"
    )
    got = sorted(
        (r.k, r.v) for r in apply_cdc(bdf, fdf, ["k"]).collect()
    )
    # replay: latest version wins per key; at equal versions D beats
    # I/U (the tombstone rule); I and U both mean "row becomes v"
    state = dict(base)
    latest: dict[int, tuple[int, int, int]] = {}  # k -> (version, rank, v)
    for k, ver, op, v in feed:
        rank = 1 if op == "D" else 0
        cur = latest.get(k)
        if cur is None or (ver, rank) > (cur[0], cur[1]):
            latest[k] = (ver, rank, v)
    for k, (_ver, rank, v) in latest.items():
        if rank == 1:
            state.pop(k, None)
        else:
            state[k] = v
    assert got == sorted(state.items())
