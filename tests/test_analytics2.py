"""Semantic properties of the second analytics batch (queries/analytics2.py):
the parity suite proves oracle equality; these tests pin the CONTRACTS —
bar invariants, EWMA truncation bounds, MAD robustness, SCD2 interval
algebra, sketch-union bounds, and row-probability normalization.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from csv2db_spark.sources import load_table


def test_ohlc_bar_invariants(spark, sf_dir):
    from csv2db_spark.operators.timeseries import ohlc_bars

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bars = ohlc_bars(ev, hours=6).collect()
    assert bars
    for b in bars:
        assert b.low <= b.open <= b.high
        assert b.low <= b.close <= b.high
        assert b.n_events >= 1


def test_ohlc_open_close_are_first_last_observations(spark, sf_dir):
    from csv2db_spark.operators.timeseries import ohlc_bars, time_bucket

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bars = {
        (r.event_type, r.bucket): r for r in ohlc_bars(ev, hours=6).collect()
    }
    # replay one group imperatively
    some = sorted(bars)[0]
    rows = (
        ev.withColumn("bucket", time_bucket(F.col("ts"), 6))
        .where((F.col("event_type") == some[0]) & (F.col("bucket") == some[1]))
        .orderBy("ts", "event_id")
        .collect()
    )
    assert bars[some].open == rows[0].value
    assert bars[some].close == rows[-1].value


def test_ewma_constant_series_is_identity(spark):
    from csv2db_spark.operators.timeseries import ewma

    rows = [("a", f"2024-01-01 0{i}:00:00", i, 7.0) for i in range(8)]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = ewma(df, k=6).collect()
    for r in out:
        assert r.ewma == pytest.approx(7.0, abs=1e-12)


def test_ewma_weights_recent_observations_more(spark):
    from csv2db_spark.operators.timeseries import ewma

    # step series: 0,0,0,0,100 — smoothed tail must sit between, closer to 100
    rows = [("a", f"2024-01-01 0{i}:00:00", i, 0.0) for i in range(4)]
    rows.append(("a", "2024-01-01 04:00:00", 4, 100.0))
    df = spark.createDataFrame(
        rows, "event_type string, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    last = {r.event_id: r.ewma for r in ewma(df, k=6).collect()}[4]
    # weights 1,.5,.25,.125,.0625 -> 100 / 1.9375
    assert last == pytest.approx(100 / 1.9375, rel=1e-12)
    assert last > 50


def test_mad_outliers_robust_to_the_outliers_themselves(spark):
    from csv2db_spark.operators.timeseries import mad_outliers

    # 99 values in [10, 12] + one absurd point: z-score would be dragged,
    # MAD must flag exactly the absurd point
    rows = [("a", i, 10.0 + (i % 3)) for i in range(99)] + [("a", 999, 1e6)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    out = mad_outliers(df, n_mads=3).collect()
    assert [r.event_id for r in out] == [999]
    assert out[0].group_median == pytest.approx(11.0)


def test_mad_outliers_zero_mad_group(spark):
    from csv2db_spark.operators.timeseries import mad_outliers

    # constant group: MAD = 0, any deviation is an outlier
    rows = [("a", i, 5.0) for i in range(10)] + [("a", 99, 6.0)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    out = mad_outliers(df, n_mads=3).collect()
    assert [r.event_id for r in out] == [99]


def test_scd2_intervals_partition_history(spark, sf_dir):
    from csv2db_spark.operators.merge import scd2_build

    orders = load_table(spark, sf_dir, "orders")
    hist = scd2_build(
        orders, ["o_custkey"], "o_orderdate", "o_orderkey",
        ["o_orderstatus"],
    )
    rows = hist.orderBy("o_custkey", "version").collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.o_custkey, []).append(r)
    assert len(rows) == orders.count()  # every change becomes a version
    for versions in by_key.values():
        assert [v.version for v in versions] == list(range(1, len(versions) + 1))
        assert versions[-1].is_current and versions[-1].effective_to is None
        for prev, nxt in zip(versions, versions[1:]):
            assert not prev.is_current
            assert prev.effective_to == nxt.effective_from  # contiguous


def test_hll_setops_bounds(spark):
    from csv2db_spark.operators.sketch import hll_set_estimates

    # overlapping ranges with n >> m=64 registers, where the raw
    # estimator (no small-range correction — deliberate, see
    # operators/sketch.hll_distinct) is in its accurate regime
    a = spark.range(0, 5000).select(F.col("id").alias("item"))
    b = spark.range(2500, 7500).select(F.col("id").alias("item"))
    row = hll_set_estimates(a, b).collect()[0]
    # union estimate dominates both sides (register-max monotonicity)
    assert row.est_union >= max(row.est_a, row.est_b) - 1e-9
    assert row.est_intersection <= min(row.est_a, row.est_b) + 1e-9
    # vs truth: raw 64-register HLL ~13% relative error; allow 3 sigma
    assert abs(row.est_a - 5000) / 5000 < 0.4
    assert abs(row.est_union - 7500) / 7500 < 0.4
    assert abs(row.est_intersection - 2500) / 2500 < 1.0  # differences compound


def test_hll_union_merges_without_rescan(spark):
    from csv2db_spark.operators.sketch import hll_set_estimates

    # identical sets: union estimate must equal each side's exactly
    df = spark.range(1000).select(F.col("id").alias("item"))
    row = hll_set_estimates(df, df).collect()[0]
    assert row.est_a == row.est_b == row.est_union
    assert row.est_intersection == pytest.approx(row.est_a, rel=1e-12)


def test_transition_matrix_rows_normalize(spark, sf_dir):
    from csv2db_spark.operators.funnel import transition_matrix

    ev = load_table(spark, sf_dir, "events")
    rows = transition_matrix(ev).collect()
    assert rows
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r.from_state, []).append(r)
    for state, outs in by_from.items():
        assert math.isclose(sum(o.p_transition for o in outs), 1.0, rel_tol=1e-9)
        assert all(o.n_transitions > 0 for o in outs)


def test_transition_matrix_counts_sequential_pairs(spark):
    from csv2db_spark.operators.funnel import transition_matrix

    rows = [
        (1, "2024-01-01 00:00:00", 1, "a"),
        (1, "2024-01-01 00:01:00", 2, "b"),
        (1, "2024-01-01 00:02:00", 3, "a"),
        (2, "2024-01-01 00:00:00", 4, "a"),
        (2, "2024-01-01 00:01:00", 5, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.from_state, r.to_state): r for r in transition_matrix(df).collect()}
    assert out[("a", "b")].n_transitions == 2
    assert out[("b", "a")].n_transitions == 1
    assert out[("a", "b")].p_transition == 1.0  # a always -> b
