"""Streaming-specific semantics tests (beyond the oracle parity gate):
watermark withholding, session merging, and state exactness are asserted
structurally, not just by hash-match."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

pytestmark = pytest.mark.slow

from csv2db_spark.sources import load_table
from csv2db_spark.streaming import (
    events_stream,
    run_to_df,
    stream_dedup_keys,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def tumbling(spark, sf_dir):
    out = tumbling_window_agg(events_stream(spark, sf_dir), "6 hours", "1 hour")
    return run_to_df(out, spark, "append").cache()


def test_watermark_withholds_trailing_windows(tumbling, spark, sf_dir):
    """Append mode must NOT emit windows whose end is past the final
    watermark (max event time - delay)."""
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    emitted_max_end = tumbling.agg(F.max("w_end")).collect()[0][0]
    # the window containing max_ts is still open -> must be withheld
    assert emitted_max_end <= max_ts
    # but the stream did emit nearly all of the month of data
    n_windows = tumbling.select("w_start").distinct().count()
    assert n_windows >= 100  # 30 days / 6h = 120 windows


def test_tumbling_counts_sum_to_emitted_range(tumbling, spark, sf_dir):
    """Within the emitted range, streaming counts equal batch counts."""
    ev = load_table(spark, sf_dir, "events")
    hi = tumbling.agg(F.max("w_end")).collect()[0][0]
    batch_n = ev.where(F.col("ts") < F.lit(hi)).count()
    stream_n = tumbling.agg(F.sum("n_events")).collect()[0][0]
    assert stream_n == batch_n


def test_stream_dedup_is_exact_distinct(spark, sf_dir):
    out = stream_dedup_keys(
        events_stream(spark, sf_dir), ["user_id", "event_type"], "1 hour"
    )
    got = run_to_df(out, spark, "append")
    want = load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_stateful_ewma_equals_python_fold(spark, sf_dir):
    from csv2db_spark.sources import load_table
    from csv2db_spark.streaming import events_stream
    from csv2db_spark.streaming.ops import run_to_df, stateful_ewma

    out = run_to_df(
        stateful_ewma(events_stream(spark, sf_dir), "1 hour"), spark, "update"
    )
    # last emission per user is the final state
    got = {}
    for r in out.collect():
        got[r.user_id] = (r.n_obs, r.ewma)
    ev = (
        load_table(spark, sf_dir, "events")
        .where("value IS NOT NULL")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        series.setdefault(r.user_id, []).append(float(r.value))
    alpha = 0.25
    for uid, vals in series.items():
        y = vals[0]
        for v in vals[1:]:
            y = alpha * v + (1.0 - alpha) * y
        n, ewma = got[uid]
        assert n == len(vals)
        assert ewma == y  # identical float fold, bit-exact


def test_stream_ewma_parity_gate_empty_and_nonvacuous(spark, sf_dir):
    """q_stream_ewma_parity: the violations view is empty (streaming
    fold == batch closed form within 1e-8) and the comparison is not
    vacuous — every user with non-NULL values appears on both sides of
    the full join (a wiring bug that emptied either side would trip the
    count check here even though the gate reads empty)."""
    from csv2db_spark.queries.streaming_q import q_stream_ewma_parity
    from csv2db_spark.sources import load_table
    from csv2db_spark.streaming import events_stream
    from csv2db_spark.streaming.ops import run_to_df, stateful_ewma

    assert q_stream_ewma_parity(spark, sf_dir).count() == 0
    out = run_to_df(
        stateful_ewma(events_stream(spark, sf_dir), "1 hour"), spark, "update"
    )
    n_stream = out.select("user_id").distinct().count()
    n_batch = (
        load_table(spark, sf_dir, "events")
        .where("value IS NOT NULL")
        .select("user_id")
        .distinct()
        .count()
    )
    assert n_stream == n_batch > 0


def test_stateful_user_stats_skips_null_values(spark, tmp_path):
    """NULL measurements must not kill the query: pandas cannot cast
    NaN to int64, so the cents fold drops NULLs like SQL SUM
    (round-5 advice). The fixture ships no NULLs, so build one."""
    import datetime as dt

    from csv2db_spark.streaming.ops import run_to_df, stateful_user_stats

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "click", 1.25, t0),
        (1, "view", None, t0 + dt.timedelta(minutes=1)),  # NULL value
        (1, "error", 2.50, t0 + dt.timedelta(minutes=2)),
        (2, "view", None, t0),  # all-NULL user
    ]
    src = str(tmp_path / "null_events")
    spark.createDataFrame(
        rows, "user_id bigint, event_type string, value double, ts timestamp"
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id bigint, event_type string, value double, ts timestamp")
        .parquet(src)
        .withColumn("ts_i", F.col("ts"))
    )
    out = run_to_df(stateful_user_stats(stream, "1 hour"), spark, "update")
    last = {r.user_id: r for r in out.collect()}  # update mode: take rows
    assert last[1].n_events == 3
    assert last[1].sum_value_cents == 375  # 125 + 250, NULL skipped
    assert last[1].last_event_type == "error"
    assert last[2].n_events == 1
    assert last[2].sum_value_cents == 0


def test_buffered_attribution_out_of_order_batches(spark, tmp_path):
    """The order-sensitivity class the cdc fix addressed, for the one
    stateful shape that can't be made order-free algebraically: the
    conversion arrives in an EARLIER micro-batch than its touches
    (adversarial mtime-ordered files, maxFilesPerTrigger=1). The plain
    sequential fold emits nothing; the watermark-buffered fold must
    emit the in-event-time-order answer — the purchase attributed to
    the latest preceding touch."""
    import datetime as dt
    import os
    import shutil

    from csv2db_spark.streaming.ops import (
        run_to_df,
        stateful_attribution,
        stateful_attribution_buffered,
    )

    T0 = dt.datetime(2024, 3, 1, 10, 0, 0)

    def ev(eid, uid, ety, minutes):
        return (eid, uid, ety, T0 + dt.timedelta(minutes=minutes))

    schema = "event_id bigint, user_id bigint, event_type string, ts timestamp"
    src = tmp_path / "cdc_attr_src"
    src.mkdir()

    def stage(rows, name, mtime):
        d = tmp_path / ("w_" + name)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(src / name))
        os.utime(src / name, (mtime, mtime))

    # batch 0: the conversion (t+8min); batch 1: its touches (t, t+5min);
    # batch 2: a sentinel 2h later that pushes the watermark past it all
    stage([ev(3, 1, "purchase", 8)], "b0.parquet", 1_000)
    stage([ev(1, 1, "click", 0), ev(2, 1, "view", 5)], "b1.parquet", 2_000)
    stage([ev(99, 99, "view", 120)], "b2.parquet", 3_000)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .withColumn("ts_i", F.col("ts"))
        )

    buffered = run_to_df(
        stateful_attribution_buffered(stream(), "600 seconds"), spark
    ).collect()
    assert [
        (r.user_id, r.conversion_id, r.touch_id, r.touch_type,
         r.seconds_since_touch)
        for r in buffered
    ] == [(1, 3, 2, "view", 180)]

    # the sequential fold under the same arrival order: conversion saw
    # no touch yet -> zero rows (why the buffered variant exists)
    plain = run_to_df(
        stateful_attribution(stream(), "600 seconds"), spark
    ).collect()
    assert plain == []


def test_buffered_attribution_matches_plain_on_ordered_stream(spark, sf_dir):
    """On the fixture's naturally ordered single-batch stream the
    buffered fold must agree with the sequential fold for every
    conversion that MATURES (event time at or below the final
    watermark); the pending tail inside the last delay window is the
    watermark finality contract, not a discrepancy."""
    from csv2db_spark.streaming.ops import (
        events_stream,
        run_to_df,
        stateful_attribution,
        stateful_attribution_buffered,
    )

    delay = "300 seconds"
    plain = run_to_df(
        stateful_attribution(events_stream(spark, sf_dir), delay), spark
    ).collect()
    buf = run_to_df(
        stateful_attribution_buffered(events_stream(spark, sf_dir), delay),
        spark,
    ).collect()
    max_us = max(r.conversion_ts_us for r in plain) if plain else 0
    wm_us = max_us - 300 * 1_000_000
    key = lambda r: (
        r.user_id, r.conversion_id, r.conversion_ts_us, r.touch_id,
        r.touch_type, r.seconds_since_touch,
    )
    want = sorted(key(r) for r in plain if r.conversion_ts_us <= wm_us)
    got_all = {key(r) for r in buf}
    got_mature = sorted(k for k in got_all if k[2] <= wm_us)
    assert got_mature == want
    # and nothing the buffered op emitted disagrees with the plain fold
    assert got_all <= {key(r) for r in plain}


def test_buffered_ewma_out_of_order_batches(spark, tmp_path):
    """EWMA is a non-commutative recursion: feeding x1, x2, x3 in
    arrival order (x3 first) gives a different smoother than event-time
    order. The buffered variant must produce the event-time-order
    recursion under an adversarial batch split; the plain fold must
    not (which is why the buffered one exists)."""
    import datetime as dt
    import os
    import shutil

    from csv2db_spark.streaming.ops import (
        run_to_df,
        stateful_ewma,
        stateful_ewma_buffered,
    )

    T0 = dt.datetime(2024, 3, 1, 10, 0, 0)

    def ev(eid, uid, val, minutes):
        return (eid, uid, val, T0 + dt.timedelta(minutes=minutes))

    schema = "event_id bigint, user_id bigint, value double, ts timestamp"
    src = tmp_path / "ewma_src"
    src.mkdir()

    def stage(rows, name, mtime):
        d = tmp_path / ("w_" + name)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(src / name))
        os.utime(src / name, (mtime, mtime))

    # event-time order for user 1: 10.0 @t0, 20.0 @t3, 40.0 @t6 —
    # but the LAST value arrives FIRST
    stage([ev(3, 1, 40.0, 6)], "b0.parquet", 1_000)
    stage([ev(1, 1, 10.0, 0), ev(2, 1, 20.0, 3)], "b1.parquet", 2_000)
    stage([ev(99, 99, 1.0, 120)], "b2.parquet", 3_000)  # watermark push

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .withColumn("ts_i", F.col("ts"))
        )

    alpha = 0.25
    want = 10.0
    for v in (20.0, 40.0):
        want = alpha * v + (1 - alpha) * want

    buf = run_to_df(
        stateful_ewma_buffered(stream(), "600 seconds"), spark, "update"
    )
    # update mode emits one row per key per invocation; the final state
    # is the row with the highest matured count (collect order is not
    # emission order)
    u1 = [(r.n_obs, r.ewma) for r in buf.collect() if r.user_id == 1]
    assert max(u1) == (3, want)

    plain = run_to_df(stateful_ewma(stream(), "600 seconds"), spark, "update")
    p1 = [(r.n_obs, r.ewma) for r in plain.collect() if r.user_id == 1]
    assert abs(max(p1)[1] - want) > 1e-9  # arrival order really differs
