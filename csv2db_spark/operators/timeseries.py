"""Time-series resampling and gap filling over the events stream — the
hypertable-rollup / downsample-then-interpolate pattern of time-series
engines, expressed as DataFrame ops.

- ``time_bucket``: fixed-width bucket via FIELD arithmetic only
  (date_trunc + minute/hour modulo), so NTZ timestamps never round-trip
  through an epoch and results are independent of the session timezone —
  the same discipline as operators/sessions.py.
- ``resample``: one hash aggregation keyed (user, bucket) — map-side
  partial combine, no sort.
- ``gap_fill``: densify each key's own [min_bucket, max_bucket] span with
  ``sequence`` + explode, left-join observations, then forward-fill with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding row frame.

Scale shape (100 TB): everything shuffles on user_id (or the chosen key)
exactly once; the dense grid is generated per key AFTER aggregation —
grid rows = span/width per key, never events × buckets. A key whose span
is huge relative to the bucket (years of history at 1-minute grain)
bounds its own grid; pre-split by coarser windows if a single key's grid
must not exceed one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from csv2db_spark.functions.numeric import dsum


def time_bucket(ts: Column, hours: int) -> Column:
    """Floor ``ts`` (NTZ) to an ``hours``-wide bucket, by field arithmetic
    (TZ-free): truncate to the hour, then subtract hour-of-day mod width.
    Widths that divide 24 keep buckets aligned to midnight every day."""
    return F.date_trunc("hour", ts) - F.make_interval(
        hours=F.hour(ts) % F.lit(hours)
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    bucket_hours: int = 24,
) -> DataFrame:
    """Time-weighted average (TWAP-style) per (key, bucket) over an
    IRREGULARLY sampled series — the aggregate a plain AVG gets wrong
    whenever sampling density correlates with level (a sensor that
    reports more often when the value spikes, a price feed that ticks
    faster in volatility). Each observation holds its value until the
    next observation in the same bucket; the bucket's last observation
    holds until bucket end (last-observation-carried-forward), so the
    weight of observation i is ``dt_i = min(next_ts, bucket_end) -
    ts_i`` in whole seconds.

    Exactness contract (hash-checkable): dt is INTEGER seconds (NTZ
    timestampdiff — tz-free), the value quantizes to DECIMAL cents, so
    numerator Σ(v·dt) and denominator Σdt are exact on any engine; the
    average itself is ONE IEEE division of those exact operands.
    Simultaneous timestamps get a deterministic ``order_col`` tiebreak
    (the earlier row's dt is 0 — it never holds).

    Scale shape: one window pass keyed (key, bucket) for the lead —
    bounded per-bucket work — then one map-side-combined aggregation;
    the shuffle carries (key, bucket) partials, never raw ticks twice.
    """
    ts = F.col(ts_col)
    bucket = time_bucket(ts, bucket_hours)
    # the epoch-seconds exprs reference only the FIXED internal staging
    # names (_twa_ts/_twa_bucket), never the caller's ts_col — a column
    # name needing backticks (spaces, dots, hyphens) can't break or
    # misresolve the SQL fragment (same identifier discipline as
    # sources/jdbc.py)
    secs = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', _twa_ts)"
    )
    end_secs = (
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', _twa_bucket)"
        )
        + F.lit(bucket_hours * 3600)
    )
    w = Window.partitionBy(*key_cols, "_twa_bucket").orderBy(
        "_twa_ts", order_col
    )
    staged = (
        df.where(F.col(value_col).isNotNull())
        .withColumn("_twa_ts", ts)
        .withColumn("_twa_bucket", bucket)
        .withColumn("_twa_secs", secs)
        .withColumn(
            "_twa_dt",
            F.coalesce(F.lead("_twa_secs").over(w), end_secs)
            - F.col("_twa_secs"),
        )
        .withColumn("_twa_v", F.col(value_col).cast("decimal(14,2)"))
    )
    out = staged.groupBy(*key_cols, "_twa_bucket").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("_twa_v") * F.col("_twa_dt")).alias("_num"),
        F.sum("_twa_dt").cast("long").alias("twa_den_s"),
    )
    return out.select(
        *key_cols,
        F.col("_twa_bucket").alias("bucket"),
        "n_obs",
        F.col("_num").cast("double").alias("twa_num"),
        "twa_den_s",
        (F.col("_num").cast("double") / F.col("twa_den_s").cast("double")).alias(
            "twa"
        ),
    )


def resample(
    events: DataFrame,
    hours: int = 6,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Downsample to one row per (key, bucket): event count + exact-decimal
    value sum."""
    return (
        events.select(
            key_col,
            time_bucket(F.col(ts_col), hours).alias("bucket"),
            value_col,
        )
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(dsum(value_col, 18, 2), 2).alias("sum_value"),
        )
    )


def gap_fill(
    sampled: DataFrame,
    hours: int = 6,
    key_col: str = "user_id",
) -> DataFrame:
    """Densify each key's bucket span and forward-fill ``sum_value``.

    Returns one row per (key, bucket) over the key's own [min, max]
    bucket range: observed rows keep their stats, gap rows get
    n_events=0, sum_value NULL, and ``filled_value`` carries the last
    observed sum forward (NULL before the first observation —
    none exist here since spans start at an observed bucket)."""
    spans = sampled.groupBy(key_col).agg(
        F.min("bucket").alias("b_lo"), F.max("bucket").alias("b_hi")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(
                "b_lo", "b_hi", F.expr(f"INTERVAL '{int(hours)}' HOUR")
            )
        ).alias("bucket"),
    )
    dense = grid.join(sampled, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        key_col,
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


def interpolate_linear(
    dense: DataFrame,
    key_col: str = "user_id",
    value_col: str = "sum_value",
) -> DataFrame:
    """Linear interpolation across the gap rows of a densified series
    (run ``gap_fill`` first): each NULL value becomes
    ``prev + (next - prev) * (steps_from_prev / gap_width)``; a trailing
    run with no next observation forward-fills, a leading run with no
    previous observation backward-fills.

    All position arithmetic is integer (row numbers within the key) and
    the float expression is evaluated in one fixed order, so the result
    is engine-reproducible bit-for-bit. Two window passes over the same
    (key, bucket) sort — Spark executes them in a single exchange+sort.
    """
    order = Window.partitionBy(key_col).orderBy("bucket")
    wp = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    v = F.col(value_col)
    d = dense.withColumn("_rn", F.row_number().over(order))
    prev_v = F.last(value_col, ignorenulls=True).over(wp)
    next_v = F.first(value_col, ignorenulls=True).over(wn)
    prev_rn = F.last(F.when(v.isNotNull(), F.col("_rn")), ignorenulls=True).over(wp)
    next_rn = F.first(F.when(v.isNotNull(), F.col("_rn")), ignorenulls=True).over(wn)
    interp = prev_v + (next_v - prev_v) * (
        (F.col("_rn") - prev_rn).cast("double") / (next_rn - prev_rn)
    )
    return d.withColumn(
        "interp_value",
        F.when(v.isNotNull(), v).otherwise(F.coalesce(interp, prev_v, next_v)),
    ).drop("_rn")


def ohlc_bars(
    events: DataFrame,
    hours: int = 6,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Candlestick downsampling: one (key, bucket) row with the first
    (open), max (high), min (low), and last (close) observation plus the
    event count — the financial-bars twin of ``resample``.

    Open/close pick an EXISTING value via ``min_by``/``max_by`` on the
    composite ordering key ``struct(ts, id)`` (id breaks timestamp ties
    deterministically), so no float arithmetic happens at all — every
    output number is an input number or a count, bit-reproducible on any
    engine ordering rows any way.

    Scale shape: a single hash aggregation with map-side combine; the
    shuffle carries one partial bar per (key, bucket) per task. min_by /
    max_by fold pairwise like min/max — no sort, no window."""
    order_key = F.struct(F.col(ts_col), F.col(id_col))
    v = F.col(value_col)
    return (
        events.select(
            key_col,
            time_bucket(F.col(ts_col), hours).alias("bucket"),
            ts_col,
            id_col,
            value_col,
        )
        .groupBy(key_col, "bucket")
        .agg(
            F.min_by(v, order_key).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order_key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def ewma(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = 6,
) -> DataFrame:
    """Exponentially weighted moving average with decay 1/2 over the last
    ``k`` observations of each series — the streaming-smoother pattern,
    made exactly reproducible.

    The textbook EWMA is an unbounded recursion (y_t = a*x_t +
    (1-a)*y_{t-1}); truncating at ``k`` lags turns it into a finite
    weighted sum whose weights (1/2)^j are EXACT decimals, so with the
    input quantized to decimal(14,4) both numerator and denominator are
    exact decimal sums — order-free — and the smoothed value is ONE IEEE
    division of identical doubles on any engine. At decay 1/2 the
    truncation error is bounded by 2^-k of the oldest weight (< 2% of
    the estimate at k=6), which is the deliberate contract: a
    deterministic approximation beats an irreproducible exact recursion
    for cross-engine validation.

    Scale shape: one sort-shuffle on the series key; the ``k`` lags are
    one window pass (Spark evaluates all lag offsets in a single sort).
    Rows per key are unbounded but the state per row is k values."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    v = F.col(value_col).cast("decimal(14,4)")
    terms = []
    present = []
    for j in range(k):
        wj = F.lit(1 / 2**j).cast(f"decimal(10,{max(j, 1)})")
        lagged = F.lag(v, j).over(w)
        terms.append(
            F.coalesce(
                (lagged * wj).cast("decimal(24,10)"),
                F.lit(0).cast("decimal(24,10)"),
            )
        )
        present.append(
            F.when(lagged.isNotNull(), wj.cast("decimal(24,10)")).otherwise(
                F.lit(0).cast("decimal(24,10)")
            )
        )
    num = terms[0]
    den = present[0]
    for t in terms[1:]:
        num = (num + t).cast("decimal(24,10)")
    for p in present[1:]:
        den = (den + p).cast("decimal(24,10)")
    return events.select(
        key_col,
        ts_col,
        id_col,
        value_col,
        num.cast("decimal(30,10)").alias("ewma_num"),
        den.cast("decimal(30,10)").alias("ewma_den"),
    ).withColumn(
        "ewma",
        F.col("ewma_num").cast("double") / F.col("ewma_den").cast("double"),
    )


def mad_outliers(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    n_mads: int = 3,
) -> DataFrame:
    """Robust per-group outlier detection by median absolute deviation:
    flag rows with |x - median| > n_mads * MAD. Unlike the z-score gate
    (queries/advanced.py:q_events_zscore_outliers) this survives the
    outliers it hunts — mean/stddev are dragged by the very tail values,
    medians are not (50% breakdown point vs 0%).

    Exactness: the median is defined as the ⌈n/2⌉-th ORDER STATISTIC of
    the quantized value (lower median) — a selection, not an
    interpolation, so the result is an input value and tie order between
    equal values cannot change it. Deviations are exact decimal
    subtractions and the threshold compare multiplies integers — no
    float anywhere.

    Scale shape: two sort-shuffles on the group key (rank values, then
    rank deviations) plus two 1-row-per-group broadcast-sized joins.
    Exact per-group medians fundamentally need a per-group sort; groups
    here are low-cardinality (event types), each sort is parallel over
    its group's rows. For billions of rows per group swap the selection
    for operators/profile.histogram_quantile (bounded shuffle) at the
    cost of bucket resolution."""
    v = F.col(value_col).cast("decimal(14,4)")
    # NULL measurements are excluded up front: Spark windows sort NULLs
    # first, DuckDB last — dropping them keeps the rank selection
    # engine-independent (and a NULL can't be an outlier anyway).
    rows = events.where(F.col(value_col).isNotNull()).select(
        key_col, id_col, v.alias("_v")
    )
    wv = Window.partitionBy(key_col).orderBy("_v")
    wk = Window.partitionBy(key_col)
    med = (
        rows.withColumn("_rn", F.row_number().over(wv))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .where(F.col("_rn") == F.floor((F.col("_n") + 1) / 2))  # lower median
        .select(key_col, F.col("_v").alias("_med"))
    )
    dev = rows.join(med, key_col).withColumn("_dev", F.abs(F.col("_v") - F.col("_med")))
    wd = Window.partitionBy(key_col).orderBy("_dev")
    mad = (
        dev.withColumn("_rn", F.row_number().over(wd))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .where(F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
        .select(key_col, F.col("_dev").alias("_mad"))
    )
    return (
        dev.join(mad, key_col)
        .where(F.col("_dev") > F.lit(n_mads) * F.col("_mad"))
        .select(
            key_col,
            id_col,
            F.col("_v").cast("double").alias("value"),
            F.col("_med").cast("double").alias("group_median"),
            F.col("_mad").cast("double").alias("group_mad"),
        )
    )


def seasonal_outliers(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    n_sigmas: int = 3,
) -> DataFrame:
    """Seasonality-aware 3-sigma anomalies: the z-score test of
    queries/advanced.q_events_zscore_outliers, but against each
    (key, HOUR-OF-DAY) profile instead of the key's global distribution —
    a value normal at the daily peak can be anomalous at 4am; a global
    z-score never sees that.

    Same exact-integer discipline as the global gate: quantize v at 1e3,
    sufficient statistics (n, s, s2) as decimal(38,0), and the flag
    (n·v − s)² > σ²·(n·s2 − s²) — no division, sqrt, or float anywhere,
    so both engines flag identical rows. Same overflow domain: exact to
    3e12 rows PER (key, hour) bucket at |value| ≤ 500 (see the global
    gate's derivation; hour-of-day splits every group 24 ways, widening
    the real margin further).

    hour() on an NTZ timestamp is pure field arithmetic — no session-
    timezone dependence (the discipline of ``time_bucket``). One
    map-combined stats pass over (key, hod) + one broadcast join of
    24·|keys| stat rows back onto the scan."""
    q = events.select(
        id_col,
        key_col,
        F.hour(F.col(ts_col)).alias("hod"),
        (F.col(value_col).cast("decimal(18,3)") * 1000).cast("long").alias("_v"),
    )
    stats = q.groupBy(key_col, "hod").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(F.col("_v").cast("decimal(38,0)")).alias("_s"),
        F.sum(F.col("_v").cast("decimal(38,0)") * F.col("_v")).alias("_s2"),
    )
    vdec = F.col("_v").cast("decimal(38,0)")
    dev = F.col("_n") * vdec - F.col("_s")
    var_n2 = F.col("_n") * F.col("_s2") - F.col("_s") * F.col("_s")
    return (
        q.join(F.broadcast(stats), [key_col, "hod"])
        .where(dev * dev > n_sigmas * n_sigmas * var_n2)
        .select(
            id_col,
            key_col,
            "hod",
            (F.col("_v").cast("double") / 1000).alias("value"),
        )
    )


def winsorize(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    lo_p: float = 0.01,
    hi_p: float = 0.99,
) -> DataFrame:
    """Winsorization: clip each group's values at its [lo_p, hi_p]
    percentile bounds — the standard tail-taming preprocessing step
    before mean-based statistics (the z-score gate's mean/stddev are
    exactly what raw tails distort).

    The bounds are ORDER STATISTICS of the quantized values (rank =
    max(1, ceil(p·n)) — selections, same discipline as mad_outliers),
    so clipping compares exact decimals against exact decimals and the
    output is hash-reproducible: every value is either an input value
    or one of two per-group input bounds.

    Scale shape: one per-group sort to rank (irreducible for exact
    percentile bounds; swap in histogram_quantile bounds for the
    bounded-shuffle variant), one broadcast of 2·|groups| bound rows
    back onto the scan. Returns the input rows plus (lo_bound,
    hi_bound, value_winsorized, was_clipped)."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("decimal(14,4)")
    rows = events.where(F.col(value_col).isNotNull())
    wv = Window.partitionBy(key_col).orderBy(v)
    wk = Window.partitionBy(key_col)
    ranked = rows.select(
        "*",
        F.row_number().over(wv).alias("_rn"),
        F.count(F.lit(1)).over(wk).alias("_n"),
    )
    lo_target = F.greatest(F.lit(1), F.ceil(F.lit(lo_p) * F.col("_n")))
    hi_target = F.greatest(F.lit(1), F.ceil(F.lit(hi_p) * F.col("_n")))
    bounds = (
        ranked.select(
            key_col,
            F.when(F.col("_rn") == lo_target, v).alias("_lo"),
            F.when(F.col("_rn") == hi_target, v).alias("_hi"),
        )
        .groupBy(key_col)
        .agg(F.max("_lo").alias("lo_bound"), F.max("_hi").alias("hi_bound"))
    )
    out = rows.join(F.broadcast(bounds), key_col)
    clipped = F.greatest(F.least(v, F.col("hi_bound")), F.col("lo_bound"))
    return out.select(
        "*",
        clipped.cast("double").alias("value_winsorized"),
        (
            (v < F.col("lo_bound")) | (v > F.col("hi_bound"))
        ).alias("was_clipped"),
    ).withColumn("lo_bound", F.col("lo_bound").cast("double")) \
     .withColumn("hi_bound", F.col("hi_bound").cast("double"))


def impute_group_median(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """NULL imputation with the group's lower-median — the robust
    default for filling measurement gaps (a mean imputation inherits
    the tails; the median is an actual observed value). Returns the
    input plus (value_imputed, was_imputed).

    The median is the same ⌈n/2⌉-th order statistic as mad_outliers —
    a selection of quantized decimals, engine-exact — computed over the
    non-NULL rows only and broadcast back as |groups| rows. A group
    with no observed values at all keeps NULL (nothing to impute from).
    One per-group sort + one broadcast join."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("decimal(14,4)")
    obs = events.where(F.col(value_col).isNotNull()).select(key_col, v.alias("_v"))
    wv = Window.partitionBy(key_col).orderBy("_v")
    wk = Window.partitionBy(key_col)
    med = (
        obs.select(
            key_col,
            "_v",
            F.row_number().over(wv).alias("_rn"),
            F.count(F.lit(1)).over(wk).alias("_n"),
        )
        .where(F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
        .select(key_col, F.col("_v").cast("double").alias("_med"))
    )
    out = events.join(F.broadcast(med), key_col, "left")
    return out.select(
        "*",
        F.coalesce(F.col(value_col), F.col("_med")).alias("value_imputed"),
        F.col(value_col).isNull().alias("was_imputed"),
    ).drop("_med")


def seasonal_decompose(
    series: DataFrame,
    key_col: str = "event_type",
    bucket_col: str = "bucket",
    value_col: str = "sum_value",
    half_window: int = 12,
    period_hours: int = 24,
) -> DataFrame:
    """Classical additive seasonal decomposition of a regular series:
    trend = centered moving average (±``half_window`` rows), seasonal =
    per-(hour-of-period) mean of the detrended values, residual = the
    rest — the STL-lite view (trend/seasonal/residual) behind capacity
    planning and anomaly baselines.

    Run on a REGULAR series (resample first; gap_fill if sparse — the
    centered frame is a rows frame, so missing buckets would shift it).

    Hash-exactness via FLOOR-based re-quantization: the trend is an
    exact decimal frame-sum divided once (identical doubles); the
    detrended double then becomes an integer via floor(d·1e6) — floor
    of an identical double is identical everywhere, unlike a
    double→decimal CAST, which DuckDB evaluates in float arithmetic and
    so diverges near rounding midpoints (caught by the sf0.001 parity
    sweep). The seasonal level is floor(sum/count) of those exact longs
    and the residual is an exact integer subtraction — raw doubles are
    never re-summed.

    Scale shape: one sort-shuffle per key for the centered frame (all
    window evaluations share it) + one (key, hour-of-period) aggregate
    of |keys|·period rows broadcast back."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("decimal(18,6)")
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(-half_window, half_window)
    )
    trend = (F.sum(v).over(w).cast("double") / F.count(v).over(w)).alias("trend")
    base = series.select(
        key_col,
        bucket_col,
        v.cast("double").alias("value"),
        trend,
        (F.hour(bucket_col) % F.lit(period_hours)).alias("_hop"),
    )
    detr = base.withColumn(
        "_dq",
        F.floor((F.col("value") - F.col("trend")) * F.lit(1e6)).cast("long"),
    )
    seasonal = detr.groupBy(key_col, "_hop").agg(
        F.floor(
            F.sum("_dq").cast("double") / F.count(F.lit(1)).cast("double")
        )
        .cast("long")
        .alias("_sq"),
    )
    return (
        detr.join(F.broadcast(seasonal), [key_col, "_hop"])
        .select(
            key_col,
            bucket_col,
            "value",
            "trend",
            (F.col("_sq").cast("double") / F.lit(1e6)).alias("seasonal"),
            (
                (F.col("_dq") - F.col("_sq")).cast("double") / F.lit(1e6)
            ).alias("residual"),
        )
    )


def linear_trend(
    df: DataFrame,
    key_cols: list[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-key ordinary-least-squares line fit from sufficient
    statistics: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept =
    (Σy − slope·Σx)/n — the one-pass closed form every monitoring
    system uses for "is this metric drifting". ``x`` must be an
    integer-valued column (epoch seconds, shifted near zero to keep
    Σx² small) and ``y`` a DECIMAL quantization of the measurement, so
    all five sufficient statistics are EXACT on any engine and the only
    IEEE arithmetic is the final division chain in one fixed order —
    bit-identical cross-engine, hash-checkable.

    Keys with fewer than 2 points or a degenerate x range (den = 0)
    are dropped — no line exists.

    Scale shape: ONE map-side-combined aggregation per key (five
    partial sums); the shuffle carries one 5-number partial per key per
    task, never rows. The same statistics are mergeable
    (trend_sufficient_stats partials fold with plain +), which is what
    the streaming rollup gate maintains incrementally."""
    return trend_from_stats(
        trend_sufficient_stats(df, key_cols, x, y), key_cols
    )


def trend_sufficient_stats(
    df: DataFrame, key_cols: list[str], x: Column, y: Column
) -> DataFrame:
    """The five OLS sufficient statistics per key — exact decimals, all
    additive, so disjoint-batch partials merge by SUM (the mergeable-
    sketch property the streaming trend rollup relies on)."""
    xd = x.cast("decimal(18,0)")
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(xd).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(xd * y).alias("_sxy"),
        F.sum(xd * xd).alias("_sxx"),
    )


def trend_from_stats(s: DataFrame, key_cols: list[str]) -> DataFrame:
    """Finish the OLS fit from (merged) sufficient statistics — the
    division chain runs on exact decimal inputs in one fixed order, so
    one-shot and incrementally-merged statistics yield identical bits."""
    den = F.col("n_points") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    num = F.col("n_points") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")
    ) / F.col("n_points")
    return (
        s.where((F.col("n_points") >= 2) & (den != 0))
        .select(
            *key_cols,
            "n_points",
            slope.alias("slope"),
            intercept.alias("intercept"),
        )
    )


def rolling_autocorr(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    n: int = 20,
) -> DataFrame:
    """Rolling lag-1 autocorrelation per key — the memory/trendiness
    signal of a measurement stream (near +1: momentum; near 0: noise;
    negative: mean reversion), over a sliding window of the last ``n``
    (x, y = previous x) pairs.

    Pearson r needs a sqrt, which no two engines round identically —
    so, same trick as the silhouette and z-score gates: report the
    algebraically equivalent pair (sign(num), r² = num²/(d1·d2)) from
    EXACT integer sufficient statistics (value quantized at 1e3,
    rolling sums as decimal(38,0), num = c·Σxy − ΣxΣy, d = c·Σx² −
    (Σx)²; each term stays under 2^53 so its int→double cast is exact,
    then two IEEE multiplies and one division are correctly rounded) —
    bit-identical across engines, and sign·sqrt(r²) recovers r whenever
    a consumer wants the float. Windows with a
    constant side (d1·d2 = 0) report NULL r², undefined like Pearson.
    Overflow: |num| ≤ n·max(|v|)² ≈ 1e14 at n=20, |value| ≤ 500 →
    num² ≈ 1e28, inside decimal(38,0) exactly.

    Shape at scale: ONE per-key sort serves both the lag and the
    rolling sums (same window spec); no join, no second scan. Only
    full windows (exactly n pairs) are emitted, so warm-up rows never
    produce unstable estimates."""
    q = events.select(
        key_col,
        order_col,
        (F.col(value_col).cast("decimal(18,3)") * 1000)
        .cast("long")
        .alias("_x"),
    )
    w = Window.partitionBy(key_col).orderBy(order_col)
    paired = q.withColumn("_y", F.lag("_x").over(w)).where(
        F.col("_y").isNotNull()
    )
    roll = w.rowsBetween(-(n - 1), 0)
    xd = F.col("_x").cast("decimal(38,0)")
    yd = F.col("_y").cast("decimal(38,0)")
    stats = paired.select(
        key_col,
        order_col,
        F.count(F.lit(1)).over(roll).cast("decimal(38,0)").alias("_c"),
        F.sum(xd).over(roll).alias("_sx"),
        F.sum(yd).over(roll).alias("_sy"),
        F.sum(xd * yd).over(roll).alias("_sxy"),
        F.sum(xd * xd).over(roll).alias("_sx2"),
        F.sum(yd * yd).over(roll).alias("_sy2"),
    ).where(F.col("_c") == n)
    num = F.col("_c") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    d1 = F.col("_c") * F.col("_sx2") - F.col("_sx") * F.col("_sx")
    d2 = F.col("_c") * F.col("_sy2") - F.col("_sy") * F.col("_sy")
    # cast the ~1e14-magnitude EXACT integers to double BEFORE squaring:
    # each fits under 2^53 so the casts are exact on every engine, and
    # from there it's three correctly-rounded IEEE ops — whereas casting
    # the ~1e28 squares would hit not-correctly-rounded int128→double
    # conversions (observed 1-2 ulp drift in DuckDB)
    num_d, d1_d, d2_d = (c.cast("double") for c in (num, d1, d2))
    return stats.select(
        key_col,
        order_col,
        F.signum(num_d).cast("int").alias("corr_sign"),
        F.when(d1 * d2 > 0, (num_d * num_d) / (d1_d * d2_d)).alias(
            "corr_sq"
        ),
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    allowance_milli: int,
    threshold_milli: int,
) -> DataFrame:
    """One-sided CUSUM drift detection per key — the classic
    sequential changepoint statistic C_i = max(0, C_{i-1} + x_i − k),
    flagged when C exceeds h (Page 1954). The recursion looks
    stream-only, but it has an exact closed form over the prefix sums:

        C_i = S_i − min_{j ≤ i} S_j,   S_i = Σ_{t ≤ i} (x_t − k)

    so the batch twin is ONE window pass per key (cumulative sum +
    running min over the same sort) — no recursion, no UDF, no
    iterative joins; at 100 TB it costs exactly one keyed sort-shuffle,
    like any running aggregate.

    Exactness: values enter as exact milli-scaled longs
    (decimal(18,3)·1000), the allowance k and threshold h are integer
    milli parameters, and every statistic is an integer — the flagged
    set hash-verifies bit for bit. Emits only the buckets where the
    statistic crosses h, with the statistic and prefix state for
    audit."""
    v_milli = (
        F.col(value_col).cast("decimal(18,3)") * 1000
    ).cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(bucket_col).alias("bucket"),
        v_milli.alias("_v"),
    )
    w = Window.partitionBy("key").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = base.withColumn(
        "_s", F.sum(F.col("_v") - F.lit(allowance_milli)).over(w)
    )
    out = stepped.withColumn("_low", F.min(F.least(F.col("_s"), F.lit(0))).over(w))
    return (
        out.withColumn("cusum_milli", F.col("_s") - F.col("_low"))
        .where(F.col("cusum_milli") > threshold_milli)
        .select(
            F.col("key").alias(key_col),
            F.col("bucket").alias(bucket_col),
            F.col("_v").alias("value_milli"),
            F.col("_s").alias("prefix_milli"),
            "cusum_milli",
        )
    )


def date_spine(
    spark,
    start: str,
    end: str,
) -> DataFrame:
    """Generated calendar dimension — the date spine every warehouse
    joins facts against (gap-free reporting, business-day logic,
    fiscal rollups) without maintaining a physical table: one
    ``sequence(start, end, 1 day)`` explode plus derived fields.

    TZ-free: the spine is DATE arithmetic end to end (day-of-week via
    ``dayofweek`` on dates — no timestamp, no session-timezone
    dependence). Generation is a single-row sequence exploded on the
    executors; at any scale the spine is |days| rows — broadcast-sized
    for decades of days — and joins to facts as a broadcast dimension.
    """
    days = F.explode(
        F.sequence(
            F.lit(start).cast("date"),
            F.lit(end).cast("date"),
            F.expr("interval 1 day"),
        )
    ).alias("d")
    base = spark.range(1).select(days)
    dow = F.dayofweek("d")  # 1=Sunday ... 7=Saturday
    return base.select(
        F.col("d").alias("date"),
        F.year("d").alias("year"),
        F.month("d").alias("month"),
        F.dayofmonth("d").alias("day"),
        dow.alias("day_of_week"),
        ((dow >= 2) & (dow <= 6)).alias("is_weekday"),
        F.quarter("d").alias("quarter"),
        F.date_trunc("month", F.col("d")).cast("date").alias("month_start"),
    )
