from csv2db_spark.streaming.ops import (  # noqa: F401
    events_stream,
    ntz,
    ohlc_window_agg,
    run_to_df,
    session_window_agg,
    sliding_window_agg,
    stateful_user_stats,
    static_enrich_join,
    stream_dedup_keys,
    tumbling_window_agg,
)
