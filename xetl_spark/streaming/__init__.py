"""Structured Streaming surface: windowed/session aggregation,
watermarked dedup, stateful transforms, batch-equivalence harness."""

from xetl_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    run_stream_to_memory,
    sliding_window_agg,
    session_window_agg,
    tumbling_window_agg,
    watermarked_dedup,
)
