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
from xetl_spark.streaming.stateful import (  # noqa: F401
    run_with_foreach_batch,
    running_totals_stateful,
    running_totals_tws,
    streaming_dedup_to_store,
    streaming_minhash_dedup,
)
