"""Structured Streaming surface (SURVEY §2.11 extension, §7.7).

The reference is pure batch; this package adds the streaming
capability a 100 TB pipeline needs: event-time windowed aggregation
(tumbling / sliding / session) with watermark-bounded state, stateful
dedup, and a ``foreachBatch`` sink that reuses the batch upsert
operator for streaming dimension maintenance.
"""

from .streams import (
    dedup_within_watermark,
    events_stream,
    events_stream_multibatch,
    foreach_batch_sink,
    stream_dedup_ingest,
    stream_semantic_dedup_ingest,
    stream_ivfpq_ingest,
    stream_quality_gate,
    stream_append_sink,
    stream_merge_sink,
    stream_optout_sink,
    run_available_now,
    session_window_agg,
    sliding_window_counts,
    split_events_by_time,
    tumbling_window_counts,
    windowed_hll_registers,
)

__all__ = [
    "events_stream",
    "events_stream_multibatch",
    "split_events_by_time",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_agg",
    "dedup_within_watermark",
    "run_available_now",
    "foreach_batch_sink",
    "stream_dedup_ingest",
    "stream_semantic_dedup_ingest",
    "stream_ivfpq_ingest",
    "stream_quality_gate",
    "stream_append_sink",
    "stream_merge_sink",
    "stream_optout_sink",
    "windowed_hll_registers",
]
