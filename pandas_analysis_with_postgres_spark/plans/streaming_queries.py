"""Streaming queries (Structured Streaming over `events`) with DuckDB
oracles.

Each query runs a real streaming job: file-source read of the events
fixture → event-time windowed aggregation / stateful dedup → memory
sink drained with ``availableNow``. The returned DataFrame is the
emitted (append-mode) result, so the oracle must replay Structured
Streaming's emission rule, not just the aggregation:

- final watermark = ms-truncated max event time − delay;
- append mode emits exactly the windows with window_end <= watermark
  (pinned empirically and in tests/test_streaming.py);
- session windows: a new session starts when the inter-event gap is
  >= the session gap (windows are half-open, [start, last+gap));
- streaming dedup emits every first-seen key.

That makes even the streaming surface hash-verified against SQL — the
driver's strongest check — rather than the weaker rows-only path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..streaming import (
    dedup_within_watermark,
    events_stream_multibatch,
    run_available_now,
    session_window_agg,
    sliding_window_counts,
    tumbling_window_counts,
)

#: Final-watermark expression shared by the oracles: ms truncation
#: mirrors Spark's millisecond watermark against micro-precision data.
_WM = (
    "(SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 10 MINUTE FROM events)"
)


def q36_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows over a ≥3-micro-batch replay (time-split files,
    one per trigger): windows close incrementally as the watermark
    advances batch-by-batch, yet the final append output equals the
    single-batch result because the time-ordered split never produces a
    late event (tests/test_streaming.py pins both)."""
    return run_available_now(
        tumbling_window_counts(events_stream_multibatch(spark, sf_dir))
    )


Q36_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type, COUNT(*) AS n_events
FROM events
GROUP BY 1, 2, 3
HAVING window_end <= {_WM}
"""


def q37_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows over a ≥3-micro-batch replay: session state
    (open sessions) carries across micro-batches and closes when the
    advancing watermark passes session end; the time-ordered split
    never produces a late event, so the final append output equals the
    single-batch sessionization the oracle replays."""
    return run_available_now(
        session_window_agg(events_stream_multibatch(spark, sf_dir))
    )


Q37_SQL = f"""
WITH seq AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM seq
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM flagged
),
sessions AS (
  SELECT MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 30 MINUTE AS session_end,
         user_id, COUNT(*) AS n_events
  FROM numbered GROUP BY user_id, sess
)
SELECT session_start, session_end, user_id, n_events
FROM sessions WHERE session_end <= {_WM}
"""


def q38_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate the stream (union with a second subscription of the
    same source) and dedup statefully: every event must come out
    exactly once."""
    a = events_stream_multibatch(spark, sf_dir)
    b = events_stream_multibatch(spark, sf_dir)
    deduped = dedup_within_watermark(a.union(b), ["event_id"])
    out = run_available_now(deduped)
    return out.select("event_id", "ts", "user_id", "event_type", "value")


Q38_SQL = "SELECT event_id, ts, user_id, event_type, value FROM events"


def q39_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows over a ≥3-micro-batch replay (same emission
    argument as q36 — each event lands in 2 overlapping windows, and
    windows close incrementally as the per-batch watermark advances)."""
    return run_available_now(
        sliding_window_counts(events_stream_multibatch(spark, sf_dir))
    )


Q39_SQL = f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, event_type FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type
  FROM events
)
SELECT ws AS window_start, ws + INTERVAL 1 HOUR AS window_end,
       event_type, COUNT(*) AS n_events
FROM assigned
GROUP BY 1, 2, 3
HAVING window_end <= {_WM}
"""


def q47_stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState per-user counter across ≥3 micro-batches
    (time-split files, one per trigger). Update mode emits one row per
    (user, batch-where-user-appeared); a real deployment pairs update
    mode with an upsert sink where the last write per key wins, so the
    query models that sink contract: the counter is monotone, making
    final state = MAX(n_events) per user. The result is
    batch-count-invariant and SQL-equivalent to a plain GROUP BY — the
    oracle — no matter how the source was chopped into batches."""
    from ..streaming.streams import stateful_user_counts

    updates = run_available_now(
        stateful_user_counts(events_stream_multibatch(spark, sf_dir)),
        output_mode="update",
    )
    return updates.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


Q47_SQL = "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id"


def q55_stream_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream is enriched against the
    static customer dimension *inside* the streaming query (Spark
    re-plans the join per micro-batch; the broadcast hint keeps it a
    map-side lookup — no stream-side shuffle, no state), then windowed
    per market segment. The join adds no state and does not interact
    with the watermark, so the append emission rule is exactly q36's."""
    from ..sources.parquet import load_table

    ev = events_stream_multibatch(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = ev.join(F.broadcast(cust), "user_id")
    return run_available_now(
        tumbling_window_counts(enriched, group_cols=("c_mktsegment",))
    )


Q55_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       c_mktsegment, COUNT(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2, 3
HAVING window_end <= {_WM}
"""


def q56_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarked interval condition:
    each click matches the same user's purchases within the following
    hour. Both sides are stateful; the time-range predicate is what
    lets Spark bound that state (a click is evictable once the purchase
    watermark passes click_ts + 1h). Replayed as ≥3 time-ordered
    micro-batches, so matches genuinely span batch boundaries — and the
    time-ordered split guarantees no match is ever watermark-dropped
    (a purchase in batch i+1 is newer than every batch-i timestamp, so
    its candidate clicks are never yet evictable). Final append output
    therefore equals the batch interval join — the oracle."""
    clicks = (
        events_stream_multibatch(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        events_stream_multibatch(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & F.col("purchase_ts").between(
            F.col("click_ts"), F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        ),
    )
    return run_available_now(joined).select(
        "click_id", "purchase_id", "user_id", "click_ts", "purchase_ts"
    )


Q56_SQL = """
SELECT a.event_id AS click_id, b.event_id AS purchase_id,
       a.user_id, a.ts AS click_ts, b.ts AS purchase_ts
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts BETWEEN a.ts AND a.ts + INTERVAL 1 HOUR
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
"""


def q72_stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-user counting per hourly window via
    HyperLogLog registers as the stream state (sketches × streaming):
    ``max(rho)`` is both a valid streaming aggregate and the HLL merge,
    so the sketch accumulates correctly across ≥3 micro-batches with
    state bounded at windows × 256 rows — the unbounded-stream answer
    to COUNT(DISTINCT). The drained (append-mode) register rows are
    collapsed to estimates as a batch step; the oracle replays the
    registers from the raw events for exactly the watermark-closed
    windows and the estimates hash-match (8-decimal contract, see
    q66)."""
    from ..operators.sketches import hll_estimate
    from ..streaming import windowed_hll_registers

    regs = run_available_now(
        windowed_hll_registers(events_stream_multibatch(spark, sf_dir))
    )
    est = hll_estimate(regs, ["window_start", "window_end"])
    return est.select(
        "window_start",
        "window_end",
        F.round(F.col("hll_estimate"), 8).alias("hll_estimate"),
    )


def _q72_oracle() -> str:
    from .extension_queries import _hll_pipeline_sql

    return f"""
WITH u AS (
  SELECT date_trunc('hour', ts) AS ws, user_id AS v FROM events
  WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= {_WM}
),
{_hll_pipeline_sql("u", "ws")}
SELECT ws AS window_start, ws + INTERVAL 1 HOUR AS window_end,
       round(hll_estimate, 8) AS hll_estimate
FROM est
"""


Q72_SQL = _q72_oracle()


def q93_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless map-only streaming transform — the highest-throughput
    streaming shape (no watermark, no state store, no shuffle: each
    micro-batch is a pure projection, so executors scale linearly).
    Per event: cents quantization, hour-of-day, JSON prop extraction.
    Append mode with no aggregation emits every row exactly once
    regardless of how the replay is batched, so the oracle is the
    identical batch projection."""
    from .timeutil import epoch_seconds

    stream = events_stream_multibatch(spark, sf_dir)
    return run_available_now(
        stream.select(
            "event_id",
            "user_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
            ((epoch_seconds(F.col("ts")) % 86400) / F.lit(3600))
            .cast("long")
            .alias("hour_utc"),
            F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        )
    )


Q93_SQL = """
SELECT event_id, user_id, event_type,
       CAST(FLOOR(value * 100) AS BIGINT) AS cents,
       CAST((CAST(FLOOR(epoch(ts)) AS BIGINT) % 86400) // 3600 AS BIGINT) AS hour_utc,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM events
"""


STREAMING_QUERIES = {
    "q36_stream_hourly_counts": q36_stream_hourly_counts,
    "q37_stream_sessions": q37_stream_sessions,
    "q38_stream_dedup": q38_stream_dedup,
    "q39_stream_sliding_counts": q39_stream_sliding_counts,
    "q47_stream_stateful_counts": q47_stream_stateful_counts,
    "q55_stream_enriched_counts": q55_stream_enriched_counts,
    "q56_stream_stream_join": q56_stream_stream_join,
    "q72_stream_hll_users": q72_stream_hll_users,
    "q93_stream_enrich": q93_stream_enrich,
}

STREAMING_ORACLES = {
    "q36_stream_hourly_counts": Q36_SQL,
    "q37_stream_sessions": Q37_SQL,
    "q38_stream_dedup": Q38_SQL,
    "q39_stream_sliding_counts": Q39_SQL,
    "q47_stream_stateful_counts": Q47_SQL,
    "q55_stream_enriched_counts": Q55_SQL,
    "q56_stream_stream_join": Q56_SQL,
    "q72_stream_hll_users": Q72_SQL,
    "q93_stream_enrich": Q93_SQL,
}
