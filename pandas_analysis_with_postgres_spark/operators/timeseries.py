"""Time-series regularization: resample onto a fixed grid + gap fill.

Sensor/event streams arrive irregularly; every downstream consumer
(feature windows, anomaly baselines, training tensors) wants a regular
grid. The reference has no time-series surface at all (its only
timestamps are ETL bookkeeping, SURVEY §1), so this is extension
surface, built from four scale-safe pieces:

1. per-(key, bucket) LAST observation — one map-side-combinable
   ``max(struct(ts, tiebreak, value))`` aggregate (deterministic: the
   struct order is (ts, tiebreak), both unique together);
2. the global grid span — a 1-row aggregate broadcast to every key
   (the q12 defaults pattern);
3. the dense grid — ``sequence() × explode`` per key, a narrow map
   producing |keys| × |buckets| rows (that product IS the output size,
   so nothing here is super-linear);
4. forward fill — ``last(value, ignorenulls=True)`` over a
   per-key ordered window: one shuffle on the key, state bounded by
   the grid length.

Two shuffles total (aggregate, window), both on the series key —
at 100 TB the window never sees raw events, only the |buckets|-bounded
per-key grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def resample_ffill(
    events: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    interval: str = "1 day",
    bucket: Column | None = None,
) -> DataFrame:
    """Resample ``value_col`` onto a regular ``interval`` grid per
    ``key_col``, forward-filling gaps from the last observation.

    Returns ``(key_col, bucket_ts, n_obs, value_ffill)`` — one row per
    key per grid bucket across the TABLE's global time span: ``n_obs``
    counts that bucket's raw events (0 for gaps), ``value_ffill`` is
    the value of the latest observation at or before the bucket
    (latest by ``(ts, tiebreak)``), NULL until the key's first
    observation. ``bucket`` overrides the default
    ``date_trunc``-by-interval bucketing expression.
    """
    parts = interval.split()
    unit = parts[-1].rstrip("s")
    mult = parts[0] if len(parts) == 2 else "1"
    if bucket is None:
        if mult != "1":
            # date_trunc cannot express a multi-unit grid; without a
            # caller-supplied bucket the observations would land on
            # off-grid buckets and silently vanish in the grid join.
            raise ValueError(
                f"interval {interval!r} needs an explicit `bucket` "
                "expression (date_trunc only supports 1-unit grids)"
            )
        bucket = F.date_trunc(unit, F.col(ts_col))
    obs = (
        events.select(
            key_col,
            bucket.alias("bucket_ts"),
            F.struct(ts_col, tiebreak_col, value_col).alias("__o"),
        )
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.max("__o").getField(value_col).alias("__last_v"),
        )
    )
    # Span endpoints come from the BUCKET expression, not date_trunc of
    # raw ts: a caller-supplied bucket (required for multi-unit grids)
    # may use anchors date_trunc knows nothing about (e.g. epoch-based
    # 2-day boundaries), and a span drawn from a different anchor
    # produces grid values that never equal any observation bucket —
    # every observation silently vanishing in the left join below, the
    # exact loss mode the mult != 1 guard exists to prevent. min/max of
    # the bucket itself is by construction on-grid, and for the default
    # bucket min(date_trunc(ts)) ≡ date_trunc(min(ts)).
    span = events.agg(
        F.min(bucket).alias("__lo"),
        F.max(bucket).alias("__hi"),
    )
    grid = (
        events.select(key_col)
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("__lo"), F.col("__hi"), F.expr(f"interval {interval}")
                )
            ).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, [key_col, "bucket_ts"], "left")
        .select(
            key_col,
            "bucket_ts",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            F.last("__last_v", ignorenulls=True).over(w).alias("value_ffill"),
        )
    )


def interpolate_linear(
    df: DataFrame,
    *,
    key_col: str,
    ts_num_col: str,
    value_col: str,
    out_col: str = "value_interp",
) -> DataFrame:
    """Linear interpolation of ``value_col``'s NULLs per key — pandas
    ``Series.interpolate(method="index")`` semantics (a.k.a.
    ``method="values"``): interior NULLs take the TIME-WEIGHTED line
    over the ``ts_num_col`` axis between the surrounding
    observations. (pandas ``method="linear"`` treats points as
    EQUALLY spaced and only coincides with this on a uniform grid;
    on an irregular series the two differ — this operator implements
    the index-weighted semantics, which is the physically meaningful
    one for a time series.) LEADING NULLs stay NULL (nothing to
    anchor the line), TRAILING NULLs carry the last observation
    forward (the pandas default's forward limit direction).

    ``ts_num_col`` must be a NUMERIC time axis (e.g. the epoch seconds
    of ``plans.timeutil.epoch_seconds`` — numeric so the oracle's
    arithmetic replays bit-for-bit and no timezone interpretation
    leaks in) that is UNIQUE per key: it is both the sort key and the
    interpolation abscissa.

    Plan shape: two per-key ordered windows (last-non-null looking
    back, first-non-null looking ahead) — ONE shuffle on the key, no
    joins, no Python. Window state is bounded by the frame walk, so a
    100 TB table interpolates in a single stage after its shuffle;
    keys are independent, so skew follows key cardinality, not gap
    length. The blend ``prev + (next − prev) · (t − t_prev) /
    (t_next − t_prev)`` is evaluated in this exact association both
    here and in the SQL oracle — IEEE-identical doubles."""
    w_back = (
        Window.partitionBy(key_col)
        .orderBy(ts_num_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(ts_num_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    t = F.col(ts_num_col).cast("double")
    obs_t = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_t = F.last(obs_t, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_t = F.first(obs_t, ignorenulls=True).over(w_fwd)
    blend = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    out = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(prev_v.isNull(), F.lit(None).cast("double"))  # leading
        .when(next_v.isNull(), prev_v.cast("double"))  # trailing carry
        .otherwise(blend)
    )
    return df.withColumn(out_col, out)
