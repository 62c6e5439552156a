"""resample_ffill: grid completeness, forward fill, tie-breaking."""

from __future__ import annotations

import datetime as dt

from pandas_analysis_with_postgres_spark.operators.timeseries import (
    resample_ffill,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_grid_ffill_and_leading_nulls(spark):
    d = dt.datetime
    rows = [
        # user 1: obs on day 1 and day 3 → day 2 gap forward-fills 10.0
        (1, d(2024, 1, 1, 5), 1, 10.0),
        (2, d(2024, 1, 3, 6), 1, 30.0),
        # user 2: first obs on day 3 → days 1-2 are NULL
        (3, d(2024, 1, 3, 1), 2, 7.0),
        # day 4 exists only via user 2 → user 1 forward-fills 30.0 there
        (4, d(2024, 1, 4, 2), 2, 9.0),
    ]
    out = {
        (r.user_id, r.bucket_ts.day): (r.n_obs, r.value_ffill)
        for r in resample_ffill(
            _events(spark, rows),
            key_col="user_id",
            ts_col="ts",
            value_col="value",
            tiebreak_col="event_id",
        ).collect()
    }
    # full 2-user × 4-day grid
    assert len(out) == 8
    assert out[(1, 1)] == (1, 10.0)
    assert out[(1, 2)] == (0, 10.0)  # gap forward-filled
    assert out[(1, 3)] == (1, 30.0)
    assert out[(1, 4)] == (0, 30.0)  # trailing fill
    assert out[(2, 1)] == (0, None)  # before first observation
    assert out[(2, 2)] == (0, None)
    assert out[(2, 3)] == (1, 7.0)
    assert out[(2, 4)] == (1, 9.0)


def test_same_bucket_latest_wins_with_tiebreak(spark):
    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 1), 1, 1.0),
        (3, d(2024, 1, 1, 2), 1, 3.0),  # same ts as event 2, higher id
        (2, d(2024, 1, 1, 2), 1, 2.0),
    ]
    out = resample_ffill(
        _events(spark, rows),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
    ).collect()
    assert len(out) == 1
    assert out[0].n_obs == 3 and out[0].value_ffill == 3.0


def test_hourly_interval(spark):
    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 0, 10), 1, 5.0),
        (2, d(2024, 1, 1, 3, 50), 1, 8.0),
    ]
    out = sorted(
        resample_ffill(
            _events(spark, rows),
            key_col="user_id",
            ts_col="ts",
            value_col="value",
            tiebreak_col="event_id",
            interval="1 hour",
        ).collect(),
        key=lambda r: r.bucket_ts,
    )
    assert [r.bucket_ts.hour for r in out] == [0, 1, 2, 3]
    assert [r.value_ffill for r in out] == [5.0, 5.0, 5.0, 8.0]


def test_multi_unit_interval_without_bucket_is_rejected(spark):
    import datetime as dt
    import pytest

    ev = _events(spark, [(1, dt.datetime(2024, 1, 1), 1, 1.0)])
    with pytest.raises(ValueError, match="explicit `bucket`"):
        resample_ffill(
            ev,
            key_col="user_id",
            ts_col="ts",
            value_col="value",
            tiebreak_col="event_id",
            interval="2 days",
        )


def test_custom_bucket_with_non_trunc_anchor_keeps_observations(spark):
    """Code-review regression: the grid span must be computed from the
    BUCKET expression, not date_trunc of raw ts — an epoch-based 2-day
    bucket is not aligned to date_trunc('day') anchors, and a
    mismatched span silently drops every observation (n_obs=0
    everywhere)."""
    import datetime as dt

    from pyspark.sql import functions as F

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 2, 5), 1, 10.0),
        (2, d(2024, 1, 5, 6), 1, 50.0),
    ]
    # epoch-based 2-day boundaries: NOT what date_trunc('day') anchors
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") - (F.unix_timestamp("ts") % (2 * 86400)))
    )
    out = resample_ffill(
        _events(spark, rows),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
        interval="2 days",
        bucket=bucket,
    ).collect()
    # both observations land on-grid (pre-fix: n_obs was 0 everywhere)
    assert sum(r.n_obs for r in out) == 2
    filled = {r.bucket_ts: (r.n_obs, r.value_ffill) for r in out}
    # grid endpoints are the observations' own (epoch-anchored) buckets
    assert len(filled) == 2
    assert sorted(v for _, v in filled.values()) == [10.0, 50.0]


def test_interpolate_linear_pandas_semantics(spark):
    from pandas_analysis_with_postgres_spark.operators.timeseries import (
        interpolate_linear,
    )

    rows = [
        # key a: leading gap, interior gaps (uneven spacing), trailing
        ("a", 0, None),
        ("a", 10, 1.0),
        ("a", 20, None),
        ("a", 40, 4.0),
        ("a", 45, None),
        ("a", 50, None),
        # key b: all observed
        ("b", 0, 7.0),
        ("b", 1, 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {
        (r.k, r.t): r.value_interp
        for r in interpolate_linear(
            df, key_col="k", ts_num_col="t", value_col="v"
        ).collect()
    }
    assert out[("a", 0)] is None  # leading stays NULL
    assert out[("a", 10)] == 1.0
    # interior: time-weighted, not index-weighted — 10/30 of the way
    assert abs(out[("a", 20)] - 2.0) < 1e-12
    assert out[("a", 40)] == 4.0
    assert out[("a", 45)] == 4.0 and out[("a", 50)] == 4.0  # trailing carry
    assert out[("b", 0)] == 7.0 and out[("b", 1)] == 8.0
    # pandas agreement on the same series
    import pandas as pd

    ser = pd.Series(
        [None, 1.0, None, 4.0, None, None],
        index=[0, 10, 20, 40, 45, 50],
    ).interpolate(method="index")
    got = [out[("a", t)] for t in (10, 20, 40, 45, 50)]
    assert got == list(ser.iloc[1:]), (got, list(ser))
