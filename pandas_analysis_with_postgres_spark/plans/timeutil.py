"""Timezone-independent epoch extraction for oracle-compared plans.

``unix_timestamp(ntz)`` interprets the wall time in the *session*
timezone, while the DuckDB oracle's ``epoch(naive_ts)`` is fixed
UTC — they agree only when the harness session happens to run UTC.
Field arithmetic (days-since-epoch + wall-clock h/m/s) is
timezone-free on TIMESTAMP_NTZ, so the oracle match holds under any
driver session configuration. All expressions stay pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(c: Column) -> Column:
    """Wall-clock seconds since epoch, from date/time fields only."""
    return (
        F.unix_date(c.cast("date")) * F.lit(86400)
        + F.hour(c) * F.lit(3600)
        + F.minute(c) * F.lit(60)
        + F.second(c)
    ).cast("long")


def epoch_micros(c: Column) -> Column:
    """Wall-clock microseconds since epoch (fraction via the SSSSSS
    format field — also timezone-free)."""
    return epoch_seconds(c) * F.lit(1_000_000) + F.date_format(
        c, "SSSSSS"
    ).cast("long")
