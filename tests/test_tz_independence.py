"""Oracle agreement must not depend on the harness session timezone.

The driver runs queries in ITS OWN SparkSession; with TIMESTAMP_NTZ
fixtures, ``unix_timestamp`` would silently shift epoch values under a
non-UTC session while DuckDB's ``epoch(naive)`` stays fixed — the
reason plans/timeutil.py extracts epochs from wall-clock fields
instead. This test pins that property by running the epoch-emitting
queries under a deliberately hostile session timezone."""

from __future__ import annotations

import duckdb
import pytest

from pandas_analysis_with_postgres_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE

EPOCH_QUERIES = (
    "q19_user_sessions",
    "a74_rolling_spend",
    "a82_session_funnel",
    "a84_event_sequences",
    "a87_event_transitions",
    "z73_interpolate_linear",
)


@pytest.mark.parametrize("name", EPOCH_QUERIES)
def test_epoch_queries_survive_non_utc_session(spark, name):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")  # UTC+5:45
    try:
        sdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    con = duckdb.connect()
    for t in ("orders", "events", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    odf = con.execute(ORACLES[name]).df()
    con.close()
    assert len(sdf) == len(odf)
    s = sdf.reindex(sorted(sdf.columns), axis=1).sort_values(
        by=sorted(sdf.columns), ignore_index=True
    )
    o = odf.reindex(sorted(odf.columns), axis=1).sort_values(
        by=sorted(odf.columns), ignore_index=True
    )
    for col in s.columns:
        # Series.equals treats aligned NaN/None as equal (z73's leading
        # gaps are legitimately NULL floats; `==` would fail on NaN)
        assert s[col].equals(o[col]) or list(s[col]) == list(o[col]), (
            f"{name}.{col} diverged under UTC+5:45"
        )
