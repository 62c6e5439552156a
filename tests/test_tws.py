"""transformWithState (Spark 4 typed-state streaming): the operator is
implemented (streaming.streams.tws_running_totals) but the TWS Python
worker protocol needs google.protobuf, which this container lacks —
the test runs wherever protobuf exists, exactly like the live-Postgres
gate (tests/test_postgres_live.py). Measured failure without it:
"TransformWithStateInPySpark driver worker exited" with
ImportError: google.protobuf.descriptor."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState's Python worker protocol requires protobuf "
    "(not shipped in this container)",
)

SF_DIR = "/root/testdata/sf0.001"


def test_tws_running_totals_match_group_by(spark):
    from pyspark.sql import functions as F

    from pandas_analysis_with_postgres_spark.sources.parquet import load_table
    from pandas_analysis_with_postgres_spark.streaming import (
        events_stream_multibatch,
    )
    from pandas_analysis_with_postgres_spark.streaming.streams import (
        run_available_now,
        tws_running_totals,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        updates = run_available_now(
            tws_running_totals(events_stream_multibatch(spark, SF_DIR)),
            output_mode="update",
            state_partitions=8,
        )
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    final = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in updates.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .collect()
    }
    expect = {
        r.user_id: (r.n, round(r.s, 6))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert final == expect
