"""Unit pins for the data-quality quarantine split (q58's core)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.functions.dq import (
    split_valid,
    violation_flags,
)


def _rules():
    return {
        "null_v": F.col("v").isNotNull(),
        "v_pos": F.col("v").isNotNull() & (F.col("v") > 0),
        "name_short": F.length("name") <= 3,
    }


def test_split_valid_partitions_rows(spark):
    df = spark.createDataFrame(
        [(1, 5, "ok"), (2, -1, "ok"), (3, None, "toolong"), (4, 7, "fine")],
        "id long, v long, name string",
    )
    clean, quarantined = split_valid(df, _rules())
    assert {r["id"] for r in clean.collect()} == {1}
    bad = {r["id"]: r["violations"] for r in quarantined.collect()}
    assert bad[2] == ["v_pos"]
    assert bad[3] == ["null_v", "v_pos", "name_short"]
    assert bad[4] == ["name_short"]
    # Exhaustive + disjoint: every row lands on exactly one side.
    assert clean.count() + quarantined.count() == df.count()


def test_null_rule_counts_as_pass(spark):
    """A rule evaluating to NULL (not written null-safely) passes —
    the documented WHERE-like semantics."""
    df = spark.createDataFrame([(1, None)], "id long, v long")
    flagged = violation_flags(df, {"v_pos_unsafe": F.col("v") > 0})
    assert flagged.collect()[0]["violations"] == []
