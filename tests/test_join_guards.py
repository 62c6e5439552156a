"""Guards on the join operators' scale posture:

- lookup_join's default must NOT force a broadcast — a large "dim"
  has to be free to fall back to a shuffle join (AQE's choice), while
  an explicit broadcast=True must hold even with auto-broadcast off.
- salted_join must refuse right/full joins (replicated right side
  would duplicate unmatched right rows).
- token_value must clamp into [0, 2^15) for non-ASCII / long tokens so
  the 45-bit shingle bound holds in both engines.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators.dedup import (
    TOKEN_BASE,
    token_value,
)
from pandas_analysis_with_postgres_spark.operators.joins import (
    lookup_join,
    salted_join,
)


@pytest.fixture
def no_auto_broadcast(spark):
    """Disable size-based auto-broadcast so hint behavior is isolated."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_lookup_join_default_lets_planner_choose(no_auto_broadcast):
    spark = no_auto_broadcast
    fact = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    plan = lookup_join(fact, dim, "k")._jdf.queryExecution().toString()
    assert "broadcast" not in plan.lower(), (
        "default lookup_join must not force a broadcast on a large dim"
    )


def test_lookup_join_explicit_broadcast_holds(no_auto_broadcast):
    spark = no_auto_broadcast
    fact = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    plan = (
        lookup_join(fact, dim, "k", broadcast=True)
        ._jdf.queryExecution()
        .toString()
    )
    assert "broadcast" in plan.lower()


@pytest.mark.parametrize("how", ["right", "full", "outer"])
def test_salted_join_rejects_right_preserving(spark, how):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(df, df, "k", how=how)


def _day_bucket(c):
    return F.floor(c / F.lit(10)).cast("long")


def test_range_join_inner_boundaries_inclusive(spark):
    from pandas_analysis_with_postgres_spark.operators.joins import range_join

    points = spark.createDataFrame([(0,), (5,), (10,), (11,), (25,)], "p long")
    iv = spark.createDataFrame([(0, 10, "a"), (20, 30, "b")], "s long, e long, tag string")
    got = {
        (r["p"], r["tag"])
        for r in range_join(
            points, iv, point_col="p", start_col="s", end_col="e", bucket=_day_bucket
        ).collect()
    }
    # 0, 5, 10 inside [0,10] (both ends inclusive); 11 matches nothing;
    # 25 inside [20,30].
    assert got == {(0, "a"), (5, "a"), (10, "a"), (25, "b")}


def test_range_join_left_keeps_unmatched_points(spark):
    from pandas_analysis_with_postgres_spark.operators.joins import range_join

    points = spark.createDataFrame([(5,), (99,)], "p long")
    iv = spark.createDataFrame([(0, 10, "a")], "s long, e long, tag string")
    rows = {
        (r["p"], r["tag"])
        for r in range_join(
            points,
            iv,
            point_col="p",
            start_col="s",
            end_col="e",
            bucket=_day_bucket,
            how="left",
        ).collect()
    }
    assert rows == {(5, "a"), (99, None)}


def test_range_join_overlapping_intervals_fan_out(spark):
    from pandas_analysis_with_postgres_spark.operators.joins import range_join

    points = spark.createDataFrame([(5,)], "p long")
    iv = spark.createDataFrame(
        [(0, 10, "a"), (3, 7, "b")], "s long, e long, tag string"
    )
    rows = range_join(
        points, iv, point_col="p", start_col="s", end_col="e", bucket=_day_bucket
    ).collect()
    # One row per covering interval, and exactly one per interval even
    # though both intervals span the same bucket.
    assert sorted(r["tag"] for r in rows) == ["a", "b"]


def test_token_value_clamped_for_adversarial_tokens(spark):
    # Non-ASCII first char (codepoint 128512) and a very long token:
    # unclamped value would be ~2^25, breaking the 45-bit shingle bound.
    rows = spark.createDataFrame(
        [("\U0001f600emoji",), ("x" * 100_000,), ("plain",)], "t string"
    ).select(token_value(F.col("t")).alias("v"))
    vals = [r["v"] for r in rows.collect()]
    assert all(0 <= v < TOKEN_BASE for v in vals), vals
    # ASCII short tokens are unaffected by the clamp (identity).
    assert vals[2] == ord("p") * 256 + 5


def test_bloom_prefiltered_join_equals_plain_join(spark):
    """The bloom prefilter must change only shuffled volume, never the
    result: exact equality with the plain inner join, and the
    prefilter must actually drop rows for a selective small side."""
    from pyspark.sql import functions as F

    from pandas_analysis_with_postgres_spark.operators.joins import (
        bloom_prefiltered_join,
    )
    from pandas_analysis_with_postgres_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )
    from pandas_analysis_with_postgres_spark.sources.parquet import load_table

    from .conftest import SF_ORACLE

    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    small = (
        load_table(spark, SF_ORACLE, "orders")
        .filter(F.col("o_totalprice") > 450_000)
        .select("o_orderkey")
    )
    got = bloom_prefiltered_join(li, small, "l_orderkey", "o_orderkey")
    want = li.join(small, li.l_orderkey == small.o_orderkey)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    survivors = (
        bloom_probe(li, "l_orderkey", bloom_build(small, "o_orderkey"))
        .filter(F.col("in_bloom"))
        .count()
    )
    assert survivors < li.count() * 0.5, (
        "prefilter dropped almost nothing for a selective small side"
    )


def test_bloom_prefiltered_join_rejects_reserved_columns(spark):
    from pandas_analysis_with_postgres_spark.operators.joins import (
        bloom_prefiltered_join,
    )

    big = spark.createDataFrame([(1, 2)], "k long, __h long")
    small = spark.createDataFrame([(1,)], "j long")
    with pytest.raises(ValueError, match="reserved scratch columns"):
        bloom_prefiltered_join(big, small, "k", "j")


def test_bloom_prefiltered_join_same_name_key_unambiguous(spark):
    from pandas_analysis_with_postgres_spark.operators.joins import (
        bloom_prefiltered_join,
    )

    big = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, payload string"
    )
    small = spark.createDataFrame([(3, "a"), (7, "b")], "k long, name string")
    out = bloom_prefiltered_join(big, small, "k", "k")
    # Exactly one k column, and it is referenceable downstream.
    assert out.columns.count("k") == 1
    got = {(r["k"], r["payload"], r["name"]) for r in out.select("k", "payload", "name").collect()}
    assert got == {(3, "v3", "a"), (7, "v7", "b")}
