"""salted_join: result-equivalence with the plain join, plus the salt
column never leaks. Determinism matters (salt from xxhash64 of the row,
not rand()) — re-running must give identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators.joins import salted_join
from pandas_analysis_with_postgres_spark.sources.parquet import load_table

from .conftest import SF_ORACLE


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_ORACLE, "orders")
    cust = load_table(spark, SF_ORACLE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey", "inner")
    salted = salted_join(orders, cust, "o_custkey", salt=8)
    assert salted.columns == plain.columns
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    cust = load_table(spark, SF_ORACLE, "customer")
    orders = load_table(spark, SF_ORACLE, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    plain = cust.join(orders, "c_custkey", "left")
    salted = salted_join(cust, orders, "c_custkey", how="left", salt=4)
    assert salted.count() == plain.count()
    unmatched = salted.filter(F.col("o_orderkey").isNull()).count()
    assert unmatched == plain.filter(F.col("o_orderkey").isNull()).count()


def test_auto_salted_join_salts_skewed_and_degrades_even(spark):
    from pandas_analysis_with_postgres_spark.operators.joins import auto_salted_join

    # Skewed fixture: one hot key holds ~80% of rows.
    hot = [(1, f"p{i}") for i in range(8000)]
    rest = [(2 + i % 100, f"q{i}") for i in range(2000)]
    skewed = spark.createDataFrame(hot + rest, "k long, payload string")
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 102)], "k long, name string"
    )
    joined = auto_salted_join(skewed, dim, "k")
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan or "pmod(xxhash64" in plan, plan
    plain = skewed.join(dim, "k")
    assert joined.count() == plain.count()
    assert joined.exceptAll(plain).count() == 0

    # Even fixture: uniform keys — must degrade to a plain join.
    even = spark.createDataFrame(
        [(i % 100, f"r{i}") for i in range(10000)], "k long, payload string"
    )
    joined_even = auto_salted_join(even, dim, "k")
    plan_even = joined_even._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" not in plan_even and "pmod(xxhash64" not in plan_even, plan_even
    assert joined_even.count() == even.join(dim, "k").count()
