"""global_rank: two-level contiguous ranks ≡ the naive global window,
without its single-task sort."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pandas_analysis_with_postgres_spark.operators.sharding import global_rank
from pandas_analysis_with_postgres_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_ranks_match_naive_global_window(spark):
    orders = load_table(spark, SF, "orders")
    got = {
        (r.o_orderkey, r.rank)
        for r in global_rank(orders, "o_orderkey", bucket_width=512)
        .select("o_orderkey", "rank")
        .collect()
    }
    naive = {
        (r.o_orderkey, r.rank)
        for r in orders.select(
            "o_orderkey",
            F.row_number().over(Window.orderBy("o_orderkey")).alias("rank"),
        ).collect()
    }
    assert got == naive


def test_shards_are_contiguous_and_balanced(spark):
    orders = load_table(spark, SF, "orders")
    n = orders.count()
    sharded = global_rank(orders, "o_orderkey", bucket_width=512, num_shards=7)
    sizes = {
        r.shard: r.cnt
        for r in sharded.groupBy("shard").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(sizes) == set(range(7))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == n
    # shards respect the global order: max rank of shard s < min of s+1
    bounds = {
        r.shard: (r.lo, r.hi)
        for r in sharded.groupBy("shard")
        .agg(F.min("rank").alias("lo"), F.max("rank").alias("hi"))
        .collect()
    }
    for s in range(6):
        assert bounds[s][1] < bounds[s + 1][0]


def test_plan_has_no_single_partition_window(spark):
    orders = load_table(spark, SF, "orders")
    plan = (
        global_rank(orders, "o_orderkey", bucket_width=512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    # the offsets frame joins via broadcast, not a shuffle
    assert "BroadcastHashJoin" in plan
