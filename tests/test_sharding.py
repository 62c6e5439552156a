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


def test_write_shards_layout_manifest_and_order(spark, tmp_path):
    import json

    from pandas_analysis_with_postgres_spark.operators.sharding import (
        write_shards,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", F.size(F.split("text", " ")).alias("n_tokens")
    )
    path = str(tmp_path / "shards")
    man = write_shards(docs, path, "doc_id", 4, token_col="n_tokens")
    n = docs.count()
    assert man["total_rows"] == n
    assert set(man["shards"]) == {0, 1, 2, 3}
    sizes = [man["shards"][s]["rows"] for s in range(4)]
    assert max(sizes) - min(sizes) <= 1
    # manifest on disk matches the returned one (keys back as strings)
    disk = json.load(open(f"{path}/_shards.json"))
    assert disk["total_rows"] == n and len(disk["shards"]) == 4
    # shards are contiguous rank ranges in global doc_id order
    for s in range(3):
        assert man["shards"][s]["hi"] + 1 == man["shards"][s + 1]["lo"]
    # a single shard reads back partition-pruned and holds exactly the
    # lowest doc_ids for shard 0
    shard0 = spark.read.option("basePath", path).parquet(f"{path}/shard=0")
    ids = sorted(r.doc_id for r in shard0.collect())
    all_ids = sorted(r.doc_id for r in docs.collect())
    assert ids == all_ids[: len(ids)]
    # token sums add up
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(man["shards"][s]["token_sum"] for s in range(4)) == total_tokens


def test_write_shards_more_shards_than_rows_has_no_manifest_holes(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.operators.sharding import (
        write_shards,
    )

    df = spark.createDataFrame([(1, 5), (2, 6), (3, 7)], "k long, w long")
    man = write_shards(df, str(tmp_path / "s"), "k", 8, token_col="w")
    assert set(man["shards"]) == set(range(8))
    assert man["total_rows"] == 3
    assert sum(s["rows"] for s in man["shards"].values()) == 3
    empty = [s for s in range(8) if man["shards"][s]["rows"] == 0]
    assert len(empty) == 5
    for s in empty:
        assert man["shards"][s] == {"rows": 0, "lo": None, "hi": None, "token_sum": 0}


def test_global_rank_rejects_null_keys(spark):
    from pandas_analysis_with_postgres_spark.operators.sharding import (
        global_rank,
    )
    import pytest

    df = spark.createDataFrame([(1,), (None,)], "k long")
    with pytest.raises(ValueError, match="NULL"):
        global_rank(df, "k")


def test_global_rank_pins_nondeterministic_sources(spark):
    """A rand-derived order key must yield the same contiguous ranks in
    the bucket-count pass and the rank join (the input plan is
    localCheckpoint-pinned inside global_rank); without the pin the two
    evaluations see different keys → gapped/duplicate ranks."""
    orders = load_table(spark, SF, "orders").select("o_orderkey")
    # new random key every evaluation; seed-less rand is re-drawn per job
    nondet = orders.withColumn(
        "k", (F.rand() * 1_000_000_000).cast("long") * 10_000 + F.col("o_orderkey")
    )
    ranked = global_rank(nondet, "k", bucket_width=1 << 30)
    rows = ranked.select("rank").collect()
    n = nondet.count()
    ranks = sorted(r.rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_write_shards_jsonl_format(spark, tmp_path):
    """file_format="json": same layout/ordering/manifest, JSONL files
    a trainer loader can stream directly."""
    import json as _json
    import os

    orders = load_table(spark, SF, "orders").select("o_orderkey")
    out = str(tmp_path / "jshards")
    man = __import__(
        "pandas_analysis_with_postgres_spark.operators.sharding",
        fromlist=["write_shards"],
    ).write_shards(orders, out, "o_orderkey", 4, file_format="json")
    assert man["num_shards"] == 4
    # shard 0 holds the lowest keys, files are real JSONL
    sdir = os.path.join(out, "shard=0")
    files = [f for f in os.listdir(sdir) if f.endswith(".json")]
    assert files
    with open(os.path.join(sdir, files[0])) as f:
        first = _json.loads(f.readline())
    assert first["rank"] == 1
    # and the manifest totals match the parquet variant's contract
    assert sum(sh["rows"] for sh in man["shards"].values()) == orders.count()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported shard format"):
        __import__(
            "pandas_analysis_with_postgres_spark.operators.sharding",
            fromlist=["write_shards"],
        ).write_shards(orders, out, "o_orderkey", 4, file_format="csvx")
