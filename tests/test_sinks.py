"""Parquet sink: roundtrip + hive partition layout + pruning proof."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.parquet import load_table, write_table

from .conftest import SF_ORACLE


def test_partitioned_write_roundtrip_and_pruning(spark, tmp_path):
    orders = load_table(spark, SF_ORACLE, "orders")
    out = str(tmp_path / "orders_by_status")
    write_table(orders, out, partition_by="o_orderstatus")

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    pruned = back.filter(F.col("o_orderstatus") == "O")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    # The status predicate must be a partition filter on the scan, not
    # a post-scan filter over all partitions.
    assert "PartitionFilters" in plan
    assert any(
        "o_orderstatus" in line
        for line in plan.splitlines()
        if "PartitionFilters" in line
    ), plan
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "O").count()


def test_append_mode(spark, tmp_path):
    nation = load_table(spark, SF_ORACLE, "nation")
    out = str(tmp_path / "nation")
    write_table(nation, out)
    write_table(nation, out, mode="append")
    assert spark.read.parquet(out).count() == 2 * nation.count()


def test_upsert_partitioned_rewrites_only_touched_partitions(spark, tmp_path):
    """The MERGE-INTO stand-in: a delta touching one partition must
    leave every other partition's files byte-identical on disk (same
    names, same mtimes) while updating/inserting rows correctly."""
    import os

    from pandas_analysis_with_postgres_spark.operators.upsert import (
        upsert_partitioned,
    )

    path = str(tmp_path / "dim")
    dim = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(40)], "k long, grp long, val string"
    )
    write_table(dim, path, partition_by="grp")

    def files(part):
        d = f"{path}/grp={part}"
        return {
            f: os.stat(f"{d}/{f}").st_mtime_ns
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before = {g: files(g) for g in range(4)}

    # Delta: update k=2 (grp=2), insert k=102 (grp=2). grp 0/1/3 untouched.
    staged = spark.createDataFrame(
        [(2, 2, "UPDATED"), (102, 2, "NEW")], "k long, grp long, val string"
    )
    upsert_partitioned(spark, staged, "k", path=path, partition_col="grp")

    after = {g: files(g) for g in range(4)}
    for g in (0, 1, 3):
        assert after[g] == before[g], f"partition grp={g} was rewritten"
    assert after[2] != before[2]

    back = spark.read.parquet(path)
    assert back.count() == 41
    got = {r["k"]: r["val"] for r in back.filter(F.col("grp") == 2).collect()}
    assert got[2] == "UPDATED" and got[102] == "NEW" and got[6] == "v6"


def test_compact_reduces_file_count_preserves_content(spark, tmp_path):
    import os

    from pandas_analysis_with_postgres_spark.sources.parquet import compact

    path = str(tmp_path / "fragmented")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    df.repartition(32).write.parquet(path)
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before == 32

    n_target = compact(spark, path, target_file_mb=128)
    n_after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_after == n_target == 1
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key join WITHOUT a shuffle —
    the co-located-join contract bucketing exists for. Broadcast is
    disabled for the check (a broadcast join would hide the shuffle
    question entirely)."""
    from pandas_analysis_with_postgres_spark.sources.parquet import write_bucketed

    orders = load_table(spark, SF_ORACLE, "orders")
    cust = load_table(spark, SF_ORACLE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(orders, "b_orders", key="o_custkey", buckets=8)
    write_bucketed(cust, "b_cust", key="o_custkey", buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.join(cust, "o_custkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_load_cache_evicts_stale_entries(spark):
    # _LOAD_CACHE must not grow without bound: entries from other
    # applications and superseded mtimes for the same (dir, name) are
    # evicted on insert (round-4 advisor finding).
    from pandas_analysis_with_postgres_spark.sources import parquet as pq

    pq._LOAD_CACHE.clear()
    pq.load_table(spark, "/root/testdata/sf0.001", "region")
    assert len(pq._LOAD_CACHE) == 1
    live_key = next(iter(pq._LOAD_CACHE))
    # simulate a dead session's entry and a stale-mtime entry
    dead = ("app-gone", live_key[1], live_key[2], live_key[3])
    stale = (live_key[0], live_key[1], "nation", 0)
    pq._LOAD_CACHE[dead] = pq._LOAD_CACHE[live_key]
    pq._LOAD_CACHE[stale] = pq._LOAD_CACHE[live_key]
    pq.load_table(spark, "/root/testdata/sf0.001", "nation")
    keys = set(pq._LOAD_CACHE)
    assert dead not in keys  # other-app entry evicted
    assert stale not in keys  # superseded mtime evicted
    assert live_key in keys
    assert len(keys) == 2
