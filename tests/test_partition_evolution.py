"""Partition spec evolution (Iceberg's signature trick): re-declare
the partition column with a metadata-only commit; old directories keep
their layout, appends land under the new spec, reads union both,
partition-NAME-semantics operations refuse while mixed, and the full
compaction is the migration that lifts every refusal. Plus
append_snapshot — the ingest fast path that stays legal while mixed."""

from __future__ import annotations

from pathlib import Path

import pytest

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    append_snapshot,
    compact_snapshot,
    delete_where,
    evolve_partition_spec,
    evolve_snapshot_schema,
    manifest_aggregate,
    manifest_approx_distinct,
    manifest_group_stats,
    manifest_partition_counts,
    manifest_range_count,
    merge_snapshot,
    read_manifest,
    read_snapshot,
    replace_partitions,
    write_snapshot,
)

SCHEMA = "k long, etype string, shard long, v double"


@pytest.fixture()
def tbl(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], i % 4, float(i)) for i in range(40)],
        SCHEMA,
    )
    path = str(tmp_path / "tbl")
    write_snapshot(df, path, "etype", stats_cols=["v"])
    return path


def _new(spark, n=8):
    return spark.createDataFrame(
        [(100 + i, "d", i % 4, 1000.0 + i) for i in range(n)], SCHEMA
    )


def test_evolution_is_metadata_only(spark, tbl):
    m1 = read_manifest(tbl, 1)
    v = evolve_partition_spec(tbl, "shard")
    m2 = read_manifest(tbl, v)
    # zero data movement: every partition carried by reference
    assert m2["partitions"] == m1["partitions"]
    assert m2["operation"] == "evolve-spec"
    assert m2["schema"]["partition_col"] == "shard"
    assert m2["schema"]["prior_specs"] == [{"col": "etype", "type": "string"}]
    # no file churn on disk
    files = sorted(p.name for p in Path(tbl).rglob("*.parquet"))
    assert len(files) > 0
    # reads unchanged
    assert read_snapshot(spark, tbl).count() == 40


def test_mixed_read_unions_both_layouts(spark, tbl):
    evolve_partition_spec(tbl, "shard")
    append_snapshot(tbl, _new(spark), "shard")
    df = read_snapshot(spark, tbl)
    assert df.count() == 48
    # both spec columns come back TYPED, from dir names or data alike
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["etype"] == "string" and types["shard"] == "bigint"
    got = {(r.k, r.etype, r.shard) for r in df.collect()}
    assert (0, "a", 0) in got and (100, "d", 0) in got
    # value-correct across layouts
    assert df.groupBy().sum("v").collect()[0][0] == sum(range(40)) + sum(
        1000.0 + i for i in range(8)
    )


def test_global_manifest_answers_survive_mixed(spark, tbl):
    evolve_partition_spec(tbl, "shard")
    append_snapshot(tbl, _new(spark), "shard")
    agg = manifest_aggregate(tbl, columns=["v"])
    assert agg["n_rows"] == 48
    assert agg["columns"]["v"]["max"] == 1007.0
    # stats-proven range count is spec-independent
    assert manifest_range_count(tbl, "v", lo=999.5) == 8
    assert manifest_range_count(tbl, "v", lo=2000.0) == 0


def test_partition_value_semantics_refuse_while_mixed(spark, tbl):
    evolve_partition_spec(tbl, "shard")
    append_snapshot(tbl, _new(spark), "shard")
    with pytest.raises(ValueError, match="old-spec"):
        manifest_partition_counts(tbl)
    with pytest.raises(ValueError, match="old-spec"):
        manifest_aggregate(tbl, where_partition=("shard", 1))
    with pytest.raises(ValueError, match="old-spec"):
        manifest_group_stats(tbl, ["v"])
    assert manifest_range_count(tbl, "shard", lo=1) is None
    with pytest.raises(ValueError, match="retired partition spec"):
        merge_snapshot(tbl, _new(spark), "k", "shard")
    with pytest.raises(ValueError, match="retired partition spec"):
        replace_partitions(tbl, _new(spark), "shard")
    with pytest.raises(ValueError, match="retired partition spec"):
        delete_where(spark, tbl, "v < 5")


def test_compaction_migrates_and_lifts_refusals(spark, tbl):
    evolve_partition_spec(tbl, "shard")
    append_snapshot(tbl, _new(spark), "shard")
    compact_snapshot(spark, tbl)
    assert sorted(manifest_partition_counts(tbl)) == [
        (0, 12), (1, 12), (2, 12), (3, 12),
    ]
    merge_snapshot(
        tbl,
        spark.createDataFrame([(0, "a", 0, 9999.0)], SCHEMA),
        "k",
        "shard",
    )
    df = read_snapshot(spark, tbl)
    assert df.count() == 48
    assert df.where("k = 0").collect()[0].v == 9999.0
    # history: the mixed version still reads after migration
    assert read_snapshot(spark, tbl, 3).count() == 48


def test_writer_pcol_must_match_current_spec(spark, tbl):
    with pytest.raises(ValueError, match="partitioned by 'etype'"):
        merge_snapshot(tbl, _new(spark), "k", "shard")
    evolve_partition_spec(tbl, "shard")
    with pytest.raises(ValueError, match="partitioned by 'shard'"):
        append_snapshot(tbl, _new(spark), "etype")


def test_evolution_guards(spark, tbl):
    with pytest.raises(ValueError, match="already partitioned"):
        evolve_partition_spec(tbl, "etype")
    with pytest.raises(ValueError, match="not a data column"):
        evolve_partition_spec(tbl, "nope")
    with pytest.raises(ValueError, match="unsupported partition column"):
        evolve_partition_spec(tbl, "v")  # double: renders differently
    # tombstones must compact away first
    delete_where(spark, tbl, "k = 1", mode="merge-on-read", key="k")
    with pytest.raises(ValueError, match="tombstones"):
        evolve_partition_spec(tbl, "shard")
    # retired spec columns are protected from rename/drop
    compact_snapshot(spark, tbl)
    evolve_partition_spec(tbl, "shard")
    with pytest.raises(ValueError, match="partition/index column"):
        evolve_snapshot_schema(tbl, renames={"etype": "etype2"})
    with pytest.raises(ValueError, match="partition/index column"):
        evolve_snapshot_schema(tbl, drops=["etype"])


def test_per_partition_ndv_refuses_mixed_global_survives(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], i % 4, i % 7) for i in range(40)],
        "k long, etype string, shard long, uid long",
    )
    path = str(tmp_path / "hll_tbl")
    write_snapshot(df, path, "etype", stats_cols=["uid::hll"])
    evolve_partition_spec(path, "shard")
    append_snapshot(
        path,
        spark.createDataFrame(
            [(100, "c", 0, 100), (101, "c", 1, 101)],
            "k long, etype string, shard long, uid long",
        ),
        "shard",
    )
    # the merged registers never touch partition names: still answers
    est = manifest_approx_distinct(path, "uid")
    assert 7 <= est <= 11  # 9 true distinct, HLL tolerance
    with pytest.raises(ValueError, match="old-spec"):
        manifest_approx_distinct(path, "uid", by_partition=True)


def test_append_snapshot_semantics(spark, tmp_path):
    path = str(tmp_path / "app_tbl")
    df = spark.createDataFrame([(1, 0, 1.0), (2, 1, 2.0)], "k long, p long, v double")
    write_snapshot(df, path, "p", stats_cols=["v"])
    # pure add: brand-new partition → old dirs carried by reference
    m1 = read_manifest(path)
    append_snapshot(
        path, spark.createDataFrame([(3, 2, 3.0)], "k long, p long, v double"), "p"
    )
    m2 = read_manifest(path)
    assert m2["partitions"]["p=0"] == m1["partitions"]["p=0"]
    assert m2["partitions"]["p=1"] == m1["partitions"]["p=1"]
    assert read_snapshot(spark, path).count() == 3
    # revisited partition: existing ∪ new (no keying, duplicates kept)
    append_snapshot(
        path, spark.createDataFrame([(1, 0, 9.0)], "k long, p long, v double"), "p"
    )
    rows = sorted(
        (r.k, r.v) for r in read_snapshot(spark, path).where("p = 0").collect()
    )
    assert rows == [(1, 1.0), (1, 9.0)]
    # stats maintained on the rewritten partition
    assert read_manifest(path)["stats"]["p=0"]["v"][:2] == [1.0, 9.0]
    # txn idempotence
    v = append_snapshot(
        path, spark.createDataFrame([(7, 3, 7.0)], "k long, p long, v double"),
        "p", txn=("app", 1),
    )
    assert append_snapshot(
        path, spark.createDataFrame([(7, 3, 7.0)], "k long, p long, v double"),
        "p", txn=("app", 1),
    ) == v
    assert read_snapshot(spark, path).count() == 5
