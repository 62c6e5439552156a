"""Multi-column partition specs in the snapshot layer (r9 verdict ask
#3): ``write_snapshot(df, path, ["day", "source"])`` lays out nested
hive directories ``day=…/source=…``, manifests key partitions by the
composite name, stats/blooms/sums/HLLs/hists are collected per
composite partition, and spec evolution can move a 1-column table to a
2-column spec without rewriting old data (compact migrates).
Operations whose semantics need per-level values and are not yet
generalized (merge-on-read delete) refuse loudly on multi-column
tables instead of operating on the first component alone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    append_snapshot,
    compact_snapshot,
    delete_where,
    evolve_partition_spec,
    manifest_aggregate,
    merge_snapshot,
    read_manifest,
    read_snapshot,
    replace_partitions,
    table_info,
    write_snapshot,
)

DDL = "k bigint, day string, source string, v bigint"


def _mk(spark, rows):
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(
        _mk(
            spark,
            [
                (1, "d1", "web", 10),
                (2, "d1", "api", 20),
                (3, "d2", "web", 30),
                (4, "d2", "api", 40),
            ],
        ),
        path,
        ["day", "source"],
        stats_cols=["v"],
    )
    return path


def test_roundtrip_and_manifest_names(spark, tbl):
    got = sorted(
        map(tuple, read_snapshot(spark, tbl).select("k", "day", "source", "v").collect())
    )
    assert got == [
        (1, "d1", "web", 10),
        (2, "d1", "api", 20),
        (3, "d2", "web", 30),
        (4, "d2", "api", 40),
    ]
    man = read_manifest(tbl)
    assert sorted(man["partitions"]) == [
        "day=d1/source=api",
        "day=d1/source=web",
        "day=d2/source=api",
        "day=d2/source=web",
    ]
    meta = man["schema"]
    assert meta["partition_spec"] == ["day", "source"]
    assert meta["partition_types"] == ["string", "string"]
    assert "partition_col" not in meta
    # per-composite-partition stats recorded
    st = man["stats"]["day=d1/source=web"]
    assert st["::n_rows"] == 1 and st["v"][:2] == [10, 10]
    info = table_info(tbl)
    assert info["partition_spec"] == ["day", "source"]


def test_append_and_partition_filter(spark, tbl):
    append_snapshot(tbl, _mk(spark, [(5, "d3", "web", 50)]), ["day", "source"])
    df = read_snapshot(spark, tbl)
    assert df.count() == 5
    only = read_snapshot(
        spark, tbl, partition_filter=lambda p: p.startswith("day=d1/")
    )
    assert sorted(r["k"] for r in only.collect()) == [1, 2]
    # appends revisiting a composite partition rewrite it as union
    append_snapshot(tbl, _mk(spark, [(6, "d1", "web", 60)]), ["day", "source"])
    got = read_snapshot(
        spark, tbl, partition_filter=lambda p: p == "day=d1/source=web"
    )
    assert sorted(r["k"] for r in got.collect()) == [1, 6]


def test_spec_mismatch_refuses(spark, tbl):
    with pytest.raises(ValueError, match="partitioned by"):
        append_snapshot(tbl, _mk(spark, [(9, "d9", "web", 90)]), "day")
    with pytest.raises(ValueError, match="partitioned by"):
        merge_snapshot(
            tbl, _mk(spark, [(9, "d9", "web", 90)]), "k", ["source", "day"]
        )


def test_stats_pruning_and_count(spark, tbl):
    # column_ranges prune at the composite-partition grain
    pruned = read_snapshot(spark, tbl, column_ranges={"v": (35, None)})
    assert sorted(r["k"] for r in pruned.collect()) == [4]
    assert pruned.filter(F.col("v") >= 35).count() == 1
    agg = manifest_aggregate(tbl, columns=["v"])
    assert agg["n_rows"] == 4 and agg["n_partitions"] == 4
    assert agg["columns"]["v"] == {"min": 10, "max": 40}


def test_bloom_point_lookup(spark, tmp_path):
    path = str(tmp_path / "tb")
    write_snapshot(
        _mk(spark, [(i, f"d{i % 2}", "web" if i % 3 else "api", i * 10)
                    for i in range(1, 21)]),
        path,
        ["day", "source"],
        bloom_cols=["k"],
    )
    hit = read_snapshot(spark, path, point_lookups={"k": 7})
    assert sorted(r["k"] for r in hit.filter("k = 7").collect()) == [7]
    man = read_manifest(path)
    # bitmaps exist under composite names
    assert all("k" in b for b in man["blooms"].values())


def test_sketch_stats_on_composite_partitions(spark, tmp_path):
    path = str(tmp_path / "ts")
    write_snapshot(
        _mk(spark, [(i, "d1" if i <= 3 else "d2", "s", i) for i in range(1, 7)]),
        path,
        ["day", "source"],
        stats_cols=["v::sum", "k::hll", "v::hist:2"],
    )
    man = read_manifest(path)
    st = man["stats"]["day=d1/source=s"]
    assert st["v::sum"] == [6, 3]  # 1+2+3
    assert len(st["k::hll"]) == 256
    assert st["v::hist:2"] == [[0, 1], [1, 2]]  # floor(v/2): 0,1,1


def test_replace_partitions_composite(spark, tbl):
    replace_partitions(
        tbl, _mk(spark, [(7, "d1", "web", 70)]), ["day", "source"]
    )
    got = sorted(r["k"] for r in read_snapshot(spark, tbl).collect())
    assert got == [2, 3, 4, 7]  # day=d1/source=web fully replaced


def test_delete_where_cow_composite(spark, tbl):
    res = delete_where(spark, tbl, F.col("k") == 3)
    assert res["deleted_rows"] == 1
    assert res["dropped_partitions"] == 1  # d2/web emptied
    got = sorted(r["k"] for r in read_snapshot(spark, tbl).collect())
    assert got == [1, 2, 4]
    with pytest.raises(ValueError, match="multi-column"):
        delete_where(spark, tbl, F.col("k") == 4, mode="merge-on-read", key="k")


def test_spec_evolution_single_to_multi(spark, tmp_path):
    path = str(tmp_path / "te")
    write_snapshot(_mk(spark, [(1, "d1", "web", 10)]), path, "day")
    v = evolve_partition_spec(path, ["day", "source"])
    assert v == 2
    meta = read_manifest(path)["schema"]
    assert meta["partition_spec"] == ["day", "source"]
    assert "partition_col" not in meta
    assert {"col": "day", "type": "string"} in meta["prior_specs"]
    # appends land nested; reads union both layouts with typed columns
    append_snapshot(path, _mk(spark, [(2, "d1", "api", 20)]), ["day", "source"])
    got = sorted(
        map(tuple, read_snapshot(spark, path).select("k", "day", "source", "v").collect())
    )
    assert got == [(1, "d1", "web", 10), (2, "d1", "api", 20)]
    man = read_manifest(path)
    assert "day=d1" in man["partitions"]  # old layout, carried
    assert "day=d1/source=api" in man["partitions"]
    # partition-scoped rewrites refuse while layout-mixed
    with pytest.raises(ValueError, match="retired partition spec"):
        merge_snapshot(
            path, _mk(spark, [(3, "d1", "web", 30)]), "k", ["day", "source"]
        )
    # compaction migrates everything under the current spec
    compact_snapshot(spark, path)
    man2 = read_manifest(path)
    assert sorted(man2["partitions"]) == [
        "day=d1/source=api",
        "day=d1/source=web",
    ]
    got2 = sorted(
        map(tuple, read_snapshot(spark, path).select("k", "day", "source", "v").collect())
    )
    assert got2 == got
    # and the previously-refused writer now works
    merge_snapshot(
        path, _mk(spark, [(3, "d1", "web", 30)]), "k", ["day", "source"]
    )
    assert read_snapshot(spark, path).count() == 3


def test_evolution_multi_to_single(spark, tmp_path):
    path = str(tmp_path / "tm")
    write_snapshot(
        _mk(spark, [(1, "d1", "web", 10)]), path, ["day", "source"]
    )
    evolve_partition_spec(path, "source")
    meta = read_manifest(path)["schema"]
    assert meta["partition_col"] == "source"
    assert meta["partition_spec"] == ["source"]
    # both retired components recorded for read-side casting
    assert {"col": "day", "type": "string"} in meta["prior_specs"]
    append_snapshot(path, _mk(spark, [(2, "d2", "api", 20)]), "source")
    got = sorted(
        map(tuple, read_snapshot(spark, path).select("k", "day", "source", "v").collect())
    )
    assert got == [(1, "d1", "web", 10), (2, "d2", "api", 20)]


def test_distribution_modes_composite(spark, tmp_path):
    path = str(tmp_path / "td")
    write_snapshot(
        _mk(spark, [(i, f"d{i % 2}", "s", i) for i in range(20)]),
        path,
        ["day", "source"],
        distribution="hash",
    )
    assert read_snapshot(spark, path).count() == 20
    path2 = str(tmp_path / "td2")
    write_snapshot(
        _mk(spark, [(i, f"d{i % 2}", "s", i) for i in range(20)]),
        path2,
        ["day", "source"],
        distribution="range",
        order_by=["v"],
    )
    assert read_snapshot(spark, path2).count() == 20


def test_spec_components_protected_from_rename_drop(spark, tbl):
    # review regression: renaming/dropping a component of a
    # multi-column spec must refuse — it would orphan every directory
    # name and make all subsequent reads unresolvable
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        evolve_snapshot_schema,
    )

    with pytest.raises(ValueError, match="protected|partition"):
        evolve_snapshot_schema(tbl, renames={"day": "dt"})
    with pytest.raises(ValueError, match="protected|partition"):
        evolve_snapshot_schema(tbl, drops=["source"])
    # the table still reads fine
    assert read_snapshot(spark, tbl).count() == 4


def test_bad_specs_refuse(spark, tmp_path):
    path = str(tmp_path / "tx")
    df = _mk(spark, [(1, "d1", "web", 10)])
    with pytest.raises(ValueError, match="at least one"):
        write_snapshot(df, path, [])
    with pytest.raises(ValueError, match="repeats"):
        write_snapshot(df, path, ["day", "day"])
