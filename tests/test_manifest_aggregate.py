"""manifest_aggregate: COUNT/MIN/MAX answered from manifest metadata —
exact after write/merge/delete, rename-chain aware, footer fallback for
pre-upgrade manifests, loud on stat-less columns."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    N_ROWS_KEY,
    delete_where,
    evolve_snapshot_schema,
    manifest_aggregate,
    merge_snapshot,
    read_manifest,
    write_snapshot,
)


@pytest.fixture()
def base(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10.0, 10), (2, 25.5, 10), (3, 7.25, 20), (4, 90.0, 20)],
        "k long, amt double, p long",
    )
    path = str(tmp_path / "tbl")
    assert write_snapshot(df, path, "p", stats_cols=["amt"]) == 1
    return path


def test_count_min_max_from_manifest_only(base):
    agg = manifest_aggregate(base, columns=["amt"])
    assert agg["n_rows"] == 4
    assert agg["n_partitions"] == 2
    assert agg["columns"]["amt"] == {"min": 7.25, "max": 90.0}


def test_counts_track_merge_with_cold_carry(spark, base):
    src = spark.createDataFrame(
        [(2, 100.0, 10), (5, 1.5, 30)], "k long, amt double, p long"
    )
    assert merge_snapshot(base, src, "k", "p") == 2
    agg = manifest_aggregate(base, columns=["amt"])
    assert agg["n_rows"] == 5
    assert agg["columns"]["amt"] == {"min": 1.5, "max": 100.0}
    # the old version still answers its own totals (time travel)
    old = manifest_aggregate(base, columns=["amt"], version=1)
    assert old["n_rows"] == 4 and old["columns"]["amt"]["max"] == 90.0
    # cold partition p=20 was carried by reference WITH its row count
    man = read_manifest(base, 2)
    assert man["stats"]["p=20"][N_ROWS_KEY] == 2


def test_counts_track_delete(spark, base):
    delete_where(spark, base, "amt > 50.0")
    assert manifest_aggregate(base)["n_rows"] == 3


def test_footer_fallback_for_pre_upgrade_manifest(base):
    # simulate a manifest written before the row-count upgrade
    snap = Path(base) / "_snapshots"
    mf = sorted(snap.glob("*.json"))[-1]
    man = json.loads(mf.read_text())
    for entry in man["stats"].values():
        entry.pop(N_ROWS_KEY)
    mf.write_text(json.dumps(man))
    agg = manifest_aggregate(base, columns=["amt"])
    assert agg["n_rows"] == 4
    assert agg["columns"]["amt"] == {"min": 7.25, "max": 90.0}


def test_rename_chain_resolves_logical_column(base):
    # stats_cols are rename-protected table properties, so the chain
    # only ever matters for NON-statted columns served by the footer
    # fallback: old files carry the pre-rename physical name, and the
    # alias mapping must find it under the new logical name.
    evolve_snapshot_schema(base, renames={"k": "k_id"})
    agg = manifest_aggregate(base, columns=["k_id"])
    assert agg["columns"]["k_id"] == {"min": 1, "max": 4}
    assert agg["n_rows"] == 4


def test_unstatted_column_falls_back_then_raises_on_absent(base):
    # 'k' has no manifest stats but IS in the footers: fallback serves
    # it exactly; a column in neither raises (never a partial extreme)
    agg = manifest_aggregate(base, columns=["k"])
    assert agg["columns"]["k"] == {"min": 1, "max": 4}
    with pytest.raises(ValueError, match="missing_col"):
        manifest_aggregate(base, columns=["k", "missing_col"])


def test_reserved_column_name_rejected(spark, tmp_path):
    df = spark.createDataFrame([(1, 10)], f"`{N_ROWS_KEY}` long, p long")
    with pytest.raises(ValueError, match="reserved"):
        write_snapshot(df, str(tmp_path / "bad"), "p")


def test_partition_column_served_from_partition_names(base):
    # partition values live in directory names, not data files — and
    # must still be answerable with every parquet file gone
    for f in Path(base).rglob("*.parquet"):
        f.unlink()
    agg = manifest_aggregate(base, columns=["p", "amt"])
    assert agg["columns"]["p"] == {"min": 10, "max": 20}
    assert agg["columns"]["amt"] == {"min": 7.25, "max": 90.0}
    assert agg["n_rows"] == 4


# ------------------------------------- GROUP BY pcol from the manifest


def test_partition_counts_zero_data_pages(spark, base):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        manifest_partition_counts,
    )

    # the per-partition ::n_rows map IS the group-by — proven by
    # deleting every data file first
    for f in Path(base).rglob("*.parquet"):
        f.unlink()
    assert manifest_partition_counts(base) == [(10, 2), (20, 2)]
    # partition-equality restriction composes
    assert manifest_partition_counts(base, where_partition=("p", 20)) == [
        (20, 2)
    ]
    assert manifest_partition_counts(base, where_partition=("p", 99)) == []
    with pytest.raises(ValueError, match="not the partition column"):
        manifest_partition_counts(base, where_partition=("k", 10))


def test_partition_counts_null_group_and_versions(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        manifest_partition_counts,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "k long, p string"
    )
    path = str(tmp_path / "nulls")
    write_snapshot(df, path, "p")
    # NULL partition forms a group with value None (SQL GROUP BY keeps
    # the NULL group), sorted by partition NAME
    got = dict(manifest_partition_counts(path))
    assert got == {"a": 1, None: 2}


# --------------------------------------- stats-proven range COUNT


@pytest.fixture()
def bucketed(spark, tmp_path):
    # partition ranges are DISJOINT by construction (bucket = k // 10),
    # so aligned predicates prove full containment and misaligned ones
    # force partial overlap
    rows = [(b * 10 + i, float(b * 10 + i), b) for b in range(4) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, amt double, b long")
    path = str(tmp_path / "bucketed")
    assert write_snapshot(df, path, "b", stats_cols=["k"]) == 1
    return path


def test_range_count_full_containment(bucketed):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        manifest_range_count,
    )

    # zero data pages: the proof must survive deleting every file
    for f in Path(bucketed).rglob("*.parquet"):
        f.unlink()
    # buckets 1..2 fully inside, 0 and 3 fully outside
    assert manifest_range_count(bucketed, "k", lo=10, hi=29) == 20
    # open-ended range
    assert manifest_range_count(bucketed, "k", lo=20) == 20
    assert manifest_range_count(bucketed, "k", hi=9) == 10
    # strict bounds at partition edges still prove containment
    assert manifest_range_count(bucketed, "k", lo=9, hi=30, lo_strict=True, hi_strict=True) == 20
    # whole-table and empty ranges
    assert manifest_range_count(bucketed, "k", lo=0, hi=39) == 40
    assert manifest_range_count(bucketed, "k", lo=100) == 0


def test_range_count_refuses_partial_overlap(bucketed):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        manifest_range_count,
    )

    # 15 splits bucket 1: containment unprovable → None (caller scans)
    assert manifest_range_count(bucketed, "k", lo=15, hi=29) is None
    assert manifest_range_count(bucketed, "k", lo=10, hi=25) is None
    # un-statted column: refuse
    assert manifest_range_count(bucketed, "amt", lo=0.0, hi=100.0) is None


def test_range_count_on_partition_column_never_partial(bucketed):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        manifest_range_count,
    )

    # each directory holds ONE value: every range is provable, even
    # "misaligned" ones — and with zero data pages
    for f in Path(bucketed).rglob("*.parquet"):
        f.unlink()
    assert manifest_range_count(bucketed, "b", lo=1, hi=2) == 20
    assert manifest_range_count(bucketed, "b", lo=1, hi=1) == 10
    assert manifest_range_count(bucketed, "b", hi=0) == 10
    assert manifest_range_count(bucketed, "b", lo=0, lo_strict=True) == 30


def test_range_count_null_exactness(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        manifest_range_count,
        read_manifest,
    )

    # a fully-contained partition with NULLs contributes n_rows minus
    # its null count — min/max describe non-null values only and SQL
    # range predicates reject NULLs
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (None, 0), (50, 1), (None, 1)], "k long, b long"
    )
    path = str(tmp_path / "nulltbl")
    write_snapshot(df, path, "b", stats_cols=["k"])
    man = read_manifest(path)
    assert man["stats"]["b=0"]["k"] == [1, 2, 1]  # null count recorded
    # both partitions fully inside: 5 rows - 2 nulls
    assert manifest_range_count(path, "k", lo=0, hi=100) == 3
    # b=0 fully inside (2 non-null), b=1 fully outside (50 > 10)
    assert manifest_range_count(path, "k", lo=0, hi=10) == 2
    # a bound through the middle of b=0's [1, 2]: partial → refuse
    assert manifest_range_count(path, "k", lo=0, hi=1) is None


def test_range_count_legacy_two_element_stats_refuse(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        manifest_range_count,
        read_manifest,
    )

    df = spark.createDataFrame([(5, 0)], "k long, b long")
    path = str(tmp_path / "legacy")
    write_snapshot(df, path, "b", stats_cols=["k"])
    # simulate a pre-upgrade manifest: strip the null count
    import json as _json

    man_dir = Path(path) / "_snapshots"
    latest = sorted(man_dir.glob("v*.json"))[-1]
    man = _json.loads(latest.read_text())
    man["stats"]["b=0"]["k"] = man["stats"]["b=0"]["k"][:2]
    latest.write_text(_json.dumps(man))
    # containment holds but the null count is unknown → refuse
    assert manifest_range_count(path, "k", lo=0, hi=10) is None
    # fully-outside needs no null count → still answerable
    assert manifest_range_count(path, "k", lo=100) == 0


# ------------------------- range-count semantic property (hypothesis)

from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def range_tbl(spark, tmp_path_factory):
    # values 0..119 over UNALIGNED partitions (pbucket = k // 7 % 4):
    # per-partition min/max ranges overlap heavily, so containment
    # proofs only succeed for predicates the stats genuinely prove
    rows = [(k, k // 7 % 4) for k in range(120)]
    df = spark.createDataFrame(rows, "k long, b long")
    path = str(tmp_path_factory.mktemp("rangeprop") / "tbl")
    write_snapshot(df.repartition("b"), path, "b", stats_cols=["k"])
    truth = [k for k in range(120)]
    return path, truth


@settings(max_examples=120, deadline=None)
@given(
    lo=st.one_of(st.none(), st.integers(-5, 130)),
    hi=st.one_of(st.none(), st.integers(-5, 130)),
    lo_strict=st.booleans(),
    hi_strict=st.booleans(),
)
def test_range_count_never_lies(range_tbl, lo, hi, lo_strict, hi_strict):
    # SEMANTIC fuzz (the parser fuzz's counterpart): for ANY bounds,
    # the manifest either refuses (None) or returns the EXACT count —
    # approximation is never on the menu
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        manifest_range_count,
    )

    path, truth = range_tbl
    got = manifest_range_count(
        path, "k", lo=lo, hi=hi, lo_strict=lo_strict, hi_strict=hi_strict
    )
    if got is None:
        return
    exact = sum(
        1
        for k in truth
        if (lo is None or (k > lo if lo_strict else k >= lo))
        and (hi is None or (k < hi if hi_strict else k <= hi))
    )
    assert got == exact
