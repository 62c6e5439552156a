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
