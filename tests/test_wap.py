"""Write-audit-publish (stage_commit / publish_staged / drop_staged):
staged data invisible to readers, auditable via version="staged:<name>",
atomic publish with optimistic concurrency, GC-safe until dropped."""

from __future__ import annotations

import time
from pathlib import Path

import pytest

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    ConcurrentCommitError,
    drop_staged,
    expire_snapshots,
    list_staged,
    manifest_aggregate,
    merge_snapshot,
    publish_staged,
    read_manifest,
    read_snapshot,
    stage_commit,
    write_snapshot,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10.0, 0), (2, 20.0, 1)], "k long, amt double, p long"
    )
    path = str(tmp_path / "tbl")
    write_snapshot(df, path, "p", stats_cols=["amt"])
    return path


def test_stage_is_invisible_then_publish_atomically(spark, tbl):
    new = spark.createDataFrame(
        [(1, 11.0, 0), (3, 30.0, 1)], "k long, amt double, p long"
    )
    handle = stage_commit(new, tbl, "p", name="etl_run_7")
    assert handle == "staged:etl_run_7"
    assert list_staged(tbl) == {"etl_run_7": 1}
    # production readers still see v1
    assert {r.k for r in read_snapshot(spark, tbl).collect()} == {1, 2}
    assert read_manifest(tbl)["version"] == 1
    # the audit reads the staged content explicitly — through the
    # ordinary version parameter, so EVERY reader works
    audit = read_snapshot(spark, tbl, handle)
    assert {r.k for r in audit.collect()} == {1, 3}
    agg = manifest_aggregate(tbl, columns=["amt"], version=handle)
    assert agg["n_rows"] == 2 and agg["columns"]["amt"]["max"] == 30.0
    # publish: one atomic link, stage consumed
    v = publish_staged(tbl, "etl_run_7")
    assert v == 2
    assert list_staged(tbl) == {}
    assert {r.k for r in read_snapshot(spark, tbl).collect()} == {1, 3}
    assert read_manifest(tbl)["operation"] == "overwrite"
    # history intact: v1 still readable
    assert {r.k for r in read_snapshot(spark, tbl, 1).collect()} == {1, 2}


def test_publish_refuses_stale_parent(spark, tbl):
    new = spark.createDataFrame([(9, 90.0, 0)], "k long, amt double, p long")
    stage_commit(new, tbl, "p", name="stale")
    # the table advances while the audit runs
    merge_snapshot(
        tbl,
        spark.createDataFrame([(5, 50.0, 0)], "k long, amt double, p long"),
        "k",
        "p",
    )
    with pytest.raises(ConcurrentCommitError, match="re-stage"):
        publish_staged(tbl, "stale")
    # the stage survives for inspection until dropped
    assert "stale" in list_staged(tbl)
    drop_staged(tbl, "stale")
    assert list_staged(tbl) == {}


def test_stage_inherits_properties_and_enforces_constraints(spark, tmp_path):
    df = spark.createDataFrame([(1, 10.0, 0)], "k long, amt double, p long")
    path = str(tmp_path / "ctbl")
    write_snapshot(df, path, "p", stats_cols=["amt"], constraints=["amt >= 0"])
    bad = spark.createDataFrame([(2, -5.0, 0)], "k long, amt double, p long")
    with pytest.raises(ValueError, match="CHECK constraint"):
        stage_commit(bad, path, "p", name="bad")
    assert list_staged(path) == {}  # refused stages leave no entry
    ok = spark.createDataFrame([(2, 5.0, 0)], "k long, amt double, p long")
    stage_commit(ok, path, "p", name="ok")
    publish_staged(path, "ok")
    # stats property inherited through the staged overwrite
    man = read_manifest(path)
    assert man["schema"]["stats_cols"] == ["amt"]
    assert man["stats"]["p=0"]["amt"][:2] == [5.0, 5.0]


def test_staged_data_survives_gc_until_dropped(spark, tbl):
    new = spark.createDataFrame([(7, 70.0, 0)], "k long, amt double, p long")
    handle = stage_commit(new, tbl, "p", name="gc")
    # a few more published versions, then aggressive expiry
    for i in range(3):
        merge_snapshot(
            tbl,
            spark.createDataFrame(
                [(100 + i, 1.0, 0)], "k long, amt double, p long"
            ),
            "k",
            "p",
        )
    expire_snapshots(tbl, keep=1, min_age_sec=0)
    # the staged commit's data survived GC: still auditable
    assert {r.k for r in read_snapshot(spark, tbl, handle).collect()} == {7}
    # dropping it orphans the data; the next expiry reclaims it
    drop_staged(tbl, "gc")
    removed = expire_snapshots(tbl, keep=1, min_age_sec=0)
    assert removed  # the staged commit dir went
    with pytest.raises(KeyError):
        read_snapshot(spark, tbl, handle)


def test_duplicate_and_bad_names_refused(spark, tbl):
    new = spark.createDataFrame([(7, 70.0, 0)], "k long, amt double, p long")
    stage_commit(new, tbl, "p", name="x")
    with pytest.raises(ValueError, match="already exists"):
        stage_commit(new, tbl, "p", name="x")
    with pytest.raises(ValueError, match="invalid"):
        stage_commit(new, tbl, "p", name="a/b")
    with pytest.raises(KeyError):
        publish_staged(tbl, "nope")
    with pytest.raises(KeyError):
        drop_staged(tbl, "nope")


def test_metadata_sql_audits_staged_version(spark, tbl):
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        answer_from_manifest,
    )

    new = spark.createDataFrame(
        [(1, 1.0, 0), (2, 2.0, 0), (3, 3.0, 1)], "k long, amt double, p long"
    )
    handle = stage_commit(new, tbl, "p", name="audit")
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n, MAX(amt) AS hi FROM t",
        {"t": tbl},
        version=handle,
    ).collect()[0]
    assert (out.n, out.hi) == (3, 3.0)
    # published view unchanged
    cur = answer_from_manifest(
        spark, "SELECT COUNT(*) AS n FROM t", {"t": tbl}
    ).collect()[0]
    assert cur.n == 2


# ----------------------------------------------------------- RESTORE


def test_restore_carries_by_reference_zero_data_movement(spark, tbl):
    # v2: a bad merge lands wrong rows
    merge_snapshot(
        tbl,
        spark.createDataFrame(
            [(666, 0.0, 0)], "k long, amt double, p long"
        ),
        "k",
        "p",
    )
    assert {r.k for r in read_snapshot(spark, tbl).collect()} == {1, 2, 666}
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        restore_snapshot,
    )

    before_files = sorted(str(f) for f in Path(tbl).rglob("*.parquet"))
    v = restore_snapshot(tbl, 1)
    assert v == 3
    # zero data movement: no parquet file written or removed
    assert sorted(str(f) for f in Path(tbl).rglob("*.parquet")) == before_files
    man = read_manifest(tbl)
    assert man["operation"] == "restore:v1"
    assert man["partitions"] == read_manifest(tbl, 1)["partitions"]
    assert {r.k for r in read_snapshot(spark, tbl).collect()} == {1, 2}
    # the bad version stays readable behind the restore
    assert 666 in {r.k for r in read_snapshot(spark, tbl, 2).collect()}
    # stats restored with the content: manifest extremes are v1's
    assert manifest_aggregate(tbl, columns=["amt"])["columns"]["amt"] == {
        "min": 10.0, "max": 20.0,
    }
    # restoring to current is a no-op
    assert restore_snapshot(tbl, 3) == 3


def test_restore_clears_later_tombstones(spark, tbl):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        delete_where,
        restore_snapshot,
    )

    delete_where(spark, tbl, "k = 1", mode="merge-on-read", key="k")
    assert {r.k for r in read_snapshot(spark, tbl).collect()} == {2}
    v = restore_snapshot(tbl, 1)  # v1 had no tombstones
    man = read_manifest(tbl, v)
    assert "tombstones" not in man  # explicit-None, not parent-carry
    assert {r.k for r in read_snapshot(spark, tbl).collect()} == {1, 2}


def test_restore_to_tag_and_staged_guard(spark, tbl):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        restore_snapshot,
        stage_commit,
        tag_snapshot,
    )

    tag_snapshot(tbl, "golden", 1)
    merge_snapshot(
        tbl,
        spark.createDataFrame([(9, 9.0, 0)], "k long, amt double, p long"),
        "k",
        "p",
    )
    v = restore_snapshot(tbl, "golden")
    assert {r.k for r in read_snapshot(spark, tbl, v).collect()} == {1, 2}
    stage_commit(
        spark.createDataFrame([(5, 5.0, 0)], "k long, amt double, p long"),
        tbl,
        "p",
        name="s",
    )
    with pytest.raises(ValueError, match="publish_staged"):
        restore_snapshot(tbl, "staged:s")
