"""delete_where: row-level DELETE semantics, partial rewrite, emptied
partitions, NULL three-valued logic, CDF integration, time travel."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    delete_where,
    diff_snapshots,
    read_manifest,
    read_snapshot,
    write_snapshot,
)


def _tbl(spark, tmp_path, rows, name="t"):
    path = str(tmp_path / name)
    df = spark.createDataFrame(rows, "k long, v string, p long")
    write_snapshot(df, path, "p")
    return path


def test_delete_rewrites_only_matching_partitions(spark, tmp_path):
    rows = [(i, f"v{i}", i % 3) for i in range(9)]
    path = _tbl(spark, tmp_path, rows)
    man1 = read_manifest(path, 1)
    # k=4 lives in p=1 only
    r = delete_where(spark, path, "k = 4")
    assert r["version"] == 2 and r["deleted_rows"] == 1
    assert r["rewritten_partitions"] == 1 and r["dropped_partitions"] == 0
    man2 = read_manifest(path, 2)
    for p in ("p=0", "p=2"):
        assert man2["partitions"][p] == man1["partitions"][p]  # by reference
    assert man2["partitions"]["p=1"] != man1["partitions"]["p=1"]
    assert {r.k for r in read_snapshot(spark, path).collect()} == set(range(9)) - {4}
    # old version still sees the row until expiry
    assert {r.k for r in read_snapshot(spark, path, 1).collect()} == set(range(9))
    assert r["physical_erasure_requires_expiry"] is True


def test_emptied_partition_is_dropped_from_manifest(spark, tmp_path):
    rows = [(1, "a", 0), (2, "b", 0), (3, "c", 1)]
    path = _tbl(spark, tmp_path, rows)
    r = delete_where(spark, path, "p = 0")
    assert r["deleted_rows"] == 2 and r["dropped_partitions"] == 1
    man = read_manifest(path)
    assert set(man["partitions"]) == {"p=1"}
    assert {x.k for x in read_snapshot(spark, path).collect()} == {3}
    # CDF reports the vanished rows as deletes
    feed = diff_snapshots(spark, path, 1, 2, "k")
    assert {(x.change_type, x.k) for x in feed.collect()} == {
        ("delete", 1),
        ("delete", 2),
    }


def test_null_condition_rows_are_kept(spark, tmp_path):
    path = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, "a", 0), (2, None, 0), (3, "x", 0)], "k long, v string, p long"
    )
    write_snapshot(df, path, "p")
    # v = 'a' is NULL for k=2 → kept (DELETE three-valued logic)
    r = delete_where(spark, path, F.col("v") == "a")
    assert r["deleted_rows"] == 1
    assert {x.k for x in read_snapshot(spark, path).collect()} == {2, 3}


def test_no_match_is_a_no_op(spark, tmp_path):
    path = _tbl(spark, tmp_path, [(1, "a", 0)])
    r = delete_where(spark, path, "k = 99")
    assert r["version"] == 1 and r["deleted_rows"] == 0
    assert read_manifest(path)["version"] == 1


def test_txn_makes_replayed_delete_idempotent(spark, tmp_path):
    path = _tbl(spark, tmp_path, [(1, "a", 0), (2, "b", 0)])
    r = delete_where(spark, path, "k = 1", txn=("gdpr", 5))
    assert r["version"] == 2
    # replay: the condition no longer matches, so it is a no-op anyway;
    # the txn guard matters when the predicate WOULD still match rows
    # inserted since (delete-then-reinsert) — simulate via merge + replay
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
    )

    merge_snapshot(
        path, spark.createDataFrame([(1, "a2", 0)], "k long, v string, p long"),
        "k", "p",
    )
    r2 = delete_where(spark, path, "k = 1", txn=("gdpr", 5))
    assert r2["version"] == 3  # txn watermark absorbed the replay
    assert r2["deleted_rows"] == 0  # and the report says so
    assert {x.k for x in read_snapshot(spark, path).collect()} == {1, 2}


def test_deleting_every_row_leaves_a_readable_empty_table(spark, tmp_path):
    """Hypothesis-found edge: a delete matching EVERY row drops every
    partition; the table must read back as a zero-row frame with its
    recorded schema, not FileNotFoundError."""
    path = _tbl(spark, tmp_path, [(1, "a", 0), (2, "b", 1)])
    r = delete_where(spark, path, "k >= 0")
    assert r["deleted_rows"] == 2 and r["dropped_partitions"] == 2
    out = read_snapshot(spark, path)
    assert out.count() == 0
    assert out.columns == ["k", "v", "p"]
    # and the table is still writable afterwards
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
    )

    merge_snapshot(
        path, spark.createDataFrame([(9, "z", 0)], "k long, v string, p long"),
        "k", "p",
    )
    assert {x.k for x in read_snapshot(spark, path).collect()} == {9}
