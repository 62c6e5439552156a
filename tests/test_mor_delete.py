"""Merge-on-read deletes: key-tombstone sidecars applied as a read-side
anti-join — no data rewrite, CDF still correct, manifest counts exact,
extremes refuse, compaction folds tombstones away, txn-idempotent."""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    compact_snapshot,
    delete_where,
    diff_snapshots,
    manifest_aggregate,
    manifest_partition_counts,
    manifest_range_count,
    merge_snapshot,
    read_manifest,
    read_snapshot,
    table_info,
    write_snapshot,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0, 0),
            (2, "b", 20.0, 0),
            (3, "c", 30.0, 0),
            (4, "d", 40.0, 1),
            (5, "e", 50.0, 1),
        ],
        "k long, name string, amt double, p long",
    )
    path = str(tmp_path / "tbl")
    assert write_snapshot(df, path, "p", stats_cols=["amt"]) == 1
    return path


def _files_of(path):
    return sorted(str(f) for f in Path(path).rglob("*.parquet"))


class TestMorDelete:
    def test_no_rewrite_and_read_side_suppression(self, spark, tbl):
        before = _files_of(tbl)
        out = delete_where(
            spark, tbl, "amt >= 30", mode="merge-on-read", key="k"
        )
        assert out["mode"] == "merge-on-read"
        assert out["deleted_rows"] == 3 and out["tombstoned_keys"] == 3
        assert out["rewritten_partitions"] == 0
        # no DATA file was rewritten or removed — only tombstone files
        # were ADDED (the whole point: O(matches), not a rewrite)
        after = _files_of(tbl)
        assert set(before) <= set(after)
        man = read_manifest(tbl)
        assert man["operation"] == "delete-mor"
        assert man["partitions"] == read_manifest(tbl, 1)["partitions"]
        # read applies the anti-join
        assert {r.k for r in read_snapshot(spark, tbl).collect()} == {1, 2}
        # time travel still sees everything
        assert read_snapshot(spark, tbl, 1).count() == 5

    def test_key_scoped_to_partition(self, spark, tmp_path):
        # the same key value in another partition must survive
        df = spark.sparkContext.parallelize(
            [(7, "x", 0), (7, "y", 1)]
        ).toDF(["k", "v", "p"])
        path = str(tmp_path / "dup")
        write_snapshot(df, path, "p")
        delete_where(
            spark, path, "v = 'x'", mode="merge-on-read", key="k"
        )
        rows = {(r.k, r.v) for r in read_snapshot(spark, path).collect()}
        assert rows == {(7, "y")}

    def test_equality_semantics_nonunique_key(self, spark, tmp_path):
        # tombstoning a key suppresses EVERY row with that key in the
        # partition (Iceberg equality-delete), and deleted_rows counts
        # the actual suppressed rows
        df = spark.createDataFrame(
            [(1, 5, 0), (1, 99, 0), (2, 5, 0)], "k long, v long, p long"
        )
        path = str(tmp_path / "nonuniq")
        write_snapshot(df, path, "p")
        out = delete_where(
            spark, path, "v = 5", mode="merge-on-read", key="k"
        )
        assert out["tombstoned_keys"] == 2  # keys 1 and 2
        assert out["deleted_rows"] == 3  # both k=1 rows + the k=2 row
        assert read_snapshot(spark, path).count() == 0

    def test_null_key_rows_raise(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(None, 5, 0), (2, 5, 0)], "k long, v long, p long"
        )
        path = str(tmp_path / "nullkey")
        write_snapshot(df, path, "p")
        with pytest.raises(ValueError, match="NULL key"):
            delete_where(spark, path, "v = 5", mode="merge-on-read", key="k")

    def test_second_delete_counts_stay_exact(self, spark, tbl):
        delete_where(spark, tbl, "k = 3", mode="merge-on-read", key="k")
        delete_where(spark, tbl, "amt >= 40", mode="merge-on-read", key="k")
        # counts accumulated exactly across the two commits
        agg = manifest_aggregate(tbl)
        assert agg["n_rows"] == 2
        assert dict(manifest_partition_counts(tbl)) == {0: 2}
        assert {r.k for r in read_snapshot(spark, tbl).collect()} == {1, 2}

    def test_manifest_count_exact_extremes_refuse(self, spark, tbl):
        delete_where(spark, tbl, "k = 5", mode="merge-on-read", key="k")
        assert manifest_aggregate(tbl)["n_rows"] == 4
        assert dict(manifest_partition_counts(tbl)) == {0: 3, 1: 1}
        with pytest.raises(ValueError, match="tombstoned"):
            manifest_aggregate(tbl, columns=["amt"])
        # range COUNT refuses when a tombstoned partition would
        # CONTRIBUTE (deleted rows' positions in the range unknown)...
        assert manifest_range_count(tbl, "amt", lo=0.0, hi=100.0) is None
        # ...but a tombstoned partition that is fully OUTSIDE the range
        # contributes 0 regardless, so the count stays provable
        # (p=0 fully inside [_, 30], tombstoned p=1 has min 40 > 30)
        assert manifest_range_count(tbl, "amt", hi=30.0) == 3
        info = table_info(tbl)
        assert info["tombstone_partitions"] == 1
        assert info["tombstoned_rows"] == 1

    def test_cdf_reports_mor_delete(self, spark, tbl):
        delete_where(spark, tbl, "k = 2", mode="merge-on-read", key="k")
        feed = diff_snapshots(spark, tbl, 1, 2, "k").collect()
        assert [(r.change_type, r.k) for r in feed] == [("delete", 2)]

    def test_compaction_folds_tombstones_away(self, spark, tbl):
        delete_where(spark, tbl, "k in (1, 4)", mode="merge-on-read", key="k")
        assert read_manifest(tbl).get("tombstones")
        v = compact_snapshot(spark, tbl)
        man = read_manifest(tbl, v)
        assert "tombstones" not in man
        assert {r.k for r in read_snapshot(spark, tbl).collect()} == {2, 3, 5}
        # extremes provable again after the fold
        agg = manifest_aggregate(tbl, columns=["amt"])
        assert agg["n_rows"] == 3
        assert agg["columns"]["amt"] == {"min": 20.0, "max": 50.0}

    def test_partition_rewrite_drops_its_tombstones_only(self, spark, tbl):
        delete_where(spark, tbl, "k in (1, 4)", mode="merge-on-read", key="k")
        # merge rewrites p=0 (tombstones applied during the rewrite);
        # p=1 keeps its tombstone entry
        src = spark.createDataFrame([(9, "z", 90.0, 0)], "k long, name string, amt double, p long")
        merge_snapshot(tbl, src, "k", "p")
        tomb = read_manifest(tbl)["tombstones"]
        assert set(tomb["parts"]) == {"p=1"}
        got = {r.k for r in read_snapshot(spark, tbl).collect()}
        assert got == {2, 3, 9, 5}

    def test_txn_idempotent(self, spark, tbl):
        out1 = delete_where(
            spark, tbl, "k = 1", mode="merge-on-read", key="k",
            txn=("app", 7),
        )
        assert out1["deleted_rows"] == 1
        out2 = delete_where(
            spark, tbl, "k = 2", mode="merge-on-read", key="k",
            txn=("app", 7),
        )
        # replayed watermark: no-op, nothing double-deleted
        assert out2["version"] == out1["version"]
        assert out2["deleted_rows"] == 0
        assert {r.k for r in read_snapshot(spark, tbl).collect()} == {
            2, 3, 4, 5,
        }

    def test_no_match_commits_nothing(self, spark, tbl):
        out = delete_where(
            spark, tbl, "k = 999", mode="merge-on-read", key="k"
        )
        assert out["version"] == 1 and out["deleted_rows"] == 0
        assert "tombstones" not in read_manifest(tbl)

    def test_guards(self, spark, tbl):
        with pytest.raises(ValueError, match="requires key"):
            delete_where(spark, tbl, "k = 1", mode="merge-on-read")
        with pytest.raises(ValueError, match="partition column"):
            delete_where(spark, tbl, "k = 1", mode="merge-on-read", key="p")
        with pytest.raises(ValueError, match="unknown delete mode"):
            delete_where(spark, tbl, "k = 1", mode="bogus")
        delete_where(spark, tbl, "k = 1", mode="merge-on-read", key="k")
        with pytest.raises(ValueError, match="one tombstone key"):
            delete_where(
                spark, tbl, "amt = 20.0", mode="merge-on-read", key="name"
            )

    def test_metadata_sql_count_rides_tombstones(self, spark, tbl):
        from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
            answer_from_manifest,
        )

        delete_where(spark, tbl, "k <= 2", mode="merge-on-read", key="k")
        out = answer_from_manifest(
            spark, "SELECT COUNT(*) AS n FROM t", {"t": tbl}
        ).collect()[0]
        assert out.n == 3
        grp = answer_from_manifest(
            spark, "SELECT p, COUNT(*) AS n FROM t GROUP BY p", {"t": tbl}
        ).collect()
        assert {(r.p, r.n) for r in grp} == {(0, 1), (1, 2)}
        # extremes refuse (fall back to scan) instead of lying
        assert (
            answer_from_manifest(
                spark, "SELECT MIN(amt) AS lo FROM t", {"t": tbl}
            )
            is None
        )

    def test_cow_delete_after_mor_applies_both(self, spark, tbl):
        delete_where(spark, tbl, "k = 1", mode="merge-on-read", key="k")
        out = delete_where(spark, tbl, "k = 2")  # copy-on-write
        assert out["deleted_rows"] == 1
        # p=0 was rewritten: its tombstone folded away in the rewrite
        tomb = (read_manifest(tbl).get("tombstones") or {}).get("parts") or {}
        assert "p=0" not in tomb
        assert {r.k for r in read_snapshot(spark, tbl).collect()} == {3, 4, 5}


class TestStreamOptout:
    def test_multibatch_tombstones_and_checkpoint_replay(self, spark, tmp_path):
        from pandas_analysis_with_postgres_spark.streaming import (
            stream_optout_sink,
        )

        df = spark.createDataFrame(
            [(i, f"d{i}", i % 2) for i in range(20)],
            "doc_id long, body string, p long",
        )
        tbl = str(tmp_path / "docs")
        write_snapshot(df, tbl, "p")
        # opt-out ids land as two files → two micro-batches
        ids_dir = tmp_path / "ids"
        for name, vals in (("a", [0, 3, 6]), ("b", [9, 12])):
            spark.createDataFrame(
                [(v,) for v in vals], "doc_id long"
            ).coalesce(1).write.mode("overwrite").parquet(
                str(ids_dir / name)
            )
        stream = (
            spark.readStream.schema("doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(ids_dir / "*"))
        )
        ckpt = str(tmp_path / "ckpt")
        stream_optout_sink(
            stream, tbl, "doc_id", app_id="optout-test", checkpoint_dir=ckpt
        )
        live = {r.doc_id for r in read_snapshot(spark, tbl).collect()}
        assert live == set(range(20)) - {0, 3, 6, 9, 12}
        man = read_manifest(tbl)
        # merge-on-read: no data rewrite, tombstones accumulated over
        # the micro-batch commits; txn watermark recorded per batch
        assert man["partitions"] == read_manifest(tbl, 1)["partitions"]
        assert man["tombstones"]["key"] == "doc_id"
        assert sum(
            e["n_deleted"] for e in man["tombstones"]["parts"].values()
        ) == 5
        # restart from the same checkpoint: availableNow finds no new
        # files, and the txn watermark would absorb a replayed batch
        v_before = man["version"]
        stream2 = (
            spark.readStream.schema("doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(ids_dir / "*"))
        )
        stream_optout_sink(
            stream2, tbl, "doc_id", app_id="optout-test", checkpoint_dir=ckpt
        )
        assert read_manifest(tbl)["version"] == v_before
        assert {r.doc_id for r in read_snapshot(spark, tbl).collect()} == live

    def test_oversized_batch_fails_loudly(self, spark, tmp_path, monkeypatch):
        # a bulk-erasure batch above MAX_OPTOUT_BATCH_KEYS must fail
        # with the documented contract error, not collect unbounded
        # keys onto the driver
        import pandas_analysis_with_postgres_spark.streaming.streams as st

        df = spark.createDataFrame(
            [(i, f"d{i}", i % 2) for i in range(40)],
            "doc_id long, body string, p long",
        )
        tbl = str(tmp_path / "docs")
        write_snapshot(df, tbl, "p")
        ids_dir = tmp_path / "ids"
        spark.createDataFrame(
            [(v,) for v in range(30)], "doc_id long"
        ).coalesce(1).write.parquet(str(ids_dir / "bulk"))
        monkeypatch.setattr(st, "MAX_OPTOUT_BATCH_KEYS", 10)
        stream = spark.readStream.schema("doc_id long").parquet(
            str(ids_dir / "*")
        )
        with pytest.raises(Exception, match="more than 10"):
            st.stream_optout_sink(
                stream,
                tbl,
                "doc_id",
                app_id="optout-big",
                checkpoint_dir=str(tmp_path / "ckpt2"),
            )
        # nothing committed: the table is untouched
        assert read_manifest(tbl)["version"] == 1
        assert read_snapshot(spark, tbl).count() == 40


def test_tombstone_antijoin_broadcasts_when_small(spark, tbl):
    delete_where(spark, tbl, "k = 1", mode="merge-on-read", key="k")
    plan = read_snapshot(spark, tbl)._jdf.queryExecution().executedPlan().toString()
    # the tombstone side is tiny: the anti-join must be broadcast
    # (the size gate in _apply_tombstones), never a sort-merge shuffle
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
