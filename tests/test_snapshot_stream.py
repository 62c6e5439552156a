"""Snapshot table as a STREAMING SOURCE (pyds.SnapshotStreamDataSource
— Delta's "streaming from a table" over the manifest layer): offsets
are manifest versions, each micro-batch emits exactly the rows of the
append commits in its (start, end] window, executors read the
appended parquet as Arrow batches, and non-append commits raise (or
skip whole under skip_change_commits)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.pyds import (
    SnapshotStreamDataSource,
    _SnapshotStreamReader,
)
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    append_snapshot,
    delete_where,
    evolve_snapshot_schema,
    merge_snapshot,
    write_snapshot,
)
from pandas_analysis_with_postgres_spark.streaming.streams import (
    run_available_now,
)


def _mk(spark, rows, ddl="k bigint, s string, batch bigint"):
    return spark.createDataFrame(rows, ddl)


@pytest.fixture()
def tbl(spark, tmp_path):
    # batch-id partitioning: the append-only discipline the source
    # streams exactly. v1 = initial content, v2/v3 = appends.
    path = str(tmp_path / "t")
    write_snapshot(_mk(spark, [(1, "a", 0), (2, "b", 0)]), path, "batch")
    append_snapshot(path, _mk(spark, [(3, "c", 1)]), "batch")
    append_snapshot(path, _mk(spark, [(4, "d", 2), (5, "e", 3)]), "batch")
    spark.dataSource.register(SnapshotStreamDataSource)
    return path


def _drain(spark, path, **opts):
    r = spark.readStream.format("snapshotstream")
    for k, v in opts.items():
        r = r.option(k, v)
    return run_available_now(r.load(path))


def test_streams_initial_content_plus_appends(spark, tbl):
    got = sorted(map(tuple, _drain(spark, tbl).collect()))
    assert got == [
        (1, "a", 0), (2, "b", 0), (3, "c", 1), (4, "d", 2), (5, "e", 3)
    ]


def test_starting_version_tails_the_table(spark, tbl):
    got = sorted(map(tuple, _drain(spark, tbl, starting_version="1").collect()))
    assert got == [(3, "c", 1), (4, "d", 2), (5, "e", 3)]
    assert _drain(spark, tbl, starting_version="3").count() == 0


def test_partition_revisiting_append_raises(spark, tbl):
    append_snapshot(tbl, _mk(spark, [(6, "f", 0)]), "batch")
    with pytest.raises(Exception, match="partition-revisiting append"):
        _drain(spark, tbl)
    # skip_change_commits: the commit is skipped WHOLE, stream continues
    got = sorted(
        map(tuple, _drain(spark, tbl, skip_change_commits="true").collect())
    )
    assert (6, "f", 0) not in got
    assert len(got) == 5


def test_non_append_commits_raise_or_skip(spark, tbl):
    merge_snapshot(tbl, _mk(spark, [(3, "C", 1)]), "k", "batch")
    with pytest.raises(Exception, match="merge|non-append|commit"):
        _drain(spark, tbl)
    got = sorted(
        map(tuple, _drain(spark, tbl, skip_change_commits="true").collect())
    )
    # the MERGE commit is skipped whole — its rewrite (3 -> "C") never
    # streams; the ORIGINAL append of (3, "c") at v2 does, exactly
    # Delta's skipChangeCommits semantics
    assert got == [
        (1, "a", 0), (2, "b", 0), (3, "c", 1), (4, "d", 2), (5, "e", 3)
    ]
    assert (3, "C", 1) not in got


def test_delete_commit_is_a_change(spark, tbl):
    delete_where(spark, tbl, F.col("k") == 4)
    with pytest.raises(Exception, match="commit"):
        _drain(spark, tbl)


def test_replay_is_deterministic(spark, tbl):
    # partitions(start, end) is a pure function of immutable manifests
    rd = _SnapshotStreamReader({"path": tbl}, None)
    a = rd.partitions({"version": 0}, {"version": 3})
    b = rd.partitions({"version": 0}, {"version": 3})
    assert [p.value for p in a] == [p.value for p in b]
    assert len(a) == 4  # 1 initial dir + 1 + 2 appended dirs
    tail = rd.partitions({"version": 2}, {"version": 3})
    assert sorted(p.value["pname"] for p in tail) == ["batch=2", "batch=3"]


def test_schema_evolution_null_fills_older_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(_mk(spark, [(1, "a", 0)]), path, "batch")
    append_snapshot(
        path,
        spark.createDataFrame(
            [(2, "b", 1, 9.5)], "k bigint, s string, batch bigint, w double"
        ),
        "batch",
    )
    spark.dataSource.register(SnapshotStreamDataSource)
    got = {r["k"]: r.asDict() for r in _drain(spark, path).collect()}
    assert got[1]["w"] is None  # pre-evolution commit: NULL-filled
    assert got[2]["w"] == 9.5


def test_rename_streams_logical_names(spark, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(_mk(spark, [(1, "a", 0)]), path, "batch")
    evolve_snapshot_schema(path, renames=[("s", "label")])
    append_snapshot(
        path,
        spark.createDataFrame(
            [(2, "b", 1)], "k bigint, label string, batch bigint"
        ),
        "batch",
    )
    spark.dataSource.register(SnapshotStreamDataSource)
    # the alter commit itself streams nothing; both data commits
    # present the LOGICAL column name
    out = _drain(spark, path)
    assert "label" in out.columns and "s" not in out.columns
    got = {r["k"]: r["label"] for r in out.collect()}
    assert got == {1: "a", 2: "b"}


def test_mirror_drain_is_idempotent(spark, tbl, tmp_path):
    # snapshotstream -> stream_append_sink: re-draining with a FRESH
    # checkpoint replays the same (app_id, batch_id) txns and the
    # mirror absorbs them whole — exactly-once across restarts
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        current_version,
        read_snapshot,
    )
    from pandas_analysis_with_postgres_spark.streaming.streams import (
        stream_append_sink,
    )

    dst = str(tmp_path / "mirror")
    for i in (1, 2):
        stream_append_sink(
            spark.readStream.format("snapshotstream").load(tbl),
            dst,
            "batch",
            app_id="mirror_test",
            checkpoint_dir=str(tmp_path / f"ckpt{i}"),
        )
    got = sorted(map(tuple, read_snapshot(spark, dst).collect()))
    assert got == [
        (1, "a", 0), (2, "b", 0), (3, "c", 1), (4, "d", 2), (5, "e", 3)
    ]
    # the second drain committed nothing (txn watermark absorption)
    assert current_version(dst) == 1


def test_ending_version_bounds_the_backfill(spark, tbl):
    # a static window (start, end]: commits past ending_version never
    # stream — the restart-safe bounded-backfill knob
    got = sorted(
        map(
            tuple,
            _drain(
                spark, tbl, starting_version="0", ending_version="2"
            ).collect(),
        )
    )
    assert got == [(1, "a", 0), (2, "b", 0), (3, "c", 1)]
    with pytest.raises(Exception, match="empty window"):
        _drain(spark, tbl, starting_version="3", ending_version="1")


def test_streams_date_partitioned_table(spark, tmp_path):
    # review regression: date partition values inject as date32, not
    # as the raw directory string (which Arrow rejects)
    import datetime

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(
            [(1, datetime.date(2024, 1, 1))], "k bigint, d date"
        ),
        path,
        "d",
    )
    append_snapshot(
        path,
        spark.createDataFrame(
            [(2, datetime.date(2024, 1, 2))], "k bigint, d date"
        ),
        "d",
    )
    spark.dataSource.register(SnapshotStreamDataSource)
    got = sorted(map(tuple, _drain(spark, path).collect()))
    assert got == [
        (1, datetime.date(2024, 1, 1)),
        (2, datetime.date(2024, 1, 2)),
    ]
