"""Snapshot-manifest table format: atomic multi-partition commits,
snapshot-isolated readers, optimistic concurrent-writer detection,
partition-scoped MERGE, time travel, and expiry GC."""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    ConcurrentCommitError,
    current_version,
    expire_snapshots,
    merge_snapshot,
    read_manifest,
    read_snapshot,
    write_snapshot,
)


def _rows(df):
    return {(r.k, r.v, r.p) for r in df.select("k", "v", "p").collect()}


@pytest.fixture()
def base(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 20)], "k long, v string, p long"
    )
    path = str(tmp_path / "tbl")
    assert write_snapshot(df, path, "p") == 1
    return path


def test_write_read_roundtrip_and_partition_column(spark, base):
    got = read_snapshot(spark, base)
    assert _rows(got) == {(1, "a", 10), (2, "b", 10), (3, "c", 20)}
    # hive partition column survives the explicit-directory scan
    assert dict(got.dtypes)["p"] == "bigint"


def test_merge_updates_inserts_and_carries_cold_partitions(spark, base):
    src = spark.createDataFrame(
        [(2, "B", 10), (4, "d", 10), (5, "e", 30)], "k long, v string, p long"
    )
    v1 = read_manifest(base, 1)
    assert merge_snapshot(base, src, "k", "p") == 2
    got = _rows(read_snapshot(spark, base))
    assert got == {
        (1, "a", 10),  # untouched row of touched partition survives
        (2, "B", 10),  # matched → updated
        (3, "c", 20),  # cold partition untouched
        (4, "d", 10),  # inserted into touched partition
        (5, "e", 30),  # new partition
    }
    # cold partition carried BY REFERENCE: same data dir as v1
    v2 = read_manifest(base, 2)
    assert v2["partitions"]["p=20"] == v1["partitions"]["p=20"]
    assert v2["partitions"]["p=10"] != v1["partitions"]["p=10"]


def test_time_travel_and_reader_isolation(spark, base):
    pinned = read_snapshot(spark, base, 1)
    src = spark.createDataFrame([(1, "X", 10)], "k long, v string, p long")
    merge_snapshot(base, src, "k", "p")
    # A reader pinned at v1 still sees the old value after the merge —
    # its files are immutable and still on disk.
    assert (1, "a", 10) in _rows(pinned)
    assert (1, "a", 10) in _rows(read_snapshot(spark, base, 1))
    assert (1, "X", 10) in _rows(read_snapshot(spark, base))


def test_concurrent_commit_loses_cleanly(spark, base):
    # Two writers read version 1, both try to commit version 2.
    a = spark.createDataFrame([(9, "w1", 10)], "k long, v string, p long")
    b = spark.createDataFrame([(9, "w2", 10)], "k long, v string, p long")
    assert merge_snapshot(base, a, "k", "p", expected_version=1) == 2
    with pytest.raises(ConcurrentCommitError):
        merge_snapshot(base, b, "k", "p", expected_version=1)
    # Loser retries from the fresh snapshot and wins version 3.
    assert merge_snapshot(base, b, "k", "p") == 3
    assert (9, "w2", 10) in _rows(read_snapshot(spark, base))


def test_torn_manifest_is_impossible(spark, base):
    # A "crashed writer" that wrote data but never published a
    # manifest leaves readers entirely unaffected.
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        _write_commit_data,
    )

    orphan = spark.createDataFrame([(8, "zz", 40)], "k long, v string, p long")
    _write_commit_data(orphan, base, "p")  # data only, no commit
    assert current_version(base) == 1
    assert (8, "zz", 40) not in _rows(read_snapshot(spark, base))
    # Expiry removes the unreferenced commit dir.
    removed = expire_snapshots(base, keep=1, min_age_sec=0)
    assert len(removed) == 1
    assert _rows(read_snapshot(spark, base)) == {
        (1, "a", 10),
        (2, "b", 10),
        (3, "c", 20),
    }


def test_expire_keeps_referenced_dirs(spark, base):
    src = spark.createDataFrame([(4, "d", 30)], "k long, v string, p long")
    merge_snapshot(base, src, "k", "p")  # v2 references v1's dirs for p=10/20
    expire_snapshots(base, keep=1, min_age_sec=0)
    assert not (Path(base) / "_snapshots" / "v00000001.json").exists()
    # v2 still fully readable: its carried-by-reference dirs survived GC
    assert _rows(read_snapshot(spark, base)) == {
        (1, "a", 10),
        (2, "b", 10),
        (3, "c", 20),
        (4, "d", 30),
    }


def test_manifest_is_o_partitions_not_o_files(spark, base):
    man = read_manifest(base)
    # One entry per partition value, each a directory (no file lists).
    assert set(man["partitions"]) == {"p=10", "p=20"}
    for rel in man["partitions"].values():
        assert os.path.isdir(os.path.join(base, rel))


def test_txn_watermark_makes_replay_idempotent(spark, base):
    src = spark.createDataFrame([(7, "g", 10)], "k long, v string, p long")
    v = merge_snapshot(base, src, "k", "p", txn=("job-a", 3))
    assert v == 2
    # Replaying the same (app, batch) — e.g. a crashed foreachBatch
    # whose checkpoint never committed — changes nothing.
    assert merge_snapshot(base, src, "k", "p", txn=("job-a", 3)) == 2
    assert read_manifest(base)["txn"] == {"job-a": 3}
    # A later batch from the same app applies, an older one does not.
    nxt = spark.createDataFrame([(7, "h", 10)], "k long, v string, p long")
    assert merge_snapshot(base, nxt, "k", "p", txn=("job-a", 4)) == 3
    assert merge_snapshot(base, src, "k", "p", txn=("job-a", 2)) == 3
    assert (7, "h", 10) in _rows(read_snapshot(spark, base))
    # Independent apps are tracked independently.
    other = spark.createDataFrame([(11, "z", 20)], "k long, v string, p long")
    assert merge_snapshot(base, other, "k", "p", txn=("job-b", 0)) == 4
    assert read_manifest(base)["txn"] == {"job-a": 4, "job-b": 0}


def test_stream_merge_sink_end_to_end(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.streaming import (
        events_stream_multibatch,
        stream_merge_sink,
    )

    sf_dir = "/root/testdata/sf0.001"
    table = str(tmp_path / "events_tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream_multibatch(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    stream_merge_sink(
        stream, table, "event_id", "event_type", app_id="e2e", checkpoint_dir=ckpt
    )
    from pandas_analysis_with_postgres_spark.sources.parquet import load_table

    expect = load_table(spark, sf_dir, "events").count()
    got = read_snapshot(spark, table)
    assert got.count() == expect
    man = read_manifest(table)
    # One committed version per micro-batch, txn watermark at the last.
    assert man["txn"]["e2e"] == man["version"] - 1
    assert man["version"] >= 3  # ≥3 micro-batches really merged
    # Draining again from the same checkpoint finds no new files and
    # commits nothing.
    stream2 = events_stream_multibatch(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    stream_merge_sink(
        stream2, table, "event_id", "event_type", app_id="e2e", checkpoint_dir=ckpt
    )
    assert read_manifest(table)["version"] == man["version"]


def test_expire_age_guard_protects_inflight_commits(spark, base):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        _write_commit_data,
    )

    orphan = spark.createDataFrame([(8, "zz", 40)], "k long, v string, p long")
    _write_commit_data(orphan, base, "p")  # in-flight: data, no manifest yet
    # A fresh unreferenced dir survives default-age GC...
    assert expire_snapshots(base, keep=1) == []
    # ...and is collected once it is older than the threshold.
    assert len(expire_snapshots(base, keep=1, min_age_sec=0)) == 1


def test_hive_escaped_partition_values_merge_correctly(spark, tmp_path):
    path = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [(1, "a", "12:00"), (2, "b", "13:00")], "k long, v string, p string"
    )
    assert write_snapshot(df, path, "p") == 1
    # The escaped directory name is the manifest key.
    assert "p=12%3A00" in read_manifest(path)["partitions"]
    # Merging into the escaped partition must see its existing rows.
    src = spark.createDataFrame([(3, "c", "12:00")], "k long, v string, p string")
    merge_snapshot(path, src, "k", "p")
    got = {(r.k, r.v, r.p) for r in read_snapshot(spark, path).collect()}
    assert got == {(1, "a", "12:00"), (2, "b", "13:00"), (3, "c", "12:00")}


def test_schema_evolution_adds_column(spark, base):
    src = spark.createDataFrame(
        [(2, "B", 10, 0.9), (9, "n", 30, 0.5)],
        "k long, v string, p long, score double",
    )
    merge_snapshot(base, src, "k", "p")
    got = read_snapshot(spark, base)
    rows = {(r.k, r.v, r.p, r.score) for r in got.collect()}
    assert rows == {
        (1, "a", 10, None),  # rewritten partition, old row → NULL score
        (2, "B", 10, 0.9),
        (3, "c", 20, None),  # cold partition (old files) → NULL score
        (9, "n", 30, 0.5),
    }
    # A source that DROPS a column is rejected, not silently lossy.
    import pytest as _pytest

    bad = spark.createDataFrame([(4, 10)], "k long, p long")
    with _pytest.raises(ValueError, match="missing table columns"):
        merge_snapshot(base, bad, "k", "p")


def test_compact_rewrites_to_one_commit(spark, base):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        compact_snapshot,
    )

    for i, (k, v, p) in enumerate([(4, "d", 30), (5, "e", 40), (2, "B", 10)]):
        merge_snapshot(
            base,
            spark.createDataFrame([(k, v, p)], "k long, v string, p long"),
            "k",
            "p",
        )
    before = read_manifest(base)
    n_commits = len({rel.split(os.sep)[1] for rel in before["partitions"].values()})
    assert n_commits > 1  # history references several commits
    v = compact_snapshot(spark, base)
    after = read_manifest(base, v)
    assert after["operation"] == "compact"
    assert len({rel.split(os.sep)[1] for rel in after["partitions"].values()}) == 1
    # Contents identical to the pre-compaction snapshot.
    assert _rows(read_snapshot(spark, base, v)) == _rows(
        read_snapshot(spark, base, v - 1)
    )
    # Old commits now unreferenced by the live version → expirable.
    expire_snapshots(base, keep=1, min_age_sec=0)
    assert _rows(read_snapshot(spark, base)) == {
        (1, "a", 10),
        (2, "B", 10),
        (3, "c", 20),
        (4, "d", 30),
        (5, "e", 40),
    }


def test_unrenderable_partition_types_rejected_at_creation_and_merge(
    spark, tmp_path
):
    """Python str() and Java Double.toString disagree on float
    rendering ('2e-05' vs '2.0E-5'), so float/timestamp partition keys
    are refused — at TABLE CREATION (code-review finding: a
    write_snapshot-created float table bootstrapped fine and failed
    later with its bloom bitmaps silently discarded) as well as on
    the merge path."""
    path = str(tmp_path / "d")
    df = spark.createDataFrame([(1, 0.5)], "k long, p double")
    with pytest.raises(ValueError, match="partition column type"):
        write_snapshot(df, path, "p")
    with pytest.raises(ValueError, match="partition column type"):
        merge_snapshot(
            path, spark.createDataFrame([(2, 0.5)], "k long, p double"), "k", "p"
        )


def test_empty_string_partition_is_default_partition(spark, tmp_path):
    path = str(tmp_path / "e")
    df = spark.createDataFrame([(1, "x", ""), (2, "y", "a")], "k long, v string, p string")
    write_snapshot(df, path, "p")
    assert "p=__HIVE_DEFAULT_PARTITION__" in read_manifest(path)["partitions"]
    # Merging a row into the empty-string partition must see its rows.
    merge_snapshot(
        path,
        spark.createDataFrame([(3, "z", "")], "k long, v string, p string"),
        "k",
        "p",
    )
    ks = {r.k for r in read_snapshot(spark, path).collect()}
    assert ks == {1, 2, 3}


def test_lossy_source_rejected_even_on_new_partitions(spark, base):
    # Column-dropping source touching ONLY a brand-new partition must
    # still be rejected (the guard is overlap-independent).
    bad = spark.createDataFrame([(4, 99)], "k long, p long")
    with pytest.raises(ValueError, match="missing table columns"):
        merge_snapshot(base, bad, "k", "p")


def test_string_partition_numeric_looking_values_not_corrupted(spark, tmp_path):
    # Hive partition-value inference would read '0123' back as int 123
    # and '1e2' as double 100.0; the snapshot scan must disable
    # inference and cast from the RAW directory string per the
    # manifest-pinned type (round-4 advisor finding).
    df = spark.createDataFrame(
        [(1, "a", "0123"), (2, "b", "1e2"), (3, "c", "plain")],
        "k long, v string, p string",
    )
    path = str(tmp_path / "strp")
    write_snapshot(df, path, "p")
    got = read_snapshot(spark, path)
    assert dict(got.dtypes)["p"] == "string"
    assert _rows(got) == {(1, "a", "0123"), (2, "b", "1e2"), (3, "c", "plain")}
    # merge into the numeric-looking partition: touched-set naming and
    # read-back values agree, so the key updates instead of duplicating
    src = spark.createDataFrame([(1, "A", "0123")], "k long, v string, p string")
    merge_snapshot(path, src, "k", "p")
    assert _rows(read_snapshot(spark, path)) == {
        (1, "A", "0123"),
        (2, "b", "1e2"),
        (3, "c", "plain"),
    }
    # the session conf is restored after the scan
    assert (
        spark.conf.get("spark.sql.sources.partitionColumnTypeInference.enabled")
        != "false"
    )


def test_expire_rejects_keep_zero(base):
    # versions[-0:] == the whole list, so keep=0 would silently keep
    # everything while claiming to expire all history — reject it.
    with pytest.raises(ValueError, match="keep"):
        expire_snapshots(base, keep=0)


def test_expire_age_guard_applies_to_manifests(spark, base):
    # Three versions; default min_age must retain even the out-of-keep
    # manifests (they are younger than the threshold), so a slow writer
    # pinned to an old parent still reads it and loses via
    # ConcurrentCommitError, not FileNotFoundError.
    src = spark.createDataFrame([(7, "x", 20)], "k long, v string, p long")
    merge_snapshot(base, src, "k", "p")
    src2 = spark.createDataFrame([(8, "y", 20)], "k long, v string, p long")
    merge_snapshot(base, src2, "k", "p")
    assert current_version(base) == 3
    assert expire_snapshots(base, keep=1) == []
    assert read_manifest(base, 1)["version"] == 1  # still readable
    # the pinned slow writer follows the documented optimistic path
    late = spark.createDataFrame([(9, "z", 20)], "k long, v string, p long")
    with pytest.raises(ConcurrentCommitError):
        merge_snapshot(base, late, "k", "p", expected_version=1)
    # age-cleared expiry then drops them for real
    expire_snapshots(base, keep=1, min_age_sec=0)
    assert not os.path.exists(
        os.path.join(base, "_snapshots", "v00000001.json")
    )


def test_stream_merge_sink_retries_lost_race_in_run(spark, tmp_path, monkeypatch):
    # A ConcurrentCommitError inside foreachBatch under
    # trigger(availableNow) would terminate the query; the sink must
    # retry the merge in-run against the fresh snapshot instead.
    from pandas_analysis_with_postgres_spark.sources import snapshot as snap_mod
    from pandas_analysis_with_postgres_spark.streaming import (
        events_stream_multibatch,
        stream_merge_sink,
    )

    real = snap_mod.merge_snapshot
    failures = {"left": 2}

    def flaky(*args, **kwargs):
        if failures["left"] > 0:
            failures["left"] -= 1
            raise snap_mod.ConcurrentCommitError("simulated lost race")
        return real(*args, **kwargs)

    monkeypatch.setattr(snap_mod, "merge_snapshot", flaky)
    sf_dir = "/root/testdata/sf0.001"
    table = str(tmp_path / "events_tbl")
    stream = events_stream_multibatch(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    stream_merge_sink(
        stream,
        table,
        "event_id",
        "event_type",
        app_id="retry",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert failures["left"] == 0  # the race really happened and was retried
    from pandas_analysis_with_postgres_spark.sources.parquet import load_table

    assert read_snapshot(spark, table).count() == load_table(
        spark, sf_dir, "events"
    ).count()


# ---------------------------------------------------------------- stats


class TestManifestColumnStats:
    """Manifest column statistics + data skipping (round-4 layer):
    per-partition min/max harvested from parquet footers at commit
    time, maintained across merges (cold partitions carry stats by
    reference), pruned at the manifest via
    read_snapshot(column_ranges=...)."""

    @pytest.fixture()
    def stats_tbl(self, spark, tmp_path):
        # partition p correlates with disjoint k ranges: p=0 holds
        # k 0..9, p=1 holds k 100..109, p=2 holds k 200..209.
        rows = [(p * 100 + i, f"v{p*100+i}", p) for p in range(3) for i in range(10)]
        df = spark.createDataFrame(rows, "k long, v string, p long")
        path = str(tmp_path / "stats_tbl")
        assert write_snapshot(df, path, "p", stats_cols=["k"]) == 1
        return path

    def test_stats_recorded_per_partition(self, stats_tbl):
        man = read_manifest(stats_tbl)
        assert man["schema"]["stats_cols"] == ["k"]
        assert man["stats"]["p=0"]["k"] == [0, 9, 0]
        assert man["stats"]["p=2"]["k"] == [200, 209, 0]

    def test_column_ranges_prune_at_manifest(self, spark, stats_tbl):
        got = read_snapshot(spark, stats_tbl, column_ranges={"k": (100, 109)})
        # only partition p=1's directory is ever touched
        assert all("/p=1/" in f for f in got.inputFiles())
        assert {r.k for r in got.collect()} == set(range(100, 110))

    def test_pruned_plus_filter_equals_full_scan_filter(self, spark, stats_tbl):
        pruned = read_snapshot(
            spark, stats_tbl, column_ranges={"k": (5, 104)}
        ).filter("k BETWEEN 5 AND 104")
        full = read_snapshot(spark, stats_tbl).filter("k BETWEEN 5 AND 104")
        assert {r.k for r in pruned.collect()} == {r.k for r in full.collect()}
        # and the pruned scan skipped partition p=2 entirely
        assert not any("/p=2/" in f for f in pruned.inputFiles())

    def test_all_pruned_returns_empty_frame_like_a_filter(self, spark, stats_tbl):
        # skipping must be behavior-preserving: a window the stats
        # prove empty returns zero rows with the table's schema, same
        # as the unpruned read + filter would.
        got = read_snapshot(spark, stats_tbl, column_ranges={"k": (1000, 2000)})
        assert got.count() == 0
        assert set(got.columns) == {"k", "v", "p"}
        assert dict(got.dtypes)["p"] == "bigint"

    def test_incomparable_bound_types_keep_partitions(self, spark, stats_tbl):
        # numeric stats vs string bounds: not provably disjoint → scan
        got = read_snapshot(
            spark, stats_tbl, column_ranges={"k": ("a", "z")}
        )
        assert got.count() == 30

    def test_open_ended_ranges(self, spark, stats_tbl):
        lo_open = read_snapshot(spark, stats_tbl, column_ranges={"k": (None, 9)})
        assert all("/p=0/" in f for f in lo_open.inputFiles())
        hi_open = read_snapshot(spark, stats_tbl, column_ranges={"k": (200, None)})
        assert all("/p=2/" in f for f in hi_open.inputFiles())

    def test_merge_refreshes_hot_and_carries_cold_stats(self, spark, stats_tbl):
        # rewrite p=1 with a wider k range; p=0/p=2 stats must survive
        src = spark.createDataFrame(
            [(150, "v150", 1)], "k long, v string, p long"
        )
        assert merge_snapshot(stats_tbl, src, "k", "p") == 2
        man = read_manifest(stats_tbl)
        assert man["stats"]["p=1"]["k"] == [100, 150, 0]  # refreshed from footers
        assert man["stats"]["p=0"]["k"] == [0, 9, 0]  # carried with the cold dir
        # skipping still correct after the merge: only p=1 can hold
        # k=150, and the caller's real filter lands the exact row
        got = read_snapshot(spark, stats_tbl, column_ranges={"k": (150, 150)})
        assert all("/p=1/" in f for f in got.inputFiles())
        assert {r.k for r in got.filter("k = 150").collect()} == {150}

    def test_merge_bootstrap_records_stats(self, spark, tmp_path):
        path = str(tmp_path / "boot_tbl")
        src = spark.createDataFrame([(7, "x", 0)], "k long, v string, p long")
        assert merge_snapshot(path, src, "k", "p", stats_cols=["k"]) == 1
        assert read_manifest(path)["stats"]["p=0"]["k"] == [7, 7, 0]
        # and a follow-up merge keeps collecting without restating
        assert merge_snapshot(
            path,
            spark.createDataFrame([(9, "y", 0)], "k long, v string, p long"),
            "k",
            "p",
        ) == 2
        assert read_manifest(path)["stats"]["p=0"]["k"] == [7, 9, 0]

    def test_missing_stats_keep_partition(self, spark, base):
        # `base` was written without stats_cols: column_ranges must be
        # a no-op (conservative), never a filter.
        got = read_snapshot(spark, base, column_ranges={"k": (999, 999)})
        assert got.count() == 3

    def test_string_stats_and_compact_preserves(self, spark, tmp_path):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            compact_snapshot,
        )

        df = spark.createDataFrame(
            [("apple", 0), ("banana", 0), ("pear", 1), ("zebra", 1)],
            "name string, p long",
        )
        path = str(tmp_path / "str_tbl")
        write_snapshot(df, path, "p", stats_cols=["name"])
        man = read_manifest(path)
        assert man["stats"]["p=0"]["name"] == ["apple", "banana", 0]
        got = read_snapshot(spark, path, column_ranges={"name": ("a", "c")})
        assert all("/p=0/" in f for f in got.inputFiles())
        # compaction recomputes stats for the rewritten layout
        compact_snapshot(spark, path)
        man2 = read_manifest(path)
        assert man2["stats"]["p=1"]["name"] == ["pear", "zebra", 0]


class TestZOrderCompact:
    """compact_snapshot(zorder_by=...) — OPTIMIZE ZORDER as snapshot
    maintenance: re-clusters rows along the Morton curve within each
    hive partition so row-group footers stay tight on every named
    column, while contents, versioning, and manifest stats behave like
    a plain compact."""

    def _grid_table(self, spark, tmp_path):
        import itertools

        n = 64
        rows = [
            (x * 1000 + y, x, y, 0)
            for x, y in itertools.product(range(n), range(n))
        ]
        df = spark.createDataFrame(rows, "k long, x long, y long, p long")
        path = str(tmp_path / "ztbl")
        assert write_snapshot(df, path, "p", stats_cols=["x"]) == 1
        return path

    def test_zorder_compact_prunes_on_both_columns(self, spark, tmp_path):
        from pandas_analysis_with_postgres_spark.sources.layout import (
            rowgroup_prune_fraction,
        )
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            compact_snapshot,
        )

        path = self._grid_table(spark, tmp_path)
        # v1 arrived x-major: y stats are blind across every file
        v1_dir = os.path.join(path, read_manifest(path, 1)["partitions"]["p=0"])
        assert rowgroup_prune_fraction(v1_dir, "y", 0, 7) == 0.0
        assert compact_snapshot(spark, path, zorder_by=["x", "y"]) == 2
        man = read_manifest(path)
        assert man["operation"] == "compact+zorder"
        part_dir = os.path.join(path, man["partitions"]["p=0"])
        # the re-clustered layout prunes row groups on BOTH columns
        assert rowgroup_prune_fraction(part_dir, "x", 0, 7) >= 0.25
        assert rowgroup_prune_fraction(part_dir, "y", 0, 7) >= 0.25
        # contents identical; manifest stats recomputed and still exact
        got = read_snapshot(spark, path)
        assert got.count() == 64 * 64
        assert man["stats"]["p=0"]["x"] == [0, 63, 0]
        # older version still readable (time travel untouched)
        assert read_snapshot(spark, path, 1).count() == 64 * 64


class TestManifestBlooms:
    """Per-partition Bloom filters in the manifest: point-lookup
    skipping for keys UNCORRELATED with the partition layout (where
    min/max stats prune nothing)."""

    @pytest.fixture()
    def bloom_tbl(self, spark, tmp_path):
        # keys interleave across partitions mod 3: every partition's
        # [min,max] covers nearly the whole keyspace, so range stats
        # are useless — exactly the bloom's job.
        rows = [(k, f"v{k}", k % 3) for k in range(90)]
        df = spark.createDataFrame(rows, "k long, v string, p long")
        path = str(tmp_path / "bloom_tbl")
        assert write_snapshot(df, path, "p", bloom_cols=["k"]) == 1
        return path

    def test_blooms_recorded_and_prune_point_lookup(self, spark, bloom_tbl):
        man = read_manifest(bloom_tbl)
        assert man["schema"]["bloom_cols"] == ["k"]
        assert set(man["blooms"]) == {"p=0", "p=1", "p=2"}
        # k=41 lives only in partition p=2 (41 % 3 == 2)
        got = read_snapshot(spark, bloom_tbl, point_lookups={"k": 41})
        assert all("/p=2/" in f for f in got.inputFiles())
        assert {r.k for r in got.filter("k = 41").collect()} == {41}

    def test_absent_key_returns_empty_frame(self, spark, bloom_tbl):
        got = read_snapshot(spark, bloom_tbl, point_lookups={"k": 123456})
        # bloom may false-positive a partition, but with high
        # probability all three are pruned; either way the real
        # filter yields nothing and nothing errors.
        assert got.filter("k = 123456").count() == 0
        assert set(got.columns) == {"k", "v", "p"}

    def test_lookup_equivalent_to_full_scan(self, spark, bloom_tbl):
        for key in (0, 1, 2, 33, 89, 1000):
            pruned = read_snapshot(
                spark, bloom_tbl, point_lookups={"k": key}
            ).filter(f"k = {key}")
            full = read_snapshot(spark, bloom_tbl).filter(f"k = {key}")
            assert {r.k for r in pruned.collect()} == {
                r.k for r in full.collect()
            }, key

    def test_merge_refreshes_hot_and_carries_cold_blooms(self, spark, bloom_tbl):
        v1 = read_manifest(bloom_tbl)
        src = spark.createDataFrame(
            [(90, "v90", 0)], "k long, v string, p long"
        )
        assert merge_snapshot(bloom_tbl, src, "k", "p") == 2
        man = read_manifest(bloom_tbl)
        # cold partitions carry the identical bitmap by reference
        assert man["blooms"]["p=1"] == v1["blooms"]["p=1"]
        assert man["blooms"]["p=2"] == v1["blooms"]["p=2"]
        # the new key is findable through the refreshed hot bloom
        got = read_snapshot(spark, bloom_tbl, point_lookups={"k": 90})
        assert {r.k for r in got.filter("k = 90").collect()} == {90}
        assert all("/p=0/" in f for f in got.inputFiles())

    def test_unsupported_bloom_col_type_rejected(self, spark, tmp_path):
        # strings are supported now (crc32 path, test_string_bloom);
        # float/double still refuse — no engine-exact render to hash
        df = spark.createDataFrame([(1.5, 0)], "x double, p long")
        with pytest.raises(ValueError, match="integral or string"):
            write_snapshot(df, str(tmp_path / "t"), "p", bloom_cols=["x"])

    def test_tables_without_blooms_ignore_point_lookups(self, spark, base):
        got = read_snapshot(spark, base, point_lookups={"k": 999})
        assert got.count() == 3  # conservative: no bloom → full scan


class TestInfoAndMaintenance:
    def test_table_info_counts_and_coverage(self, spark, tmp_path):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            table_info,
        )

        rows = [(k, f"v{k}", k % 2) for k in range(20)]
        path = str(tmp_path / "t")
        write_snapshot(
            spark.createDataFrame(rows, "k long, v string, p long"),
            path,
            "p",
            stats_cols=["k"],
            bloom_cols=["k"],
        )
        merge_snapshot(
            path,
            spark.createDataFrame([(20, "x", 0)], "k long, v string, p long"),
            "k",
            "p",
        )
        info = table_info(path)
        assert info["version"] == 2 and info["operation"] == "merge"
        assert info["partition_col"] == "p" and info["n_partitions"] == 2
        # p=1 carried from commit 1, p=0 rewritten by commit 2
        assert info["n_commits_referenced"] == 2
        assert info["stats_cols"] == ["k"] and info["bloom_cols"] == ["k"]
        assert info["stats_partitions"] == 2 and info["bloom_partitions"] == 2
        assert info["n_files"] > 0 and info["n_bytes"] > 0
        assert info["n_versions_retained"] == 2

    def test_maintain_compacts_only_past_threshold(self, spark, tmp_path):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            maintain_snapshot,
            read_manifest,
            table_info,
        )

        path = str(tmp_path / "t")
        write_snapshot(
            spark.createDataFrame([(0, 0)], "k long, p long"), path, "p"
        )
        # three merges, each touching a NEW partition → 4 commits live
        for i in range(1, 4):
            merge_snapshot(
                path,
                spark.createDataFrame([(i, i)], "k long, p long"),
                "k",
                "p",
            )
        assert table_info(path)["n_commits_referenced"] == 4
        # healthy under a loose threshold: nothing happens
        r = maintain_snapshot(spark, path, max_commits=8, min_age_sec=0)
        assert r["compacted"] is None
        # tight threshold: compacted into one commit, history GC'd
        r = maintain_snapshot(
            spark, path, max_commits=2, keep_versions=1, min_age_sec=0
        )
        assert r["compacted"] == 5
        info = table_info(path)
        assert info["n_commits_referenced"] == 1
        assert info["n_versions_retained"] == 1
        assert read_snapshot(spark, path).count() == 4
        # idempotent when healthy
        r = maintain_snapshot(spark, path, max_commits=2, min_age_sec=0)
        assert r["compacted"] is None and r["expired"] == []


class TestChangeDataFeed:
    """diff_snapshots / read_changes: version-to-version change rows
    derived from manifest-changed partitions only."""

    def _chg(self, df):
        return {
            (r.change_type, r.k, r.v, r.p)
            for r in df.select("change_type", "k", "v", "p").collect()
        }

    def test_diff_classifies_insert_update_delete(self, spark, base):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            diff_snapshots,
        )

        # v2: update k=1, insert k=4 (new partition), leave p=20 cold
        src = spark.createDataFrame(
            [(1, "A", 10), (4, "d", 30)], "k long, v string, p long"
        )
        merge_snapshot(base, src, "k", "p")
        got = self._chg(diff_snapshots(spark, base, 1, 2, "k"))
        assert got == {
            ("update_pre", 1, "a", 10),
            ("update_post", 1, "A", 10),
            ("insert", 4, "d", 30),
        }

    def test_diff_scans_only_changed_partitions(self, spark, base):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            diff_snapshots,
        )

        src = spark.createDataFrame([(1, "A", 10)], "k long, v string, p long")
        merge_snapshot(base, src, "k", "p")
        d = diff_snapshots(spark, base, 1, 2, "k")
        # cold partition p=20 carried by reference: never scanned
        assert all("/p=20/" not in f for f in d.inputFiles())

    def test_diff_from_version_zero_is_all_inserts(self, spark, base):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            diff_snapshots,
        )

        got = self._chg(diff_snapshots(spark, base, 0, 1, "k"))
        assert got == {
            ("insert", 1, "a", 10),
            ("insert", 2, "b", 10),
            ("insert", 3, "c", 20),
        }

    def test_identical_versions_empty_feed(self, spark, base):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            compact_snapshot,
            diff_snapshots,
        )

        # a compact rewrites every partition dir but changes no DATA —
        # rows pair up and the struct compare finds nothing
        compact_snapshot(spark, base)
        assert self._chg(diff_snapshots(spark, base, 1, 2, "k")) == set()
        # same version to itself: no changed partitions at all
        assert diff_snapshots(spark, base, 1, 1, "k").count() == 0

    def test_read_changes_cumulative_with_versions(self, spark, base):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            read_changes,
        )

        merge_snapshot(
            base,
            spark.createDataFrame([(4, "d", 30)], "k long, v string, p long"),
            "k",
            "p",
        )
        merge_snapshot(
            base,
            spark.createDataFrame([(4, "D", 30)], "k long, v string, p long"),
            "k",
            "p",
        )
        feed = read_changes(spark, base, since_version=1, key="k")
        got = {
            (r.version, r.change_type, r.k, r.v)
            for r in feed.select("version", "change_type", "k", "v").collect()
        }
        assert got == {
            (2, "insert", 4, "d"),
            (3, "update_pre", 4, "d"),
            (3, "update_post", 4, "D"),
        }
        # caught-up consumer gets an empty frame, not an error
        assert read_changes(spark, base, since_version=3, key="k").count() == 0


def test_bloom_bits_table_property(spark, tmp_path):
    """bloom_bits is a per-table property: a larger bitmap survives
    merges (read side self-describes bits from the bitmap length)."""
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_manifest,
        read_snapshot,
        write_snapshot,
    )

    rows = [(k, k % 2) for k in range(40)]
    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(rows, "k long, p long"),
        path,
        "p",
        bloom_cols=["k"],
        bloom_bits=65536,
    )
    man = read_manifest(path)
    assert man["schema"]["bloom_bits"] == 65536
    assert len(man["blooms"]["p=0"]["k"]) == 65536 // 4  # hex chars
    merge_snapshot(
        path,
        spark.createDataFrame([(41, 1)], "k long, p long"),
        "k",
        "p",
    )
    man2 = read_manifest(path)
    assert len(man2["blooms"]["p=1"]["k"]) == 65536 // 4  # refreshed at table bits
    got = read_snapshot(spark, path, point_lookups={"k": 41})
    assert {r.k for r in got.filter("k = 41").collect()} == {41}
    with pytest.raises(ValueError, match="multiple of 8"):
        write_snapshot(
            spark.createDataFrame(rows, "k long, p long"),
            str(tmp_path / "t2"),
            "p",
            bloom_cols=["k"],
            bloom_bits=100,
        )


def test_consume_changes_durable_cursor_loop(spark, tmp_path):
    """The CDC consumer loop: at-least-once delivery with a durable
    cursor; exactly-once when apply_fn is txn-idempotent."""
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        consume_changes,
        merge_snapshot,
        write_snapshot,
    )

    src_tbl = str(tmp_path / "src")
    cursor = str(tmp_path / "cursor.json")
    write_snapshot(
        spark.createDataFrame([(1, "a", 0)], "k long, v string, p long"),
        src_tbl,
        "p",
    )
    merge_snapshot(
        src_tbl,
        spark.createDataFrame([(2, "b", 0)], "k long, v string, p long"),
        "k",
        "p",
    )
    seen = []

    def apply_fn(feed, from_v, to_v):
        seen.append((from_v, to_v, {(r.change_type, r.k) for r in feed.collect()}))

    r = consume_changes(spark, src_tbl, "k", apply_fn, cursor)
    assert r == {"from_version": 0, "to_version": 2, "applied": True}
    assert seen[0][2] == {("insert", 1), ("insert", 2)}
    # caught up: no scan, no apply
    r = consume_changes(spark, src_tbl, "k", apply_fn, cursor)
    assert r["applied"] is False and len(seen) == 1
    # new commit → only the delta is delivered
    merge_snapshot(
        src_tbl,
        spark.createDataFrame([(2, "B", 0)], "k long, v string, p long"),
        "k",
        "p",
    )
    consume_changes(spark, src_tbl, "k", apply_fn, cursor)
    assert seen[1][:2] == (2, 3)
    assert seen[1][2] == {("update_pre", 2), ("update_post", 2)}
    # crash inside apply_fn: cursor does NOT advance → redelivery
    def boom(feed, from_v, to_v):
        raise RuntimeError("crash")

    merge_snapshot(
        src_tbl,
        spark.createDataFrame([(3, "c", 0)], "k long, v string, p long"),
        "k",
        "p",
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        consume_changes(spark, src_tbl, "k", boom, cursor)
    r = consume_changes(spark, src_tbl, "k", apply_fn, cursor)
    assert r["applied"] is True and seen[-1][2] == {("insert", 3)}


def test_overwrite_inherits_table_stats_and_bloom_properties(spark, tmp_path):
    """stats_cols/bloom_cols/bloom_bits are TABLE properties: a full
    overwrite that omits them must inherit the prior manifest's values
    (advisor round-4) — a routine refresh never silently disables the
    skipping indexes. Explicit [] still drops them."""
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_manifest,
        read_snapshot,
        write_snapshot,
    )

    df = spark.createDataFrame(
        [(p * 100 + i, p) for p in range(3) for i in range(10)], "k long, p long"
    )
    path = str(tmp_path / "tbl")
    assert (
        write_snapshot(
            df, path, "p", stats_cols=["k"], bloom_cols=["k"], bloom_bits=8192
        )
        == 1
    )
    # overwrite WITHOUT repeating the properties
    assert write_snapshot(df, path, "p") == 2
    man = read_manifest(path, 2)
    assert man["schema"]["stats_cols"] == ["k"]
    assert man["schema"]["bloom_cols"] == ["k"]
    assert man["schema"]["bloom_bits"] == 8192
    assert man["stats"]["p=0"]["k"] == [0, 9, 0]
    # skipping still works against the inherited stats
    got = read_snapshot(spark, path, column_ranges={"k": (100, 109)})
    assert {r.k for r in got.collect()} == set(range(100, 110))
    # explicit empty list drops the property
    assert write_snapshot(df, path, "p", stats_cols=[], bloom_cols=[]) == 3
    man3 = read_manifest(path, 3)
    assert "stats_cols" not in man3.get("schema", {})
    assert "bloom_cols" not in man3.get("schema", {})


def test_read_changes_end_version_bounds_feed(spark, tmp_path):
    """A commit landing between the consumer's version snapshot and
    its read_changes call must not widen the feed (advisor round-4):
    with end_version pinned, later commits are excluded and redelivered
    in the next cycle."""
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
        read_changes,
        write_snapshot,
    )

    tbl = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, "a", 0)], "k long, v string, p long"), tbl, "p"
    )
    merge_snapshot(
        tbl, spark.createDataFrame([(2, "b", 0)], "k long, v string, p long"), "k", "p"
    )
    # consumer snapshots latest=2, then a concurrent commit lands (v3)
    merge_snapshot(
        tbl, spark.createDataFrame([(3, "c", 0)], "k long, v string, p long"), "k", "p"
    )
    feed = read_changes(spark, tbl, since_version=0, key="k", end_version=2)
    assert {(r.change_type, r.k, r.version) for r in feed.collect()} == {
        ("insert", 1, 1),
        ("insert", 2, 2),
    }


def test_tags_pin_versions_and_survive_expiry(spark, tmp_path):
    """Tags: named version pointers that are RETENTION ROOTS — expiry
    keeps a tagged version and its data however old, until untagged."""
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        delete_tag,
        expire_snapshots,
        list_tags,
        merge_snapshot,
        read_snapshot,
        resolve_tag,
        tag_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 0)], "k long, p long"), path, "p"
    )
    tag_snapshot(path, "release-1")
    for i in range(2, 6):
        merge_snapshot(
            path,
            spark.createDataFrame([(i, 0)], "k long, p long"),
            "k",
            "p",
        )
    assert resolve_tag(path, "release-1") == 1
    # read by tag name
    assert {r.k for r in read_snapshot(spark, path, "release-1").collect()} == {1}
    # aggressive expiry keeps the tagged v1 (and the newest 2)
    expire_snapshots(path, keep=2, min_age_sec=0.0)
    assert {r.k for r in read_snapshot(spark, path, "release-1").collect()} == {1}
    assert list_tags(path) == {"release-1": 1}
    # untag → the version becomes expirable
    delete_tag(path, "release-1")
    expire_snapshots(path, keep=2, min_age_sec=0.0)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, 1).collect()
    # invalid tag names rejected
    with _pytest.raises(ValueError):
        tag_snapshot(path, "bad/name")


def test_merge_replaces_null_key_row(spark, tmp_path):
    """Code-review finding: a plain equi-join never matches a NULL
    key, so upserting a NULL-key row used to KEEP the old row and
    append the new one — two NULL-key rows where the merge contract
    promises key uniqueness. The null-safe anti-join must replace."""
    path = str(tmp_path / "nk")
    write_snapshot(
        spark.createDataFrame(
            [(None, "old", 0), (1, "a", 0)], "k integer, v string, p long"
        ),
        path,
        "p",
    )
    merge_snapshot(
        path,
        spark.createDataFrame([(None, "NEW", 0)], "k integer, v string, p long"),
        "k",
        "p",
    )
    rows = {(r.k, r.v) for r in read_snapshot(spark, path).collect()}
    assert rows == {(None, "NEW"), (1, "a")}


def test_expire_removes_crashed_writer_temp_files(spark, tmp_path):
    """Code-review finding: a writer killed between the manifest temp
    write and the os.link leaks a .tmp-* file; expire_snapshots must
    deliver the docstring's crash-cleanup story for them too (with
    the same age guard that protects in-flight writers)."""
    import os
    import time

    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        expire_snapshots,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 0)], "k long, p long"), path, "p"
    )
    snap = tmp_path / "t" / "_snapshots"
    stale = snap / ".tmp-deadbeef"
    stale.write_text("{}")
    old = time.time() - 7200
    os.utime(stale, (old, old))
    fresh = snap / ".tmp-cafebabe"
    fresh.write_text("{}")  # in-flight writer: younger than cutoff
    expire_snapshots(path, keep=2, min_age_sec=3600)
    assert not stale.exists()
    assert fresh.exists()


class TestCompactPartitions:
    def _fragmented(self, spark, tmp_path):
        # 64 rows per partition written from 16 tasks → many files per
        # dir; p=2 written compactly in a second commit (1 task)
        df = spark.createDataFrame(
            [(i, f"v{i}", i % 2) for i in range(128)],
            "k long, v string, p long",
        ).repartition(16)
        path = str(tmp_path / "frag")
        write_snapshot(df, path, "p", stats_cols=["k"])
        src = spark.createDataFrame(
            [(1000 + i, f"w{i}", 2) for i in range(4)],
            "k long, v string, p long",
        ).coalesce(1)
        merge_snapshot(path, src, "k", "p")
        return path

    def test_auto_select_rewrites_only_fragmented(self, spark, tmp_path):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            compact_partitions,
        )

        path = self._fragmented(spark, tmp_path)
        man_before = read_manifest(path)
        before = {r.k for r in read_snapshot(spark, path).collect()}
        out = compact_partitions(spark, path, max_files=4)
        assert sorted(out["compacted"]) == ["p=0", "p=1"]  # p=2 has 1 file
        assert out["files_after"] == 2  # one file per rewritten dir
        assert out["files_before"] > out["files_after"]
        man = read_manifest(path)
        # cold partition carried by reference, content identical
        assert man["partitions"]["p=2"] == man_before["partitions"]["p=2"]
        assert {r.k for r in read_snapshot(spark, path).collect()} == before
        # stats recomputed and exact for the rewritten dirs
        assert man["stats"]["p=0"]["k"][:2] == [0, 126]
        # healthy table: second call is a no-op, no commit
        again = compact_partitions(spark, path, max_files=4)
        assert again["compacted"] == [] and again["version"] == man["version"]

    def test_folds_tombstones_and_drops_emptied(self, spark, tmp_path):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            compact_partitions,
            delete_where,
            maintain_snapshot,
        )

        df = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 1)], "k long, p long"
        )
        path = str(tmp_path / "tomb")
        write_snapshot(df, path, "p")
        delete_where(spark, path, "k <= 1", mode="merge-on-read", key="k")
        delete_where(spark, path, "k = 3", mode="merge-on-read", key="k")
        # auto-selection picks the tombstoned partitions even when not
        # fragmented; p=1 rewrites to zero rows and is dropped
        out = compact_partitions(spark, path)
        assert sorted(out["compacted"]) == ["p=0", "p=1"]
        man = read_manifest(path)
        assert "tombstones" not in man
        assert set(man["partitions"]) == {"p=0"}
        assert {r.k for r in read_snapshot(spark, path).collect()} == {2}

    def test_maintain_prefers_partition_scoped_for_tombstones(
        self, spark, tmp_path
    ):
        from pandas_analysis_with_postgres_spark.sources.snapshot import (
            delete_where,
            maintain_snapshot,
        )

        df = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 1)], "k long, p long"
        )
        path = str(tmp_path / "mnt")
        write_snapshot(df, path, "p")
        v1_rel = read_manifest(path)["partitions"]["p=1"]
        delete_where(spark, path, "k = 1", mode="merge-on-read", key="k")
        out = maintain_snapshot(spark, path, min_age_sec=1e9)
        assert out["compacted"] is not None
        man = read_manifest(path)
        assert "tombstones" not in man
        # only the tombstoned partition was rewritten
        assert man["partitions"]["p=1"] == v1_rel
        assert {r.k for r in read_snapshot(spark, path).collect()} == {2, 3}


def test_stream_append_sink_end_to_end_and_exactly_once(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.streaming import (
        events_stream_multibatch,
        stream_append_sink,
    )

    sf_dir = "/root/testdata/sf0.001"
    table = str(tmp_path / "ev_app")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream_multibatch(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    stream_append_sink(
        stream, table, "event_type", app_id="app", checkpoint_dir=ckpt
    )
    from pandas_analysis_with_postgres_spark.sources.parquet import load_table

    expect = load_table(spark, sf_dir, "events").count()
    assert read_snapshot(spark, table).count() == expect
    man = read_manifest(table)
    assert man["operation"] == "append"
    assert man["txn"]["app"] == man["version"] - 1
    assert man["version"] >= 3  # one append commit per micro-batch
    # re-drain from the same checkpoint: nothing new, nothing appended
    stream2 = events_stream_multibatch(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    stream_append_sink(
        stream2, table, "event_type", app_id="app", checkpoint_dir=ckpt
    )
    assert read_manifest(table)["version"] == man["version"]
    assert read_snapshot(spark, table).count() == expect


def test_stream_append_sink_into_branch(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        branch_head,
        create_branch,
        fast_forward_branch,
        write_snapshot,
    )
    from pandas_analysis_with_postgres_spark.streaming import (
        events_stream_multibatch,
        stream_append_sink,
    )

    sf_dir = "/root/testdata/sf0.001"
    table = str(tmp_path / "ev_br")
    ckpt = str(tmp_path / "ckpt")
    from pandas_analysis_with_postgres_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    seed = ev.where("event_id % 2 = 0")
    write_snapshot(seed, table, "event_type")
    create_branch(table, "ingest")
    stream = events_stream_multibatch(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    ).where("event_id % 2 = 1")
    stream_append_sink(
        stream, table, "event_type", app_id="bapp",
        checkpoint_dir=ckpt, branch="ingest",
    )
    n_seed, n_all = seed.count(), ev.count()
    # main never saw the stream; the branch has everything
    assert read_snapshot(spark, table).count() == n_seed
    assert read_snapshot(spark, table, "branch:ingest").count() == n_all
    assert branch_head(table, "ingest") >= 4  # ≥3 micro-batch commits
    fast_forward_branch(table, "ingest")
    assert read_snapshot(spark, table).count() == n_all


def test_partition_collect_cardinality_guard(spark, tmp_path, monkeypatch):
    # A table mis-partitioned by a high-NDV column must fail LOUDLY at
    # the driver-side partition-value collect, not OOM the driver
    # silently (the collects are O(distinct pcol), not O(rows))
    from pandas_analysis_with_postgres_spark.sources import snapshot as snap

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(50)], "k long, p long, v double"
    )
    snap.write_snapshot(base, path, "p")
    monkeypatch.setattr(snap, "MAX_COLLECTED_PARTITIONS", 50)
    wide = spark.createDataFrame(
        [(i, i, float(i)) for i in range(100)], "k long, p long, v double"
    )
    with pytest.raises(ValueError, match="more than 50 distinct"):
        snap.merge_snapshot(path, wide, "k", "p")
    # under the cap: unchanged behavior
    ok = spark.createDataFrame(
        [(i, i % 5, float(i) + 1) for i in range(50)],
        "k long, p long, v double",
    )
    snap.merge_snapshot(path, ok, "k", "p")
    assert snap.read_snapshot(spark, path).count() == 50

    # the groupBy(pcol)-aggregate collects (delete_where hit-partition
    # planning, SQL UPDATE hit-partition planning) hit the SAME cap —
    # these bypassed the r07 guard, which only covered distinct(pcol)
    from pyspark.sql import functions as F

    from pandas_analysis_with_postgres_spark.sources.sql_merge import (
        execute_update,
    )

    wide_path = str(tmp_path / "wide")
    monkeypatch.setattr(snap, "MAX_COLLECTED_PARTITIONS", 200_000)
    snap.write_snapshot(
        spark.createDataFrame(
            [(i, i, float(i)) for i in range(100)], "k long, p long, v double"
        ),
        wide_path,
        "p",
    )
    monkeypatch.setattr(snap, "MAX_COLLECTED_PARTITIONS", 50)
    with pytest.raises(ValueError, match="more than 50 distinct"):
        snap.delete_where(spark, wide_path, F.col("v") >= 0.0)
    with pytest.raises(ValueError, match="more than 50 distinct"):
        execute_update(
            spark,
            "UPDATE wide SET v = v + 1.0",
            tables={"wide": wide_path},
        )


def test_metadata_tables(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        delete_where,
        read_metadata_table,
        replace_partitions,
        write_snapshot,
    )

    path = str(tmp_path / "mt")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "k long, p long, v double"
    )
    write_snapshot(df, path, "p")
    replace_partitions(
        path,
        spark.createDataFrame([(7, 1, 7.0)], "k long, p long, v double"),
        "p",
    )
    from pyspark.sql import functions as F

    delete_where(spark, path, F.col("k") == 0, mode="merge-on-read", key="k")

    parts = {
        r.partition: r
        for r in read_metadata_table(spark, path, "partitions").collect()
    }
    assert parts["p=0"].n_rows == 9 and parts["p=0"].n_deleted == 1
    assert parts["p=1"].n_rows == 1 and parts["p=1"].n_deleted == 0
    assert parts["p=2"].n_rows == 10
    assert all(r.commit for r in parts.values())

    hist = read_metadata_table(spark, path, "history").collect()
    assert [(r.version, r.operation) for r in hist] == [
        (1, "overwrite"),
        (2, "replace"),
        (3, "delete-mor"),
    ]
    assert all(r.committed_at for r in hist)
    # version pin: history stops at the pinned head
    h2 = read_metadata_table(spark, path, "history", version=2).collect()
    assert [r.version for r in h2] == [1, 2]

    files = read_metadata_table(spark, path, "files").collect()
    assert all(f.file.endswith(".parquet") and f.bytes > 0 for f in files)
    assert {f.partition for f in files} == {"p=0", "p=1", "p=2"}

    import pytest as _pt

    with _pt.raises(ValueError, match="unknown metadata table"):
        read_metadata_table(spark, path, "snapshots")

    # history after expiry: like Iceberg's history table, list only
    # the RETAINED snapshots — expire_snapshots unlinks old manifests
    # and the table must skip them, not raise FileNotFoundError
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        expire_snapshots,
    )

    expire_snapshots(path, keep=2, min_age_sec=0)
    hist3 = read_metadata_table(spark, path, "history").collect()
    assert [r.version for r in hist3] == [2, 3]


def test_hash_distribution_writes_one_file_per_partition(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        append_snapshot,
        read_snapshot,
        write_snapshot,
    )

    # 32-task input × 3 partitions: as-is writes many files per dir,
    # distribution="hash" collapses each dir to one task's output
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(3000)],
        "k long, p long, v double",
    ).repartition(32)
    frag = str(tmp_path / "frag")
    write_snapshot(df, frag, "p")
    tight = str(tmp_path / "tight")
    write_snapshot(df, tight, "p", distribution="hash")

    def files_per_dir(root):
        from pathlib import Path

        out = {}
        for f in Path(root).rglob("*.parquet"):
            out.setdefault(f.parent.name, 0)
            out[f.parent.name] += 1
        return out

    assert max(files_per_dir(frag).values()) > 1
    assert set(files_per_dir(tight).values()) == {1}
    assert read_snapshot(spark, tight).count() == 3000
    # append path honors it too
    more = spark.createDataFrame(
        [(9000 + i, i % 3, 1.0) for i in range(300)],
        "k long, p long, v double",
    ).repartition(16)
    append_snapshot(tight, more, "p", distribution="hash")
    assert read_snapshot(spark, tight).count() == 3300
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown distribution"):
        write_snapshot(df, str(tmp_path / "x"), "p", distribution="sorted")


def test_stream_append_maintains_sum_stats(spark, tmp_path):
    # a ::sum table property must survive STREAMING ingest: every
    # micro-batch append records [sum, n_nonnull] for its partitions
    # (property inheritance through append_snapshot), so manifest
    # SUM/AVG answers stay exact as the stream runs
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        answer_from_manifest,
    )
    from pandas_analysis_with_postgres_spark.sources.parquet import load_table
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        manifest_column_sum,
        write_snapshot,
    )
    from pandas_analysis_with_postgres_spark.streaming import (
        events_stream_multibatch,
        stream_append_sink,
    )
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    table = str(tmp_path / "ev")
    cents = (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("long")
    # declare the property on a 1-row seed table; the stream fills it
    write_snapshot(
        spark.createDataFrame(
            [(0, "seed", 0)], "event_id long, event_type string, vmicros long"
        ),
        table,
        "event_type",
        stats_cols=["vmicros::sum"],
    )
    stream = events_stream_multibatch(spark, sf_dir).select(
        "event_id", "event_type", cents.alias("vmicros")
    )
    stream_append_sink(
        stream, table, "event_type",
        app_id="sumapp", checkpoint_dir=str(tmp_path / "ckpt"),
    )
    truth = (
        load_table(spark, sf_dir, "events")
        .select(cents.alias("v"))
        .agg(F.sum("v"), F.count("v"))
        .collect()[0]
    )
    got = manifest_column_sum(table, "vmicros")
    assert got == (int(truth[0]) + 0, int(truth[1]) + 1)  # + the seed row
    out = answer_from_manifest(
        spark, "SELECT SUM(vmicros) AS s FROM t", {"t": table}
    )
    assert out is not None and out.collect()[0].s == int(truth[0])
