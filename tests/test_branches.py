"""Snapshot branches: named manifest sequences forked from main
(Iceberg branch refs with git fast-forward semantics) — branch commits
are invisible to main's readers, every reader audits them via
``version="branch:<name>"``, fast-forward publishes the whole sequence
as main's next versions with history intact, and unpublished branch
data survives GC until the branch drops."""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    ConcurrentCommitError,
    branch_head,
    create_branch,
    current_version,
    drop_branch,
    expire_snapshots,
    fast_forward_branch,
    list_branches,
    manifest_aggregate,
    merge_snapshot,
    read_manifest,
    read_snapshot,
    replace_partitions,
    write_snapshot,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "k long, p long, v double"
    )
    path = str(tmp_path / "tbl")
    write_snapshot(df, path, "p", stats_cols=["v"])
    return path


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, p long, v double")


def test_branch_commits_invisible_to_main(spark, tbl):
    create_branch(tbl, "exp")
    merge_snapshot(tbl, _df(spark, [(99, 0, 5.0)]), "k", "p", branch="exp")
    # main: untouched version AND untouched content
    assert current_version(tbl) == 1
    assert read_snapshot(spark, tbl).count() == 30
    # branch: sees its commit through every reader
    assert read_snapshot(spark, tbl, "branch:exp").count() == 31
    agg = manifest_aggregate(tbl, columns=["v"], version="branch:exp")
    assert agg["n_rows"] == 31
    assert list_branches(tbl) == {"exp": {"fork_base": 1, "head": 2}}


def test_branch_sequence_and_fast_forward_history(spark, tbl):
    create_branch(tbl, "exp")
    merge_snapshot(
        tbl, _df(spark, [(0, 0, 100.0), (99, 0, 5.0)]), "k", "p", branch="exp"
    )
    replace_partitions(tbl, _df(spark, [(500, 2, 1.0)]), "p", branch="exp")
    assert branch_head(tbl, "exp") == 3
    head = fast_forward_branch(tbl, "exp")
    assert head == 3 and current_version(tbl) == 3
    # published content: upsert applied, partition p=2 replaced
    rows = {(r.k, r.v) for r in read_snapshot(spark, tbl).collect()}
    assert (0, 100.0) in rows and (99, 5.0) in rows and (500, 1.0) in rows
    assert not any(k % 3 == 2 for k, _ in rows if k != 500)
    # HISTORY intact: the intermediate branch state is main's v2 now
    assert read_snapshot(spark, tbl, 2).count() == 31
    assert read_manifest(tbl, 2)["operation"] == "merge"
    # the branch survives, re-forked at the published head (git ff)
    assert list_branches(tbl)["exp"] == {"fork_base": 3, "head": 3}
    # and stays usable for the next run
    merge_snapshot(tbl, _df(spark, [(777, 1, 9.0)]), "k", "p", branch="exp")
    assert branch_head(tbl, "exp") == 4 and current_version(tbl) == 3


def test_fast_forward_refuses_when_main_advanced(spark, tbl):
    create_branch(tbl, "exp")
    merge_snapshot(tbl, _df(spark, [(99, 0, 5.0)]), "k", "p", branch="exp")
    merge_snapshot(tbl, _df(spark, [(1, 1, 2.0)]), "k", "p")  # main moves
    with pytest.raises(ConcurrentCommitError, match="cannot fast-forward"):
        fast_forward_branch(tbl, "exp")
    # main's v2 is the main commit, not the branch's
    assert read_snapshot(spark, tbl, 2).count() == 30


def test_concurrent_branch_commit_conflict(spark, tbl):
    create_branch(tbl, "exp")
    merge_snapshot(tbl, _df(spark, [(99, 0, 5.0)]), "k", "p", branch="exp")
    # a writer pinned to the stale branch head loses the race
    with pytest.raises(ConcurrentCommitError):
        merge_snapshot(
            tbl,
            _df(spark, [(98, 0, 6.0)]),
            "k",
            "p",
            branch="exp",
            expected_version=1,
        )


def test_branch_txn_idempotence_is_per_branch(spark, tbl):
    create_branch(tbl, "exp")
    v = merge_snapshot(
        tbl, _df(spark, [(99, 0, 5.0)]), "k", "p",
        branch="exp", txn=("app", 7),
    )
    # replay on the branch: no-op
    assert merge_snapshot(
        tbl, _df(spark, [(99, 0, 5.0)]), "k", "p",
        branch="exp", txn=("app", 7),
    ) == v
    assert read_snapshot(spark, tbl, "branch:exp").count() == 31


def test_branch_data_survives_gc_until_drop(spark, tbl):
    create_branch(tbl, "exp")
    merge_snapshot(tbl, _df(spark, [(99, 0, 5.0)]), "k", "p", branch="exp")
    merge_snapshot(tbl, _df(spark, [(1, 1, 2.0)]), "k", "p")
    merge_snapshot(tbl, _df(spark, [(2, 2, 3.0)]), "k", "p")
    expire_snapshots(tbl, keep=1, min_age_sec=0)
    # the unpublished branch commit still reads fully (its rewritten
    # partition AND its by-reference cold partitions were GC roots)
    assert read_snapshot(spark, tbl, "branch:exp").count() == 31
    drop_branch(tbl, "exp")
    removed = expire_snapshots(tbl, keep=1, min_age_sec=0)
    assert removed  # the branch-only commit dir reclaimed
    with pytest.raises(KeyError):
        read_manifest(tbl, "branch:exp")


def test_fast_forward_from_empty_table(spark, tmp_path):
    path = str(tmp_path / "fresh")
    os.makedirs(path)
    assert create_branch(path, "boot") == 0
    merge_snapshot(
        path, _df(spark, [(1, 0, 1.0), (2, 1, 2.0)]), "k", "p", branch="boot"
    )
    assert current_version(path) == 0
    assert fast_forward_branch(path, "boot") == 1
    assert read_snapshot(spark, path).count() == 2


def test_branch_name_and_ref_guards(spark, tbl):
    with pytest.raises(ValueError, match="invalid branch name"):
        create_branch(tbl, "a/b")
    create_branch(tbl, "exp")
    with pytest.raises(ValueError, match="already exists"):
        create_branch(tbl, "exp")
    with pytest.raises(KeyError):
        branch_head(tbl, "nope")
    with pytest.raises(KeyError):
        drop_branch(tbl, "nope")
    with pytest.raises(KeyError):
        read_manifest(tbl, "branch:exp@9")  # no such branch version
    # head before any commit = fork base; read falls through to main
    assert branch_head(tbl, "exp") == 1
    assert read_snapshot(spark, tbl, "branch:exp").count() == 30


def test_branch_inherits_table_properties(spark, tbl):
    # stats_cols pinned at v1 must be maintained by BRANCH commits too
    create_branch(tbl, "exp")
    merge_snapshot(tbl, _df(spark, [(99, 0, 500.0)]), "k", "p", branch="exp")
    man = read_manifest(tbl, "branch:exp")
    assert man["schema"]["stats_cols"] == ["v"]
    assert man["stats"]["p=0"]["v"][1] == 500.0  # fresh max on the hot part
    agg = manifest_aggregate(tbl, columns=["v"], version="branch:exp")
    assert agg["columns"]["v"]["max"] == 500.0


def test_diff_snapshots_across_branch_refs(spark, tbl):
    # "what would publishing change?" — the audit diff between main
    # and a branch head is ordinary CDF: version strings pass through
    # read_manifest, and only manifest-changed partitions scan
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        diff_snapshots,
    )

    create_branch(tbl, "exp")
    merge_snapshot(
        tbl, _df(spark, [(0, 0, 100.0), (99, 0, 5.0)]), "k", "p", branch="exp"
    )
    d = diff_snapshots(spark, tbl, 1, "branch:exp", "k")
    got = {(r.change_type, r.k) for r in d.collect()}
    assert got == {
        ("update_pre", 0), ("update_post", 0), ("insert", 99),
    }
    # and the reverse direction reads as the rollback feed
    back = diff_snapshots(spark, tbl, "branch:exp", 1, "k")
    assert {(r.change_type, r.k) for r in back.collect()} == {
        ("update_pre", 0), ("update_post", 0), ("delete", 99),
    }


def test_fast_forward_retry_after_crash_window(spark, tbl):
    # A crash BETWEEN the link loop and the ref.json rewrite leaves the
    # branch's own manifests in main with a stale fork_base; the retry
    # must recognize its own publication (same inode) and complete
    # idempotently instead of raising ConcurrentCommitError.
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        _branch_dir,
        _manifest_name,
        _snap_dir,
    )

    create_branch(tbl, "exp")
    merge_snapshot(tbl, _df(spark, [(99, 0, 5.0)]), "k", "p", branch="exp")
    merge_snapshot(tbl, _df(spark, [(98, 1, 6.0)]), "k", "p", branch="exp")
    fork, head = 1, branch_head(tbl, "exp")
    assert head == 3
    # simulate the crash: first manifest already linked into main,
    # ref.json never rewritten
    os.link(
        _branch_dir(tbl, "exp") / _manifest_name(fork + 1),
        _snap_dir(tbl) / _manifest_name(fork + 1),
    )
    assert current_version(tbl) == fork + 1  # main advanced past fork
    assert fast_forward_branch(tbl, "exp") == head  # retry completes
    assert current_version(tbl) == head
    assert read_snapshot(spark, tbl).count() == 32
    # a GENUINE foreign commit still raises
    create_branch(tbl, "exp2")
    merge_snapshot(tbl, _df(spark, [(97, 2, 7.0)]), "k", "p", branch="exp2")
    merge_snapshot(tbl, _df(spark, [(96, 0, 8.0)]), "k", "p")  # main moves
    with pytest.raises(ConcurrentCommitError):
        fast_forward_branch(tbl, "exp2")
