"""CLI front door: the sparkless paths (list, arg errors) — the run
path is exercised by everything else and kept out of unit tests to
avoid a second SparkSession spin-up."""

from __future__ import annotations

import pytest

from pandas_analysis_with_postgres_spark.__main__ import main


def test_list_prints_every_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "oracle" in out
    # round 4: the media featurize path got a real decoder + full hash
    # oracle, so NO query is rows-only any more.
    assert "a35_media_features" in out
    assert "rows-only" not in out
    from pandas_analysis_with_postgres_spark.plans import QUERIES

    assert len(out.strip().splitlines()) == len(QUERIES)


def test_requires_subcommand():
    with pytest.raises(SystemExit):
        main([])


def test_snapshot_history_and_expire(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 10)], "k long, p long"), path, "p"
    )
    merge_snapshot(
        path,
        spark.createDataFrame([(2, 20)], "k long, p long"),
        "k",
        "p",
        txn=("job", 0),
    )
    assert main(["snapshot", "history", path]) == 0
    out = capsys.readouterr().out
    assert "v1" in out and "v2" in out and "op=merge" in out and "'job': 0" in out
    assert main(["snapshot", "expire", path, "--keep", "1"]) == 0
    assert "removed 0" in capsys.readouterr().out  # both dirs referenced


def test_snapshot_sql_time_travel(spark, tmp_path, capsys):
    """`snapshot sql --version N --query ...` registers the pinned
    version as a temp view and runs plain SQL against it."""
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 10)], "k long, p long"), path, "p"
    )
    merge_snapshot(
        path,
        spark.createDataFrame([(2, 20)], "k long, p long"),
        "k",
        "p",
    )
    assert (
        main(
            [
                "snapshot",
                "sql",
                path,
                "--version",
                "1",
                "--query",
                "SELECT count(*) AS n FROM snapshot",
            ]
        )
        == 0
    )
    assert "1" in capsys.readouterr().out  # v1 has one row, v2 two
    assert (
        main(
            [
                "snapshot",
                "sql",
                path,
                "--query",
                "SELECT count(*) AS n FROM snapshot",
            ]
        )
        == 0
    )
    assert "2" in capsys.readouterr().out
    # missing --query is a usage error, not a crash
    assert main(["snapshot", "sql", path]) == 2


def test_snapshot_expire_keep_zero_is_usage_error(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 10)], "k long, p long"), path, "p"
    )
    assert main(["snapshot", "expire", path, "--keep", "0"]) == 2
    assert "keep" in capsys.readouterr().err


def test_snapshot_compact_zorder_flag(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_manifest,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    rows = [(i, i % 13, 0) for i in range(200)]
    write_snapshot(
        spark.createDataFrame(rows, "x long, y long, p long"), path, "p"
    )
    assert main(["snapshot", "compact", path, "--zorder", "x,y"]) == 0
    assert "compacted+zordered into v2" in capsys.readouterr().out
    assert read_manifest(path)["operation"] == "compact+zorder"
    assert read_snapshot(spark, path).count() == 200


def test_snapshot_info_cli(spark, tmp_path, capsys):
    import json

    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 0), (2, 1)], "k long, p long"),
        path,
        "p",
        stats_cols=["k"],
    )
    assert main(["snapshot", "info", path]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["version"] == 1 and info["n_partitions"] == 2
    assert info["stats_cols"] == ["k"]


def test_snapshot_changes_cli(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 0)], "k long, p long"), path, "p"
    )
    merge_snapshot(
        path, spark.createDataFrame([(2, 0)], "k long, p long"), "k", "p"
    )
    assert main(["snapshot", "changes", path, "--since", "1", "--key", "k"]) == 0
    out = capsys.readouterr().out
    assert "insert" in out and "2" in out
    # missing --key is a usage error, not a traceback
    assert main(["snapshot", "changes", path]) == 2


def test_snapshot_maintain_cli(spark, tmp_path, capsys):
    import json

    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(0, 0)], "k long, p long"), path, "p"
    )
    for i in range(1, 4):
        merge_snapshot(
            path,
            spark.createDataFrame([(i, i)], "k long, p long"),
            "k",
            "p",
        )
    assert main(
        ["snapshot", "maintain", path, "--max-commits", "2",
         "--keep", "1", "--min-age-sec", "0"]
    ) == 0
    r = json.loads(capsys.readouterr().out)
    assert r["compacted"] == 5 and len(r["expired"]) > 0


def test_export_shards_cli(tmp_path, capsys):
    import json

    out = str(tmp_path / "shards")
    assert main(
        ["export-shards", "documents", out, "--order-col", "doc_id",
         "--num-shards", "4", "--sf-dir", "/root/testdata/sf0.001"]
    ) == 0
    man = json.loads(capsys.readouterr().out)
    assert man["num_shards"] == 4 and man["total_rows"] > 0
    import os

    assert os.path.isfile(f"{out}/_shards.json")
    assert main(
        ["export-shards", "nope", out, "--order-col", "x"]
    ) == 2


def test_snapshot_delete_cli(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(
            [(1, 0), (2, 0), (3, 1)], "k long, p long"
        ),
        path,
        "p",
    )
    assert main(["snapshot", "delete", path, "--where", "k = 2"]) == 0
    out = capsys.readouterr().out
    assert '"deleted_rows": 1' in out
    assert {r.k for r in read_snapshot(spark, path).collect()} == {1, 3}
    # missing --where is a usage error, not a traceback
    assert main(["snapshot", "delete", path]) == 2


def test_snapshot_tag_cli(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        resolve_tag,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 0)], "k long, p long"), path, "p"
    )
    assert main(["snapshot", "tag", path, "--tag", "rel-1"]) == 0
    assert "rel-1" in capsys.readouterr().out
    assert resolve_tag(path, "rel-1") == 1
    assert main(["snapshot", "tag", path]) == 2


def test_snapshot_evolve_cli(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 2, 0)], "k long, amt long, p long"), path, "p"
    )
    assert main(["snapshot", "evolve", path, "--rename", "amt=amount"]) == 0
    assert "amount" in read_snapshot(spark, path).columns
    assert main(["snapshot", "evolve", path]) == 2  # nothing to do


def test_matview_cli(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    src = str(tmp_path / "s")
    view = str(tmp_path / "v")
    write_snapshot(
        spark.createDataFrame([(1, "a", 10, 0)], "k long, grp string, v long, p long"),
        src,
        "p",
    )
    assert main(
        ["matview", src, view, "--key", "k", "--group-col", "grp", "--sum-col", "v"]
    ) == 0
    out = capsys.readouterr().out
    assert '"applied": true' in out
    assert {(r.grp, r.n_rows, r.total) for r in read_snapshot(spark, view).collect()} == {
        ("a", 1, 10)
    }


def test_snapshot_merge_statement(spark, tmp_path, capsys):
    """`snapshot merge --query "MERGE INTO ..."` routes the statement
    through the SQL front-end to the partition-scoped snapshot merge."""
    from pandas_analysis_with_postgres_spark.__main__ import main
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, 10, 0)], "k long, v long, p long"), path, "p"
    )
    rc = main(
        [
            "snapshot",
            "merge",
            path,
            "--as",
            "tbl",
            "--query",
            "MERGE INTO tbl AS t USING (SELECT 1 AS k, 5 AS d) AS s "
            "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = t.v + s.d",
        ]
    )
    assert rc == 0
    assert "committed version 2" in capsys.readouterr().out
    assert [tuple(r) for r in read_snapshot(spark, path).collect()] == [(1, 15, 0)]


def test_snapshot_stats_and_metadata_sql_routing(spark, tmp_path, capsys):
    """`snapshot stats` prints manifest_aggregate JSON without a
    SparkSession; `snapshot sql` answers the strict COUNT/MIN/MAX
    grammar from the manifest (proven: data files deleted) and still
    falls back to a real scan for anything else."""
    import json
    from pathlib import Path

    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(
            [(1, 5.0, 10), (2, 9.5, 20)], "k long, amt double, p long"
        ),
        path,
        "p",
        stats_cols=["amt"],
    )
    assert main(["snapshot", "stats", path, "--columns", "amt"]) == 0
    agg = json.loads(capsys.readouterr().out)
    assert agg["n_rows"] == 2 and agg["columns"]["amt"]["max"] == 9.5

    # WHERE is not metadata-answerable: must fall back to the scan
    # (data still present) and produce the filtered count
    assert (
        main(
            [
                "snapshot", "sql", path,
                "--query", "SELECT count(*) AS n FROM snapshot WHERE k = 1",
            ]
        )
        == 0
    )
    assert "1" in capsys.readouterr().out

    # now remove every data file: the strict grammar must still answer
    for f in Path(path).rglob("*.parquet"):
        f.unlink()
    assert (
        main(
            [
                "snapshot", "sql", path,
                "--query",
                "SELECT count(*) AS n, MAX(amt) AS hi FROM snapshot",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "2" in out and "9.5" in out


def test_snapshot_restore_and_staged_actions(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        stage_commit,
        write_snapshot,
    )

    path = str(tmp_path / "wap_tbl")
    write_snapshot(
        spark.createDataFrame([(1, 0), (2, 1)], "k long, p long"), path, "p"
    )
    stage_commit(
        spark.createDataFrame([(9, 0)], "k long, p long"), path, "p", name="s1"
    )
    assert main(["snapshot", "staged", path]) == 0
    assert '"s1": 1' in capsys.readouterr().out
    assert main(["snapshot", "staged", path, "--publish", "s1"]) == 0
    assert "published version 2" in capsys.readouterr().out
    assert {r.k for r in read_snapshot(spark, path).collect()} == {9}
    assert main(["snapshot", "restore", path, "--version", "1"]) == 0
    assert "restored as version 3" in capsys.readouterr().out
    assert {r.k for r in read_snapshot(spark, path).collect()} == {1, 2}
    # discard path + usage error
    stage_commit(
        spark.createDataFrame([(5, 0)], "k long, p long"), path, "p", name="s2"
    )
    assert main(["snapshot", "staged", path, "--discard", "s2"]) == 0
    assert main(["snapshot", "restore", path]) == 2


def test_snapshot_sql_dml_statement_routing(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "dml_tbl")
    write_snapshot(
        spark.createDataFrame([(1, 5, 0), (2, 6, 1)], "k long, v long, p long"),
        path,
        "p",
    )
    assert main([
        "snapshot", "merge", path, "--as", "t",
        "--query", "UPDATE t SET v = v + 10 WHERE k = 1",
    ]) == 0
    assert "committed version 2" in capsys.readouterr().out
    assert main([
        "snapshot", "merge", path, "--as", "t",
        "--query", "DELETE FROM t WHERE k = 2",
    ]) == 0
    assert "deleted_rows=1" in capsys.readouterr().out
    assert {(r.k, r.v) for r in read_snapshot(spark, path).collect()} == {
        (1, 15),
    }


def test_snapshot_branch_actions(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "br_tbl")
    write_snapshot(
        spark.createDataFrame([(1, 0), (2, 1)], "k long, p long"), path, "p"
    )
    assert main(["snapshot", "branch", path, "--create", "exp"]) == 0
    assert "branched 'exp' at version 1" in capsys.readouterr().out
    merge_snapshot(
        path,
        spark.createDataFrame([(9, 0)], "k long, p long"),
        "k",
        "p",
        branch="exp",
    )
    assert main(["snapshot", "branch", path]) == 0
    out = capsys.readouterr().out
    assert '"fork_base": 1' in out and '"head": 2' in out
    assert main(["snapshot", "branch", path, "--ff", "exp"]) == 0
    assert "fast-forwarded to version 2" in capsys.readouterr().out
    assert {r.k for r in read_snapshot(spark, path).collect()} == {1, 2, 9}
    assert main(["snapshot", "branch", path, "--drop", "exp"]) == 0


def test_snapshot_alter_action(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_manifest,
        write_snapshot,
    )

    path = str(tmp_path / "alter_tbl")
    write_snapshot(
        spark.createDataFrame([(1, 0, 5.0), (2, 1, 6.0)], "k long, p long, v double"),
        path,
        "p",
    )
    assert main([
        "snapshot", "alter", path, "--columns", "v", "--check", "v > 0",
    ]) == 0
    assert "altered properties as version 2" in capsys.readouterr().out
    meta = read_manifest(path)["schema"]
    assert meta["stats_cols"] == ["v"] and meta["constraints"] == ["v > 0"]
    # clear the constraint
    assert main(["snapshot", "alter", path, "--check", "none"]) == 0
    assert "constraints" not in read_manifest(path)["schema"]


def test_snapshot_clone_action(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    src = str(tmp_path / "clone_src")
    write_snapshot(
        spark.createDataFrame([(1, 0), (2, 1)], "k long, p long"), src, "p"
    )
    dst = str(tmp_path / "clone_dst")
    assert main(["snapshot", "clone", src, "--to", dst]) == 0
    assert "cloned" in capsys.readouterr().out
    assert {r.k for r in read_snapshot(spark, dst).collect()} == {1, 2}
    assert main(["snapshot", "clone", src]) == 2  # missing --to


def test_snapshot_inspect_metadata_tables(spark, tmp_path, capsys):
    from pandas_analysis_with_postgres_spark.__main__ import main as cli
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, 0), (2, 1)], "k long, p long"), path, "p"
    )
    assert cli(["snapshot", "inspect", path]) == 0
    out = capsys.readouterr().out
    assert "p=0" in out and "n_rows" in out
    assert cli(["snapshot", "inspect", path, "--kind", "history"]) == 0
    assert "overwrite" in capsys.readouterr().out
    assert cli(["snapshot", "inspect", path, "--kind", "files"]) == 0
    assert ".parquet" in capsys.readouterr().out


def test_cli_sql_serves_round9_grammar_from_metadata(spark, tmp_path, capsys):
    """The round-9 grammar — SELECT DISTINCT pcol, COUNT(DISTINCT
    pcol), GROUP BY + HAVING, and the IN+range hybrid — all serve
    through the CLI's `snapshot sql` front-end with every data file
    deleted (pure-metadata forms) or present (hybrid boundary)."""
    from pathlib import Path

    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        write_snapshot,
    )

    path = str(tmp_path / "t9")
    rows = [(i, f"s{i % 3}", i * 2) for i in range(90)]
    write_snapshot(
        spark.createDataFrame(rows, "k long, st string, v long"),
        path,
        "st",
        stats_cols=["k", "v", "v::sum"],
    )
    # hybrid IN+range needs the boundary files — run it first
    assert main([
        "snapshot", "sql", path,
        "--query",
        "SELECT COUNT(*) AS n, SUM(v) AS sv FROM snapshot"
        " WHERE st IN ('s0', 's2') AND k BETWEEN 10 AND 80",
    ]) == 0
    out = capsys.readouterr().out
    assert "47" in out and "4254" in out  # 23+24 member rows in [10, 80]
    # pure-metadata forms answer with zero data pages
    for f in Path(path).rglob("*.parquet"):
        f.unlink()
    assert main([
        "snapshot", "sql", path,
        "--query", "SELECT DISTINCT st FROM snapshot",
    ]) == 0
    out = capsys.readouterr().out
    assert "s0" in out and "s1" in out and "s2" in out
    assert main([
        "snapshot", "sql", path,
        "--query", "SELECT COUNT(DISTINCT st) AS nd FROM snapshot",
    ]) == 0
    assert "3" in capsys.readouterr().out
    assert main([
        "snapshot", "sql", path,
        "--query",
        "SELECT st, COUNT(*) AS n FROM snapshot GROUP BY st"
        " HAVING n >= 30 ORDER BY n DESC LIMIT 2",
    ]) == 0
    out = capsys.readouterr().out
    assert "s0" in out and "30" in out


def test_snapshot_deep_clone_action(spark, tmp_path, capsys):
    import shutil

    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    src = str(tmp_path / "dc_src")
    write_snapshot(
        spark.createDataFrame([(1, 0), (2, 1)], "k long, p long"), src, "p"
    )
    dst = str(tmp_path / "dc_dst")
    assert main(["snapshot", "deep-clone", src, "--to", dst]) == 0
    assert "deep-cloned" in capsys.readouterr().out
    shutil.rmtree(src)  # no shared fate: the clone must not notice
    assert {r.k for r in read_snapshot(spark, dst).collect()} == {1, 2}
    assert main(["snapshot", "deep-clone", dst]) == 2  # missing --to
