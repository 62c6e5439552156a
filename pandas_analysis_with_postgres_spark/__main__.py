"""Command-line front door: list, run, explain, and SQL over the
declared query surface.

    python -m pandas_analysis_with_postgres_spark list
    python -m pandas_analysis_with_postgres_spark run q01_pricing_summary
    python -m pandas_analysis_with_postgres_spark explain q24_minhash_dedup
    python -m pandas_analysis_with_postgres_spark sql "SELECT COUNT(*) FROM lineitem"

``--sf-dir`` defaults to ``$SPARK_GRAFT_SF_DIR`` (see sources.parquet).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pandas_analysis_with_postgres_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="declared queries and oracle status")

    p_run = sub.add_parser("run", help="run a declared query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default=None)
    p_run.add_argument("--limit", type=int, default=20)

    p_ex = sub.add_parser("explain", help="formatted physical plan")
    p_ex.add_argument("query")
    p_ex.add_argument("--sf-dir", default=None)

    p_sql = sub.add_parser("sql", help="ANSI SQL over the fixture tables")
    p_sql.add_argument("statement")
    p_sql.add_argument("--sf-dir", default=None)
    p_sql.add_argument("--limit", type=int, default=20)

    p_sh = sub.add_parser(
        "export-shards",
        help="write a fixture table as N equal ordered training shards",
    )
    p_sh.add_argument("table")
    p_sh.add_argument("out")
    p_sh.add_argument("--order-col", required=True)
    p_sh.add_argument("--num-shards", type=int, default=8)
    p_sh.add_argument(
        "--format",
        dest="file_format",
        choices=["parquet", "json"],
        default="parquet",
        help="shard file format (json = JSONL for trainer loaders)",
    )
    p_sh.add_argument("--sf-dir", default=None)

    p_mv = sub.add_parser(
        "matview",
        help="one incremental maintenance cycle of a SUM/COUNT view "
        "over a snapshot table's change feed",
    )
    p_mv.add_argument("source")
    p_mv.add_argument("view")
    p_mv.add_argument("--key", required=True)
    p_mv.add_argument("--group-col", required=True)
    p_mv.add_argument("--sum-col", required=True)

    p_sn = sub.add_parser("snapshot", help="inspect a snapshot table")
    p_sn.add_argument(
        "action",
        choices=[
            "history", "read", "expire", "compact", "sql", "info",
            "changes", "maintain", "delete", "tag", "evolve", "merge",
            "stats", "restore", "staged", "branch", "alter", "clone",
            "deep-clone", "inspect",
        ],
    )
    p_sn.add_argument("path")
    p_sn.add_argument(
        "--query",
        default=None,
        help="(sql) statement to run; the snapshot is visible as --as. "
        "COUNT(*)/MIN/MAX selects — optionally WHERE <partition_col> = "
        "<literal> — are answered from the manifest without a scan; so "
        "are 'SELECT <pcol>, COUNT(*) ... GROUP BY <pcol>' (the "
        "per-partition row-count map) and stats-proven range COUNTs "
        "('WHERE <statted_col> <op> <lit>' / BETWEEN) when every "
        "partition is provably fully inside or outside the range; a "
        "range COUNT the manifest cannot fully prove scans ONLY the "
        "boundary partitions (hybrid tier) before any full scan",
    )
    p_sn.add_argument(
        "--as",
        dest="view_name",
        default="snapshot",
        help="(sql) temp-view name for the snapshot table",
    )
    p_sn.add_argument(
        "--kind",
        choices=["partitions", "history", "files"],
        default="partitions",
        help="(inspect) which metadata table to show",
    )
    p_sn.add_argument("--version", type=int, default=None)
    p_sn.add_argument("--keep", type=int, default=2)
    p_sn.add_argument(
        "--min-age-sec",
        type=float,
        default=3600.0,
        help="GC only commit dirs older than this (0 = no writer active)",
    )
    p_sn.add_argument("--limit", type=int, default=20)
    p_sn.add_argument(
        "--zorder",
        default=None,
        help="(compact) comma-separated columns to re-cluster along "
        "the Morton curve while compacting (OPTIMIZE ZORDER)",
    )
    p_sn.add_argument(
        "--since",
        type=int,
        default=0,
        help="(changes) last version already consumed",
    )
    p_sn.add_argument(
        "--explain",
        action="store_true",
        help="(sql) print the tier decision and its partition/file "
        "I/O instead of the answer — zero data pages read",
    )
    p_sn.add_argument(
        "--max-commits",
        type=int,
        default=4,
        help="(maintain) compact when the live version references "
        "more commit dirs than this",
    )
    p_sn.add_argument(
        "--key",
        default=None,
        help="(changes) the table's merge key column",
    )
    p_sn.add_argument(
        "--tag",
        default=None,
        help="(tag) name to pin the version under (a retention root)",
    )
    p_sn.add_argument(
        "--rename",
        action="append",
        default=None,
        metavar="OLD=NEW",
        help="(evolve) metadata-only column rename; repeatable",
    )
    p_sn.add_argument(
        "--drop",
        action="append",
        default=None,
        metavar="COL",
        help="(evolve) metadata-only column drop; repeatable",
    )
    p_sn.add_argument(
        "--where",
        default=None,
        help="(delete) SQL predicate; matching rows are removed "
        "(rows where it is NULL are kept)",
    )
    p_sn.add_argument(
        "--columns",
        default=None,
        help="(stats) comma-separated columns for manifest min/max",
    )
    p_sn.add_argument(
        "--check",
        action="append",
        default=None,
        metavar="EXPR",
        help="(alter) CHECK constraint to add; repeatable; 'none' clears",
    )
    p_sn.add_argument(
        "--bloom",
        default=None,
        help="(alter) comma-separated bloom columns; 'none' clears",
    )
    p_sn.add_argument(
        "--to",
        default=None,
        help="(restore) tag name to roll back to (or use --version N)",
    )
    p_sn.add_argument(
        "--publish",
        default=None,
        help="(staged) promote this staged commit to the next version",
    )
    p_sn.add_argument(
        "--discard",
        default=None,
        help="(staged) discard this staged commit",
    )
    p_sn.add_argument(
        "--create",
        default=None,
        help="(branch) fork a branch at the current version",
    )
    p_sn.add_argument(
        "--ff",
        default=None,
        help="(branch) fast-forward main to this branch's head",
    )

    args = ap.parse_args(argv)

    if args.cmd == "matview":
        import json as _json

        from .session import get_spark as _gs
        from .sources.matview import maintain_sum_view

        r = maintain_sum_view(
            _gs("cli"),
            args.source,
            args.view,
            key=args.key,
            group_col=args.group_col,
            sum_col=args.sum_col,
        )
        print(_json.dumps(r))
        return 0

    if args.cmd == "snapshot":
        from .sources.snapshot import (
            current_version,
            expire_snapshots,
            read_manifest,
            read_snapshot,
        )

        if args.action == "history":
            for v in range(1, current_version(args.path) + 1):
                try:
                    m = read_manifest(args.path, v)
                except FileNotFoundError:
                    continue  # expired version
                print(
                    f"v{v}  op={m['operation']:9s} "
                    f"partitions={len(m['partitions'])} txn={m.get('txn') or {}}"
                )
            return 0
        if args.action == "inspect":
            # Iceberg-style metadata tables as DataFrames: partitions /
            # history / files (see sources.snapshot.read_metadata_table)
            from .session import get_spark as _gs
            from .sources.snapshot import read_metadata_table

            read_metadata_table(
                _gs("cli"), args.path, args.kind, version=args.version
            ).show(args.limit, truncate=False)
            return 0
        if args.action == "info":
            import json as _json

            from .sources.snapshot import table_info

            print(_json.dumps(table_info(args.path, args.version), indent=1))
            return 0
        if args.action == "expire":
            try:
                removed = expire_snapshots(
                    args.path, keep=args.keep, min_age_sec=args.min_age_sec
                )
            except ValueError as exc:  # e.g. --keep 0
                print(str(exc), file=sys.stderr)
                return 2
            print(f"removed {len(removed)} unreferenced commit dirs")
            return 0
        from .session import get_spark as _gs

        if args.action == "compact":
            from .sources.snapshot import compact_snapshot

            zorder = (
                [c.strip() for c in args.zorder.split(",") if c.strip()]
                if args.zorder
                else None
            )
            v = compact_snapshot(_gs("cli"), args.path, zorder_by=zorder)
            label = "compacted+zordered" if zorder else "compacted"
            print(f"{label} into v{v}")
            return 0
        if args.action == "maintain":
            import json as _json

            from .sources.snapshot import maintain_snapshot

            r = maintain_snapshot(
                _gs("cli"),
                args.path,
                max_commits=args.max_commits,
                keep_versions=args.keep,
                min_age_sec=args.min_age_sec,
            )
            print(_json.dumps(r))
            return 0
        if args.action == "evolve":
            from .sources.snapshot import evolve_snapshot_schema

            renames = {}
            for r in args.rename or []:
                if "=" not in r:
                    print(f"--rename needs OLD=NEW, got {r!r}", file=sys.stderr)
                    return 2
                old, new = r.split("=", 1)
                renames[old] = new
            if not renames and not args.drop:
                print("snapshot evolve needs --rename and/or --drop", file=sys.stderr)
                return 2
            v = evolve_snapshot_schema(
                args.path, renames=renames, drops=args.drop or []
            )
            print(f"evolved to v{v}: renames={renames} drops={args.drop or []}")
            return 0
        if args.action == "tag":
            from .sources.snapshot import list_tags, tag_snapshot

            if not args.tag:
                print("snapshot tag requires --tag", file=sys.stderr)
                return 2
            v = tag_snapshot(args.path, args.tag, args.version)
            print(f"tagged v{v} as {args.tag!r}; tags: {list_tags(args.path)}")
            return 0
        if args.action == "delete":
            import json as _json

            from .sources.snapshot import delete_where

            if not args.where:
                print("snapshot delete requires --where", file=sys.stderr)
                return 2
            r = delete_where(_gs("cli"), args.path, args.where)
            print(_json.dumps(r))
            return 0
        if args.action == "restore":
            # rollback by reference: --version N or --to <tag>
            from .sources.snapshot import restore_snapshot

            target = args.version if args.version is not None else args.to
            if target is None:
                print(
                    "snapshot restore requires --version or --to <tag>",
                    file=sys.stderr,
                )
                return 2
            v = restore_snapshot(args.path, target)
            print(f"restored as version {v}")
            return 0
        if args.action == "staged":
            # write-audit-publish control plane: list / publish / drop
            import json as _json

            from .sources.snapshot import (
                drop_staged,
                list_staged,
                publish_staged,
            )

            if args.publish:
                print(f"published version {publish_staged(args.path, args.publish)}")
            elif args.discard:
                drop_staged(args.path, args.discard)
                print(f"dropped staged {args.discard!r}")
            else:
                print(_json.dumps(list_staged(args.path)))
            return 0
        if args.action == "alter":
            # metadata-only property re-declaration (ALTER TABLE)
            from .sources.snapshot import _KEEP, alter_table_properties

            def _cols(raw):
                if raw is None:
                    return _KEEP
                return None if raw == "none" else raw.split(",")

            checks = _KEEP
            if args.check:
                checks = None if args.check == ["none"] else args.check
            v = alter_table_properties(
                _gs("cli"),
                args.path,
                stats_cols=_cols(args.columns),
                bloom_cols=_cols(args.bloom),
                constraints=checks,
            )
            print(f"altered properties as version {v}")
            return 0
        if args.action == "clone":
            # shallow clone: path = source, --to = destination
            from .sources.snapshot import clone_snapshot

            if not args.to:
                print("snapshot clone requires --to <dst>", file=sys.stderr)
                return 2
            clone_snapshot(args.path, args.to, version=args.version)
            print(f"cloned {args.path} -> {args.to}")
            return 0
        if args.action == "deep-clone":
            # backup/DR: byte-for-byte copy, no fate shared with the
            # source (see deep_clone_snapshot)
            from .sources.snapshot import deep_clone_snapshot

            if not args.to:
                print(
                    "snapshot deep-clone requires --to <dst>",
                    file=sys.stderr,
                )
                return 2
            deep_clone_snapshot(args.path, args.to, version=args.version)
            print(f"deep-cloned {args.path} -> {args.to}")
            return 0
        if args.action == "branch":
            # branch refs: list (default) / --create / --drop / --ff
            import json as _json

            from .sources.snapshot import (
                create_branch,
                drop_branch,
                fast_forward_branch,
                list_branches,
            )

            if args.create:
                v = create_branch(args.path, args.create, args.version)
                print(f"branched {args.create!r} at version {v}")
            elif args.drop:
                # --drop is evolve's repeatable flag; branch takes one
                drop_branch(args.path, args.drop[0])
                print(f"dropped branch {args.drop[0]!r}")
            elif args.ff:
                print(f"fast-forwarded to version {fast_forward_branch(args.path, args.ff)}")
            else:
                print(_json.dumps(list_branches(args.path)))
            return 0
        if args.action == "changes":
            from .sources.snapshot import read_changes

            if not args.key:
                print("snapshot changes requires --key", file=sys.stderr)
                return 2
            read_changes(
                _gs("cli"), args.path, since_version=args.since, key=args.key
            ).orderBy("version", "change_type").show(
                args.limit, truncate=False
            )
            return 0
        if args.action == "merge":
            # DML as a statement — INSERT INTO / MERGE INTO / UPDATE /
            # DELETE FROM, routed by statement head: the table is named
            # --as inside the statement; MERGE's USING may reference
            # any registered temp view or inline subquery.
            from .sources.sql_merge import execute_dml

            if not args.query:
                print("snapshot merge requires --query", file=sys.stderr)
                return 2
            out = execute_dml(
                _gs("cli"), args.query, tables={args.view_name: args.path}
            )
            if isinstance(out, dict):  # DELETE returns delete_where's dict
                print(
                    f"committed version {out['version']} "
                    f"(deleted_rows={out['deleted_rows']})"
                )
            else:
                print(f"committed version {out}")
            return 0
        if args.action == "sql":
            # time travel as SQL: pin --version, query the temp view
            from .sources.snapshot import register_snapshot_view

            if not args.query:
                print("snapshot sql requires --query", file=sys.stderr)
                return 2
            spark = _gs("cli")
            if args.explain:
                # EXPLAIN: the tier decision (metadata / hybrid /
                # scan) and its committed I/O, zero data pages read
                from .sources.metadata_sql import explain_metadata_sql

                explain_metadata_sql(
                    spark,
                    args.query,
                    {args.view_name: args.path},
                    version=args.version,
                ).show(truncate=False)
                return 0
            # metadata-answerable statements (strict COUNT/MIN/MAX
            # grammar) never touch data files — the warehouse
            # optimizer rule, applied transparently before the scan
            from .sources.metadata_sql import answer_from_manifest

            meta_ans = answer_from_manifest(
                spark,
                args.query,
                {args.view_name: args.path},
                version=args.version,
            )
            if meta_ans is not None:
                meta_ans.show(args.limit, truncate=False)
                return 0
            # middle tier: a range COUNT the manifest cannot fully
            # prove still needs only the BOUNDARY partitions scanned
            # (hybrid_range_count); anything else falls to the scan
            from .sources.metadata_sql import hybrid_range_count

            hybrid = hybrid_range_count(
                spark,
                args.query,
                {args.view_name: args.path},
                version=args.version,
            )
            if hybrid is not None:
                hybrid.show(args.limit, truncate=False)
                return 0
            # scan path: honor SQL time travel (FOR VERSION/TIMESTAMP
            # AS OF) by stripping the clause and pinning the view —
            # Spark's parser has no AS OF for temp views
            from .sources.metadata_sql import extract_as_of

            query, as_of = extract_as_of(args.query)
            pin = args.version
            if as_of is not None:
                if pin is not None:
                    print(
                        "both --version and FOR ... AS OF given — pick one",
                        file=sys.stderr,
                    )
                    return 2
                if "version" in as_of:
                    pin = as_of["version"]
                else:
                    from .sources.snapshot import resolve_as_of

                    pin = resolve_as_of(args.path, as_of["timestamp"])
            register_snapshot_view(
                spark, args.path, args.view_name, version=pin
            )
            spark.sql(query).show(args.limit, truncate=False)
            return 0
        if args.action == "stats":
            import json as _json

            from .sources.snapshot import manifest_aggregate

            cols = (
                [c.strip() for c in args.columns.split(",") if c.strip()]
                if args.columns
                else None
            )
            print(
                _json.dumps(
                    manifest_aggregate(
                        args.path, columns=cols, version=args.version
                    )
                )
            )
            return 0
        read_snapshot(_gs("cli"), args.path, args.version).show(
            args.limit, truncate=False
        )
        return 0

    from .plans import ORACLES, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            tag = "oracle" if name in ORACLES else "rows-only"
            print(f"{name:40s} {tag}")
        return 0

    from .session import get_spark
    from .sources.parquet import DEFAULT_SF_DIR, register_views

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    spark = get_spark("cli")

    if args.cmd == "sql":
        register_views(spark, sf_dir)
        spark.sql(args.statement).show(args.limit, truncate=False)
        return 0

    if args.cmd == "export-shards":
        import json as _json

        from .operators.sharding import write_shards
        from .sources.parquet import TABLES, load_table

        if args.table not in TABLES:
            print(f"unknown table {args.table!r}", file=sys.stderr)
            return 2
        man = write_shards(
            load_table(spark, sf_dir, args.table),
            args.out,
            args.order_col,
            args.num_shards,
            file_format=args.file_format,
        )
        print(_json.dumps(man, indent=1, sort_keys=True))
        return 0

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r} — see `list`", file=sys.stderr)
        return 2
    df = QUERIES[args.query](spark, sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
