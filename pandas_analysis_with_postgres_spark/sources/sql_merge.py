"""``MERGE INTO`` statement front-end over snapshot tables.

The reference drives its warehouse maintenance through SQL statements
(``dmCustomerProc.py:185-232``, SQL-11…16: UPDATE-from + INSERT-if-
absent + SCD2 close-out/open). The repo covers that intent as APIs
(``operators.upsert``, ``operators.scd2``, ``sources.snapshot.
merge_snapshot``) — this module exposes it the way a warehouse user
actually writes it: one ANSI ``MERGE INTO`` statement, parsed here and
routed to the snapshot layer's partition-scoped MERGE.

Why a front-end parser at all: open-source Spark's ``MERGE INTO`` SQL
only executes against catalogs implementing row-level operations
(Delta/Iceberg); against plain parquet it is an analysis error. The
snapshot layer already implements the hard part (txn-idempotent
partition-scoped rewrite with cold partitions carried by reference) —
what is missing is only the statement surface, so the parser below
translates the statement into DataFrame expressions and delegates.

Supported grammar (ANSI core, the subset every SQL-11…16-style
pipeline uses; anything else raises with the offending clause named):

    MERGE INTO <table> [AS] t
    USING (<subquery>) [AS] s        -- or a registered view name
    ON t.<key> = s.<key>             -- single equi-key (merge key)
    WHEN MATCHED [AND <guard>] THEN UPDATE SET col = expr [, ...]
    WHEN NOT MATCHED [AND <guard>] THEN INSERT (cols) VALUES (exprs)

Either WHEN clause may be omitted (update-only / insert-only merges).
``WHEN MATCHED THEN DELETE`` is intentionally NOT routed through this
path: the snapshot layer's row-level delete (``delete_where``) is a
different physical operation (anti-rewrite + CDF delete rows) and a
guarded API call, not a silent merge side-effect — callers get a
pointed error. All value expressions are Spark SQL (evaluated via
``F.expr`` over the aliased join), never Python.

Scale shape: the matched set is ``target ⋈ source`` on the merge key —
one join whose small side is the source batch (AQE broadcasts it when
it fits), NOT a driver-side loop; the insert set is the complementary
anti-join. The rewrite itself is ``merge_snapshot``'s contract: only
partitions touched by the upsert frame are rewritten, cold partitions
carry by reference, and the commit is optimistic (ConcurrentCommitError
on a lost race). At 100 TB a MERGE costs O(source) + O(touched
partitions), independent of table size.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MERGE_RE = re.compile(
    r"""^\s*
    MERGE\s+INTO\s+(?P<target>[\w./-]+)\s+(?:AS\s+)?(?P<t>\w+)\s+
    USING\s+(?:\((?P<subq>.+?)\)|(?P<view>\w+))\s+(?:AS\s+)?(?P<s>\w+)\s+
    ON\s+(?P<on>.+?)
    (?P<whens>\s+WHEN\s+.+)$
    """,
    re.IGNORECASE | re.DOTALL | re.VERBOSE,
)

_WHEN_RE = re.compile(
    r"""WHEN\s+(?P<not>NOT\s+)?MATCHED(?:\s+AND\s+(?P<guard>.+?))?\s+THEN\s+
    (?P<action>UPDATE\s+SET\s+.+?|INSERT\s*\(.+?\)\s*VALUES\s*\(.+?\)|DELETE)
    \s*(?=WHEN\s+(?:NOT\s+)?MATCHED|$)""",
    re.IGNORECASE | re.DOTALL | re.VERBOSE,
)


def _split_top(text: str) -> list[str]:
    """Split on commas at paren depth 0 (SET lists / VALUES lists may
    contain function calls)."""
    out, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _parse_on(on: str, t_alias: str, s_alias: str) -> tuple[str, str]:
    """The merge key: ``t.k = s.k`` (either order). A single equi-key
    is the contract the partition-scoped rewrite keys on; richer ON
    conditions belong in the USING subquery."""
    m = re.match(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", on)
    if not m:
        raise ValueError(
            f"MERGE ON must be a single equi-condition alias.col = alias.col "
            f"(got {on!r}); pre-join richer conditions in the USING subquery"
        )
    a1, c1, a2, c2 = m.groups()
    if {a1, a2} != {t_alias, s_alias}:
        raise ValueError(f"ON aliases {a1!r}/{a2!r} must be {t_alias!r} and {s_alias!r}")
    return (c1, c2) if a1 == t_alias else (c2, c1)


def parse_merge(sql: str) -> dict:
    """Parse a MERGE statement into its clauses (no execution)."""
    m = _MERGE_RE.match(sql.strip().rstrip(";"))
    if not m:
        raise ValueError("not a parseable MERGE INTO statement (see module grammar)")
    d = m.groupdict()
    out = {
        "target": d["target"],
        "t_alias": d["t"],
        "s_alias": d["s"],
        "source_subquery": d["subq"],
        "source_view": d["view"],
        "on": d["on"].strip(),
        "update_set": None,
        "update_guard": None,
        "insert_cols": None,
        "insert_vals": None,
        "insert_guard": None,
    }
    whens = d["whens"]
    matched_spans = list(_WHEN_RE.finditer(whens))
    if not matched_spans or "".join(
        whens[m0.start(): m0.end()] for m0 in matched_spans
    ).strip() != whens.strip():
        raise ValueError(f"unparseable WHEN clauses: {whens.strip()!r}")
    for w in matched_spans:
        action = w.group("action").strip()
        is_not = bool(w.group("not"))
        guard = (w.group("guard") or "").strip() or None
        if action.upper() == "DELETE":
            raise ValueError(
                "WHEN MATCHED THEN DELETE is not routed through MERGE: "
                "row-level delete is a separate guarded operation — use "
                "sources.snapshot.delete_where (anti-rewrite + CDF deletes)"
            )
        if action.upper().startswith("UPDATE"):
            if is_not:
                raise ValueError("WHEN NOT MATCHED cannot UPDATE")
            if out["update_set"] is not None:
                raise ValueError("multiple WHEN MATCHED UPDATE clauses")
            out["update_guard"] = guard
            out["update_set"] = {}
            for item in _split_top(action[action.upper().index("SET") + 3:]):
                lhs, rhs = item.split("=", 1)
                col = lhs.strip().split(".")[-1]
                out["update_set"][col] = rhs.strip()
        else:
            if not is_not:
                raise ValueError("WHEN MATCHED cannot INSERT")
            if out["insert_cols"] is not None:
                raise ValueError("multiple WHEN NOT MATCHED INSERT clauses")
            mi = re.match(
                r"INSERT\s*\((?P<cols>.+?)\)\s*VALUES\s*\((?P<vals>.+)\)\s*$",
                action,
                re.IGNORECASE | re.DOTALL,
            )
            if not mi:
                raise ValueError(f"unparseable INSERT action: {action!r}")
            out["insert_guard"] = guard
            out["insert_cols"] = [c.strip().split(".")[-1] for c in _split_top(mi.group("cols"))]
            out["insert_vals"] = _split_top(mi.group("vals"))
            if len(out["insert_cols"]) != len(out["insert_vals"]):
                raise ValueError("INSERT column/value count mismatch")
    if out["update_set"] is None and out["insert_cols"] is None:
        raise ValueError("MERGE needs at least one WHEN clause")
    return out


def execute_merge(
    spark: SparkSession,
    sql: str,
    *,
    tables: dict[str, str],
    txn: tuple[str, int] | None = None,
) -> int:
    """Execute one MERGE INTO statement against a snapshot table.

    ``tables`` maps statement table names to snapshot paths (the
    session catalog for snapshot tables — temp views stay Spark's).
    The USING side resolves as a subquery or a registered temp view.
    Returns the new snapshot version. Concurrency/idempotence are
    ``merge_snapshot``'s: optimistic commit, optional ``txn`` marker.
    """
    from .snapshot import merge_snapshot, read_manifest, read_snapshot

    p = parse_merge(sql)
    if p["target"] not in tables:
        raise ValueError(f"unknown MERGE target {p['target']!r}; known: {sorted(tables)}")
    path = tables[p["target"]]
    meta = read_manifest(path)
    schema_meta = meta.get("schema") or {}
    if not schema_meta:
        raise ValueError(
            f"MERGE target {p['target']!r} has no committed snapshot yet — "
            f"bootstrap it with write_snapshot (MERGE needs the table's "
            f"recorded partition column and schema)"
        )
    pcol = schema_meta["partition_col"]
    t_cols = list(schema_meta["columns"])
    t_alias, s_alias = p["t_alias"], p["s_alias"]
    t_key, s_key = _parse_on(p["on"], t_alias, s_alias)

    if p["source_subquery"]:
        src = spark.sql(p["source_subquery"])
    else:
        src = spark.table(p["source_view"])
    tt = read_snapshot(spark, path, meta["version"] or None).alias(t_alias)
    ss = src.alias(s_alias)
    on = F.col(f"{t_alias}.{t_key}") == F.col(f"{s_alias}.{s_key}")

    parts = []
    if p["update_set"] is not None:
        bad = set(p["update_set"]) - set(t_cols)
        if bad:
            raise ValueError(f"UPDATE SET of unknown columns: {sorted(bad)}")
        if t_key in p["update_set"] or pcol in p["update_set"]:
            raise ValueError(
                f"UPDATE SET may not reassign the merge key ({t_key!r}) or "
                f"partition column ({pcol!r}): a key's partition value is "
                f"part of its identity (merge_snapshot contract)"
            )
        matched = tt.join(ss, on, "inner")
        if p["update_guard"]:
            matched = matched.filter(F.expr(p["update_guard"]))
        parts.append(
            matched.select(
                *[
                    F.expr(p["update_set"].get(c, f"{t_alias}.{c}")).alias(c)
                    for c in t_cols
                ]
            )
        )
    if p["insert_cols"] is not None:
        if set(p["insert_cols"]) != set(t_cols):
            raise ValueError(
                f"INSERT must supply every target column (incl. the partition "
                f"column {pcol!r}): expected {sorted(t_cols)}, got "
                f"{sorted(p['insert_cols'])}"
            )
        unmatched = ss.join(tt, on, "left_anti")
        if p["insert_guard"]:
            unmatched = unmatched.filter(F.expr(p["insert_guard"]))
        vals = dict(zip(p["insert_cols"], p["insert_vals"]))
        parts.append(unmatched.select(*[F.expr(vals[c]).alias(c) for c in t_cols]))

    upsert = parts[0]
    for extra in parts[1:]:
        upsert = upsert.unionByName(extra)
    return merge_snapshot(
        path,
        upsert,
        t_key,
        pcol,
        expected_version=meta["version"],
        txn=txn,
    )
