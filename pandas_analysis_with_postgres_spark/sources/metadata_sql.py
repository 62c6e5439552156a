"""Metadata-answered SQL: route ``SELECT COUNT(*)/MIN/MAX FROM t`` on
snapshot tables to :func:`sources.snapshot.manifest_aggregate` — the
optimizer rule warehouses apply before ever scheduling a scan (Spark
itself does this only for COUNT(*) over some V2 sources; Iceberg/Delta
answer from manifest numRecords). At 100 TB the difference is a driver
JSON read vs a cluster-wide scan for a poll a dashboard issues every
minute.

The grammar is deliberately STRICT: a single ``SELECT`` of
``COUNT(*)``/``MIN(col)``/``MAX(col)`` items (each optionally
aliased) from ONE bare snapshot table, optionally ``WHERE <col> =
<literal>`` — answered ONLY when ``<col>`` is the table's partition
column, because partition equality is the one predicate the manifest
proves exactly (it IS the partition index; ``COUNT(*) WHERE day = X``
is the second-most-polled metadata query after bare COUNT). Anything
else — GROUP BY, JOIN, expressions, non-partition or non-equality
WHERE — returns ``None`` and the caller falls back to a real scan: a
metadata answerer must refuse what it cannot prove, never approximate
it. (COUNT(col) is NOT COUNT(*) — null-skipping needs null counts the
manifest does not record.)

Result types come from the table's recorded ``spark_schema``, so a
metadata answer is schema-identical to the scan it replaced — MIN of a
date column is a DATE, not the manifest's ISO string.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

from .snapshot import manifest_aggregate, read_manifest

_STMT = re.compile(
    r"^\s*SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<table>[A-Za-z_]\w*)"
    r"(?:\s+WHERE\s+(?P<wcol>[A-Za-z_]\w*)\s*=\s*"
    r"(?P<wval>'[^']*'|-?\d+|true|false))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ITEM = re.compile(
    r"^\s*(?:COUNT\s*\(\s*\*\s*\)|(?P<fn>MIN|MAX)\s*\(\s*(?P<col>[A-Za-z_]\w*)\s*\))"
    r"(?:\s+AS\s+(?P<alias>[A-Za-z_]\w*))?\s*$",
    re.IGNORECASE,
)


def parse_metadata_select(sql: str) -> "dict | None":
    """Parse ``sql`` against the strict metadata-answerable grammar.
    Returns ``{"table", "items": [(kind, col, alias)]}`` — kind is
    ``count``/``min``/``max``, col is None for count — or ``None`` if
    the statement is not provably metadata-answerable."""
    m = _STMT.match(sql)
    if not m:
        return None
    items = []
    for raw in m.group("items").split(","):
        im = _ITEM.match(raw)
        if not im:
            return None
        fn = (im.group("fn") or "count").lower()
        col = im.group("col")
        default = "count_star" if fn == "count" else f"{fn}_{col}"
        items.append((fn, col, im.group("alias") or default))
    aliases = [a for _, _, a in items]
    if len(set(aliases)) != len(aliases):
        return None  # ambiguous output names — let a real engine error
    where = (
        (m.group("wcol"), m.group("wval")) if m.group("wcol") else None
    )
    return {"table": m.group("table"), "items": items, "where": where}


def answer_from_manifest(
    spark: SparkSession,
    sql: str,
    tables: dict[str, str],
    *,
    version: "int | str | None" = None,
) -> "DataFrame | None":
    """Answer ``sql`` from manifest metadata if its shape allows it and
    its table is in ``tables`` ({name: snapshot path}); else ``None``
    (caller falls back to a real scan). The returned one-row frame has
    the aliases and the SCAN-identical column types (from the table's
    recorded spark_schema)."""
    parsed = parse_metadata_select(sql)
    if parsed is None or parsed["table"] not in tables:
        return None
    path = tables[parsed["table"]]
    schema_meta = read_manifest(path, version).get("schema") or {}
    where = None
    if parsed["where"] is not None:
        wcol, raw = parsed["where"]
        if wcol != schema_meta.get("partition_col"):
            return None  # only partition equality is manifest-provable
        ptype = schema_meta.get("partition_type") or "string"
        if raw.startswith("'"):
            if ptype in ("tinyint", "smallint", "int", "bigint", "boolean"):
                return None  # quoted literal vs non-string partition
            wval: object = raw[1:-1]
        elif raw.lower() in ("true", "false"):
            if ptype != "boolean":
                return None
            wval = raw.lower() == "true"
        else:
            if ptype not in ("tinyint", "smallint", "int", "bigint"):
                return None  # bare integer vs string/date partition
            wval = int(raw)
        where = (wcol, wval)
    cols = sorted({c for _, c, _ in parsed["items"] if c})
    agg = manifest_aggregate(
        path, columns=cols, version=version, where_partition=where
    )

    from pyspark.sql.types import LongType, StructField, StructType

    sj = schema_meta.get("spark_schema")
    field_types = (
        {f.name: f.dataType for f in StructType.fromJson(json.loads(sj)).fields}
        if sj
        else {}
    )
    values, fields = [], []
    for fn, col, alias in parsed["items"]:
        if fn == "count":
            values.append(agg["n_rows"])
            fields.append(StructField(alias, LongType(), False))
        else:
            v = agg["columns"][col][fn]
            dt = field_types.get(col)
            if dt is None:
                return None  # evolved-away or unknown column: real scan
            # manifest values are _stat_json renderings; route through
            # a string cast so dates/timestamps land as their real type
            values.append(None if v is None else str(v))
            from pyspark.sql.types import StringType

            fields.append(StructField(alias, StringType(), True))
    row = spark.createDataFrame([tuple(values)], StructType(fields))
    from pyspark.sql import functions as F

    exprs = []
    for fn, col, alias in parsed["items"]:
        if fn == "count":
            exprs.append(F.col(alias))
        else:
            exprs.append(F.col(alias).cast(field_types[col]).alias(alias))
    return row.select(*exprs)
