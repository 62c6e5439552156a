"""CSV / JSON-lines sources and sinks (landing-zone interchange).

The reference's only source is Postgres (SURVEY §2.1); real
deployments also land CSV/JSONL drops. Contract here:

- **Schema is mandatory.** Inference costs a full extra scan of the
  data and silently drifts types between drops — at 100 TB both are
  unacceptable. Callers pass the DDL string; the helpers never infer.
- **Malformed rows are captured, not fatal**: PERMISSIVE mode with a
  ``_corrupt_record`` column, so one bad line in a 100 TB drop
  quarantines instead of failing the job (pair with
  ``functions.dq.split_valid`` downstream).
- Text formats are row-oriented: no column pruning or predicate
  pushdown reaches the file (unlike parquet — pinned in
  tests/test_plans.py for the parquet path). They are ingestion
  formats; convert to parquet (``sources.parquet.write_table``) at
  the landing boundary, never query them repeatedly.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

#: Name of the quarantine column PERMISSIVE parsing fills for rows
#: that do not match the declared schema.
CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    header: bool = True,
    capture_corrupt: bool = False,
    **options: str,
) -> DataFrame:
    """Schema-enforced CSV read. With ``capture_corrupt`` the declared
    schema is extended with a ``_corrupt_record`` string column that
    holds the raw line for any row failing the schema."""
    if capture_corrupt:
        schema = f"{schema}, {CORRUPT_COL} string"
        options = {"columnNameOfCorruptRecord": CORRUPT_COL, **options}
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode="PERMISSIVE", **options)
        .csv(path)
    )


def write_csv(
    df: DataFrame, path: str, *, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.options(header=str(header).lower()).mode(mode).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    capture_corrupt: bool = False,
    **options: str,
) -> DataFrame:
    """Schema-enforced JSON-lines read (one object per line — the
    splittable layout; multiline JSON arrays are not splittable and do
    not scale)."""
    if capture_corrupt:
        schema = f"{schema}, {CORRUPT_COL} string"
        options = {"columnNameOfCorruptRecord": CORRUPT_COL, **options}
    return (
        spark.read.schema(schema)
        .options(mode="PERMISSIVE", **options)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def quarantine_split(
    df: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(valid_rows, corrupt_rows, cached_parse) from a
    ``capture_corrupt`` read.

    Spark refuses plans that reference only the corrupt-record column
    ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN] — the
    parser would otherwise have nothing else to parse), so the split
    caches the parsed batch once and filters both ways from it — also
    what you want operationally: parse the drop once, route twice.

    The third element is the cached parse both branches share: call
    ``cached_parse.unpersist()`` once both branches are consumed.
    Without that handle, repeated landing-drop processing in one
    session would accrete cached batches until the executor store
    evicts them. `quarantined` is the unpersist-for-you context form.
    """
    from pyspark.sql import functions as F

    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad, df


@contextmanager
def quarantined(df: DataFrame):
    """Context-manager form of :func:`quarantine_split`: yields
    (valid_rows, corrupt_rows) and unpersists the shared cached parse
    when the block exits — the leak-proof shape for per-batch landing
    processing in a long-lived session."""
    good, bad, cached = quarantine_split(df)
    try:
        yield good, bad
    finally:
        cached.unpersist()


def read_xml(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    row_tag: str = "doc",
    **options: str,
) -> DataFrame:
    """Schema-enforced XML read (Spark 4 native reader — the
    Wikipedia-dump / feed ingestion format). ``ignoreSurroundingSpaces``
    is forced off: the default TRIMS element text, silently corrupting
    whitespace-significant document bodies (measured; empty element ↔
    '' and absent element ↔ NULL round-trip losslessly with it off)."""
    return (
        spark.read.format("xml")
        .options(rowTag=row_tag, ignoreSurroundingSpaces="false", **options)
        .schema(schema)
        .load(path)
    )


def write_xml(
    df: DataFrame,
    path: str,
    *,
    row_tag: str = "doc",
    root_tag: str = "docs",
    mode: str = "overwrite",
) -> None:
    """XML write, one row element per record; entity escaping is the
    writer's (&lt; &amp; etc. round-trip byte-exactly through the
    reader — pinned by the z30 oracle)."""
    df.write.format("xml").options(rootTag=root_tag, rowTag=row_tag).mode(
        mode
    ).save(path)
