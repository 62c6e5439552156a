"""Parquet sources for the driver-provided test tables.

The reference reads whole Postgres tables eagerly with
``pd.read_sql_table`` (reference ``dmCustomerProc.py:18-22`` et al.,
operator S2 in SURVEY §2.1). Here the scan is a lazy Spark parquet
source: Catalyst pushes filters and prunes columns into the scan
(``PushedFilters`` / ``ReadSchema`` in ``.explain``), so reading "the
whole table" never happens unless the query needs it. For the real
Postgres deployment, see ``sources.jdbc``.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All driver-generated tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Runtime-settable confs every query needs regardless of who built the
#: session. The driver calls ``queries()`` entries with ITS OWN
#: SparkSession; if that session carries Spark's defaults (200 shuffle
#: partitions, no pinned timezone), every tiny sf0.01 oracle run pays
#: hundreds of empty-task launches and the whole correctness pass can
#: blow the driver's time budget (r02 stopped at 50/96 queries). All of
#: these are runtime-settable (no session restart), and each matches
#: ``session.get_spark``'s build-time values.
_RUNTIME_TUNING = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}
_TUNED_MARKER = "spark.graft.sessionTuned"


def tune_session(spark: SparkSession) -> SparkSession:
    """Idempotently apply runtime tuning to a caller-provided session."""
    try:
        spark.conf.get(_TUNED_MARKER)
        return spark  # already tuned this session
    except Exception:  # noqa: BLE001 — unset marker raises
        pass
    for key, value in _RUNTIME_TUNING.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # noqa: BLE001 — never fail a query over tuning
            pass
    spark.conf.set(_TUNED_MARKER, "true")
    return spark


#: Memoized lazy scans. ``spark.read.parquet`` re-reads footers and
#: re-infers the schema on every call; a 97-query correctness pass
#: loads the same ten fixtures a few hundred times, which is pure
#: fixed cost against the driver's time budget. The key includes the
#: fixture's mtime so a regenerated fixture invalidates the entry, and
#: the Spark application id so a DataFrame never leaks across JVMs.
_LOAD_CACHE: dict[tuple[str, str, str, int], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one test table (memoized per session+mtime).

    The ``events`` fixture stores ``ts`` as a Parquet TIMESTAMP(NANOS),
    which Spark rejects natively ([PARQUET_TYPE_ILLEGAL]); it is read
    as nanos-since-epoch LONG and converted to a microsecond timestamp
    (integer ``div`` — a double division would lose precision above
    2^53 ns). The fixture's values are micro-aligned, so no truncation
    occurs (pinned in tests).
    """
    tune_session(spark)
    path = f"{sf_dir}/{name}.parquet"
    try:
        key = (
            spark.sparkContext.applicationId,
            os.path.abspath(sf_dir),
            name,
            os.stat(path).st_mtime_ns,
        )
    except Exception:  # noqa: BLE001 — non-local paths: skip the cache
        key = None
    if key is not None and key in _LOAD_CACHE:
        return _LOAD_CACHE[key]
    if key is not None:
        # Evict stale entries before inserting: DataFrames from stopped
        # sessions (different applicationId) pin dead JVM plan objects,
        # and a regenerated fixture (same dir/name, different mtime)
        # leaves its superseded entry unreachable forever. A long-lived
        # process cycling sessions would otherwise grow this dict
        # without bound.
        app_id = key[0]
        stale = [
            k
            for k in _LOAD_CACHE
            if k[0] != app_id or (k[1], k[2]) == (key[1], key[2])
        ]
        for k in stale:
            del _LOAD_CACHE[k]
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    if key is not None:
        _LOAD_CACHE[key] = df
    return df


def write_table(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink (the local stand-in for reference S3's ``to_sql``;
    the warehouse path is ``sources.jdbc.write_table``).

    ``partition_by`` lays the table out hive-style so later reads prune
    partitions (PartitionFilters in ``.explain``) — at 100 TB, date or
    tenant partitioning is the difference between scanning terabytes
    and scanning one directory. Keep partition cardinality modest
    (≤ ~10k dirs); higher-cardinality layout wants bucketing via
    ``saveAsTable`` instead. ``max_records_per_file`` caps file size to
    avoid the giant-file long-tail on skewed partitions.
    """
    writer = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        writer = writer.partitionBy(*cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str] | str,
) -> None:
    """Dynamic partition overwrite: replace ONLY the hive partitions
    present in ``df``, leaving every other partition's files untouched.

    This is the portable stand-in for Delta/Iceberg ``MERGE INTO``
    named in ``operators.upsert``: a 100 TB dimension refresh rewrites
    just the partitions the delta touches instead of the whole table.
    ``partitionOverwriteMode`` is passed as a writer option so the
    session-level ``STATIC`` default (which would drop all other
    partitions!) is never relied on.
    """
    cols = [partition_by] if isinstance(partition_by, str) else partition_by
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*cols)
        .parquet(path)
    )


#: Intent-log filename for atomic partition swaps. The leading ``_``
#: makes Spark/Hive readers ignore it as a data file.
UPSERT_INTENT_FILE = "_upsert_intent.json"


def atomic_overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """Crash-safe dynamic partition overwrite: stage → intent-log →
    per-partition atomic rename.

    ``overwrite_partitions`` (above) delegates to Spark's dynamic
    overwrite, which deletes each target partition directory before
    committing the new files — a crash mid-commit can leave a
    HALF-REWRITTEN partition that readers then see. Here instead:

    1. the replacement partitions are fully written to a *sibling*
       staging directory (invisible to readers of ``path``);
    2. an intent log (``_upsert_intent.json``, underscore-prefixed so
       data readers skip it) records the planned swaps, fsync'd, BEFORE
       any destination is touched;
    3. each partition directory is swapped by two ``os.rename`` calls
       (old → trash, staged → live) — directory rename is atomic on
       POSIX, so a reader sees each partition either fully-old or
       fully-new, never a mix of files;
    4. on success the intent log, trash, and staging residue are
       removed.

    A crash between step-3 renames leaves at most a *missing* partition
    for the instants until :func:`recover_partition_swaps` — which any
    reader/writer calls first (and ``upsert_partitioned`` does) — rolls
    the journal FORWARD idempotently. This is the portable core of what
    a table format's manifest commit provides; snapshot isolation for
    concurrent *writers* still belongs to Delta/Iceberg (single-writer
    per table is this function's contract, as with Hive INSERT
    OVERWRITE).
    """
    import json
    import shutil
    import uuid

    recover_partition_swaps(path)
    run_id = uuid.uuid4().hex[:12]
    base = path.rstrip("/")
    stage = f"{base}__stage_{run_id}"
    trash = f"{base}__trash_{run_id}"
    df.write.mode("overwrite").partitionBy(partition_col).parquet(stage)
    parts = sorted(
        p.name
        for p in Path(stage).iterdir()
        if p.is_dir() and p.name.startswith(f"{partition_col}=")
    )
    os.makedirs(trash, exist_ok=True)
    intent = {"stage": stage, "trash": trash, "partitions": parts}
    intent_path = os.path.join(path, UPSERT_INTENT_FILE)
    tmp = intent_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(intent, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, intent_path)
    _apply_partition_swaps(path, intent)
    os.remove(intent_path)
    shutil.rmtree(trash, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)


def _apply_partition_swaps(path: str, intent: dict) -> None:
    """Idempotent roll-forward of a swap journal: safe to re-run from
    any crash point — each step checks what already happened."""
    stage, trash = intent["stage"], intent["trash"]
    for part in intent["partitions"]:
        staged_p = os.path.join(stage, part)
        final_p = os.path.join(path, part)
        if not os.path.isdir(staged_p):
            continue  # this partition's swap already completed
        if os.path.isdir(final_p):
            dest = os.path.join(trash, part)
            if os.path.isdir(dest):  # crashed mid-swap last time
                shutil.rmtree(final_p)
            else:
                os.rename(final_p, dest)
        os.rename(staged_p, final_p)


def recover_partition_swaps(path: str) -> bool:
    """Complete any interrupted :func:`atomic_overwrite_partitions` run
    (roll forward from its intent log). Returns True if recovery ran."""
    import json

    intent_path = os.path.join(path, UPSERT_INTENT_FILE)
    if not os.path.exists(intent_path):
        return False
    with open(intent_path) as f:
        intent = json.load(f)
    _apply_partition_swaps(path, intent)
    os.remove(intent_path)
    shutil.rmtree(intent["trash"], ignore_errors=True)
    shutil.rmtree(intent["stage"], ignore_errors=True)
    return True


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str | list[str],
    buckets: int = 32,
    sorted_by_key: bool = True,
) -> None:
    """Save as a bucketed (and bucket-sorted) catalog table.

    Bucketing pre-shuffles the data at write time: two tables bucketed
    by the same key into the same bucket count join with NO exchange —
    at 100 TB, the difference between re-shuffling both fact tables on
    every join and a purely local merge per bucket pair (pinned by the
    no-Exchange plan test). Spark bucketing requires ``saveAsTable``
    (the bucket metadata lives in the catalog, not the files).
    """
    keys = [key] if isinstance(key, str) else key
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sorted_by_key:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def compact(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_mb)`` files.

    The 100 TB housekeeping op — streaming sinks, partition-overwrite
    upserts, and over-parallel writes all accrete small files, and scan
    throughput degrades with per-file open/footers cost. Sizing comes
    from the filesystem (Hadoop ``ContentSummary``, so it works on any
    scheme Spark can read); the rewrite is repartition → write to a
    sibling dir → swap. The swap is not atomic — concurrent readers
    belong to table formats (Delta/Iceberg), not raw directories; this
    is the maintenance-window form. Returns the new file count.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-int(total) // (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    fs.delete(jpath, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jpath)
    return n_files


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to all of them."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the test tables as temp views for the SQL front-end."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
