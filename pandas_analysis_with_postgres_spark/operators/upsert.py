"""Keyed upsert — SURVEY §2.9 M1 (UPDATE-from) + M2 (INSERT-if-absent).

The reference's ``dwd.update(cst_insert)`` (``dmCustomerProc.py:193``)
is *index-aligned* and overwrites only non-NaN cells; its insert path is
a left-join probe + ``exists==0`` filter + append
(``dmCustomerProc.py:197-203``). Neither concept exists on an unordered
distributed multiset, so both are re-derived as keyed joins:

- UPDATE-from  → left join on key + per-column ``COALESCE(new, old)``
  (non-NULL-only overwrite, matching pandas ``update`` semantics);
- INSERT-if-absent → ``left_anti`` join (the reference's 3-step probe
  dance is one Spark operator, J19 in SURVEY §2.4).

In a Delta/Iceberg deployment this whole function is one
``MERGE INTO … WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT``;
those connector jars aren't in this environment, so the join-coalesce
form is the portable core (it is also exactly what MERGE plans to).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import atomic_overwrite_partitions, recover_partition_swaps
from .windows import keep_first_dedup


def upsert(
    dim: DataFrame,
    staged: DataFrame,
    key: str,
    *,
    update_cols: list[str] | None = None,
    stamp: dict[str, Column] | None = None,
    dedup_order_by: list[Column] | None = None,
) -> DataFrame:
    """Upsert ``staged`` into dimension ``dim`` on ``key``.

    Returns the new dimension content:
    matched rows with ``update_cols`` overwritten by non-NULL staged
    values (M1), unmatched old rows unchanged, and staged rows with
    unseen keys appended (M2). ``stamp`` adds bookkeeping columns (e.g.
    ``etl_date``) to every returned row, mirroring
    ``dmCustomerProc.py:194,200``.

    Duplicate keys in ``staged`` (the common CDC shape: several change
    events per key in one delta) would fan out the matched dim rows, so
    ``staged`` is pre-deduped to one row per key with an explicit
    deterministic tiebreak. Pass ``dedup_order_by`` (e.g.
    ``[F.col("change_ts").desc()]``) to pick the survivor; the default
    orders by all non-key staged columns descending NULLS LAST — stable,
    but callers with a real change timestamp should pass it.

    Scale: one shuffle join on ``key`` + one anti join; AQE broadcasts
    ``staged`` when it's the small delta against a big dimension (the
    common CDC shape). The dedup window partitions on ``key`` too, so
    its exchange is reused by the M1 join. No driver-side collection
    anywhere.
    """
    if update_cols is None:
        update_cols = [c for c in dim.columns if c != key and c in staged.columns]

    order = dedup_order_by or [
        F.col(c).desc_nulls_last() for c in staged.columns if c != key
    ]
    staged = keep_first_dedup(staged, key, order or [F.lit(1)])

    new_side = staged.select(
        F.col(key).alias("__k"),
        *[F.col(c).alias(f"__new_{c}") for c in update_cols],
    )
    updated = (
        dim.join(new_side, dim[key] == F.col("__k"), "left")
        .select(
            *[
                (
                    F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
                    if c in update_cols
                    else F.col(c)
                )
                for c in dim.columns
            ]
        )
    )
    inserts = staged.join(dim.select(key), key, "left_anti")
    out = updated.unionByName(inserts, allowMissingColumns=True)
    if stamp:
        out = out.withColumns(dict(stamp))
    return out


def upsert_partitioned(
    spark: SparkSession,
    staged: DataFrame,
    key: str,
    *,
    path: str,
    partition_col: str,
    update_cols: list[str] | None = None,
    stamp: dict[str, Column] | None = None,
    dedup_order_by: list[Column] | None = None,
) -> None:
    """Persistent upsert into a hive-partitioned parquet dimension at
    ``path``, rewriting ONLY the partitions the delta touches — the
    partition-overwrite stand-in for Delta/Iceberg ``MERGE INTO``
    promised in the module docstring.

    Shape: the current dimension is scanned *partition-pruned* to the
    delta's partitions (a semi join on ``partition_col`` — dynamic
    partition pruning keeps the big scan limited to affected
    directories), the in-memory :func:`upsert` recomputes just those
    partitions' content, and
    :func:`~..sources.parquet.overwrite_partitions` swaps exactly those
    directories. Untouched partitions' files are never read or
    rewritten (pinned byte-level in ``tests/test_sinks.py``).

    PRECONDITION — partition-stable keys: a key's ``partition_col``
    value must never change between the stored dimension and the delta
    (partition by ingest date of first appearance, tenant, or a hash
    bucket of the key — all stable by construction). If a staged key
    lived in a partition the delta does not name, the anti-join would
    re-insert it there as a duplicate. This is the same contract
    Hive-style ``INSERT OVERWRITE ... PARTITION`` pipelines run on.

    ``staged`` must carry ``partition_col``.
    """
    if partition_col not in staged.columns:
        raise ValueError(
            f"staged delta must carry partition column {partition_col!r}"
        )
    # Roll forward any interrupted previous run before reading: a crash
    # between partition swaps must never feed a missing partition into
    # this recomputation (see sources.parquet.atomic_overwrite_partitions).
    recover_partition_swaps(path)
    dim = spark.read.parquet(path)
    affected = staged.select(partition_col).distinct()
    current = dim.join(F.broadcast(affected), partition_col, "left_semi")
    out = upsert(
        current,
        staged,
        key,
        update_cols=update_cols,
        stamp=stamp,
        dedup_order_by=dedup_order_by,
    )
    # The staged write goes to a sibling directory, so the
    # read-overwrite conflict Spark guards against never arises, and a
    # crashed run can only leave (a) an unreferenced staging dir or
    # (b) a journaled partial swap that the recovery call above — or
    # any later reader calling recover_partition_swaps — rolls forward.
    atomic_overwrite_partitions(out, path, partition_col)
