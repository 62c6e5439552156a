"""Z-order (Morton-curve) data layout for multi-column pruning.

A single-column sort gives parquet row-group min/max statistics that
prune scans filtered on THAT column and nothing else. Interleaving the
bits of several columns into one Morton key and sorting by it keeps
rows that are close in EVERY dimension close on disk, so row-group
stats stay tight for each participating column simultaneously — the
standard lakehouse `OPTIMIZE ZORDER BY` layout, built here from plain
Catalyst integer expressions plus ``repartitionByRange`` +
``sortWithinPartitions`` (no new engine machinery).

At 100 TB this is a WRITE-side investment: one range shuffle at layout
time buys every subsequent multi-predicate scan a row-group-level skip
(parquet readers evaluate pushed filters against min/max footers
before reading pages). The key is deterministic integer math, so it is
also exposed as an oracled query (a99) — the layout decision itself is
hash-verifiable, not just asserted.

Reference note: the reference (`dmCustomerProc.py`) has no storage
layout concept at all (a 236-line pandas script); this is part of the
declared 100 TB extension surface, same bucket as the snapshot layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits taken from each column: 256 buckets per dimension. Pruning
#: acts at file/row-group granularity (hundreds of units, not
#: millions), so 2^8 buckets per column already saturates layout
#: quality while keeping the quantile boundary array and the
#: interleave expression small; 8 bits x up to 8 columns stays well
#: inside a signed 64-bit key.
ZORDER_BITS = 8


def _rank_scale(df: DataFrame, col: str, bits: int) -> Column:
    """Scale a column to an unsigned ``bits``-bit integer by EXACT
    rank (percent_rank; ties keep equal ranks) — maps any orderable
    dtype and any skew onto the full 2^bits range.

    ⚠ The unpartitioned window is a single-task global sort: this
    variant exists for the ORACLED key query (exact, engine-agnostic
    semantics over a subsample), not for laying out big tables —
    :func:`write_zordered` uses :func:`_quantile_scale`, which has the
    same key semantics up to quantile-sketch error and no global
    window.
    """
    from pyspark.sql import Window

    pr = F.percent_rank().over(Window.orderBy(F.col(col)))
    return F.least(
        F.floor(pr * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )


def _quantile_scales(
    df: DataFrame, cols: list[str], bits: int
) -> list[Column]:
    """Scale numeric columns to unsigned ``bits``-bit integers by
    approx-quantile CDF lookup — the SCALE path for layout writes.

    ONE distributed ``approxQuantile`` pass computes ``2^bits - 1``
    boundaries for ALL columns together (a sketch merge, no sort, no
    shuffle of the data — and no per-column re-scan: PySpark's
    multi-column form shares the pass); the bucket of a value is then
    "how many boundaries are <= v", evaluated as an ``F.aggregate``
    fold over the literal boundary array — O(2^bits) codegen
    comparisons per row, zero joins, zero windows. Skew lands evenly
    across buckets because boundaries are quantiles, not value-range
    slices.
    """
    n_bounds = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_bounds)]
    all_bounds = df.approxQuantile(cols, probs, 0.001)
    out = []
    for col, bounds in zip(cols, all_bounds):
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        v = F.col(col).cast("double")
        out.append(
            F.aggregate(
                arr,
                F.lit(0).cast("long"),
                lambda acc, b: acc + F.when(v >= b, 1).otherwise(0).cast("long"),
            )
        )
    return out


def _quantile_scale(df: DataFrame, col: str, bits: int) -> Column:
    """Single-column form of :func:`_quantile_scales`."""
    return _quantile_scales(df, [col], bits)[0]


def interleave_bits(keys: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave ``bits``-bit integer columns into one key.

    Bit j of column i lands at position ``j * n_cols + i`` — pure
    shifts/masks/ors, whole-stage-codegen friendly, and replayable in
    any SQL dialect with bitwise operators (the a99 oracle does).
    """
    n = len(keys)
    out = F.lit(0).cast("long")
    for i, k in enumerate(keys):
        for j in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(k, j).bitwiseAND(F.lit(1)), j * n + i
                )
            )
    return out


def zorder_key(df: DataFrame, cols: list[str], *, bits: int = ZORDER_BITS) -> Column:
    """The Morton key column for ``cols`` of ``df`` (rank-scaled)."""
    return interleave_bits([_rank_scale(df, c, bits) for c in cols], bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = ZORDER_BITS,
    num_files: int = 8,
) -> None:
    """Write ``df`` laid out along the Morton curve of ``cols``.

    ``repartitionByRange`` on the key splits the curve into
    ``num_files`` contiguous segments (one range shuffle — the layout
    cost), ``sortWithinPartitions`` orders rows inside each file, and
    the key itself is dropped from the stored schema. Row-group
    min/max stats for every participating column then stay tight in
    every file, which is what the scan-side filter pushdown prunes on.

    Columns are scaled by the distributed approx-quantile CDF
    (:func:`_quantile_scales`) — no global sort anywhere in the write:
    ONE shared quantile-sketch pass for all columns, one range shuffle
    total.
    """
    key = interleave_bits(_quantile_scales(df, cols, bits), bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_prune_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of parquet row groups a ``col BETWEEN lo AND hi`` scan
    can SKIP from footer min/max stats alone — the metadata-level
    measure of layout quality (what the reader's predicate pushdown
    actually evaluates). Driver-side footer peek, no data read."""
    import glob as _glob

    import pyarrow.parquet as pq

    total = 0
    skipped = 0
    for f in sorted(_glob.glob(f"{path}/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[col]
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            total += 1
            if st is not None and (st.max < lo or st.min > hi):
                skipped += 1
    return skipped / total if total else 0.0
