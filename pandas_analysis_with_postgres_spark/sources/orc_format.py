"""ORC source/sink — the other columnar interchange format.

Some lakehouse estates are ORC-native (Hive heritage); the engine
reads and writes it with the same contracts as the parquet layer:
hive-style partitioned layout, predicate pushdown and column pruning
reaching the scan (both plan-pinned in tests/test_plans.py via z29 —
`PushedFilters` / `PartitionFilters` on the ORC scan node), schema
declared by the table not inferred per query. Spark's ORC support is
built-in (native vectorized reader); no extra packages.

Convert long-lived tables to ONE house format (this repo's is
parquet + the snapshot layer) — ORC support is for reading estates
you don't control and writing for consumers you don't control, not
for mixing formats within a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    *,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned ORC write (same layout contract as
    sources.parquet.write_table)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; filters and projections push down exactly like
    parquet (native reader) — keep queries declarative and let
    Catalyst prune."""
    return spark.read.orc(path)
