"""SparkSession factory tuned for this engine.

Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]`` (default 32); on a
real cluster the same builder settings apply, only ``master`` changes.

Scale notes (100 TB design intent):
- AQE on: runtime coalescing, skew-join splitting, dynamic broadcast.
- ``spark.sql.shuffle.partitions`` is a floor for local runs; AQE
  coalesces. On a 1000-executor cluster you would raise the initial
  partition count (or rely on ``spark.sql.adaptive.coalescePartitions``
  with a large initialPartitionNum) rather than edit operator code.
- Session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pandas_analysis_with_postgres_spark") -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (the legacy default for TIMESTAMP LTZ) carries NO
        # parquet min/max statistics, silently disabling manifest
        # stats / stats-pruned scans / manifest_aggregate for those
        # columns. MICROS is the modern encoding every reader speaks.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
