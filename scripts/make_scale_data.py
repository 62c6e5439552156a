"""Build a 10x-scale dataset from sf0.1 by key-shifted replication.

The driver provides sf0.001/0.01/0.1; the 100 TB contract demands
evidence the plans survive a scale-up, so this script manufactures a
"sf1" dataset: ``COPIES`` key-shifted copies of every fact table, with
all key domains offset by the same stride so join relationships are
preserved copy-locally (customer copy i joins orders copy i).

- region/nation are fixed-cardinality dimensions at every TPC-H SF —
  copied once, not replicated.
- events: event_id AND user_id shift, so streaming/session state
  cardinality grows 10x (more keys, not just more rows per key).
- documents: each copy's text gets a unique one-token prefix, so
  copies are *near*-duplicates (high-Jaccard pairs) rather than exact
  dups — the realistic dedup stress. Pair-emitting queries grow
  superlinearly in copies by nature: each original doc yields
  C(10,2) = 45 cross-copy near-dup pairs.
- embeddings: vec_id shifts; vectors are reused untouched (ANN work
  scales with corpus size either way).

Output: ``.scale/sf1/*.parquet`` under the repo root (gitignored).
Usage: ``python scripts/make_scale_data.py [copies]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.session import get_spark
from pandas_analysis_with_postgres_spark.sources.parquet import load_table

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
STRIDE = 10_000_000  # > any key in sf0.1; same stride for every key domain

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(spark, name: str, copies: int):
    base = load_table(spark, SRC, name)
    parts = []
    for i in range(copies):
        df = base
        for c in SHIFT_COLS[name]:
            df = df.withColumn(c, F.col(c) + F.lit(i * STRIDE))
        if name == "documents":
            df = df.withColumn("text", F.concat(F.lit(f"c{i} "), F.col("text")))
            df = df.withColumn("n_chars", F.col("n_chars") + F.lit(len(f"c{i} ")))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("make-scale-data")
    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation"):
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
    for name in SHIFT_COLS:
        df = replicate(spark, name, copies)
        # events.ts is written as whatever load_table yielded (NTZ
        # micros for the current fixture) — the streaming source layer
        # introspects the footer and adapts (streams._events_ts_kind),
        # so no physical down-conversion is needed here.
        df.repartition(32).write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"{name}: {df.count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
