"""Mimic the driver's correctness pass to find where its budget goes.

For every declared query (sorted, like the driver appears to iterate)
run the Spark plan to completion AND the DuckDB oracle at sf0.01,
timing each phase. Emits one JSON line per query plus a total, so slow
entries (the reason CORRECTNESS_r02 stopped at 50 of 96) are visible.

Usage: python scripts/profile_driver.py [sf_dir] [only_prefix...]
"""

from __future__ import annotations

import json
import sys
import time

ROOT = "/root/repo"
sys.path.insert(0, ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("profile-driver")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = sorted(queries)
    if ONLY:
        names = [n for n in names if any(n.startswith(p) for p in ONLY)]

    total_spark = total_oracle = 0.0
    rows = []
    for name in names:
        t0 = time.monotonic()
        err = None
        n_spark = n_oracle = -1
        try:
            df = queries[name](spark, SF_DIR)
            n_spark = len(df.collect())
        except Exception as exc:  # noqa: BLE001
            err = f"spark: {exc}"[:200]
        t1 = time.monotonic()
        if name in oracles and err is None:
            try:
                n_oracle = len(con.execute(oracles[name]).fetchall())
            except Exception as exc:  # noqa: BLE001
                err = f"oracle: {exc}"[:200]
        t2 = time.monotonic()
        rec = {
            "q": name,
            "spark_s": round(t1 - t0, 3),
            "oracle_s": round(t2 - t1, 3),
            "rows": n_spark,
            "oracle_rows": n_oracle,
            "err": err,
        }
        total_spark += t1 - t0
        total_oracle += t2 - t1
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    print(
        json.dumps(
            {
                "total_spark_s": round(total_spark, 1),
                "total_oracle_s": round(total_oracle, 1),
                "total_s": round(total_spark + total_oracle, 1),
                "n": len(rows),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
