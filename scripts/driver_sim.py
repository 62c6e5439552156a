"""Simulate the driver's CORRECTNESS pass to find per-query cost.

The driver runs every ``queries()`` entry AND its ``oracle_sql()`` via
DuckDB at sf0.01, in lexicographic key order, within some time budget —
``CORRECTNESS_r02.json`` stopped at exactly the first 50 non-streaming
keys, so per-query wall-clock is the lever for full coverage.

This script mimics that loop (one shared SparkSession, collect each
result, run the DuckDB oracle) and prints a JSON report sorted by total
cost so the expensive queries can be attacked directly.

Usage: python scripts/driver_sim.py [sf_dir] [--only q85,q36] [--limit N]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from pandas_analysis_with_postgres_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    only = None
    limit = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--only":
            only = set(argv[i + 1].split(","))
            i += 2
        elif a == "--limit":
            limit = int(argv[i + 1])
            i += 2
        else:
            sf_dir = a
            i += 1

    spark = get_spark("driver_sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = queries()
    oracles = oracle_sql()
    names = sorted(qs)
    if only:
        names = [n for n in names if n in only or n.split("_")[0] in only]
    if limit:
        names = names[:limit]

    report = {}
    t_total0 = time.monotonic()
    for name in names:
        t0 = time.monotonic()
        err = None
        n_rows = -1
        try:
            df = qs[name](spark, sf_dir)
            rows = df.collect()
            n_rows = len(rows)
        except Exception as exc:  # noqa: BLE001
            err = f"{type(exc).__name__}: {exc}"[:200]
        t_spark = time.monotonic() - t0
        t1 = time.monotonic()
        o_rows = None
        if name in oracles and err is None:
            try:
                o_rows = len(con.execute(oracles[name]).fetchall())
            except Exception as exc:  # noqa: BLE001
                err = f"oracle {type(exc).__name__}: {exc}"[:200]
        t_duck = time.monotonic() - t1
        report[name] = {
            "spark_s": round(t_spark, 3),
            "duck_s": round(t_duck, 3),
            "rows": n_rows,
            "oracle_rows": o_rows,
            "err": err,
        }
        print(
            f"{name:36s} spark={t_spark:6.2f}s duck={t_duck:5.2f}s rows={n_rows}"
            + (f" ERR={err}" if err else ""),
            flush=True,
        )

    total = time.monotonic() - t_total0
    ranked = sorted(report.items(), key=lambda kv: -(kv[1]["spark_s"] + kv[1]["duck_s"]))
    print(json.dumps({"total_s": round(total, 1), "n": len(names)}))
    print("TOP 15 BY COST:")
    for name, r in ranked[:15]:
        print(f"  {name:36s} {r['spark_s'] + r['duck_s']:6.2f}s")
    with open("/tmp/driver_sim.json", "w") as f:
        json.dump({"total_s": total, "queries": report}, f, indent=1)


if __name__ == "__main__":
    main()
