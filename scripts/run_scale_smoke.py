"""Run the 10x scale smoke: time each smoke query at sf0.1 and at
.scale/sf1 (built by make_scale_data.py), materializing via the noop
sink exactly like bench.py, and print one JSON line with both timings
and the ratio. Gate (recorded in SCALE_SMOKE.md): no query >10x its
sf0.1 time without a named reason.

Usage: python scripts/run_scale_smoke.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_analysis_with_postgres_spark.plans import QUERIES  # noqa: E402
from pandas_analysis_with_postgres_spark.session import get_spark  # noqa: E402

#: Headline suite (round-over-round continuity) plus the heaviest of
#: the round-2 additions — the shapes most likely to hide a
#: fixture-size dependency.
SMOKE = (
    "q01_pricing_summary",
    "q02_customer_profile",
    "q03_latest_order_per_customer",
    "q13_user_event_flags",
    "q16_scd2",
    "q19_user_sessions",
    "q21_order_sequence_analytics",
    "q22_dedup_exact",
    "q24_minhash_dedup",
    "q25_simhash",
    "q27_cosine_topk",
    "q28_lsh_topk",
    "q30_text_stats",
    "a36_live_hourly_counts",
    "q42_ivf_topk",
    "a73_doc_chunks",
    "a74_rolling_spend",
    "a82_session_funnel",
    "a84_event_sequences",
    "a85_bpe_encode",
    "a86_supply_pagerank",
    "a89_fuzzy_token_pairs",
    "a95_bloom_join_revenue",
)


#: Synthetic skewed graph: ONE hub vertex receives ~30% of all edges
#: (the power-law shape the r2 verdict flagged); the rest spread
#: uniformly over a 20k vertex space. Generated in-Spark from range()
#: — deterministic (xxhash64 of the row id), no fixture file needed.
SKEW_EDGES = {"sf0.1": 1_200_000, "sf1": 12_000_000}
SKEW_HUB = 1  # vertex id of the hub (odd → distinct from most dsts)


def _skewed_pagerank(spark, label: str):
    from pyspark.sql import functions as F

    from pandas_analysis_with_postgres_spark.operators.graph import pagerank

    n = SKEW_EDGES[label]
    e = spark.range(n)
    src = (F.pmod(F.xxhash64("id"), F.lit(20_000)) + 2).alias("src")
    dst = F.when(
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(10)) < 3, F.lit(SKEW_HUB)
    ).otherwise(F.pmod(F.xxhash64(F.col("id") + 2), F.lit(20_000)) + 2)
    # Hub must have outdegree >= 1 (pagerank precondition): it appears
    # as src for ids where hash lands on it; add one guaranteed edge.
    edges = e.select(src, dst.alias("dst")).unionByName(
        spark.range(1).select(
            F.lit(SKEW_HUB).alias("src"), F.lit(2).alias("dst")
        )
    )
    return pagerank(edges)


def main() -> None:
    names = sys.argv[1:] or list(SMOKE)
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale/sf1"),
    )
    spark = get_spark("scale-smoke")
    # Warm JIT/footers once per dataset.
    for d in (base, big):
        QUERIES["q01_pricing_summary"](spark, d).write.format("noop").mode(
            "overwrite"
        ).save()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        row: dict[str, float] = {}
        for label, d in (("sf0.1", base), ("sf1", big)):
            t0 = time.perf_counter()
            QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
            row[label] = round(time.perf_counter() - t0, 2)
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 1) if row["sf0.1"] else 0.0
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr, flush=True)
    if not sys.argv[1:]:
        row = {}
        for label in ("sf0.1", "sf1"):
            t0 = time.perf_counter()
            _skewed_pagerank(spark, label).write.format("noop").mode(
                "overwrite"
            ).save()
            row[label] = round(time.perf_counter() - t0, 2)
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 1) if row["sf0.1"] else 0.0
        out["skewed_pagerank_hub30pct"] = row
        print(f"# skewed_pagerank_hub30pct: {row}", file=sys.stderr, flush=True)
    print(json.dumps({"smoke": out}))


if __name__ == "__main__":
    main()
