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
    # round-4 late additions
    "z01_boilerplate_lines",
    "z02_quality_classifier",
    "z03_global_rank_shards",
    "z04_stats_pruned_scan",
    "z05_shuffled_shards",
    "z06_bloom_point_lookup",
    "z07_change_data_feed",
    # round-5 additions
    "z08_semantic_dedup",
    "z09_chunk_udtf",
    "z10_scd2_lakehouse",
    "z11_incremental_matview",
    "z12_resample_ffill",
    "z13_image_resize",
    "z14_optout_delete",
    "z15_schema_evolution",
    "z16_audio_resample",
    "z17_warc_extract",
    "z18_compressed_blobs",
    "z19_webdataset_roundtrip",
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


def _component_smokes(spark, base: str, big: str) -> dict[str, dict[str, float]]:
    """Scale smoke for the round-3 table-format layer — these are not
    ``queries()`` entries (they need table setup), so they get bespoke
    drivers. Asymptotes under test:

    - ``snapshot_merge_hot_partition``: MERGE cost follows the touched
      partition, not the table — the full-overwrite comparator is the
      cost it avoids.
    - ``incremental_minhash_dedup_batch``: a fixed 500-doc ingest batch
      against a 10× larger signature store pays one bigger store scan,
      never a store shuffle or recompute.
    - ``ivf_probe_pruned_vs_fullscan``: the probed search reads
      n_probe/n_cells of the index at the manifest; the comparator runs
      the IDENTICAL scoring plan over the unpruned read.
    """
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pandas_analysis_with_postgres_spark.functions.vectors import dot
    from pandas_analysis_with_postgres_spark.operators import similarity as SIM
    from pandas_analysis_with_postgres_spark.operators.dedup import (
        incremental_minhash_dedup,
    )
    from pandas_analysis_with_postgres_spark.sources.parquet import load_table
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
        read_snapshot,
        write_snapshot,
    )

    out: dict[str, dict[str, float]] = {}
    datasets = (("sf0.1", base), ("sf1", big))

    row: dict[str, float] = {}
    for label, d in datasets:
        tmp = tempfile.mkdtemp(prefix="smoke_snap_")
        try:
            orders = load_table(spark, d, "orders").select(
                "o_orderkey",
                "o_custkey",
                "o_totalprice",
                F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            )
            t0 = time.perf_counter()
            write_snapshot(orders, f"{tmp}/t", "month")
            row[f"{label}_overwrite"] = round(time.perf_counter() - t0, 2)
            hot = orders.agg(F.max("month")).collect()[0][0]
            src = orders.filter(F.col("month") == hot).withColumn(
                "o_totalprice", F.col("o_totalprice") + 1.0
            )
            t0 = time.perf_counter()
            merge_snapshot(f"{tmp}/t", src, "o_orderkey", "month")
            row[label] = round(time.perf_counter() - t0, 2)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    row["ratio"] = round(row["sf1"] / row["sf0.1"], 1) if row["sf0.1"] else 0.0
    out["snapshot_merge_hot_partition"] = row

    row = {}
    for label, d in datasets:
        tmp = tempfile.mkdtemp(prefix="smoke_incdedup_")
        try:
            docs = load_table(spark, d, "documents")
            # untimed setup: bootstrap the signature store with the corpus
            incremental_minhash_dedup(docs, f"{tmp}/store", batch_id=0)
            batch = (
                docs.orderBy("doc_id")
                .limit(500)
                .select((F.col("doc_id") + 90_000_000).alias("doc_id"), "text")
            )
            t0 = time.perf_counter()
            res, _ = incremental_minhash_dedup(batch, f"{tmp}/store", batch_id=1)
            res.write.format("noop").mode("overwrite").save()
            row[label] = round(time.perf_counter() - t0, 2)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    row["ratio"] = round(row["sf1"] / row["sf0.1"], 1) if row["sf0.1"] else 0.0
    out["incremental_minhash_dedup_batch"] = row

    # incremental_semantic_dedup_batch: the embedding-level twin — a
    # fixed 500-vector batch against a 10× larger vector store under a
    # frozen codebook pays one bigger cell-joined store scan, never a
    # store shuffle or codebook retrain. The store is bootstrapped by
    # DIRECT assignment + write (untimed — running the full dedup over
    # the bootstrap corpus is the WHOLE-CORPUS operator's job and
    # would violate the k ∝ N rule at this fixed k); the timed part is
    # the steady-state batch, which is what the operator is for.
    row = {}
    sem_sizes = {"sf0.1": 100_000, "sf1": 1_000_000}
    sem_dim = 16
    sem_k = 256
    for label, _ in datasets:
        tmp = tempfile.mkdtemp(prefix="smoke_semdedup_")
        try:
            vec = F.transform(
                F.sequence(F.lit(0), F.lit(sem_dim - 1)),
                lambda j: (
                    F.pmod(F.xxhash64(F.col("id") * sem_dim + j), F.lit(1000))
                    / 500.0
                    - 1.0
                ).cast("float"),
            )
            corpus = spark.range(sem_sizes[label]).select(
                F.col("id").alias("vec_id"), vec.alias("embedding")
            )
            # frozen codebook: the first k corpus vectors (a smoke
            # stand-in for the trained artifact)
            cents = corpus.filter(F.col("vec_id") < sem_k).select(
                F.col("vec_id").alias("cell_id"),
                F.transform(
                    F.col("embedding"), lambda x: x.cast("double")
                ).alias("centv"),
            ).localCheckpoint()
            assigned = SIM.assign_cells(corpus, cents).withColumn(
                "__batch", F.lit(0)
            )
            write_snapshot(assigned, f"{tmp}/store", "__batch")
            batch = spark.range(500).select(
                (F.col("id") + 90_000_000).alias("vec_id"), vec.alias("embedding")
            )
            t0 = time.perf_counter()
            res, _ = SIM.incremental_semantic_dedup(
                batch, f"{tmp}/store", cents, batch_id=1, threshold=0.95
            )
            res.write.format("noop").mode("overwrite").save()
            row[label] = round(time.perf_counter() - t0, 2)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    row["ratio"] = round(row["sf1"] / row["sf0.1"], 1) if row["sf0.1"] else 0.0
    out["incremental_semantic_dedup_batch"] = row

    row = {}
    # The fixture embeddings (20k rows) are too small for I/O to matter
    # — job fixed costs drown the scan. Build the index over a LARGE
    # deterministic synthetic corpus instead, the shape where manifest
    # pruning is the point: n_probe/n_cells of the bytes read.
    sizes = {"sf0.1": 400_000, "sf1": 4_000_000}
    dim = 16
    for label, _ in datasets:
        tmp = tempfile.mkdtemp(prefix="smoke_ivf_")
        try:
            vec = F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: (
                    F.pmod(F.xxhash64(F.col("id") * dim + j), F.lit(1000))
                    / 500.0
                    - 1.0
                ),
            )
            corpus = spark.range(sizes[label]).select(
                F.col("id").alias("vec_id"), vec.alias("embedding")
            )
            SIM.build_ivf_index(corpus, f"{tmp}/ivf", trained=False)
            queries = corpus.filter(
                F.col("vec_id") % (sizes[label] // 8) == 7
            ).localCheckpoint()
            # comparator FIRST (so JVM warmup favors the pruned run's
            # opponent, not the claim): identical scoring plan over the
            # UNPRUNED vectors read.
            centroids = read_snapshot(spark, f"{tmp}/ivf/centroids")
            q = SIM._probe_cells(
                queries, centroids, SIM.IVF_PROBE, "vec_id", "embedding"
            )
            vecs = read_snapshot(spark, f"{tmp}/ivf/vectors")
            scored = (
                vecs.join(F.broadcast(q), "cell_id")
                .filter(F.col("vec_id") != F.col("query_id"))
                .withColumn(
                    "cos",
                    dot(F.col("qv"), F.col("embedding"))
                    / (F.col("__qn") * F.col("__vn")),
                )
            )
            w = Window.partitionBy("query_id").orderBy(
                F.desc("cos"), F.asc("vec_id")
            )
            full = (
                scored.withColumn("rank", F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= 10)
                .select("query_id", "vec_id", "rank", "cos")
            )
            t0 = time.perf_counter()
            full.write.format("noop").mode("overwrite").save()
            row[f"{label}_fullscan"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            SIM.search_ivf_index(queries, f"{tmp}/ivf", 10).write.format(
                "noop"
            ).mode("overwrite").save()
            row[label] = round(time.perf_counter() - t0, 2)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    row["ratio"] = round(row["sf1"] / row["sf0.1"], 1) if row["sf0.1"] else 0.0
    out["ivf_probe_pruned_vs_fullscan"] = row

    # --- round-4 late: manifest column-stats skipping + z-order compact.
    # Asymptote under test: a key-window aggregate over a stats-pruned
    # read touches ONE partition's files regardless of table size
    # (flat), while the identical aggregate over the unpruned read
    # scans the whole table (grows with N). The table is synthetic
    # (ingest-ordered ids → correlated bucket/id stats, the realistic
    # shape), 64 partitions at both scales.
    row = {}
    zrow = {}
    sizes = {"sf0.1": 2_000_000, "sf1": 20_000_000}
    for label, _ in datasets:
        tmp = tempfile.mkdtemp(prefix="smoke_stats_")
        try:
            n = sizes[label]
            width = n // 64
            tbl = spark.range(n).select(
                "id",
                F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v"),
                F.expr(f"id DIV {width}").alias("bucket"),
            )
            write_snapshot(tbl, f"{tmp}/t", "bucket", stats_cols=["id"])
            lo, hi = width * 7, width * 8 - 1
            # comparator first (JVM warmup favors the opponent)
            full = (
                read_snapshot(spark, f"{tmp}/t")
                .filter(F.col("id").between(lo, hi))
                .agg(F.sum("v").alias("s"))
            )
            t0 = time.perf_counter()
            full.write.format("noop").mode("overwrite").save()
            row[f"{label}_fullscan"] = round(time.perf_counter() - t0, 2)
            pruned = (
                read_snapshot(
                    spark, f"{tmp}/t", column_ranges={"id": (lo, hi)}
                )
                .filter(F.col("id").between(lo, hi))
                .agg(F.sum("v").alias("s"))
            )
            t0 = time.perf_counter()
            pruned.write.format("noop").mode("overwrite").save()
            row[label] = round(time.perf_counter() - t0, 2)
            # z-order compact of the same table: maintenance cost must
            # track table size (~linear), nothing worse.
            from pandas_analysis_with_postgres_spark.sources.snapshot import (
                compact_snapshot,
            )

            t0 = time.perf_counter()
            compact_snapshot(spark, f"{tmp}/t", zorder_by=["id", "v"])
            zrow[label] = round(time.perf_counter() - t0, 2)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    row["ratio"] = round(row["sf1"] / row["sf0.1"], 1) if row["sf0.1"] else 0.0
    out["stats_skip_pruned_vs_fullscan"] = row

    # --- CDC: diff cost follows CHANGED partitions, not table size.
    # One partition of a 64-partition table is updated; the
    # manifest-pruned diff scans only it, while the naive comparator
    # runs the identical join logic over BOTH full versions.
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        diff_snapshots,
    )

    crow: dict[str, float] = {}
    for label, _ in datasets:
        tmp = tempfile.mkdtemp(prefix="smoke_cdc_")
        try:
            n = sizes[label]
            width = n // 64
            tbl = spark.range(n).select(
                "id",
                F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v"),
                F.expr(f"id DIV {width}").alias("bucket"),
            )
            write_snapshot(tbl, f"{tmp}/t", "bucket")
            upd = tbl.filter(F.col("bucket") == 7).withColumn(
                "v", F.col("v") + 1
            )
            merge_snapshot(f"{tmp}/t", upd, "id", "bucket")
            # comparator first: naive full-version diff (same joins)
            a = read_snapshot(spark, f"{tmp}/t", 1)
            b = read_snapshot(spark, f"{tmp}/t", 2)
            pair = (
                a.select("id", F.struct("v", "bucket").alias("__a"))
                .join(
                    b.select("id", F.struct("v", "bucket").alias("__b")),
                    "id",
                )
                .filter(~F.col("__a").eqNullSafe(F.col("__b")))
            )
            t0 = time.perf_counter()
            pair.write.format("noop").mode("overwrite").save()
            crow[f"{label}_fulldiff"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            diff_snapshots(spark, f"{tmp}/t", 1, 2, "id").write.format(
                "noop"
            ).mode("overwrite").save()
            crow[label] = round(time.perf_counter() - t0, 2)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    crow["ratio"] = (
        round(crow["sf1"] / crow["sf0.1"], 1) if crow["sf0.1"] else 0.0
    )
    out["cdc_diff_changed_partitions"] = crow
    zrow["ratio"] = (
        round(zrow["sf1"] / zrow["sf0.1"], 1) if zrow["sf0.1"] else 0.0
    )
    out["zorder_compact"] = zrow
    return out


def main() -> None:
    names = sys.argv[1:] or list(SMOKE)
    components_only = names == ["--components"]
    if components_only:
        names = []
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
    if not sys.argv[1:] or components_only:
        for cname, crow in _component_smokes(spark, base, big).items():
            out[cname] = crow
            print(f"# {cname}: {crow}", file=sys.stderr, flush=True)
    print(json.dumps({"smoke": out}))


if __name__ == "__main__":
    main()
