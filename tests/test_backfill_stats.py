"""Stats/bloom BACKFILL without rewrite (round 11): a table written
before its stats/bloom properties were declared gains them via
``alter_table_properties`` (declare) + ``backfill_table_stats``
(materialize) — footer harvest for min/max/nulls, one read-only scan
for sketches and blooms, metadata-only commit. The backfilled manifest
must be indistinguishable from a written-with-stats one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    alter_table_properties,
    backfill_table_stats,
    delete_where,
    evolve_partition_spec,
    evolve_snapshot_schema,
    read_manifest,
    read_snapshot,
    write_snapshot,
)

DDL = "k bigint, p string, v bigint, w bigint"
# v clusters by partition (p0: 0–999, p1: 1000–1999, p2: 2000–2999) so
# range pruning has something to prune
ROWS = [
    (i, f"p{i % 3}", (i % 3) * 1000 + i * 10,
     None if i % 4 == 0 else i)
    for i in range(1, 25)
]
PROPS = dict(
    stats_cols=["v", "w", "v::sum", "k::hll", "v::hist:40"],
    bloom_cols=["k"],
)


def _mk(spark):
    return spark.createDataFrame(ROWS, DDL)


def test_backfill_matches_write_path_bit_for_bit(spark, tmp_path):
    # twin tables: one written WITH the properties, one backfilled
    ref = str(tmp_path / "ref")
    write_snapshot(_mk(spark), ref, "p", **PROPS)
    tgt = str(tmp_path / "tgt")
    write_snapshot(_mk(spark), tgt, "p")
    alter_table_properties(spark, tgt, **PROPS)
    v = backfill_table_stats(spark, tgt)
    assert v == 3  # write, alter, backfill
    man_ref = read_manifest(ref)
    man_tgt = read_manifest(tgt)

    def _norm(stats):
        # parquet file names carry per-write UUIDs; the per-file
        # ENTRIES must match, the names legitimately differ
        return {
            p: {
                k: (sorted(map(repr, v.values())) if k == "::files" else v)
                for k, v in e.items()
            }
            for p, e in stats.items()
        }

    assert _norm(man_tgt["stats"]) == _norm(man_ref["stats"])
    assert _norm(man_tgt["blooms"]) == _norm(man_ref["blooms"])
    # metadata-only: every partition carried by reference
    assert man_tgt["partitions"] == read_manifest(tgt, 1)["partitions"]


def test_backfill_enables_pruning_and_metadata_answers(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        answer_from_manifest,
    )

    path = str(tmp_path / "t")
    write_snapshot(_mk(spark), path, "p")
    alter_table_properties(spark, path, **PROPS)
    backfill_table_stats(spark, path)
    # column_ranges prune on backfilled stats: only p=p2 holds v>=2000
    pruned = read_snapshot(spark, path, column_ranges={"v": (2000, None)})
    assert {f.rsplit("/", 2)[-2] for f in pruned.inputFiles()} == {"p=p2"}
    assert sorted(r["k"] for r in pruned.filter("v >= 2000").collect()) == [
        r[0] for r in ROWS if r[2] >= 2000
    ]
    # point lookups prune on backfilled blooms
    hit = read_snapshot(spark, path, point_lookups={"k": 7})
    assert len({f.rsplit("/", 2)[-2] for f in hit.inputFiles()}) == 1
    # manifest answers serve from the backfilled sketches
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n, SUM(v) AS s, COUNT(w) AS nw,"
        " MIN(v) AS lo, MAX(v) AS hi FROM t",
        {"t": path},
    )
    assert out is not None
    exp_nw = sum(1 for r in ROWS if r[3] is not None)
    assert [tuple(r) for r in out.collect()] == [
        (len(ROWS), sum(r[2] for r in ROWS), exp_nw,
         min(r[2] for r in ROWS), max(r[2] for r in ROWS))
    ]


def test_backfill_is_incremental_and_idempotent(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        append_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(_mk(spark), path, "p", **PROPS)
    man1 = read_manifest(path)
    # a later append inherits the properties → its partitions arrive
    # with stats; nothing is missing → backfill commits NOTHING
    append_snapshot(
        path,
        spark.createDataFrame([(100, "p9", 990, 9)], DDL),
        "p",
    )
    v = backfill_table_stats(spark, path)
    assert v == 2  # unchanged: no third version
    # drop one partition's bloom by re-declaring… instead simulate a
    # pre-upgrade partition: clear properties, append, re-declare
    alter_table_properties(spark, path, bloom_cols=None)
    append_snapshot(
        path,
        spark.createDataFrame([(200, "p8", 880, 8)], DDL),
        "p",
    )
    alter_table_properties(spark, path, bloom_cols=["k"])
    man_pre = read_manifest(path)
    assert "k" not in (man_pre["blooms"].get("p=p8") or {})
    v2 = backfill_table_stats(spark, path)
    man_post = read_manifest(path, v2)
    assert "k" in man_post["blooms"]["p=p8"]
    # pre-existing entries byte-identical (never recomputed/overwritten)
    for p, e in man1["stats"].items():
        assert man_post["stats"][p] == e
    for p, e in man1["blooms"].items():
        assert man_post["blooms"][p] == e


def test_backfill_multicol_spec(spark, tmp_path):
    path = str(tmp_path / "tm")
    df = spark.createDataFrame(
        [(i, f"d{i % 2}", "web" if i % 3 else "api", i * 10)
         for i in range(1, 13)],
        "k bigint, day string, source string, v bigint",
    )
    write_snapshot(df, path, ["day", "source"])
    alter_table_properties(
        spark, path, stats_cols=["v", "v::sum"], bloom_cols=["k"]
    )
    backfill_table_stats(spark, path)
    man = read_manifest(path)
    for pname in man["partitions"]:
        assert man["stats"][pname]["v"][0] is not None
        assert f"v::sum" in man["stats"][pname]
        assert "k" in man["blooms"][pname]
    # and the composite GROUP BY now serves from metadata
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        answer_from_manifest,
    )

    out = answer_from_manifest(
        spark,
        "SELECT day, source, COUNT(*) AS n, SUM(v) AS s FROM t"
        " GROUP BY day, source",
        {"t": path},
    )
    assert out is not None and out.count() == len(man["partitions"])


def test_backfill_spec_component_bloom_typed(spark, tmp_path):
    # the readback scan recovers spec components as STRINGS (value
    # inference off); blooms must hash the TYPED value like the write
    # path does, or integral-component probes would false-negative —
    # twin-table equality pins bit-identical bitmaps
    df = spark.createDataFrame(
        [(i, i % 4, i * 10) for i in range(1, 25)],
        "k bigint, b bigint, v bigint",
    )
    props = dict(stats_cols=["v"], bloom_cols=["b", "k"])
    ref = str(tmp_path / "ref")
    write_snapshot(df, ref, "b", **props)
    tgt = str(tmp_path / "tgt")
    write_snapshot(df, tgt, "b")
    alter_table_properties(spark, tgt, **props)
    backfill_table_stats(spark, tgt)
    ref_b = read_manifest(ref)["blooms"]
    tgt_b = read_manifest(tgt)["blooms"]
    for p in ref_b:
        assert tgt_b[p]["b"] == ref_b[p]["b"]
        assert tgt_b[p]["k"] == ref_b[p]["k"]
    # and the typed probe actually keeps the right partition
    hit = read_snapshot(spark, tgt, point_lookups={"b": 2})
    assert sorted({r["b"] for r in hit.collect()}) == [2]


def test_backfill_refusals(spark, tmp_path):
    path = str(tmp_path / "tr")
    write_snapshot(_mk(spark), path, "p", stats_cols=["v"])
    delete_where(spark, path, F.col("k") == 3, mode="merge-on-read", key="k")
    with pytest.raises(ValueError, match="tombstone"):
        backfill_table_stats(spark, path)
    path2 = str(tmp_path / "tr2")
    write_snapshot(_mk(spark), path2, "p", stats_cols=["v"])
    evolve_snapshot_schema(path2, renames={"w": "w2"})
    with pytest.raises(ValueError, match="rename"):
        backfill_table_stats(spark, path2)
    path3 = str(tmp_path / "tr3")
    write_snapshot(_mk(spark), path3, "p", stats_cols=["v"])
    evolve_partition_spec(path3, ["p", "k"])
    # still single-layout (no new-spec commit yet) is fine; make it mixed
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        append_snapshot,
    )

    append_snapshot(
        path3, spark.createDataFrame([(50, "p9", 1, 1)], DDL), ["p", "k"]
    )
    with pytest.raises(ValueError, match="retired partition spec"):
        backfill_table_stats(spark, path3)
