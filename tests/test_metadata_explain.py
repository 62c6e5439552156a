"""EXPLAIN for the metadata-SQL tiers (explain_metadata_sql): the
scan-planning decision as a one-row frame, computed WITHOUT reading a
single data page. The routing is the same code path the answering
tiers run, so the counts here are pinned against the real provers —
drift between EXPLAIN and execution is structurally impossible and
these tests prove it stays that way."""

from __future__ import annotations

import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
    answer_from_manifest,
    explain_metadata_sql,
    hybrid_range_count,
)
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    append_snapshot,
    range_count_pruned,
    write_snapshot,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    # 4 partitions (bu = id // 500) x 2 files, k clustered, x summed
    df = spark.range(0, 2000, 1, 8).select(
        F.col("id").alias("k"),
        (F.col("id") / 500).cast("long").alias("bu"),
        (F.col("id") * 3).alias("x"),
    )
    path = str(tmp_path / "t")
    write_snapshot(df, path, "bu", stats_cols=["k", "x", "x::sum"])
    return path


def _row(spark, tbl, sql, **kw):
    return explain_metadata_sql(spark, sql, {"t": tbl}, **kw).collect()[0]


def test_tier_labels(spark, tbl):
    assert _row(spark, tbl, "SELECT COUNT(*) AS n FROM t")["tier"] == "metadata"
    assert (
        _row(spark, tbl, "SELECT COUNT(*) AS n FROM t WHERE bu = 2")[
            "partitions_metadata"
        ]
        == 1
    )
    h = _row(
        spark, tbl, "SELECT COUNT(*) AS n FROM t WHERE k BETWEEN 250 AND 1250"
    )
    assert h["tier"] == "hybrid"
    assert (h["partitions_metadata"], h["partitions_scanned"]) == (1, 2)
    assert (h["files_scanned"], h["files_total"]) == (3, 4)
    s = _row(spark, tbl, "SELECT AVG(x) AS a FROM t WHERE x <> 5")
    assert s["tier"] == "scan"
    assert s["partitions_scanned"] == 4
    assert s["files_total"] == 8


def test_explain_matches_execution(spark, tbl):
    # the counts EXPLAIN reports are the counts the real prover uses
    out = range_count_pruned(spark, tbl, "k", lo=250, hi=1250)
    h = _row(
        spark, tbl, "SELECT COUNT(*) AS n FROM t WHERE k BETWEEN 250 AND 1250"
    )
    assert h["partitions_metadata"] == out["meta_partitions"]
    assert h["partitions_scanned"] == out["scanned_partitions"]
    assert h["files_scanned"] == out["scanned_files"]
    assert h["files_total"] == out["total_files"]
    # and the answering tier serves exactly where EXPLAIN says it does
    assert (
        answer_from_manifest(spark, "SELECT COUNT(*) AS n FROM t", {"t": tbl})
        is not None
    )
    assert (
        hybrid_range_count(
            spark,
            "SELECT COUNT(*) AS n FROM t WHERE k BETWEEN 250 AND 1250",
            {"t": tbl},
        )
        is not None
    )


def test_explain_reads_zero_data_pages(spark, tbl):
    # DELETE every parquet file: EXPLAIN still answers all three tiers
    for root, _dirs, files in os.walk(tbl):
        for f in files:
            if f.endswith(".parquet"):
                os.remove(Path(root) / f)
    for sql, tier in (
        ("SELECT COUNT(*) AS n FROM t", "metadata"),
        ("SELECT SUM(x) AS s FROM t WHERE k BETWEEN 250 AND 1250", "hybrid"),
        (
            "SELECT bu, COUNT(*) AS n FROM t WHERE k BETWEEN 250 AND 1250 "
            "GROUP BY bu",
            "hybrid",
        ),
        ("SELECT AVG(x) AS a FROM t WHERE x <> 5", "scan"),
    ):
        assert _row(spark, tbl, sql)["tier"] == tier


def test_explain_composes_with_time_travel(spark, tbl):
    src = spark.createDataFrame([(9000, 9, 0)], "k bigint, bu bigint, x bigint")
    append_snapshot(tbl, src, "bu")
    now = _row(spark, tbl, "SELECT COUNT(*) AS n FROM t")
    v1 = _row(
        spark, tbl, "SELECT COUNT(*) AS n FROM t FOR VERSION AS OF 1"
    )
    assert now["partitions_metadata"] == 5
    assert v1["partitions_metadata"] == 4


def test_unparseable_statement_attributes_the_scan(spark, tbl):
    r = _row(spark, tbl, "SELECT k, x FROM t WHERE x <> 5 ORDER BY k")
    assert r["tier"] == "scan"
    assert r["partitions_scanned"] == 4
    assert r["files_total"] == 8
