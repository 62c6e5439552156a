"""The r9 verdict ask #6 grammar corners, unit-level:

(a) DISJUNCTIVE windows under GROUP BY — ``SELECT pcol, aggs WHERE
    col BETWEEN a AND b OR col BETWEEN c AND d GROUP BY pcol`` via
    per-interval ``range_group_multi`` passes merged exactly;
(b) a range conjoined with a NULL predicate — ``COUNT(*) WHERE col
    <range> AND other IS [NOT] NULL`` via the composed classifier
    ``range_null_count_pruned``.

Every hybrid answer is checked against the real scan; the pure
metadata tier must refuse both shapes (boundary scans are not
zero-data-page answers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
    answer_from_manifest,
    explain_metadata_sql,
    hybrid_range_count,
)
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    delete_where,
    range_null_count_pruned,
    read_snapshot,
    write_snapshot,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    # p in 0..3; v clustered by p (v = p*100 + i); w NULL every 3rd row
    path = str(tmp_path / "t")
    rows = [
        (p * 100 + i, p, (p * 100 + i) if (p + i) % 3 else None)
        for p in range(4)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "v bigint, p bigint, w bigint")
    write_snapshot(df, path, "p", stats_cols=["v", "w", "v::sum"])
    return path


def _scan(spark, tbl):
    return read_snapshot(spark, tbl)


def test_grouped_or_windows_match_scan(spark, tbl):
    sql = (
        "SELECT p, COUNT(*) AS n, SUM(v) AS s FROM t "
        "WHERE v BETWEEN 10 AND 120 OR v BETWEEN 300 AND 315 GROUP BY p"
    )
    got = hybrid_range_count(spark, sql, {"t": tbl})
    assert got is not None
    exp = {
        (r["p"]): (r["n"], r["s"])
        for r in _scan(spark, tbl)
        .where("(v BETWEEN 10 AND 120) OR (v BETWEEN 300 AND 315)")
        .groupBy("p")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert {r["p"]: (r["n"], r["s"]) for r in got.collect()} == exp
    # the pure metadata tier refuses the shape (boundary scan needed)
    assert answer_from_manifest(spark, sql, {"t": tbl}) is None


def test_grouped_or_windows_merge_overlaps(spark, tbl):
    # overlapping windows collapse before the per-interval passes: the
    # answer equals the scan of the UNION, with no double counting
    sql = (
        "SELECT p, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi FROM t "
        "WHERE v BETWEEN 100 AND 220 OR v BETWEEN 200 AND 260 GROUP BY p"
    )
    got = hybrid_range_count(spark, sql, {"t": tbl})
    exp = {
        r["p"]: (r["n"], r["lo"], r["hi"])
        for r in _scan(spark, tbl)
        .where("v BETWEEN 100 AND 260")
        .groupBy("p")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert {
        r["p"]: (r["n"], r["lo"], r["hi"]) for r in got.collect()
    } == exp


def test_grouped_or_windows_order_limit(spark, tbl):
    sql = (
        "SELECT p, COUNT(*) AS n FROM t "
        "WHERE v BETWEEN 0 AND 115 OR v BETWEEN 305 AND 329 "
        "GROUP BY p ORDER BY n DESC LIMIT 2"
    )
    got = hybrid_range_count(spark, sql, {"t": tbl})
    rows = [(r["p"], r["n"]) for r in got.collect()]
    assert rows == [(0, 30), (3, 25)]


def test_range_null_count_matches_scan(spark, tbl):
    for sql, cond in [
        (
            "SELECT COUNT(*) AS n FROM t WHERE v BETWEEN 50 AND 250 "
            "AND w IS NULL",
            "v BETWEEN 50 AND 250 AND w IS NULL",
        ),
        (
            "SELECT COUNT(*) AS n FROM t WHERE v > 200 AND w IS NOT NULL",
            "v > 200 AND w IS NOT NULL",
        ),
    ]:
        got = hybrid_range_count(spark, sql, {"t": tbl})
        assert got is not None, sql
        exp = _scan(spark, tbl).where(cond).count()
        assert got.collect()[0]["n"] == exp, sql
        assert answer_from_manifest(spark, sql, {"t": tbl}) is None


def test_range_null_same_column_shortcuts(spark, tbl):
    # range already rejects NULLs: IS NULL conjoined is constant 0,
    # IS NOT NULL is the plain hybrid range count
    got = hybrid_range_count(
        spark,
        "SELECT COUNT(*) AS n FROM t WHERE w > 100 AND w IS NULL",
        {"t": tbl},
    )
    assert got.collect()[0]["n"] == 0
    got = hybrid_range_count(
        spark,
        "SELECT COUNT(*) AS n FROM t WHERE w > 100 AND w IS NOT NULL",
        {"t": tbl},
    )
    assert got.collect()[0]["n"] == _scan(spark, tbl).where("w > 100").count()


def test_range_null_classification(spark, tbl):
    # interior partitions (fully inside, zero range nulls) answer from
    # metadata; the boundary partition scans — visible in EXPLAIN
    exp = explain_metadata_sql(
        spark,
        "SELECT COUNT(*) AS n FROM t WHERE v BETWEEN 100 AND 215 "
        "AND w IS NULL",
        {"t": tbl},
    ).collect()[0]
    assert exp["tier"] == "hybrid"
    assert exp["partitions_metadata"] == 1  # p=1 ([100,129]) fully inside
    assert exp["partitions_scanned"] == 1  # p=2 ([200,229]) boundary at 215


def test_range_null_tombstones_scan_not_wrong(spark, tbl):
    delete_where(
        spark, tbl, (F.col("p") == 1) & (F.col("v") % 7 == 0),
        mode="merge-on-read", key="v",
    )
    sql = (
        "SELECT COUNT(*) AS n FROM t WHERE v BETWEEN 50 AND 250 "
        "AND w IS NULL"
    )
    got = hybrid_range_count(spark, sql, {"t": tbl})
    exp = (
        _scan(spark, tbl)
        .where("v BETWEEN 50 AND 250 AND w IS NULL")
        .count()
    )
    assert got.collect()[0]["n"] == exp


def test_prover_direct_and_aggregate_guard(spark, tbl):
    out = range_null_count_pruned(
        spark, tbl, "v", "w", lo=100, hi=250, is_not=True
    )
    exp = (
        _scan(spark, tbl)
        .where("v BETWEEN 100 AND 250 AND w IS NOT NULL")
        .count()
    )
    assert out["count"] == exp
    assert out["meta_partitions"] >= 1
    # non-COUNT items under the conjunction refuse at parse time
    assert (
        hybrid_range_count(
            spark,
            "SELECT SUM(v) AS s FROM t WHERE v > 3 AND w IS NULL",
            {"t": tbl},
        )
        is None
    )
