"""Metadata answers over MULTI-COLUMN partition specs (r9 verdict ask
#3, metadata half): eq / IN / GROUP BY are provable on ANY spec
component — restrictions match the component's own directory level,
groups merge member partitions' stats (counts/sums add, HLL registers
max, min/max nest). Every SQL answer here is asserted non-None (the
metadata tier served it, no scan) AND equal to the real scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
    answer_from_manifest,
)
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    manifest_aggregate,
    manifest_approx_distinct,
    manifest_column_count,
    manifest_column_sum,
    manifest_group_stats,
    manifest_partition_counts,
    manifest_range_count,
    read_snapshot,
    write_snapshot,
)

DDL = "k bigint, day string, source string, v bigint"

ROWS = [
    (1, "d1", "web", 10),
    (2, "d1", "api", 20),
    (3, "d1", "api", 25),
    (4, "d2", "web", 30),
    (5, "d2", "web", 35),
    (6, "d3", "api", 40),
]


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(ROWS, DDL),
        path,
        ["day", "source"],
        stats_cols=["v", "v::sum", "k::hll"],
    )
    return path


def _ans(spark, tbl, sql):
    df = answer_from_manifest(spark, sql, {"t": tbl})
    assert df is not None, f"metadata tier refused: {sql}"
    return df


def test_count_eq_on_each_component(spark, tbl):
    got = _ans(spark, tbl, "SELECT COUNT(*) AS n FROM t WHERE source = 'web'")
    assert got.collect()[0]["n"] == 3
    got = _ans(spark, tbl, "SELECT COUNT(*) AS n FROM t WHERE day = 'd1'")
    assert got.collect()[0]["n"] == 3
    # absent member: 0, the SQL semantics
    got = _ans(spark, tbl, "SELECT COUNT(*) AS n FROM t WHERE day = 'd9'")
    assert got.collect()[0]["n"] == 0


def test_count_in_on_second_component(spark, tbl):
    got = _ans(
        spark, tbl,
        "SELECT COUNT(*) AS n FROM t WHERE day IN ('d1', 'd3')",
    )
    assert got.collect()[0]["n"] == 4
    got = _ans(
        spark, tbl,
        "SELECT COUNT(*) AS n FROM t WHERE source IN ('api')",
    )
    assert got.collect()[0]["n"] == 3


def test_group_by_each_component(spark, tbl):
    got = {
        r["source"]: r["n"]
        for r in _ans(
            spark, tbl,
            "SELECT source, COUNT(*) AS n FROM t GROUP BY source",
        ).collect()
    }
    assert got == {"web": 3, "api": 3}
    got = {
        r["day"]: r["n"]
        for r in _ans(
            spark, tbl, "SELECT day, COUNT(*) AS n FROM t GROUP BY day"
        ).collect()
    }
    assert got == {"d1": 3, "d2": 2, "d3": 1}


def test_group_one_component_restrict_other(spark, tbl):
    got = {
        r["day"]: r["n"]
        for r in _ans(
            spark, tbl,
            "SELECT day, COUNT(*) AS n FROM t WHERE source = 'web' "
            "GROUP BY day",
        ).collect()
    }
    assert got == {"d1": 1, "d2": 2}
    # grouped SUM restricted by the other component
    got = {
        r["day"]: r["s"]
        for r in _ans(
            spark, tbl,
            "SELECT day, SUM(v) AS s FROM t WHERE source = 'api' "
            "GROUP BY day",
        ).collect()
    }
    assert got == {"d1": 45, "d3": 40}


def test_minmax_and_distinct(spark, tbl):
    row = _ans(
        spark, tbl,
        "SELECT MIN(day) AS lo, MAX(source) AS hi, MAX(v) AS mv FROM t",
    ).collect()[0]
    assert (row["lo"], row["hi"], row["mv"]) == ("d1", "web", 40)
    row = _ans(
        spark, tbl,
        "SELECT COUNT(DISTINCT source) AS nds, COUNT(DISTINCT day) AS ndd "
        "FROM t",
    ).collect()[0]
    assert (row["nds"], row["ndd"]) == (2, 3)
    got = sorted(
        r["day"] for r in _ans(spark, tbl, "SELECT DISTINCT day FROM t").collect()
    )
    assert got == ["d1", "d2", "d3"]
    # MIN/MAX of a spec component under eq on the OTHER component
    row = _ans(
        spark, tbl,
        "SELECT MAX(day) AS md FROM t WHERE source = 'web'",
    ).collect()[0]
    assert row["md"] == "d2"


def test_range_on_spec_component(spark, tbl):
    got = _ans(
        spark, tbl, "SELECT COUNT(*) AS n FROM t WHERE day >= 'd2'"
    )
    assert got.collect()[0]["n"] == 3
    assert (
        manifest_range_count(tbl, "day", lo="d2", where_partition=("source", "api"))
        == 1
    )


def test_manifest_functions_component_grouping(spark, tbl):
    assert manifest_partition_counts(tbl, group_col="source") == [
        ("api", 3),
        ("web", 3),
    ]
    assert manifest_partition_counts(
        tbl, group_col="day", where_partition=("source", "web")
    ) == [("d1", 1), ("d2", 2)]
    g = manifest_group_stats(tbl, ["v"], group_col="source")
    assert g == [("api", 3, {"v": (20, 40)}), ("web", 3, {"v": (10, 35)})]
    sums = manifest_column_sum(tbl, "v", by_partition=True, group_col="day")
    assert sums == [("d1", 55, 3), ("d2", 65, 2), ("d3", 40, 1)]
    counts = manifest_column_count(tbl, "v", by_partition=True, group_col="day")
    assert counts == [("d1", 3), ("d2", 2), ("d3", 1)]
    # HLL registers merge by max within the group: estimates stay sane
    ndv = dict(
        manifest_approx_distinct(tbl, "k", by_partition=True, group_col="source")
    )
    assert set(ndv) == {"api", "web"}
    assert all(1 <= e <= 6 for e in ndv.values())
    agg = manifest_aggregate(
        tbl, columns=["day", "source", "v"], where_partition=("day", "d2")
    )
    assert agg["n_rows"] == 2
    assert agg["columns"]["source"] == {"min": "web", "max": "web"}
    assert agg["columns"]["v"] == {"min": 30, "max": 35}


def test_answers_match_real_scan(spark, tbl):
    scan = read_snapshot(spark, tbl)
    for sql, expr in [
        (
            "SELECT COUNT(*) AS n FROM t WHERE source = 'web'",
            scan.where("source = 'web'").count(),
        ),
        (
            "SELECT SUM(v) AS s FROM t WHERE day IN ('d1', 'd2')",
            scan.where("day IN ('d1','d2')").agg(F.sum("v")).collect()[0][0],
        ),
    ]:
        got = answer_from_manifest(spark, sql, {"t": tbl})
        assert got is not None
        assert got.collect()[0][0] == expr
