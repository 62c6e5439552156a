"""Metadata-SQL over MULTI-COLUMN partition specs (round 11): the
grammar serves conjunctive eq/IN restrictions on several spec
components (each at its own directory level) and composite GROUP BY —
all from one manifest read, zero data pages. Refusals stay loud-by-
fallback: anything unprovable returns None and the caller scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
    answer_from_manifest,
    parse_metadata_select,
)
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    delete_where,
    write_snapshot,
)

ROWS = [(i, f"d{i % 3}", "web" if i % 2 else "api", i * 10)
        for i in range(1, 25)]


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(
            ROWS, "k bigint, day string, source string, v bigint"
        ),
        path,
        ["day", "source"],
        stats_cols=["v", "v::sum"],
    )
    return path


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_conj_eq_eq_all_aggregates(spark, tbl):
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n, SUM(v) AS s, MIN(v) AS lo, MAX(v) AS hi"
        " FROM t WHERE day = 'd1' AND source = 'web'",
        {"t": tbl},
    )
    assert out is not None
    sel = [r for r in ROWS if r[1] == "d1" and r[2] == "web"]
    assert _rows(out) == [
        (len(sel), sum(r[3] for r in sel),
         min(r[3] for r in sel), max(r[3] for r in sel))
    ]


def test_conj_in_eq(spark, tbl):
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n FROM t"
        " WHERE day IN ('d1', 'd2') AND source = 'api'",
        {"t": tbl},
    )
    sel = [r for r in ROWS if r[1] in ("d1", "d2") and r[2] == "api"]
    assert _rows(out) == [(len(sel),)]


def test_conj_absent_member_contributes_zero(spark, tbl):
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n FROM t WHERE day = 'd9' AND source = 'web'",
        {"t": tbl},
    )
    assert _rows(out) == [(0,)]


def test_conj_refusals(spark, tbl):
    # non-spec column in the conjunction: unprovable → scan
    assert answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n FROM t WHERE day = 'd1' AND v = 10",
        {"t": tbl},
    ) is None
    # repeated column never parses as conj
    assert parse_metadata_select(
        "SELECT COUNT(*) AS n FROM t WHERE day = 'd1' AND day = 'd2'"
    ) is None


def test_group_by_composite(spark, tbl):
    out = answer_from_manifest(
        spark,
        "SELECT day, source, COUNT(*) AS n, SUM(v) AS s, AVG(v) AS a,"
        " MIN(v) AS lo, MAX(v) AS hi FROM t GROUP BY day, source",
        {"t": tbl},
    )
    assert out is not None
    exp = {}
    for _k, d, s, v in ROWS:
        e = exp.setdefault((d, s), [])
        e.append(v)
    want = sorted(
        (d, s, len(vs), sum(vs), sum(vs) / len(vs), min(vs), max(vs))
        for (d, s), vs in exp.items()
    )
    assert _rows(out) == want


def test_group_by_composite_restricted_ordered(spark, tbl):
    out = answer_from_manifest(
        spark,
        "SELECT day, source, COUNT(*) AS n FROM t"
        " WHERE source = 'api' GROUP BY day, source"
        " ORDER BY day DESC LIMIT 2",
        {"t": tbl},
    )
    got = [tuple(r) for r in out.collect()]
    assert got == [("d2", "api", 4), ("d1", "api", 4)]


def test_group_by_composite_having(spark, tbl):
    out = answer_from_manifest(
        spark,
        "SELECT day, source, SUM(v) AS s FROM t GROUP BY day, source"
        " HAVING s > 500",
        {"t": tbl},
    )
    exp = {}
    for _k, d, s, v in ROWS:
        exp[(d, s)] = exp.get((d, s), 0) + v
    want = sorted((d, s, t) for (d, s), t in exp.items() if t > 500)
    assert _rows(out) == want


def test_group_by_composite_conj_where(spark, tbl):
    out = answer_from_manifest(
        spark,
        "SELECT day, source, COUNT(*) AS n FROM t"
        " WHERE day IN ('d0', 'd1') AND source = 'web'"
        " GROUP BY day, source",
        {"t": tbl},
    )
    assert _rows(out) == [("d0", "web", 4), ("d1", "web", 4)]


def test_group_by_composite_refusals(spark, tbl):
    # non-spec group column → scan
    assert answer_from_manifest(
        spark, "SELECT day, v, COUNT(*) AS n FROM t GROUP BY day, v",
        {"t": tbl},
    ) is None
    # sketch items don't parse under composite GROUP BY
    assert parse_metadata_select(
        "SELECT day, source, APPROX_COUNT_DISTINCT(k) AS d FROM t"
        " GROUP BY day, source"
    ) is None
    # a bare column outside the group list never parses
    assert parse_metadata_select(
        "SELECT day, v, COUNT(*) AS n FROM t GROUP BY day, source"
    ) is None


def test_conjrange_hybrid(spark, tbl):
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        hybrid_range_count,
    )

    out = hybrid_range_count(
        spark,
        "SELECT COUNT(*) AS n, SUM(v) AS s, MIN(v) AS lo, MAX(v) AS hi"
        " FROM t WHERE day = 'd1' AND source = 'web'"
        " AND v BETWEEN 40 AND 200",
        {"t": tbl},
    )
    assert out is not None
    sel = [
        r[3]
        for r in ROWS
        if r[1] == "d1" and r[2] == "web" and 40 <= r[3] <= 200
    ]
    assert [tuple(r) for r in out.collect()] == [
        (len(sel), sum(sel), min(sel), max(sel))
    ]
    # IN members compose; BETWEEN's own AND survives the split
    out2 = hybrid_range_count(
        spark,
        "SELECT COUNT(*) AS n FROM t"
        " WHERE day IN ('d0', 'd2') AND source = 'api' AND v > 100",
        {"t": tbl},
    )
    exp = len(
        [r for r in ROWS if r[1] in ("d0", "d2") and r[2] == "api"
         and r[3] > 100]
    )
    assert [tuple(r) for r in out2.collect()] == [(exp,)]
    # the pure-metadata tier refuses the shape (boundary needs a scan)
    assert answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n FROM t"
        " WHERE day = 'd1' AND source = 'web' AND v BETWEEN 40 AND 200",
        {"t": tbl},
    ) is None
    # a non-spec membership column refuses to the full scan
    assert hybrid_range_count(
        spark,
        "SELECT COUNT(*) AS n FROM t"
        " WHERE day = 'd1' AND k = 3 AND v BETWEEN 40 AND 200",
        {"t": tbl},
    ) is None


def test_tombstones_refuse_values_not_counts(spark, tbl):
    delete_where(
        spark, tbl, F.col("k") == 4, mode="merge-on-read", key="k"
    )
    # COUNT stays exact (suppressed counts are netted in the manifest)
    out = answer_from_manifest(
        spark,
        "SELECT day, source, COUNT(*) AS n FROM t GROUP BY day, source",
        {"t": tbl},
    )
    exp = {}
    for k, d, s, _v in ROWS:
        if k != 4:
            exp[(d, s)] = exp.get((d, s), 0) + 1
    assert _rows(out) == sorted((d, s, n) for (d, s), n in exp.items())
    # value-dependent items refuse: the suppressed row may be the extreme
    assert answer_from_manifest(
        spark,
        "SELECT day, source, MAX(v) AS hi FROM t GROUP BY day, source",
        {"t": tbl},
    ) is None
    assert answer_from_manifest(
        spark,
        "SELECT MIN(v) AS lo FROM t WHERE day = 'd1' AND source = 'api'",
        {"t": tbl},
    ) is None
