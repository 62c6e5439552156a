"""metadata_sql: strict-grammar SELECTs answered from snapshot
manifests — scan-identical values and types, zero data-file access,
refusal (None) for anything not provably metadata-answerable."""

from __future__ import annotations

import datetime
from pathlib import Path

import pytest

from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
    answer_from_manifest,
    parse_metadata_select,
)
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    delete_where,
    write_snapshot,
)


# ---------------------------------------------------------------- parse
def test_parse_accepts_the_strict_grammar():
    p = parse_metadata_select(
        "SELECT COUNT(*) AS n, MIN(amt), max(ts) AS last FROM t;"
    )
    assert p == {
        "table": "t",
        "items": [
            ("count", None, "n"),
            ("min", "amt", "min_amt"),
            ("max", "ts", "last"),
        ],
        "where": None,
    }
    q = parse_metadata_select("SELECT COUNT(*) FROM t WHERE day = '2024-01-01'")
    assert q["where"] == ("day", "'2024-01-01'")
    assert parse_metadata_select("SELECT COUNT(*) FROM t WHERE p = 10")[
        "where"
    ] == ("p", "10")


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT COUNT(*) FROM t WHERE x > 1",  # non-equality WHERE: scan
        "SELECT COUNT(*) FROM t GROUP BY x",
        "SELECT COUNT(x) FROM t",  # null-skipping: not num_rows
        "SELECT SUM(x) FROM t",  # needs data
        "SELECT MIN(x + 1) FROM t",  # expression
        "SELECT COUNT(*) FROM t JOIN u ON 1=1",
        "SELECT COUNT(*), COUNT(*) FROM t",  # duplicate output names
        "SELECT * FROM t",
    ],
)
def test_parse_refuses_what_it_cannot_prove(sql):
    assert parse_metadata_select(sql) is None


# --------------------------------------------------------------- answer
@pytest.fixture()
def tbl(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, 10.0, datetime.datetime(2024, 1, 2, 3, 4, 5), 10),
            (2, 99.5, datetime.datetime(2024, 6, 7, 8, 9, 10), 10),
            (3, 0.25, datetime.datetime(2023, 12, 31, 23, 59, 59), 20),
        ],
        "k long, amt double, ts timestamp, p long",
    )
    path = str(tmp_path / "tbl")
    write_snapshot(df, path, "p", stats_cols=["amt", "ts"])
    return path


def test_answer_matches_scan_values_and_types(spark, tbl):
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n_rows, MIN(amt) AS lo, MAX(amt) AS hi,"
        " MAX(ts) AS last_ts FROM t",
        {"t": tbl},
    )
    assert dict(out.dtypes) == {
        "n_rows": "bigint",
        "lo": "double",
        "hi": "double",
        "last_ts": "timestamp",
    }
    r = out.collect()[0]
    assert (r.n_rows, r.lo, r.hi) == (3, 0.25, 99.5)
    assert r.last_ts == datetime.datetime(2024, 6, 7, 8, 9, 10)


def test_answer_reads_no_data_files(spark, tbl):
    # physically remove every data file: the manifest answer must not
    # notice, proving the zero-data-read claim rather than asserting it
    for f in Path(tbl).rglob("*.parquet"):
        f.unlink()
    out = answer_from_manifest(
        spark, "SELECT COUNT(*) AS n, MIN(amt) AS lo FROM t", {"t": tbl}
    ).collect()[0]
    assert (out.n, out.lo) == (3, 0.25)


def test_unknown_table_and_unstatted_column_fall_through(spark, tbl):
    assert (
        answer_from_manifest(spark, "SELECT COUNT(*) FROM other", {"t": tbl})
        is None
    )
    # k is not in stats_cols: manifest_aggregate would fall back to
    # footers (data-file access) — still a correct answer
    out = answer_from_manifest(
        spark, "SELECT MIN(k) AS lo FROM t", {"t": tbl}
    ).collect()[0]
    assert out.lo == 1


def test_emptied_table_yields_count_zero_and_nulls(spark, tbl):
    delete_where(spark, tbl, "k IS NOT NULL")
    out = answer_from_manifest(
        spark, "SELECT COUNT(*) AS n, MIN(amt) AS lo FROM t", {"t": tbl}
    ).collect()[0]
    assert out.n == 0 and out.lo is None


def test_partition_column_extremes_answered(spark, tbl):
    # the most-polled metadata query there is: MAX(partition_col)
    out = answer_from_manifest(
        spark, "SELECT MAX(p) AS latest, MIN(p) AS earliest FROM t", {"t": tbl}
    ).collect()[0]
    assert (out.latest, out.earliest) == (20, 10)


# --------------------------------------------------------- parse fuzz

from hypothesis import given, settings
from hypothesis import strategies as st

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)
_valid_item = st.one_of(
    st.just("COUNT(*)"),
    _ident.map(lambda c: f"MIN({c})"),
    _ident.map(lambda c: f"MAX({c})"),
)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_parser_never_crashes_on_arbitrary_text(sql):
    # the refusal gate must refuse or parse — never raise
    out = parse_metadata_select(sql)
    assert out is None or (out["table"] and out["items"])


@settings(max_examples=50, deadline=None)
@given(st.lists(_valid_item, min_size=1, max_size=4), _ident)
def test_parser_accepts_exactly_the_generated_grammar(items, table):
    sql = f"SELECT {', '.join(items)} FROM {table}"
    out = parse_metadata_select(sql)
    if out is None:
        # only legal refusal: duplicate output names (e.g. two COUNT(*))
        names = [
            "count_star" if i == "COUNT(*)" else
            i[:3].lower() + "_" + i[4:-1]
            for i in items
        ]
        assert len(set(names)) != len(names)
    else:
        assert out["table"] == table and len(out["items"]) == len(items)
        # appending a WHERE must flip it to refusal
        assert parse_metadata_select(sql + " WHERE x > 1") is None


def test_partition_equality_where_is_metadata_answered(spark, tbl):
    from pathlib import Path

    # prune to ONE partition from the manifest alone — proven by
    # deleting every data file first
    for f in Path(tbl).rglob("*.parquet"):
        f.unlink()
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n, MAX(amt) AS hi FROM t WHERE p = 10",
        {"t": tbl},
    ).collect()[0]
    assert (out.n, out.hi) == (2, 99.5)
    # equality on a value with no partition: zero rows, NULL extremes
    none = answer_from_manifest(
        spark, "SELECT COUNT(*) AS n, MAX(amt) AS hi FROM t WHERE p = 77",
        {"t": tbl},
    ).collect()[0]
    assert (none.n, none.hi) == (0, None)
    # non-partition column or type-mismatched literal: refuse → scan
    assert (
        answer_from_manifest(
            spark, "SELECT COUNT(*) FROM t WHERE k = 1", {"t": tbl}
        )
        is None
    )
    assert (
        answer_from_manifest(
            spark, "SELECT COUNT(*) FROM t WHERE p = 'ten'", {"t": tbl}
        )
        is None
    )
