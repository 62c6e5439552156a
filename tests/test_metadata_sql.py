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
        "group_by": None,
        "having": None,
        "order_by": None,
        "limit": None,
        "as_of": None,
    }
    q = parse_metadata_select("SELECT COUNT(*) FROM t WHERE day = '2024-01-01'")
    assert q["where"] == ("eq", "day", "'2024-01-01'")
    assert parse_metadata_select("SELECT COUNT(*) FROM t WHERE p = 10")[
        "where"
    ] == ("eq", "p", "10")


def test_parse_accepts_range_and_group_by_forms():
    # range predicates: comparisons and BETWEEN, COUNT(*) only
    assert parse_metadata_select("SELECT COUNT(*) FROM t WHERE x > 1")[
        "where"
    ] == ("range", "x", "1", None, True, False)
    assert parse_metadata_select("SELECT COUNT(*) AS n FROM t WHERE x <= 9.5")[
        "where"
    ] == ("range", "x", None, "9.5", False, False)
    assert parse_metadata_select("SELECT COUNT(*) FROM t WHERE x < 5")[
        "where"
    ] == ("range", "x", None, "5", False, True)
    assert parse_metadata_select(
        "SELECT COUNT(*) FROM t WHERE x BETWEEN 10 AND 29"
    )["where"] == ("range", "x", "10", "29", False, False)
    # group-by: the grouped column must appear in the select list
    g = parse_metadata_select(
        "SELECT day, COUNT(*) AS n FROM t GROUP BY day"
    )
    assert g["group_by"] == "day"
    assert g["items"] == [("group", "day", "day"), ("count", None, "n")]
    # group-by composed with partition equality
    ge = parse_metadata_select(
        "SELECT day AS d, COUNT(*) FROM t WHERE day = 10 GROUP BY day"
    )
    assert ge["where"] == ("eq", "day", "10") and ge["group_by"] == "day"


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT COUNT(*) FROM t GROUP BY x",  # grouped col not selected
        "SELECT y, COUNT(*) FROM t GROUP BY x",  # bare col ≠ grouped col
        "SELECT x FROM t",  # bare column without GROUP BY
        # range+group now PARSES (grouped hybrid tier); sketch items
        # under range+group still refuse:
        "SELECT x, APPROX_COUNT_DISTINCT(y) FROM t WHERE y > 1 GROUP BY x",
        "SELECT COUNT(*) FROM t WHERE x <> 1",  # unsupported operator
        "SELECT COUNT(*) FROM t WHERE x > 1 AND x < 9",  # conjunctions
        "SELECT COUNT(*) FROM t WHERE x LIKE 'a%'",
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

from hypothesis import HealthCheck, given, settings
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
        # appending an unsupported predicate must flip it to refusal
        assert parse_metadata_select(sql + " WHERE x <> 1") is None
        assert parse_metadata_select(sql + " WHERE x > 1 AND x < 9") is None


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


# ------------------------------------ GROUP BY pcol / range COUNT


@pytest.fixture()
def bucketed(spark, tmp_path):
    # disjoint per-partition k ranges (b = k // 10): aligned predicates
    # prove full containment, misaligned ones force partial overlap
    rows = [(b * 10 + i, b) for b in range(3) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, b long")
    path = str(tmp_path / "bucketed")
    write_snapshot(df, path, "b", stats_cols=["k"])
    return path


def test_group_by_partition_answered_zero_data_pages(spark, tbl):
    for f in Path(tbl).rglob("*.parquet"):
        f.unlink()
    out = answer_from_manifest(
        spark, "SELECT p, COUNT(*) AS n FROM t GROUP BY p", {"t": tbl}
    )
    assert dict(out.dtypes) == {"p": "bigint", "n": "bigint"}
    assert {(r.p, r.n) for r in out.collect()} == {(10, 2), (20, 1)}
    # composed with partition equality
    one = answer_from_manifest(
        spark,
        "SELECT p AS day, COUNT(*) AS n FROM t WHERE p = 10 GROUP BY p",
        {"t": tbl},
    ).collect()
    assert [(r.day, r.n) for r in one] == [(10, 2)]
    # grouping by a non-partition column: refuse → scan
    assert (
        answer_from_manifest(
            spark, "SELECT k, COUNT(*) FROM t GROUP BY k", {"t": tbl}
        )
        is None
    )


def test_range_count_answered_and_refused(spark, bucketed):
    for f in Path(bucketed).rglob("*.parquet"):
        f.unlink()
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n FROM t WHERE k BETWEEN 10 AND 29",
        {"t": bucketed},
    ).collect()[0]
    assert out.n == 20
    # open-ended comparison, strict bound at a partition edge
    assert answer_from_manifest(
        spark, "SELECT COUNT(*) AS n FROM t WHERE k > 9", {"t": bucketed}
    ).collect()[0].n == 20
    assert answer_from_manifest(
        spark, "SELECT COUNT(*) AS n FROM t WHERE k <= 9", {"t": bucketed}
    ).collect()[0].n == 10
    # range on the PARTITION column: one value per directory, always
    # provable from names alone
    assert answer_from_manifest(
        spark, "SELECT COUNT(*) AS n FROM t WHERE b >= 1", {"t": bucketed}
    ).collect()[0].n == 20
    # partial overlap: refuse → scan (15 splits bucket 1)
    assert (
        answer_from_manifest(
            spark,
            "SELECT COUNT(*) FROM t WHERE k BETWEEN 15 AND 29",
            {"t": bucketed},
        )
        is None
    )
    # quoted literal vs numeric column: type mismatch → refuse
    assert (
        answer_from_manifest(
            spark, "SELECT COUNT(*) FROM t WHERE k > 'a'", {"t": bucketed}
        )
        is None
    )


def test_range_count_unstatted_and_timestamp_columns_refuse(spark, tbl):
    # amt has stats but ts is timestamp-typed: ISO 'T' rendering is not
    # literal-comparable → refuse; k is un-statted → refuse
    assert (
        answer_from_manifest(
            spark,
            "SELECT COUNT(*) FROM t WHERE ts > '2024-01-01 00:00:00'",
            {"t": tbl},
        )
        is None
    )
    assert (
        answer_from_manifest(
            spark, "SELECT COUNT(*) FROM t WHERE k > 1", {"t": tbl}
        )
        is None
    )


def test_group_by_with_extremes_zero_data_pages(spark, tbl):
    # per-group MIN/MAX = the per-partition stats entries, proven by
    # deleting every data file first (amt/ts are in stats_cols)
    for f in Path(tbl).rglob("*.parquet"):
        f.unlink()
    out = answer_from_manifest(
        spark,
        "SELECT p, COUNT(*) AS n, MIN(amt) AS lo, MAX(amt) AS hi,"
        " MAX(ts) AS last_ts FROM t GROUP BY p",
        {"t": tbl},
    )
    assert dict(out.dtypes) == {
        "p": "bigint", "n": "bigint", "lo": "double", "hi": "double",
        "last_ts": "timestamp",
    }
    got = {(r.p, r.n, r.lo, r.hi) for r in out.collect()}
    assert got == {(10, 2, 10.0, 99.5), (20, 1, 0.25, 0.25)}
    # unknown column refuses → scan
    assert (
        answer_from_manifest(
            spark, "SELECT p, MIN(ghost) FROM t GROUP BY p", {"t": tbl}
        )
        is None
    )
    # MIN of the grouped column itself is nonsense-by-construction
    assert (
        answer_from_manifest(
            spark, "SELECT p, MIN(p) FROM t GROUP BY p", {"t": tbl}
        )
        is None
    )


def test_group_by_extremes_refuse_on_tombstones(spark, tbl):
    delete_where(spark, tbl, "k = 1", mode="merge-on-read", key="k")
    # counts still answerable, extremes refuse
    assert answer_from_manifest(
        spark, "SELECT p, COUNT(*) AS n FROM t GROUP BY p", {"t": tbl}
    ) is not None
    assert (
        answer_from_manifest(
            spark, "SELECT p, MIN(amt) AS lo FROM t GROUP BY p", {"t": tbl}
        )
        is None
    )


# ------------------------------------------------- SQL time travel


def test_as_of_version_answers_old_manifest(spark, tbl):
    delete_where(spark, tbl, "k = 1")  # v2 drops one row
    now_ = answer_from_manifest(
        spark, "SELECT COUNT(*) AS n FROM t", {"t": tbl}
    ).collect()[0]
    old = answer_from_manifest(
        spark, "SELECT COUNT(*) AS n FROM t FOR VERSION AS OF 1", {"t": tbl}
    ).collect()[0]
    assert (now_.n, old.n) == (2, 3)
    # composes with the rest of the grammar
    grp = answer_from_manifest(
        spark,
        "SELECT p, COUNT(*) AS n FROM t FOR VERSION AS OF 1 GROUP BY p",
        {"t": tbl},
    ).collect()
    assert {(r.p, r.n) for r in grp} == {(10, 2), (20, 1)}
    # statement pin + caller pin is ambiguous and loud
    with pytest.raises(ValueError, match="pick one"):
        answer_from_manifest(
            spark, "SELECT COUNT(*) FROM t FOR VERSION AS OF 1",
            {"t": tbl}, version=2,
        )


def test_as_of_timestamp_resolves_commit_time(spark, tbl):
    import time

    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        resolve_as_of,
    )

    t_between = time.time()
    time.sleep(0.05)
    delete_where(spark, tbl, "k = 1")  # v2, committed after t_between
    assert resolve_as_of(tbl, t_between) == 1
    assert resolve_as_of(tbl, time.time()) == 2
    with pytest.raises(ValueError, match="no version"):
        resolve_as_of(tbl, 1.0)  # 1970: before the table existed
    # through the SQL front-end with an ISO string
    import datetime

    iso = datetime.datetime.fromtimestamp(t_between).isoformat(sep=" ")
    old = answer_from_manifest(
        spark,
        f"SELECT COUNT(*) AS n FROM t FOR TIMESTAMP AS OF '{iso}'",
        {"t": tbl},
    ).collect()[0]
    assert old.n == 3


def test_extract_as_of_strips_clause_for_scan_path():
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        extract_as_of,
    )

    clean, spec = extract_as_of(
        "SELECT k, amt FROM snapshot FOR VERSION AS OF 3 WHERE amt > 1"
    )
    assert clean == "SELECT k, amt FROM snapshot WHERE amt > 1"
    assert spec == {"version": 3}
    clean2, spec2 = extract_as_of(
        "SELECT * FROM t FOR TIMESTAMP AS OF '2026-01-01 00:00:00'"
    )
    assert clean2 == "SELECT * FROM t" and spec2 == {
        "timestamp": "2026-01-01 00:00:00"
    }
    assert extract_as_of("SELECT * FROM t") == ("SELECT * FROM t", None)
    with pytest.raises(ValueError, match="multiple"):
        extract_as_of(
            "SELECT * FROM a FOR VERSION AS OF 1 JOIN b FOR VERSION AS OF 2"
        )


def test_answers_are_single_partition(spark, tbl):
    # a metadata answer is a handful of rows; createDataFrame slices
    # it across defaultParallelism and a caller crossJoining two
    # answers then plans a 32x32 CartesianProduct task storm
    # (measured: three crossJoined answers = thousands of tasks).
    for sql in (
        "SELECT COUNT(*) AS n FROM t",
        "SELECT p, COUNT(*) AS n FROM t GROUP BY p",
    ):
        out = answer_from_manifest(spark, sql, {"t": tbl})
        assert out.rdd.getNumPartitions() == 1


def test_in_list_count_sums_member_partitions(spark, tbl):
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n FROM t WHERE p IN (10, 999)",
        {"t": tbl},
    )
    assert out.collect() == [(2,)]  # absent member contributes 0
    assert out.rdd.getNumPartitions() == 1
    # delete every data page: the manifest alone answered
    import shutil as _sh
    import os as _os

    _sh.rmtree(_os.path.join(tbl, "data"))
    assert answer_from_manifest(
        spark, "SELECT COUNT(*) AS n FROM t WHERE p IN (20)", {"t": tbl}
    ).collect() == [(1,)]


def test_in_list_group_by_filters_groups(spark, tbl):
    out = answer_from_manifest(
        spark,
        "SELECT p, COUNT(*) AS n, MAX(amt) AS hi FROM t"
        " WHERE p IN (10, 404) GROUP BY p",
        {"t": tbl},
    ).collect()
    assert [(r.p, r.n, r.hi) for r in out] == [(10, 2, 99.5)]


def test_in_list_refusals(spark, tbl):
    # MIN/MAX under IN now SERVES: per-member recorded extremes merge
    # exactly (p=10 holds amt 10.0 and 99.5)
    out = answer_from_manifest(
        spark, "SELECT MIN(amt) AS lo FROM t WHERE p IN (10)", {"t": tbl}
    )
    assert [tuple(r) for r in out.collect()] == [(10.0,)]
    # non-partition column
    assert (
        answer_from_manifest(
            spark, "SELECT COUNT(*) AS n FROM t WHERE k IN (1, 2)", {"t": tbl}
        )
        is None
    )
    # quoted literal against an integral partition → scan
    assert (
        answer_from_manifest(
            spark,
            "SELECT COUNT(*) AS n FROM t WHERE p IN ('10')",
            {"t": tbl},
        )
        is None
    )


def test_in_list_serves_ndv_and_quantile_sketches(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        manifest_approx_distinct,
        manifest_quantile,
        write_snapshot,
    )

    path = str(tmp_path / "insk")
    df = spark.createDataFrame(
        [(i, i % 5, i % 9, (i * 37) % 1000) for i in range(100)],
        "k long, p long, uid long, cents long",
    )
    write_snapshot(
        df, path, "p", stats_cols=["uid::hll", "cents::hist:100"]
    )
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n, APPROX_COUNT_DISTINCT(uid) AS u,"
        " APPROX_QUANTILE(cents, 50) AS med FROM t WHERE p IN (1, 3)",
        {"t": path},
    ).collect()[0]
    # the member merge must equal the eq-restricted answers combined
    assert out.n == 40
    import collections

    rows = [(i % 9, (i * 37) % 1000) for i in range(100) if i % 5 in (1, 3)]
    c = collections.Counter(v // 100 for _, v in rows)
    cum, med = 0, None
    for b in sorted(c):
        cum += c[b]
        if cum * 100 >= len(rows) * 50:
            med = b * 100
            break
    assert out.med == med
    assert 7 <= out.u <= 12  # 9 true distinct, HLL tolerance
    # API level: single-member IN == eq restriction, exactly
    assert manifest_approx_distinct(
        path, "uid", where_partition_in=("p", [1])
    ) == manifest_approx_distinct(path, "uid", where_partition=("p", 1))
    assert manifest_quantile(
        path, "cents", 90, where_partition_in=("p", [1])
    ) == manifest_quantile(path, "cents", 90, where_partition=("p", 1))
    # absent members contribute nothing (NDV of nothing = 0.0;
    # quantile of an empty selection refuses)
    assert manifest_approx_distinct(
        path, "uid", where_partition_in=("p", [404])
    ) == 0.0
    import pytest as _pt

    with _pt.raises(ValueError, match="no live partitions"):
        manifest_quantile(path, "cents", 50, where_partition_in=("p", [404]))
    # min/max under IN serves from the members' recorded extremes
    got = answer_from_manifest(
        spark,
        "SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM t WHERE p IN (1, 3)",
        {"t": path},
    )
    sel = [(i * 37) % 1000 for i in range(100) if i % 5 in (1, 3)]
    assert [tuple(r) for r in got.collect()] == [(min(sel), max(sel))]


def test_extract_as_of_skips_clause_inside_string_literal():
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        extract_as_of,
    )

    # a FOR ... AS OF sequence inside a quoted literal is data — the
    # old behavior carved it out of the literal and treated it as a
    # time-travel pin, corrupting the statement the CLI then ran
    sql = "SELECT * FROM t WHERE note = 'FOR VERSION AS OF 3'"
    assert extract_as_of(sql) == (sql, None)
    # a real clause coexisting with a literal one: only the real clause
    # strips, the literal survives byte-identical
    clean, spec = extract_as_of(
        "SELECT * FROM t FOR VERSION AS OF 2 "
        "WHERE note = 'FOR VERSION AS OF 3'"
    )
    assert spec == {"version": 2}
    assert clean == "SELECT * FROM t WHERE note = 'FOR VERSION AS OF 3'"
    # doubled-quote escapes keep the parity rule exact
    sql3 = "SELECT * FROM t WHERE note = 'it''s FOR VERSION AS OF 9'"
    assert extract_as_of(sql3) == (sql3, None)


def test_date_literals_canonicalized_before_metadata_compare(spark, tmp_path):
    # Manifest stats and hive partition dirs render dates as CANONICAL
    # ISO strings and the proofs compare lexically; a non-canonical
    # literal ('1994-1-2') must therefore be canonicalized — the old
    # lexical compare silently proved the wrong answer ('1994-1-2' >
    # '1994-01-03' lexically). Unparseable dates must refuse to the
    # scan, never answer.
    rows = [
        (i, datetime.date(1994, 1, 1 + i % 3), float(i)) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k long, d date, v double")
    path = str(tmp_path / "dtbl")
    write_snapshot(df, path, "d", stats_cols=["d"])

    def n(sql):
        out = answer_from_manifest(spark, sql, {"t": path})
        return None if out is None else out.collect()[0].n

    # partition-eq path: canonical and non-canonical literals agree
    assert n("SELECT COUNT(*) AS n FROM t WHERE d = '1994-01-02'") == 10
    assert n("SELECT COUNT(*) AS n FROM t WHERE d = '1994-1-2'") == 10
    # range path over date stats: every partition holds one exact date,
    # so containment is provable; < excludes the boundary partition
    assert n("SELECT COUNT(*) AS n FROM t WHERE d < '1994-01-02'") == 10
    assert n("SELECT COUNT(*) AS n FROM t WHERE d < '1994-1-2'") == 10
    # unparseable date literal: refusal (scan fallback), not an answer
    assert n("SELECT COUNT(*) AS n FROM t WHERE d = 'not-a-date'") is None
    assert n("SELECT COUNT(*) AS n FROM t WHERE d < 'not-a-date'") is None


def test_group_by_composes_with_in_list(spark, tmp_path):
    # the combined dashboard shape (r07 ask): GROUP BY pcol + IN-list
    # with COUNT / APPROX_COUNT_DISTINCT / APPROX_QUANTILE together —
    # exact per-group entries, IN filters groups, absent members
    # contribute no group
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        write_snapshot as _ws,
    )

    rows = []
    for i in range(300):
        p = i % 5
        rows.append((i, p, i % (3 + p * 4), (i + p * 1000) * 10))
    df = spark.createDataFrame(rows, "k long, p long, uid long, cents long")
    path = str(tmp_path / "gbin")
    _ws(df, path, "p", stats_cols=["uid::hll", "cents::hist:500"])
    out = answer_from_manifest(
        spark,
        "SELECT p, COUNT(*) AS n, APPROX_COUNT_DISTINCT(uid) AS u,"
        " APPROX_QUANTILE(cents, 50) AS med FROM t"
        " WHERE p IN (1, 3, 404) GROUP BY p",
        {"t": path},
    )
    assert out is not None
    got = {r.p: r for r in out.collect()}
    assert set(got) == {1, 3}  # 404 absent: no group, not an error
    # per-group NDV within HLL tolerance of the true 7 / 3 distinct
    assert abs(got[1].u - 7) < 1.0 and abs(got[3].u - 3) < 0.5
    assert got[1].n == 60 and got[3].n == 60
    # hist recipe: lower edge of the bucket holding the true median
    truth = {p: sorted((i + p * 1000) * 10 for i in range(300) if i % 5 == p)
             for p in (1, 3)}
    for p in (1, 3):
        med = truth[p][len(truth[p]) // 2 - 1]
        assert got[p].med <= med < got[p].med + 500
    # grouped MIN/MAX + IN also serves (group ≡ partition: exact)
    mm = answer_from_manifest(
        spark,
        "SELECT p, MIN(cents) AS lo, COUNT(*) AS n FROM t"
        " WHERE p IN (1, 3) GROUP BY p",
        {"t": path},
    )
    assert mm is not None and {r.p for r in mm.collect()} == {1, 3}


def test_count_col_skips_nulls_and_refuses_unprovable(spark, tmp_path):
    # COUNT(col) = live rows minus recorded null counts, per the
    # 3-element [min, max, nulls] stats entries; refusal whenever any
    # contributing partition cannot prove its null count
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        delete_where,
        manifest_column_count,
        write_snapshot as _ws,
    )

    rows = []
    for i in range(300):
        p = i % 5
        email = None if (p < 2 and i % 3 == 0) else f"u{i}"
        rows.append((i, p, email, i * 10))
    df = spark.createDataFrame(rows, "k long, p long, email string, cents long")
    path = str(tmp_path / "cc")
    _ws(df, path, "p", stats_cols=["email", "cents"])
    truth = {pp: sum(1 for (k, p, e, c) in rows if p == pp and e is not None)
             for pp in range(5)}

    def n(sql):
        out = answer_from_manifest(spark, sql, {"t": path})
        return None if out is None else [tuple(r) for r in out.collect()]

    assert n("SELECT COUNT(email) AS ce FROM t") == [(sum(truth.values()),)]
    assert n("SELECT COUNT(email) AS ce FROM t WHERE p = 1") == [(truth[1],)]
    assert n("SELECT COUNT(email) AS ce FROM t WHERE p IN (0, 1, 9)") == [
        (truth[0] + truth[1],)
    ]
    grouped = n("SELECT p, COUNT(email) AS ce FROM t GROUP BY p")
    assert dict(grouped) == truth
    # no-null column and the partition column itself
    assert n("SELECT COUNT(cents) AS c FROM t") == [(300,)]
    assert n("SELECT COUNT(p) AS c FROM t") == [(300,)]
    # refusals: unknown column, un-statted column, range WHERE
    assert n("SELECT COUNT(nope) AS x FROM t") is None
    assert n("SELECT COUNT(k) AS x FROM t") is None  # k not in stats_cols
    assert n("SELECT COUNT(email) AS x FROM t WHERE cents > 10") is None
    # API parity + MoR tombstones make the count unprovable
    assert manifest_column_count(path, "email") == sum(truth.values())
    from pyspark.sql import functions as F

    delete_where(
        spark, path, F.col("k") < 3, mode="merge-on-read", key="k"
    )
    assert n("SELECT COUNT(email) AS x FROM t") is None
    assert n("SELECT COUNT(p) AS c FROM t") == [(297,)]  # pcol: still exact


def test_order_by_limit_on_grouped_answers(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        write_snapshot as _ws,
    )

    # group sizes 10/20/30/40 with a tie pair at 40
    rows = (
        [(i, 0) for i in range(10)]
        + [(100 + i, 1) for i in range(20)]
        + [(200 + i, 2) for i in range(40)]
        + [(300 + i, 3) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "k long, p long")
    path = str(tmp_path / "topk")
    _ws(df, path, "p")

    def n(sql):
        out = answer_from_manifest(spark, sql, {"t": path})
        return None if out is None else [tuple(r) for r in out.collect()]

    # DESC with the documented tie-break (group col ascending)
    assert n(
        "SELECT p, COUNT(*) AS n FROM t GROUP BY p ORDER BY n DESC LIMIT 3"
    ) == [(2, 40), (3, 40), (1, 20)]
    assert n(
        "SELECT p, COUNT(*) AS n FROM t GROUP BY p ORDER BY n ASC LIMIT 1"
    ) == [(0, 10)]
    # ORDER BY the group column itself
    assert n(
        "SELECT p, COUNT(*) AS n FROM t GROUP BY p ORDER BY p DESC LIMIT 2"
    ) == [(3, 40), (2, 40)]
    # refusals: no GROUP BY, LIMIT without ORDER BY, non-output column
    assert n("SELECT COUNT(*) AS n FROM t ORDER BY n LIMIT 1") is None
    assert n("SELECT p, COUNT(*) AS n FROM t GROUP BY p LIMIT 2") is None
    assert (
        n("SELECT p, COUNT(*) AS n FROM t GROUP BY p ORDER BY zz LIMIT 1")
        is None
    )


def test_sum_avg_from_manifest(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        delete_where,
        manifest_column_sum,
        write_snapshot as _ws,
    )

    rows = []
    for i in range(300):
        p = i % 5
        cents = None if (p == 0 and i % 3 == 0) else (i * 7 + p)
        rows.append((i, p, cents))
    df = spark.createDataFrame(rows, "k long, p long, cents long")
    path = str(tmp_path / "sa")
    _ws(df, path, "p", stats_cols=["cents::sum"])
    truth_s = sum(c for (_, _, c) in rows if c is not None)
    truth_n = sum(1 for (_, _, c) in rows if c is not None)

    def n(sql):
        out = answer_from_manifest(spark, sql, {"t": path})
        return None if out is None else [tuple(r) for r in out.collect()]

    assert n("SELECT SUM(cents) AS s FROM t") == [(truth_s,)]
    # AVG replays the scan's float division exactly
    from pyspark.sql import functions as F

    scan = df.agg(F.avg("cents")).collect()[0][0]
    assert n("SELECT AVG(cents) AS a FROM t") == [(scan,)]
    # per-group and IN restriction merge by addition
    g = dict(
        (r[0], (r[1], r[2]))
        for r in (
            answer_from_manifest(
                spark,
                "SELECT p, SUM(cents) AS s, AVG(cents) AS a"
                " FROM t GROUP BY p",
                {"t": path},
            ).collect()
        )
    )
    for pp in range(5):
        vals = [c for (_, p, c) in rows if p == pp and c is not None]
        assert g[pp] == (sum(vals), float(sum(vals)) / float(len(vals)))
    s01 = [c for (_, p, c) in rows if p in (0, 1) and c is not None]
    assert n(
        "SELECT SUM(cents) AS s, AVG(cents) AS a FROM t WHERE p IN (0, 1)"
    ) == [(sum(s01), float(sum(s01)) / float(len(s01)))]
    # API pair + all-NULL selection = SQL NULL
    assert manifest_column_sum(path, "cents") == (truth_s, truth_n)
    assert n("SELECT SUM(cents) AS s FROM t WHERE p IN (404)") == [(None,)]
    assert n("SELECT AVG(cents) AS a FROM t WHERE p IN (404)") == [(None,)]
    # refusals: no ::sum entry, range WHERE, tombstones
    assert n("SELECT SUM(k) AS s FROM t") is None
    assert n("SELECT SUM(cents) AS s FROM t WHERE cents > 5") is None
    delete_where(spark, path, F.col("k") < 3, mode="merge-on-read", key="k")
    assert n("SELECT SUM(cents) AS s FROM t") is None


def test_sum_stats_reject_float_columns(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        write_snapshot as _ws,
    )

    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(20)], "k long, p long, v double"
    )
    with pytest.raises(ValueError, match="must be integral"):
        _ws(df, str(tmp_path / "f"), "p", stats_cols=["v::sum"])


# ------------------------------------------- metadata ≡ scan fuzz
@pytest.fixture(scope="module")
def _eqv(spark, tmp_path_factory):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot as _ws,
    )

    rows = []
    for i in range(240):
        p = i % 4
        email = None if (p < 2 and i % 3 == 0) else f"u{i:03d}"
        cents = None if i % 7 == 0 else (i * 13 + p)
        rows.append((i, p, email, cents))
    df = spark.createDataFrame(
        rows, "k long, p long, email string, cents long"
    )
    path = str(tmp_path_factory.mktemp("eqv") / "t")
    _ws(df, path, "p", stats_cols=["email", "cents", "cents::sum"])
    read_snapshot(spark, path).createOrReplaceTempView("eqv_scan")
    return path


_EQV_ITEMS = [
    "COUNT(*) AS n",
    "COUNT(email) AS ce",
    "COUNT(cents) AS cc",
    "SUM(cents) AS s",
    "AVG(cents) AS a",
    "MIN(cents) AS lo",
    "MAX(cents) AS hi",
    "MIN(email) AS elo",
    "MAX(email) AS ehi",
    "COUNT(DISTINCT p) AS nd",
]
_EQV_WHERE = [
    None, "p = 1", "p = 9", "p IN (0, 2)", "p IN (1, 3, 7)",
    # NULL-membership predicates (isnull answerers): same-column
    # aggregates serve, cross-column refuse, grouped COUNT(*) serves
    "cents IS NULL", "cents IS NOT NULL",
    "email IS NULL", "email IS NOT NULL", "p IS NOT NULL",
    # conjunctive NULL membership (eqnull): restricted null audits
    "p = 1 AND cents IS NULL", "p = 0 AND email IS NOT NULL",
    "p IN (0, 2) AND cents IS NOT NULL", "p IN (1, 9) AND cents IS NULL",
]
#: numeric output aliases HAVING may reference (min/max renderings and
#: the group column itself must refuse — covered by drawing them too)
_EQV_HAVING_ALIASES = ["n", "ce", "cc", "s", "a", "lo", "p"]
_EQV_HAVING_OPS = ["<", "<=", ">", ">=", "=", "<>"]


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_metadata_answers_equal_scans(spark, _eqv, data):
    if data.draw(st.booleans(), label="distinct_form") and data.draw(
        st.booleans()
    ):
        # SELECT DISTINCT pcol — the live partition list IS the answer
        sql = "SELECT DISTINCT p FROM t"
        where = data.draw(st.sampled_from(_EQV_WHERE))
        if where:
            sql += f" WHERE {where}"
        out = answer_from_manifest(spark, sql, {"t": _eqv})
        assert out is not None, sql  # always provable on this fixture
        got = sorted(r[0] for r in out.collect())
        want = sorted(
            r[0]
            for r in spark.sql(
                sql.replace(" FROM t", " FROM eqv_scan")
            ).collect()
        )
        assert got == want, (sql, got, want)
        return
    items = data.draw(
        st.lists(st.sampled_from(_EQV_ITEMS), min_size=1, max_size=3,
                 unique=True)
    )
    where = data.draw(st.sampled_from(_EQV_WHERE))
    grouped = data.draw(st.booleans())
    sql = "SELECT "
    if grouped:
        sql += "p, "
    sql += ", ".join(items) + " FROM t"
    if where:
        sql += f" WHERE {where}"
    order = None
    if grouped:
        sql += " GROUP BY p"
        if data.draw(st.booleans(), label="having"):
            halias = data.draw(st.sampled_from(_EQV_HAVING_ALIASES))
            hop = data.draw(st.sampled_from(_EQV_HAVING_OPS))
            hval = data.draw(st.integers(0, 4000))
            sql += f" HAVING {halias} {hop} {hval}"
        if data.draw(st.booleans()):
            alias = data.draw(
                st.sampled_from([i.split(" AS ")[1] for i in items] + ["p"])
            )
            desc = data.draw(st.booleans())
            limit = data.draw(st.integers(1, 4))
            order = (alias, desc, limit)
            sql += f" ORDER BY {alias} {'DESC' if desc else 'ASC'}"
            sql += f" LIMIT {limit}"
    out = answer_from_manifest(spark, sql, {"t": _eqv})
    if out is None:
        return  # refusal is always legal; coverage asserted elsewhere
    scan_sql = sql.replace(" FROM t", " FROM eqv_scan")
    if order is not None:
        # replay the documented deterministic tie-break (group asc)
        scan_sql = scan_sql.replace(
            f" LIMIT {order[2]}", f", p ASC LIMIT {order[2]}"
        )
    got = [tuple(r) for r in out.collect()]
    want = [tuple(r) for r in spark.sql(scan_sql).collect()]

    def _norm(rows):
        return sorted(
            tuple(
                round(v, 9) if isinstance(v, float) else v for v in r
            )
            for r in rows
        )

    assert _norm(got) == _norm(want), (sql, got, want)


_HYB_ITEMS = [
    "COUNT(*) AS n",
    "SUM(cents) AS s",
    "AVG(cents) AS a",
    "MIN(cents) AS lo",
    "MAX(cents) AS hi",
    "MIN(k) AS klo",
    "MAX(k) AS khi",
]
#: cents has stats + NULLs (null gates); k has NO stats (everything
#: scans — the fallback path); p is the partition column; the AND
#: form is the conjunctive eqrange; the last window selects nothing.
_HYB_RANGES = [
    "cents BETWEEN 100 AND 2000",
    "cents > 1500",
    "cents <= 90",
    "k BETWEEN 50 AND 199",
    "p >= 2",
    "p = 1 AND cents BETWEEN 100 AND 2000",
    "p IN (0, 2) AND cents BETWEEN 100 AND 2000",
    "p IN (1, 9) AND cents > 1500",
    "cents BETWEEN 9000 AND 9999",
    # disjunctive windows (orrange): disjoint, overlapping (must
    # merge), empty disjunct, no-stats column, and three windows
    "cents BETWEEN 100 AND 500 OR cents BETWEEN 1500 AND 2000",
    "cents BETWEEN 100 AND 900 OR cents BETWEEN 600 AND 1200",
    "cents BETWEEN 500 AND 100 OR cents BETWEEN 0 AND 40",
    "k BETWEEN 10 AND 30 OR k BETWEEN 150 AND 170",
    "cents BETWEEN 0 AND 10 OR cents BETWEEN 50 AND 60 "
    "OR cents BETWEEN 1900 AND 2100",
    # NULL-audit COUNTs (hybrid isnull; COUNT(*)-only, others skip)
    "cents IS NULL",
    "p = 1 AND cents IS NULL",
    "email IS NOT NULL",
    "p IN (0, 2) AND email IS NULL",
]


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_hybrid_tier_answers_equal_scans(spark, _eqv, data):
    """Fuzz the HYBRID tier the way the metadata tier is fuzzed: any
    served range statement — single, multi-aggregate, grouped,
    conjunctive — must equal the real Spark scan exactly."""
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        hybrid_range_count,
    )

    items = data.draw(
        st.lists(st.sampled_from(_HYB_ITEMS), min_size=1, max_size=3,
                 unique=True)
    )
    where = data.draw(st.sampled_from(_HYB_RANGES))
    grouped = data.draw(st.booleans())
    sql = "SELECT "
    if grouped:
        sql += "p, "
    sql += ", ".join(items) + f" FROM t WHERE {where}"
    if grouped:
        sql += " GROUP BY p"
        if data.draw(st.booleans(), label="having"):
            halias = data.draw(st.sampled_from(["n", "s", "a", "lo", "p"]))
            hop = data.draw(st.sampled_from(_EQV_HAVING_OPS))
            hval = data.draw(st.integers(0, 4000))
            sql += f" HAVING {halias} {hop} {hval}"
    out = hybrid_range_count(spark, sql, {"t": _eqv})
    if out is None:
        return  # refusal is always legal (eqrange+group, etc.)
    got = [tuple(r) for r in out.collect()]
    scan_sql = sql.replace(" FROM t", " FROM eqv_scan")
    # group values come back in the column's recorded type (the form-3
    # scan-identical-schema contract) — no cast compensation needed
    want = [tuple(r) for r in spark.sql(scan_sql).collect()]

    def _norm(rows):
        return sorted(
            tuple(
                round(v, 9) if isinstance(v, float) else v for v in r
            )
            for r in rows
        )

    assert _norm(got) == _norm(want), (sql, got, want)


def test_sum_entries_cold_carry_and_hot_recompute(spark, tmp_path):
    # merges must keep ::sum entries exact: cold partitions carry the
    # recorded [sum, n] by reference, rewritten partitions recompute —
    # a drift here would silently corrupt every later SUM/AVG answer
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        compact_snapshot,
        manifest_column_sum,
        merge_snapshot,
        replace_partitions,
        write_snapshot as _ws,
    )

    base = [(i, i % 3, i * 10) for i in range(90)]
    df = spark.createDataFrame(base, "k long, p long, cents long")
    path = str(tmp_path / "t")
    _ws(df, path, "p", stats_cols=["cents::sum"])

    def truth(rows):
        by = {}
        for k, p, c in rows:
            s, n = by.get(p, (0, 0))
            by[p] = (s + c, n + 1)
        return by

    # upsert into p=1 only: p=0/p=2 entries must carry untouched
    merge_snapshot(
        path,
        spark.createDataFrame(
            [(1, 1, 99999), (900, 1, 11)], "k long, p long, cents long"
        ),
        "k",
        "p",
    )
    rows = [(k, p, c) for (k, p, c) in base if not (k == 1 and p == 1)]
    rows += [(1, 1, 99999), (900, 1, 11)]
    t = truth(rows)
    got = dict(
        (v, (sv, nn))
        for v, sv, nn in manifest_column_sum(
            path, "cents", by_partition=True
        )
    )
    assert got == t
    # replace one partition wholesale
    replace_partitions(
        path,
        spark.createDataFrame([(7, 2, 70)], "k long, p long, cents long"),
        "p",
    )
    rows = [(k, p, c) for (k, p, c) in rows if p != 2] + [(7, 2, 70)]
    got2 = dict(
        (v, (sv, nn))
        for v, sv, nn in manifest_column_sum(
            path, "cents", by_partition=True
        )
    )
    assert got2 == truth(rows)
    # compaction (full rewrite) recomputes identically
    compact_snapshot(spark, path)
    got3 = dict(
        (v, (sv, nn))
        for v, sv, nn in manifest_column_sum(
            path, "cents", by_partition=True
        )
    )
    assert got3 == truth(rows)


def test_single_agg_under_range_parses_but_metadata_refuses(spark, tmp_path):
    # 'MIN(y) WHERE x > 1' PARSES (the hybrid boundary-scan tier
    # serves it) but the pure-metadata answerer must still refuse —
    # clipped extremes are unprovable from partition stats
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        write_snapshot as _ws,
    )

    d = spark.createDataFrame([(1, 0, 2)], "x long, p long, y long")
    path = str(tmp_path / "t")
    _ws(d, path, "p", stats_cols=["x", "y"])
    parsed = parse_metadata_select("SELECT MIN(y) FROM t WHERE x > 1")
    assert parsed is not None and parsed["items"] == [("min", "y", "min_y")]
    assert (
        answer_from_manifest(
            spark, "SELECT MIN(y) FROM t WHERE x > 1", {"t": path}
        )
        is None
    )
    assert (
        answer_from_manifest(
            spark,
            "SELECT SUM(y) AS s FROM t WHERE p = 0 AND x > 1",
            {"t": path},
        )
        is None
    )


# ------------------------------- DISTINCT / COUNT(DISTINCT) / HAVING
@pytest.fixture()
def dtbl(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        write_snapshot,
    )

    rows = [(i, f"s{i % 3}", i * 7) for i in range(100)] + [(100, None, None)]
    df = spark.createDataFrame(rows, "k long, st string, v long")
    path = str(tmp_path / "dtbl")
    write_snapshot(df, path, "st", stats_cols=["v::sum"])
    return path


def test_distinct_pcol_is_the_live_partition_list(spark, dtbl):
    # zero-data-page proof: physically remove every data file first
    for f in Path(dtbl).rglob("*.parquet"):
        f.unlink()
    out = answer_from_manifest(spark, "SELECT DISTINCT st FROM t", {"t": dtbl})
    assert [r.st for r in out.collect()] == [None, "s0", "s1", "s2"]
    assert dict(out.dtypes) == {"st": "string"}
    # IN restriction filters the value set; absent member contributes
    # nothing; alias respected
    out = answer_from_manifest(
        spark,
        "SELECT DISTINCT st AS s FROM t WHERE st IN ('s1', 'zz')",
        {"t": dtbl},
    )
    assert [r.s for r in out.collect()] == ["s1"]
    # DISTINCT over aggregates / with GROUP BY / on a non-pcol: scan
    assert answer_from_manifest(
        spark, "SELECT DISTINCT COUNT(*) AS n FROM t", {"t": dtbl}
    ) is None
    assert answer_from_manifest(
        spark, "SELECT DISTINCT st FROM t GROUP BY st", {"t": dtbl}
    ) is None
    assert answer_from_manifest(
        spark, "SELECT DISTINCT v FROM t", {"t": dtbl}
    ) is None


def test_count_distinct_pcol_skips_nulls(spark, dtbl):
    for f in Path(dtbl).rglob("*.parquet"):
        f.unlink()
    # the NULL partition forms a DISTINCT group but COUNT(DISTINCT)
    # skips it — SQL semantics, replayed from the manifest alone
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n, COUNT(DISTINCT st) AS nd FROM t",
        {"t": dtbl},
    ).collect()[0]
    assert (out.n, out.nd) == (101, 3)
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(DISTINCT st) AS nd FROM t WHERE st IN ('s0', 'zz')",
        {"t": dtbl},
    ).collect()[0]
    assert out.nd == 1
    out = answer_from_manifest(
        spark,
        "SELECT COUNT(DISTINCT st) AS nd FROM t WHERE st = 's2'",
        {"t": dtbl},
    ).collect()[0]
    assert out.nd == 1
    # non-pcol exact NDV is not a manifest fact: scan
    assert answer_from_manifest(
        spark, "SELECT COUNT(DISTINCT v) AS nd FROM t", {"t": dtbl}
    ) is None
    # grouped COUNT(DISTINCT): scan decides
    assert answer_from_manifest(
        spark,
        "SELECT st, COUNT(DISTINCT v) AS nd FROM t GROUP BY st",
        {"t": dtbl},
    ) is None


def test_having_filters_assembled_groups(spark, dtbl):
    for f in Path(dtbl).rglob("*.parquet"):
        f.unlink()
    # 34/33/33 rows in s0/s1/s2 (+1 NULL-partition row); v sums are
    # 11781 (s0), 11319 (s1), 11550 (s2), NULL (null partition)
    out = answer_from_manifest(
        spark,
        "SELECT st, COUNT(*) AS n FROM t GROUP BY st HAVING n > 33",
        {"t": dtbl},
    )
    assert [(r.st, r.n) for r in out.collect()] == [("s0", 34)]
    # NULL aggregates drop (the NULL partition's SUM is NULL): SQL
    # three-valued HAVING
    out = answer_from_manifest(
        spark,
        "SELECT st, SUM(v) AS sv FROM t GROUP BY st HAVING sv <= 11550",
        {"t": dtbl},
    )
    assert [(r.st, r.sv) for r in out.collect()] == [
        ("s1", 11319), ("s2", 11550),
    ]
    # HAVING composes before ORDER BY/LIMIT (SQL evaluation order)
    out = answer_from_manifest(
        spark,
        "SELECT st, COUNT(*) AS n, AVG(v) AS av FROM t GROUP BY st"
        " HAVING n = 33 ORDER BY av DESC LIMIT 1",
        {"t": dtbl},
    )
    assert [(r.st, r.n) for r in out.collect()] == [("s2", 33)]
    # refusals: non-numeric alias (group col, MIN/MAX rendering),
    # HAVING without GROUP BY, unknown alias
    for bad in (
        "SELECT st, COUNT(*) AS n FROM t GROUP BY st HAVING st > 3",
        "SELECT COUNT(*) AS n FROM t HAVING n > 3",
        "SELECT st, COUNT(*) AS n FROM t GROUP BY st HAVING zz > 3",
    ):
        assert answer_from_manifest(spark, bad, {"t": dtbl}) is None, bad


def test_having_and_group_typing_on_grouped_hybrid(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        hybrid_range_count,
    )
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    rows = [(i, i % 4, i * 3) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    path = str(tmp_path / "ghav")
    write_snapshot(df, path, "p", stats_cols=["k", "v", "v::sum"])
    sql = (
        "SELECT p, COUNT(*) AS n, SUM(v) AS sv FROM t"
        " WHERE k BETWEEN 20 AND 180 GROUP BY p"
        " HAVING sv >= 12000 ORDER BY sv DESC LIMIT 2"
    )
    out = hybrid_range_count(spark, sql, {"t": path})
    read_snapshot(spark, path).createOrReplaceTempView("ghav_scan")
    want = spark.sql(
        sql.replace("FROM t", "FROM ghav_scan")
        .replace("LIMIT 2", ", p ASC LIMIT 2")
    )
    # scan-identical schema: the LONG group column must come back
    # LONG (the form-3 contract), not the directory-name string
    assert out.dtypes == want.dtypes
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in want.collect()
    ]
    # HAVING referencing a non-numeric alias refuses pre-scan
    assert hybrid_range_count(
        spark,
        "SELECT p, COUNT(*) AS n FROM t WHERE k > 20 GROUP BY p"
        " HAVING p > 1",
        {"t": path},
    ) is None


def test_in_range_conjunction_served_by_hybrid(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        hybrid_range_count,
    )
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    rows = [(i, i % 5, i * 3) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    path = str(tmp_path / "inr")
    write_snapshot(df, path, "p", stats_cols=["k", "v", "v::sum"])
    read_snapshot(spark, path).createOrReplaceTempView("inr_scan")
    # scan-equality across count / multi-aggregate / absent member
    for sql in (
        "SELECT COUNT(*) AS n FROM t"
        " WHERE p IN (0, 2, 9) AND k BETWEEN 100 AND 400",
        "SELECT COUNT(*) AS n, SUM(v) AS sv, AVG(v) AS av,"
        " MIN(k) AS lo, MAX(k) AS hi FROM t"
        " WHERE p IN (1, 3) AND k > 250",
    ):
        out = hybrid_range_count(spark, sql, {"t": path})
        want = spark.sql(sql.replace("FROM t", "FROM inr_scan"))
        assert out is not None and out.dtypes == want.dtypes, sql
        assert [tuple(r) for r in out.collect()] == [
            tuple(r) for r in want.collect()
        ], sql
    # membership on a non-partition column refuses pre-scan
    assert hybrid_range_count(
        spark,
        "SELECT COUNT(*) AS n FROM t WHERE v IN (0, 3) AND k > 10",
        {"t": path},
    ) is None
    # zero-data-page proof: a window covering every member partition
    # classifies all members fully inside — delete every parquet and
    # the member-restricted answer must not notice
    for f in Path(path).rglob("*.parquet"):
        f.unlink()
    out = hybrid_range_count(
        spark,
        "SELECT COUNT(*) AS n, SUM(v) AS sv FROM t"
        " WHERE p IN (0, 2) AND k BETWEEN 0 AND 499",
        {"t": path},
    ).collect()[0]
    assert (out.n, out.sv) == (200, 149100)


def test_distinct_and_having_compose_with_time_travel(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        append_snapshot,
        write_snapshot,
    )

    df1 = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(40)], "k long, st string"
    )
    path = str(tmp_path / "tt")
    write_snapshot(df1, path, "st")
    df2 = spark.createDataFrame(
        [(100 + i, "s9") for i in range(5)], "k long, st string"
    )
    append_snapshot(path, df2, "st")
    # v1 has two partitions; head has three — DISTINCT time-travels
    v1 = answer_from_manifest(
        spark, "SELECT DISTINCT st FROM t FOR VERSION AS OF 1", {"t": path}
    )
    assert [r.st for r in v1.collect()] == ["s0", "s1"]
    head = answer_from_manifest(
        spark, "SELECT DISTINCT st FROM t", {"t": path}
    )
    assert [r.st for r in head.collect()] == ["s0", "s1", "s9"]
    # HAVING at the pinned version: s9 (5 rows) did not exist at v1
    v1h = answer_from_manifest(
        spark,
        "SELECT st, COUNT(*) AS n FROM t FOR VERSION AS OF 1"
        " GROUP BY st HAVING n <= 20",
        {"t": path},
    )
    assert [(r.st, r.n) for r in v1h.collect()] == [("s0", 20), ("s1", 20)]
    hh = answer_from_manifest(
        spark,
        "SELECT st, COUNT(*) AS n FROM t GROUP BY st HAVING n <= 20",
        {"t": path},
    )
    assert [(r.st, r.n) for r in hh.collect()] == [
        ("s0", 20), ("s1", 20), ("s9", 5),
    ]
    # COUNT(DISTINCT pcol) time-travels too
    cd = answer_from_manifest(
        spark,
        "SELECT COUNT(DISTINCT st) AS nd FROM t FOR VERSION AS OF 1",
        {"t": path},
    ).collect()[0]
    assert cd.nd == 2


def test_grouped_in_range_restricts_members(spark, tmp_path):
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        hybrid_range_count,
    )
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    rows = [(i, i % 5, i * 3) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    path = str(tmp_path / "ging")
    write_snapshot(df, path, "p", stats_cols=["k", "v", "v::sum"])
    read_snapshot(spark, path).createOrReplaceTempView("ging_scan")
    sql = (
        "SELECT p, COUNT(*) AS n, SUM(v) AS sv FROM t"
        " WHERE p IN (0, 2, 9) AND k BETWEEN 100 AND 400 GROUP BY p"
    )
    out = hybrid_range_count(spark, sql, {"t": path})
    want = spark.sql(sql.replace("FROM t", "FROM ging_scan"))
    assert out is not None and out.dtypes == want.dtypes
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in want.collect()
    )
    # zero-data-page proof: a window proven for every member — delete
    # all parquet; non-members and the absent member never enter
    for f in Path(path).rglob("*.parquet"):
        f.unlink()
    out = hybrid_range_count(
        spark,
        "SELECT p, COUNT(*) AS n FROM t"
        " WHERE p IN (1, 4) AND k BETWEEN 0 AND 499 GROUP BY p",
        {"t": path},
    )
    assert sorted((r.p, r.n) for r in out.collect()) == [(1, 100), (4, 100)]


def test_in_range_stays_exact_under_mor_tombstones(spark, tmp_path):
    """Merge-on-read DELETE interaction: a tombstoned member partition
    must fall out of the metadata proof and SCAN (tombstones applied),
    never serve a stale pre-delete count; proven-outside members stay
    metadata (bounds are a pre-delete superset — outside survives)."""
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        hybrid_range_count,
    )
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        delete_where,
        read_snapshot,
        write_snapshot,
    )

    rows = [(i, i % 3, i * 3) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    path = str(tmp_path / "morin")
    write_snapshot(df, path, "p", stats_cols=["k", "v", "v::sum"])
    # MoR-delete a slice of member partition 0 only
    delete_where(spark, path, "p = 0 AND k < 30", mode="merge-on-read", key="k")
    read_snapshot(spark, path).createOrReplaceTempView("morin_scan")
    for sql in (
        "SELECT COUNT(*) AS n FROM t"
        " WHERE p IN (0, 2) AND k BETWEEN 0 AND 299",
        "SELECT COUNT(*) AS n, SUM(v) AS sv FROM t"
        " WHERE p IN (0, 1) AND k >= 150",
        "SELECT p, COUNT(*) AS n FROM t"
        " WHERE p IN (0, 2) AND k BETWEEN 0 AND 299 GROUP BY p",
    ):
        out = hybrid_range_count(spark, sql, {"t": path})
        want = spark.sql(sql.replace("FROM t", "FROM morin_scan"))
        assert out is not None, sql
        assert sorted(tuple(r) for r in out.collect()) == sorted(
            tuple(r) for r in want.collect()
        ), sql


def test_or_range_served_by_hybrid(spark, tmp_path):
    # disjunctive windows (orrange): per-interval passes combined
    # exactly; pure-metadata answerer refuses the shape; GROUP BY and
    # mixed-column disjunctions refuse to the scan
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        answer_from_manifest,
        hybrid_range_count,
    )
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    rows = [(i, i // 500, i * 3 if i % 7 else None) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    path = str(tmp_path / "orr")
    write_snapshot(df, path, "p", stats_cols=["k", "v", "v::sum"])
    read_snapshot(spark, path).createOrReplaceTempView("orr_scan")
    for sql in (
        "SELECT COUNT(*) AS n FROM t"
        " WHERE k BETWEEN 100 AND 400 OR k BETWEEN 1600 AND 1900",
        "SELECT COUNT(*) AS n, SUM(v) AS sv, AVG(v) AS av,"
        " MIN(k) AS lo, MAX(k) AS hi FROM t"
        " WHERE k BETWEEN 0 AND 499 OR k BETWEEN 1500 AND 1999",
        # overlap merges; empty window contributes nothing
        "SELECT COUNT(*) AS n FROM t"
        " WHERE k BETWEEN 100 AND 900 OR k BETWEEN 600 AND 1200",
        "SELECT COUNT(*) AS n FROM t"
        " WHERE k BETWEEN 400 AND 100 OR k BETWEEN 5 AND 9",
    ):
        assert answer_from_manifest(spark, sql, {"t": path}) is None, sql
        out = hybrid_range_count(spark, sql, {"t": path})
        want = spark.sql(sql.replace("FROM t", "FROM orr_scan"))
        assert out is not None and out.dtypes == want.dtypes, sql
        assert [tuple(r) for r in out.collect()] == [
            tuple(r) for r in want.collect()
        ], sql
    # GROUP BY + disjunctive windows: SERVED since round 10 (the r9
    # verdict ask #6a) — per-interval grouped passes merged exactly
    gsql = (
        "SELECT p, COUNT(*) AS n FROM t"
        " WHERE k BETWEEN 1 AND 2 OR k BETWEEN 5 AND 9 GROUP BY p"
    )
    gout = hybrid_range_count(spark, gsql, {"t": path})
    gwant = spark.sql(gsql.replace("FROM t", "FROM orr_scan"))
    assert gout is not None and gout.dtypes == gwant.dtypes
    assert sorted(tuple(r) for r in gout.collect()) == sorted(
        tuple(r) for r in gwant.collect()
    )
    # refusals: mixed columns, open-ended disjunct
    for sql in (
        "SELECT COUNT(*) AS n FROM t"
        " WHERE k BETWEEN 1 AND 2 OR v BETWEEN 3 AND 4",
        "SELECT COUNT(*) AS n FROM t WHERE k < 5 OR k BETWEEN 9 AND 12",
    ):
        assert hybrid_range_count(spark, sql, {"t": path}) is None, sql
    # zero-data-page proof: windows covering whole partitions classify
    # fully inside — delete every parquet, the answer must not notice
    for f in Path(path).rglob("*.parquet"):
        f.unlink()
    out = hybrid_range_count(
        spark,
        "SELECT COUNT(*) AS n, SUM(v) AS sv FROM t"
        " WHERE k BETWEEN 0 AND 499 OR k BETWEEN 1500 AND 1999",
        {"t": path},
    ).collect()[0]
    want_sv = sum(i * 3 for i in range(2000)
                  if i % 7 and (i < 500 or i >= 1500))
    assert (out.n, out.sv) == (1000, want_sv)


def test_isnull_predicates_pure_metadata(spark, tmp_path):
    # NULL-membership WHERE: counts and same-column aggregates from
    # the manifest alone — proven by deleting every parquet file
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        answer_from_manifest,
    )
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        append_snapshot,
        write_snapshot,
    )

    rows = [
        (i, i % 3 if i % 5 else None, (i * 3) if i % 7 else None)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    path = str(tmp_path / "t")
    write_snapshot(df, path, "p", stats_cols=["k", "v", "v::sum"])
    df.createOrReplaceTempView("isnull_scan")
    T = {"t": path}
    served = [
        "SELECT COUNT(*) AS n FROM t WHERE v IS NULL",
        "SELECT COUNT(*) AS n FROM t WHERE v IS NOT NULL",
        "SELECT COUNT(*) AS n, SUM(v) AS s, AVG(v) AS a, MIN(v) AS lo,"
        " MAX(v) AS hi FROM t WHERE v IS NOT NULL",
        "SELECT COUNT(v) AS cv, SUM(v) AS s, MIN(v) AS lo FROM t"
        " WHERE v IS NULL",
        "SELECT COUNT(*) AS n FROM t WHERE p IS NULL",
        "SELECT COUNT(*) AS n FROM t WHERE p IS NOT NULL",
        "SELECT p, COUNT(*) AS n FROM t WHERE v IS NULL GROUP BY p",
    ]
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    for sql in served:
        out = answer_from_manifest(spark, sql, T)
        assert out is not None, sql
        got = sorted(map(tuple, out.collect()), key=key)
        want = sorted(
            map(
                tuple,
                spark.sql(sql.replace("FROM t", "FROM isnull_scan")).collect(),
            ),
            key=key,
        )
        assert got == want, (sql, got, want)
    # cross-column aggregates and grouped non-count items refuse
    for sql in (
        "SELECT SUM(k) AS s FROM t WHERE v IS NULL",
        "SELECT MIN(k) AS lo FROM t WHERE v IS NOT NULL",
        "SELECT p, SUM(v) AS s FROM t WHERE v IS NULL GROUP BY p",
    ):
        assert answer_from_manifest(spark, sql, T) is None, sql
    # zero data pages: delete every parquet, the answers must hold
    for f in Path(path).rglob("*.parquet"):
        f.unlink()
    out = answer_from_manifest(
        spark, "SELECT COUNT(*) AS n FROM t WHERE v IS NULL", T
    )
    n_null = sum(1 for _k, _p, v in rows if v is None)
    assert out.collect()[0]["n"] == n_null
    # time travel composes (appends after v1 invisible at v1)
    path2 = str(tmp_path / "t2")
    write_snapshot(df, path2, "p", stats_cols=["v"])
    # mixed appended partition: an ALL-null partition has no [min,
    # max] footer entry for v, so COUNT under the predicate rightly
    # refuses (conservative) — not the shape under test here
    append_snapshot(
        path2,
        spark.createDataFrame(
            [(900, 9, None), (901, 9, 5)], "k long, p long, v long"
        ),
        "p",
    )
    v1 = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n FROM t FOR VERSION AS OF 1 WHERE v IS NULL",
        {"t": path2},
    )
    now = answer_from_manifest(
        spark, "SELECT COUNT(*) AS n FROM t WHERE v IS NULL", {"t": path2}
    )
    assert (v1.collect()[0]["n"], now.collect()[0]["n"]) == (
        n_null,
        n_null + 1,
    )


def test_hybrid_isnull_scans_only_unprovable(spark, tmp_path):
    # MoR tombstones make ONE partition unprovable: the pure tier
    # refuses the whole statement, the hybrid tier answers the
    # provable partitions from metadata and scans only that one
    from pyspark.sql import functions as F

    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        answer_from_manifest,
        explain_metadata_sql,
        hybrid_range_count,
    )
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        delete_where,
        write_snapshot,
    )

    rows = [(i, i % 3, (i * 3) if i % 7 else None) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    path = str(tmp_path / "t")
    write_snapshot(df, path, "p", stats_cols=["v"])
    delete_where(
        spark, path, (F.col("p") == 1) & (F.col("k") < 10),
        mode="merge-on-read", key="k",
    )
    T = {"t": path}
    sql = "SELECT COUNT(*) AS n FROM t WHERE v IS NULL"
    assert answer_from_manifest(spark, sql, T) is None  # pure: refuse
    want = sum(1 for k, p, v in rows if v is None and not (p == 1 and k < 10))
    assert hybrid_range_count(spark, sql, T).collect()[0]["n"] == want
    e = explain_metadata_sql(spark, sql, T).collect()[0]
    assert (e["tier"], e["partitions_metadata"], e["partitions_scanned"]) == (
        "hybrid", 2, 1
    )
    # member-restricted: only the tombstoned member scans
    sql2 = "SELECT COUNT(*) AS n FROM t WHERE p = 1 AND v IS NULL"
    want2 = sum(1 for k, p, v in rows if p == 1 and v is None and k >= 10)
    assert hybrid_range_count(spark, sql2, T).collect()[0]["n"] == want2
    # non-COUNT shapes refuse the hybrid (scan decides)
    assert (
        hybrid_range_count(
            spark, "SELECT SUM(v) AS s FROM t WHERE v IS NULL", T
        )
        is None
    )
