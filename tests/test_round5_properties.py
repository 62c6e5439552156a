"""Property tests for the round-5 operators, each checked against an
independent driver-side Python reimplementation: semantic dedup's
greedy drop rule, time-series forward fill, row-level delete
(behavior-preserving vs base minus predicate), and the incremental
matview's delta algebra over random commit sequences."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    global _spark
    _spark = spark
    yield


_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ------------------------------------------------- semantic dedup

_vec = st.lists(
    st.integers(min_value=-8, max_value=8).map(float), min_size=4, max_size=4
).filter(lambda v: any(x != 0 for x in v))
_corpus = st.lists(_vec, min_size=2, max_size=10)


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


@settings(**_SETTINGS)
@given(_corpus, st.floats(min_value=0.2, max_value=0.99))
def test_semantic_dedup_matches_reference(vecs, threshold):
    from pandas_analysis_with_postgres_spark.operators.similarity import (
        semantic_dedup,
    )

    # fixed 2-cell codebook (axes) — pins pair/drop logic; Lloyd is
    # separately oracled (a65/z08)
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    corpus = _spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cdf = _spark.createDataFrame(cents, "cell_id long, centv array<double>")
    got = {
        r.vec_id: (r.cell_id, r.kept)
        for r in semantic_dedup(corpus, cdf, threshold=threshold).collect()
    }
    # reference: nearest cell (tie → lower cell_id), greedy drop by id
    cells = {}
    for i, v in enumerate(vecs):
        best = max(
            cents, key=lambda c: (_cos(v, c[1]), -c[0])
        )
        cells[i] = best[0]
    dropped = set()
    for j, vj in enumerate(vecs):
        for i in range(j):
            if cells[i] == cells[j] and _cos(vecs[i], vj) >= threshold:
                dropped.add(j)
                break
    for i in range(len(vecs)):
        assert got[i][0] == cells[i], (i, vecs)
        assert got[i][1] == (i not in dropped), (i, vecs, threshold)


# ------------------------------------------------- resample_ffill

_obs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=0, max_value=6),   # day offset
        st.integers(min_value=0, max_value=23),  # hour (intra-bucket order)
        st.integers(min_value=-50, max_value=50).map(float),
    ),
    min_size=1,
    max_size=14,
)


@settings(**_SETTINGS)
@given(_obs)
def test_resample_ffill_matches_reference(obs):
    import datetime as dt

    from pandas_analysis_with_postgres_spark.operators.timeseries import (
        resample_ffill,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1 + d, h), k, v)
        for i, (k, d, h, v) in enumerate(obs)
    ]
    events = _spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        (r.user_id, r.bucket_ts.day): (r.n_obs, r.value_ffill)
        for r in resample_ffill(
            events,
            key_col="user_id",
            ts_col="ts",
            value_col="value",
            tiebreak_col="event_id",
        ).collect()
    }
    days = sorted({d for _, d, _, _ in obs})
    lo, hi = days[0], days[-1]
    keys = sorted({k for k, _, _, _ in obs})
    assert len(got) == len(keys) * (hi - lo + 1)
    for k in keys:
        last = None
        for d in range(lo, hi + 1):
            bucket = [
                (i, o) for i, o in enumerate(obs) if o[0] == k and o[1] == d
            ]
            if bucket:
                # latest by (ts, event_id): max (hour, index)
                _, best = max(bucket, key=lambda t: (t[1][2], t[0]))
                last = best[3]
            n, v = got[(k, d + 1)]
            assert n == len(bucket)
            assert v == last


# ------------------------------------------------- delete_where

_tbl_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),       # key (may repeat)
        st.integers(min_value=-10, max_value=10),     # value
        st.integers(min_value=0, max_value=3),        # partition
    ),
    min_size=1,
    max_size=12,
)


@settings(**_SETTINGS)
@given(_tbl_rows, st.integers(min_value=-10, max_value=10))
def test_delete_where_is_base_minus_predicate(tmp_path_factory, rows, cut):
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        delete_where,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path_factory.mktemp("dw") / "t")
    uniq = [(i, k, v, p) for i, (k, v, p) in enumerate(rows)]
    df = _spark.createDataFrame(uniq, "rid long, k long, v long, p long")
    write_snapshot(df, path, "p")
    r = delete_where(_spark, path, f"v < {cut}")
    expect = {t for t in uniq if not (t[2] < cut)}
    got = {
        (x.rid, x.k, x.v, x.p) for x in read_snapshot(_spark, path).collect()
    }
    assert got == expect
    assert r["deleted_rows"] == len(uniq) - len(expect)
    # version 1 is untouched
    v1 = {(x.rid, x.k, x.v, x.p) for x in read_snapshot(_spark, path, 1).collect()}
    assert v1 == set(uniq)


# ------------------------------------------------- matview deltas

_commits = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),    # key
            st.sampled_from(["x", "y"]),              # group
            st.integers(min_value=-20, max_value=20), # value
        ),
        min_size=1,
        max_size=5,
    ),
    min_size=1,
    max_size=4,
)


@settings(**_SETTINGS)
@given(_commits)
def test_matview_equals_direct_aggregate_after_random_commits(
    tmp_path_factory, commits
):
    from pandas_analysis_with_postgres_spark.sources.matview import (
        maintain_sum_view,
    )
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
        read_snapshot,
        write_snapshot,
    )

    root = tmp_path_factory.mktemp("mv")
    src, view = str(root / "s"), str(root / "v")
    state: dict[int, tuple[str, int]] = {}
    for ci, batch in enumerate(commits):
        # last write per key wins within a batch (merge contract: the
        # source is deduped by key)
        dedup = {}
        for k, g, v in batch:
            dedup[k] = (g, v)
        rows = [(k, g, v, k % 2) for k, (g, v) in dedup.items()]
        df = _spark.createDataFrame(rows, "k long, grp string, val long, p long")
        if ci == 0:
            write_snapshot(df, src, "p")
        else:
            merge_snapshot(src, df, "k", "p")
        state.update(dedup)
        maintain_sum_view(
            _spark,
            src,
            view,
            key="k",
            group_col="grp",
            sum_col="val",
        )
    got = {
        r.grp: (r.n_rows, r.total)
        for r in read_snapshot(_spark, view).collect()
        if r.n_rows > 0
    }
    expect: dict[str, list[int]] = {}
    for g, v in state.values():
        expect.setdefault(g, []).append(v)
    assert got == {g: (len(vs), sum(vs)) for g, vs in expect.items()}
