"""Property tests for the round-4 late operators, each checked
against an independent driver-side Python reimplementation:
boilerplate-line removal, two-level global rank (≡ sorted position),
seeded shuffle rank (total permutation), and manifest-stats skipping
(behavior-preserving by construction)."""

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


# ----------------------------------------------------- boilerplate

_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_text = st.lists(_word, min_size=1, max_size=12).map(" ".join)
_docs = st.lists(_text, min_size=1, max_size=8)

TPL = 3  # tokens per line
MIN_DOCS = 2
MIN_CHARS = 4


def _ref_boilerplate(texts):
    """Independent per-doc reimplementation of the line grammar and
    removal policy."""
    lines_per_doc = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n = max(math.ceil(len(toks) / TPL), 1)
        lines_per_doc[i] = [
            " ".join(toks[j * TPL : (j + 1) * TPL]) for j in range(n)
        ]
    counts = {}
    for i, ls in lines_per_doc.items():
        for line in set(ls):
            counts[line] = counts.get(line, 0) + 1
    boiler = {
        line
        for line, c in counts.items()
        if c >= MIN_DOCS and len(line) >= MIN_CHARS
    }
    out = {}
    for i, ls in lines_per_doc.items():
        kept = [line for line in ls if line not in boiler]
        out[i] = (" ".join(kept), len(ls) - len(kept))
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_docs)
def test_boilerplate_matches_reference(texts):
    from pandas_analysis_with_postgres_spark.operators.dedup import (
        remove_boilerplate_lines,
    )

    df = _spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_removed_lines)
        for r in remove_boilerplate_lines(
            df,
            tokens_per_line=TPL,
            min_docs=MIN_DOCS,
            min_line_chars=MIN_CHARS,
        ).collect()
    }
    assert got == _ref_boilerplate(texts)


# ----------------------------------------------------- global rank

_keys = st.lists(
    st.integers(min_value=-(10**6), max_value=10**6),
    min_size=1,
    max_size=40,
    unique=True,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_keys, st.integers(min_value=1, max_value=500))
def test_global_rank_is_sorted_position(keys, width):
    from pandas_analysis_with_postgres_spark.operators.sharding import (
        global_rank,
    )

    df = _spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: r.rank
        for r in global_rank(df, "k", bucket_width=width).collect()
    }
    expect = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == expect


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_keys, st.integers(min_value=0, max_value=3))
def test_shuffled_rank_is_total_permutation(keys, seed):
    from pandas_analysis_with_postgres_spark.operators.sharding import (
        SHUFFLE_MOD,
        SHUFFLE_MULT,
        shuffled_rank,
    )

    # keys INCLUDE negatives: Python's % is pmod-consistent (non-
    # negative residue), matching Spark's pmod bit-for-bit — the sign
    # caveat documented in functions.inthash.
    df = _spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.rank for r in shuffled_rank(df, "k", seed=seed).collect()}
    seed_term = (seed * 0x9E3779B9) % SHUFFLE_MOD

    def perm(k):
        return ((k % SHUFFLE_MOD) * SHUFFLE_MULT + seed_term) % SHUFFLE_MOD

    expect = {
        k: i + 1
        for i, k in enumerate(sorted(keys, key=lambda k: (perm(k), k)))
    }
    assert got == expect


# ----------------------------------------------------- stats skipping

_tbl_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=99),  # k (unique-ified below)
        st.integers(min_value=0, max_value=4),  # partition
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)
_window = st.tuples(
    st.integers(min_value=-10, max_value=110),
    st.integers(min_value=-10, max_value=110),
).map(lambda t: (min(t), max(t)))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_tbl_rows, _window)
def test_stats_skipping_is_behavior_preserving(tmp_rows, window):
    import tempfile

    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    import shutil

    lo, hi = window
    root = tempfile.mkdtemp(prefix="statsprop_")
    try:
        path = root + "/t"
        df = _spark.createDataFrame(tmp_rows, "k long, p long")
        write_snapshot(df, path, "p", stats_cols=["k"])
        pruned = {
            r.k
            for r in read_snapshot(
                _spark, path, column_ranges={"k": (lo, hi)}
            )
            .filter(f"k BETWEEN {lo} AND {hi}")
            .collect()
        }
        expect = {k for k, _ in tmp_rows if lo <= k <= hi}
        assert pruned == expect
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_tbl_rows, st.integers(min_value=-5, max_value=105))
def test_bloom_point_lookup_is_behavior_preserving(tmp_rows, probe):
    import tempfile

    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
        write_snapshot,
    )

    import shutil

    root = tempfile.mkdtemp(prefix="bloomprop_")
    try:
        path = root + "/t"
        df = _spark.createDataFrame(tmp_rows, "k long, p long")
        write_snapshot(df, path, "p", bloom_cols=["k"])
        pruned = {
            r.k
            for r in read_snapshot(_spark, path, point_lookups={"k": probe})
            .filter(f"k = {probe}")
            .collect()
        }
        expect = {k for k, _ in tmp_rows if k == probe}
        assert pruned == expect
    finally:
        shutil.rmtree(root, ignore_errors=True)
