"""Randomized equivalence: the scale-shaped operators must equal their
brute-force definitions on arbitrary inputs.

- range_join ≡ crossJoin + BETWEEN filter (the plan it exists to avoid)
- connected_components ≡ driver-side union-find transitive closure
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators.dedup import connected_components
from pandas_analysis_with_postgres_spark.operators.joins import range_join

_spark = None


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    global _spark
    _spark = spark
    yield


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(st.integers(0, 100), min_size=0, max_size=15),
    intervals=st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 40)),
        min_size=0,
        max_size=8,
    ),
    bucket_width=st.sampled_from([1, 7, 50]),
)
def test_range_join_equals_brute_force(points, intervals, bucket_width):
    spark = _spark
    p = spark.createDataFrame([(i, v) for i, v in enumerate(points)], "pid long, p long")
    iv = spark.createDataFrame(
        [(i, s, s + w) for i, (s, w) in enumerate(intervals)],
        "iid long, s long, e long",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            p,
            iv,
            point_col="p",
            start_col="s",
            end_col="e",
            bucket=lambda c: F.floor(c / F.lit(bucket_width)).cast("long"),
        ).collect()
    }
    expect = {
        (i, j)
        for i, v in enumerate(points)
        for j, (s, w) in enumerate(intervals)
        if s <= v <= s + w
    }
    assert got == expect


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_equals_union_find(edges):
    spark = _spark
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        (r["id"], r["comp"])
        for r in connected_components(pairs, max_iter=30).collect()
    }
    assert got == set(_union_find_components(edges).items())


def _brute_containment(docs, threshold):
    def sh(text):
        toks = text.split(" ")
        vals = [(ord(t[0]) * 256 + len(t)) % 32768 for t in toks]
        return {
            (vals[i] * 32768 + vals[i + 1]) * 32768 + vals[i + 2]
            for i in range(len(vals) - 2)
        }

    sets = {i: sh(t) for i, t in docs}
    bench = {i for i, _ in docs if i % 3 == 0}
    out = set()
    for b in bench:
        if not sets[b]:
            continue
        for t in sets:
            if t == b:
                continue
            c = len(sets[t] & sets[b]) / len(sets[b])
            if c >= threshold:
                out.add((t, b))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    threshold=st.sampled_from([0.2, 0.5, 1.0]),
)
def test_containment_pairs_equals_brute_force(texts, threshold):
    from pandas_analysis_with_postgres_spark.operators.dedup import containment_pairs

    spark = _spark
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = df.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 0)
    got = {
        (r["train_doc"], r["bench_doc"])
        for r in containment_pairs(df, bench, threshold=threshold).collect()
    }
    assert got == _brute_containment(docs, threshold)
