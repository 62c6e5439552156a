"""Unit tests for operators.graph.pagerank and operators.bpe encoding
— hand-checkable fixtures, independent of the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators.bpe import (
    apply_bpe_merges,
    train_bpe_merges,
)
from pandas_analysis_with_postgres_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank,
)


def _expected_ranks(edges, rounds, scale=PAGERANK_SCALE, damp=85):
    """Reference implementation of the integer PageRank recurrence."""
    from collections import defaultdict

    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    ranks = {v: scale for v in outdeg}
    base = (scale * (100 - damp)) // 100
    for _ in range(rounds):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += ranks[u] // outdeg[u]
        ranks = {v: base + (damp * sv) // 100 for v, sv in s.items()}
    return ranks


def test_pagerank_matches_hand_computation(spark):
    # Directed triangle plus a chord: 1→2, 2→3, 3→1, 1→3.
    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.v: r.rank for r in pagerank(df, rounds=3).collect()}
    assert got == _expected_ranks(edges, rounds=3)


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # A symmetric cycle must stay exactly uniform at the fixpoint.
    edges = [(i, (i + 1) % 4) for i in range(4)] + [
        ((i + 1) % 4, i) for i in range(4)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r.rank for r in pagerank(df, rounds=2).collect()}
    assert len(ranks) == 1


def test_pagerank_salted_aggregate_is_result_identical_and_two_stage(spark):
    # Skewed star: hub vertex 99 receives edges from 50 spokes (plus a
    # back-edge so every vertex has outdegree ≥ 1).
    edges = [(i, 99) for i in range(50)] + [(99, 0)] + [(i, i + 1) for i in range(49)]
    df = spark.createDataFrame(edges, "src long, dst long")
    salted = pagerank(df, rounds=2, salt_partitions=8)
    plain = pagerank(df, rounds=2, salt_partitions=1)
    assert {(r.v, r.rank) for r in salted.collect()} == {
        (r.v, r.rank) for r in plain.collect()
    }
    assert {r.v: r.rank for r in salted.collect()} == _expected_ranks(edges, rounds=2)
    # Plan pin: the salted variant pre-aggregates on (v, __salt) before
    # the final per-v SUM; the plain variant never mentions the salt.
    salted_plan = salted._jdf.queryExecution().optimizedPlan().toString()
    plain_plan = plain._jdf.queryExecution().optimizedPlan().toString()
    assert "pmod(xxhash64" in salted_plan
    assert "pmod(xxhash64" not in plain_plan


def test_pagerank_auto_salt_profiles_the_graph(spark):
    # Hub graph (one dst holds ~100% of edges) → the measured-profile
    # default picks a salted two-stage aggregate...
    hub = (
        [(i, 99) for i in range(200)]
        + [(99, 0)]
        + [(i, i + 1) for i in range(199)]
    )
    df = spark.createDataFrame(hub, "src long, dst long")
    plan = pagerank(df, rounds=1)._jdf.queryExecution().optimizedPlan().toString()
    assert "pmod(xxhash64" in plan
    # ...and an even ring degrades to the plain single-stage aggregate
    # (no replication cost where there is no skew).
    ring = [(i, (i + 1) % 64) for i in range(64)]
    df2 = spark.createDataFrame(ring, "src long, dst long")
    plan2 = pagerank(df2, rounds=1)._jdf.queryExecution().optimizedPlan().toString()
    assert "pmod(xxhash64" not in plan2
    # Auto result identical to the hand recurrence on the hub graph.
    assert {r.v: r.rank for r in pagerank(df, rounds=2).collect()} == _expected_ranks(
        hub, rounds=2
    )


def test_bpe_encode_merges_reduce_piece_count(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b a b a b"), (3, "c c c")],
        "doc_id long, text string",
    )
    merges = train_bpe_merges(docs, rounds=2)
    enc = {r.doc_id: r for r in apply_bpe_merges(docs, merges, rounds=2).collect()}
    # 'a b' is the most frequent pair → merged in round 1.
    assert "a_b" in enc[1].encoded
    # Piece counts never exceed the whitespace token count and shrink
    # where merges fired.
    assert enc[2].n_pieces < 6
    # Reversing the join character reconstructs the original stream.
    for row, text in ((enc[1], "a b a b c"), (enc[2], "a b a b a b"), (enc[3], "c c c")):
        assert row.encoded.replace("_", " ") == text


def test_bpe_encode_leftmost_nonoverlapping(spark):
    # 'a a a' must encode to (a_a, a) — never the overlapping (a, a_a).
    docs = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
    merges = train_bpe_merges(docs, rounds=1)
    got = apply_bpe_merges(docs, merges, rounds=1).collect()[0]
    assert got.encoded == "a_a a"
    assert got.n_pieces == 2


def test_shuffle_partitions_tolerates_auto(spark):
    # AQE-managed platforms set the conf to the literal string "auto";
    # the salting profile must fall back to defaultParallelism instead
    # of raising ValueError (round-4 advisor finding).
    from pandas_analysis_with_postgres_spark.operators.graph import (
        _shuffle_partitions,
    )

    # Spark's conf.set validates the value, so simulate a session that
    # was BUILT with the managed value (how the platforms deliver it).
    class _Conf:
        def get(self, key):
            return "auto"

    class _Ctx:
        defaultParallelism = 7

    class _Session:
        conf = _Conf()
        sparkContext = _Ctx()

    assert _shuffle_partitions(_Session()) == 7
    assert _shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
