"""ANN quality gate: recall@k of the approximate paths against the
exact brute-force ground truth on the fixture embeddings.

An approximate index whose recall silently degrades is worse than a
slow exact scan — this pins the measured tradeoff so tuning (LSH
tables/bits, IVF cells/probes) stays an informed decision:

- ``ann_topk`` (the default front door, = IVF probe-4-of-16) must hold
  recall ≥ 0.7 (measured 0.92 on the fixture).
- ``lsh_topk`` with Hamming-1 multiprobe (its default) must hold
  recall ≥ 0.6 (measured 0.82; single-probe measures 0.42, the
  monolithic-bucket regression 0.02).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators import similarity as SIM
from pandas_analysis_with_postgres_spark.sources.parquet import load_table

from .conftest import SF_ORACLE

K = 5
N_QUERIES = 10


def _pairs(df) -> set[tuple[int, int]]:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


@pytest.fixture(scope="module")
def truth(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    return _pairs(SIM.cosine_topk(emb, q, k=K))


def _recall(spark, fn, truth) -> float:
    emb = load_table(spark, SF_ORACLE, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    got = _pairs(fn(emb, q, k=K))
    return len(got & truth) / len(truth)


def test_default_ann_recall_floor(spark, truth):
    r = _recall(spark, SIM.ann_topk, truth)
    assert r >= 0.7, f"default ANN (ivf_topk) recall@{K} = {r:.2f} < 0.7"


def test_lsh_recall_reported(spark, truth):
    r = _recall(spark, SIM.lsh_topk, truth)
    # Multiprobe default measures 0.82 here; single-probe 0.42; the
    # monolithic 16-bit-bucket regression 0.02.
    assert r >= 0.6, f"lsh_topk recall@{K} = {r:.2f} — probe structure regressed"
