"""Stop-shingle guard in ngram_jaccard_pairs: the self-equi-join is
quadratic per shingle value, so boilerplate shingles shared corpus-wide
must be dropped before the join — bounded pair work on skewed corpora,
classical Jaccard over the retained shingle set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators.dedup import (
    ngram_jaccard_pairs,
)


BOILER = "all rights reserved by the example publishing corporation inc"


@pytest.fixture()
def skewed(spark):
    # 200 documents sharing one boilerplate tail; two true near-dups
    rows = [
        (i, f"unique body text number {i} alpha beta {BOILER}")
        for i in range(200)
    ]
    rows.append((900, "the quick brown fox jumps over the lazy sleeping dog"))
    rows.append((901, "the quick brown fox jumps over the lazy sleepy dog"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_bounds_boilerplate_pair_work(spark, skewed):
    # With the cap, the 200-doc boilerplate block contributes NO pairs:
    # its shared shingles all exceed df=50, and what remains of each
    # doc is unique. Without it, the block alone is 200·199/2 pairs
    # flowing through the co-occurrence aggregate.
    capped = ngram_jaccard_pairs(
        skewed, threshold=0.05, max_shingle_df=50
    ).collect()
    pairs = {(r.doc_a, r.doc_b) for r in capped}
    assert all(not (a < 200 and b < 200) for a, b in pairs)
    # the true near-dup pair survives (its shingles are rare)
    assert (900, 901) in pairs


def test_capped_jaccard_is_over_retained_shingles(spark, skewed):
    # Uncapped (opt-out) on the same corpus: boilerplate pairs appear
    uncapped = ngram_jaccard_pairs(
        skewed, threshold=0.05, max_shingle_df=None
    ).collect()
    pairs = {(r.doc_a, r.doc_b) for r in uncapped}
    assert any(a < 200 and b < 200 for a, b in pairs)
    # and the near-dup pair's value matches hand Jaccard over ALL
    # shingles, while the capped value matches Jaccard over retained
    # ones — same here since their shingles are all rare
    j_unc = {(r.doc_a, r.doc_b): r.jaccard for r in uncapped}[(900, 901)]
    capped = ngram_jaccard_pairs(skewed, threshold=0.05, max_shingle_df=50)
    j_cap = {(r.doc_a, r.doc_b): r.jaccard for r in capped.collect()}[
        (900, 901)
    ]
    assert j_unc == j_cap
    toks_a = "the quick brown fox jumps over the lazy sleeping dog".split()
    toks_b = "the quick brown fox jumps over the lazy sleepy dog".split()
    sh_a = {tuple(toks_a[i : i + 3]) for i in range(len(toks_a) - 2)}
    sh_b = {tuple(toks_b[i : i + 3]) for i in range(len(toks_b) - 2)}
    expect = len(sh_a & sh_b) / len(sh_a | sh_b)
    assert abs(j_cap - expect) < 1e-12


def test_docs_fully_boilerplate_drop_out(spark):
    # documents whose every shingle is capped simply vanish from the
    # pair universe (no NULL-count or divide-by-zero artifacts)
    rows = [(i, BOILER) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(df, threshold=0.0, max_shingle_df=10)
    assert out.count() == 0
