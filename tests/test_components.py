"""Unit pins for the connected-components dedup decision (q49's core):
label propagation must resolve transitive chains, leave separate
components apart, and refuse to return un-converged labels.
"""

from __future__ import annotations

import pytest

from pandas_analysis_with_postgres_spark.operators.dedup import connected_components


def _labels(df) -> set[tuple[int, int]]:
    return {(r["id"], r["comp"]) for r in df.collect()}


def test_chain_and_separate_components(spark):
    # 1-2-3-4 is one component (transitively, no direct 1-4 pair);
    # 10-11 is another. Every node labels with its component minimum.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    assert _labels(connected_components(pairs)) == {
        (1, 1),
        (2, 1),
        (3, 1),
        (4, 1),
        (10, 10),
        (11, 10),
    }


def test_star_resolves_in_one_round(spark):
    pairs = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3)], "doc_a long, doc_b long"
    )
    assert _labels(connected_components(pairs)) == {
        (1, 1),
        (2, 1),
        (3, 1),
        (5, 1),
    }


def test_unconverged_raises_not_mislabels(spark):
    # A 4-chain needs >1 round; max_iter=1 must raise, never silently
    # return labels where 4 is not yet in component 1.
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)
