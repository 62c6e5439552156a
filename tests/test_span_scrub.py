"""scrub_duplicate_spans: sliding-window duplicate passages excised at
any alignment, overlapping hits merged, short/fully-covered/within-doc
cases all exact."""

from __future__ import annotations

from pandas_analysis_with_postgres_spark.operators.dedup import (
    scrub_duplicate_spans,
)

# 4-token span duplicated across docs 1 and 2 at DIFFERENT alignments
# (offset 0 in doc 1, offset 2 in doc 2) — the case line-block dedup
# (z01) structurally cannot catch.
DUP = "the quick brown fox"


def _docs(spark):
    rows = [
        (1, f"{DUP} jumps over lazy dogs"),
        (2, f"once upon {DUP} again tonight"),
        (3, "completely original text with no repeats here"),
        (4, "tiny doc"),  # shorter than the window: passes through
        (5, DUP),  # exactly one window, fully covered
        (6, f"{DUP} padding {DUP}"),  # within-doc repeat, both cut
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, **kw):
    return {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in scrub_duplicate_spans(_docs(spark), span_tokens=4, **kw)
        .collect()
    }


def test_cross_doc_any_alignment_and_edge_docs(spark):
    out = _run(spark)
    assert out[1] == ("jumps over lazy dogs", 4)
    assert out[2] == ("once upon again tonight", 4)
    assert out[3] == ("completely original text with no repeats here", 0)
    assert out[4] == ("tiny doc", 0)  # < span_tokens: verbatim
    assert out[5] == ("", 4)  # fully covered doc survives, emptied
    # within-doc repetition: every occurrence cut (deduplicate-all),
    # the non-repeated middle token survives
    assert out[6] == ("padding", 8)
    assert len(out) == 6  # every input doc comes back


def test_overlapping_hits_merge_not_double_count(spark):
    # "a b c d e" in two docs: windows (a b c d) and (b c d e) both
    # duplicate; coverage merges to 5 excised tokens, not 8.
    rows = [(1, "a b c d e tail one"), (2, "head a b c d e")]
    df = _docs(spark).sparkSession.createDataFrame(
        rows, "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in scrub_duplicate_spans(df, span_tokens=4).collect()
    }
    assert out[1] == ("tail one", 5)
    assert out[2] == ("head", 5)


# --------------------------------------------------- property vs ref

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    global _spark
    _spark = spark
    yield


_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_text = st.lists(_word, min_size=1, max_size=10).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=6)

W = 3  # span tokens


def _ref_scrub(texts):
    """Independent per-doc reimplementation: sliding W-token spans,
    any span occurring >=2 times anywhere is cut everywhere, coverage
    merged at token grain."""
    occ = {}
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    for i, ts in toks.items():
        for p in range(len(ts) - W + 1):
            occ.setdefault(" ".join(ts[p : p + W]), []).append((i, p))
    covered = {i: set() for i in toks}
    for span, hits in occ.items():
        if len(hits) >= 2:
            for i, p in hits:
                covered[i].update(range(p, p + W))
    out = {}
    for i, ts in toks.items():
        kept = [t for j, t in enumerate(ts) if j not in covered[i]]
        out[i] = (" ".join(kept), len(ts) - len(kept))
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_corpus)
def test_scrub_matches_reference(texts):
    df = _spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in scrub_duplicate_spans(df, span_tokens=W).collect()
    }
    assert got == _ref_scrub(texts)
