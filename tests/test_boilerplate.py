"""remove_boilerplate_lines: cross-document repeated lines stripped,
unique content preserved in order, all-boilerplate docs survive."""

from __future__ import annotations

from pandas_analysis_with_postgres_spark.operators.dedup import (
    remove_boilerplate_lines,
)

BOILER = "cookie banner accept all terms"  # 5 tokens -> one line at tpl=5
UNIQUE = {
    1: "alpha beta gamma delta epsilon",
    2: "one two three four five",
    3: "red green blue cyan magenta",
}


def _docs(spark):
    rows = [
        # boilerplate line leads every doc; unique line follows
        (1, f"{BOILER} {UNIQUE[1]}"),
        (2, f"{BOILER} {UNIQUE[2]}"),
        (3, f"{UNIQUE[3]} {BOILER}"),
        (4, BOILER),  # all-boilerplate doc
        (5, "lonely line never repeated anywhere"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repeated_lines_removed_unique_kept_in_order(spark):
    out = {
        r.doc_id: (r.clean_text, r.n_removed_lines)
        for r in remove_boilerplate_lines(
            _docs(spark), tokens_per_line=5, min_docs=2
        ).collect()
    }
    assert out[1] == (UNIQUE[1], 1)
    assert out[2] == (UNIQUE[2], 1)
    assert out[3] == (UNIQUE[3], 1)  # order preserved: unique line led
    assert out[4] == ("", 1)  # all-boilerplate doc survives, emptied
    assert out[5] == ("lonely line never repeated anywhere", 0)


def test_min_docs_threshold(spark):
    # at min_docs=5 nothing repeats often enough: all docs untouched
    docs = _docs(spark)
    out = {
        r.doc_id: r.n_removed_lines
        for r in remove_boilerplate_lines(
            docs, tokens_per_line=5, min_docs=5
        ).collect()
    }
    assert all(v == 0 for v in out.values())


def test_short_lines_never_boilerplate(spark):
    # identical but below min_line_chars: kept
    docs = _docs(spark).sparkSession.createDataFrame(
        [(1, "ab cd"), (2, "ab cd")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.clean_text, r.n_removed_lines)
        for r in remove_boilerplate_lines(
            docs, tokens_per_line=5, min_docs=2, min_line_chars=10
        ).collect()
    }
    assert out[1] == ("ab cd", 0) and out[2] == ("ab cd", 0)
