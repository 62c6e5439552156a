"""Trained naive-Bayes quality classifier: weights and scores checked
against an independent per-token arithmetic reimplementation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators.classifier import (
    class_prior,
    score_docs,
    train_token_llr,
)

DOCS = [
    (1, "good clean prose text here", True),
    (2, "good text with clean words", True),
    (3, "spam spam buy now spam", False),
    (4, "buy spam now", False),
    (5, "clean prose with words here", True),
]


def _frame(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    ).join(
        spark.createDataFrame(
            [(i, y) for i, t, y in DOCS], "doc_id long, y boolean"
        ),
        "doc_id",
    )


def _reference_model():
    pos_tok, neg_tok = {}, {}
    for _, t, y in DOCS:
        for w in t.split(" "):
            (pos_tok if y else neg_tok)[w] = (pos_tok if y else neg_tok).get(w, 0) + 1
    vocab = set(pos_tok) | set(neg_tok)
    pt, nt = sum(pos_tok.values()), sum(neg_tok.values())
    v = len(vocab)
    llr = {
        w: math.log((pos_tok.get(w, 0) + 1) / (pt + v))
        - math.log((neg_tok.get(w, 0) + 1) / (nt + v))
        for w in vocab
    }
    n_pos = sum(1 for d in DOCS if d[2])
    prior = math.log((n_pos + 1) / (len(DOCS) - n_pos + 1))
    return llr, prior


def test_weights_match_reference_arithmetic(spark):
    docs = _frame(spark)
    got = {
        r.t: r.llr for r in train_token_llr(docs, F.col("y")).collect()
    }
    llr, _ = _reference_model()
    assert set(got) == set(llr)
    for w in llr:
        assert abs(got[w] - llr[w]) < 1e-12, w


def test_scores_separate_classes_and_match_reference(spark):
    docs = _frame(spark)
    weights = train_token_llr(docs, F.col("y"))
    prior = class_prior(docs, F.col("y"))
    got = {
        r.doc_id: (r.score, r.is_positive)
        for r in score_docs(docs, weights, prior).collect()
    }
    llr, ln_prior = _reference_model()
    for doc_id, text, y in DOCS:
        expect = ln_prior + sum(llr[w] for w in text.split(" "))
        score, is_pos = got[doc_id]
        assert abs(score - round(expect, 8)) < 1e-7, doc_id
        assert is_pos == y, doc_id  # a separable toy corpus classifies itself


def test_no_python_row_eval(spark):
    docs = _frame(spark)
    weights = train_token_llr(docs, F.col("y"))
    plan = (
        score_docs(docs, weights, class_prior(docs, F.col("y")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_oov_document_scores_at_prior_not_dropped(spark):
    docs = _frame(spark)
    weights = train_token_llr(docs, F.col("y"))
    prior = class_prior(docs, F.col("y"))
    oov = spark.createDataFrame(
        [(99, "entirely unseen vocabulary tokens")], "doc_id long, text string"
    )
    got = score_docs(oov, weights, prior).collect()
    assert len(got) == 1
    _, ln_prior = _reference_model()
    r = got[0]
    assert r.n_tokens == 4  # ALL tokens counted, not just in-vocab
    assert abs(r.score - round(ln_prior, 8)) < 1e-7
