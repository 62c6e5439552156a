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


def test_oov_scoring_matches_reference_left_join_semantics(spark):
    """The advisor-flagged contract: weights trained ELSEWHERE (here: a
    subset excluding doc 5) still score every document — OOV tokens
    contribute 0, n_tokens counts all tokens, and a fully-OOV document
    is gated on the prior instead of vanishing (the stream_quality_gate
    use case). Checked against the same independent arithmetic model
    restricted to the training subset."""
    docs = _frame(spark)
    train = docs.filter(F.col("doc_id") != 5)
    weights = train_token_llr(train, F.col("y"))
    prior = class_prior(train, F.col("y"))
    # score the full corpus PLUS a document that is 100% OOV
    target = docs.select("doc_id", "text").union(
        spark.createDataFrame([(6, "zz qq xx")], "doc_id long, text string")
    )
    got = {
        r.doc_id: (r.n_tokens, r.score)
        for r in score_docs(target, weights, prior).collect()
    }
    # reference arithmetic over the training subset only
    sub = [d for d in DOCS if d[0] != 5]
    pos_tok, neg_tok = {}, {}
    for _, t, y in sub:
        for w in t.split(" "):
            (pos_tok if y else neg_tok)[w] = (pos_tok if y else neg_tok).get(w, 0) + 1
    vocab = set(pos_tok) | set(neg_tok)
    pt, nt, v = sum(pos_tok.values()), sum(neg_tok.values()), len(vocab)
    llr = {
        w: math.log((pos_tok.get(w, 0) + 1) / (pt + v))
        - math.log((neg_tok.get(w, 0) + 1) / (nt + v))
        for w in vocab
    }
    n_pos = sum(1 for d in sub if d[2])
    ln_prior = math.log((n_pos + 1) / (len(sub) - n_pos + 1))
    cases = [(i, t) for i, t, _ in DOCS] + [(6, "zz qq xx")]
    assert set(got) == {i for i, _ in cases}  # every doc gets a row
    for doc_id, text in cases:
        toks = text.split(" ")
        expect = ln_prior + sum(llr.get(w, 0.0) for w in toks)
        n, score = got[doc_id]
        assert n == len(toks), doc_id  # ALL tokens counted, OOV included
        assert abs(score - round(expect, 8)) < 1e-7, doc_id
    # the fully-OOV doc scores exactly the prior
    assert abs(got[6][1] - round(ln_prior, 8)) < 1e-12
