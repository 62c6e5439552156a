"""Linear text-quality classifier, trained and applied in-plan.

The fasttext-shaped quality gate every LLM data pipeline runs (score
every document with a linear model over token features, keep the high
scorers) — here as its exactly-reproducible core: a multinomial naive
Bayes / log-linear model whose weights are token log-likelihood ratios
learned from a labeled split of the corpus itself, expressed entirely
in Catalyst.

Reference intent: the reference's quality flags are hand-written
``.apply`` heuristics (``dmCustomerProc.py`` flag block); this is the
learned-model generalization a training-data pipeline needs.

Scale shape (100 TB):

- training = ONE shuffle (token counts grouped by token) + two tiny
  broadcast frames (class totals, vocab size). The weight table is
  O(vocab), not O(corpus).
- scoring = one shuffle join of exploded tokens against the weight
  table (vocab-bounded; broadcastable when the vocab is small) + one
  per-document aggregation. No Python, no UDFs.
- the per-document score is a STRICTLY SEQUENTIAL fold over tokens in
  position order (the q70 pattern), so the double sum is
  order-deterministic and SQL-replayable despite being a reduction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def train_token_llr(
    docs: DataFrame,
    label: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn per-token weights ``llr(t) = ln P(t|pos) - ln P(t|neg)``
    (add-one smoothed over the corpus vocabulary) from ``docs`` labeled
    by the boolean ``label`` column expression.

    Returns a vocab-sized frame ``(t, llr)`` — the model artifact. At
    100 TB this is the table you persist and re-broadcast at scoring
    time; counts are exact integers so retraining is reproducible.
    """
    tok = docs.select(
        label.alias("__y"), F.explode(F.split(F.col(text_col), " ")).alias("t")
    )
    counts = tok.groupBy("t").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("pc"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).alias("nc"),
    )
    totals = tok.agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("pos_total"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).alias("neg_total"),
        F.count_distinct("t").alias("v"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "t",
        (
            F.log(
                (F.col("pc") + F.lit(1)).cast("double")
                / (F.col("pos_total") + F.col("v")).cast("double")
            )
            - F.log(
                (F.col("nc") + F.lit(1)).cast("double")
                / (F.col("neg_total") + F.col("v")).cast("double")
            )
        ).alias("llr"),
    )


def score_docs(
    docs: DataFrame,
    weights: DataFrame,
    prior: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document under a trained weight table: ``score =
    ln_prior + Σ llr(token)`` folded in position order, rounded to 8
    decimals (absorbs the ≤1-ulp ln() disagreement between engines —
    same rationale as q70). ``prior`` is a one-row frame with a
    ``ln_prior`` column (broadcast). Tokens absent from the weight
    table contribute 0 (the standard ignore-OOV choice, via LEFT join
    + coalesce) — crucially the DOCUMENT still gets a row, scored at
    the prior, so an out-of-vocabulary document streaming through
    :func:`~..streaming.streams.stream_quality_gate` is gated on its
    prior rather than silently vanishing. With weights trained on the
    scored corpus itself the OOV set is empty and the LEFT join
    degenerates to the inner one (the z02 oracle's shape).

    Output: ``(id_col, n_tokens, score, is_positive)`` — ``n_tokens``
    counts ALL document tokens, in- or out-of-vocabulary.
    """
    tok = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "t"),
    )
    folded = (
        tok.join(weights, "t", "left")
        .withColumn("llr", F.coalesce("llr", F.lit(0.0)))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "llr"))),
                    lambda s: s.getField("llr"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__s"),
        )
    )
    scored = folded.crossJoin(F.broadcast(prior)).select(
        id_col,
        "n_tokens",
        F.round(F.col("ln_prior") + F.col("__s"), 8).alias("score"),
        (F.col("ln_prior") + F.col("__s") > 0).alias("is_positive"),
    )
    return scored


def class_prior(docs: DataFrame, label: Column) -> DataFrame:
    """One-row ``ln_prior = ln((n_pos+1)/(n_neg+1))`` frame."""
    return docs.agg(
        F.log(
            (F.sum(F.when(label, 1).otherwise(0)) + F.lit(1)).cast("double")
            / (F.sum(F.when(label, 0).otherwise(1)) + F.lit(1)).cast("double")
        ).alias("ln_prior")
    )
