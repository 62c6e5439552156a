"""Window operators — SURVEY §2.6 (W1-W2) + deterministic dedup (D2).

The reference's entire window surface is "dense-rank per group, keep
rank 1" (``dmCustomerProc.py:65-67,75-77``) plus an order-dependent
``drop_duplicates(subset=...)`` (``dmCustomerProc.py:101``). Spark frames
are unordered multisets, so "first row in frame order" must become an
explicit tiebreak ordering — the window idiom below is the deterministic
re-derivation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RANKERS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def top1_per_group(
    df: DataFrame,
    partition_by: list[str] | str,
    order_by: list[Column | str],
    *,
    method: str = "dense_rank",
    keep_rank_col: bool = False,
) -> DataFrame:
    """Greatest-n-per-group, n=1 (reference W1/W2,
    ``dmCustomerProc.py:65-67,75-77``: rank('dense', ascending=False)
    then ``rank == 1.0``).

    ``dense_rank`` reproduces the reference exactly (ties all kept);
    ``row_number`` is the pick-exactly-one variant — pass a tiebreak
    column in ``order_by`` to make it deterministic.

    Scale note: this is one shuffle on ``partition_by`` and no join —
    preferable to the self-join-on-max idiom which shuffles twice. A
    skewed partition key is the main hazard; AQE skew handling applies
    only to joins, so for pathological keys pre-salt before calling.
    """
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    ranker = _RANKERS[method]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn("__rnk", ranker().over(w)).filter(F.col("__rnk") == 1)
    if keep_rank_col:
        return out.withColumnRenamed("__rnk", "rnk")
    return out.drop("__rnk")


def keep_first_dedup(
    df: DataFrame,
    keys: list[str] | str,
    order_by: list[Column | str],
) -> DataFrame:
    """Deterministic keyed dedup (reference D2,
    ``dmCustomerProc.py:101`` — ``drop_duplicates(subset='cust_id')``
    keeps the first row *in frame order*, a concept Spark doesn't have).

    ``dropDuplicates`` in Spark keeps an arbitrary row per key; this
    version pins the survivor with an explicit ``order_by`` tiebreak via
    ``row_number() == 1``, which is what the DuckDB oracle can also
    express — nondeterminism is a correctness bug under a hash-compare
    harness.
    """
    if isinstance(keys, str):
        keys = [keys]
    return top1_per_group(df, keys, order_by, method="row_number")
