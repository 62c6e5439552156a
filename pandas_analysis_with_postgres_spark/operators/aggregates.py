"""Aggregation operators — SURVEY §2.5 (A1-A3).

The reference computes group counts *before* joining them onto the wide
frame (``dmCustomerProc.py:52-53,58-59``) — a pre-aggregation pattern we
keep: aggregating first shrinks the shuffle and the join input. Spark
additionally gives partial (map-side) aggregation for free, so each
executor combines locally before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_count(df: DataFrame, keys: list[str] | str, name: str) -> DataFrame:
    """COUNT(*) per key (reference A1/A2, ``dmCustomerProc.py:52,58``).

    ``F.count(F.lit(1))`` counts rows like pandas ``.size()`` — including
    rows with NULLs in non-key columns. Divergence pinned in tests:
    pandas *drops* NaN group keys, Spark (and SQL) keep NULL keys.
    """
    if isinstance(keys, str):
        keys = [keys]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(name))


def global_agg_col(df: DataFrame, agg: Column, name: str) -> DataFrame:
    """Attach a whole-table aggregate to every row (reference A3,
    ``dmCustomerProc.py:104,123-139`` — ``Series.max()`` used as a
    fill/default value).

    Implemented as a broadcast cross join of the 1-row aggregate, not a
    ``Window.partitionBy()`` over nothing: an unpartitioned window pulls
    the whole table into ONE task, which is exactly the single-node
    bottleneck we're designing away from at 100 TB. The 1-row aggregate
    is computed with full parallelism (partial aggs → 1-row exchange),
    then broadcast back.
    """
    one_row = df.agg(agg.alias(name))
    return df.crossJoin(F.broadcast(one_row))
