"""Set operators — SURVEY §2.8 (D1, U1, X1) and change detection.

The reference's ``df.append`` (pandas ≤1.x UNION ALL by name with NaN
fill, ``dmCustomerProc.py:188,202,224,232``) and its index-aligned
"anti-diff" (``dmCustomerProc.py:208`` — intended semantics: EXCEPT)
become explicit, order-insensitive set operations here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_by_name(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL aligned on column names, NULL-filling missing columns
    (reference U1, ``dmCustomerProc.py:188,202,224,232``).

    pandas fills NaN; Spark fills NULL — one null semantic instead of
    two (SURVEY §1). Unioning is a zero-shuffle plan node.
    """
    return a.unionByName(b, allowMissingColumns=True)


def except_all_on(
    a: DataFrame,
    b: DataFrame,
    *,
    ignore: list[str] | None = None,
) -> DataFrame:
    """EXCEPT ALL, optionally ignoring bookkeeping columns (intended
    semantics of reference X1, ``dmCustomerProc.py:208`` — its
    ``~isin(...).all(axis=1)`` is index-aligned, verified not set-based;
    the intent is "rows new or changed vs. current history").

    ``ignore`` drops SCD2 bookkeeping columns from the right side before
    comparing (they never exist on the staged left side).
    """
    right = b.drop(*ignore) if ignore else b
    return a.exceptAll(right.select(*a.columns))


def changed_rows(
    staged: DataFrame,
    current: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows of ``staged`` that are new or differ from ``current`` on the
    compare columns — the keyed, null-safe form of X1.

    Null-safe equality (``<=>``) is essential: pandas ``==`` on NaN is
    False (so NaN-vs-NaN counts as *changed*), SQL ``=`` on NULL is
    NULL. We define NULL <=> NULL as *unchanged*, the SCD2-correct
    reading, and pin it in tests (SURVEY §5.3).

    One shuffle join on ``key``; at scale, if ``current`` is a dimension
    much smaller than staged input, Catalyst/AQE will broadcast it.
    """
    if compare_cols is None:
        compare_cols = [c for c in staged.columns if c != key]
    cur = current.select(key, *compare_cols)
    cur = cur.select([F.col(c).alias(f"__cur_{c}") for c in cur.columns])
    joined = staged.join(cur, staged[key] == F.col(f"__cur_{key}"), "left")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__cur_{c}"))
    is_new = F.col(f"__cur_{key}").isNull()
    out = joined.filter(is_new | ~same)
    return out.drop(*[f"__cur_{c}" for c in [key, *compare_cols]])
