"""Flag/derivation expressions — operators P4-P8 of SURVEY §2.2.

The reference derives 0/1 marketing flags with row-wise pandas lambdas
(``dmCustomerProc.py:70,87,95,146-163,182``) and per-topic masked
assignments (``dmCustomerProc.py:104-112,122-139``). All of them are
CASE WHEN / COALESCE / BETWEEN in disguise; expressing them as Catalyst
columns keeps them JVM-side and codegen-fused — no Python round trip.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def existence_flag(col: Column | str) -> Column:
    """``1 if notnull(x) else 0`` (reference P4, ``dmCustomerProc.py:70,87,95``).

    Typically applied to a column surviving a left join — the flag says
    "a matching row existed on the right side".
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), F.lit(1)).otherwise(F.lit(0))


def range_flag(col: Column | str, lo, hi) -> Column:
    """``1 if lo <= x <= hi else 0`` (reference P5, ``dmCustomerProc.py:182``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.between(lo, hi), F.lit(1)).otherwise(F.lit(0))


def coalesce_default(col: Column | str, default: Column | str) -> Column:
    """``x if notnull(x) else default`` (reference P8, ``dmCustomerProc.py:146-163``)."""
    c = F.col(col) if isinstance(col, str) else col
    d = F.col(default) if isinstance(default, str) else default
    return F.coalesce(c, d)


def constant_flags(df: DataFrame, names: Iterable[str], value=0) -> DataFrame:
    """Initialize many columns to one literal (reference P6,
    ``dmCustomerProc.py:102-103``)."""
    return df.withColumns({n: F.lit(value) for n in names})


def one_hot_flags(
    df: DataFrame,
    code_col: str,
    mapping: Mapping[object, str],
    value_col: str | None = None,
) -> DataFrame:
    """Per-code flag encoding (reference P7, ``dmCustomerProc.py:104-112``).

    For each ``code -> flag_name`` pair, sets ``flag_name`` to
    ``value_col`` (or 1) on rows where ``code_col == code``, else keeps
    the column's prior value (or 0 if absent). The reference does this
    with 18 ``df.loc[mask, flag] = v`` masked assignments; here each flag
    is a single ``CASE WHEN`` column — one projection, no mutation.

    When the rows are one-per-(entity, code) and you need one row per
    entity, follow with ``groupBy(entity).agg(F.max(flag)...)`` — the
    pivot-style collapse (see plans.reference_queries q13).
    """
    code = F.col(code_col)
    cols = {}
    for code_value, flag_name in mapping.items():
        prior = F.col(flag_name) if flag_name in df.columns else F.lit(0)
        val = F.col(value_col) if value_col else F.lit(1)
        cols[flag_name] = F.when(code == F.lit(code_value), val).otherwise(prior)
    return df.withColumns(cols)
