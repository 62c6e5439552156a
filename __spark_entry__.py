"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship wide-customer enrichment query
(reference E1 in miniature) on sf0.001. ``queries()``/``oracle_sql()``
expose the full declared surface from
``pandas_analysis_with_postgres_spark.plans`` — every operator of
SURVEY §2 plus the LLM-pipeline extensions, each with a DuckDB oracle
except the genuinely non-SQL ops (mapInPandas featurize), which get the
weaker rows-only check by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pandas_analysis_with_postgres_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q02_customer_profile"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omissions → rows-only)."""
    return dict(ORACLES)
