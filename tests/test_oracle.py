"""Local mirror of the driver's DuckDB differential harness.

For every query with an oracle: run the Spark plan and the DuckDB SQL
at sf0.01, then compare row count, column names, and an
order-insensitive value frame (sorted columns, sorted rows, NaN-safe).
This is deliberately stricter than "close enough" — the driver
hash-compares, so equality must be exact up to float representation.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from pandas_analysis_with_postgres_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    odf = duck.execute(ORACLES[name]).df()

    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    s = _normalize(sdf)
    o = _normalize(odf)
    for col in s.columns:
        sv, ov = list(s[col]), list(o[col])
        mism = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, ov)) if not _values_equal(x, y)
        ]
        assert not mism, f"{name}.{col}: first mismatches {mism[:5]}"


def test_all_queries_run_smoke(spark):
    """Queries without oracles still must execute and return a schema."""
    no_oracle = set(QUERIES) - set(ORACLES)
    for name in sorted(no_oracle):
        df = QUERIES[name](spark, SF_ORACLE)
        assert df.columns, name
        assert df.count() >= 0, name
