"""Postgres dialect renderings + precision round-trips WITHOUT a live
server (r9 verdict ask #7).

No Postgres exists in this environment, but the engine's JDBC sink
relies on Spark's PostgresDialect to render DDL types on overwrite —
pin those renderings here so a Spark upgrade that changes them
surfaces loudly instead of silently altering warehouse schemas. The
value-precision round-trips (NUMERIC scale, timestamp microseconds)
run live through embedded Derby — the same Spark JDBC write/read code
paths Postgres would exercise, dialect string aside.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import types as T

from pandas_analysis_with_postgres_spark.sources.jdbc import (
    JdbcConfig,
    PostgresConfig,
    read_table,
    write_table,
)

DERBY = JdbcConfig(
    jdbc_url="jdbc:derby:memory:graft_dialect;create=true",
    driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
)


def _pg_ddl(spark, dt) -> str:
    """The DDL type Spark's PostgresDialect renders for a Catalyst
    type (falling back to the common JDBC mapping, as JdbcUtils
    does)."""
    jvm = spark.sparkContext._jvm
    dialect = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(
        PostgresConfig(host="h").url
    )
    jdt = spark._jsparkSession.parseDataType(dt.json())
    opt = dialect.getJDBCType(jdt)
    if opt.isDefined():
        return opt.get().databaseTypeDefinition()
    common = (
        jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
        .getCommonJDBCType(jdt)
    )
    return common.get().databaseTypeDefinition()


def test_postgres_dialect_ddl_renderings(spark):
    expected = {
        T.StringType(): "TEXT",
        T.BinaryType(): "BYTEA",
        T.BooleanType(): "BOOLEAN",
        T.ByteType(): "SMALLINT",
        T.ShortType(): "SMALLINT",
        T.IntegerType(): "INTEGER",
        T.LongType(): "BIGINT",
        T.FloatType(): "FLOAT4",
        T.DoubleType(): "FLOAT8",
        T.DecimalType(18, 2): "NUMERIC(18,2)",
        T.DecimalType(38, 18): "NUMERIC(38,18)",
        T.DateType(): "DATE",
        # session-TZ timestamps land as timestamptz — the rendering
        # the UTC-pinned session (session.py) depends on for
        # cluster-invariant warehouse semantics
        T.TimestampType(): "TIMESTAMP WITH TIME ZONE",
    }
    got = {dt: _pg_ddl(spark, dt) for dt in expected}
    assert got == expected


def test_numeric_precision_roundtrip_derby(spark):
    # Derby caps DECIMAL precision at 31; the scale discipline is the
    # same NUMERIC(p,s) contract the Postgres rendering pins above
    rows = [
        (1, Decimal("12345678901234567890.1234567890")),
        (2, Decimal("-0.0000000001")),
        (3, Decimal("99999999999999999999.9999999999")),
    ]
    df = spark.createDataFrame(rows, "k int, amt decimal(30,10)")
    write_table(df, DERBY, "t_num", schema=None, mode="overwrite")
    back = read_table(spark, DERBY, "t_num", schema=None)
    got = {r[0]: r[1] for r in back.select("k", "amt").collect()}
    assert got == {k: v for k, v in rows}
    # the declared scale survives the round-trip (no silent float hop)
    amt_type = dict(
        (f.name.lower(), f.dataType) for f in back.schema.fields
    )["amt"]
    assert amt_type == T.DecimalType(30, 10)


def test_timestamp_micros_roundtrip_derby(spark):
    ts = [
        (1, datetime.datetime(2024, 3, 1, 12, 34, 56, 789123)),
        (2, datetime.datetime(1999, 12, 31, 23, 59, 59, 999999)),
    ]
    df = spark.createDataFrame(ts, "k int, ts timestamp")
    write_table(df, DERBY, "t_ts", schema=None, mode="overwrite")
    back = read_table(spark, DERBY, "t_ts", schema=None)
    got = {r[0]: r[1] for r in back.select("k", "ts").collect()}
    # microsecond precision survives the JDBC hop exactly
    assert got == {k: v for k, v in ts}


def test_date_boundaries_roundtrip_derby(spark):
    rows = [
        (1, datetime.date(1, 1, 1)),
        (2, datetime.date(9999, 12, 31)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "k int, d date")
    write_table(df, DERBY, "t_dates", schema=None, mode="overwrite")
    back = read_table(spark, DERBY, "t_dates", schema=None)
    got = {r[0]: r[1] for r in back.select("k", "d").collect()}
    assert got == {k: v for k, v in rows}
