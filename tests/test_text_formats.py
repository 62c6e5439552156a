"""Round-trip and quarantine tests for the CSV/JSONL landing-zone
sources (sources/text_formats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.parquet import load_table
from pandas_analysis_with_postgres_spark.sources.text_formats import (
    CORRUPT_COL,
    quarantine_split,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

from .conftest import SF_ORACLE

ORDERS_DDL = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderpriority string"
)


def _orders(spark):
    return load_table(spark, SF_ORACLE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


def _same(a, b) -> bool:
    return (
        a.count() == b.count()
        and a.exceptAll(b).count() == 0
        and b.exceptAll(a).count() == 0
    )


def test_csv_round_trip(spark, tmp_path):
    src = _orders(spark)
    path = str(tmp_path / "orders_csv")
    write_csv(src, path)
    back = read_csv(spark, path, ORDERS_DDL)
    assert _same(src, back)


def test_jsonl_round_trip(spark, tmp_path):
    src = _orders(spark)
    path = str(tmp_path / "orders_jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, ORDERS_DDL)
    assert _same(src, back)


def test_csv_corrupt_rows_quarantined(spark, tmp_path):
    p = tmp_path / "drop"
    p.mkdir()
    (p / "part-000.csv").write_text(
        "o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderpriority\n"
        "1,10,O,100.5,1-URGENT\n"
        "not_a_number,11,F,7.25,2-HIGH\n"
        "3,12,P,9.75,3-MEDIUM\n"
    )
    df = read_csv(spark, str(p), ORDERS_DDL, capture_corrupt=True)
    good, bad, cached = quarantine_split(df)
    assert good.count() == 2
    assert CORRUPT_COL not in good.columns
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0][CORRUPT_COL]
    assert cached.storageLevel.useMemory  # handle really is the cached parse
    cached.unpersist()
    assert not cached.storageLevel.useMemory


def test_jsonl_corrupt_rows_quarantined(spark, tmp_path):
    p = tmp_path / "jdrop"
    p.mkdir()
    (p / "part-000.json").write_text(
        '{"o_orderkey": 1, "o_custkey": 10, "o_orderstatus": "O", '
        '"o_totalprice": 100.5, "o_orderpriority": "1-URGENT"}\n'
        "this is not json\n"
        '{"o_orderkey": 3, "o_custkey": 12, "o_orderstatus": "P", '
        '"o_totalprice": 9.75, "o_orderpriority": "3-MEDIUM"}\n'
    )
    df = read_jsonl(spark, str(p), ORDERS_DDL, capture_corrupt=True)
    from pandas_analysis_with_postgres_spark.sources.text_formats import quarantined

    with quarantined(df) as (good, bad):
        assert good.count() == 2
        assert bad.count() == 1
    # context exit unpersisted the shared parse
    assert not df.storageLevel.useMemory
