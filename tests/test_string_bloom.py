"""String-key Bloom point lookups: bloom_cols accepts string columns
(crc32 of UTF-8 bytes into the same integer hash family); probes prune
directories driver-side; absent keys read zero data; false positives
scan and are removed by the caller's real filter."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    _bloom_may_contain,
    read_manifest,
    read_snapshot,
    write_snapshot,
)

NAMES = [f"key-{i:04d}" for i in range(200)]


@pytest.fixture()
def tbl(spark, tmp_path):
    rows = [(i, NAMES[i], i % 8) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, name string, b long")
    path = str(tmp_path / "tbl")
    write_snapshot(df.repartition("b"), path, "b", bloom_cols=["name"])
    return path


def test_present_key_reads_only_surviving_directories(spark, tbl):
    name = NAMES[37]  # lives in b=5
    scan = read_snapshot(spark, tbl, point_lookups={"name": name})
    touched = {f.split("b=")[1].split("/")[0] for f in scan.inputFiles()}
    assert "5" in touched
    # the bloom must rule out most of the other 7 buckets (4096-bit
    # bitmap over 25 keys/bucket: FP rate is tiny; allow 2 for luck)
    assert len(touched) <= 3
    got = scan.filter(F.col("name") == name).collect()
    assert [(r.k, r.b) for r in got] == [(37, 5)]


def test_absent_key_returns_empty_with_schema(spark, tbl):
    scan = read_snapshot(spark, tbl, point_lookups={"name": "nope"})
    assert scan.count() == 0
    assert scan.columns == ["k", "name", "b"]


def test_probe_matches_write_side_hash(spark, tbl):
    # the manifest bitmap, probed with zlib.crc32, admits every
    # written key of its partition and (statistically) refuses others
    man = read_manifest(tbl)
    bm = man["blooms"]["b=0"]["name"]
    for i in range(0, 200, 8):  # keys of b=0
        assert _bloom_may_contain(bm, NAMES[i])
    misses = sum(
        _bloom_may_contain(bm, f"ghost-{j}") for j in range(200)
    )
    assert misses <= 5  # ~4096 bits / 100 positions: FP rate ≪ 3%
    # parity with an explicit crc32 probe
    assert _bloom_may_contain(bm, NAMES[0]) == _bloom_may_contain(
        bm, zlib.crc32(NAMES[0].encode("utf-8"))
    )


def test_mixed_int_and_string_bloom_cols(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"n{i}", i % 4) for i in range(40)], "k long, name string, b long"
    )
    path = str(tmp_path / "mix")
    write_snapshot(df, path, "b", bloom_cols=["k", "name"])
    scan = read_snapshot(
        spark, path, point_lookups={"k": 13, "name": "n13"}
    ).filter("k = 13")
    assert scan.collect()[0].name == "n13"
    # unsupported bloom type still refuses
    bad = spark.createDataFrame([(1.5, 0)], "x double, b long")
    with pytest.raises(ValueError, match="integral or string"):
        write_snapshot(bad, str(tmp_path / "bad"), "b", bloom_cols=["x"])


def test_null_keys_never_set_bits_and_never_probe(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None, 0), (2, "real", 0)], "k long, name string, b long"
    )
    path = str(tmp_path / "nulls")
    write_snapshot(df, path, "b", bloom_cols=["name"])
    # a None probe value disables pruning (scan everything) rather
    # than inventing a hash for NULL
    scan = read_snapshot(spark, path, point_lookups={"name": None})
    assert scan.count() == 2
