"""WebDataset tar shards: deterministic framing, round-trip, corrupt
rejection."""

from __future__ import annotations

import hashlib

import pytest

from pandas_analysis_with_postgres_spark.sources.webdataset import (
    pack_webdataset,
    unpack_webdataset,
)


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i} body") for i in range(10)], "doc_id long, text string"
    )


def test_shards_are_byte_deterministic(spark):
    docs = _docs(spark)
    h1 = {
        r.shard: hashlib.sha256(bytes(r.payload)).hexdigest()
        for r in pack_webdataset(docs, samples_per_shard=4).collect()
    }
    h2 = {
        r.shard: hashlib.sha256(bytes(r.payload)).hexdigest()
        for r in pack_webdataset(docs, samples_per_shard=4).collect()
    }
    assert h1 == h2
    assert set(h1) == {0, 1, 2}  # ids 0-3, 4-7, 8-9


def test_roundtrip_members(spark):
    docs = _docs(spark)
    members = unpack_webdataset(
        pack_webdataset(docs, samples_per_shard=4)
    ).collect()
    assert len(members) == 10
    by = {r.member: r for r in members}
    assert by["7.txt"].body == "doc 7 body"
    assert by["7.txt"].shard == 1
    assert by["7.txt"].size == len("doc 7 body")


def test_corrupt_tar_raises(spark):
    from pyspark.sql import functions as F

    bad = spark.createDataFrame([(0,)], "shard long").select(
        "shard", F.encode(F.lit("definitely not a tar"), "UTF-8").alias("payload")
    )
    with pytest.raises(Exception, match="tar|Tar|read"):
        unpack_webdataset(bad).collect()


def test_negative_ids_floor_to_lower_shard(spark):
    docs = spark.createDataFrame(
        [(-1, "neg"), (0, "zero")], "doc_id long, text string"
    )
    shards = {r.shard for r in pack_webdataset(docs, samples_per_shard=64).collect()}
    assert shards == {-1, 0}  # floor division, matching the oracle's //
