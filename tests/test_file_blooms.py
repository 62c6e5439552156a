"""PER-FILE Bloom filters (blooms[p][FILES_KEY], _add_file_blooms):
point-lookup skipping at file grain on UNCLUSTERED layouts — the probe
shape per-file [min, max] statistics cannot help with. The fixture
scrambles keys with an odd multiplier so every file's min/max spans
nearly the whole domain (stats prune nothing inside a partition), then
proves the bloom opens O(1) files — including with the pruned files
DELETED from disk (zero-data-page evidence)."""

from __future__ import annotations

import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    BLOOM_BITS,
    FILES_KEY,
    MAX_FILE_BLOOMS,
    _bloom_may_contain,
    compact_snapshot,
    merge_snapshot,
    read_manifest,
    read_snapshot,
    write_snapshot,
)

N = 4096
MULT = 2654435761  # odd -> bijective mod 2^k: keys are a permutation


def _df(spark, n=N, slices=8):
    # k = a permutation of [0, n): uniformly scattered, so within each
    # hive partition every file's [min, max] covers ~the whole domain
    # and per-file min/max stats CANNOT prune a point probe.
    return spark.range(0, n, 1, slices).select(
        ((F.col("id") * MULT) % n).cast("long").alias("k"),
        (F.col("id") % 4).alias("bu"),
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(_df(spark), path, "bu", stats_cols=["k"], bloom_cols=["k"])
    return path


def _probe_key(spark, bu=2, pos=0):
    rows = (
        _df(spark)
        .where(F.col("bu") == bu)
        .orderBy("k")
        .limit(pos + 1)
        .collect()
    )
    return int(rows[pos]["k"])


def test_file_blooms_recorded(spark, tbl):
    man = read_manifest(tbl, None)
    for pname in ("bu=0", "bu=1", "bu=2", "bu=3"):
        pb = man["blooms"][pname]
        assert isinstance(pb["k"], str)  # partition-grain bloom intact
        fb = pb[FILES_KEY]
        assert len(fb) == 8  # one per range slice
        for fname, cols in fb.items():
            assert fname.endswith(".parquet")
            # self-describing bitmap: hex length pins the bit width
            assert len(cols["k"]) == BLOOM_BITS // 8 * 2
        # the recorded bitmaps agree with a driver-side replay: every
        # key the file actually holds must probe positive in ITS file
        fstats = man["stats"][pname][FILES_KEY]
        assert set(fstats) == set(fb)


def test_point_lookup_opens_one_file_unclustered(spark, tbl):
    key = _probe_key(spark)
    got = read_snapshot(spark, tbl, point_lookups={"k": key})
    # 4 partitions x 8 files; partition bloom keeps ~1 partition and
    # the file blooms keep ~1 file inside it. FPR at 128 keys/file in
    # 4096 bits is ~1e-6 per file; allow a couple of false positives.
    assert len(got.inputFiles()) <= 3
    full = read_snapshot(spark, tbl)
    assert len(full.inputFiles()) == 32
    assert (
        got.filter(F.col("k") == key).collect()
        == full.filter(F.col("k") == key).collect()
    )


def test_zero_data_page_proof(spark, tmp_path):
    # DELETE every file the bloom prunes: the lookup still answers
    # exactly — proof the pruned files were never going to be read.
    path = str(tmp_path / "t")
    write_snapshot(_df(spark), path, "bu", stats_cols=["k"], bloom_cols=["k"])
    key = _probe_key(spark)
    man = read_manifest(path, None)
    expected = (
        read_snapshot(spark, path).filter(F.col("k") == key).collect()
    )
    for pname, rel in man["partitions"].items():
        pb = man["blooms"][pname]
        part_keeps = _bloom_may_contain(pb["k"], key)
        fb = pb[FILES_KEY]
        for fname in fb:
            if not part_keeps or not _bloom_may_contain(fb[fname]["k"], key):
                os.remove(Path(path) / rel / fname)
    got = read_snapshot(spark, path, point_lookups={"k": key})
    assert got.filter(F.col("k") == key).collect() == expected
    assert len(expected) == 1


def test_absent_key_empty_frame_with_schema(spark, tbl):
    got = read_snapshot(spark, tbl, point_lookups={"k": N + 7})
    assert got.count() == 0
    assert got.columns == ["k", "bu"]


def test_file_blooms_carry_cold_and_refresh_touched(spark, tbl):
    # merge touches bu=1 only: bu=0's file-bloom map must carry BY
    # REFERENCE (same filenames), bu=1's must be regenerated for the
    # rewritten directory's new filenames.
    before = read_manifest(tbl, None)
    src = spark.range(0, 8, 1, 2).select(
        (F.lit(N) + F.col("id")).cast("long").alias("k"),
        F.lit(1).cast("bigint").alias("bu"),
    )
    merge_snapshot(tbl, src, "k", "bu")
    after = read_manifest(tbl, None)
    assert after["blooms"]["bu=0"] == before["blooms"]["bu=0"]
    new_fb = after["blooms"]["bu=1"][FILES_KEY]
    assert set(new_fb) == set(after["stats"]["bu=1"][FILES_KEY])
    assert set(new_fb) != set(before["blooms"]["bu=1"][FILES_KEY])
    # the merged-in key is probeable file-grain in the new layout
    got = read_snapshot(spark, tbl, point_lookups={"k": N})
    assert got.filter(F.col("k") == N).count() == 1
    assert len(got.inputFiles()) < 32


def test_compaction_regenerates_file_blooms(spark, tbl):
    before = read_manifest(tbl, None)
    compact_snapshot(spark, tbl, num_files=1)
    man = read_manifest(tbl, None)
    for pname in ("bu=0", "bu=1", "bu=2", "bu=3"):
        fb = man["blooms"][pname][FILES_KEY]
        # regenerated for the rewritten directory's files, never the
        # old names (a stale name would make the reader open nothing)
        assert set(fb) == set(man["stats"][pname][FILES_KEY])
        assert not set(fb) & set(before["blooms"][pname][FILES_KEY])
    key = _probe_key(spark)
    got = read_snapshot(spark, tbl, point_lookups={"k": key})
    assert got.filter(F.col("k") == key).count() == 1


def test_fragmented_partition_skips_file_grain(spark, tmp_path, monkeypatch):
    import pandas_analysis_with_postgres_spark.sources.snapshot as S

    monkeypatch.setattr(S, "MAX_FILE_BLOOMS", 4)
    path = str(tmp_path / "t")
    write_snapshot(_df(spark), path, "bu", stats_cols=["k"], bloom_cols=["k"])
    man = read_manifest(path, None)
    for pname in man["blooms"]:
        assert FILES_KEY not in man["blooms"][pname]  # 8 files > cap 4
        assert isinstance(man["blooms"][pname]["k"], str)  # partition grain intact
    key = _probe_key(spark)
    got = read_snapshot(spark, path, point_lookups={"k": key})
    assert got.filter(F.col("k") == key).count() == 1


def test_string_keys_probe_file_grain(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 2048, 1, 8).select(
        F.concat(F.lit("user-"), ((F.col("id") * MULT) % 2048)).alias("u"),
        (F.col("id") % 2).alias("bu"),
    )
    write_snapshot(df, path, "bu", bloom_cols=["u"])
    man = read_manifest(path, None)
    assert len(man["blooms"]["bu=0"][FILES_KEY]) == 8
    got = read_snapshot(spark, path, point_lookups={"u": "user-777"})
    assert got.filter(F.col("u") == "user-777").count() == 1
    assert len(got.inputFiles()) <= 3  # of 16
    assert MAX_FILE_BLOOMS >= 8
