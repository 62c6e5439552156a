"""Manifest-side dynamic partition pruning (prune_for_join +
multi-key point_lookups): a filtered dimension's join keys prune the
fact scan to the partitions AND FILES that may hold any of them —
Spark's DPP / Iceberg runtime filtering re-expressed over the
snapshot layer. The executor-side complement
(operators.joins.bloom_prefiltered_join) drops rows after the scan;
this drops the I/O itself."""

from __future__ import annotations

import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    FILES_KEY,
    _SetProbe,
    _set_probe_keeps,
    prune_for_join,
    read_manifest,
    read_snapshot,
    write_snapshot,
)

N = 4096
MULT = 2654435761


def _df(spark):
    return spark.range(0, N, 1, 8).select(
        ((F.col("id") * MULT) % N).cast("long").alias("k"),
        (F.col("id") % 4).alias("bu"),
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(_df(spark), path, "bu", stats_cols=["k"], bloom_cols=["k"])
    return path


def _dim(spark, keys):
    return spark.createDataFrame([(int(k),) for k in keys], "dk bigint")


def test_pruned_join_equals_unpruned(spark, tbl):
    keys = [5, 99, 1777]
    dim = _dim(spark, keys)
    fact = prune_for_join(spark, tbl, "k", dim, dim_key="dk")
    assert len(fact.inputFiles()) <= len(keys) + 2  # FPR slack
    got = fact.join(dim, fact.k == dim.dk).select("k").collect()
    full = read_snapshot(spark, tbl)
    assert len(full.inputFiles()) == 32
    exp = full.join(dim, full.k == dim.dk).select("k").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert len(got) == len(keys)  # k is a permutation: every key exists


def test_zero_data_page_proof(spark, tmp_path):
    # replay the probe driver-side, DELETE every file it prunes, and
    # show the pruned join still answers exactly.
    path = str(tmp_path / "t")
    write_snapshot(_df(spark), path, "bu", stats_cols=["k"], bloom_cols=["k"])
    keys = [5, 99, 1777]
    probe = {"k": _SetProbe(keys)}
    man = read_manifest(path, None)
    for pname, rel in man["partitions"].items():
        st = man["stats"][pname]
        pb = man["blooms"][pname]
        part_keeps = _set_probe_keeps(probe, st, pb)
        for fname in st[FILES_KEY]:
            if not part_keeps or not _set_probe_keeps(
                probe,
                st[FILES_KEY].get(fname) or {},
                (pb.get(FILES_KEY) or {}).get(fname) or {},
            ):
                os.remove(Path(path) / rel / fname)
    dim = _dim(spark, keys)
    fact = prune_for_join(spark, path, "k", dim, dim_key="dk")
    got = fact.join(dim, fact.k == dim.dk).select("k").collect()
    assert sorted(r["k"] for r in got) == sorted(keys)


def test_empty_dim_is_provably_empty(spark, tbl):
    dim = _dim(spark, [7]).where("dk < 0")
    fact = prune_for_join(spark, tbl, "k", dim, dim_key="dk")
    assert fact.count() == 0
    assert fact.columns == ["k", "bu"]


def test_over_cap_falls_back_unpruned(spark, tbl):
    dim = spark.range(0, 64).select(F.col("id").alias("dk"))
    fact = prune_for_join(spark, tbl, "k", dim, dim_key="dk", max_keys=16)
    assert len(fact.inputFiles()) == 32  # graceful: no pruning, no error
    got = fact.join(dim, fact.k == dim.dk).count()
    assert got == 64


def test_null_dim_keys_are_dropped(spark, tbl):
    dim = spark.createDataFrame([(5,), (None,)], "dk bigint")
    fact = prune_for_join(spark, tbl, "k", dim, dim_key="dk")
    assert fact.where(F.col("k") == 5).count() == 1
    assert len(fact.inputFiles()) <= 3


def test_stats_only_table_prunes_by_range(spark, tmp_path):
    # no blooms: a CLUSTERED layout still prunes multi-key probes via
    # per-partition/per-file [min, max] alone
    path = str(tmp_path / "t")
    df = spark.range(0, 2000, 1, 8).select(
        F.col("id").alias("k"), (F.col("id") / 1000).cast("long").alias("bu")
    )
    write_snapshot(df, path, "bu", stats_cols=["k"])
    got = read_snapshot(spark, path, point_lookups={"k": [10, 1990]})
    # 2 partitions x 4 files of 250 rows: keys 10 and 1990 live in the
    # first file of bu=0 and the last of bu=1
    assert len(got.inputFiles()) == 2
    assert got.where(F.col("k").isin([10, 1990])).count() == 2


def test_string_key_set_probe(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 2048, 1, 8).select(
        F.concat(F.lit("u-"), ((F.col("id") * MULT) % 2048)).alias("u"),
        (F.col("id") % 2).alias("bu"),
    )
    write_snapshot(df, path, "bu", bloom_cols=["u"])
    got = read_snapshot(spark, path, point_lookups={"u": ["u-9", "u-77"]})
    assert got.where(F.col("u").isin(["u-9", "u-77"])).count() == 2
    assert len(got.inputFiles()) <= 4  # of 16


def test_set_probe_survives_merge_carry(spark, tbl):
    # cold partitions carry their stats/blooms by reference: after a
    # merge touching one partition, multi-key probes still prune the
    # untouched ones at file grain
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        merge_snapshot,
    )

    src = spark.createDataFrame([(N + 1, 1)], "k bigint, bu bigint")
    merge_snapshot(tbl, src, "k", "bu")
    keys = [5, 99, N + 1]
    dim = _dim(spark, keys)
    fact = prune_for_join(spark, tbl, "k", dim, dim_key="dk")
    got = fact.join(dim, fact.k == dim.dk).select("k").collect()
    assert sorted(r["k"] for r in got) == sorted(keys)
    full = read_snapshot(spark, tbl)
    assert len(fact.inputFiles()) < len(full.inputFiles())


def test_set_probe_matches_scalar_bloom_probe():
    # the vectorized multi-key probe must agree with the scalar prober
    # bit-for-bit: any_in_bloom(B) == any(_bloom_may_contain(B, v))
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        _bloom_may_contain,
        _bloom_positions,
    )

    def _bitmap(values, bits):
        bm = bytearray(bits // 8)
        import zlib as _z

        for v in values:
            iv = _z.crc32(v.encode()) if isinstance(v, str) else v
            for p in _bloom_positions(iv, bits):
                bm[p // 8] |= 1 << (p % 8)
        return bytes(bm).hex()

    @settings(max_examples=200, deadline=None)
    @given(
        stored=st.lists(
            st.one_of(
                st.integers(-(2**62), 2**62),
                st.text(min_size=0, max_size=8),
            ),
            max_size=12,
        ),
        probed=st.lists(
            st.one_of(
                st.integers(-(2**62), 2**62),
                st.text(min_size=0, max_size=8),
            ),
            min_size=0,
            max_size=6,
        ),
        bits=st.sampled_from([64, 512, 4096]),
    )
    def check(stored, probed, bits):
        hex_bits = _bitmap(stored, bits)
        sp = _SetProbe(probed)
        want = any(_bloom_may_contain(hex_bits, v) for v in probed)
        assert sp.any_in_bloom(hex_bits) == want
        # no false negatives ever: a probed value that WAS stored hits
        if set(probed) & set(stored):
            assert sp.any_in_bloom(hex_bits)

    check()


def test_multi_key_probe_conservative_fuzz(spark, tmp_path):
    # randomized end-to-end: any probe set over any layout returns
    # EXACTLY the matching rows after the caller's real filter
    import random

    rnd = random.Random(7)
    path = str(tmp_path / "t")
    n = 600
    rows = [(rnd.randrange(0, 500), i % 3) for i in range(n)]
    df = spark.createDataFrame(rows, "k bigint, p bigint")
    write_snapshot(
        df.repartition(6), path, "p", stats_cols=["k"], bloom_cols=["k"]
    )
    truth = {}
    for k, _p in rows:
        truth[k] = truth.get(k, 0) + 1
    for trial in range(6):
        keys = [rnd.randrange(0, 700) for _ in range(rnd.randrange(1, 9))]
        got = (
            read_snapshot(spark, path, point_lookups={"k": keys})
            .where(F.col("k").isin([int(x) for x in keys]))
            .groupBy("k")
            .count()
            .collect()
        )
        want = {k: truth.get(k, 0) for k in set(keys)}
        assert {r["k"]: r["count"] for r in got} == {
            k: c for k, c in want.items() if c
        }, (trial, sorted(set(keys)))


def test_unsupported_key_types_disable_pruning_not_results(spark, tmp_path):
    # review regression: a probe carrying date/bool/float keys must be
    # a NO-OP (keep everything), never "empty proves the join empty"
    import datetime

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(datetime.date(2024, 1, 1 + i), i % 2) for i in range(8)],
        "d date, bu bigint",
    )
    write_snapshot(df, path, "bu", stats_cols=["d"])
    dim = spark.createDataFrame(
        [(datetime.date(2024, 1, 3),)], "dk date"
    )
    fact = prune_for_join(spark, path, "d", dim, dim_key="dk")
    got = fact.join(dim, fact.d == dim.dk).count()
    assert got == 1  # silent-empty would return 0
    assert len(fact.inputFiles()) > 0
    # mixed supported + unsupported values: still a no-op, still right
    r = read_snapshot(
        spark, path, point_lookups={"d": [datetime.date(2024, 1, 3), 5]}
    )
    assert r.where(F.col("d") == "2024-01-03").count() == 1
