"""Manifest equi-width histograms: per-partition bucket counts
recorded at commit (stats_cols ``::hist:<width>``), merged by summing
at read, quantiles = the q90 integer rank-crossing recipe — exact
arithmetic, zero data pages; refuse on missing histograms, tombstones,
width disagreement, or mixed partition specs."""

from __future__ import annotations

from collections import Counter

import pytest

from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
    answer_from_manifest,
)
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    append_snapshot,
    delete_where,
    evolve_partition_spec,
    manifest_aggregate,
    manifest_group_stats,
    manifest_quantile,
    manifest_range_count,
    merge_snapshot,
    read_manifest,
    write_snapshot,
)

VALS = [(i * 37) % 1000 for i in range(300)]
SCHEMA = "k long, p long, cents long"


def _truth(vals, p, width=100):
    c = Counter(v // width for v in vals)
    total, cum = len(vals), 0
    for b in sorted(c):
        cum += c[b]
        if cum * 100 >= total * p:
            return b * width
    raise AssertionError


@pytest.fixture()
def tbl(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 3, VALS[i]) for i in range(300)], SCHEMA
    )
    path = str(tmp_path / "tbl")
    write_snapshot(df, path, "p", stats_cols=["cents::hist:100"])
    return path


def test_quantiles_match_integer_recipe_zero_data_pages(spark, tbl):
    import os
    import shutil

    # delete every data page: the manifest alone must still answer
    shutil.rmtree(os.path.join(tbl, "data"))
    for p in (1, 50, 90, 99, 100):
        assert manifest_quantile(tbl, "cents", p) == _truth(VALS, p)
    per = dict(manifest_quantile(tbl, "cents", 50, by_partition=True))
    for g in (0, 1, 2):
        assert per[g] == _truth([v for i, v in enumerate(VALS) if i % 3 == g], 50)
    assert manifest_quantile(
        tbl, "cents", 90, where_partition=("p", 1)
    ) == _truth([v for i, v in enumerate(VALS) if i % 3 == 1], 90)


def test_cold_carry_and_hot_recompute_across_merge(spark, tbl):
    merge_snapshot(
        tbl,
        spark.createDataFrame([(1000, 0, 5000)], SCHEMA),
        "k",
        "p",
    )
    man = read_manifest(tbl)
    # cold partitions keep their histogram bytes by reference
    assert "cents::hist:100" in man["stats"]["p=1"]
    # the hot partition re-counted: the new outlier extends its range
    assert man["stats"]["p=0"]["cents::hist:100"][-1] == [50, 1]
    got = manifest_quantile(tbl, "cents", 100)
    assert got == 5000


def test_refusals(spark, tbl):
    with pytest.raises(ValueError, match="no '::hist:'"):
        manifest_quantile(tbl, "k", 50)  # un-sketched column
    with pytest.raises(ValueError, match="quantile p must be"):
        manifest_quantile(tbl, "cents", 0)
    delete_where(spark, tbl, "k = 5", mode="merge-on-read", key="k")
    with pytest.raises(ValueError, match="tombstoned"):
        manifest_quantile(tbl, "cents", 50)


def test_mixed_spec_gate(spark, tmp_path):
    path = str(tmp_path / "mx")
    df = spark.createDataFrame(
        [(i, i % 3, i % 2, VALS[i]) for i in range(60)],
        "k long, p long, q long, cents long",
    )
    write_snapshot(df, path, "p", stats_cols=["cents::hist:100"])
    evolve_partition_spec(path, "q")
    append_snapshot(
        path,
        spark.createDataFrame(
            [(900, 1, 0, 950)], "k long, p long, q long, cents long"
        ),
        "q",
    )
    # global merge never touches partition names: still answers
    vals = VALS[:60] + [950]
    assert manifest_quantile(path, "cents", 50) == _truth(vals, 50)
    with pytest.raises(ValueError, match="old-spec"):
        manifest_quantile(path, "cents", 50, by_partition=True)


def test_hist_keys_rejected_in_minmax_and_range_paths(spark, tbl):
    with pytest.raises(ValueError, match="not min/max"):
        manifest_aggregate(tbl, columns=["cents::hist:100"])
    with pytest.raises(ValueError, match="not min/max"):
        manifest_group_stats(tbl, ["cents::hist:100"])
    with pytest.raises(ValueError, match="not range"):
        manifest_range_count(tbl, "cents::hist:100", lo=0)


def test_write_guards(spark, tmp_path):
    bad = spark.createDataFrame([(1, 0, 1.5)], "k long, p long, x double")
    with pytest.raises(ValueError, match="must be integral"):
        write_snapshot(
            bad, str(tmp_path / "t1"), "p", stats_cols=["x::hist:10"]
        )
    wide = spark.createDataFrame(
        [(i, 0, i) for i in range(5000)], "k long, p long, x long"
    )
    with pytest.raises(ValueError, match="widen the bucket"):
        write_snapshot(
            wide, str(tmp_path / "t2"), "p", stats_cols=["x::hist:1"]
        )


def test_metadata_sql_three_shapes(spark, tbl):
    rows = answer_from_manifest(
        spark,
        "SELECT COUNT(*) AS n, APPROX_QUANTILE(cents, 50) AS med FROM t",
        {"t": tbl},
    ).collect()
    assert rows == [(300, _truth(VALS, 50))]
    rows = answer_from_manifest(
        spark,
        "SELECT APPROX_QUANTILE(cents, 90) AS q90 FROM t WHERE p = 1",
        {"t": tbl},
    ).collect()
    assert rows[0].q90 == _truth(
        [v for i, v in enumerate(VALS) if i % 3 == 1], 90
    )
    rows = answer_from_manifest(
        spark,
        "SELECT p, COUNT(*) AS n, APPROX_QUANTILE(cents, 50) AS med "
        "FROM t GROUP BY p",
        {"t": tbl},
    ).collect()
    assert len(rows) == 3 and all(r.n == 100 for r in rows)
    # un-sketched column refuses to the scan path (None)
    assert (
        answer_from_manifest(
            spark, "SELECT APPROX_QUANTILE(k, 50) AS x FROM t", {"t": tbl}
        )
        is None
    )
