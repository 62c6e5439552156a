"""Manifest HLL sketches: per-partition NDV registers recorded at
commit (stats_cols ``::hll`` suffix — the Iceberg-Puffin idea), merged
by max at read, identical to the in-query HLL estimate, zero data
pages; refuse on missing sketches or tombstones."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators import sketches as SK
from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
    answer_from_manifest,
    parse_metadata_select,
)
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    delete_where,
    manifest_aggregate,
    manifest_approx_distinct,
    merge_snapshot,
    read_manifest,
    write_snapshot,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    # 60 rows, 37 distinct user ids spread over 3 partitions
    rows = [(i, i % 37, i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "k long, user_id long, p long")
    path = str(tmp_path / "tbl")
    write_snapshot(df, path, "p", stats_cols=["k", "user_id::hll"])
    return path


def _spark_estimate(spark, rows_df):
    est = SK.hll_estimate(
        SK.hll_registers(rows_df.withColumn("g", F.lit(1)), ["g"], "user_id"),
        ["g"],
    ).collect()
    return est[0].hll_estimate if est else 0.0


def test_sketch_recorded_and_merges_to_inquery_estimate(spark, tbl):
    man = read_manifest(tbl)
    for pname in man["partitions"]:
        regs = man["stats"][pname]["user_id::hll"]
        assert len(regs) == SK.HLL_M and max(regs) > 0
        # min/max stats for k coexist beside the sketch
        assert len(man["stats"][pname]["k"]) == 3
    df = spark.createDataFrame(
        [(i, i % 37, i % 3) for i in range(60)], "k long, user_id long, p long"
    )
    expect = _spark_estimate(spark, df)
    # zero data pages: delete every parquet file first
    for f in Path(tbl).rglob("*.parquet"):
        f.unlink()
    got = manifest_approx_distinct(tbl, "user_id")
    assert got == pytest.approx(expect, rel=1e-9)
    # the estimate is in the right ballpark of the true 37
    assert 30 <= got <= 45
    # partition restriction = that partition's rows only
    sub = df.filter("p = 1")
    assert manifest_approx_distinct(
        tbl, "user_id", where_partition=("p", 1)
    ) == pytest.approx(_spark_estimate(spark, sub), rel=1e-9)
    # per-group NDVs
    per = dict(manifest_approx_distinct(tbl, "user_id", by_partition=True))
    assert set(per) == {0, 1, 2}
    assert per[1] == pytest.approx(_spark_estimate(spark, sub), rel=1e-9)


def test_merge_carries_cold_sketches_and_recomputes_hot(spark, tbl):
    v1 = read_manifest(tbl)
    src = spark.createDataFrame(
        [(1000, 999, 0)], "k long, user_id long, p long"
    )
    merge_snapshot(tbl, src, "k", "p")
    man = read_manifest(tbl)
    # cold partitions carry their sketch bytes unchanged
    assert man["stats"]["p=1"]["user_id::hll"] == v1["stats"]["p=1"]["user_id::hll"]
    # the hot partition's sketch reflects the new key
    assert man["stats"]["p=0"]["user_id::hll"] != v1["stats"]["p=0"]["user_id::hll"]
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
    )

    expect = _spark_estimate(spark, read_snapshot(spark, tbl))
    assert manifest_approx_distinct(tbl, "user_id") == pytest.approx(
        expect, rel=1e-9
    )


def test_refusals(spark, tbl, tmp_path):
    # un-sketched column
    with pytest.raises(ValueError, match="no 'k::hll' sketch"):
        manifest_approx_distinct(tbl, "k")
    # tombstones block NDV
    delete_where(spark, tbl, "k = 1", mode="merge-on-read", key="k")
    with pytest.raises(ValueError, match="compact_snapshot first"):
        manifest_approx_distinct(tbl, "user_id")
    # non-integral sketch column refused at write
    df = spark.createDataFrame([("a", 0)], "s string, p long")
    with pytest.raises(ValueError, match="must be integral"):
        write_snapshot(
            df, str(tmp_path / "bad"), "p", stats_cols=["s::hll"]
        )
    # sketch keys are not min/max columns
    with pytest.raises(ValueError, match="not min/max columns"):
        manifest_aggregate(tbl, columns=["user_id::hll"])


def test_metadata_sql_approx_count_distinct(spark, tbl):
    p = parse_metadata_select(
        "SELECT APPROX_COUNT_DISTINCT(user_id) AS u, COUNT(*) AS n FROM t"
    )
    assert p["items"][0] == ("approx", "user_id", "u")
    df_rows = [(i, i % 37, i % 3) for i in range(60)]
    df = spark.createDataFrame(df_rows, "k long, user_id long, p long")
    expect = _spark_estimate(spark, df)
    for f in Path(tbl).rglob("*.parquet"):
        f.unlink()
    out = answer_from_manifest(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(user_id) AS u, COUNT(*) AS n FROM t",
        {"t": tbl},
    ).collect()[0]
    assert out.n == 60 and out.u == pytest.approx(expect, rel=1e-9)
    # group-by form
    grp = answer_from_manifest(
        spark,
        "SELECT p, COUNT(*) AS n, APPROX_COUNT_DISTINCT(user_id) AS u"
        " FROM t GROUP BY p",
        {"t": tbl},
    ).collect()
    per = dict(manifest_approx_distinct(tbl, "user_id", by_partition=True))
    assert {(r.p, r.n) for r in grp} == {(0, 20), (1, 20), (2, 20)}
    for r in grp:
        assert r.u == pytest.approx(per[r.p], rel=1e-9)
    # range WHERE + approx: refuse
    assert (
        answer_from_manifest(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(user_id) FROM t WHERE k > 3",
            {"t": tbl},
        )
        is None
    )
    # un-sketched column: refuse → scan
    assert (
        answer_from_manifest(
            spark, "SELECT APPROX_COUNT_DISTINCT(k) FROM t", {"t": tbl}
        )
        is None
    )


def test_streaming_ingest_maintains_sketches(spark, tbl, tmp_path):
    # the sketch is a stats_cols property, so the exactly-once
    # streaming merge sink maintains it per touched partition with no
    # sketch-specific code: after the drain, the manifest NDV sees the
    # streamed users
    from pandas_analysis_with_postgres_spark.streaming import (
        stream_merge_sink,
    )

    before = manifest_approx_distinct(tbl, "user_id")
    ids_dir = tmp_path / "in"
    spark.createDataFrame(
        [(10_000 + i, 500 + i, 0) for i in range(40)],
        "k long, user_id long, p long",
    ).coalesce(1).write.mode("overwrite").parquet(str(ids_dir))
    stream = spark.readStream.schema("k long, user_id long, p long").parquet(
        str(ids_dir)
    )
    stream_merge_sink(
        stream,
        tbl,
        "k",
        "p",
        app_id="hll-ingest",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    after = manifest_approx_distinct(tbl, "user_id")
    assert after > before  # 40 brand-new user ids landed in the sketch
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        read_snapshot,
    )

    assert after == pytest.approx(
        _spark_estimate(spark, read_snapshot(spark, tbl)), rel=1e-9
    )
