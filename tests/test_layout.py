"""Z-order layout (sources/layout.py): the Morton-curve write keeps
parquet row-group min/max statistics tight for EVERY participating
column, so multi-predicate scans prune at the metadata level — the
property a single-column sort cannot give."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.sources.layout import (
    interleave_bits,
    rowgroup_prune_fraction,
    write_zordered,
    zorder_key,
)
from pandas_analysis_with_postgres_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.01"


def test_interleave_bits_golden(spark):
    # x=0b101, y=0b011 with 3 bits -> bit j of col i at position j*2+i:
    # x bits at even positions (1,0,1 -> 0b010001), y at odd
    # (1,1,0 -> 0b001010): key = 0b011011 = 27
    df = spark.range(1).select(
        F.lit(5).cast("long").alias("x"), F.lit(3).cast("long").alias("y")
    )
    key = interleave_bits([F.col("x"), F.col("y")], bits=3)
    assert df.select(key.alias("k")).collect()[0].k == 27


def test_zorder_key_is_deterministic_and_total(spark):
    orders = load_table(spark, SF, "orders")
    k1 = orders.select(
        zorder_key(orders, ["o_custkey", "o_totalprice"], bits=8).alias("k")
    )
    assert k1.filter(F.col("k").isNull()).count() == 0
    lo, hi = k1.agg(F.min("k"), F.max("k")).collect()[0]
    assert 0 <= lo <= hi < (1 << 16)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The metadata-level payoff: after write_zordered on
    (o_custkey, o_totalprice), a range predicate on EITHER column can
    skip a meaningful fraction of row groups from footer stats alone;
    a totalprice-only sort gives (near-)zero skip on custkey."""
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "z")
    write_zordered(orders, zpath, ["o_custkey", "o_totalprice"], num_files=8)

    spath = str(tmp_path / "s")
    (
        orders.repartitionByRange(8, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(spath)
    )

    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]
    ck_lo, ck_hi = stats[0], stats[1]
    tp_lo, tp_hi = stats[2], stats[3]
    # a narrow slice (~1/8 of each domain)
    ck = (ck_lo, ck_lo + (ck_hi - ck_lo) // 8)
    tp = (tp_lo, tp_lo + (tp_hi - tp_lo) / 8)

    z_ck = rowgroup_prune_fraction(zpath, "o_custkey", *ck)
    z_tp = rowgroup_prune_fraction(zpath, "o_totalprice", *tp)
    s_ck = rowgroup_prune_fraction(spath, "o_custkey", *ck)
    s_tp = rowgroup_prune_fraction(spath, "o_totalprice", *tp)

    # single-column sort: perfect on its own column, blind on the other
    assert s_tp >= 0.5
    assert s_ck == 0.0
    # z-order: meaningful skip on BOTH columns
    assert z_ck >= 0.25, f"zorder custkey prune {z_ck}"
    assert z_tp >= 0.25, f"zorder totalprice prune {z_tp}"

    # and the laid-out data is the same data
    assert spark.read.parquet(zpath).count() == orders.count()


def test_write_path_has_no_global_window(spark):
    """The layout WRITE must never plan a single-task global sort:
    quantile scaling is sketch-based, so the only Exchange is the one
    range shuffle that splits the curve into files."""
    import contextlib
    import io

    from pandas_analysis_with_postgres_spark.sources.layout import (
        _quantile_scale,
    )

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    key = interleave_bits(
        [_quantile_scale(orders, c, 8) for c in ("o_custkey", "o_totalprice")],
        8,
    )
    df = (
        orders.withColumn("__zkey", key)
        .repartitionByRange(8, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan
    import re

    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 1, plan
