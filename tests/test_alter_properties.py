"""ALTER TABLE for the snapshot layer: alter_table_properties is a
metadata-only commit re-declaring stats/bloom/constraint properties;
new properties bind future commits; sketches refuse until rewritten;
constraint adds validate existing data by default."""

from __future__ import annotations

import pytest

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    alter_table_properties,
    compact_snapshot,
    manifest_approx_distinct,
    manifest_aggregate,
    merge_snapshot,
    read_manifest,
    read_snapshot,
    write_snapshot,
)

SCHEMA = "k long, p long, uid long, v double"


@pytest.fixture()
def tbl(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 3, i % 13, float(i)) for i in range(60)], SCHEMA
    )
    path = str(tmp_path / "tbl")
    write_snapshot(df, path, "p")  # created with NO properties
    return path


def test_alter_is_metadata_only_and_binds_future_commits(spark, tbl):
    m1 = read_manifest(tbl)
    v = alter_table_properties(
        spark, tbl, stats_cols=["v", "uid::hll"], bloom_cols=["k"]
    )
    m2 = read_manifest(tbl, v)
    assert m2["operation"] == "alter"
    assert m2["partitions"] == m1["partitions"]  # zero data movement
    assert m2["schema"]["stats_cols"] == ["v", "uid::hll"]
    # sketches refuse until partitions are rewritten under the property
    with pytest.raises(ValueError, match="no 'uid::hll' sketch"):
        manifest_approx_distinct(tbl, "uid")
    # one OPTIMIZE = the whole upgrade
    compact_snapshot(spark, tbl)
    assert 10 <= manifest_approx_distinct(tbl, "uid") <= 16  # 13 true
    agg = manifest_aggregate(tbl, columns=["v"])
    assert agg["columns"]["v"] == {"min": 0.0, "max": 59.0}
    assert read_manifest(tbl)["blooms"]["p=0"]["k"]  # bitmaps landed


def test_constraint_add_validates_existing_data(spark, tbl):
    with pytest.raises(ValueError, match="CHECK constraint violation"):
        alter_table_properties(spark, tbl, constraints=["v >= 100"])
    v = alter_table_properties(spark, tbl, constraints=["v >= 0"])
    assert read_manifest(tbl, v)["schema"]["constraints"] == ["v >= 0"]
    # enforced on the next write
    with pytest.raises(ValueError, match="CHECK constraint violation"):
        merge_snapshot(
            tbl,
            spark.createDataFrame([(100, 0, 1, -1.0)], SCHEMA),
            "k",
            "p",
        )
    # validate=False skips the scan (documented risk path)
    alter_table_properties(
        None, tbl, constraints=["v >= 100"], validate=False
    )
    # clearing with None lifts enforcement
    alter_table_properties(None, tbl, constraints=None)
    merge_snapshot(
        tbl, spark.createDataFrame([(100, 0, 1, -1.0)], SCHEMA), "k", "p"
    )
    assert read_snapshot(spark, tbl).count() == 61


def test_alter_guards(spark, tbl):
    with pytest.raises(ValueError, match="name no data column"):
        alter_table_properties(spark, tbl, stats_cols=["nope"])
    with pytest.raises(ValueError, match="name no data column"):
        alter_table_properties(spark, tbl, bloom_cols=["ghost::hll"])
    with pytest.raises(ValueError, match="needs a SparkSession"):
        alter_table_properties(None, tbl, constraints=["v >= 0"])
    # sketch forms validate by BASE column name at alter time
    v = alter_table_properties(spark, tbl, stats_cols=["v::hist:1000"])
    assert read_manifest(tbl, v)["schema"]["stats_cols"] == ["v::hist:1000"]
    # ...and by type at the next write (v is double)
    with pytest.raises(ValueError, match="must be integral"):
        compact_snapshot(spark, tbl)


def test_alter_adds_sum_stats_one_optimize_upgrade(spark, tmp_path):
    # ALTER TABLE adding a col::sum property + one compact = a 100 TB
    # table upgraded to metadata SUM/AVG, same flow as the HLL/hist
    # sketch upgrades (the ::sum entry rides the generic stats
    # recompute every rewrite performs)
    from pandas_analysis_with_postgres_spark.sources.metadata_sql import (
        answer_from_manifest,
    )
    from pandas_analysis_with_postgres_spark.sources.snapshot import (
        alter_table_properties,
        compact_snapshot,
        manifest_column_sum,
        write_snapshot,
    )

    df = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(60)], "k long, p long, cents long"
    )
    path = str(tmp_path / "t")
    write_snapshot(df, path, "p")  # no sum property yet

    def sum_sql():
        return answer_from_manifest(
            spark, "SELECT SUM(cents) AS s FROM t", {"t": path}
        )

    assert sum_sql() is None  # unprovable before the upgrade
    alter_table_properties(spark, path, stats_cols=["cents::sum"])
    assert sum_sql() is None  # cold partitions still lack entries
    compact_snapshot(spark, path)  # the one-OPTIMIZE upgrade
    out = sum_sql()
    assert out is not None and out.collect()[0].s == sum(
        i * 10 for i in range(60)
    )
    assert manifest_column_sum(path, "cents") == (
        sum(i * 10 for i in range(60)),
        60,
    )
