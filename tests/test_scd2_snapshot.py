"""scd2_merge_snapshot: lakehouse SCD2 — close-outs land as partition
replacements, cold buckets are carried by reference, invariants hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators.scd2 import (
    scd2_merge_snapshot,
)
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    read_manifest,
    read_snapshot,
)


def _staged(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v string, change_ts timestamp, create_ts timestamp"
    )


TS1 = "1995-01-01 00:00:00"
TS2 = "1996-01-01 00:00:00"


def _apply(path, staged, now):
    return scd2_merge_snapshot(
        path,
        staged,
        "k",
        change_ts_col="change_ts",
        create_ts_col="create_ts",
        now=F.lit(now).cast("timestamp"),
        n_buckets=4,
    )


def test_round_two_touches_only_changed_buckets(spark, tmp_path):
    import datetime as dt

    path = str(tmp_path / "scd2")
    rows1 = [
        (k, f"v{k}", dt.datetime(1995, 1, 1), dt.datetime(1994, 1, 1))
        for k in range(8)
    ]
    assert _apply(path, _staged(spark, rows1), "2024-01-01") == 1
    man1 = read_manifest(path, 1)
    assert set(man1["partitions"]) == {f"bucket={b}" for b in range(4)}

    # round 2 changes ONLY k=5 (bucket 1)
    rows2 = [(5, "v5-new", dt.datetime(1996, 1, 1), dt.datetime(1994, 1, 1))]
    assert _apply(path, _staged(spark, rows2), "2024-02-01") == 2
    man2 = read_manifest(path, 2)
    # cold buckets carried by REFERENCE: identical directory entries
    for b in (0, 2, 3):
        assert man2["partitions"][f"bucket={b}"] == man1["partitions"][f"bucket={b}"]
    assert man2["partitions"]["bucket=1"] != man1["partitions"]["bucket=1"]

    hist = read_snapshot(spark, path).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r.k, []).append(r)
    # unchanged keys: exactly one current row
    for k in set(range(8)) - {5}:
        assert len(by_key[k]) == 1 and by_key[k][0].is_current_record == 1
    # k=5: closed v1 + open v2, close date == successor open date
    vers = sorted(by_key[5], key=lambda r: r.is_current_record)
    closed, opened = vers
    assert closed.is_current_record == 0 and opened.is_current_record == 1
    assert closed.effective_to_date == opened.effective_from_date
    assert opened.v == "v5-new"
    # untouched keys in the REWRITTEN bucket (k=1 shares bucket 1) survive
    assert by_key[1][0].v == "v1"


def test_txn_makes_replayed_round_a_noop(spark, tmp_path):
    import datetime as dt

    path = str(tmp_path / "scd2txn")
    rows = [(1, "a", dt.datetime(1995, 1, 1), dt.datetime(1994, 1, 1))]
    v = scd2_merge_snapshot(
        path,
        _staged(spark, rows),
        "k",
        change_ts_col="change_ts",
        create_ts_col="create_ts",
        now=F.lit(TS1).cast("timestamp"),
        n_buckets=4,
        txn=("app", 7),
    )
    assert v == 1
    # replay of the same micro-batch: idempotent no-op
    v2 = scd2_merge_snapshot(
        path,
        _staged(spark, rows),
        "k",
        change_ts_col="change_ts",
        create_ts_col="create_ts",
        now=F.lit(TS2).cast("timestamp"),
        n_buckets=4,
        txn=("app", 7),
    )
    assert v2 == 1
    assert read_snapshot(spark, path).count() == 1


def test_delta_into_brand_new_buckets_only(spark, tmp_path):
    """A non-bootstrap round whose keys all land in buckets absent
    from the parent manifest must open them as fresh history (the
    code-review FileNotFoundError path)."""
    import datetime as dt

    path = str(tmp_path / "scd2new")
    rows1 = [(0, "a", dt.datetime(1995, 1, 1), dt.datetime(1994, 1, 1))]
    _apply(path, _staged(spark, rows1), "2024-01-01")  # only bucket 0
    rows2 = [(5, "b", dt.datetime(1995, 1, 1), dt.datetime(1994, 1, 1))]
    assert _apply(path, _staged(spark, rows2), "2024-02-01") == 2  # bucket 1
    hist = {r.k: r for r in read_snapshot(spark, path).collect()}
    assert set(hist) == {0, 5}
    assert hist[5].is_current_record == 1
