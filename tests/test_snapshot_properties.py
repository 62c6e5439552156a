"""Model-based property test: any sequence of snapshot merges equals a
reference dict upsert, and every intermediate version stays readable
(time travel) with exactly its at-commit contents."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

from pandas_analysis_with_postgres_spark.sources.snapshot import (
    merge_snapshot,
    read_snapshot,
    write_snapshot,
)

_spark = None


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    global _spark
    _spark = spark
    yield


row = st.tuples(
    st.integers(min_value=0, max_value=12),  # key
    st.integers(min_value=0, max_value=99),  # value
    st.integers(min_value=0, max_value=3),  # partition
)
batch = st.lists(row, min_size=1, max_size=5, unique_by=lambda r: r[0])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch, min_size=1, max_size=4))
def test_merge_sequence_equals_dict_model(tmp_path_factory, batches):
    spark = _spark
    path = str(tmp_path_factory.mktemp("snap") / "t")
    # Partition values never move for a key (the documented contract):
    # pin each key's partition to its first-seen value.
    part_of: dict[int, int] = {}
    model: dict[int, tuple[int, int]] = {}
    history = []
    version = 0
    for i, b in enumerate(batches):
        rows = []
        for k, v, p in b:
            p = part_of.setdefault(k, p)
            rows.append((k, v, p))
            model[k] = (v, p)
        df = spark.createDataFrame(rows, "k long, v long, p long")
        if version == 0:
            version = write_snapshot(df, path, "p")
        else:
            version = merge_snapshot(path, df, "k", "p")
        assert version == i + 1
        history.append(dict(model))

    for v, snap in enumerate(history, start=1):
        got = {
            r.k: (r.v, r.p) for r in read_snapshot(spark, path, v).collect()
        }
        assert got == snap, f"version {v}"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch, min_size=2, max_size=4))
def test_strict_merge_raises_exactly_on_cold_partition_key_moves(
    tmp_path_factory, batches
):
    """strict=True model: a merge raises iff some source key currently
    lives in a partition the source does NOT touch (the stale-duplicate
    landmine); a rejected merge leaves the table byte-identical, and a
    key moving between two TOUCHED partitions is allowed and clean."""
    spark = _spark
    path = str(tmp_path_factory.mktemp("snapstrict") / "t")
    model: dict[int, tuple[int, int]] = {}
    version = 0
    for b in batches:
        rows = [(k, v, p) for k, v, p in b]
        df = spark.createDataFrame(rows, "k long, v long, p long")
        if version == 0:
            version = write_snapshot(df, path, "p")
            model.update({k: (v, p) for k, v, p in rows})
            continue
        touched = {p for _, _, p in rows}
        violation = any(
            k in model and model[k][1] not in touched for k, _, _ in rows
        )
        if violation:
            with pytest.raises(ValueError, match="stable-partition"):
                merge_snapshot(path, df, "k", "p", strict=True)
            # rejected before any write: same version, same contents
            got = {
                r.k: (r.v, r.p)
                for r in read_snapshot(spark, path, version).collect()
            }
            assert got == model
        else:
            version = merge_snapshot(path, df, "k", "p", strict=True)
            model.update({k: (v, p) for k, v, p in rows})
            got = {
                r.k: (r.v, r.p)
                for r in read_snapshot(spark, path, version).collect()
            }
            assert got == model


def test_unstrict_merge_documents_the_landmine(tmp_path_factory):
    """Without strict, a moved key silently leaves its stale row alive
    in the cold partition — the documented contract violation strict
    exists to catch (kept as a pinned negative example)."""
    spark = _spark
    path = str(tmp_path_factory.mktemp("snaploose") / "t")
    write_snapshot(
        spark.createDataFrame([(1, 10, 0), (2, 20, 1)], "k long, v long, p long"),
        path,
        "p",
    )
    moved = spark.createDataFrame([(1, 11, 1)], "k long, v long, p long")
    merge_snapshot(path, moved, "k", "p")  # key 1 moves 0 → 1, p=0 cold
    rows = sorted(
        (r.k, r.v, r.p) for r in read_snapshot(spark, path).collect()
    )
    assert rows == [(1, 10, 0), (1, 11, 1), (2, 20, 1)]  # stale + new
