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
