"""Persisted IVF index: build / append / probe with manifest pruning,
equivalence with the in-query ivf_topk, and append idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators.similarity import (
    append_ivf_index,
    build_ivf_index,
    ivf_topk,
    search_ivf_index,
)
from pandas_analysis_with_postgres_spark.sources.parquet import load_table
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    read_manifest,
    read_snapshot,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").localCheckpoint()


@pytest.fixture()
def index(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, trained=False)
    return path


def _key(df):
    return {
        (r.query_id, r.neighbor_id, r.rank, round(r.cos, 9))
        for r in df.collect()
    }


def test_search_matches_in_query_ivf(spark, emb, index):
    queries = emb.filter(F.col("vec_id") % 100 == 7)
    got = search_ivf_index(queries, index, 5)
    # Same centroids (id-prefix stand-in) → identical results to the
    # per-query build path.
    want = ivf_topk(emb, queries, 5)
    assert _key(got) == _key(want)


def test_probe_prunes_partitions_at_manifest(spark, emb, index):
    # One query probes IVF_PROBE cells; the vector scan must touch
    # only those partitions.
    queries = emb.filter(F.col("vec_id") == 7)
    got = search_ivf_index(queries, index, 5)
    files = {f for f in got.inputFiles()}
    cells = {
        f.split("__part=")[1].split("/")[0]
        for f in files
        if "__part=" in f
    }
    from pandas_analysis_with_postgres_spark.operators.similarity import (
        IVF_PROBE,
    )

    assert 0 < len(cells) <= IVF_PROBE


def test_append_carries_history_and_is_idempotent(spark, emb, index):
    vec_dir = f"{index}/vectors"
    m1 = read_manifest(vec_dir)
    newbies = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    v = append_ivf_index(newbies, index, batch_id=1)
    m2 = read_manifest(vec_dir)
    assert v == m1["version"] + 1
    # Every batch-0 partition carried by reference.
    for part, rel in m1["partitions"].items():
        assert m2["partitions"][part] == rel
    # New rows are searchable: a copy of vector 0 must retrieve it.
    q = emb.filter(F.col("vec_id") == 0)
    hits = {
        r.neighbor_id for r in search_ivf_index(q, index, 3).collect()
    }
    assert 1_000_000 in hits  # the appended near-identical copy
    # Replay of the same batch commits nothing.
    assert append_ivf_index(newbies, index, batch_id=1) == v
    assert read_manifest(vec_dir)["version"] == v
    assert (
        read_snapshot(spark, vec_dir).filter("vec_id >= 1000000").count() == 5
    )
