"""Persisted IVF-PQ index: build / append / search with manifest
pruning, equivalence with the in-query ivfpq_topk, and append
idempotence — the compressed-codes twin of tests/test_ivf_index.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import pandas_analysis_with_postgres_spark.operators.similarity as SIM
from pandas_analysis_with_postgres_spark.sources.parquet import load_table
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    read_manifest,
    read_snapshot,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").localCheckpoint()


@pytest.fixture(scope="module")
def quantizers(spark, emb):
    books = SIM.pq_codebooks(emb).localCheckpoint()
    coarse = SIM.ivfpq_coarse(emb).localCheckpoint()
    return books, coarse


@pytest.fixture()
def index(spark, emb, quantizers, tmp_path):
    books, coarse = quantizers
    path = str(tmp_path / "ivfpq")
    SIM.build_ivfpq_index(emb, path, books=books, coarse=coarse)
    return path


def _key(df):
    return {
        (r.query_id, r.neighbor_id, r.rank, round(r.ad2, 9))
        for r in df.collect()
    }


def test_search_matches_in_query_ivfpq(spark, emb, quantizers, index):
    books, coarse = quantizers
    queries = emb.filter(F.col("vec_id") % 50 == 7)
    got = SIM.search_ivfpq_index(queries, index, 5)
    cells = SIM.ivfpq_cells(emb, coarse)
    codes = SIM.pq_encode(emb, books)
    want = SIM.ivfpq_topk(cells, codes, queries, coarse, books, 5)
    assert _key(got.drop("cell_id")) == _key(want)
    # The extra cell_id column is the neighbor's true cell.
    cell_of = {r.vid: r.cell_id for r in cells.collect()}
    for r in got.collect():
        assert r.cell_id == cell_of[r.neighbor_id]


def test_search_prunes_partitions_at_manifest(spark, emb, index):
    queries = emb.filter(F.col("vec_id") == 7)
    got = SIM.search_ivfpq_index(queries, index, 5)
    files = {f for f in got.inputFiles() if f"{index}/codes" in f}
    assert files, "search must read the codes store"
    cells = {
        f.split("__part=")[1].split("/")[0].rsplit("_b", 1)[0]
        for f in files
        if "__part=" in f
    }
    assert 0 < len(cells) <= SIM.IVFPQ_PROBE
    # ... and it never touches the raw embeddings fixture.
    assert not any("embeddings.parquet" in f for f in got.inputFiles())


def test_append_carries_history_and_is_idempotent(spark, emb, index):
    codes_dir = f"{index}/codes"
    m1 = read_manifest(codes_dir)
    newbies = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    v = SIM.append_ivfpq_index(newbies, index, batch_id=1)
    m2 = read_manifest(codes_dir)
    assert v == m1["version"] + 1
    for part, rel in m1["partitions"].items():
        assert m2["partitions"][part] == rel
    # The appended exact copy of vector 0 shares its codes, so ADC
    # distance ties the original — it must surface in a top-3 probe.
    q = emb.filter(F.col("vec_id") == 0)
    hits = {
        r.neighbor_id
        for r in SIM.search_ivfpq_index(q, index, 3).collect()
    }
    assert 1_000_000 in hits
    # Replay of the same batch commits nothing.
    assert SIM.append_ivfpq_index(newbies, index, batch_id=1) == v
    assert read_manifest(codes_dir)["version"] == v
    assert (
        read_snapshot(spark, codes_dir).filter("vid >= 1000000").count() == 5
    )


def test_stream_ivfpq_ingest_end_to_end(spark, emb, quantizers, tmp_path):
    """Streaming index maintenance: micro-batches of new vectors are
    encoded against the stored quantizers and land as their own batch
    partitions; a live probe sees them; crash-replay from the
    checkpoint commits nothing new."""
    import os

    from pandas_analysis_with_postgres_spark.streaming import (
        stream_ivfpq_ingest,
    )

    books, coarse = quantizers
    path = str(tmp_path / "ivfpq")
    SIM.build_ivfpq_index(emb, path, books=books, coarse=coarse)

    land = tmp_path / "landing"
    land.mkdir()
    schema = "vec_id long, embedding array<float>"
    base = {r.vec_id: r.embedding for r in emb.filter(F.col("vec_id") < 2).collect()}
    b0 = spark.createDataFrame([(1_000_000, base[0])], schema)
    b1 = spark.createDataFrame([(1_000_001, base[1])], schema)
    b0.coalesce(1).write.parquet(str(land / "f0.parquet"))
    b1.coalesce(1).write.parquet(str(land / "f1.parquet"))
    for i, name in enumerate(sorted(os.listdir(land))):
        os.utime(land / name, (1_600_000_000 + i, 1_600_000_000 + i))

    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(land / "*.parquet"))
        )
        stream_ivfpq_ingest(
            stream, path, app_id="ivfpqstream", checkpoint_dir=ckpt
        )

    run()
    codes_dir = f"{path}/codes"
    v = read_manifest(codes_dir)["version"]
    assert v >= 3  # bootstrap + 2 micro-batches
    stored = {
        r.vid for r in read_snapshot(spark, codes_dir).collect()
    }
    assert {1_000_000, 1_000_001} <= stored
    # The streamed exact copy of vector 0 ties it in ADC distance and
    # must surface in a live probe.
    q = emb.filter(F.col("vec_id") == 0)
    hits = {
        r.neighbor_id for r in SIM.search_ivfpq_index(q, path, 3).collect()
    }
    assert 1_000_000 in hits

    # Drain again from the same checkpoint: nothing new commits.
    run()
    assert read_manifest(codes_dir)["version"] == v


def test_redelivered_vid_is_deduped_latest_batch_wins(spark, emb, index):
    """An embedding update re-delivered under the SAME vid lands in a
    new batch partition while the old row survives in its cold one.
    The search must return the vector ONCE (before the latest-wins
    dedup, duplicate (vid, m) rows doubled the ADC sums and the
    __nm == n_sub guard silently dropped it from every result)."""
    copy = emb.filter(F.col("vec_id") == 0).select(
        F.lit(1_000_000).alias("vec_id"), "embedding"
    )
    SIM.append_ivfpq_index(copy, index, batch_id=1)
    SIM.append_ivfpq_index(copy, index, batch_id=2)  # re-delivery
    dup_rows = (
        read_snapshot(spark, f"{index}/codes")
        .filter("vid = 1000000")
        .count()
    )
    assert dup_rows == 2, "fixture must actually create the duplicate"
    q = emb.filter(F.col("vec_id") == 0)
    got = SIM.search_ivfpq_index(q, index, 3).collect()
    hits = [r.neighbor_id for r in got]
    assert hits.count(1_000_000) == 1, hits
