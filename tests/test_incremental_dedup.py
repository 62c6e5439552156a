"""Incremental MinHash dedup against a persisted signature store:
steady-state ingest dedup without recomputing the corpus."""

from __future__ import annotations

import pytest

from pandas_analysis_with_postgres_spark.operators.dedup import (
    incremental_minhash_dedup,
)
from pandas_analysis_with_postgres_spark.sources.snapshot import (
    read_manifest,
    read_snapshot,
)

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank today"
)
OTHER = (
    "completely different content about databases indexes and query plans"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "sig_store")


def test_first_batch_bootstraps_store(spark, store):
    res, v = incremental_minhash_dedup(
        _docs(spark, [(1, BASE), (2, OTHER)]), store, batch_id=0
    )
    assert v == 1
    got = {r.doc_id: r for r in res.collect()}
    assert not got[1].is_dup and not got[2].is_dup
    assert read_snapshot(spark, store).count() == 2


def test_cross_batch_dup_found_without_corpus_recompute(spark, store):
    incremental_minhash_dedup(
        _docs(spark, [(1, BASE), (2, OTHER)]), store, batch_id=0
    )
    # Batch 1: one near-copy of doc 1, one genuinely new doc.
    res, v = incremental_minhash_dedup(
        _docs(
            spark,
            [
                (10, BASE + " extra"),
                (11, "fresh unrelated text about mountains and weather"),
            ],
        ),
        store,
        batch_id=1,
    )
    assert v == 2
    got = {r.doc_id: r for r in res.collect()}
    assert got[10].is_dup and got[10].dup_of == 1 and got[10].method == "store"
    assert not got[11].is_dup
    # Only the survivor entered the store.
    ids = {r.doc_id for r in read_snapshot(spark, store).collect()}
    assert ids == {1, 2, 11}
    # Batch 0's partition is carried by reference, not rewritten.
    m1, m2 = read_manifest(store, 1), read_manifest(store, 2)
    assert m2["partitions"]["__batch=0"] == m1["partitions"]["__batch=0"]


def test_within_batch_dup_keep_first(spark, store):
    res, _ = incremental_minhash_dedup(
        _docs(spark, [(5, BASE), (6, BASE + " tail")]), store, batch_id=0
    )
    got = {r.doc_id: r for r in res.collect()}
    assert not got[5].is_dup
    assert got[6].is_dup and got[6].dup_of == 5 and got[6].method == "batch"
    assert {r.doc_id for r in read_snapshot(spark, store).collect()} == {5}


def test_replayed_batch_is_idempotent(spark, store):
    incremental_minhash_dedup(_docs(spark, [(1, BASE)]), store, batch_id=0)
    _, v1 = incremental_minhash_dedup(
        _docs(spark, [(2, OTHER)]), store, batch_id=1
    )
    # Crash-replay of batch 1 (same txn) commits nothing new — and
    # the RESULT must not flag the doc as a dup of its own committed
    # signature (the caller acts on the result).
    res2, v2 = incremental_minhash_dedup(
        _docs(spark, [(2, OTHER)]), store, batch_id=1
    )
    assert v1 == 2 and v2 == 2
    assert read_snapshot(spark, store).count() == 2
    row = {r.doc_id: r for r in res2.collect()}[2]
    assert not row.is_dup and row.dup_of is None


def test_store_side_never_shuffles(spark, store):
    incremental_minhash_dedup(
        _docs(spark, [(1, BASE), (2, OTHER)]), store, batch_id=0
    )
    from pandas_analysis_with_postgres_spark.operators.dedup import (
        band_rows,
        minhash_signatures,
    )
    from pyspark.sql import functions as F

    new = _docs(spark, [(10, BASE + " x")])
    sigs_new = minhash_signatures(new)
    new_bands = band_rows(sigs_new).select(
        F.col("doc_id").alias("new_id"), "band_id", "band_key"
    )
    cand = (
        band_rows(read_snapshot(spark, store))
        .join(F.broadcast(new_bands), ["band_id", "band_key"])
        .select(F.col("doc_id").alias("old_id"), "new_id")
        .distinct()
    )
    plan = cand._sc._jvm.PythonSQLUtils.explainString(
        cand._jdf.queryExecution(), "formatted"
    )
    # The band join must be a BroadcastHashJoin (store side streamed).
    assert "BroadcastHashJoin" in plan


def test_broadcast_gate_demotes_large_batch_and_matches(spark, store):
    """With a tiny autoBroadcastJoinThreshold the size gate must demote
    the batch-side broadcast to a plain shuffle join (no driver OOM on
    a backfill batch) while producing byte-identical results."""
    from pandas_analysis_with_postgres_spark.operators.dedup import (
        minhash_signatures,
    )

    incremental_minhash_dedup(
        _docs(spark, [(1, BASE), (2, OTHER)]), store, batch_id=0
    )
    batch = _docs(spark, [(10, BASE + " x"), (11, "unrelated words here")])

    def run(bb, bid):
        res, _ = incremental_minhash_dedup(
            batch, store, batch_id=bid, app_id=f"gate-{bid}", broadcast_batch=bb
        )
        return {tuple(r) for r in res.collect()}

    # Force-off vs force-on: identical rows (the gate changes only the
    # physical join, never the answer). Distinct app_ids keep the txn
    # watermark from short-circuiting the second run; both batches
    # commit the same survivor set so the store state stays comparable.
    assert run(False, 1) == run(True, 2)

    # The auto gate keys off autoBroadcastJoinThreshold: below the
    # batch's estimated size it must NOT plan a broadcast of new_bands.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64b")
        from pandas_analysis_with_postgres_spark.operators.dedup import (
            _parse_spark_bytes,
        )

        assert _parse_spark_bytes("64b") == 64
        sigs = minhash_signatures(batch).localCheckpoint()
        n = sigs.count()
        assert n * 16 * 64 > 64  # estimate really exceeds the threshold
        # auto mode → demoted to shuffle joins; the answer is unchanged
        res, _ = incremental_minhash_dedup(
            batch, store, batch_id=3, app_id="gate-3"
        )
        assert {r.doc_id for r in res.collect() if r.is_dup} == {10}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_parse_spark_bytes_units():
    from pandas_analysis_with_postgres_spark.operators.dedup import (
        _parse_spark_bytes,
    )

    assert _parse_spark_bytes("10485760") == 10 * 1024 * 1024
    assert _parse_spark_bytes("10MB") == 10 * 1024 * 1024
    assert _parse_spark_bytes("1g") == 1024**3
    assert _parse_spark_bytes("-1") == -1
    assert _parse_spark_bytes("nonsense") == 10 * 1024 * 1024


# ---------------------------------------------------------------------
# incremental_semantic_dedup: the embedding-level twin (r05 ask #9)
# ---------------------------------------------------------------------
class TestIncrementalSemanticDedup:
    """Steady-state embedding dedup against a persisted vector store
    and a persisted (frozen) codebook."""

    DIM = 4

    def _vecs(self, spark, rows):
        return spark.createDataFrame(
            rows, f"vec_id long, embedding array<float>"
        )

    def _cents(self, spark):
        # two frozen cells on the first two axes — the persisted
        # codebook artifact, NOT retrained per batch
        return spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
            "cell_id long, centv array<double>",
        )

    def _run(self, spark, store, rows, batch_id):
        from pandas_analysis_with_postgres_spark.operators.similarity import (
            incremental_semantic_dedup,
        )

        return incremental_semantic_dedup(
            self._vecs(spark, rows),
            store,
            self._cents(spark),
            batch_id=batch_id,
            threshold=0.95,
        )

    def test_bootstrap_then_cross_and_within_batch_dups(self, spark, tmp_path):
        store = str(tmp_path / "vec_store")
        res, v = self._run(
            spark,
            store,
            [(1, [1.0, 0.05, 0.0, 0.0]), (2, [0.0, 1.0, 0.05, 0.0])],
            0,
        )
        assert v == 1
        got = {r.vec_id: r for r in res.collect()}
        assert not got[1].is_dup and not got[2].is_dup
        assert read_snapshot(spark, store).count() == 2

        res, v = self._run(
            spark,
            store,
            [
                # near-dup of stored vec 1 (same cell, cos ≈ 1)
                (10, [1.0, 0.06, 0.0, 0.0]),
                # within-batch dup pair: 11 survives (lower id), 12 drops
                (11, [0.0, 0.0, 1.0, 0.0]),
                (12, [0.0, 0.0, 1.0, 0.01]),
            ],
            1,
        )
        assert v == 2
        got = {r.vec_id: (r.is_dup, r.dup_of, r.method) for r in res.collect()}
        assert got[10] == (True, 1, "store")
        assert got[11][0] is False
        assert got[12] == (True, 11, "batch")
        # store gains only the survivors; older partition untouched
        assert {r.vec_id for r in read_snapshot(spark, store).collect()} == {1, 2, 11}
        m = read_manifest(store, 2)
        assert m["partitions"]["__batch=0"] == read_manifest(store, 1)["partitions"]["__batch=0"]

    def test_replayed_batch_is_noop_and_self_matches_filtered(self, spark, tmp_path):
        store = str(tmp_path / "vec_store")
        self._run(spark, store, [(1, [1.0, 0.05, 0.0, 0.0])], 0)
        v1 = read_manifest(store)["version"]
        # replay batch 0: its own committed vector must not make it a
        # dup of itself, and the store commit is dropped by the txn
        res, v = self._run(spark, store, [(1, [1.0, 0.05, 0.0, 0.0])], 0)
        assert v == v1  # txn watermark: no new commit
        got = {r.vec_id: r for r in res.collect()}
        assert not got[1].is_dup
        assert read_snapshot(spark, store).count() == 1
