"""Structural invariants of sequence packing (q63) beyond the oracle
hash: the per-source token stream must be contiguous and every chunk
index consistent with the budget arithmetic."""

from __future__ import annotations

from pandas_analysis_with_postgres_spark.operators.packing import (
    SEQ_BUDGET,
    pack_sequences,
)
from pandas_analysis_with_postgres_spark.plans import QUERIES

from .conftest import SF_SMOKE


def test_pack_offsets_contiguous_and_budgeted(spark):
    out = (
        QUERIES["a63_sequence_packing"](spark, SF_SMOKE)
        .orderBy("source", "doc_id")
        .collect()
    )
    assert out, "packing produced no rows"
    prev_end: dict[str, int] = {}
    for r in out:
        # Stream contiguity: each doc starts where the previous ended.
        assert r.start_offset == prev_end.get(r.source, 0)
        prev_end[r.source] = r.start_offset + r.n_tokens
        # Chunk arithmetic: indices match the offsets exactly.
        end = r.start_offset + r.n_tokens
        assert r.first_seq == r.start_offset // SEQ_BUDGET
        assert r.last_seq == (end - 1) // SEQ_BUDGET
        assert r.n_seqs == r.last_seq - r.first_seq + 1
        assert r.n_seqs >= 1
        # A doc spanning k sequences must have enough tokens to cross
        # k-1 boundaries.
        assert r.n_tokens > (r.n_seqs - 2) * SEQ_BUDGET


def test_pack_sequences_respects_custom_budget(spark):
    docs = spark.createDataFrame(
        [("s", i, 10) for i in range(1, 8)],
        "source string, doc_id long, n_tokens long",
    )
    rows = {
        r.doc_id: r
        for r in pack_sequences(docs, budget=16).collect()
    }
    # 10-token docs against a 16-token budget: doc 1 fits in seq 0,
    # doc 2 spans the 16-boundary (tokens 10..19) -> seqs 0..1.
    assert (rows[1].first_seq, rows[1].last_seq) == (0, 0)
    assert (rows[2].first_seq, rows[2].last_seq) == (0, 1)
    assert rows[2].n_seqs == 2
    assert rows[7].start_offset == 60
