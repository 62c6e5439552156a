"""Sequence packing: map documents onto fixed token-budget training
sequences (concatenate-in-order, then chunk — the standard LLM
pretraining batch shape).

The reference has no packing surface (it is a pandas reporting script,
SURVEY §2.10); this is extension surface for the 100 TB training-data
pipeline. Semantics: within each partition group (``source``) documents
are concatenated in a deterministic order (``doc_id``) into one token
stream, which is then cut into consecutive ``budget``-token sequences.
Each document therefore spans sequences ``first_seq..last_seq`` — a
pure function of the prefix sum of token counts, so the whole operator
is one window aggregate, no Python, no iteration.

Scale notes (100 TB): the prefix sum is a per-``source`` sort — Spark
plans one Exchange on ``source`` plus an in-partition sort, so
parallelism equals the number of sources. For corpora where single
sources are themselves huge, sub-shard the partition key (e.g.
``(source, doc_id mod S)``) and re-offset with a second pass over the
S per-shard totals — the same two-phase scan pattern as distributed
prefix sums; the per-shard totals frame is tiny and broadcastable.
All arithmetic is exact integers (token counts, offsets), so the
DuckDB oracle replays it bit-for-bit with a window SUM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Default sequence budget in whitespace tokens. Small enough that the
#: sf0.01 fixture (≈1.5k tokens per source) spans several sequences per
#: group — the oracle then actually exercises the chunk arithmetic.
SEQ_BUDGET = 256


def pack_sequences(
    docs: DataFrame,
    tokens_col: str = "n_tokens",
    part_col: str = "source",
    order_col: str = "doc_id",
    budget: int = SEQ_BUDGET,
) -> DataFrame:
    """Assign each document its span of fixed-budget training sequences.

    Input must carry an integer ``tokens_col`` (> 0 per row). Output
    adds ``start_offset`` (tokens before this doc in its group's
    stream), ``first_seq``/``last_seq`` (0-based sequence indices the
    doc touches) and ``n_seqs`` (how many sequences it spans).

    ``floor`` over a double division is exact here: offsets stay far
    below 2^53, so Spark's LONG/DOUBLE and DuckDB's BIGINT agree.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum(tokens_col).over(w)
    start = end - F.col(tokens_col)
    first_seq = F.floor(start / F.lit(budget)).cast("long")
    last_seq = F.floor((end - F.lit(1)) / F.lit(budget)).cast("long")
    return docs.select(
        part_col,
        order_col,
        F.col(tokens_col),
        start.alias("start_offset"),
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + F.lit(1)).alias("n_seqs"),
    )
