"""Python UDTFs — the table-function quadrant of the Python surface.

The engine's Python crossings now cover all four shapes Spark offers:
scalar ``pandas_udf`` (similarity extensions), grouped
``applyInPandas`` (a94), ``applyInPandasWithState`` (a47 streaming),
``mapInPandas`` (a35/a97 media decode) — and, here, a **UDTF**
(``CREATE FUNCTION``-style table function consumed via ``LATERAL``),
the right tool when one input row expands into a variable number of
typed rows through genuinely procedural per-row logic.

The reference has no UDFs at all (SURVEY §2.11 — its 19 ``.apply``
lambdas all collapsed into Catalyst expressions), so this is extension
surface, aimed at the LLM-pipeline need: sliding-window document
chunking for retrieval indexes (overlapping windows, unlike
a73_doc_chunks' contiguous split).

Scale shape: a UDTF lateral join is a NARROW map — no shuffle, no
state, one Arrow batch in / a longer Arrow batch out
(``useArrow=True`` plans as ``ArrowEvalPythonUDTF``; the row-at-a-time
``BatchEvalPythonUDTF`` variant is banned by the same plan pin that
bans row-at-a-time UDFs). At 100 TB it scales exactly like the scan it
is fused onto; the only cost lever is the Python worker, which the
Arrow batch transfer amortizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

#: Sliding-window chunking geometry: 16-token windows advancing 12
#: tokens — 4 tokens of overlap so a retrieval hit near a boundary is
#: present in both neighbors. Constants are shared with the z09 oracle.
CHUNK_SIZE = 16
CHUNK_STRIDE = 12


@udtf(returnType="chunk_idx int, n_tokens int, chunk string", useArrow=True)
class SlidingChunker:
    """One document in → one row per overlapping token window.

    Windows start at 0, STRIDE, 2·STRIDE, …; emission stops with the
    first window whose end reaches the document end (so every token is
    covered exactly once past the overlap, and a short document yields
    exactly one window). Deterministic, replayed exactly by Z09_SQL.
    """

    def eval(self, text: str):  # noqa: D102 - contract in class docstring
        toks = text.split(" ")
        i = idx = 0
        while i < len(toks):
            window = toks[i : i + CHUNK_SIZE]
            yield idx, len(window), " ".join(window)
            if i + CHUNK_SIZE >= len(toks):
                break
            idx += 1
            i += CHUNK_STRIDE


def sliding_chunks(
    spark: SparkSession,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping retrieval chunks of every document via the UDTF
    lateral join: (id_col, chunk_idx, n_tokens, chunk)."""
    spark.udtf.register("sliding_chunker", SlidingChunker)
    docs.select(id_col, text_col).createOrReplaceTempView("__chunk_in")
    return spark.sql(
        f"""
        SELECT d.{id_col}, c.chunk_idx, c.n_tokens, c.chunk
        FROM __chunk_in d, LATERAL sliding_chunker(d.{text_col}) c
        """
    )
