"""Distributed BPE-merge vocabulary training over a token corpus.

The byte-pair-encoding trainer every LLM pipeline runs before
tokenization, expressed as iterative DataFrame rounds: count adjacent
token pairs corpus-wide, take the most frequent pair, merge its
occurrences everywhere (leftmost-non-overlapping, the BPE contract),
repeat. The reference (dmCustomerProc.py) has no tokenizer surface;
this is SURVEY §2.12 extension inventory.

Merging without a UDF: the corpus rides in a *double-space-padded*
string form (`' a  b  c '`). A literal pattern ``' w1  w2 '`` then
consumes exactly ONE of the two spaces on each side, so a global
regexp_replace performs leftmost-non-overlapping adjacent-pair merging
while PRESERVING the invariant — neighbours of the merged token still
sit behind two spaces, and runs like ``a a a`` merge to ``a_a a``
exactly as BPE specifies. Java regex and RE2 agree on literal global
replace, so the DuckDB oracle replays every round byte-for-byte.

Preconditions (documented, matched by the fixture): tokens contain no
regex metacharacters and no ``_`` (the merge joiner). A corpus that
violates this needs a quoting pass first.

Scale: each round is one full-corpus pair count (map-side combinable)
plus one narrow regexp map — ``localCheckpoint`` truncates the
per-round lineage exactly as in ``dedup.connected_components`` (a
cluster deployment would use reliable ``checkpoint``; real BPE training
also runs on a deterministic sample of the corpus, not all 100 TB —
``filter(doc_id % m = 0)`` upstream composes with this operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default number of merge rounds — small because each round is a full
#: corpus pass; the oracle unrolls the same number of CTE rounds.
BPE_ROUNDS = 6
#: Joiner for merged tokens. Regex-literal in both engines.
BPE_JOIN = "_"


def _pair_counts(cur: DataFrame) -> DataFrame:
    """(w1, w2, n) adjacent-pair counts of the padded corpus form."""
    staged = cur.select(F.split(F.trim(F.col("t")), "  ").alias("__ts"))
    ts = F.col("__ts")
    idx = F.when(
        F.size(ts) >= 2, F.sequence(F.lit(1), F.size(ts) - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    bg = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(ts, i.cast("int")).alias("w1"),
            F.element_at(ts, (i + 1).cast("int")).alias("w2"),
        ),
    )
    arr = staged.select(bg.alias("bg"))
    # Guarded explode: keep the pair array in its own projection (see
    # dedup.guarded_explode).
    pairs = arr.select(
        F.explode(F.when(F.size("bg") >= 0, F.col("bg"))).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    return pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))


def train_bpe_merges(
    docs: DataFrame, *, rounds: int = BPE_ROUNDS, text_col: str = "text"
) -> DataFrame:
    """Learn ``rounds`` BPE merge rules from a whitespace-token corpus.

    Returns (round, w1, w2, merged, n): the rule learned each round and
    the pair's corpus frequency at the time it was chosen. Ties break
    deterministically (max n, then lexicographic pair) so both engines
    pick the same rule every round.
    """
    cur = docs.select(
        F.concat(
            F.lit(" "),
            F.regexp_replace(F.col(text_col), " ", "  "),
            F.lit(" "),
        ).alias("t")
    ).localCheckpoint()
    spark = docs.sparkSession
    rules: list[tuple] = []
    for r in range(1, rounds + 1):
        # The round's rule is ONE row — fetch it to the driver (the
        # standard iterative-model step, like k-means centroids) and
        # inline it as a literal pattern, exactly as the encode path
        # (apply_bpe_merges) already does. The previous shape shipped
        # the one-row rule back through a localCheckpoint + broadcast
        # crossJoin, paying an extra materialization, a broadcast
        # exchange and a join per round for the same bytes.
        rows = (
            _pair_counts(cur)
            .orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
            .limit(1)
            .collect()
        )
        if not rows:
            # Degenerate corpus (empty, or fewer mergeable pairs than
            # rounds): return the rules learned so far — the contract
            # apply_bpe_merges already tolerates (missing rounds are
            # skipped) and the shape the pre-collect implementation
            # produced. Never reached by the fixtures.
            break
        row = rows[0]
        rules.append((r, row["w1"], row["w2"], row["n"]))
        cur = cur.select(
            F.regexp_replace(
                F.col("t"),
                F.lit(f" {row['w1']}  {row['w2']} "),
                F.lit(f" {row['w1']}{BPE_JOIN}{row['w2']} "),
            ).alias("t")
        ).localCheckpoint()
    from pyspark.sql.types import StructType

    from ..sources.metadata_sql import _local_rows_df

    # JVM-side literal frame (no Python worker launch) — the rules are
    # a <= ``rounds``-row model artifact.
    out = _local_rows_df(
        spark,
        rules,
        StructType.fromDDL("round int, w1 string, w2 string, n bigint"),
    )
    return out.select(
        "round",
        "w1",
        "w2",
        F.concat(F.col("w1"), F.lit(BPE_JOIN), F.col("w2")).alias("merged"),
        "n",
    )


def apply_bpe_merges(
    docs: DataFrame,
    merges: DataFrame,
    *,
    rounds: int = BPE_ROUNDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with already-learned merge rules (the tokenize
    step that follows `train_bpe_merges`).

    Applies each round's rule in training order via the same padded
    literal-replace trick — so encoding is byte-for-byte the corpus
    transform training performed. The rules are a *model artifact* of
    at most ``rounds`` rows, so they are fetched to the driver once and
    inlined as literal patterns: the chain is then ``rounds`` narrow
    map stages over the corpus with ZERO joins — no shuffle,
    embarrassingly parallel. (The previous per-round crossJoin form
    silently dropped every document when a round had no learned rule —
    a degenerate corpus edge; missing rounds are now simply skipped,
    which matches the oracle's empty-subquery NULL-keep semantics.)

    Returns (id_col, n_pieces, encoded): piece count and the
    single-space encoded token stream.
    """
    rules = {
        int(r["round"]): (r["w1"], r["w2"])
        for r in merges.select("round", "w1", "w2").collect()
        if r["w1"] is not None and r["w2"] is not None
    }
    t = F.concat(
        F.lit(" "),
        F.regexp_replace(F.col(text_col), " ", "  "),
        F.lit(" "),
    )
    for r in range(1, rounds + 1):
        if r not in rules:  # degenerate corpus: no pair left that round
            continue
        w1, w2 = rules[r]
        t = F.regexp_replace(
            t,
            F.lit(f" {w1}  {w2} "),
            F.lit(f" {w1}{BPE_JOIN}{w2} "),
        )
    cur = docs.select(F.col(id_col), t.alias("t"))
    trimmed = F.trim(F.col("t"))
    return cur.select(
        F.col(id_col),
        F.size(F.split(trimmed, "  ")).cast("long").alias("n_pieces"),
        F.replace(trimmed, F.lit("  "), F.lit(" ")).alias("encoded"),
    )
