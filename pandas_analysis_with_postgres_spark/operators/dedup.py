"""Document deduplication for LLM-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale-first design (the 100 TB contract):
- *exact*: group by a 256-bit content hash, never by the raw text — the
  shuffle carries 32 bytes + doc_id per row, not documents.
- *n-gram Jaccard*: explode distinct shingles → self-join on shingle →
  per-pair co-occurrence counts. Pair work is proportional to shared
  shingles, not |docs|² (all-pairs exists only in the DuckDB oracle).
- *MinHash+LSH*: signatures via K independent linear permutations over
  a 45-bit shingle value, banded into buckets; candidates come from a
  bucket equi-join, then exact-Jaccard verification. Work ∝ collisions.
- *SimHash*: 32-bit sign-aggregate fingerprint; near-dup = small
  Hamming distance, found via 4-band exact-match blocking (Hamming ≤ 3
  guarantees one identical 8-bit band — pigeonhole).

Hashing is intentionally *arithmetic* (multiply-add-mod on exact
integers ≤ 2^62) rather than xxhash64/md5: the same numbers are
computable in ANSI SQL, so even the LSH pipelines are hash-verified
against DuckDB — the oracle replays the algorithm, candidates and all.
A weak-ish 15-bit token base value feeds a 45-bit injective shingle
combiner, which the permutations then spread; for adversarial corpora
swap `_token_value` for xxhash64 (one line) at the cost of the oracle.

No UDFs anywhere — everything is codegen'd higher-order expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_from_tokens as _shingles_from_toks
from ..functions.text import tokens as _tokens

# ---------------------------------------------------------------------
# Deterministic constants, shared verbatim with the SQL oracle
# generators in plans.extension_queries. Derived from a tiny LCG so the
# "randomness" is reproducible from a seed without the random module.
# ---------------------------------------------------------------------
MINHASH_P = 2_147_483_647  # 2^31 - 1
TOKEN_BASE = 32_768  # 2^15 — token values are < 2^15
NUM_PERMS = 32
LSH_ROWS = 2  # minhashes per band
LSH_BANDS = NUM_PERMS // LSH_ROWS  # 16 bands → recall .99 @ j=0.5
BAND_MIX = 2_654_435_761  # Knuth multiplicative constant
SIMHASH_BITS = 32


def _lcg(seed: int):
    state = seed
    while True:
        state = (state * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (
            1 << 64
        )
        yield state


def _gen_perm_constants(k: int = NUM_PERMS) -> list[tuple[int, int]]:
    g = _lcg(42)
    out = []
    for _ in range(k):
        a = next(g) % 65_535 + 1  # a in [1, 2^16] keeps a*shv < 2^62
        b = next(g) % MINHASH_P
        out.append((a, b))
    return out


PERM_CONSTANTS = _gen_perm_constants()


def token_value(t: Column) -> Column:
    """Token → integer < 2^15: (codepoint(first char)*256 + length)
    mod 2^15.

    The mod clamp matters: ``F.ascii`` returns the full first-char
    codepoint (not just 0-127) and token length is unbounded, so the
    unclamped value could exceed 2^15 and break the 45-bit shingle
    bound — Spark longs would then wrap silently where DuckDB BIGINT
    raises, diverging engine from oracle on non-ASCII corpora. The
    clamp keeps every downstream product exact in 64-bit in BOTH
    engines. For ASCII tokens shorter than ~1.5k chars the mod is an
    identity, so fixture results are unchanged.

    Deliberately SQL-reproducible (DuckDB has no xxhash64). See module
    docstring for the swap-in point for adversarial data.
    """
    return F.pmod(
        F.ascii(t).cast("long") * 256 + F.length(t), F.lit(TOKEN_BASE)
    ).cast("long")


def _shingles_from_tv(tv: Column, n: int = 3) -> Column:
    """Distinct shingle values from an already-computed token-value
    array (see ``_with_shingle_values`` for why tv should be a plain
    column reference, not an inline expression)."""
    # Guard: F.sequence(1, 0) is descending [1, 0], not empty.
    idx = F.when(
        F.size(tv) >= n, F.sequence(F.lit(1), F.size(tv) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    combined = F.transform(
        idx,
        lambda i: (
            (
                F.element_at(tv, i.cast("int")) * TOKEN_BASE
                + F.element_at(tv, (i + 1).cast("int"))
            )
            * TOKEN_BASE
            + F.element_at(tv, (i + 2).cast("int"))
        ),
    )
    return F.array_distinct(combined)


def shingle_values(text: Column, n: int = 3) -> Column:
    """Distinct n-gram shingle values < 2^45: base-2^15 combination of
    token values — injective, exact in 64-bit in both engines.

    NB: as a single Column expression this inlines the tokenize
    pipeline once per ``element_at`` reference — prefer
    ``_with_shingle_values`` (a DataFrame transform) anywhere the input
    is a frame; this form exists for composing into other single-column
    expressions."""
    return _shingles_from_tv(F.transform(_tokens(text), token_value), n)


def _with_shingle_values(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_alias: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id_alias, sv) with shingle values computed in TWO projections:
    token values land in their own Project, so the three ``element_at``
    references in the combiner read a bound column instead of three
    inlined copies of the tokenize pipeline.

    This matters far more than it looks: CollapseProject declines to
    merge the projections (tv is non-cheap and multi-referenced), the
    generated code shrinks ~10×, and both JIT time and per-row work
    drop with it — measured 9.7 s → 0.7 s cold for the shingle stage
    over sf0.1 documents in one JVM. The single-expression form pays
    that cost at every scale; this one never does.
    """
    staged = df.select(
        F.col(id_col).alias(id_alias),
        F.transform(_tokens(F.col(text_col)), token_value).alias("__tv"),
    )
    return staged.select(
        id_alias, _shingles_from_tv(F.col("__tv"), n).alias("sv")
    )


def guarded_explode(col: str) -> Column:
    """``explode(col)`` phrased so the exploded column is referenced
    TWICE in the generator (a size guard that is always true for
    non-null arrays — null stays null, so row semantics are identical
    to a bare explode).

    Why: the optimizer substitutes a single-referenced projection into
    the Generate node, re-inlining however much work produced the array
    — for a shingle array that put ELEVEN copies of the tokenize
    pipeline into the generated code (measured 11.2 s vs 0.8 s at
    sf0.1). The double reference makes the projection non-collapsible,
    so the array is computed once in its own Project and the Generate
    reads a bound column. Use for any explode of an EXPENSIVE computed
    array; a bare explode is fine for attributes and cheap expressions.
    """
    c = F.col(col)
    return F.explode(F.when(F.size(c) >= 0, c))


def _rebalance(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism
    when the scan has fewer splits.

    The hashing stages below are CPU-bound narrow maps; a small input
    (e.g. one parquet row group) would otherwise serialize them on one
    core. At real scale the input already has far more splits than
    cores and this is a no-op — no shuffle is added.

    Split-count probe: ``inputFiles()`` (a driver-side file listing,
    no plan execution) — NOT ``df.rdd.getNumPartitions()``, which
    forces a plan-to-RDD conversion per call. One file can hold several
    row groups, so this undercounts splits slightly; the only cost of
    that is a redundant round-robin on inputs near the core count.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file-backed plan: leave partitioning alone
        return df
    if 0 < n_files < target:
        df = df.repartition(target)
    return df


# ---------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------
def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate clusters via SHA-256 content hash.

    Returns one row per distinct content: (text_hash, keep_id = min id,
    n_copies). Grouping by the 32-byte digest keeps the shuffle narrow
    at 100 TB; collisions are cryptographically negligible.
    """
    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------
# n-gram Jaccard near-dup (exact similarity, join-based)
# ---------------------------------------------------------------------
def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_df: "int | None" = 1000,
) -> DataFrame:
    """All document pairs with n-gram-shingle Jaccard ≥ threshold.

    Plan shape: explode distinct shingles → self-equi-join on shingle →
    count co-occurrences per pair → jaccard = co / (na + nb - co).
    Only pairs sharing ≥1 shingle ever materialize, so cost follows
    shingle collisions, not |docs|². The per-doc shingle-count frames
    are one row PER DOCUMENT, so they join by plain shuffle hash join
    on the doc id — broadcasting them would be O(|docs|) driver/executor
    memory (billions of rows at 100 TB, a guaranteed OOM). AQE is free
    to promote the join at runtime when the corpus really is tiny; the
    plan must not force it.

    ``max_shingle_df`` is the STOP-SHINGLE guard: the self-equi-join is
    quadratic *per shingle value*, so one boilerplate shingle shared by
    1M documents would materialize ~10¹² join rows. Shingles whose
    document frequency exceeds the cap are dropped BEFORE the join
    (the standard stop-shingle filter), bounding per-shingle pair work
    at cap²/2 — and per-doc counts are taken over the retained shingle
    set, so the reported value is Jaccard over non-boilerplate
    shingles. A df-capped shingle is near-useless evidence of
    *specific* duplication anyway (it co-occurs everywhere). Pass
    ``None`` to opt out explicitly (exact classical Jaccard; only safe
    on corpora known to be boilerplate-free).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    # String shingles (collision-free — the exact operator must not
    # inherit token_value's 2^15 clamp collisions), staged in two
    # projections + guarded explode so the tokenize pipeline is never
    # re-inlined into the Generate (see _with_shingle_values /
    # guarded_explode for the measured 10× codegen effect).
    sh = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("__toks")
    ).select(
        "doc_id", _shingles_from_toks(F.col("__toks"), n).alias("__sh")
    ).select("doc_id", guarded_explode("__sh").alias("sh"))
    # Materialize the exploded shingle frame once (lazy localCheckpoint):
    # it has up to four consumers below (stop-shingle aggregate,
    # semi-join probe, per-doc counts, both sides of the pair join),
    # and without the checkpoint each consumer re-runs the full
    # tokenize+shingle explode — measured eight Generate nodes in the
    # q23 plan, ~5x the shingle work. The materialized frame is
    # O(total shingles), the same order as the shuffle the pair join
    # already pays.
    sh = sh.localCheckpoint(eager=False)
    if max_shingle_df is not None:
        # Drop boilerplate shingles before the quadratic join. The
        # retained-shingle set is a plain shuffle semi-join: the hot
        # set is bounded by |instances|/cap rows but need not be
        # broadcast-small — AQE promotes it at runtime when it is.
        retained = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_shingle_df)
            .select("sh")
        )
        # Materialize the retained frame too: its three consumers
        # (counts, pair-join sides) would each replay the semi-join
        # and the stop-shingle aggregate feeding its broadcast.
        sh = sh.join(retained, "sh", "left_semi").localCheckpoint(
            eager=False
        )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    co = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        co.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("jaccard", F.col("co") / (F.col("na") + F.col("nb") - F.col("co")))
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "jaccard")


# ---------------------------------------------------------------------
# MinHash + LSH near-dup (the 100 TB path)
# ---------------------------------------------------------------------
def minhash_signatures(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """K-permutation MinHash signature columns mh0..mh{K-1}.

    Signature k = min over shingles s of (a_k·s + b_k) mod p — computed
    as array expressions per row (no explode, no shuffle): at 100 TB
    this is a single narrow map stage.

    The shingle array is materialized behind a projection boundary and
    folded in ONE pass into an array of K running minima (per-shingle
    ``transform`` over the accumulator). Inlining the tokenize+shingle
    pipeline into each of the K signature columns instead recomputes
    the regexp work K times per row — measured 30× slower. min is
    order-independent exact integer math, so values are unchanged.
    """
    shingled = _with_shingle_values(
        _rebalance(docs), id_col=id_col, text_col=text_col
    )
    perm_a = F.array(*[F.lit(a).cast("long") for a, _ in PERM_CONSTANTS])
    perm_b = F.array(*[F.lit(b).cast("long") for _, b in PERM_CONSTANTS])
    fold = F.aggregate(
        F.col("sv"),
        F.array_repeat(F.lit(MINHASH_P).cast("long"), NUM_PERMS),
        lambda acc, s: F.transform(
            acc,
            lambda m, i: F.least(
                m,
                (
                    F.element_at(perm_a, (i + 1).cast("int")) * s
                    + F.element_at(perm_b, (i + 1).cast("int"))
                )
                % F.lit(MINHASH_P),
            ),
        ),
    )
    # Shingle-less docs must yield NULL signatures (array_min semantics),
    # not the init sentinel — otherwise they'd all share a band bucket.
    staged = shingled.select(
        "doc_id", F.when(F.size("sv") > 0, fold).alias("mins")
    )
    return staged.select(
        "doc_id",
        *[F.element_at("mins", k + 1).alias(f"mh{k}") for k in range(NUM_PERMS)],
    )


def band_rows(signatures: DataFrame) -> DataFrame:
    """Exploded banded-LSH rows (doc_id, band_id, band_key) from a
    MinHash signature frame: bands of LSH_ROWS signatures mixed into
    one 63-bit band key. Narrow map + explode — no shuffle."""
    bands = []
    for band in range(LSH_BANDS):
        lo = F.col(f"mh{band * LSH_ROWS}")
        hi = F.col(f"mh{band * LSH_ROWS + 1}")
        key = (lo * F.lit(BAND_MIX) + hi) % F.lit(MINHASH_P)
        bands.append(F.struct(F.lit(band).alias("band_id"), key.alias("band_key")))
    return signatures.select(
        "doc_id", F.explode(F.array(*bands)).alias("b")
    ).select(
        "doc_id",
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_key").alias("band_key"),
    )


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Banded-LSH candidate pairs from a MinHash signature frame.

    Docs sharing any (band_id, band_key) become candidates via a
    self-equi-join on the exploded band frame. This is the only shuffle
    in the pipeline and it is keyed by band buckets — skew appears only
    if many documents are near-identical, in which case AQE's skew-join
    splitting kicks in.
    """
    # Materialize the banded frame once (lazy localCheckpoint): both
    # sides of the self-join below consume it, and without this each
    # side re-runs the full signature fold — two extra corpus hash
    # passes per candidate generation.
    exploded = band_rows(signatures).localCheckpoint(eager=False)
    a = exploded.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
    b = exploded.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    *,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    Candidates from banded LSH, then each candidate pair's true shingle
    Jaccard is computed via array_intersect on the (re-joined) shingle
    arrays and filtered at ``threshold``. Verification touches only
    candidate pairs — the all-pairs quadratic never exists.

    The candidate set is materialized once (lazy ``localCheckpoint`` —
    bounded by candidate count, which the algorithm already assumes is
    small vs the corpus) so the LSH pipeline is not recomputed per
    verify branch, and verify-side shingle arrays are computed ONLY for
    documents appearing in some candidate pair (semi-join *before* the
    hash work). Without this, both verify branches re-shingled the full
    corpus — two extra full-text hash passes that at 100 TB would
    rival the signature stage itself.
    """
    docs = _rebalance(docs)
    # ``signatures``: reuse a precomputed signature frame (incremental
    # ingest computes it anyway for the store) instead of paying the
    # full-text hash stage a second time.
    sigs = (
        signatures
        if signatures is not None
        else minhash_signatures(docs, text_col=text_col, id_col=id_col)
    )
    cand = lsh_candidate_pairs(sigs).localCheckpoint(eager=False)
    return _verified_pairs(
        docs, cand, threshold=threshold, text_col=text_col, id_col=id_col
    )


def _verified_pairs(
    docs: DataFrame,
    cand: DataFrame,
    *,
    threshold: float,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Exact shingle-Jaccard verification of a candidate-pair frame
    ``(doc_a, doc_b)`` — the shared tail of every blocking family
    (LSH bands, sorted neighborhood): shingle arrays are computed ONLY
    for documents appearing in some candidate pair (semi-join before
    the hash work), the all-pairs quadratic never exists. Pairs whose
    docs are both shingle-less divide 0/0 → NULL jaccard → dropped by
    the threshold (same in the DuckDB oracle)."""
    ids = cand.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    sh = _with_shingle_values(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
        .join(ids, "doc_id", "left_semi"),
        text_col="__t",
    ).localCheckpoint(eager=False)
    # ^ both pair sides below consume the verify-side shingle frame;
    # the checkpoint keeps it one hash pass instead of two.
    pa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sv").alias("sv_a"))
    pb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sv").alias("sv_b"))
    joined = cand.join(pa, "doc_a").join(pb, "doc_b")
    co = F.size(F.array_intersect(F.col("sv_a"), F.col("sv_b")))
    union = F.size(F.col("sv_a")) + F.size(F.col("sv_b")) - co
    return (
        joined.withColumn("jaccard", co / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    *,
    window: int = 8,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sorted-neighborhood (SNM) near-duplicate pairs — the third
    blocking family next to banded LSH (:func:`minhash_dedup_pairs`)
    and byte-blocked SimHash (:func:`simhash_near_pairs`): rank every
    document by its SimHash fingerprint (similar docs sort near each
    other — high-order bits agree), take every pair within ``window``
    rank positions as a candidate, verify with exact shingle Jaccard.

    Why a third family: LSH recall is set by band/row shape and its
    bucket joins can skew on clone-heavy corpora; SNM's candidate
    count is EXACTLY N·(window−1) — flat, skew-free, budget-predictable
    — at the cost of missing pairs whose fingerprints sort more than
    ``window`` apart. The classic record-linkage trade (Hernández &
    Stolfo's merge/purge), here with the fingerprint as the sort key.

    Scale shape: the global sort is the two-level rank
    (:func:`~..operators.sharding.global_rank` — O(non-empty buckets)
    driver metadata, never the data), neighbors come from ONE
    rank-equi-join (offsets exploded probe-side, no range join, no
    window over a single partition), verification is bounded by the
    candidate count via the shared semi-join-first tail.
    """
    from .sharding import global_rank

    docs = _rebalance(docs)
    sh = simhash(docs, text_col=text_col, id_col=id_col)
    # 32-bit keyspace / 2^20 width = ≤4096 bucket rows on the driver
    r = global_rank(
        sh, "simhash", bucket_width=1 << 20, tiebreak_col="doc_id"
    ).select("rank", "doc_id")
    # rank frame feeds both sides of the self-join: pin it so the
    # sort pipeline runs once
    r = r.localCheckpoint(eager=False)
    probe = r.select(
        F.col("doc_id").alias("__a"),
        F.explode(
            F.sequence(F.col("rank") + 1, F.col("rank") + window - 1)
        ).alias("rank"),
    )
    cand = (
        probe.join(r.withColumnRenamed("doc_id", "__b"), "rank")
        .select(
            F.least("__a", "__b").alias("doc_a"),
            F.greatest("__a", "__b").alias("doc_b"),
        )
    )
    return _verified_pairs(
        docs, cand, threshold=threshold, text_col=text_col, id_col=id_col
    )


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------
def simhash(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash fingerprint per document.

    Token → 32-bit Knuth-mixed value; bit j of the fingerprint is the
    sign of Σ_tokens (bit_j(token_hash)·2 − 1). Pure array expressions,
    one narrow map stage; SQL-reproducible.
    """
    tv = F.transform(_tokens(F.col(text_col)), token_value)
    mixed = F.transform(tv, lambda v: (v * F.lit(BAND_MIX)) % F.lit(4_294_967_296))

    # One pass over the tokens, folding all 32 per-bit ±1 sums at once
    # (inlining `mixed` into 32 per-bit aggregates recomputes the
    # tokenize pipeline 32× per row). Integer sums are order-independent
    # → values identical to the per-bit formulation in the oracle.
    bit_sums = F.aggregate(
        mixed,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, v: F.transform(
            acc, lambda s, j: s + F.getbit(v, j).cast("long") * 2 - 1
        ),
    )
    pow2 = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])
    staged = _rebalance(docs).select(
        F.col(id_col).alias("doc_id"), bit_sums.alias("bs")
    )
    fingerprint = F.aggregate(
        F.zip_with(
            F.col("bs"), pow2, lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return staged.select("doc_id", fingerprint.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ max_hamming.

    Blocking: split the 32-bit fingerprint into 4 bytes; pairs within
    Hamming ≤ 3 must agree exactly on ≥1 byte (pigeonhole), so
    candidates come from 4 equi-joins on (byte_id, byte_value) — never
    all-pairs. Hamming computed via bit_count(xor).
    """
    sh = simhash(docs, text_col=text_col, id_col=id_col)
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                F.shiftright(F.col("simhash"), i * 8).bitwiseAND(F.lit(255)).alias("block_val"),
            )
            for i in range(4)
        ]
    )
    exploded = sh.select("doc_id", "simhash", F.explode(blocks).alias("b")).select(
        "doc_id", "simhash", F.col("b.block_id").alias("block_id"), F.col("b.block_val").alias("block_val")
    )
    a = exploded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "block_id", "block_val"
    )
    b = exploded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "block_id", "block_val"
    )
    pairs = (
        a.join(b, ["block_id", "block_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------
# Dedup decision: connected components over the near-dup pair graph
# ---------------------------------------------------------------------
def connected_components(
    pairs: DataFrame,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 10,
) -> DataFrame:
    """Label every node of the near-dup pair graph with its component's
    smallest member id — the survivor a dedup pipeline keeps.

    Iterative smallest-id propagation, all in DataFrames: each round
    every node takes min(own label, neighbors' labels); a round is one
    shuffle join on the edge list + one groupBy. Converges in at most
    the graph diameter rounds — near-dup graphs are shallow (pairs,
    triangles, small stars), so the loop usually exits after 2-3 rounds
    via the driver-side convergence check (one count per round: this is
    a deliberately iterative algorithm, not a collect of data rows).
    ``localCheckpoint`` truncates the per-round lineage so the plan
    doesn't grow exponentially; a cluster deployment would use reliable
    ``checkpoint`` with a checkpoint dir instead. Raises if ``max_iter``
    rounds don't converge — a silent cap would mis-label deep chains.

    Returns (id, comp): one row per node appearing in ``pairs``.
    Isolated documents never enter the frame — callers COALESCE to the
    doc's own id (see q49).
    """
    edges = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # The changed flag rides the per-round materialization (the
        # round's label join is computed once and checkpointed anyway),
        # so convergence costs one cheap scan of the materialized frame
        # instead of a second new-vs-old label join per round.
        flagged = (
            labels.join(nbr, labels["id"] == nbr["dst"], "left")
            .select(
                labels["id"],
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
                (
                    F.least(
                        F.col("comp"),
                        F.coalesce(F.col("nbr_comp"), F.col("comp")),
                    )
                    != F.col("comp")
                ).alias("__chg"),
            )
            .localCheckpoint()
        )
        changed = flagged.filter(F.col("__chg")).count()
        labels = flagged.select("id", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "raise max_iter for graphs with longer chains"
    )


# ---------------------------------------------------------------------
# Benchmark decontamination: shingle containment against a small set
# ---------------------------------------------------------------------
def containment_pairs(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-corpus decontamination: every (train_doc, bench_doc)
    pair whose shingle CONTAINMENT |S(train) ∩ S(bench)| / |S(bench)|
    ≥ ``threshold`` — the asymmetric cousin of Jaccard that flags a
    training document even when it merely *includes* a benchmark item
    inside a much larger page (Jaccard would dilute toward 0 there).

    Plan shape for 100 TB corpus vs ~10^4-10^6 benchmark rows: the
    bench side explodes to (bench_doc, shingle) and is BROADCAST; the
    corpus explodes map-side and the pair counts come from the
    broadcast hash join + groupBy — the corpus is scanned exactly once
    and never self-joined. Bench shingle-set sizes are a second, tiny
    broadcast. Same-id pairs are excluded so a benchmark can be screened
    against the corpus it was drawn from.

    Returns (train_doc, bench_doc, containment), containment in [0,1].
    """
    sv_corpus = _with_shingle_values(
        _rebalance(corpus), id_col=id_col, text_col=text_col, id_alias="train_doc"
    ).select("train_doc", guarded_explode("sv").alias("sh"))
    sv_bench = _with_shingle_values(
        bench, id_col=id_col, text_col=text_col, id_alias="bench_doc"
    )
    bench_sh = sv_bench.select(
        "bench_doc", guarded_explode("sv").alias("sh")
    )
    bench_sizes = sv_bench.select("bench_doc", F.size("sv").alias("nb"))
    co = (
        sv_corpus.join(F.broadcast(bench_sh), "sh")
        .filter(F.col("train_doc") != F.col("bench_doc"))
        .groupBy("train_doc", "bench_doc")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    return (
        co.join(F.broadcast(bench_sizes), "bench_doc")
        .withColumn(
            "containment", F.col("co").cast("double") / F.col("nb").cast("double")
        )
        .filter(F.col("containment") >= threshold)
        .select("train_doc", "bench_doc", "containment")
    )


# ---------------------------------------------------------------------
# Incremental dedup against a persisted signature store
# ---------------------------------------------------------------------
def _parse_spark_bytes(value: str) -> int:
    """Parse a Spark byte-size conf value ('10485760', '10MB', '1g',
    '-1') into bytes; unparseable values fall back to Spark's 10 MiB
    default."""
    s = str(value).strip().lower()
    for suffix, mult in (
        ("tb", 1024**4), ("gb", 1024**3), ("mb", 1024**2), ("kb", 1024),
        ("t", 1024**4), ("g", 1024**3), ("m", 1024**2), ("k", 1024),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            break
    else:
        mult = 1
    try:
        return int(float(s)) * mult
    except ValueError:
        return 10 * 1024 * 1024


def size_gated_broadcast(
    spark: "SparkSession", n_rows: int, bytes_per_row: int
) -> bool:
    """The SHARED broadcast size gate for steady-state ingest dedup
    (minhash and semantic twins): estimate the batch's broadcast
    frame pessimistically and compare against
    ``spark.sql.autoBroadcastJoinThreshold`` — a bootstrap/backfill
    batch of millions of rows degrades to a plain shuffle join
    (result-identical) instead of OOMing the driver. One home so a
    future gate fix (e.g. '-1' handling) cannot silently miss a twin.
    """
    thr = _parse_spark_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    )
    return thr > 0 and n_rows * bytes_per_row <= thr


def incremental_minhash_dedup(
    new_docs: DataFrame,
    store_path: str,
    *,
    batch_id: int,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    app_id: str = "minhash-store",
    broadcast_batch: bool | None = None,
):
    """Dedup a NEW batch of documents against everything already
    accepted, without ever recomputing the historical corpus — the
    shape a 100 TB ingest pipeline actually runs (the whole-corpus
    operators q24/q49 are the bootstrap, this is the steady state).

    The store (``sources.snapshot`` table) is an append-only log of
    MinHash signatures, one partition per ingest batch, so committing a
    batch's survivors carries every older partition by reference —
    zero store rewrite, and the ``txn=(app_id, batch_id)`` watermark
    makes a replayed batch a no-op (exactly-once ingest).

    Join strategy: the store is the big side and should not shuffle —
    the new batch's exploded band frame (small in the steady state: one
    ingest batch vs the whole corpus) is broadcast against a single
    store scan. The broadcast is SIZE-GATED (``broadcast_batch=None``,
    the default): the batch's signature count (already materialized by
    the checkpoint, so the count is free) times a conservative
    bytes-per-row estimate is compared against
    ``spark.sql.autoBroadcastJoinThreshold`` — a bootstrap or backfill
    batch of millions of documents degrades to a plain shuffle join
    (result-identical) instead of OOMing the driver. Pass ``True`` /
    ``False`` to force either plan. Cross-corpus matches are verified
    by the signature
    Jaccard estimate (fraction of equal minhashes ≥ ``threshold``) —
    the store holds signatures, not text, so the estimate IS the
    verification, with NUM_PERMS=32 giving σ ≈ 0.09 at j=0.5;
    within-batch duplicates (text in hand) get the exact-Jaccard
    verify of :func:`minhash_dedup_pairs`.

    Returns ``(result, committed_version)``: result has one row per
    new document — ``doc_id, is_dup, dup_of, method``
    ('store' | 'batch' | NULL) — and the store gains the batch's
    non-duplicate survivors.
    """
    from ..sources.snapshot import merge_snapshot, read_snapshot

    spark = new_docs.sparkSession
    ids = new_docs.select(F.col(id_col).alias("doc_id"))
    sigs_new = minhash_signatures(
        new_docs, text_col=text_col, id_col=id_col
    ).localCheckpoint()

    if broadcast_batch is None:
        # Largest broadcast frame is the exploded band set (LSH_BANDS
        # rows/doc) or the full signature row (NUM_PERMS longs + id);
        # ~64 B per band row / per column is deliberately pessimistic.
        broadcast_batch = size_gated_broadcast(
            spark,
            sigs_new.count(),  # checkpointed → metadata-cheap
            max(LSH_BANDS * 64, NUM_PERMS * 8 + 64),
        )
    _hint = F.broadcast if broadcast_batch else (lambda df: df)

    # Within-batch near-dups, exact-verified; keep-first by id.
    within = minhash_dedup_pairs(
        new_docs,
        threshold=threshold,
        text_col=text_col,
        id_col=id_col,
        signatures=sigs_new,
    )
    batch_dups = within.groupBy(F.col("doc_b").alias("doc_id")).agg(
        F.min("doc_a").alias("dup_of_batch")
    )

    # Cross-store near-dups: broadcast new bands over one store scan.
    try:
        store = read_snapshot(spark, store_path)
        has_store = True
    except FileNotFoundError:
        has_store = False
    if has_store:
        new_bands = band_rows(sigs_new).select(
            F.col("doc_id").alias("new_id"), "band_id", "band_key"
        )
        cand = (
            band_rows(store)
            .join(_hint(new_bands), ["band_id", "band_key"])
            # A replayed batch meets its own committed signatures —
            # a doc is never a duplicate of itself.
            .filter(F.col("doc_id") != F.col("new_id"))
            .select(F.col("doc_id").alias("old_id"), "new_id")
            .distinct()
        )
        sig_cols = [f"mh{k}" for k in range(NUM_PERMS)]
        old_sigs = store.select(
            F.col("doc_id").alias("old_id"),
            *[F.col(c).alias(f"o_{c}") for c in sig_cols],
        )
        new_sigs = sigs_new.select(
            F.col("doc_id").alias("new_id"),
            *[F.col(c).alias(f"n_{c}") for c in sig_cols],
        )
        matches = (
            sum(
                F.when(F.col(f"o_{c}") == F.col(f"n_{c}"), 1).otherwise(0)
                for c in sig_cols
            )
            / NUM_PERMS
        )
        # Hint the candidate pairs too: when broadcasting, the
        # store-side signature lookup streams the store scan without
        # shuffling it; when the gate demoted the batch, these joins
        # shuffle like any other and stay result-identical.
        est = (
            _hint(cand).join(old_sigs, "old_id")
            .join(_hint(new_sigs), "new_id")
            .select("new_id", "old_id", matches.alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= threshold)
        )
        store_dups = est.groupBy(F.col("new_id").alias("doc_id")).agg(
            F.min("old_id").alias("dup_of_store")
        )
    else:
        idt = ids.schema["doc_id"].dataType.simpleString()
        store_dups = spark.createDataFrame(
            [], f"doc_id {idt}, dup_of_store {idt}"
        )

    result = (
        ids.join(batch_dups, "doc_id", "left")
        .join(store_dups, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_of_store", "dup_of_batch").alias("dup_of"),
            F.when(F.col("dup_of_store").isNotNull(), "store")
            .when(F.col("dup_of_batch").isNotNull(), "batch")
            .alias("method"),
        )
        .withColumn("is_dup", F.col("dup_of").isNotNull())
        .localCheckpoint()
    )

    survivors = sigs_new.join(
        result.filter("is_dup").select("doc_id"), "doc_id", "left_anti"
    ).withColumn("__batch", F.lit(batch_id))
    version = merge_snapshot(
        store_path,
        survivors,
        "doc_id",
        "__batch",
        txn=(app_id, batch_id),
    )
    return result, version


def remove_boilerplate_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_line: int = 10,
    min_docs: int = 2,
    min_line_chars: int = 10,
) -> DataFrame:
    """Corpus-wide boilerplate-line removal — the C4/RefinedWeb "drop
    lines that repeat across documents" pass (navigation chrome, cookie
    banners, license footers) that document-level dedup cannot catch.

    A "line" is a run of ``tokens_per_line`` whitespace tokens (the
    fixture corpus has no newlines; with real text, split on newlines
    first and this operator is unchanged). A line is boilerplate when
    it occurs in >= ``min_docs`` DISTINCT documents and is at least
    ``min_line_chars`` characters. Every document comes back with its
    surviving lines re-joined in original order plus an
    ``n_removed_lines`` count — a document whose lines are all
    boilerplate survives with empty ``clean_text`` (dropping it is the
    caller's policy decision).

    Scale shape: explode → one count shuffle keyed by line text → one
    join back keyed by line text → one per-document re-assembly
    aggregation. The boilerplate side of the join is bounded by the
    number of REPEATED distinct lines, and raw text never leaves the
    line grain: no all-pairs, no driver materialization. Line-keyed
    shuffles can skew on pathological corpora (one line in millions of
    docs) — the count side is a plain aggregate (AQE-splittable), and
    the join key is the same line text, salted automatically by AQE
    skew handling when enabled.
    """
    toks = F.split(F.col(text_col), " ")
    n_lines = F.greatest(
        F.ceil(F.size(toks) / F.lit(tokens_per_line)).cast("int"), F.lit(1)
    )
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(toks, i * tokens_per_line + 1, tokens_per_line), " "
        ),
    )
    exploded = docs.select(id_col, F.posexplode(lines).alias("pos", "line"))
    # The length floor is applied BEFORE the count shuffle: lines too
    # short to ever qualify (a large fraction of real corpora) never
    # enter the groupBy, cutting the detection side's shuffle volume;
    # the post-agg threshold then only sees qualifying lines.
    boiler = (
        exploded.filter(F.length("line") >= min_line_chars)
        .groupBy("line")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("line", F.lit(True).alias("__boiler"))
    )
    marked = exploded.join(boiler, "line", "left").select(
        id_col,
        F.struct(
            "pos", "line", F.coalesce("__boiler", F.lit(False)).alias("b")
        ).alias("s"),
    )
    agg = marked.groupBy(id_col).agg(
        F.array_sort(F.collect_list("s")).alias("ls")
    )
    kept = F.filter("ls", lambda s: ~s.getField("b"))
    return agg.select(
        id_col,
        F.array_join(
            F.transform(kept, lambda s: s.getField("line")), " "
        ).alias("clean_text"),
        (F.size("ls") - F.size(kept)).cast("long").alias("n_removed_lines"),
    )


def scrub_duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Substring-level duplicate-span scrub — the ExactSubstr pass of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), re-grained from suffix-array bytes to sliding token
    windows: any run of ``span_tokens`` whitespace tokens that occurs
    >= ``min_count`` times ANYWHERE in the corpus (across documents or
    repeated inside one) is cut from every document. This is the layer
    between line-grain boilerplate removal (:func:`remove_boilerplate_lines`,
    disjoint 10-token blocks) and document-grain dedup: sliding windows
    catch duplicated passages at ANY alignment, and overlapping hits
    merge into one excised region via token-level coverage.

    Every occurrence is scrubbed (the paper's deduplicate-all variant) —
    keeping one canonical copy would need a global occurrence ranking,
    a policy the caller can layer on. One pass is one fixpoint step:
    excision creates new token adjacencies, so freshly-adjacent text
    can in principle form new duplicate spans; iterate to convergence
    if that matters (real pipelines run one pass).

    Returns ``(id_col, clean_text, n_removed_tokens)`` for EVERY input
    document — shorter-than-``span_tokens`` docs pass through verbatim,
    fully-covered docs come back with empty ``clean_text`` (dropping is
    the caller's policy).

    Scale shape (all Catalyst, no UDFs): one sliding-window explode to
    the span grain (N_tokens rows, each carrying an md5 of its span —
    raw span text never shuffles), one count shuffle on the 16-byte
    digest, one join back — and then re-assembly WITHOUT a token-grain
    shuffle: the duplicate span START POSITIONS are collected per
    document (bounded by that document's duplicate occurrences, zero
    for the typical clean document) and applied as an array ``filter``
    + ``exists`` over the token array, so the only per-document data
    movement is one join of the raw text against the hit lists. The
    in-row cost is kept_check = O(tokens x dup_occurrences) worst case
    (a fully self-repeating document); real corpora have a handful of
    hits per dirty doc and none elsewhere. Digest collisions (md5)
    would merge distinct spans — at 2^64 spans that is a birthday
    bound real pipelines accept; use the span text itself as the key
    if bytes-on-the-wire matters less than exactness.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # Span digests are built as ONE per-document hash array behind a
    # projection boundary, then posexplode'd to the (pos, h) grain.
    # The previous shape (explode positions, md5 in a later projection)
    # let the optimizer re-inline ``split(text)`` into the md5 slice —
    # re-splitting the WHOLE text once per position, O(tokens²) regexp
    # work per document — and carried the full token array through the
    # Generate output. Here split runs once per document, the Generate
    # emits only (pos, h), and posexplode's 0-based index IS the span
    # start position, so values are bit-identical (same md5 over the
    # same array_join/slice bytes).
    staged = docs.select(id_col, toks.alias("__t"))
    # Guard the window sequence: Spark's sequence(0, stop) COUNTS DOWN
    # when stop < 0 (auto step -1), so short docs must get an explicit
    # empty position array, not sequence(0, n - W).
    tn = F.size(F.col("__t"))
    positions = F.when(
        tn >= span_tokens,
        F.sequence(F.lit(0), tn - span_tokens),
    ).otherwise(F.array().cast("array<int>"))
    hashed = staged.select(
        id_col,
        F.transform(
            positions,
            lambda p: F.md5(
                F.array_join(
                    F.slice(F.col("__t"), p + 1, span_tokens), " "
                )
            ),
        ).alias("__hs"),
    )
    # Materialize the span frame once (lazy localCheckpoint): both the
    # duplicate-digest aggregate and the per-doc hit harvest below
    # consume it, and without the checkpoint each branch re-runs the
    # full tokenize+md5 explode (two extra corpus hash passes).
    spans = hashed.select(
        id_col, F.posexplode("__hs").alias("pos", "h")
    ).localCheckpoint(eager=False)
    dup = (
        spans.groupBy("h")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("h")
    )
    # Duplicate-hit start positions per document — bounded by the
    # doc's duplicate occurrences (empty for clean docs), NEVER the
    # token grain. Overlapping hits need no interval merge: the
    # exists() check below is coverage-idempotent.
    hits = (
        spans.join(dup, "h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("pos")).alias("__ps"))
    )
    ps = F.coalesce(F.col("__ps"), F.array().cast("array<int>"))
    covered = lambda i: F.exists(  # noqa: E731 — bound below per-token
        ps, lambda p: (i >= p) & (i <= p + span_tokens - 1)
    )
    kept = F.filter(toks, lambda t, i: ~covered(i))
    return docs.join(hits, id_col, "left").select(
        id_col,
        F.array_join(kept, " ").alias("clean_text"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed_tokens"),
    )
