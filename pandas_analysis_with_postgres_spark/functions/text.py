"""Text-analysis expressions for the LLM-data-pipeline extensions.

All built-in Catalyst expressions (split/transform/filter/aggregate) —
no Python UDFs, so text scoring runs JVM-side at full codegen speed over
100 TB of documents. The reference has no text functions at all
(SURVEY §2.10); this whole module is the north-star extension surface.

Determinism: every function here is a pure expression, reproducible in
ANSI SQL for the DuckDB oracle (see plans.extension_queries).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small English stopword list used by quality scoring. Fixed and tiny
#: on purpose — it is part of the deterministic contract with the oracle.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

#: Fingerprint modulus (2^31 - 1, Mersenne prime) and multiplier. The
#: fold stays < 2^52 so the arithmetic is exact in both Spark LONG and
#: DuckDB BIGINT — no overflow-semantics divergence.
FP_MOD = 2_147_483_647
FP_MULT = 1_000_003


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the cheap length signal every data
    pipeline wants before a real tokenizer pass)."""
    return F.size(tokens(text))


def bpe_ish_piece_count(text: Column | str) -> Column:
    """BPE-ish subword proxy: count of 4-char pieces, ceil(len/4) summed
    per token — a deterministic stand-in for a real BPE vocab (which is
    a model artifact, not an engine feature). Useful as a token-budget
    estimator at ingest time."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )


def stopword_count(text: Column | str) -> Column:
    """Number of tokens that are stopwords."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*STOPWORDS)))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from an already-computed token array.
    Prefer passing a bound column (tokens in their own projection) over
    an inline ``tokens(...)`` expression: the n ``element_at``
    references then read one materialized array instead of inlining the
    split pipeline n times into the generated code."""
    # NB: F.sequence(1, 0) yields a DESCENDING [1, 0], not empty — docs
    # shorter than n tokens must be guarded to an empty array.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    parts = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(parts)


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles → array<string> (the MinHash/Jaccard
    input unit). Built with transform over an index sequence — stays
    JVM-side."""
    return shingles_from_tokens(tokens(text), n)


def ngrams_from_tokens(toks: Column, n: int = 2) -> Column:
    """ALL n-word grams in order (duplicates kept) from an
    already-computed token array → array<string>.

    Unlike :func:`shingles` this does NOT dedup: repetition analysis
    needs the multiset (dup-n-gram fraction = 1 − distinct/total).
    Prefer a bound token column over an inline ``tokens(...)``
    expression — the n ``element_at`` references otherwise inline the
    split pipeline n times into the generated code."""
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )


def ngrams(text: Column | str, n: int = 2) -> Column:
    """ALL n-word grams in order (duplicates kept) → array<string>."""
    return ngrams_from_tokens(tokens(text), n)


def fingerprint(text: Column | str) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash of
    (ascii(first char) * 256 + length) per token, folded left with
    ``acc * FP_MULT + v (mod FP_MOD)``.

    A rolling hash rather than a set hash: reordered tokens change the
    fingerprint. Exactly reproducible in DuckDB via
    ``list_reduce(list_prepend(0, ...))`` — pinned in the oracle.
    """
    vals = F.transform(tokens(text), lambda t: F.ascii(t) * 256 + F.length(t))
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * F.lit(FP_MULT) + v.cast("long")) % F.lit(FP_MOD),
    )


def quality_score(text: Column | str, n_chars: Column | str) -> Column:
    """Composite quality heuristic in [0, ~1]: rewards mid-length docs,
    penalizes stopword-heavy and very-short-token text. All double math
    with a fixed operation order (oracle-reproducible)."""
    nc = F.col(n_chars) if isinstance(n_chars, str) else n_chars
    nt = token_count(text).cast("double")
    sw = stopword_count(text).cast("double")
    avg_tok = (nc.cast("double") - (nt - F.lit(1.0))) / nt
    length_term = F.least(nt / F.lit(100.0), F.lit(1.0))
    stop_term = F.lit(1.0) - (sw / nt)
    len_tok_term = F.least(avg_tok / F.lit(5.0), F.lit(1.0))
    return (length_term + stop_term + len_tok_term) / F.lit(3.0)


#: PII patterns shared with the DuckDB oracle. Restricted to syntax
#: valid in BOTH Java regex (Spark) and RE2 (DuckDB) — char classes,
#: bounded repeats, \b — no lookaround, no backrefs (RE2 has neither).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_counts(text: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) occurrence counts — Catalyst
    ``regexp_extract_all``, JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0)),
    )


def redact_pii(text: Column | str) -> Column:
    """Replace every email then phone match with a typed placeholder.
    Spark's ``regexp_replace`` is global by default; the DuckDB oracle
    must pass the ``'g'`` option to match (RE2 replaces only the first
    occurrence otherwise)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
