"""Persisted inverted token index over a document corpus.

The index IS a snapshot table (sources.snapshot) of postings
``(token, doc_id, tf)`` partitioned by ``bucket = crc32(token) %
n_buckets`` — the classic search-engine term-partitioned posting file,
expressed in the lakehouse layer this repo already has instead of a
bespoke format. What that buys at 100 TB:

- **Build** is one explode + one aggregate: tokens explode to
  (doc, token) pairs, a map-side-combinable count collapses them to
  per-document term frequencies, and the snapshot writer lands each
  token's postings in its bucket directory. No shuffle beyond the one
  groupBy the aggregate needs.
- **Search reads only the queried terms' buckets**: the bucket of a
  term is computable DRIVER-SIDE (zlib.crc32 == Spark's ``crc32``, an
  engine-exact pair), so a k-term query opens at most k of the
  n_buckets partition directories via the manifest — the raw corpus
  is never touched, and neither are the other buckets' postings. The
  same probed-subset discipline as the IVF index (operators.
  similarity), pinned by an inputFiles test.
- **Maintenance is the snapshot layer's**: appends of newly ingested
  documents' postings ride :func:`append_snapshot` (pure adds when
  tf rows for new doc_ids), time travel / tags / expiry all apply.

Tokenization is the repo's pinned whitespace convention
(functions.text.tokens == DuckDB ``string_split(text, ' ')``), so
every oracle replays it exactly.

Reference behavior: gizemsutcu/Pandas-Analysis-With-Postgres keeps no
search index; this extends its text-analysis surface to the lookup
shape a corpus at scale needs (SURVEY.md §2 training-data extensions).
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.snapshot import read_snapshot, write_snapshot

#: Default term-bucket fanout. 64 buckets ≈ 64 manifest partitions; a
#: k-term search opens ≤ k of them. Size it like any partition count:
#: total postings / n_buckets should be a sane directory (tens of MB
#: to low GB); a web-scale corpus wants thousands.
DEFAULT_BUCKETS = 64


def token_bucket(token: str, n_buckets: int = DEFAULT_BUCKETS) -> int:
    """Driver-side bucket of a term — MUST equal the Spark-side
    expression in :func:`build_token_index` (zlib.crc32 and Spark's
    ``crc32`` both implement the same CRC-32/ISO-HDLC)."""
    return zlib.crc32(token.encode("utf-8")) % n_buckets


def build_token_index(
    docs: DataFrame,
    path: str,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Build (overwrite) the inverted index snapshot table at ``path``.

    Postings are ``(token, doc_id, tf)`` — tf the term's count in the
    document, empty tokens dropped (consecutive whitespace artifacts
    carry no lookup value). Returns the committed snapshot version."""
    postings = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(TX.tokens(F.col(text_col))).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "bucket", (F.crc32(F.col("token")) % F.lit(n_buckets)).cast("int")
        )
    )
    return write_snapshot(postings, path, "bucket")


def append_to_index(
    docs: DataFrame,
    path: str,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    txn: "tuple[str, int] | None" = None,
) -> int:
    """Index NEWLY INGESTED documents incrementally: their postings
    APPEND into the existing bucket partitions (append_snapshot —
    existing ∪ new per touched bucket, nothing keyed or removed).
    Correct only for doc_ids not already indexed (re-indexing a
    changed document needs a rebuild — postings are per-doc facts, not
    upsertable rows without a key the bucket layout doesn't have).
    ``txn`` gives streaming ingest exactly-once replay, same contract
    as every snapshot writer. Returns the committed version."""
    from ..sources.snapshot import append_snapshot

    postings = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(TX.tokens(F.col(text_col))).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "bucket", (F.crc32(F.col("token")) % F.lit(n_buckets)).cast("int")
        )
    )
    return append_snapshot(path, postings, "bucket", txn=txn)


def search_token_index(
    spark: SparkSession,
    path: str,
    terms: list[str],
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "all",
) -> DataFrame:
    """Documents matching ``terms``, served from the index alone.

    Opens ONLY the terms' bucket partitions (manifest-pruned via
    ``partition_filter``; distinct terms may share a bucket — one
    directory read either way). ``mode="all"`` (AND) keeps documents
    containing every term; ``mode="any"`` (OR) keeps any match.
    Returns ``(doc_id, n_terms, tf_total)`` — matched-term count and
    summed term frequency (the score a BM25 pass would start from)."""
    if not terms:
        raise ValueError("search_token_index needs at least one term")
    if mode not in ("all", "any"):
        raise ValueError(f"unknown mode {mode!r} (use 'all' or 'any')")
    want = {f"bucket={token_bucket(t, n_buckets)}" for t in terms}
    postings = read_snapshot(
        spark, path, partition_filter=lambda p: p in want
    ).where(F.col("token").isin(list(set(terms))))
    hits = postings.groupBy("doc_id").agg(
        F.count_distinct("token").alias("n_terms"),
        F.sum("tf").alias("tf_total"),
    )
    if mode == "all":
        hits = hits.where(F.col("n_terms") == len(set(terms)))
    return hits
