"""Inverted token index: persisted posting snapshot bucketed by
crc32(token); searches open only the queried terms' buckets; results
equal a direct corpus scan; incremental append for new documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators.text_index import (
    append_to_index,
    build_token_index,
    search_token_index,
    token_bucket,
)

DOCS = [
    (1, "the quick brown fox"),
    (2, "the quick quick dog"),
    (3, "brown dog  runs"),  # double space → empty token, must drop
    (4, "fox and dog and fox"),
    (5, "nothing relevant here"),
]


@pytest.fixture()
def idx(spark, tmp_path):
    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_token_index(docs, path, n_buckets=8)
    return path


def _truth(terms, mode):
    out = {}
    for doc_id, text in DOCS:
        toks = [t for t in text.split(" ") if t]
        n = sum(1 for t in set(terms) if t in toks)
        tf = sum(toks.count(t) for t in set(terms))
        if (mode == "all" and n == len(set(terms))) or (
            mode == "any" and n > 0
        ):
            out[doc_id] = (n, tf)
    return out


def test_search_equals_direct_scan(spark, idx):
    for terms, mode in [
        (["quick", "dog"], "all"),
        (["quick", "dog"], "any"),
        (["fox"], "all"),
        (["fox", "fox"], "all"),  # duplicate terms treated as a set
        (["absent"], "any"),
    ]:
        got = {
            r.doc_id: (r.n_terms, r.tf_total)
            for r in search_token_index(
                spark, idx, terms, n_buckets=8, mode=mode
            ).collect()
        }
        assert got == _truth(terms, mode), (terms, mode)


def test_search_reads_only_queried_buckets(spark, idx):
    terms = ["quick", "dog"]
    res = search_token_index(spark, idx, terms, n_buckets=8)
    want = {f"bucket={token_bucket(t, 8)}" for t in terms}
    touched = {
        "bucket=" + f.split("bucket=")[1].split("/")[0]
        for f in res.inputFiles()
    }
    assert touched == want  # the other buckets' directories never open


def test_empty_tokens_never_indexed(spark, idx):
    postings = (
        __import__(
            "pandas_analysis_with_postgres_spark.sources.snapshot",
            fromlist=["read_snapshot"],
        ).read_snapshot(spark, idx)
    )
    assert postings.where(F.col("token") == "").count() == 0


def test_bucket_parity_spark_vs_python(spark):
    # the whole search design hangs on Spark's crc32 == zlib.crc32
    # over UTF-8 bytes — check a diverse token set (ASCII, unicode,
    # digits, punctuation, long strings) in ONE Spark job
    toks = (
        ["hash", "filter", "a", "Z9", "naïve", "ünïcode", "日本語", "🚀"]
        + ["tok%d!" % i for i in range(20)]
        + ["x" * 200, " leading", "trailing ", "mid dle"]
    )
    rows = (
        spark.createDataFrame([(t,) for t in toks], "t string")
        .select("t", F.crc32("t").alias("c"))
        .collect()
    )
    for r in rows:
        assert r.c % 64 == token_bucket(r.t, 64), r.t


def test_append_new_documents(spark, idx):
    new = spark.createDataFrame(
        [(6, "quick red fox")], "doc_id long, text string"
    )
    append_to_index(new, idx, n_buckets=8)
    got = {
        r.doc_id
        for r in search_token_index(
            spark, idx, ["quick"], n_buckets=8
        ).collect()
    }
    assert got == {1, 2, 6}
    # txn idempotence: a replayed ingest batch is a no-op
    v = append_to_index(
        spark.createDataFrame([(7, "dog dog")], "doc_id long, text string"),
        idx, n_buckets=8, txn=("ingest", 1),
    )
    assert append_to_index(
        spark.createDataFrame([(7, "dog dog")], "doc_id long, text string"),
        idx, n_buckets=8, txn=("ingest", 1),
    ) == v
    tf = {
        r.doc_id: r.tf_total
        for r in search_token_index(
            spark, idx, ["dog"], n_buckets=8
        ).collect()
    }
    assert tf[7] == 2


def test_guards(spark, idx):
    with pytest.raises(ValueError, match="at least one term"):
        search_token_index(spark, idx, [])
    with pytest.raises(ValueError, match="unknown mode"):
        search_token_index(spark, idx, ["x"], mode="xor")
