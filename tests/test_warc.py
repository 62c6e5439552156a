"""WARC parser: record walking, header parsing, malformed rejection."""

from __future__ import annotations

import pytest

from pandas_analysis_with_postgres_spark.sources.warc import (
    attach_warc_payload,
    extract_warc,
    parse_warc,
)


def _payload(spark, text, lang="en"):
    docs = spark.createDataFrame(
        [(7, text, lang)], "doc_id long, text string, lang string"
    )
    return bytes(attach_warc_payload(docs).collect()[0].payload)


def test_roundtrip_two_records(spark):
    buf = _payload(spark, "hello warc world", lang="de")
    recs = parse_warc(buf)
    assert len(recs) == 2
    r0, r1 = recs
    assert r0["warc_type"] == "response"
    assert r0["target_uri"] == "http://example.com/doc/7"
    assert r0["record_id"] == "<urn:uuid:7>"
    assert r0["body"] == b"hello warc world"
    assert r0["content_length"] == 16
    assert r1["warc_type"] == "metadata"
    assert r1["body"] == b"lang=de"


def test_content_length_binds_body_even_with_crlf_inside(spark):
    # a body containing the header terminator must NOT confuse the
    # walker: Content-Length, not delimiter search, bounds the body
    docs_text = "a\r\n\r\nb"
    import pandas as pd

    from pyspark.sql import functions as F

    # build by hand (Catalyst builder filters nothing here, but the
    # text contains CRLFs so octet/char lengths still match)
    docs = spark.createDataFrame(
        [(1, docs_text, "en")], "doc_id long, text string, lang string"
    )
    buf = bytes(attach_warc_payload(docs).collect()[0].payload)
    recs = parse_warc(buf)
    assert recs[0]["body"] == docs_text.encode()
    assert recs[1]["warc_type"] == "metadata"


def test_malformed_inputs_raise():
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"HTTP/1.0\r\nContent-Length: 0\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort")
    with pytest.raises(ValueError, match="unterminated"):
        parse_warc(b"WARC/1.0\r\nContent-Length: 3")


def test_extract_explodes_per_record(spark):
    docs = spark.createDataFrame(
        [(1, "aaa", "en"), (2, "bbbb", "fr")],
        "doc_id long, text string, lang string",
    )
    rows = extract_warc(attach_warc_payload(docs)).collect()
    assert len(rows) == 4
    by = {(r.doc_id, r.record_idx): r for r in rows}
    assert by[(1, 0)].body == "aaa" and by[(1, 0)].content_length == 3
    assert by[(2, 1)].body == "lang=fr"


def test_negative_content_length_raises():
    with pytest.raises(ValueError, match="negative Content-Length"):
        parse_warc(b"WARC/1.0\r\nContent-Length: -4\r\n\r\n")


def test_null_lang_rows_are_filtered_consistently(spark):
    docs = spark.createDataFrame(
        [(1, "ok text", "en"), (2, "no lang", None)],
        "doc_id long, text string, lang string",
    )
    rows = extract_warc(attach_warc_payload(docs)).collect()
    # doc 2 filtered entirely (its payload would be NULL); doc 1 intact
    assert {r.doc_id for r in rows} == {1}
    assert len(rows) == 2
