"""WARC (Web ARChive, ISO 28500) record parsing — the container format
web-crawl training corpora arrive in (Common-Crawl-style pipelines).

No WARC fixtures ship in this container, so — exactly like the
PPM/WAV media path (``operators/multimodal.py``) — valid WARC payloads
are BUILT deterministically from the documents fixture in pure
Catalyst (string concat), and the parser is a REAL one: it walks
records by header block + ``Content-Length`` byte count per the spec
(headers terminated by CRLFCRLF, records separated by CRLFCRLF,
version line ``WARC/1.0``), raising on malformed input. Because the
payload bytes derive from the base table, every parsed field is
hash-verifiable by the SQL oracle.

Scale shape: parsing runs under Arrow-batched ``mapInPandas`` fused
onto the scan — archive bytes never shuffle, only the (narrow)
extracted fields flow on. Real deployments read one row per WARC file
(``spark.read.format("binaryFile")``) or pre-split records upstream;
the parser here is the per-blob kernel either composition needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"


def attach_warc_payload(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model a crawl table whose blobs are two-record WARC files: a
    ``response`` record carrying the document text and a ``metadata``
    record carrying ``lang=<lang>``. Built entirely in Catalyst, so
    the oracle replays every parsed field. Non-ASCII docs are filtered
    (byte count must equal char count for the SQL oracle's arithmetic
    to describe Content-Length)."""
    docs = docs.filter(
        (F.length(text_col) >= 1)
        & (F.octet_length(F.col(text_col)) == F.length(text_col))
        # a NULL lang would NULL the whole concatenated payload —
        # filter it like the other unrepresentable rows (the oracle
        # applies the same predicate)
        & F.col("lang").isNotNull()
        # lang feeds the metadata record's Content-Length arithmetic
        # (5 + length in CHARS on the oracle side vs octet_length of
        # the body here), so it needs the same ASCII byte==char guard
        # as the text — enforced where the other unrepresentable rows
        # are filtered, so a non-ASCII lang in a future fixture reads
        # as the fixture gap it is, not a parser bug
        & (F.octet_length(F.col("lang")) == F.length(F.col("lang")))
    )

    def record(wtype: F.Column, uri_suffix, body: F.Column) -> F.Column:
        return F.concat(
            F.lit("WARC/1.0" + CRLF),
            F.lit("WARC-Type: "), wtype, F.lit(CRLF),
            F.lit("WARC-Record-ID: <urn:uuid:"),
            F.col(id_col).cast("string"),
            F.lit(">" + CRLF),
            F.lit("WARC-Target-URI: http://example.com/doc/"),
            F.col(id_col).cast("string"),
            F.lit(CRLF),
            F.lit("Content-Length: "),
            F.octet_length(body).cast("string"),
            F.lit(CRLF + CRLF),
            body,
            F.lit(CRLF + CRLF),
        )

    payload = F.concat(
        record(F.lit("response"), None, F.col(text_col)),
        record(
            F.lit("metadata"),
            None,
            F.concat(F.lit("lang="), F.col("lang")),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("application/warc").alias("media_type"),
        F.encode(payload, "UTF-8").alias("payload"),
    )


def parse_warc(payload: bytes) -> list[dict]:
    """Real WARC walker: returns one dict per record with
    ``warc_type``, ``record_id``, ``target_uri``, ``content_length``,
    and the ``body`` bytes (exactly Content-Length of them). Raises
    ``ValueError`` on a bad version line, a missing/short body, a
    malformed header, or a missing Content-Length."""
    buf = bytes(payload or b"")
    records = []
    pos = 0
    sep = (CRLF + CRLF).encode()
    while pos < len(buf):
        head_end = buf.find(sep, pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        head = buf[pos:head_end].decode("utf-8", errors="strict")
        lines = head.split(CRLF)
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line {lines[:1]!r}")
        fields = {}
        for line in lines[1:]:
            if ":" not in line:
                raise ValueError(f"malformed WARC header line {line!r}")
            k, v = line.split(":", 1)
            fields[k.strip().lower()] = v.strip()
        if "content-length" not in fields:
            raise ValueError("WARC record missing Content-Length")
        clen = int(fields["content-length"])
        if clen < 0:
            raise ValueError(f"negative Content-Length {clen}")
        body_start = head_end + len(sep)
        body = buf[body_start : body_start + clen]
        if len(body) < clen:
            raise ValueError("truncated WARC record body")
        records.append(
            {
                "warc_type": fields.get("warc-type", ""),
                "record_id": fields.get("warc-record-id", ""),
                "target_uri": fields.get("warc-target-uri", ""),
                "content_length": clen,
                "body": body,
            }
        )
        pos = body_start + clen
        # consume the record separator (two CRLFs per spec)
        if buf[pos : pos + len(sep)] == sep:
            pos += len(sep)
        elif pos < len(buf):
            raise ValueError("missing WARC record separator")
    return records


#: Output schema of extract_warc — one row per RECORD.
WARC_RECORD_SCHEMA = (
    "doc_id long, record_idx int, warc_type string, target_uri string, "
    "content_length long, body string"
)


def extract_warc(archives: DataFrame) -> DataFrame:
    """Explode every WARC payload into typed record rows via the real
    parser under Arrow-batched ``mapInPandas`` (bytes never shuffle);
    a malformed archive raises — crawl containers that fail to parse
    should fail loudly, not feed truncated documents to training."""

    def ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "record_idx", "warc_type", "target_uri",
                "content_length", "body",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, rec in enumerate(parse_warc(payload)):
                    out["doc_id"].append(doc_id)
                    out["record_idx"].append(i)
                    out["warc_type"].append(rec["warc_type"])
                    out["target_uri"].append(rec["target_uri"])
                    out["content_length"].append(rec["content_length"])
                    out["body"].append(rec["body"].decode("utf-8"))
            yield pd.DataFrame(out)

    return archives.mapInPandas(ex, schema=WARC_RECORD_SCHEMA)
