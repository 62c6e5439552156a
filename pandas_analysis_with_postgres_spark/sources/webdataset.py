"""WebDataset-style tar shards: pack samples into POSIX tar blobs and
read them back — the de-facto container format for multimodal training
loaders (a tar of ``<key>.<ext>`` member files per sample, consumed
sequentially by trainer ranks).

Both directions are REAL (stdlib ``tarfile``), run under grouped /
Arrow-batched Python, and are deterministic: members are added in key
order with pinned metadata (mtime 0, uid/gid 0, mode 0644), so the
same rows always produce byte-identical shards — which is what makes
the round-trip oracle-checkable (the UNPACKED members equal the base
table; the tar bytes themselves are container framing, deliberately
outside the hashed surface, same policy as the gzip blobs).

Scale shape: packing is ``applyInPandas`` over the shard id — one
shuffle keyed by shard, each task materializes only its own shard's
samples (bounded by ``samples_per_shard``); unpacking is a narrow
``mapInPandas`` fused onto the scan. Tar bytes never shuffle except
as single already-packed blobs.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: Output schema of pack_webdataset — one row per shard.
SHARD_SCHEMA = "shard long, n_samples long, tar_bytes long, payload binary"
#: Output schema of unpack_webdataset — one row per member file.
MEMBER_SCHEMA = "shard long, member string, size long, body string"


def pack_webdataset(
    docs: DataFrame,
    *,
    samples_per_shard: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack each document as a ``<doc_id>.txt`` member of a tar shard
    (``shard = id DIV samples_per_shard``). Returns one row per shard
    with the tar payload. Deterministic framing (sorted members,
    zeroed metadata) — rebuilding a shard from the same rows is
    byte-identical, so shard-level checksums are stable across runs."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        # exact integer FLOOR division for any bigint: subtract the
        # pmod remainder (making the dividend an exact multiple, where
        # truncating DIV equals floor) — double division would round
        # past 2^53 and truncate negatives toward zero
        F.expr(
            f"(CAST({id_col} AS BIGINT) - pmod(CAST({id_col} AS BIGINT), "
            f"{samples_per_shard})) DIV {samples_per_shard}"
        ).alias("shard"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = text.encode("utf-8")
                info = tarfile.TarInfo(name=f"{doc_id}.txt")
                info.size = len(body)
                info.mtime = 0
                info.uid = info.gid = 0
                info.mode = 0o644
                tar.addfile(info, io.BytesIO(body))
        payload = buf.getvalue()
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_samples": [len(pdf)],
                "tar_bytes": [len(payload)],
                "payload": [payload],
            }
        )

    return staged.groupBy("shard").applyInPandas(build, schema=SHARD_SCHEMA)


def unpack_webdataset(shards: DataFrame) -> DataFrame:
    """Explode tar shards back into member rows (REAL tarfile walk;
    corrupt archives raise). One row per member: (shard, member, size,
    body)."""

    def ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"shard": [], "member": [], "size": [], "body": []}
            for shard, payload in zip(pdf["shard"], pdf["payload"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(payload))) as tar:
                    for info in tar.getmembers():
                        if not info.isreg():
                            raise ValueError(
                                f"non-regular tar member {info.name!r} "
                                "(WebDataset shards hold plain files only)"
                            )
                        body = tar.extractfile(info).read()
                        out["shard"].append(int(shard))
                        out["member"].append(info.name)
                        out["size"].append(info.size)
                        out["body"].append(body.decode("utf-8"))
            yield pd.DataFrame(out)

    return shards.mapInPandas(ex, schema=MEMBER_SCHEMA)
