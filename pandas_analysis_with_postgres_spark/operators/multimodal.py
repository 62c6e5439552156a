"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

Container note: no image/audio codecs ship in this environment, so the
*decode* step is stubbed (deterministic fake features, clearly marked),
while everything Spark-side is real and tested: the binary schema, the
Arrow-batched ``mapInPandas`` plumbing, batch shapes, and partitioning.
Swapping ``_decode_stub`` for PIL/librosa is a one-function change that
does not alter the plan.

Scale design: media bytes never shuffle — ``mapInPandas`` runs the
feature extractor on the scan partitions; only the (narrow) extracted
feature columns flow on. For 100 TB of media, partition input files to
``maxPartitionBytes`` so each Arrow batch holds a bounded number of
blobs, and keep ``spark.sql.execution.arrow.maxRecordsPerBatch`` low
enough that a batch of blobs fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of featurize_media — declared once, used by tests.
MEDIA_FEATURE_SCHEMA = (
    "doc_id long, media_type string, payload_bytes long, "
    "n_frames long, feature_mean double, feature_dim int"
)


def attach_binary_payload(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model a media table: (id, media_type, payload binary).

    The fixture corpus has no real media, so the UTF-8 bytes of the
    text column stand in as the opaque blob — the engine treats it as
    any other ``BinaryType`` column.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("fake/blob").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _decode_stub(payload: bytes) -> tuple[int, float]:
    """STUB decode: deterministic fake 'frames' and feature statistic
    derived from the bytes. Replace with a real codec (PIL/ffmpeg/
    librosa) outside this container. Raises on None to mirror real
    decoder behavior on corrupt input.
    """
    if payload is None:
        raise NotImplementedError("no payload; real decoder would reject this row")
    n_frames = max(1, len(payload) // 256)  # fake frame sampling
    feature_mean = (sum(payload[:64]) % 997) / 997.0  # fake feature stat
    return n_frames, feature_mean


def featurize_media(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so each Python worker sees bounded pandas batches;
    the output drops the payload (bytes stay on the scan side, features
    flow on). This is the real plumbing a production decode would use —
    only ``_decode_stub`` is fake here.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload"].map(len),
                    "n_frames": decoded.map(lambda t: t[0]),
                    "feature_mean": decoded.map(lambda t: t[1]),
                    "feature_dim": 1,
                }
            )

    return media.mapInPandas(extract, schema=MEDIA_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, *, max_frames: int = 4) -> DataFrame:
    """Uniform-stride frame sampling: at most ``max_frames`` rows per
    media blob, frame indices spread evenly across its (fake-decoded)
    frame count — the row-shape a video training pipeline feeds to a
    per-frame featurizer.

    Entirely Catalyst (``sequence`` + ``explode`` over the
    metadata-derived frame count): the *selection* of frames never
    needs the codec, so it is exact, pushdown-friendly, and
    oracle-able; only the per-frame pixel decode (which would consume
    ``frame_idx`` inside ``mapInPandas``, exactly like
    ``featurize_media``) needs Python. Sampling k of n frames uses
    ``idx = floor(j*n/m), j < m = least(n, k)`` — strictly increasing,
    so indices are distinct, and degenerates to 0..n-1 when n <= k.
    """
    n = F.greatest(F.floor(F.octet_length("payload") / 256), F.lit(1)).cast("long")
    m = F.least(n, F.lit(max_frames))
    idx = F.transform(
        F.sequence(F.lit(0), (m - 1).cast("int")),
        lambda j: F.floor(j.cast("long") * n / m),
    )
    return media.select(
        "doc_id",
        "media_type",
        n.alias("n_frames"),
        F.explode(idx).alias("frame_idx"),
    )


def media_checksums(media: DataFrame) -> DataFrame:
    """The deterministic, oracle-able half of `featurize_media`: byte
    length, SHA-256 payload checksum, and metadata-derived frame count
    — all Catalyst, no Python. Splitting this out shrinks the
    engine's unverifiable surface to `_decode_stub` itself: everything
    the featurize path computes *about* the blob (rather than from its
    decoded pixels) is hash-verified against SQL.
    """
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256_hex"),
        F.greatest(F.floor(F.octet_length("payload") / 256), F.lit(1))
        .cast("long")
        .alias("n_frames"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-SQL metadata over binary payloads (no Python): byte length
    and fake frame count. The oracle-able subset of the media path."""
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.greatest(F.floor(F.octet_length("payload") / 256), F.lit(1))
        .cast("long")
        .alias("n_frames"),
    )
