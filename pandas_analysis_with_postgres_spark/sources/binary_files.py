"""Raw-blob directory ingestion (`binaryFile` source) — the front door
for image/audio/video corpora that arrive as FILES, not tables.

`spark.read.format("binaryFile")` yields (path, modificationTime,
length, content) with the bytes verbatim; downstream the multimodal
layer (operators/multimodal.py) decodes/features them exactly as it
does blobs already in tables. Contract notes for 100 TB estates:

- The source parallelizes across files (one row per file) — millions
  of small blobs scan fine, but prefer consolidating into WebDataset
  tar shards (sources/webdataset.py) or parquet-with-binary-columns at
  the landing boundary: file-per-record listings cost the object
  store's metadata tier, not Spark.
- `pathGlobFilter` prunes by extension at LISTING time (never read);
  `modificationTime` is machine state, not data — exclude it from any
  deterministic surface (z31 hashes name/size/sha256 only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession, path: str, *, glob: str | None = None
) -> DataFrame:
    """Scan a blob directory; ``glob`` (e.g. ``*.bin``) filters at the
    file listing, before any byte is read."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def blob_manifest(df: DataFrame) -> DataFrame:
    """The deterministic identity of a blob scan: (name, n_bytes,
    sha256) — basename not full path (the mount point is machine
    state), no modificationTime. This is the dedup/decontamination
    join key surface for file-addressed corpora."""
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha256"),
    )
