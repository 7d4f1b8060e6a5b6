"""Raw-file ingest: the ``binaryFile`` source.

``spark.read.format("binaryFile")`` turns a directory tree of opaque files
(images, audio, video, model shards, scraped HTML dumps — anything) into a
DataFrame of ``(path, modificationTime, length, content: binary)`` — the
ingest half of the multimodal pipeline (operators/multimodal.py consumes
exactly this shape after the bytes are persisted to parquet with typed
metadata).

Why it matters at 100 TB: asset corpora arrive as billions of FILES, not
as rows in a table. The binaryFile source scans them distributed (one task
per file-split group, driver holds only the file listing), supports
partition-discovery over ``.../date=.../`` layouts, glob and mtime
pushdown (``pathGlobFilter``, ``modifiedAfter``) so an incremental ingest
touches only new files, and — because ``content`` is a single binary
column — lands bytes straight into parquet where downstream feature
extraction (mapInPandas, Arrow batches) reads them column-pruned.

Guardrail: each file becomes ONE row, so a 2 GB video blows the task; cap
with ``spark.sql.sources.binaryFile.maxLength`` (default Int.Max) and shard
oversized assets upstream. This module keeps the reader thin — options
validated, nothing imperative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# file extension -> (modality, media_type); the common training-corpus set
_EXT_MODALITY = {
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"),
    "webp": ("image", "image/webp"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"),
    "mp4": ("video", "video/mp4"),
    "webm": ("video", "video/webm"),
    "mkv": ("video", "video/x-matroska"),
}


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
    modified_after: str | None = None,
    modified_before: str | None = None,
) -> DataFrame:
    """Scan a directory of raw files as ``(path, modificationTime, length,
    content)``. ``glob`` filters by file name (e.g. ``"*.jpg"``),
    ``recursive`` walks nested non-partition directories,
    ``modified_after``/``modified_before`` (``YYYY-MM-DDTHH:mm:ss`` local)
    push an mtime predicate into the file LISTING — the incremental-ingest
    filter: already-ingested files are never opened, matching the
    reference's land-then-bookmark loop (etl/etl.py:25-33) at the file
    level."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if modified_after is not None:
        reader = reader.option("modifiedAfter", modified_after)
    if modified_before is not None:
        reader = reader.option("modifiedBefore", modified_before)
    return reader.load(path)


def files_as_assets(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
    modified_after: str | None = None,
) -> DataFrame:
    """binaryFile scan shaped to the canonical multimodal asset schema
    (operators/multimodal.py ASSET_SCHEMA): ``asset_id`` is the stable
    64-bit hash of the file path (re-ingest of the same path -> same id,
    so downstream dedup/upsert keys hold across incremental runs),
    modality/media_type come from the extension, dimensions stay NULL
    until a decode stage fills them. Unknown extensions land as
    ``modality='binary'`` rather than being dropped — at ingest the job
    is to LAND bytes, classification errors must be visible downstream,
    not silently filtered at the scan. Everything is a built-in
    expression over the binaryFile columns; the payload bytes move
    executor-side only."""
    raw = read_binary_files(
        spark, path, glob=glob, recursive=recursive, modified_after=modified_after
    )
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    modality = F.lit("binary")
    media = F.lit("application/octet-stream")
    for e, (mod, mt) in sorted(_EXT_MODALITY.items()):
        modality = F.when(ext == e, F.lit(mod)).otherwise(modality)
        media = F.when(ext == e, F.lit(mt)).otherwise(media)
    return raw.select(
        F.xxhash64(F.col("path")).alias("asset_id"),
        modality.alias("modality"),
        media.alias("media_type"),
        F.col("content").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
