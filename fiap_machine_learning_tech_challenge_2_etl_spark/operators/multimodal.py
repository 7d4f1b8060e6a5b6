"""Multimodal column plumbing (extension surface; north star).

Images / audio / video are opaque ``binary`` columns with typed metadata.
The Spark-side machinery — schema, partitioning, Arrow-batched
``mapInPandas`` operators, batch shaping — is real and tested; the actual
media decoding is STUBBED (this container has no image/audio libraries):
``decode_image`` raises ``NotImplementedError`` unless
``fake_decoder=True``, which substitutes a deterministic fake (byte-level
stats standing in for pixel features) so the distributed plumbing can be
exercised end-to-end.

Scale notes: media blobs dominate row size, so operators (a) select the
binary column as late as possible (column pruning keeps scans cheap when
only metadata is touched), (b) process via ``mapInPandas`` with bounded
Arrow batches (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps
per-batch memory for multi-MB payloads), and (c) emit compact features,
never re-emit payload bytes unless asked.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical multimodal asset schema
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("media_type", T.StringType()),  # e.g. image/png
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: wrap the documents table as fake binary assets (UTF-8 bytes
    as payload) so multimodal plumbing is testable on driver fixtures."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def decode_image(payload: bytes, fake_decoder: bool = False):
    """Decode a payload to a flat pixel-value list. With
    ``fake_decoder=True`` (the hermetic default everywhere in this repo)
    returns deterministic byte-level pseudo pixels so the distributed
    pipeline around the decode is testable without media libraries. With
    ``fake_decoder=False`` Pillow is imported lazily and the image is
    decoded to grayscale; if Pillow is absent (this container) the stub
    contract holds: ``NotImplementedError``."""
    if fake_decoder:
        return list(payload[:64])  # first bytes stand in for pixel values
    try:
        import io

        from PIL import Image  # lazy: not installed in this container
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an image library (e.g. Pillow); "
            "not available in this environment — pass fake_decoder=True "
            "for the deterministic test double"
        ) from exc
    with Image.open(io.BytesIO(payload)) as img:
        return list(img.convert("L").getdata())


def extract_features(
    assets: DataFrame, fake_decoder: bool = True, feature_dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``: per-batch pandas processing, compact numeric output,
    payload never re-emitted. The decode step delegates to ``decode_image``
    (fake by default; real decode via lazy Pillow when available).

    The O(payload) byte statistics are vectorized numpy
    (``frombuffer`` + ``bincount``), not per-byte Python: the only
    per-item Python left is the decode call itself, which is inherently
    per-item. The integer byte sum is exact (int64), so mean/entropy
    match the scalar formulation to float precision."""

    def op(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def feat_of(pixels) -> list:
            if not pixels:
                return [0.0] * feature_dim
            px = np.asarray(pixels, dtype=np.float64)
            step = max(1, len(px) // feature_dim)
            return [
                float(seg.mean()) if (seg := px[i * step : (i + 1) * step]).size else 0.0
                for i in range(feature_dim)
            ]

        for pdf in batches:
            n_v, mean_v, ent_v, feat_v = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                n = arr.size
                if n:
                    mean = float(arr.sum(dtype=np.int64)) / n
                    counts = np.bincount(arr, minlength=256)
                    p = counts[counts > 0] / n
                    ent = float(-(p * np.log2(p)).sum())
                else:
                    mean = ent = 0.0
                n_v.append(n)
                mean_v.append(round(mean, 6))
                ent_v.append(round(ent, 6))
                feat_v.append(feat_of(decode_image(b, fake_decoder=fake_decoder)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pd.Series(n_v, dtype="int64"),
                    "byte_mean": mean_v,
                    "byte_entropy": ent_v,
                    "feature": feat_v,
                }
            )

    # prune to the columns the operator needs BEFORE the Arrow transfer
    pruned = assets.select("asset_id", "modality", "payload")
    return pruned.mapInPandas(op, schema=FEATURE_SCHEMA)


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing (video stand-in): emit up to ``max_frames``
    byte-offset "frames" per asset. Pure built-in exprs (sequence + slice on
    the binary length); the real frame decode would slot into
    ``extract_features``' mapInPandas."""
    n = F.length("payload").cast("long")
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)),
        1,
        max_frames,
    )
    return assets.select(
        "asset_id",
        "modality",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )


def frame_energy(
    assets: DataFrame, frame_bytes: int = 256, max_frames: int = 16
) -> DataFrame:
    """Audio-feature plumbing (energy per fixed-size frame): split each
    payload into ``frame_bytes`` windows and emit one integer energy per
    frame — sum of (byte-128)^2, the PCM-8-style signal energy a real
    audio pipeline computes per hop. The kernel is an Arrow-batched
    mapInPandas with fully vectorized numpy inside (frombuffer ->
    pad/reshape -> per-row square-sum): Python never touches individual
    bytes, and the output is exact int64 — SQL-oracle-replicable. The
    payload is pruned to (asset_id, payload) before the Arrow transfer
    and never re-emitted; output rows are O(assets * max_frames)."""
    from collections.abc import Iterator as _It  # local alias, keeps sig simple

    def op(batches: _It) -> _It:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, idxs, ns, energies = [], [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)[: frame_bytes * max_frames]
                if arr.size == 0:
                    continue
                n_frames = -(-arr.size // frame_bytes)
                padded = np.zeros(n_frames * frame_bytes, dtype=np.int64)
                padded[: arr.size] = arr.astype(np.int64) - 128
                # padding contributes (0-128)^2? No: pad AFTER centering,
                # so pad bytes add zero energy by construction.
                frames = padded.reshape(n_frames, frame_bytes)
                e = (frames * frames).sum(axis=1)
                sizes = np.full(n_frames, frame_bytes, dtype=np.int64)
                sizes[-1] = arr.size - (n_frames - 1) * frame_bytes
                ids.extend([asset_id] * n_frames)
                idxs.extend(range(n_frames))
                ns.extend(sizes.tolist())
                energies.extend(e.tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frame_bytes": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    pruned = assets.select("asset_id", "payload")
    return pruned.mapInPandas(
        op,
        schema="asset_id long, frame_idx int, n_frame_bytes long, energy long",
    )


def resize_thumb(
    assets: DataFrame, n_out: int = 16, out_col: str = "thumb_hex"
) -> DataFrame:
    """Resize plumbing (image stand-in): a deterministic fixed-size
    "thumbnail" of ``n_out`` stride-sampled payload bytes, emitted as a
    hex string. A real resize would decode + interpolate inside an
    Arrow-batched kernel (see extract_features); this stand-in keeps the
    CONTRACT — fixed-size output per asset, payload never re-emitted,
    pure narrow map — while staying entirely in built-in expressions
    (hex + substr over a generated index), so it is whole-stage-codegen'd
    AND SQL-oracle-replicable. Sample positions are the standard
    nearest-neighbor decimation grid: byte index (i * n) div n_out."""
    h = F.hex(F.col("payload"))
    n = F.length("payload").cast("long")
    idx = F.sequence(F.lit(0), F.lit(n_out - 1))
    thumb = F.array_join(
        F.transform(
            idx,
            lambda i: h.substr(
                ((i.cast("long") * n) / F.lit(n_out)).cast("long") * 2 + 1,
                F.lit(2),
            ),
        ),
        "",
    )
    return assets.select(
        "asset_id",
        "modality",
        n.alias("n_bytes"),
        F.when(n > 0, thumb).otherwise(F.lit("")).alias(out_col),
    )
