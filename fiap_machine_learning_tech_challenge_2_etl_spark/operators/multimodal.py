"""Multimodal column plumbing (extension surface; north star).

Images / audio / video are opaque ``binary`` columns with typed metadata.
The Spark-side machinery — schema, partitioning, Arrow-batched
``mapInPandas`` operators, batch shaping — is real and tested. Two REAL
decode kernels close the loop end-to-end without external media
libraries: binary PPM (P6) images (:func:`decode_ppm` — full header
tokenizer with comments/whitespace/maxval, numpy raster reshape) and WAV
PCM audio (:func:`decode_wav_pcm` — stdlib ``wave`` container parse +
numpy sample decode). Formats those kernels don't cover fall back to
lazy Pillow, else the honest stub contract: ``decode_image`` raises
``NotImplementedError`` unless ``fake_decoder=True``, which substitutes
a deterministic fake (byte-level stats standing in for pixel features)
so the distributed plumbing is exercisable for any payload.

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


def encode_ppm(rgb: bytes, width: int, height: int) -> bytes:
    """Serialize a raw RGB raster as a binary PPM (P6) image — the
    inverse of :func:`decode_ppm`, used by tests and the synthetic asset
    generator so the decode kernel is exercised on REAL files of the
    format, not hand-waved byte slices."""
    if len(rgb) != 3 * width * height:
        raise ValueError(
            f"raster is {len(rgb)} bytes; P6 {width}x{height} needs "
            f"{3 * width * height}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> tuple[int, int, "object"]:
    """REAL image decode for binary PPM (P6) — the one raster format
    fully specified in ASCII + raw bytes, so the kernel is pure
    Python/numpy with zero media dependencies. Implements the actual
    format contract: a header of whitespace-separated tokens (magic,
    width, height, maxval) where ``#`` starts a comment-to-EOL anywhere
    between tokens, exactly ONE whitespace byte after maxval, then the
    ``3*w*h``-byte big-endian raster (2-byte samples when maxval > 255).
    Returns ``(width, height, pixels)`` with pixels an ``(h*w, 3)``
    uint16 numpy array in row-major order."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError(f"not a binary PPM: magic {payload[:2]!r}")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and #-comments between header tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            eol = payload.find(b"\n", pos)
            pos = len(payload) if eol < 0 else eol + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[start:pos]))
    width, height, maxval = tokens
    pos += 1  # exactly one whitespace byte separates maxval from raster
    if not 0 < maxval < 65536:
        raise ValueError(f"PPM maxval {maxval} out of range")
    dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
    need = 3 * width * height
    raster = np.frombuffer(payload, dtype=dtype, count=need, offset=pos)
    return width, height, raster.astype(np.uint16).reshape(-1, 3)


def decode_wav_pcm(payload: bytes) -> tuple[int, "object"]:
    """REAL audio decode for WAV/PCM via the stdlib ``wave`` module (a
    genuine RIFF container parser — chunks, fmt block, sample width) +
    numpy sample decode. Returns ``(framerate, samples)`` where samples
    is an ``(n_frames, n_channels)`` int32 numpy array (8-bit WAV is
    unsigned per the spec and is centered to signed here; 16/32-bit are
    little-endian signed)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif sw == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return rate, samples.reshape(-1, nch)


def decode_image(payload: bytes, fake_decoder: bool = False):
    """Decode a payload to a flat GRAYSCALE pixel-value list. Binary PPM
    (P6) payloads take the REAL pure-Python kernel (:func:`decode_ppm`;
    grayscale = integer mean of R,G,B — exact, so SQL oracles can
    replicate it). Other formats import Pillow lazily; if Pillow is
    absent (this container) the stub contract holds:
    ``NotImplementedError``. With ``fake_decoder=True`` returns
    deterministic byte-level pseudo pixels so the distributed pipeline
    around the decode stays testable for ANY payload."""
    if fake_decoder:
        return list(payload[:64])  # first bytes stand in for pixel values
    if payload[:2] == b"P6":
        _w, _h, px = decode_ppm(payload)
        return (px.sum(axis=1, dtype="int64") // 3).tolist()
    try:
        import io

        from PIL import Image  # lazy: not installed in this container
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding beyond PPM(P6) requires an image library "
            "(e.g. Pillow); not available in this environment — pass "
            "fake_decoder=True for the deterministic test double"
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


def synth_ppm_assets(docs: DataFrame, width: int = 4, height: int = 4) -> DataFrame:
    """Deterministic P6 image assets keyed on ``doc_id``: raster byte i
    is ``(doc_id*7 + i*13) % 256``, serialized through the REAL encoder
    (:func:`encode_ppm`) — a closed form a SQL oracle can replay
    byte-for-byte, so the decode kernel downstream is attestable by
    value hash, not just row count. Executor-side generation via
    Arrow-batched mapInPandas; payload is the only wide column and it is
    born distributed."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        n = 3 * width * height
        for pdf in batches:
            payloads = [
                encode_ppm(
                    bytes((int(did) * 7 + i * 13) % 256 for i in range(n)),
                    width,
                    height,
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(op, schema="asset_id long, payload binary")


def ppm_gray_stats(assets: DataFrame) -> DataFrame:
    """REAL image decode -> feature kernel: parse each P6 payload with
    :func:`decode_ppm` (header tokenizer + numpy raster), grayscale each
    pixel as the integer mean of (R,G,B) — exact int arithmetic, so the
    DuckDB oracle replicates it to the bit — and emit per-asset stats
    (sum/min/max of gray, dimensions). Arrow-batched mapInPandas, payload
    pruned to (asset_id, payload) before transfer and never re-emitted."""

    def op(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("asset_id", "width", "height", "gray_sum", "gray_min", "gray_max")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                gray = px.sum(axis=1, dtype=np.int64) // 3
                out["asset_id"].append(int(aid))
                out["width"].append(w)
                out["height"].append(h)
                out["gray_sum"].append(int(gray.sum()))
                out["gray_min"].append(int(gray.min()))
                out["gray_max"].append(int(gray.max()))
            yield pd.DataFrame(out)

    pruned = assets.select("asset_id", "payload")
    return pruned.mapInPandas(
        op,
        schema="asset_id long, width int, height int, gray_sum long, "
        "gray_min long, gray_max long",
    )


def synth_wav_assets(
    docs: DataFrame, n_samples: int = 64, framerate: int = 8000
) -> DataFrame:
    """Deterministic WAV/PCM16 mono assets keyed on ``doc_id``: sample i
    is ``((doc_id*31 + i*17) % 2048) - 1024``, written through the REAL
    stdlib ``wave`` encoder (RIFF chunks, fmt block, little-endian PCM)
    so :func:`decode_wav_pcm` downstream parses a genuine container.
    Closed-form samples keep the decode oracle-attestable by value."""

    def op(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                s = (
                    (int(did) * 31 + np.arange(n_samples, dtype=np.int64) * 17) % 2048
                ) - 1024
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(framerate)
                    w.writeframes(s.astype("<i2").tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(op, schema="asset_id long, payload binary")


def wav_pcm_stats(assets: DataFrame) -> DataFrame:
    """REAL audio decode -> feature kernel: parse each WAV container with
    :func:`decode_wav_pcm` (stdlib ``wave``) and emit the per-asset PCM
    features a real audio pipeline computes — frame count, sample rate,
    total signal energy (sum of sample^2, exact int64) and peak
    amplitude. Arrow-batched mapInPandas; payload never re-emitted."""

    def op(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("asset_id", "n_frames", "framerate", "energy", "peak")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                rate, samples = decode_wav_pcm(bytes(payload))
                s = samples.astype(np.int64)
                out["asset_id"].append(int(aid))
                out["n_frames"].append(int(s.shape[0]))
                out["framerate"].append(int(rate))
                out["energy"].append(int((s * s).sum()))
                out["peak"].append(int(np.abs(s).max()) if s.size else 0)
            yield pd.DataFrame(out)

    pruned = assets.select("asset_id", "payload")
    return pruned.mapInPandas(
        op,
        schema="asset_id long, n_frames long, framerate long, energy long, peak long",
    )


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
