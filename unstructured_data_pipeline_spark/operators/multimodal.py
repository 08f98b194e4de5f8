"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Convention: a modality column is ``content BINARY`` plus a metadata struct
(``mime STRING, width INT, height INT, duration_ms BIGINT, ...``).  Ops are
Arrow-batched ``mapInPandas`` transforms so the binary payloads never leave
the executors and batches amortize the Python boundary.

The actual decoders (Pillow / ffmpeg / torchaudio) are NOT in this container,
so the decode kernels are deterministic fakes behind ``_decode_image`` /
``_sample_frames`` — clearly marked; the Spark-side plumbing (schemas,
partitioning, UDF signatures, batch shapes) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "id string, mime string, width int, height int, feat array<float>"
)


def _decode_image(content: bytes) -> tuple[str, int, int]:
    """DETERMINISTIC FAKE decode (real impl: PIL.Image.open).

    Sniffs magic bytes for the mime and derives a fake geometry from the
    content hash so tests are reproducible.  Swap for a real decoder when the
    imaging libs are available.
    """
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        mime = "image/png"
    elif content[:3] == b"\xff\xd8\xff":
        mime = "image/jpeg"
    elif content[:5] == b"%PDF-":
        mime = "application/pdf"
    else:
        mime = "application/octet-stream"
    import hashlib

    h = hashlib.md5(content).digest()
    return mime, 64 + h[0] % 192, 64 + h[1] % 192


def _feature_vector(content: bytes, dim: int = 8) -> list[float]:
    """DETERMINISTIC FAKE feature extraction (real impl: a vision encoder).
    md5-derived values in [-1, 1]."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(content + i.to_bytes(2, "big")).digest()
        out.append(2.0 * (int.from_bytes(h[:4], "big") / 0xFFFFFFFF) - 1.0)
    return out


def image_features(
    df: DataFrame, id_col: str = "path", content_col: str = "content", dim: int = 8
) -> DataFrame:
    """Decode + featurize an image column: one mapInPandas pass, output one
    row per image with mime/geometry metadata and a float feature vector
    (joinable into the similarity-search operators)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r[content_col]) if r[content_col] is not None else b""
                mime, w, h = _decode_image(content)
                rows.append(
                    {
                        "id": str(r[id_col]),
                        "mime": mime,
                        "width": w,
                        "height": h,
                        "feat": _feature_vector(content, dim),
                    }
                )
            yield pd.DataFrame(rows, columns=["id", "mime", "width", "height", "feat"])

    return df.select(id_col, content_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "path",
    content_col: str = "content",
    every_n: int = 10,
    max_frames: int = 4,
) -> DataFrame:
    """Video frame sampling plumbing (real impl: ffmpeg keyframe extract).

    The FAKE kernel slices the binary into ``max_frames`` deterministic
    chunks standing in for decoded frames; output one row per (video, frame)
    with the frame bytes as a fresh binary column — the shape a downstream
    vision featurizer consumes.
    """
    schema = "id string, frame_no int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r[content_col]) if r[content_col] is not None else b""
                step = max(1, len(content) // max(1, max_frames))
                for i in range(min(max_frames, max(1, len(content) // step))):
                    rows.append(
                        {
                            "id": str(r[id_col]),
                            "frame_no": i,
                            "frame": content[i * step : (i + 1) * step],
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_no", "frame"])

    return df.select(id_col, content_col).mapInPandas(run, schema)


AUDIO_FEATURES_SCHEMA = (
    "id string, sample_rate int, n_samples bigint, rms double, zero_crossings bigint"
)


def _decode_audio(content: bytes) -> tuple[int, list[float]]:
    """DETERMINISTIC FAKE decode (real impl: soundfile/ffmpeg, neither in
    this container).  Interprets the bytes as signed 8-bit PCM at a fake
    16 kHz rate so the downstream feature math is real."""
    pcm = [(b - 128) / 128.0 for b in content]
    return 16000, pcm


def audio_features(
    df: DataFrame, id_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """Audio decode + feature extraction plumbing: binary -> mapInPandas ->
    (sample_rate, n_samples, rms, zero_crossings) per clip.  The decode
    kernel is a deterministic fake (see :func:`_decode_audio`); swap in a
    real decoder without touching the Spark plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r[content_col]) if r[content_col] is not None else b""
                rate, pcm = _decode_audio(content)
                n = len(pcm)
                rms = math.sqrt(sum(x * x for x in pcm) / n) if n else 0.0
                zc = sum(
                    1 for i in range(1, n) if (pcm[i - 1] < 0) != (pcm[i] < 0)
                )
                rows.append(
                    {
                        "id": str(r[id_col]),
                        "sample_rate": rate,
                        "n_samples": n,
                        "rms": rms,
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "sample_rate", "n_samples", "rms", "zero_crossings"],
            )

    return df.select(id_col, content_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)
