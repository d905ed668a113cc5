"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata — the Spark-side
schema, partitioning, Arrow batch shape and UDF signatures are real and
tested; the actual codec work (JPEG decode, resampling, frame extraction) is
STUBBED behind ``DECODERS`` because no image/audio libraries exist in this
container. Swapping a stub for a real decoder (PIL/librosa/av) changes one
function, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("sha", T.StringType(), False),
    ]
)

_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG", "image/png"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"<htm", "text/html"),
    (b"<HTM", "text/html"),
]


def _sniff(buf: bytes) -> str | None:
    head = buf[:8]
    for magic, mt in _MAGIC:
        if head.startswith(magic):
            return mt
    if head[:1] == b"<":
        return "text/html"
    return None


def extract_media_metadata(
    df: DataFrame, id_col: str = "url", bin_col: str = "html"
) -> DataFrame:
    """mapInPandas metadata pass: size, magic-sniffed type, digest.
    Arrow-batched; never materializes blobs on the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "n_bytes": [len(b) if b is not None else 0 for b in blobs],
                    "media_type": [
                        _sniff(bytes(b)) if b is not None else None for b in blobs
                    ],
                    "sha": [
                        hashlib.sha256(bytes(b)).hexdigest() if b is not None else ""
                        for b in blobs
                    ],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, META_SCHEMA)


def decode_image_stub(buf: bytes) -> "object":
    """Image decode — STUB. Real deployment: PIL.Image.open(io.BytesIO(buf)).
    The container has no imaging library; raise so misuse is loud."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; wire PIL/opencv here in deployment"
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType()), False),
    ]
)


def extract_media_features(
    df: DataFrame, id_col: str = "url", bin_col: str = "html", dim: int = 8
) -> DataFrame:
    """Feature-extraction pipeline shape: mapInPandas over binary batches →
    fixed-dim float vector per blob. Uses a DETERMINISTIC FAKE featurizer
    (byte-histogram projection) so the distributed plumbing and schema are
    fully exercised; swap ``featurize`` for a model in deployment."""

    def featurize(buf: bytes) -> list[float]:
        import numpy as np

        h = np.zeros(dim, dtype=np.float64)
        a = np.frombuffer(buf, dtype=np.uint8)
        if len(a):
            bins = np.bincount(a % dim, minlength=dim).astype(np.float64)
            h = bins / len(a)
        return [float(x) for x in h]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "feat": [
                        featurize(bytes(b)) if b is not None else [0.0] * dim
                        for b in pdf[bin_col]
                    ],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str = "url", bin_col: str = "html", n_frames: int = 4
) -> DataFrame:
    """Video frame-sampling pipeline shape: mapInPandas over binary batches →
    ``n_frames`` evenly spaced frames per blob, one output row each (the 1→N
    explode happens inside the Arrow batch, no separate explode stage).

    Decode is a DETERMINISTIC FAKE (evenly spaced byte slices stand in for
    decoded frames — the container ships no video codec; swap ``decode`` for
    pyav/ffmpeg in deployment). Partitioning, schema, batch shape, and the
    row-explosion are the real, tested Spark plumbing.
    """

    def decode(buf: bytes) -> list[bytes]:
        n = max(1, len(buf))
        step = max(1, n // n_frames)
        return [bytes(buf[i * step : i * step + 16]) for i in range(n_frames)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, b in zip(pdf[id_col].astype(str), pdf[bin_col]):
                if b is None:
                    continue
                for i, fr in enumerate(decode(bytes(b))):
                    ids.append(did)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, FRAMES_SCHEMA)
