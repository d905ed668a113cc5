"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata; all passes are
mapInPandas over Arrow batches (blobs never touch the driver).

REAL since round 3: PNG, GIF, and baseline-JPEG decode/resize/re-encode,
WAV PCM decode + FFT spectral features, and uncompressed-AVI frame
extraction run on the pure stdlib+numpy codecs in ``kernels/media.py`` —
image stats, thumbnailing, audio stats/spectra, and video frame stats are
genuine end-to-end decodes, oracle-checked against independently-predicted
dimensions/means/bins. Round 4 adds REAL progressive-JPEG (SOF2) decode —
spectral selection + successive approximation, differ-tested against the
baseline decode. Still honestly STUBBED: WebP/TIFF and inter-frame video
codecs (codec libraries, not kernels; none ships in this container) —
those keep the deterministic-fake plumbing; swapping in PIL/pyav changes
one function.
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
    (b"<htm", "text/html"),
    (b"<HTM", "text/html"),
]


def _sniff(buf: bytes) -> str | None:
    head = buf[:8]
    if head.startswith(b"RIFF"):
        # RIFF is a container family: the form type at bytes 8:12 decides
        kind = buf[8:12]
        if kind == b"AVI ":
            return "video/avi"
        if kind == b"WAVE":
            return "audio/wav"
        return None  # WebP and other RIFF forms we don't decode
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


def _pick_frames(total: int, n_frames: int) -> list[int]:
    """Evenly spaced source-frame indices, exactly ``n_frames`` of them
    (repeats when the clip has fewer frames). Shared by every video pass —
    the video_frames/mjpeg_frames oracles hard-code this formula."""
    return [i * total // n_frames for i in range(n_frames)]


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

    REAL for uncompressed AVI (RIFF/BI_RGB — kernels/media.py): evenly
    spaced frames are decoded and re-encoded as PNG thumbnails. Other
    containers keep the DETERMINISTIC FAKE (evenly spaced byte slices —
    compressed video needs a codec library none of which ships here; swap
    ``decode`` for pyav/ffmpeg in deployment). Partitioning, schema, batch
    shape, and the row-explosion are the real, tested Spark plumbing.
    """

    def decode(buf: bytes) -> list[bytes]:
        if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
            try:
                from ..kernels.media import avi_decode, png_encode

                frames, _fps = avi_decode(buf)
                # exactly n_frames rows (repeats when the clip is shorter),
                # keeping the per-blob cardinality contract of the fake path
                return [
                    png_encode(frames[i]) for i in _pick_frames(len(frames), n_frames)
                ]
            except Exception:
                pass  # undecodable AVI (other codec, truncated) → fake path
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


def decode_image(buf: bytes):
    """REAL image decode for PNG, GIF, and JPEG — baseline AND progressive
    (pure stdlib + numpy — see kernels/media.py); formats outside that set
    (WebP, TIFF, ...) still raise via the stub."""
    b = bytes(buf)
    if b[:4] == b"\x89PNG":
        from ..kernels.media import png_decode

        return png_decode(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from ..kernels.media import gif_decode

        return gif_decode(b)
    if b[:3] == b"\xff\xd8\xff":
        from ..kernels.media import jpeg_decode

        img = jpeg_decode(b)
        return img[:, :, None] if img.ndim == 2 else img
    return decode_image_stub(b)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_px", T.DoubleType(), True),
    ]
)


def extract_image_stats(
    df: DataFrame, id_col: str = "url", bin_col: str = "png"
) -> DataFrame:
    """REAL decode pass: PNG blobs → (width, height, channels, mean pixel).
    mapInPandas, decode entirely executor-side; undecodable blobs yield
    NULL stats rather than failing the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, ms = [], [], [], [], []
            for did, b in zip(pdf[id_col].astype(str), pdf[bin_col]):
                ids.append(did)
                try:
                    img = decode_image(bytes(b))
                    h, w, c = img.shape
                    ws.append(w); hs.append(h); cs.append(c)
                    ms.append(round(float(img.mean()), 6))
                except Exception:
                    ws.append(None); hs.append(None); cs.append(None); ms.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "channels": pd.array(cs, dtype="Int32"),
                    "mean_px": pd.array(ms, dtype="float64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, IMAGE_STATS_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("png", T.BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    out_h: int,
    out_w: int,
    id_col: str = "url",
    bin_col: str = "png",
) -> DataFrame:
    """REAL resize pass: decode PNG → nearest-neighbor resample → re-encode
    PNG, all inside the Arrow batch (the thumbnailing step of a multimodal
    ingest). Undecodable blobs pass through as NULL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.media import png_encode, resize_nearest

        for pdf in batches:
            ids, outs = [], []
            for did, b in zip(pdf[id_col].astype(str), pdf[bin_col]):
                ids.append(did)
                try:
                    outs.append(
                        png_encode(resize_nearest(decode_image(bytes(b)), out_h, out_w))
                    )
                except Exception:
                    outs.append(None)
            yield pd.DataFrame({"doc_id": ids, "png": outs})

    return df.select(id_col, bin_col).mapInPandas(run, RESIZED_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def extract_audio_stats(
    df: DataFrame, id_col: str = "url", bin_col: str = "wav"
) -> DataFrame:
    """REAL decode pass: WAV PCM-16 blobs → (rate, sample count, duration,
    RMS amplitude) via the pure-struct RIFF parser in kernels/media.py."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..kernels.media import wav_decode

        for pdf in batches:
            ids, rates, ns, durs, rmss = [], [], [], [], []
            for did, b in zip(pdf[id_col].astype(str), pdf[bin_col]):
                ids.append(did)
                try:
                    a, rate = wav_decode(bytes(b))
                    n = a.shape[0]
                    rates.append(rate); ns.append(n)
                    durs.append(round(n / rate, 6))
                    rmss.append(
                        round(float(np.sqrt(np.mean(a.astype(np.float64) ** 2))), 6)
                    )
                except Exception:
                    rates.append(None); ns.append(None)
                    durs.append(None); rmss.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "duration_s": pd.array(durs, dtype="float64"),
                    "rms": pd.array(rmss, dtype="float64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, AUDIO_STATS_SCHEMA)


VIDEO_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("src_frame", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_px", T.DoubleType(), True),
    ]
)


def extract_video_frame_stats(
    df: DataFrame, id_col: str = "url", bin_col: str = "avi", n_frames: int = 2
) -> DataFrame:
    """REAL video decode pass (uncompressed AVI, kernels/media.py):
    ``n_frames`` evenly spaced source frames per blob → one stats row each
    (which source frame, dims, mean pixel). The 1→N explode happens inside
    the Arrow batch; undecodable blobs yield a single NULL-stats row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..kernels.media import avi_decode

        for pdf in batches:
            ids, idxs, srcs, ws, hs, ms = [], [], [], [], [], []
            for did, b in zip(pdf[id_col].astype(str), pdf[bin_col]):
                try:
                    frames, _fps = avi_decode(bytes(b))
                    for j, src in enumerate(_pick_frames(len(frames), n_frames)):
                        f = frames[src]
                        ids.append(did); idxs.append(j); srcs.append(src)
                        hs.append(f.shape[0]); ws.append(f.shape[1])
                        ms.append(round(float(f.mean()), 6))
                except Exception:
                    ids.append(did); idxs.append(0); srcs.append(None)
                    ws.append(None); hs.append(None); ms.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "src_frame": pd.array(srcs, dtype="Int32"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "mean_px": pd.array(ms, dtype="float64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, VIDEO_FRAME_STATS_SCHEMA)


AUDIO_SPECTRUM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("peak_bin", T.IntegerType(), True),
        T.StructField("peak_freq_hz", T.DoubleType(), True),
        T.StructField("peak_ratio", T.DoubleType(), True),
    ]
)


def extract_audio_spectrum(
    df: DataFrame, id_col: str = "url", bin_col: str = "wav"
) -> DataFrame:
    """REAL DSP pass: WAV PCM → rFFT magnitude spectrum → dominant non-DC
    bin, its frequency, and its share of total (non-DC) spectral energy —
    the feature-extraction step an audio training pipeline runs before
    embedding. mapInPandas; undecodable blobs yield NULL stats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..kernels.media import wav_decode

        for pdf in batches:
            ids, ns, pbins, pfreqs, pratios = [], [], [], [], []
            for did, b in zip(pdf[id_col].astype(str), pdf[bin_col]):
                ids.append(did)
                try:
                    a, rate = wav_decode(bytes(b))
                    if a.ndim > 1:
                        a = a.mean(axis=1)
                    n = len(a)
                    mag = np.abs(np.fft.rfft(a.astype(np.float64)))
                    if len(mag) < 2:
                        raise ValueError("too short for a spectrum")
                    body = mag[1:]
                    k = int(np.argmax(body)) + 1
                    total = float(np.sum(body**2))
                    ns.append(n)
                    pbins.append(k)
                    pfreqs.append(round(k * rate / n, 6))
                    pratios.append(
                        round(float(mag[k] ** 2) / total, 6) if total else None
                    )
                except Exception:
                    ns.append(None); pbins.append(None)
                    pfreqs.append(None); pratios.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "peak_bin": pd.array(pbins, dtype="Int32"),
                    "peak_freq_hz": pd.array(pfreqs, dtype="float64"),
                    "peak_ratio": pd.array(pratios, dtype="float64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, AUDIO_SPECTRUM_SCHEMA)
