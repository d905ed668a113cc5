"""Real PNG/WAV codecs (kernels/media.py) and their Spark decode passes."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grandine_spark.kernels.media import (
    _PNG_SIG,
    _chunk,
    png_decode,
    png_encode,
    resize_nearest,
    wav_decode,
    wav_encode,
)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip(h, w, c, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def _encode_with_filter(img, f):
    """Hand-encode with a fixed row filter to exercise every decode branch."""
    h, w, c = img.shape
    stride = w * c
    rows, prev = [], np.zeros(stride, np.int16)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int16)
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.zeros(stride, np.int16)
            left[c:] = cur[:-c]
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            left = np.zeros(stride, np.int16)
            left[c:] = cur[:-c]
            enc = cur - (left + prev) // 2
        else:  # paeth
            left = np.zeros(stride, np.int16)
            left[c:] = cur[:-c]
            ul = np.zeros(stride, np.int16)
            ul[c:] = prev[:-c]
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = cur - pred
        rows.append(bytes([f]) + (enc % 256).astype(np.uint8).tobytes())
        prev = cur
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_png_all_filters_decode(f):
    rng = np.random.default_rng(f + 10)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(_encode_with_filter(img, f)), img)


def test_png_rejects_unsupported():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)  # 16-bit depth
    buf = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        png_decode(buf)
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_resize_nearest_exact_downscale():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    out = resize_nearest(img, 4, 4)
    # factor-2 nearest picks every other row/col starting at 0
    assert np.array_equal(out[:, :, 0], img[::2, ::2, 0])


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32767, size=441, dtype=np.int16)
    a, rate = wav_decode(wav_encode(mono, 22050))
    assert rate == 22050 and np.array_equal(a, mono)
    stereo = rng.integers(-1000, 1000, size=(200, 2)).astype(np.int16)
    a2, r2 = wav_decode(wav_encode(stereo, 8000))
    assert r2 == 8000 and a2.shape == (200, 2) and np.array_equal(a2, stereo)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        wav_decode(b"nope")


def test_image_stats_and_resize_on_spark(spark):
    from grandine_spark.operators.multimodal import extract_image_stats, resize_images

    rng = np.random.default_rng(5)
    rows = []
    for i in range(12):
        img = rng.integers(0, 256, size=(4 + i % 5, 3 + i % 4, (1, 3, 4)[i % 3]),
                           dtype=np.uint8)
        rows.append((str(i), png_encode(img), img.shape, round(float(img.mean()), 6)))
    df = spark.createDataFrame(
        [(r[0], bytearray(r[1])) for r in rows], "url string, png binary"
    )
    got = {r.doc_id: r for r in extract_image_stats(df).collect()}
    for did, _, (h, w, c), mean in rows:
        g = got[did]
        assert (g.height, g.width, g.channels) == (h, w, c)
        assert abs(g.mean_px - mean) < 1e-9

    resized = {r.doc_id: bytes(r.png) for r in resize_images(df, 2, 3).collect()}
    for did, _, _, _ in rows:
        out = png_decode(resized[did])
        assert out.shape[:2] == (2, 3)

    # an undecodable blob yields NULLs, not a batch failure
    bad = spark.createDataFrame([("x", bytearray(b"JUNK"))], "url string, png binary")
    r = extract_image_stats(bad).collect()[0]
    assert r.width is None and r.mean_px is None


def test_audio_stats_on_spark(spark):
    from grandine_spark.operators.multimodal import extract_audio_stats

    sine = (np.sin(np.linspace(0, 20, 800)) * 1000).astype(np.int16)
    df = spark.createDataFrame(
        [("a", bytearray(wav_encode(sine, 16000))),
         ("b", bytearray(wav_encode(np.full(100, 7, dtype=np.int16), 8000)))],
        "url string, wav binary",
    )
    got = {r.doc_id: r for r in extract_audio_stats(df).collect()}
    assert got["a"].sample_rate == 16000 and got["a"].n_samples == 800
    assert abs(got["a"].duration_s - 0.05) < 1e-9
    want_rms = round(float(np.sqrt(np.mean(sine.astype(np.float64) ** 2))), 6)
    assert abs(got["a"].rms - want_rms) < 1e-9
    assert got["b"].rms == 7.0 and got["b"].duration_s == 0.0125


# --- GIF -------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=2, max_value=256),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_gif_roundtrip(h, w, p, seed):
    from grandine_spark.kernels.media import gif_decode, gif_encode

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (p, 3), dtype=np.uint8)
    idx = rng.integers(0, p, (h, w), dtype=np.uint8)
    assert (gif_decode(gif_encode(idx, pal)) == pal[idx]).all()


def test_gif_lzw_table_reset():
    """Large random image forces code-width growth AND the 4095 reset."""
    from grandine_spark.kernels.media import gif_decode, gif_encode

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (128, 256), dtype=np.uint8)
    assert (gif_decode(gif_encode(idx, pal)) == pal[idx]).all()


def test_gif_interlaced_decode():
    """Rows written in 4-pass interlace order + the interlace flag decode
    back to the original row order."""
    from grandine_spark.kernels.media import (
        _GIF_INTERLACE_PASSES,
        gif_decode,
        gif_encode,
    )

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (13, 7), dtype=np.uint8)
    order = [r for start, step in _GIF_INTERLACE_PASSES
             for r in range(start, 13, step)]
    buf = bytearray(gif_encode(idx[order], pal))
    tbl = 2 << (buf[10] & 0x07)
    flag_at = 13 + tbl * 3 + 9
    assert buf[flag_at - 9] == 0x2C and buf[flag_at] == 0
    buf[flag_at] = 0x40
    assert (gif_decode(bytes(buf)) == pal[idx]).all()


def test_gif_skips_extensions_and_rejects_garbage():
    from grandine_spark.kernels.media import gif_decode, gif_encode

    pal = np.array([[0, 0, 0], [9, 9, 9]], dtype=np.uint8)
    raw = gif_encode(np.ones((2, 3), dtype=np.uint8), pal)
    # splice a GIF89a graphic-control extension before the image block
    tbl = 2 << (raw[10] & 0x07)
    at = 13 + tbl * 3
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = raw[:at] + ext + raw[at:]
    assert (gif_decode(spliced) == pal[np.ones((2, 3), dtype=int)]).all()
    with pytest.raises(ValueError):
        gif_decode(b"NOTAGIF" + raw)


def test_decode_image_dispatches_gif(spark):
    from grandine_spark.kernels.media import gif_encode
    from grandine_spark.operators.multimodal import extract_image_stats

    pal = np.array([[0, 0, 0], [100, 100, 100]], dtype=np.uint8)
    blob = gif_encode(np.ones((4, 6), dtype=np.uint8), pal)
    df = spark.createDataFrame([(1, blob)], "doc_id long, blob binary")
    r = extract_image_stats(df, id_col="doc_id", bin_col="blob").collect()[0]
    assert (r.width, r.height, r.channels, r.mean_px) == (6, 4, 3, 100.0)


# --- AVI -------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_avi_roundtrip(n, h, w, seed):
    from grandine_spark.kernels.media import avi_decode, avi_encode

    rng = np.random.default_rng(seed)
    fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    dec, fps = avi_decode(avi_encode(fr, fps=10))
    assert fps == 10.0 and (dec == fr).all()


def test_avi_rejects_garbage_and_compressed():
    from grandine_spark.kernels.media import avi_decode, avi_encode

    with pytest.raises(ValueError):
        avi_decode(b"RIFFxxxxWAVE")  # wrong form type
    raw = bytearray(avi_encode(np.zeros((1, 2, 2, 3), dtype=np.uint8)))
    at = raw.find(struct.pack("<IiiHHI", 40, 2, 2, 1, 24, 0))
    raw[at + 16 : at + 20] = b"H264"  # compression field != BI_RGB
    with pytest.raises(ValueError):
        avi_decode(bytes(raw))


def test_sample_frames_real_avi_path(spark):
    """AVI blobs take the REAL decode path: sampled frames come back as
    decodable PNGs of the source frames."""
    from grandine_spark.kernels.media import avi_encode
    from grandine_spark.operators.multimodal import sample_frames

    frames = np.stack(
        [np.full((3, 4, 3), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50, 60)]
    )
    df = spark.createDataFrame(
        [("v", bytearray(avi_encode(frames)))], "url string, html binary"
    )
    out = sorted(sample_frames(df, n_frames=3).collect(), key=lambda r: r.frame_idx)
    # picks = {0*6//3, 1*6//3, 2*6//3} = {0, 2, 4}
    assert [r.frame_idx for r in out] == [0, 1, 2]
    for r, src in zip(out, (0, 2, 4)):
        img = png_decode(bytes(r.frame))
        assert img.shape == (3, 4, 3) and (img == frames[src]).all()


def test_video_frame_stats_on_spark(spark):
    from grandine_spark.kernels.media import avi_encode
    from grandine_spark.operators.multimodal import extract_video_frame_stats

    frames = np.stack(
        [np.full((2, 3, 3), v, dtype=np.uint8) for v in (5, 15, 25)]
    )
    df = spark.createDataFrame(
        [("v", bytearray(avi_encode(frames))), ("bad", bytearray(b"nope"))],
        "url string, avi binary",
    )
    rows = extract_video_frame_stats(df, n_frames=2).collect()
    good = sorted((r for r in rows if r.doc_id == "v"), key=lambda r: r.frame_idx)
    assert [(r.src_frame, r.width, r.height, r.mean_px) for r in good] == [
        (0, 3, 2, 5.0), (1, 3, 2, 15.0)
    ]
    bad = [r for r in rows if r.doc_id == "bad"][0]
    assert bad.src_frame is None and bad.mean_px is None


def test_audio_spectrum_on_spark(spark):
    from grandine_spark.operators.multimodal import extract_audio_spectrum

    n, rate, k = 512, 16000, 37
    sine = np.round(5000 * np.sin(2 * np.pi * k * np.arange(n) / n)).astype(np.int16)
    mix = (
        np.round(3000 * np.sin(2 * np.pi * 10 * np.arange(n) / n))
        + np.round(1000 * np.sin(2 * np.pi * 50 * np.arange(n) / n))
    ).astype(np.int16)
    df = spark.createDataFrame(
        [
            ("pure", bytearray(wav_encode(sine, rate))),
            ("mix", bytearray(wav_encode(mix, rate))),
            ("bad", bytearray(b"nope")),
        ],
        "url string, wav binary",
    )
    got = {r.doc_id: r for r in extract_audio_spectrum(df).collect()}
    assert got["pure"].peak_bin == k
    assert abs(got["pure"].peak_freq_hz - k * rate / n) < 1e-9
    assert got["pure"].peak_ratio > 0.99
    # the stronger partial wins; its energy share is well under a pure tone's
    assert got["mix"].peak_bin == 10 and got["mix"].peak_ratio < 0.95
    assert got["bad"].peak_bin is None and got["bad"].peak_freq_hz is None


# --- JPEG ------------------------------------------------------------------


def test_jpeg_flat_even_gray_is_exact():
    from grandine_spark.kernels.media import jpeg_decode, jpeg_encode

    for v in (0, 2, 100, 176, 248):
        img = np.full((11, 13), v, dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode(img))
        assert dec.shape == (11, 13) and (dec == v).all()


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=25),
    st.integers(min_value=1, max_value=25),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_jpeg_roundtrip_within_quant_error(h, w, color, seed):
    """Lossy round-trip: smooth (low-frequency) content reconstructs within
    a small bound under the flat-16 quant table."""
    from grandine_spark.kernels.media import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220)
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = (base + 3.0 * np.sin(yy / 5) + 3.0 * np.cos(xx / 7)).astype(np.uint8)
    img = np.stack([smooth] * 3, axis=2) if color else smooth
    dec = jpeg_decode(jpeg_encode(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_jpeg_restart_markers_decode_identically():
    from grandine_spark.kernels.media import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 33), dtype=np.uint8)
    base = jpeg_decode(jpeg_encode(img))
    for ri in (1, 3, 7):
        assert (jpeg_decode(jpeg_encode(img, restart_interval=ri)) == base).all()


def test_jpeg_rejects_malformed_scan_and_garbage():
    from grandine_spark.kernels.media import jpeg_decode, jpeg_encode

    raw = bytearray(jpeg_encode(np.zeros((8, 8), dtype=np.uint8)))
    at = raw.find(b"\xff\xc0")
    raw[at + 1] = 0xC2  # SOF2 with a baseline Ss=0/Se=63 scan header:
    with pytest.raises(ValueError):  # illegal progressive DC scan
        jpeg_decode(bytes(raw))
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01nope")


def test_jpeg_progressive_equals_baseline_decode():
    """The progressive encoder quantizes with the same math as the baseline
    encoder, so decoding either stream must give bit-identical pixels. Runs
    the full successive-approximation script (DC first+refine, AC
    first+refine) and the spectral-selection-only script, gray and RGB."""
    from grandine_spark.kernels.media import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:30, 0:41]
    cases = [
        rng.integers(0, 256, (24, 17), dtype=np.uint8),  # dense AC + corrections
        rng.integers(0, 256, (11, 13, 3), dtype=np.uint8),
        ((yy * 3 + xx * 5) % 256).astype(np.uint8),  # smooth gradient
        np.full((16, 16), 100, np.uint8),  # all-zero AC -> long EOB run
        ((yy + xx) % 2 * 255).astype(np.uint8)[:16, :16],  # checker -> ZRL
    ]
    for img in cases:
        base = jpeg_decode(jpeg_encode(img))
        for refine in (True, False):
            buf = jpeg_encode_progressive(img, refine=refine)
            assert buf.find(b"\xff\xc2") > 0  # SOF2
            assert buf.count(b"\xff\xda") >= (2 if img.ndim == 2 else 4)
            dec = jpeg_decode(buf)
            assert dec.shape == base.shape and (dec == base).all()


def test_jpeg_progressive_restart_markers():
    from grandine_spark.kernels.media import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 33), dtype=np.uint8)
    base = jpeg_decode(jpeg_encode(img))
    for ri in (1, 3, 7):
        for refine in (True, False):
            buf = jpeg_encode_progressive(img, restart_interval=ri, refine=refine)
            assert (jpeg_decode(buf) == base).all()


def test_jpeg_progressive_dc_prefix_decodes():
    """Truncating after the DC scans and appending EOI must still decode —
    the renderable-prefix property progressive JPEG exists for."""
    from grandine_spark.kernels.media import jpeg_decode, jpeg_encode_progressive

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3 % 256).astype(np.uint8)
    buf = jpeg_encode_progressive(img, refine=False)
    first = buf.find(b"\xff\xda")
    second = buf.find(b"\xff\xda", first + 2)
    dec = jpeg_decode(buf[:second] + b"\xff\xd9")
    # DC-only reconstruction = per-block mean; same mean as the full decode
    assert dec.shape == img.shape
    assert abs(float(dec.mean()) - float(jpeg_decode(buf).mean())) < 1.0


@settings(max_examples=12, deadline=None)
@given(
    st.integers(min_value=1, max_value=25),
    st.integers(min_value=1, max_value=25),
    st.booleans(),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_jpeg_progressive_differ(h, w, color, refine, seed):
    """Seeded differ: progressive decode == baseline decode on random
    images (any wire-format bug breaks the equality)."""
    from grandine_spark.kernels.media import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    base = jpeg_decode(jpeg_encode(img))
    dec = jpeg_decode(jpeg_encode_progressive(img, refine=refine))
    assert dec.shape == base.shape and (dec == base).all()


def test_image_stats_dispatches_progressive_jpeg(spark):
    from grandine_spark.kernels.media import jpeg_encode_progressive
    from grandine_spark.operators.multimodal import extract_image_stats

    gray = np.full((6, 10), 88, dtype=np.uint8)
    blob = jpeg_encode_progressive(gray)
    df = spark.createDataFrame([("p1", bytearray(blob))], "url string, png binary")
    row = extract_image_stats(df).collect()[0]
    assert (row.height, row.width) == (6, 10)
    assert abs(row.mean_px - 88.0) < 1e-6


def test_image_stats_dispatches_jpeg(spark):
    from grandine_spark.kernels.media import jpeg_encode
    from grandine_spark.operators.multimodal import extract_image_stats

    gray = np.full((5, 9), 200, dtype=np.uint8)
    rgb = np.zeros((6, 4, 3), dtype=np.uint8)
    rgb[:] = (128, 128, 128)  # neutral: Y=128, chroma=128 -> exact round-trip
    df = spark.createDataFrame(
        [("g", bytearray(jpeg_encode(gray))), ("c", bytearray(jpeg_encode(rgb)))],
        "url string, png binary",
    )
    got = {r.doc_id: r for r in extract_image_stats(df).collect()}
    assert (got["g"].width, got["g"].height, got["g"].channels, got["g"].mean_px) == (9, 5, 1, 200.0)
    assert (got["c"].width, got["c"].height, got["c"].channels, got["c"].mean_px) == (4, 6, 3, 128.0)


def test_avi_mjpeg_roundtrip():
    from grandine_spark.kernels.media import avi_decode, avi_encode

    # neutral-gray even fills survive MJPEG exactly (flat quant, chroma 128)
    fr = np.stack([np.full((8, 8, 3), v, np.uint8) for v in (64, 128, 200)])
    dec, fps = avi_decode(avi_encode(fr, fps=5, codec="mjpg"))
    assert fps == 5.0 and (dec == fr).all()
    # smooth content stays within quant error
    yy, xx = np.mgrid[0:16, 0:12]
    fr2 = np.stack(
        [
            (100 + 3 * np.sin(yy / 4 + k) + 3 * np.cos(xx / 5))
            .astype(np.uint8)[:, :, None]
            .repeat(3, 2)
            for k in range(4)
        ]
    )
    dec2, _ = avi_decode(avi_encode(fr2, codec="mjpg"))
    assert np.abs(dec2.astype(int) - fr2.astype(int)).max() <= 8


def test_sample_frames_undecodable_avi_falls_back(spark):
    """A RIFF/AVI blob the codec can't decode (foreign codec, truncated)
    must NOT fail the task: it takes the byte-slice fake path and still
    yields exactly n_frames rows."""
    from grandine_spark.operators.multimodal import sample_frames

    bad = b"RIFF" + b"\x00\x00\x00\x00" + b"AVI " + b"garbage-not-frames"
    df = spark.createDataFrame([("x", bytearray(bad))], "url string, html binary")
    rows = sample_frames(df, n_frames=3).collect()
    assert len(rows) == 3 and sorted(r.frame_idx for r in rows) == [0, 1, 2]


def test_sample_frames_short_avi_keeps_cardinality(spark):
    """Fewer source frames than n_frames → repeats, never fewer rows."""
    from grandine_spark.kernels.media import avi_encode, png_decode
    from grandine_spark.operators.multimodal import sample_frames

    frames = np.stack([np.full((2, 2, 3), v, np.uint8) for v in (10, 20)])
    df = spark.createDataFrame(
        [("v", bytearray(avi_encode(frames)))], "url string, html binary"
    )
    rows = sorted(sample_frames(df, n_frames=4).collect(), key=lambda r: r.frame_idx)
    # picks = [0*2//4, 1*2//4, 2*2//4, 3*2//4] = [0, 0, 1, 1]
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    vals = [int(png_decode(bytes(r.frame))[0, 0, 0]) for r in rows]
    assert vals == [10, 10, 20, 20]


def test_jpeg_short_eob_tables_with_restarts():
    """Third-party baseline JPEGs (e.g. camera/MJPEG output with the Annex-K
    tables) give EOB a short code; when an interval's final code fits wholly
    in the sub-8-bit buffered tail before a restart marker, the decoder must
    decode it from the tail rather than bailing on the marker. Regression:
    the huffman fast path re-raised _RestartMarker and 51/180 such streams
    failed to decode."""
    import grandine_spark.kernels.media as media

    orig_spec = media._huff_spec

    def short_eob_spec():
        (dc_counts, dc_syms), _ = orig_spec()
        ac_syms = [0x00, 0xF0] + [
            (r << 4) | s for r in range(16) for s in range(1, 11)
        ]
        ac_counts = [0] * 16
        ac_counts[3] = 1  # EOB: one 4-bit code (Kraft: 1/16 + 161/512 < 1)
        ac_counts[8] = len(ac_syms) - 1  # everything else: 9-bit
        return (dc_counts, dc_syms), (ac_counts, ac_syms)

    rng = np.random.default_rng(7)
    media._huff_spec = short_eob_spec
    try:
        for ri in (1, 2, 3):
            for _ in range(20):
                img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
                short = media.jpeg_decode(media.jpeg_encode(img, restart_interval=ri))
                media._huff_spec = orig_spec
                std = media.jpeg_decode(media.jpeg_encode(img, restart_interval=ri))
                media._huff_spec = short_eob_spec
                # same coefficients, different entropy coding → same pixels
                assert np.array_equal(short, std)
    finally:
        media._huff_spec = orig_spec


def test_jpeg_fill_bytes_before_markers():
    """JPEG B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    the header scan must skip them instead of desyncing on marker==0xFF."""
    from grandine_spark.kernels.media import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    buf = jpeg_encode(img)
    ref = jpeg_decode(buf)
    for marker, n_fill in ((b"\xff\xdb", 1), (b"\xff\xc4", 3), (b"\xff\xda", 2)):
        idx = buf.find(marker)
        padded = buf[:idx] + b"\xff" * n_fill + buf[idx:]
        assert np.array_equal(jpeg_decode(padded), ref)
