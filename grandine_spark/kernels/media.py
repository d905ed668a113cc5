"""Real media codecs in pure stdlib + numpy: PNG (RFC 2083), GIF (87a/89a,
LZW), WAV PCM, and uncompressed AVI video.

The container ships no imaging/AV library, but PNG needs only zlib (stdlib)
plus the five scanline filters, GIF is a palette + a ~100-line LZW, and WAV
PCM / uncompressed AVI are plain struct parsing — so these formats get REAL
decoders (and encoders, used by tests and the synthetic-media generator).
JPEG and compressed video stay honestly stubbed in operators/multimodal.py
(a conformant JPEG/H.264 decoder is a library, not a kernel).

Supported PNG subset (documented, asserted): 8-bit depth, color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace. All five row
filters (None/Sub/Up/Average/Paeth) decode; the encoder writes filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """uint8 array (H,W) or (H,W,C) with C in {1,2,3,4} → PNG bytes
    (filter 0 rows, one IDAT)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    """Paeth predictor, vectorized over int16+ arrays."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H,W,C). Raises ValueError on formats outside
    the supported subset (depth != 8, interlace, palette)."""
    if not buf.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, idat, meta = len(_PNG_SIG), [], None
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth} ctype={ctype} "
                    f"interlace={interlace})"
                )
            meta = (w, h, _CHANNELS[ctype])
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("truncated PNG")
    w, h, c = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("bad PNG payload size")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f, cur = int(filters[y]), data[y].astype(np.uint8)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up — fully vectorized
            out[y] = cur + prev
        elif f in (1, 3, 4):  # Sub/Average/Paeth need the in-row scan
            line = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = line[x - c] if x >= c else np.uint8(0)
                up = prev[x]
                ul = prev[x - c] if x >= c else np.uint8(0)
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = np.uint8((int(left) + int(up)) // 2)
                else:
                    pred = _paeth(
                        np.asarray(left), np.asarray(up), np.asarray(ul)
                    )
                line[x] = np.uint8((int(cur[x]) + int(pred)) & 0xFF)
            out[y] = line
        else:
            raise ValueError(f"bad filter {f}")
    return out.reshape(h, w, c)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic, dependency-free choice)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


# --- WAV PCM ---------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono/stereo PCM array (N,) or (N,2) → RIFF/WAVE bytes."""
    a = np.asarray(samples, dtype="<i2")
    ch = 1 if a.ndim == 1 else a.shape[1]
    data = a.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 bytes → (int16 array (N,) or (N,ch), sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, ch, data = 12, None, None, None
    while pos + 8 <= len(buf):
        tag, length = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        payload = buf[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length % 2)
        if tag == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", payload)
            if audio_fmt != 1 or struct.unpack_from("<H", payload, 14)[0] != 16:
                raise ValueError("only PCM-16 supported")
        elif tag == b"data":
            data = payload
    if rate is None or data is None:
        raise ValueError("truncated WAV")
    a = np.frombuffer(data, dtype="<i2")
    if ch and ch > 1:
        a = a.reshape(-1, ch)
    return a, rate


# --- GIF (87a/89a, LZW) ----------------------------------------------------
#
# GIF is kernel-grade like PNG: a palette + LZW, both fully specified and
# implementable in numpy/stdlib. Supported subset (asserted): single frame,
# global color table, interlace supported on decode; the encoder writes
# non-interlaced GIF87a with a power-of-two global table.


def gif_encode(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """(H,W) uint8 palette indices + (P,3) uint8 palette → GIF87a bytes."""
    a = np.asarray(idx, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = a.shape
    p = len(pal)
    if p < 2 or p > 256 or a.max(initial=0) >= p:
        raise ValueError("palette must hold 2..256 entries covering all indices")
    # pad palette to the next power of two >= 2
    bits = max(1, (p - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:p] = pal
    out = [b"GIF87a", struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0),
           table.tobytes(),
           struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)]
    min_code = max(2, bits)
    out.append(bytes([min_code]))
    out.append(_lzw_encode(a.ravel(), min_code))
    out.append(b"\x00;")
    return b"".join(out)


def _lzw_encode(pixels: np.ndarray, min_code: int) -> bytes:
    """GIF-flavor LZW with sub-block framing."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code, width = end + 1, min_code + 1
    bitbuf = bitlen = 0
    body = bytearray()

    def emit(code: int):
        nonlocal bitbuf, bitlen
        bitbuf |= code << bitlen
        bitlen += width
        while bitlen >= 8:
            body.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8

    emit(clear)
    cur = b""
    for px in pixels.tobytes():
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width):
            width += 1
        if next_code >= 4095:  # reset before the 12-bit ceiling
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = end + 1, min_code + 1
        cur = bytes([px])
    if cur:
        emit(table[cur])
    emit(end)
    if bitlen:
        body.append(bitbuf & 0xFF)
    # 255-byte sub-block framing
    out = bytearray()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    table: list[bytes] = []
    width = min_code + 1
    bitbuf = bitlen = pos = 0
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1
        prev = None

    reset()
    while len(out) < n_pixels and pos <= len(data):
        while bitlen < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            bitbuf |= data[pos] << bitlen
            bitlen += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitlen -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended early")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(buf: bytes) -> np.ndarray:
    """GIF bytes → uint8 RGB array (H,W,3). First frame only; local color
    tables and interlace are handled, later frames/extensions skipped."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih, ip = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        table = global_table
        if ip & 0x80:
            n = 2 << (ip & 0x07)
            table = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code = buf[pos]
        pos += 1
        data = bytearray()
        while buf[pos]:
            ln = buf[pos]
            data.extend(buf[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), min_code, iw * ih)
        if ip & 0x40:  # interlaced: rows arrive in 4 passes
            rows = idx.reshape(ih, iw)
            out_rows = np.empty_like(rows)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                n_rows = len(range(start, ih, step))
                out_rows[start::step] = rows[src : src + n_rows]
                src += n_rows
            idx = out_rows.ravel()
        if idx.max(initial=0) >= len(table):
            raise ValueError("palette index out of range")
        return table[idx.reshape(ih, iw)]
    raise ValueError("no image block in GIF")


# --- AVI (uncompressed RGB, RIFF) ------------------------------------------
#
# Uncompressed AVI is the one video container that is kernel-grade: RIFF
# chunk framing + BITMAPINFOHEADER + raw bottom-up BGR frames ('00db'
# chunks, BI_RGB). Real frame extraction works on these; compressed video
# (H.264 etc.) stays stubbed in operators/multimodal.py.


def avi_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """(N,H,W,3) uint8 RGB frames → uncompressed AVI (DIB/BI_RGB) bytes."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 4 or a.shape[3] != 3:
        raise ValueError("frames must be (N,H,W,3) uint8")
    n, h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return tag + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) % 2 else b""
        )

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"DIB " + struct.pack(
        "<10I4H", 0, 0, 0, 1, fps, 0, n, frame_size, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    rows = []
    pad = b"\x00" * (stride - w * 3)
    for f in range(n):
        bgr = a[f, ::-1, :, ::-1]  # bottom-up rows, RGB→BGR
        rows.append(chunk(b"00db", b"".join(bgr[y].tobytes() + pad for y in range(h))))
    movi = lst(b"movi", b"".join(rows))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(buf: bytes) -> tuple[np.ndarray, float]:
    """Uncompressed AVI bytes → ((N,H,W,3) uint8 RGB frames, fps). Raises
    ValueError for compressed streams (anything but BI_RGB 24-bit)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    dims = fps = None
    bitcount = None
    frames_raw: list[bytes] = []

    def walk(lo: int, hi: int):
        nonlocal dims, fps, bitcount
        pos = lo
        while pos + 8 <= hi:
            tag = buf[pos : pos + 4]
            (length,) = struct.unpack_from("<I", buf, pos + 4)
            data_lo = pos + 8
            data_hi = data_lo + length
            if tag == b"LIST":
                walk(data_lo + 4, data_hi)
            elif tag == b"avih":
                f = struct.unpack_from("<14I", buf, data_lo)
                dims = (f[8], f[9])
            elif tag == b"strh" and buf[data_lo : data_lo + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", buf, data_lo + 20)
                if scale:
                    fps = rate / scale
            elif tag == b"strf" and bitcount is None:
                hdr = struct.unpack_from("<IiiHHI", buf, data_lo)
                bitcount, compression = hdr[4], hdr[5]
                if compression != 0 or bitcount != 24:
                    raise ValueError(
                        f"only uncompressed 24-bit AVI supported "
                        f"(compression={compression} bits={bitcount})"
                    )
            elif tag in (b"00db", b"00dc"):
                frames_raw.append(buf[data_lo:data_hi])
            pos = data_hi + (length % 2)

    walk(12, len(buf))
    if dims is None or not frames_raw:
        raise ValueError("truncated AVI (no header or no frames)")
    w, h = dims
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) < stride * h:
            raise ValueError("short AVI frame")
        rows = np.frombuffer(raw, np.uint8, stride * h).reshape(h, stride)
        out[i] = rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return out, float(fps or 0.0)
