"""Real media codecs in pure stdlib + numpy: PNG (RFC 2083) and WAV PCM.

The container ships no imaging/AV library, but PNG needs only zlib (stdlib)
plus the five scanline filters, and WAV PCM is plain struct parsing — so
these two formats get REAL decoders (and encoders, used by tests and the
synthetic-media generator). JPEG/video stay honestly stubbed in
operators/multimodal.py (a conformant JPEG/H.264 decoder is a library, not
a kernel).

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
