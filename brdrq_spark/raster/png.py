"""Minimal grayscale PNG codec on stdlib zlib/struct (no Pillow in the
sandbox — SURVEY.md §7.0). Lossless, so decode(encode(x)) is exact and
the driver's allclose invariant holds; a quantizing "lossy" mode
(``quantize`` > 1) exercises the PSNR>=40dB path of the per-row image
invariant (BASELINE.json input_hint).

Writes: 8-bit grayscale, filter 0, one IDAT. Reads: 8-bit grayscale,
filters 0-4 (full spec sub/up/average/paeth reconstruction).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 array as grayscale PNG."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG to an (h, w) uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = []
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload, 0)
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w + 1
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        ft = raw[r * stride]
        line = np.frombuffer(raw, dtype=np.uint8, count=w, offset=r * stride + 1).astype(
            np.int32
        )
        if ft == 0:
            cur = line
        elif ft == 2:  # up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # sub / average / paeth need sequential scan
            cur = np.zeros(w, dtype=np.int32)
            a = 0
            for c in range(w):
                b = int(prev[c])
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    cc = int(prev[c - 1]) if c > 0 else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                a = (int(line[c]) + pred) & 0xFF
                cur[c] = a
        else:
            raise ValueError(f"bad filter {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def encode_image(img: np.ndarray, fmt: str, quantize: int = 1) -> bytes:
    """Encode per the images-table ``fmt`` column: 'png' or 'raw'.
    ``quantize`` > 1 coarsens pixel values first (deterministic lossy
    variant; PSNR stays >= 40 dB for quantize <= 4)."""
    img = np.asarray(img, dtype=np.uint8)
    if quantize > 1:
        img = ((img.astype(np.int32) // quantize) * quantize + quantize // 2).clip(
            0, 255
        ).astype(np.uint8)
    if fmt == "png":
        return encode_png(img)
    if fmt == "raw":
        return img.tobytes()
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "png":
        img = decode_png(bytes(data))
        if img.shape != (h, w):
            raise ValueError("PNG dims disagree with metadata")
        return img
    if fmt == "raw":
        return np.frombuffer(bytes(data), dtype=np.uint8).reshape(h, w)
    raise ValueError(f"unsupported fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
