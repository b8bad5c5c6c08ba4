"""PNG (ISO 15948) — 8-bit grayscale/RGB encoder + decoder, stdlib only.

The second compressed codec behind the multimodal seam (after baseline
JPEG, operators/jpeg.py): DEFLATE via the stdlib ``zlib``, real chunk
framing (length/type/CRC32), scanline filtering.  PNG is lossless, so
unlike MJPEG its Spark query gets a FULL SQL oracle — encode→decode is
the identity on pixels, and the per-image statistics equal exact
source-byte arithmetic (the BMP discipline, now through a genuinely
compressed container).

Scope:

- **Encode**: 8-bit greyscale (color type 0) or RGB (color type 2),
  filter type 0 on every scanline (simple, spec-legal; any decoder
  reads it).
- **Decode**: 8-bit color types 0 and 2 with ALL FIVE scanline filters
  (None/Sub/Up/Average/Paeth) — foreign files with optimizing encoders
  decode correctly, pinned by tests that hand-build each filter type.
  Chunk CRCs are verified; Adam7 interlace, palettes, 16-bit depth and
  ancillary-critical mismatches raise ``ValueError``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as a real PNG."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        h, w = px.shape
        flat = px.reshape(h, w)
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, channels = 2, 3
        h, w, _ = px.shape
        flat = px.reshape(h, w * 3)
    else:
        raise ValueError(f"expected (h, w) or (h, w, 3) uint8, got {px.shape}")
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + flat[r].tobytes() for r in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filtering (all five types, int arithmetic
    exactly as the spec defines — Average floors, Paeth breaks ties
    left/up/up-left)."""
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"decompressed size {len(raw)} != expected {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.int32)
    bpp = channels
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    for r in range(h):
        ftype = int(arr[r, 0])
        line = arr[r, 1:].astype(np.int32)
        prev = out[r - 1] if r else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            out[r] = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
            out[r] = cur
        elif ftype == 2:  # Up
            out[r] = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
            out[r] = cur
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
            out[r] = cur
        else:
            raise ValueError(f"unknown filter type {ftype} on row {r}")
    return out.astype(np.uint8)


def decode_png(payload: bytes):
    """Decode an 8-bit gray/RGB PNG to (h, w) or (h, w, 3) uint8.

    Walks the chunk stream with CRC verification, inflates the IDAT
    concatenation, reverses scanline filtering.  Unsupported shapes
    (palette, 16-bit, interlaced) raise ``ValueError``."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(payload):
        length = struct.unpack(">I", payload[pos : pos + 4])[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated chunk {ctype!r}")
        crc = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in chunk {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if ihdr is None or not seen_end:
        raise ValueError("missing IHDR/IEND")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2):
        raise ValueError(
            f"unsupported PNG shape: depth={depth}, color_type={color_type}"
        )
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlace unsupported")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    channels = 1 if color_type == 0 else 3
    raw = zlib.decompress(bytes(idat))
    out = _unfilter(raw, h, w, channels)
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, 3)
