"""Baseline JPEG (ITU T.81) — grayscale encoder + decoder, numpy only.

Fills the compressed-codec seam behind ``codec="real"``
(operators/multimodal.py): the fixture's WAV/BMP/uncompressed-AVI
modalities already decode for real; this module adds a REAL lossy
transform codec — 8×8 DCT, quantization, zigzag, canonical Huffman
entropy coding, marker segments — so MJPEG-in-AVI video rows exercise
the same Arrow-batched ``mapInPandas`` plumbing with a compressed
payload.  (The reference pipeline has no media at all; this is the
north-star training-data tier.)

Scope and choices:

- **Grayscale (one component)**: the full DCT/quant/Huffman/marker
  machinery with none of the chroma-subsampling bookkeeping.  MJPEG
  carries these frames legally (biCompression='MJPG').
- **Tables travel in the stream**: DQT and DHT segments are written by
  the encoder and the decoder trusts ONLY the embedded tables (as a
  real decoder must) — the DC table is Annex K's luminance table, the
  AC table is a canonical fixed-length-8 table over the 162 legal
  (run, size) symbols; any spec-conforming decoder reads these files.
- **Deterministic**: float64 DCT with round-half-away quantization —
  bit-stable across runs and machines, which the content-hash tests
  rely on.
- Entropy loop is per-block Python: frames at fixture scale are tiny
  (dozens of blocks); the Spark-side parallelism is per media row via
  ``mapInPandas`` (one Arrow batch per task), not per block.
"""

from __future__ import annotations

import struct

import numpy as np

#: Annex K luminance quantization table (row-major), the JPEG default.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)


def _zigzag_pairs() -> list[tuple[int, int]]:
    """The standard zigzag scan, derived (not memorized): diagonals by
    i+j; odd diagonals walk down-left (i ascending), even up-right."""
    return sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else p[1]),
    )


_ZZ = _zigzag_pairs()
_ZZ_ROWS = np.array([p[0] for p in _ZZ])
_ZZ_COLS = np.array([p[1] for p in _ZZ])

#: Orthonormal 8-point DCT-II matrix: forward F = C @ B @ C.T.
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

#: DC Huffman spec (Annex K luminance): code lengths per size category.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

#: AC Huffman spec: every legal baseline symbol — EOB, ZRL and the 160
#: (run 0-15, size 1-10) pairs — at canonical length 8 (162 ≤ 255, so
#: the all-ones code stays unused as T.81 requires).  Deliberately NOT
#: Annex K's frequency-optimized table: the tables are embedded in DHT,
#: so any valid table decodes everywhere; a uniform one is a single
#: obvious line of spec instead of 162 memorized constants.
AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
AC_VALS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


def _encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing inside entropy data
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill, per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def jpeg_encode_gray(img, quant=QUANT_LUMA) -> bytes:
    """Encode an (h, w) uint8 image as a baseline grayscale JFIF/JPEG."""
    px = np.asarray(img, dtype=np.uint8)
    if px.ndim != 2 or px.size == 0:
        raise ValueError(f"expected non-empty (h, w) grayscale, got {px.shape}")
    h, w = px.shape
    if h > 65500 or w > 65500:  # SOF dimension fields are uint16
        raise ValueError(f"dimensions exceed JPEG's 16-bit limit: {h}x{w}")
    q = np.asarray(quant, dtype=np.int64)
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant table must be 8x8 of 1..255")
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]  # edge-replicate padding keeps
    padded[:, w:] = padded[:, w - 1 : w]  # block boundaries smooth
    padded -= 128.0

    dc_codes = _encode_table(DC_BITS, DC_VALS)
    ac_codes = _encode_table(AC_BITS, AC_VALS)
    bits = _BitWriter()
    prev_dc = 0
    qf = q.astype(np.float64)
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _C @ block @ _C.T
            # round half away from zero, then clamp to the baseline
            # amplitude ranges (size ≤ 11 DC diff, ≤ 10 AC)
            zq = np.sign(coef) * np.floor(np.abs(coef) / qf + 0.5)
            zz = zq[_ZZ_ROWS, _ZZ_COLS].astype(np.int64)
            dc = int(np.clip(zz[0], -2047 + prev_dc, 2047 + prev_dc))
            diff = dc - prev_dc
            prev_dc = dc
            size = _category(diff)
            bits.put(*dc_codes[size])
            if size:
                amp = diff if diff > 0 else diff + (1 << size) - 1
                bits.put(amp, size)
            ac = np.clip(zz[1:], -1023, 1023)
            nz = np.nonzero(ac)[0]
            pos = 0
            for idx in nz:
                run = int(idx) - pos
                while run > 15:
                    bits.put(*ac_codes[0xF0])  # ZRL
                    run -= 16
                v = int(ac[idx])
                size = _category(v)
                bits.put(*ac_codes[(run << 4) | size])
                amp = v if v > 0 else v + (1 << size) - 1
                bits.put(amp, size)
                pos = int(idx) + 1
            if pos < 63:
                bits.put(*ac_codes[0x00])  # EOB
    entropy = bits.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_q = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    dqt = seg(0xFFDB, b"\x00" + zz_q)  # Pq=0 (8-bit), Tq=0
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht_dc = seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    dht_ac = seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xFFDA, b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"
    )


class _Decoder:
    """Canonical-Huffman decode state built from an embedded DHT."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.vals = vals

    def read(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            if self.maxcode[length] >= 0 and code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid Huffman code in entropy stream")


class _BitReader:
    def __init__(self, data: bytes) -> None:
        # un-stuff FF00 → FF once, then serve bits
        out = bytearray()
        i = 0
        while i < len(data):
            b = data[i]
            out.append(b)
            i += 2 if (b == 0xFF and i + 1 < len(data) and data[i + 1] == 0) else 1
        self.data = bytes(out)
        self.pos = 0

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("entropy stream truncated")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(received: int, size: int) -> int:
    return received if received >= (1 << (size - 1)) else received - (1 << size) + 1


def jpeg_decode_gray(payload: bytes):
    """Decode a baseline grayscale JPEG to an (h, w) uint8 array.

    Trusts only the stream: DQT/DHT/SOF0/SOS are parsed from their
    markers (so any conforming single-component baseline file decodes,
    not just this module's own output).  Restart markers, progressive
    scans and multi-component frames are out of scope and raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Decoder] = {}
    huff_ac: dict[int, _Decoder] = {}
    h = w = None
    td = ta = tq = 0
    entropy_at = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        size = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + size]
        if marker == 0xFFDB:
            at = 0
            while at < len(body):
                pq, tq_i = body[at] >> 4, body[at] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int64)
                tbl[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    body[at + 1 : at + 65], dtype=np.uint8
                ).astype(np.int64)
                quant[tq_i] = tbl
                at += 65
        elif marker == 0xFFC0:
            _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError(f"only 1-component baseline, got {ncomp}")
            if body[7] != 0x11:
                raise ValueError("subsampled single component unsupported")
            tq = body[8]
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xFFC4:
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0xF
                bits = list(body[at + 1 : at + 17])
                n = sum(bits)
                vals = list(body[at + 17 : at + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _Decoder(bits, vals)
                at += 17 + n
        elif marker == 0xFFDA:
            if body[0] != 1:
                raise ValueError("only single-scan single-component SOS")
            td, ta = body[2] >> 4, body[2] & 0xF
            entropy_at = pos + 2 + size
            break
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        pos += 2 + size
    if entropy_at is None or h is None:
        raise ValueError("missing SOS/SOF segment")
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    br = _BitReader(payload[entropy_at:end])
    dcd, acd = huff_dc[td], huff_ac[ta]
    q = quant[tq].astype(np.float64)
    bh, bw = -(-h // 8), -(-w // 8)
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.float64)
            size = dcd.read(br)
            diff = _extend(br.bits(size), size) if size else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = acd.read(br)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(br.bits(size), size)
                k += 1
            block = np.zeros((8, 8), dtype=np.float64)
            block[_ZZ_ROWS, _ZZ_COLS] = zz
            pixel = _C.T @ (block * q) @ _C + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pixel
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# MJPEG-in-AVI: the compressed-video container variant.
# ---------------------------------------------------------------------------


def encode_avi_mjpeg(frames_gray, fps: int = 10, quant=QUANT_LUMA) -> bytes:
    """Serialize an (n, h, w) uint8 grayscale frame stack as an MJPEG
    AVI: same RIFF layout as :func:`~real_time_trip_processing_project_spark.
    operators.multimodal.encode_avi_rgb24` but biCompression='MJPG' and
    each '00dc' chunk is an independent baseline JPEG — the real
    compressed-codec shape (every frame self-contained; frame sampling
    still random-access by chunk walk)."""
    fr = np.asarray(frames_gray, dtype=np.uint8)
    if fr.ndim != 3 or fr.shape[0] == 0:
        raise ValueError(f"expected (n, h, w) grayscale frames, got {fr.shape}")
    n, h, w = fr.shape
    jpegs = [jpeg_encode_gray(fr[i], quant) for i in range(n)]
    max_size = max(len(j) for j in jpegs)
    mjpg = struct.unpack("<I", b"MJPG")[0]
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, mjpg, max_size, 0, 0, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, n, max_size, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strl = (
        b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
        + b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
        + b"strf" + struct.pack("<I", len(strf)) + strf
    )
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, max_size * fps, 0, 0x10,
        n, 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    hdrl = (
        b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl))
        + b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    )
    chunks, idx, off = [], [], 4
    for i in range(n):
        j = jpegs[i]
        pad = len(j) & 1
        chunks.append(b"00dc" + struct.pack("<I", len(j)) + j + b"\x00" * pad)
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + pad
    movi_body = b"movi" + b"".join(chunks)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx1 = b"idx1" + struct.pack("<I", 16 * n) + b"".join(idx)
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes, every_nth: int = 1):
    """Parse an MJPEG AVI into [(frame_idx, (h, w) uint8 gray)] for
    every ``every_nth`` frame.  Chunk walk and size validation shared
    with the uncompressed decoder; only SELECTED frames pay the JPEG
    decode (each '00dc' chunk is a self-contained baseline JPEG, so
    sampling needs no keyframe bookkeeping)."""
    from real_time_trip_processing_project_spark.operators.multimodal import (
        avi_raw_frames,
    )

    strf, bodies = avi_raw_frames(payload, every_nth)
    _size, _w, _h, _planes, _bits, compression = strf
    if compression != struct.unpack("<I", b"MJPG")[0]:
        raise ValueError(f"not an MJPEG stream: biCompression={compression}")
    return [(idx, jpeg_decode_gray(body)) for idx, body in bodies]
