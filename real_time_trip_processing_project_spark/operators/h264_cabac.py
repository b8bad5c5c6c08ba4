"""CABAC entropy coding for H.264 Intra_16x16 I slices (spec clause 9.3).

Closes the entropy-coding half of the codec seam the r10 verdict named
(CABAC / inter prediction): the CAVLC tier (``h264_cavlc.py`` /
``h264_intra.py``) gains a second, arithmetic entropy coder over the
IDENTICAL macroblock model — ``h264_intra._analyze_mb_i16`` produces
the quantized levels and the decoder-exact reconstruction, and this
module serializes them with binary arithmetic coding instead of
variable-length tables.  Because both coders share one analysis, a
CABAC-encoded stream decodes to pixels BIT-IDENTICAL to the CAVLC
stream's — the strongest cross-entropy-coder equivalence statement an
encoder/decoder pair can make without an external conformance decoder
(absent from this container), and it is pinned in tests.

Conformance stance, stated precisely:

- The ARITHMETIC ENGINE is the spec's multiplication-free M-coder:
  ``RANGE_TAB_LPS`` / ``TRANS_IDX_LPS`` transcribed from the published
  Tables 9-44/9-45, the 9-bit offset/510-range initialization, the
  renormalization, bypass and terminate paths of 9.3.3.2/9.3.4, and
  the EncodeFlush procedure.  Encoder and decoder share the tables, so
  a transcription slip could affect compression RATE only, never
  decoded values; the entropy-efficiency test bounds that risk.
- SYNTAX structure (binarizations, context index layout, significance
  map + reverse-scan level coding, per-block coded_block_flag,
  end_of_slice_flag via terminate) follows 9.3.2/9.3.3.1 for the
  I-slice elements this tier emits: mb_type (Intra_16x16 rows of
  Table 9-36), intra_chroma_pred_mode, mb_qp_delta, and the residual
  block categories 0 (Intra16x16DC), 1 (Intra16x16AC),
  3 (ChromaDC) and 4 (ChromaAC).
- Context INITIALIZATION is the one documented simplification: every
  context starts at the uniform state ``(pStateIdx=0, valMPS=0)``
  (the spec's (m,n) = (0, 64) row) rather than the per-element
  published init tables.  Initialization is a rate optimization with
  no effect on decodability in a matched encoder/decoder pair —
  contexts adapt within tens of bins — and transcribing ~300
  published (m,n) pairs with no external decoder to validate against
  would create silent-wrongness risk with zero testable benefit.
- No I_PCM fallback in this tier (PCM inside CABAC slices re-inits
  the engine; the CAVLC tier keeps the rate-bound role), and the
  remaining seam is now exactly inter (P/B) prediction.

Reference parity note: the reference pipeline
(Real-Time-Trip-Processing-Project) has no media processing at all —
this is north-star multimodal tier, like the rest of the codec family.

At 100 TB: row-local Arrow-batched work inside ``mapInPandas``
(multimodal.py wires the codec= switch); nothing here shuffles.
"""

from __future__ import annotations

import numpy as np

from real_time_trip_processing_project_spark.operators.h264 import (
    MB,
    BitReader,
    BitWriter,
    ebsp_to_rbsp,
    rbsp_to_ebsp,
)
from real_time_trip_processing_project_spark.operators import h264_intra as HI

# ---------------------------------------------------------------------------
# Arithmetic engine tables (Tables 9-44 / 9-45)

#: rangeTabLPS[pStateIdx][(codIRange >> 6) & 3]
RANGE_TAB_LPS = [
    [128, 176, 208, 240], [128, 167, 197, 227], [128, 158, 187, 216],
    [123, 150, 178, 205], [116, 142, 169, 195], [111, 135, 160, 185],
    [105, 128, 152, 175], [100, 122, 144, 166], [95, 116, 137, 158],
    [90, 110, 130, 150], [85, 104, 123, 142], [81, 99, 117, 135],
    [77, 94, 111, 128], [73, 89, 105, 122], [69, 85, 100, 116],
    [66, 80, 95, 110], [62, 76, 90, 104], [59, 72, 86, 99],
    [56, 69, 81, 94], [53, 65, 77, 89], [51, 62, 73, 85],
    [48, 59, 69, 80], [46, 56, 66, 76], [43, 53, 63, 72],
    [41, 50, 59, 69], [39, 48, 56, 65], [37, 45, 54, 62],
    [35, 43, 51, 59], [33, 41, 48, 56], [32, 39, 46, 53],
    [30, 37, 43, 50], [28, 35, 41, 48], [27, 33, 39, 45],
    [25, 31, 37, 43], [24, 30, 35, 41], [23, 28, 33, 39],
    [22, 27, 32, 37], [21, 26, 30, 35], [20, 24, 29, 33],
    [19, 23, 27, 31], [18, 22, 26, 30], [17, 21, 25, 28],
    [16, 20, 23, 27], [15, 19, 22, 25], [14, 18, 21, 24],
    [14, 17, 20, 23], [13, 16, 19, 22], [12, 15, 18, 21],
    [12, 14, 17, 20], [11, 14, 16, 19], [11, 13, 15, 18],
    [10, 12, 15, 17], [10, 12, 14, 16], [9, 11, 13, 15],
    [9, 11, 12, 14], [8, 10, 12, 14], [8, 9, 11, 13],
    [7, 9, 11, 12], [7, 9, 10, 12], [7, 8, 10, 11],
    [6, 8, 9, 11], [6, 7, 9, 10], [6, 7, 8, 9],
    [2, 2, 2, 2],
]

#: state transition after coding the LPS
TRANS_IDX_LPS = [
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 23, 24, 24,
    26, 26, 27, 27, 29, 29, 30, 30, 32, 32, 33, 33, 35, 35, 36, 36,
    38, 38, 39, 39, 41, 41, 42, 42, 44, 44, 45, 45, 47, 47, 48, 48,
]

#: state transition after coding the MPS
TRANS_IDX_MPS = [min(i + 1, 62) for i in range(63)] + [63]

#: context index space: the I-slice elements this tier uses live in
#: ctxIdx 3..275 of the spec's numbering (kept so the layout matches
#: the spec even though inits are uniform — see module docstring)
N_CTX = 277

# context index layout (spec ctxIdxOffset values)
_CTX_MB_TYPE = 3  # + inc 0..7
_CTX_QP_DELTA = 60  # + inc 0..3
_CTX_CHROMA_MODE = 64  # + inc 0..3
_CTX_CBF = 85  # + 4*cat + inc
_CTX_SIG = 105  # + catBase + inc
_CTX_LAST = 166  # + catBase + inc
_CTX_LEVEL = 227  # + catBase + inc

#: per-category bases inside the sig/last blocks (cats 0..4 hold
#: 15/14/15/3/14 position contexts — 61 total, matching 105..165)
_SIG_CAT_BASE = [0, 15, 29, 44, 47]
#: per-category bases inside the level block (10 contexts each)
_LEV_CAT_BASE = [0, 10, 20, 30, 39]
#: scan length per category (Intra16x16DC, Intra16x16AC, Luma4x4,
#: ChromaDC 4:2:0, ChromaAC)
_CAT_COEFFS = [16, 15, 16, 4, 15]


class CabacEncoder:
    """Arithmetic encoder (9.3.4) writing into a byte-aligned
    :class:`BitWriter` positioned after cabac_alignment_one_bit."""

    def __init__(self, bw: BitWriter) -> None:
        self.bw = bw
        self.state = [0] * N_CTX
        self.mps = [0] * N_CTX
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first_bit = True

    def _put_bit(self, b: int) -> None:
        if self.first_bit:
            self.first_bit = False
        else:
            self.bw.u(b, 1)
        while self.outstanding > 0:
            self.bw.u(1 - b, 1)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low >= 512:
                self._put_bit(1)
                self.low -= 512
            elif self.low < 256:
                self._put_bit(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.low <<= 1
            self.range <<= 1

    def decision(self, ctx: int, b: int) -> None:
        st = self.state[ctx]
        rlps = RANGE_TAB_LPS[st][(self.range >> 6) & 3]
        self.range -= rlps
        if b != self.mps[ctx]:
            self.low += self.range
            self.range = rlps
            if st == 0:
                self.mps[ctx] ^= 1
            self.state[ctx] = TRANS_IDX_LPS[st]
        else:
            self.state[ctx] = TRANS_IDX_MPS[st]
        self._renorm()

    def bypass(self, b: int) -> None:
        self.low <<= 1
        if b:
            self.low += self.range
        if self.low >= 1024:
            self._put_bit(1)
            self.low -= 1024
        elif self.low < 512:
            self._put_bit(0)
        else:
            self.outstanding += 1
            self.low -= 512

    def terminate(self, b: int) -> None:
        """end_of_slice_flag / the I_PCM bin of mb_type (9.3.4.5);
        ``b = 1`` also flushes (9.3.4.6)."""
        self.range -= 2
        if b:
            self.low += self.range
            self.range = 2
            self._renorm()
            self._put_bit((self.low >> 9) & 1)
            self.bw.u(((self.low >> 7) & 3) | 1, 2)
        else:
            self._renorm()


class CabacDecoder:
    """Arithmetic decoder (9.3.3.2) reading RBSP bits from ``bitpos``
    (byte-aligned, after cabac_alignment_one_bit).  Malformed or
    truncated data surfaces as ValueError — the corrupted-stream
    contract the rest of the codec family follows."""

    def __init__(self, data: bytes, bitpos: int) -> None:
        if bitpos & 7:
            raise ValueError("CABAC data must start byte-aligned")
        self.data = data
        self.pos = bitpos
        self.state = [0] * N_CTX
        self.mps = [0] * N_CTX
        self.range = 510
        self.offset = self._bits(9)
        if self.offset >= 510:
            raise ValueError("forbidden CABAC initial offset")

    def _bits(self, n: int) -> int:
        if self.pos + n > 8 * len(self.data):
            raise ValueError("CABAC bitstream exhausted")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def decision(self, ctx: int) -> int:
        st = self.state[ctx]
        rlps = RANGE_TAB_LPS[st][(self.range >> 6) & 3]
        self.range -= rlps
        if self.offset >= self.range:
            b = 1 - self.mps[ctx]
            self.offset -= self.range
            self.range = rlps
            if st == 0:
                self.mps[ctx] ^= 1
            self.state[ctx] = TRANS_IDX_LPS[st]
        else:
            b = self.mps[ctx]
            self.state[ctx] = TRANS_IDX_MPS[st]
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bits(1)
        return b

    def bypass(self) -> int:
        self.offset = (self.offset << 1) | self._bits(1)
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bits(1)
        return 0


# ---------------------------------------------------------------------------
# Binarization helpers


def _enc_eg0(enc: CabacEncoder, v: int) -> None:
    """Exp-Golomb order-0 suffix in bypass bins (the UEG0 tail)."""
    k = 0
    while v >= (1 << k):
        enc.bypass(1)
        v -= 1 << k
        k += 1
    enc.bypass(0)
    for j in reversed(range(k)):
        enc.bypass((v >> j) & 1)


def _dec_eg0_value(dec: CabacDecoder) -> int:
    """Decode the UEG0 suffix: leading ones choose k, then k raw bits."""
    k = 0
    base = 0
    while dec.bypass():
        base += 1 << k
        k += 1
        if k > 30:
            raise ValueError("malformed CABAC Exp-Golomb suffix")
    v = 0
    for _ in range(k):
        v = (v << 1) | dec.bypass()
    return base + v


# ---------------------------------------------------------------------------
# Residual block (9.3.2.7 / 9.3.3.1.3): coded_block_flag, significance
# map in forward scan order, levels + signs in reverse scan order.


def _write_residual(
    enc: CabacEncoder, cat: int, scan: list[int], cbf_inc: int
) -> int:
    """Encode one residual block's coefficient list (forward scan
    order, full length for its category).  Returns the coded_block_flag
    so the caller can update the neighbor context map."""
    n = _CAT_COEFFS[cat]
    nz = [i for i, v in enumerate(scan) if v]
    cbf_ctx = _CTX_CBF + 4 * cat + cbf_inc
    if not nz:
        enc.decision(cbf_ctx, 0)
        return 0
    enc.decision(cbf_ctx, 1)
    last = nz[-1]
    sig_base = _CTX_SIG + _SIG_CAT_BASE[cat]
    last_base = _CTX_LAST + _SIG_CAT_BASE[cat]
    for i in range(n - 1):
        inc = min(i, 2) if cat == 3 else i
        sig = scan[i] != 0
        enc.decision(sig_base + inc, 1 if sig else 0)
        if sig:
            enc.decision(last_base + inc, 1 if i == last else 0)
            if i == last:
                break
    # levels in reverse scan order (numDecodAbsLevel* accumulate)
    eq1 = 0
    gt1 = 0
    lev_base = _CTX_LEVEL + _LEV_CAT_BASE[cat]
    for i in reversed(nz):
        a = abs(scan[i]) - 1
        inc0 = 0 if gt1 else min(4, 1 + eq1)
        if a == 0:
            enc.decision(lev_base + inc0, 0)
            eq1 += 1
        else:
            enc.decision(lev_base + inc0, 1)
            inc_n = 5 + min(4, gt1)
            k = min(a, 14)
            for _ in range(1, k):
                enc.decision(lev_base + inc_n, 1)
            if a < 14:
                enc.decision(lev_base + inc_n, 0)
            else:
                _enc_eg0(enc, a - 14)
            gt1 += 1
        enc.bypass(1 if scan[i] < 0 else 0)
    return 1


def _read_residual(
    dec: CabacDecoder, cat: int, cbf_inc: int
) -> tuple[list[int], int]:
    """Decode one residual block; returns (scan list, coded_block_flag)."""
    n = _CAT_COEFFS[cat]
    scan = [0] * n
    if not dec.decision(_CTX_CBF + 4 * cat + cbf_inc):
        return scan, 0
    sig_base = _CTX_SIG + _SIG_CAT_BASE[cat]
    last_base = _CTX_LAST + _SIG_CAT_BASE[cat]
    sig = [False] * n
    last = n - 1
    found_last = False
    for i in range(n - 1):
        inc = min(i, 2) if cat == 3 else i
        if dec.decision(sig_base + inc):
            sig[i] = True
            if dec.decision(last_base + inc):
                last = i
                found_last = True
                break
    if not found_last:
        sig[n - 1] = True  # implied: coded_block_flag promised >=1 coeff
    eq1 = 0
    gt1 = 0
    lev_base = _CTX_LEVEL + _LEV_CAT_BASE[cat]
    for i in reversed([j for j in range(last + 1) if sig[j]]):
        inc0 = 0 if gt1 else min(4, 1 + eq1)
        if not dec.decision(lev_base + inc0):
            a = 0
            eq1 += 1
        else:
            inc_n = 5 + min(4, gt1)
            a = 1
            while a < 14 and dec.decision(lev_base + inc_n):
                a += 1
            if a == 14:
                a += _dec_eg0_value(dec)
            gt1 += 1
        v = a + 1
        if dec.bypass():
            v = -v
        scan[i] = v
    return scan, 1


# ---------------------------------------------------------------------------
# Neighbor context maps


class _CbfMap:
    """coded_block_flag neighbor map: −1 = unavailable (condTermFlag 1
    for intra MBs, 9.3.3.1.1.9), else the block's coded cbf."""

    def __init__(self, h: int, w: int) -> None:
        self.m = np.full((h, w), -1, dtype=np.int8)

    def inc(self, y: int, x: int) -> int:
        a = self.m[y, x - 1] if x > 0 else -1
        b = self.m[y - 1, x] if y > 0 else -1
        return (0 if a == 0 else 1) + 2 * (0 if b == 0 else 1)

    def set(self, y: int, x: int, v: int) -> None:
        self.m[y, x] = v


class _MbCtx:
    """Per-frame CABAC neighbor state: cbf maps for every residual
    category plus the prev-mb_qp_delta flag."""

    def __init__(self, h_mbs: int, w_mbs: int) -> None:
        self.dc_y = _CbfMap(h_mbs, w_mbs)
        self.ac_y = _CbfMap(4 * h_mbs, 4 * w_mbs)
        self.dc_c = [_CbfMap(h_mbs, w_mbs) for _ in range(2)]
        self.ac_c = [_CbfMap(2 * h_mbs, 2 * w_mbs) for _ in range(2)]
        self.prev_qp_delta_nz = 0


# ---------------------------------------------------------------------------
# Macroblock syntax (Intra_16x16)


def _code_mb_i16(
    coder,
    writing: bool,
    mby: int,
    mbx: int,
    ctx: _MbCtx,
    model: tuple | None,
):
    """Shared encode/decode driver for one Intra_16x16 macroblock's
    CABAC syntax.  When ``writing``, ``model`` holds the analysis
    tuple and the function emits bins; otherwise it reads bins and
    returns ``(mode, cbp_luma, cbp_chroma, qp_delta, dc_levels,
    ac_levels, c_dc, c_ac)`` for reconstruction."""
    if writing:
        (mode, cbp_luma, dc_levels, ac_levels,
         c_dc, c_ac, _c_preds, cbp_chroma, _ry, _rc) = model
        # mb_type: prefix "1" (not I_NxN), terminate 0 (not I_PCM),
        # then cbp-luma flag, cbp-chroma TU, 2 FL pred-mode bins —
        # positional ctxIdxInc 3,4,5,6,7 capped by the bins present
        inc = (1 if mbx > 0 else 0) + (1 if mby > 0 else 0)
        coder.decision(_CTX_MB_TYPE + inc, 1)
        coder.terminate(0)
        coder.decision(_CTX_MB_TYPE + 3, 1 if cbp_luma else 0)
        if cbp_chroma == 0:
            coder.decision(_CTX_MB_TYPE + 4, 0)
            hi = _CTX_MB_TYPE + 5
        else:
            coder.decision(_CTX_MB_TYPE + 4, 1)
            coder.decision(
                _CTX_MB_TYPE + 5, 1 if cbp_chroma == 2 else 0
            )
            hi = _CTX_MB_TYPE + 6
        coder.decision(hi, (mode >> 1) & 1)
        coder.decision(hi + 1, mode & 1)
        # intra_chroma_pred_mode: always DC(0) in this tier; neighbor
        # modes are all 0, so ctxIdxInc is 0
        coder.decision(_CTX_CHROMA_MODE, 0)
        # mb_qp_delta: always 0
        coder.decision(_CTX_QP_DELTA + ctx.prev_qp_delta_nz, 0)
        ctx.prev_qp_delta_nz = 0
    else:
        dec = coder
        inc = (1 if mbx > 0 else 0) + (1 if mby > 0 else 0)
        if not dec.decision(_CTX_MB_TYPE + inc):
            raise ValueError("CABAC I_NxN macroblocks not supported")
        if dec.terminate():
            raise ValueError("CABAC I_PCM macroblocks not supported")
        cbp_luma = 15 if dec.decision(_CTX_MB_TYPE + 3) else 0
        if dec.decision(_CTX_MB_TYPE + 4):
            cbp_chroma = 2 if dec.decision(_CTX_MB_TYPE + 5) else 1
            hi = _CTX_MB_TYPE + 6
        else:
            cbp_chroma = 0
            hi = _CTX_MB_TYPE + 5
        mode = (dec.decision(hi) << 1) | dec.decision(hi + 1)
        if dec.decision(_CTX_CHROMA_MODE):
            raise ValueError(
                "CABAC chroma prediction modes other than DC "
                "not supported"
            )
        # mb_qp_delta (always 0 from this encoder; decode generally)
        qp_delta = 0
        if dec.decision(_CTX_QP_DELTA + ctx.prev_qp_delta_nz):
            k = 1
            while dec.decision(
                _CTX_QP_DELTA + (2 if k == 1 else 3)
            ):
                k += 1
                if k > 104:
                    raise ValueError("mb_qp_delta out of range")
            qp_delta = (k + 1) // 2 if k & 1 else -(k // 2)
        ctx.prev_qp_delta_nz = 1 if qp_delta else 0

    # --- residuals, in the CAVLC tier's block order
    by0, bx0 = 4 * mby, 4 * mbx
    if writing:
        cbf = _write_residual(
            coder, 0, HI._zigzag_read(dc_levels), ctx.dc_y.inc(mby, mbx)
        )
        ctx.dc_y.set(mby, mbx, cbf)
        for blk in range(16):
            x, y = HI._BLK_XY[blk]
            by, bx = by0 + y, bx0 + x
            if cbp_luma:
                scan = HI._zigzag_read(ac_levels[y, x])[1:]
                cbf = _write_residual(
                    coder, 1, scan, ctx.ac_y.inc(by, bx)
                )
            else:
                cbf = 0
            ctx.ac_y.set(by, bx, cbf)
        for comp in range(2):
            if cbp_chroma >= 1:
                d = c_dc[comp]
                scan = [int(d[0, 0]), int(d[0, 1]), int(d[1, 0]),
                        int(d[1, 1])]
                cbf = _write_residual(
                    coder, 3, scan, ctx.dc_c[comp].inc(mby, mbx)
                )
            else:
                cbf = 0
            ctx.dc_c[comp].set(mby, mbx, cbf)
        for comp in range(2):
            for blk in range(4):
                x, y = blk % 2, blk // 2
                by, bx = 2 * mby + y, 2 * mbx + x
                if cbp_chroma == 2:
                    scan = HI._zigzag_read(c_ac[comp][y, x])[1:]
                    cbf = _write_residual(
                        coder, 4, scan, ctx.ac_c[comp].inc(by, bx)
                    )
                else:
                    cbf = 0
                ctx.ac_c[comp].set(by, bx, cbf)
        return None

    dec = coder
    dc_scan, cbf = _read_residual(dec, 0, ctx.dc_y.inc(mby, mbx))
    ctx.dc_y.set(mby, mbx, cbf)
    dc_levels = HI._zigzag_write(dc_scan)
    ac_levels = np.zeros((4, 4, 4, 4), dtype=np.int64)
    for blk in range(16):
        x, y = HI._BLK_XY[blk]
        by, bx = by0 + y, bx0 + x
        if cbp_luma:
            scan, cbf = _read_residual(dec, 1, ctx.ac_y.inc(by, bx))
            ac_levels[y, x] = HI._zigzag_write([0] + scan)
        else:
            cbf = 0
        ctx.ac_y.set(by, bx, cbf)
    c_dc = [np.zeros((2, 2), dtype=np.int64) for _ in range(2)]
    for comp in range(2):
        if cbp_chroma >= 1:
            scan, cbf = _read_residual(
                dec, 3, ctx.dc_c[comp].inc(mby, mbx)
            )
            c_dc[comp] = np.array(
                [[scan[0], scan[1]], [scan[2], scan[3]]], dtype=np.int64
            )
        else:
            cbf = 0
        ctx.dc_c[comp].set(mby, mbx, cbf)
    c_ac = [np.zeros((2, 2, 4, 4), dtype=np.int64) for _ in range(2)]
    for comp in range(2):
        for blk in range(4):
            x, y = blk % 2, blk // 2
            by, bx = 2 * mby + y, 2 * mbx + x
            if cbp_chroma == 2:
                scan, cbf = _read_residual(
                    dec, 4, ctx.ac_c[comp].inc(by, bx)
                )
                c_ac[comp][y, x] = HI._zigzag_write([0] + scan)
            else:
                cbf = 0
            ctx.ac_c[comp].set(by, bx, cbf)
    return mode, cbp_luma, cbp_chroma, qp_delta, dc_levels, ac_levels, \
        c_dc, c_ac


# ---------------------------------------------------------------------------
# Slice-level codec


def encode_idr_frame_i16_cabac(
    frame: np.ndarray, qp: int = 26, idr_pic_id: int = 0
) -> bytes:
    """One IDR NAL of Intra_16x16 macroblocks, CABAC entropy-coded.
    Identical slice header to the CAVLC tier (Exp-Golomb — headers are
    never CABAC'd), then cabac_alignment_one_bit and the arithmetic
    slice data with per-MB end_of_slice_flag.  Shares
    :func:`h264_intra._analyze_mb_i16` with the CAVLC writer, so the
    decoded pixels are bit-identical across entropy coders."""
    frame = np.asarray(frame)
    h, w = frame.shape
    if h % MB or w % MB:
        raise ValueError("frame dimensions must be multiples of 16")
    if frame.dtype != np.uint8:
        raise ValueError("frame must be uint8")
    HI._check_qp(qp)
    h_mbs, w_mbs = h // MB, w // MB

    recon_y = np.zeros((h, w), dtype=np.uint8)
    src_c = [np.full((h // 2, w // 2), 128, dtype=np.uint8)] * 2
    recon_c = [np.zeros((h // 2, w // 2), dtype=np.uint8) for _ in range(2)]

    bw = BitWriter()
    bw.ue(0)  # first_mb_in_slice
    bw.ue(7)  # slice_type 7: I
    bw.ue(0)  # pic_parameter_set_id
    bw.u(0, 4)  # frame_num
    bw.ue(idr_pic_id)
    bw.u(0, 1)  # no_output_of_prior_pics_flag
    bw.u(0, 1)  # long_term_reference_flag
    bw.se(qp - 26)  # slice_qp_delta
    bw.ue(1)  # disable_deblocking_filter_idc: filter off
    # cabac_alignment_one_bit
    while bw.bit_position % 8:
        bw.u(1, 1)

    enc = CabacEncoder(bw)
    ctx = _MbCtx(h_mbs, w_mbs)
    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            model = HI._analyze_mb_i16(
                frame, recon_y, src_c, recon_c, mby, mbx, qp
            )
            _code_mb_i16(enc, True, mby, mbx, ctx, model)
            rec_y, rec_c = model[8], model[9]
            recon_y[
                mby * MB : (mby + 1) * MB, mbx * MB : (mbx + 1) * MB
            ] = rec_y
            for comp in range(2):
                recon_c[comp][
                    mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8
                ] = rec_c[comp]
            last = mby == h_mbs - 1 and mbx == w_mbs - 1
            enc.terminate(1 if last else 0)
    bw.align_zero()  # flush's trailing 1 is the rbsp stop bit
    return b"\x65" + rbsp_to_ebsp(bw.getvalue())


def decode_idr_frame_cabac(nal: bytes, sps: dict, pps: dict) -> np.ndarray:
    """Decode a CABAC Intra_16x16 IDR slice; returns the luma plane.
    The normative inverse of :func:`encode_idr_frame_i16_cabac` —
    same contract as ``h264_intra.decode_idr_frame_auto``."""
    if not nal or nal[0] & 0x1F != 5:
        raise ValueError("not an IDR slice NAL")
    rbsp = ebsp_to_rbsp(nal[1:])
    r = BitReader(rbsp)
    if r.ue() != 0:
        raise ValueError("first_mb_in_slice != 0")
    if r.ue() % 5 != 2:
        raise ValueError("not an I slice")
    r.ue()  # pic_parameter_set_id
    r.u(sps["log2_max_frame_num"])
    r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        raise ValueError("poc_type 0 slice headers not supported")
    r.u(2)  # dec_ref_pic_marking
    qp = 26 + r.se()
    HI._check_qp(qp)
    if pps.get("deblocking_control"):
        idc = r.ue()
        if idc != 1:
            r.se()
            r.se()
    # cabac_alignment_one_bit(s)
    while r.pos % 8:
        if r.u(1) != 1:
            raise ValueError("bad cabac_alignment bit")
    dec = CabacDecoder(rbsp, r.pos)

    h, w = sps["height"], sps["width"]
    h_mbs, w_mbs = h // MB, w // MB
    recon_y = np.zeros((h, w), dtype=np.uint8)
    recon_c = [np.zeros((h // 2, w // 2), dtype=np.uint8) for _ in range(2)]
    ctx = _MbCtx(h_mbs, w_mbs)
    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            (mode, cbp_luma, cbp_chroma, qp_delta,
             dc_levels, ac_levels, c_dc, c_ac) = _code_mb_i16(
                dec, False, mby, mbx, ctx, None
            )
            qp += qp_delta
            HI._check_qp(qp)
            qpc = HI.chroma_qp(qp)
            y0, x0 = mby * MB, mbx * MB
            pred = HI.predict_i16(recon_y, y0, x0, mode)
            dc_deq = HI.luma_dc_inv(dc_levels, qp)
            for by in range(4):
                for bx in range(4):
                    d = (
                        HI.dequant4x4(ac_levels[by, bx], qp)
                        if cbp_luma
                        else np.zeros((4, 4), dtype=np.int64)
                    )
                    d[0, 0] = dc_deq[by, bx]
                    rblk = HI.inv4x4(d)
                    recon_y[
                        y0 + 4 * by : y0 + 4 * by + 4,
                        x0 + 4 * bx : x0 + 4 * bx + 4,
                    ] = np.clip(
                        pred[4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4]
                        + rblk,
                        0,
                        255,
                    )
            cy0, cx0 = mby * 8, mbx * 8
            c_preds = [
                HI.predict_chroma(recon_c[comp], cy0, cx0, 0)
                for comp in range(2)
            ]
            rec_c = HI._chroma_recon(c_dc, c_ac, c_preds, cbp_chroma, qpc)
            for comp in range(2):
                recon_c[comp][cy0 : cy0 + 8, cx0 : cx0 + 8] = rec_c[comp]
            eos = dec.terminate()
            last = mby == h_mbs - 1 and mbx == w_mbs - 1
            if eos != (1 if last else 0):
                raise ValueError("end_of_slice_flag out of place")
    return recon_y
