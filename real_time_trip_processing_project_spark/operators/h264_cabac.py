"""CABAC entropy coding for H.264 baseline-intra I slices (clause 9.3).

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
  I-slice elements this tier emits: mb_type (the I_NxN and
  Intra_16x16 rows of Table 9-36, with the terminate-coded I_PCM
  bin), prev/rem_intra4x4_pred_mode, intra_chroma_pred_mode, the six
  coded_block_pattern bins with their neighbor contexts, mb_qp_delta,
  and the residual block categories 0 (Intra16x16DC),
  1 (Intra16x16AC), 2 (Luma4x4), 3 (ChromaDC) and 4 (ChromaAC).
  Mode decision between I_NxN and Intra_16x16 runs per macroblock at
  exact arithmetic-coder bit cost from the live engine/context state
  (:func:`_trial_bits`) — the CABAC analogue of the CAVLC tier's
  recorder-bits decision, greedy per-MB like it.
- Context INITIALIZATION is the one documented simplification: every
  context starts at the uniform state ``(pStateIdx=0, valMPS=0)``
  (the spec's (m,n) = (0, 64) row) rather than the per-element
  published init tables.  Initialization is a rate optimization with
  no effect on decodability in a matched encoder/decoder pair —
  contexts adapt within tens of bins — and transcribing ~300
  published (m,n) pairs with no external decoder to validate against
  would create silent-wrongness risk with zero testable benefit.
- **P slices** (bottom of this module): mb_skip_flag bins with
  not-skipped neighbor contexts, the P_L0_16x16 mb_type prefix, mvd
  under the UEG3 binarization with |mvd|-sum contexts, and the same
  CBP/residual machinery — sharing h264_inter.py's motion search,
  predictors and analysis, so CABAC P streams decode to pixels
  bit-identical to CAVLC P streams (pinned in tests).
- **B slices** (r12, bottom of this module): the Table 9-37 B mb_type
  binarization (direct '0' + the coded 16x16 types), per-list UEG3
  mvd with PER-LIST |mvd|-sum neighbor contexts, B-slice mb_skip_flag
  contexts (skip = spatial/temporal direct per the slice header, no
  residual), the pred_weight_table + 8.4.2.3.2 weighted forms —
  sharing h264_b.py's predictors, direct derivations, weight
  estimation, SAD mode decision and analysis, so CABAC B GOPs
  (``codec="i16pb_cabac"``) decode to pixels bit-identical to CAVLC B
  GOPs (pinned in tests).
- No I_PCM fallback in this tier (PCM inside CABAC slices re-inits
  the engine; the CAVLC tier keeps the rate-bound role).  The
  remaining CABAC seams are I_PCM, sub-16x16 partition types, and
  B_Skip/B_Direct.

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
    POC_LSB_BITS as H_POC_LSB_BITS,
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
_CTX_I4_PREV = 68  # prev_intra4x4_pred_mode_flag
_CTX_I4_REM = 69  # rem_intra4x4_pred_mode (all 3 FL bins)
_CTX_CBP_LUMA = 73  # + inc 0..3
_CTX_CBP_CHROMA = 77  # + inc 0..3 (bin 0), + 4 + inc (bin 1)
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


def _enc_eg0(enc: CabacEncoder, v: int, k: int = 0) -> None:
    """Exp-Golomb order-``k`` suffix in bypass bins (the UEGk tail —
    k=0 for coefficient levels, k=3 for mvd)."""
    while v >= (1 << k):
        enc.bypass(1)
        v -= 1 << k
        k += 1
    enc.bypass(0)
    for j in reversed(range(k)):
        enc.bypass((v >> j) & 1)


def _dec_eg0_value(dec: CabacDecoder, k: int = 0) -> int:
    """Decode the UEGk suffix: leading ones grow k, then k raw bits."""
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
    category, the mb_type / coded_block_pattern neighbor maps, and the
    prev-mb_qp_delta flag."""

    def __init__(self, h_mbs: int, w_mbs: int) -> None:
        self.h_mbs, self.w_mbs = h_mbs, w_mbs
        self.dc_y = _CbfMap(h_mbs, w_mbs)
        self.ac_y = _CbfMap(4 * h_mbs, 4 * w_mbs)
        self.dc_c = [_CbfMap(h_mbs, w_mbs) for _ in range(2)]
        self.ac_c = [_CbfMap(2 * h_mbs, 2 * w_mbs) for _ in range(2)]
        #: 1 = coded I_NxN, 0 = coded Intra_16x16, -1 = not coded yet
        self.is_nxn = np.full((h_mbs, w_mbs), -1, dtype=np.int8)
        #: per-8x8-block luma cbp bit (for the cbp-luma bin contexts)
        self.cbp8 = np.zeros((2 * h_mbs, 2 * w_mbs), dtype=np.int8)
        #: per-MB chroma cbp value 0/1/2
        self.cbpc = np.zeros((h_mbs, w_mbs), dtype=np.int8)
        self.prev_qp_delta_nz = 0

    def clone(self) -> "_MbCtx":
        """Deep copy for exact-bit mode-decision trials."""
        c = _MbCtx.__new__(_MbCtx)
        c.h_mbs, c.w_mbs = self.h_mbs, self.w_mbs
        for name in ("dc_y", "ac_y"):
            m = _CbfMap.__new__(_CbfMap)
            m.m = getattr(self, name).m.copy()
            setattr(c, name, m)
        for name in ("dc_c", "ac_c"):
            lst = []
            for src in getattr(self, name):
                m = _CbfMap.__new__(_CbfMap)
                m.m = src.m.copy()
                lst.append(m)
            setattr(c, name, lst)
        c.is_nxn = self.is_nxn.copy()
        c.cbp8 = self.cbp8.copy()
        c.cbpc = self.cbpc.copy()
        c.prev_qp_delta_nz = self.prev_qp_delta_nz
        return c

    def mb_type_inc(self, mby: int, mbx: int) -> int:
        """ctxIdxInc for the first mb_type bin: condTermFlagN = 1 when
        the neighbor is available and NOT coded as I_NxN."""
        a = self.is_nxn[mby, mbx - 1] if mbx > 0 else -1
        b = self.is_nxn[mby - 1, mbx] if mby > 0 else -1
        return (1 if a == 0 else 0) + (1 if b == 0 else 0)

    def cbp_luma_inc(self, mby: int, mbx: int, g: int,
                     pending: dict) -> int:
        """ctxIdxInc for cbp-luma bin ``g``: condTermFlagN = 1 when the
        neighboring 8x8 block exists and its cbp bit is 0 (within-MB
        neighbors come from ``pending``, the bits coded so far)."""
        gy, gx = 2 * mby + g // 2, 2 * mbx + g % 2

        def bit(y, x):
            if y < 0 or x < 0:
                return -1
            if (y, x) in pending:
                return pending[(y, x)]
            if y // 2 == mby and x // 2 == mbx:
                return -1  # this MB, not yet coded
            return int(self.cbp8[y, x])

        a = bit(gy, gx - 1)
        b = bit(gy - 1, gx)
        return (1 if a == 0 else 0) + 2 * (1 if b == 0 else 0)

    def cbp_chroma_inc(self, mby: int, mbx: int, bin1: bool) -> int:
        a = self.cbpc[mby, mbx - 1] if mbx > 0 else 0
        b = self.cbpc[mby - 1, mbx] if mby > 0 else 0
        if bin1:
            return 4 + (1 if a == 2 else 0) + 2 * (1 if b == 2 else 0)
        return (1 if a != 0 else 0) + 2 * (1 if b != 0 else 0)

    def commit_mb(self, mby: int, mbx: int, is_nxn: int,
                  cbp_luma_bits: int, cbp_chroma: int) -> None:
        self.is_nxn[mby, mbx] = is_nxn
        for g in range(4):
            self.cbp8[2 * mby + g // 2, 2 * mbx + g % 2] = (
                (cbp_luma_bits >> g) & 1
            )
        self.cbpc[mby, mbx] = cbp_chroma


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
        # mb_type suffix (the "1" prefix bin + I_PCM terminate are the
        # frame loop's): cbp-luma flag, cbp-chroma TU, 2 FL pred-mode
        # bins — positional ctxIdxInc 3,4,5,6,7 capped by bins present
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
        ctx.commit_mb(mby, mbx, 0, 15 if cbp_luma else 0, cbp_chroma)
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
    ctx.commit_mb(mby, mbx, 0, cbp_luma, cbp_chroma)
    return mode, cbp_luma, cbp_chroma, qp_delta, dc_levels, ac_levels, \
        c_dc, c_ac


def _code_mb_i4(
    coder,
    writing: bool,
    mby: int,
    mbx: int,
    ctx: _MbCtx,
    model: tuple | None,
):
    """Shared encode/decode driver for one I_NxN (Intra_4x4)
    macroblock's CABAC syntax (the "0" mb_type prefix bin is the frame
    loop's): per-4x4 prev/rem pred-mode bins, intra_chroma_pred_mode,
    the six coded_block_pattern bins with their neighbor contexts,
    mb_qp_delta when cbp != 0, and category-2 luma residuals.  When
    reading, returns ``(flags, rems, cbp_luma_bits, cbp_chroma,
    qp_delta, levels16, c_dc, c_ac)`` — the caller derives the actual
    prediction modes from flags/rems via the MPM overlay."""
    if writing:
        (modes, flags, rems, levels16, cbp,
         c_dc, c_ac, _c_preds, cbp_chroma, _ry, _rc) = model
        cbp_luma_bits = cbp & 0xF
        for blk in range(16):
            if flags[blk]:
                coder.decision(_CTX_I4_PREV, 1)
            else:
                coder.decision(_CTX_I4_PREV, 0)
                rem = int(rems[blk])
                for j in range(3):  # 3 FL bins, LSB first (spec order)
                    coder.decision(_CTX_I4_REM, (rem >> j) & 1)
        coder.decision(_CTX_CHROMA_MODE, 0)  # DC chroma, nbr inc 0
        pending: dict = {}
        for g in range(4):
            bit = (cbp_luma_bits >> g) & 1
            coder.decision(
                _CTX_CBP_LUMA + ctx.cbp_luma_inc(mby, mbx, g, pending),
                bit,
            )
            pending[(2 * mby + g // 2, 2 * mbx + g % 2)] = bit
        coder.decision(
            _CTX_CBP_CHROMA + ctx.cbp_chroma_inc(mby, mbx, False),
            1 if cbp_chroma > 0 else 0,
        )
        if cbp_chroma > 0:
            coder.decision(
                _CTX_CBP_CHROMA + ctx.cbp_chroma_inc(mby, mbx, True),
                1 if cbp_chroma == 2 else 0,
            )
        if cbp:
            coder.decision(_CTX_QP_DELTA + ctx.prev_qp_delta_nz, 0)
        ctx.prev_qp_delta_nz = 0
    else:
        dec = coder
        flags = []
        rems = []
        for _blk in range(16):
            if dec.decision(_CTX_I4_PREV):
                flags.append(1)
                rems.append(None)
            else:
                flags.append(0)
                rem = 0
                for j in range(3):
                    rem |= dec.decision(_CTX_I4_REM) << j
                if rem > 7:
                    raise ValueError("rem_intra4x4_pred_mode out of range")
                rems.append(rem)
        if dec.decision(_CTX_CHROMA_MODE):
            raise ValueError(
                "CABAC chroma prediction modes other than DC not "
                "supported"
            )
        cbp_luma_bits = 0
        pending = {}
        for g in range(4):
            bit = dec.decision(
                _CTX_CBP_LUMA + ctx.cbp_luma_inc(mby, mbx, g, pending)
            )
            cbp_luma_bits |= bit << g
            pending[(2 * mby + g // 2, 2 * mbx + g % 2)] = bit
        cbp_chroma = 0
        if dec.decision(
            _CTX_CBP_CHROMA + ctx.cbp_chroma_inc(mby, mbx, False)
        ):
            cbp_chroma = 2 if dec.decision(
                _CTX_CBP_CHROMA + ctx.cbp_chroma_inc(mby, mbx, True)
            ) else 1
        qp_delta = 0
        if cbp_luma_bits or cbp_chroma:
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

    # --- residuals: 16 luma 4x4 blocks (category 2) in coding order,
    # then the shared chroma tail
    by0, bx0 = 4 * mby, 4 * mbx
    if writing:
        for blk in range(16):
            x, y = HI._BLK_XY[blk]
            by, bx = by0 + y, bx0 + x
            if cbp_luma_bits & (1 << (blk // 4)):
                scan = HI._zigzag_read(levels16[blk].reshape(4, 4))
                cbf = _write_residual(
                    coder, 2, scan, ctx.ac_y.inc(by, bx)
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
        # the luma-DC cbf map records "no separate DC block" for I_NxN
        ctx.dc_y.set(mby, mbx, 0)
        ctx.commit_mb(mby, mbx, 1, cbp_luma_bits, cbp_chroma)
        return None

    dec = coder
    levels16 = np.zeros((16, 4, 4), dtype=np.int64)
    for blk in range(16):
        x, y = HI._BLK_XY[blk]
        by, bx = by0 + y, bx0 + x
        if cbp_luma_bits & (1 << (blk // 4)):
            scan, cbf = _read_residual(dec, 2, ctx.ac_y.inc(by, bx))
            levels16[blk] = HI._zigzag_write(scan)
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
    ctx.dc_y.set(mby, mbx, 0)
    ctx.commit_mb(mby, mbx, 1, cbp_luma_bits, cbp_chroma)
    return flags, rems, cbp_luma_bits, cbp_chroma, qp_delta, levels16, \
        c_dc, c_ac


class _BitCount:
    """Bit sink for exact-bit mode-decision trials: counts instead of
    storing (the CabacEncoder's writer interface)."""

    def __init__(self) -> None:
        self.nbits = 0

    def u(self, _value: int, nbits: int) -> None:
        self.nbits += nbits


def _trial_bits(enc: CabacEncoder, ctx: _MbCtx, fn) -> float:
    """CABAC bit cost of encoding ``fn(trial_enc, trial_ctx)`` from the
    CURRENT engine/context state, without mutating either — the
    arithmetic-coder analogue of the CAVLC tier's _Recorder.nbits mode
    decision.  Counts emitted + outstanding bits plus the FRACTIONAL
    information still held in the range register
    (log2(range_start/range_end) — comparable across trials from the
    same start state; without it sub-bit differences are invisible).
    Still greedy per-MB: the winning type changes the reconstruction
    and context trail later MBs see, so the decision is locally, not
    globally, optimal — same property as the CAVLC tier."""
    import math

    t = CabacEncoder.__new__(CabacEncoder)
    t.bw = _BitCount()
    t.state = list(enc.state)
    t.mps = list(enc.mps)
    t.low = enc.low
    t.range = enc.range
    t.outstanding = enc.outstanding
    t.first_bit = enc.first_bit
    fn(t, ctx.clone())
    return (
        t.bw.nbits
        + (t.outstanding - enc.outstanding)
        + math.log2(enc.range / t.range)
    )


# ---------------------------------------------------------------------------
# Slice-level codec


def encode_idr_frame_i16_cabac(
    frame: np.ndarray, qp: int = 26, idr_pic_id: int = 0
) -> bytes:
    """One IDR NAL of Intra_16x16 macroblocks, CABAC entropy-coded —
    :func:`encode_idr_frame_cabac` with the Intra_4x4 trial disabled
    (the CABAC twin of ``h264_intra.encode_idr_frame_i16``)."""
    return encode_idr_frame_cabac(frame, qp, idr_pic_id, allow_i4=False)


def encode_idr_frame_intra_cabac(
    frame: np.ndarray, qp: int = 26, idr_pic_id: int = 0
) -> bytes:
    """Full baseline intra under CABAC: per macroblock the encoder
    trial-codes I_NxN (nine directional modes, MPM signaling) AND
    Intra_16x16 at EXACT arithmetic-coder bit cost from the live
    engine/context state (:func:`_trial_bits`) and keeps the cheaper —
    the CABAC twin of ``h264_intra.encode_idr_frame_intra`` (which
    decides by CAVLC recorder bits).  No I_PCM fallback in this tier
    (PCM inside CABAC slices re-initializes the engine; the CAVLC tier
    keeps the rate-bound role)."""
    return encode_idr_frame_cabac(frame, qp, idr_pic_id, allow_i4=True)


def encode_idr_frame_cabac(
    frame: np.ndarray,
    qp: int = 26,
    idr_pic_id: int = 0,
    allow_i4: bool = False,
    return_recon: bool = False,
    poc_lsb: int | None = None,
):
    """One IDR NAL of Intra_16x16 (and, with ``allow_i4``, Intra_4x4)
    macroblocks, CABAC entropy-coded.  Identical slice header to the
    CAVLC tier (Exp-Golomb — headers are never CABAC'd), then
    cabac_alignment_one_bit and the arithmetic slice data with per-MB
    end_of_slice_flag.  Shares ``_analyze_mb_i16``/``_analyze_mb_i4``
    with the CAVLC writers, so for a FIXED mb-type choice the decoded
    pixels are bit-identical across entropy coders (pinned in tests
    for the pure-I16 tier, where the choice is degenerate)."""
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
    if poc_lsb is not None:  # poc_type-0 SPS (the B tier)
        bw.u(poc_lsb, H_POC_LSB_BITS)
    bw.u(0, 1)  # no_output_of_prior_pics_flag
    bw.u(0, 1)  # long_term_reference_flag
    bw.se(qp - 26)  # slice_qp_delta
    bw.ue(1)  # disable_deblocking_filter_idc: filter off
    # cabac_alignment_one_bit
    while bw.bit_position % 8:
        bw.u(1, 1)

    enc = CabacEncoder(bw)
    ctx = _MbCtx(h_mbs, w_mbs)
    i4_modes = np.full((h_mbs * 4, w_mbs * 4), -1, dtype=np.int64)
    decoded4 = np.zeros((h_mbs * 4, w_mbs * 4), dtype=bool)
    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            model16 = HI._analyze_mb_i16(
                frame, recon_y, src_c, recon_c, mby, mbx, qp
            )
            inc = ctx.mb_type_inc(mby, mbx)
            use_i4 = False
            if allow_i4:
                model4 = HI._analyze_mb_i4(
                    frame, recon_y, src_c, recon_c, mby, mbx, qp,
                    i4_modes, decoded4,
                )

                def _enc16(t, c):
                    t.decision(_CTX_MB_TYPE + inc, 1)
                    t.terminate(0)
                    _code_mb_i16(t, True, mby, mbx, c, model16)

                def _enc4(t, c):
                    t.decision(_CTX_MB_TYPE + inc, 0)
                    _code_mb_i4(t, True, mby, mbx, c, model4)

                # exact-bit mode decision; ties go to Intra_16x16
                use_i4 = _trial_bits(enc, ctx, _enc4) < _trial_bits(
                    enc, ctx, _enc16
                )
            y4, x4 = 4 * mby, 4 * mbx
            if use_i4:
                enc.decision(_CTX_MB_TYPE + inc, 0)
                _code_mb_i4(enc, True, mby, mbx, ctx, model4)
                rec_y, rec_c = model4[9], model4[10]
                for blk in range(16):
                    bx_, by_ = HI._BLK_XY[blk]
                    i4_modes[y4 + by_, x4 + bx_] = model4[0][blk]
            else:
                enc.decision(_CTX_MB_TYPE + inc, 1)
                enc.terminate(0)  # not I_PCM
                _code_mb_i16(enc, True, mby, mbx, ctx, model16)
                rec_y, rec_c = model16[8], model16[9]
                i4_modes[y4 : y4 + 4, x4 : x4 + 4] = -1
            recon_y[
                mby * MB : (mby + 1) * MB, mbx * MB : (mbx + 1) * MB
            ] = rec_y
            for comp in range(2):
                recon_c[comp][
                    mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8
                ] = rec_c[comp]
            decoded4[y4 : y4 + 4, x4 : x4 + 4] = True
            last = mby == h_mbs - 1 and mbx == w_mbs - 1
            enc.terminate(1 if last else 0)
    bw.align_zero()  # flush's trailing 1 is the rbsp stop bit
    nal = b"\x65" + rbsp_to_ebsp(bw.getvalue())
    if return_recon:
        return nal, recon_y, recon_c
    return nal


def decode_idr_frame_cabac(
    nal: bytes, sps: dict, pps: dict, return_chroma: bool = False
):
    """Decode a CABAC baseline-intra IDR slice; returns the luma plane
    (plus chroma when ``return_chroma`` — the inter tier's reference
    picture).  The normative inverse of :func:`encode_idr_frame_cabac`
    — same contract as ``h264_intra.decode_idr_frame_auto``."""
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
    if sps["poc_type"] == 0:  # the B tier's SPS
        r.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
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
    w4 = w_mbs * 4
    recon_y = np.zeros((h, w), dtype=np.uint8)
    recon_c = [np.zeros((h // 2, w // 2), dtype=np.uint8) for _ in range(2)]
    ctx = _MbCtx(h_mbs, w_mbs)
    i4_modes = np.full((h_mbs * 4, w_mbs * 4), -1, dtype=np.int64)
    decoded4 = np.zeros((h_mbs * 4, w_mbs * 4), dtype=bool)
    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            y0, x0 = mby * MB, mbx * MB
            y4, x4 = 4 * mby, 4 * mbx
            cy0, cx0 = mby * 8, mbx * 8
            if not dec.decision(_CTX_MB_TYPE + ctx.mb_type_inc(mby, mbx)):
                # --- I_NxN
                (flags, rems, cbp_luma_bits, cbp_chroma, qp_delta,
                 levels16, c_dc, c_ac) = _code_mb_i4(
                    dec, False, mby, mbx, ctx, None
                )
                qp += qp_delta
                HI._check_qp(qp)
                qpc = HI.chroma_qp(qp)
                modes16 = np.full(16, -1, dtype=np.int64)
                for blk in range(16):
                    pm = HI._i4_pred_mode_overlay(
                        i4_modes, modes16, blk, mby, mbx
                    )
                    if flags[blk]:
                        modes16[blk] = pm
                    else:
                        rem = rems[blk]
                        modes16[blk] = rem if rem < pm else rem + 1
                for blk in range(16):
                    bx_, by_ = HI._BLK_XY[blk]
                    by4, bx4 = y4 + by_, x4 + bx_
                    py, px = 4 * by4, 4 * bx4
                    left_ok = bx4 > 0
                    top_ok = by4 > 0
                    tr_ok = (
                        top_ok
                        and bx4 + 1 < w4
                        and bool(decoded4[by4 - 1, bx4 + 1])
                    )
                    pred4 = HI.predict_i4(
                        recon_y, py, px, int(modes16[blk]),
                        left_ok, top_ok, tr_ok,
                    )
                    r4 = (
                        HI.inv4x4(HI.dequant4x4(levels16[blk], qp))
                        if cbp_luma_bits & (1 << (blk // 4))
                        else np.zeros((4, 4), dtype=np.int64)
                    )
                    recon_y[py : py + 4, px : px + 4] = np.clip(
                        pred4 + r4, 0, 255
                    )
                    decoded4[by4, bx4] = True
                    i4_modes[by4, bx4] = modes16[blk]
                c_preds = [
                    HI.predict_chroma(recon_c[comp], cy0, cx0, 0)
                    for comp in range(2)
                ]
                rec_c = HI._chroma_recon(
                    c_dc, c_ac, c_preds, cbp_chroma, qpc
                )
                for comp in range(2):
                    recon_c[comp][cy0 : cy0 + 8, cx0 : cx0 + 8] = rec_c[
                        comp
                    ]
            else:
                if dec.terminate():
                    raise ValueError(
                        "CABAC I_PCM macroblocks not supported"
                    )
                (mode, cbp_luma, cbp_chroma, qp_delta,
                 dc_levels, ac_levels, c_dc, c_ac) = _code_mb_i16(
                    dec, False, mby, mbx, ctx, None
                )
                qp += qp_delta
                HI._check_qp(qp)
                qpc = HI.chroma_qp(qp)
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
                c_preds = [
                    HI.predict_chroma(recon_c[comp], cy0, cx0, 0)
                    for comp in range(2)
                ]
                rec_c = HI._chroma_recon(
                    c_dc, c_ac, c_preds, cbp_chroma, qpc
                )
                for comp in range(2):
                    recon_c[comp][cy0 : cy0 + 8, cx0 : cx0 + 8] = rec_c[
                        comp
                    ]
                i4_modes[y4 : y4 + 4, x4 : x4 + 4] = -1
                decoded4[y4 : y4 + 4, x4 : x4 + 4] = True
            eos = dec.terminate()
            last = mby == h_mbs - 1 and mbx == w_mbs - 1
            if eos != (1 if last else 0):
                raise ValueError("end_of_slice_flag out of place")
    if return_chroma:
        return recon_y, recon_c
    return recon_y


# ---------------------------------------------------------------------------
# P slices under CABAC (r11): the arithmetic twin of h264_inter.py —
# mb_skip_flag bins instead of mb_skip_run, mb_type P prefix bins, mvd
# with the UEG3 binarization and |mvd|-sum neighbor contexts, the same
# six-bin CBP coding as I_NxN, and category-2 luma residuals.  The
# MOTION/ANALYSIS layer is h264_inter's verbatim (shared _analyze_mb_p,
# _search_mv, predictor and P_Skip rules), so a CABAC P stream decodes
# to pixels bit-identical to the CAVLC P stream for the same mb/mv
# choices.

_CTX_MB_SKIP = 11  # + inc 0..2 (P slices)
_CTX_MB_TYPE_P = 14  # prefix bins 14/15/16 (P_L0_16x16 = "000")
_CTX_MVD_X = 40  # + inc (b0: 0..2 by |mvd| sum; b1..: 3,4,5,6)
_CTX_MVD_Y = 47


def _mvd_inc0(amvd_sum: int) -> int:
    if amvd_sum < 3:
        return 0
    if amvd_sum <= 32:
        return 1
    return 2


def _code_mvd(coder, writing: bool, base: int, inc0: int, mvd: int = 0):
    """mvd component: TU(uCoff=9) prefix ctx-coded, EG3 bypass suffix,
    bypass sign (9.3.2.3)."""
    if writing:
        a = abs(mvd)
        if a == 0:
            coder.decision(base + inc0, 0)
            return None
        coder.decision(base + inc0, 1)
        pre = min(a, 9)
        for j in range(1, pre):
            coder.decision(base + min(j + 2, 6), 1)
        if a < 9:
            coder.decision(base + min(pre + 2, 6), 0)
        else:
            _enc_eg0(coder, a - 9, k=3)
        coder.bypass(1 if mvd < 0 else 0)
        return None
    dec = coder
    if not dec.decision(base + inc0):
        return 0
    a = 1
    while a < 9 and dec.decision(base + min(a + 2, 6)):
        a += 1
    if a == 9:
        a += _dec_eg0_value(dec, k=3)
    return -a if dec.bypass() else a


def encode_p_frame_cabac(
    frame: np.ndarray,
    ref_y: np.ndarray,
    ref_c: list,
    qp: int = 26,
    frame_num: int = 1,
    search_range: int = 8,
    poc_lsb: int | None = None,
    return_mvs: bool = False,
) -> tuple:
    """One CABAC P-slice NAL (type 1) predicting from ``(ref_y,
    ref_c)``: the arithmetic twin of ``h264_inter.encode_p_frame``,
    sharing its motion search, predictors and residual analysis.
    Returns ``(nal, recon_y, recon_c)``."""
    from real_time_trip_processing_project_spark.operators import (
        h264_inter as HP,
    )

    frame = np.asarray(frame)
    h, w = frame.shape
    if h % MB or w % MB:
        raise ValueError("frame dimensions must be multiples of 16")
    if frame.dtype != np.uint8:
        raise ValueError("frame must be uint8")
    HI._check_qp(qp)
    h_mbs, w_mbs = h // MB, w // MB

    src_c = [np.full((h // 2, w // 2), 128, dtype=np.uint8)] * 2
    recon_y = np.zeros((h, w), dtype=np.uint8)
    recon_c = [np.zeros((h // 2, w // 2), dtype=np.uint8) for _ in range(2)]
    mvs = np.zeros((h_mbs, w_mbs, 2), dtype=np.int64)
    mvds = np.zeros((h_mbs, w_mbs, 2), dtype=np.int64)
    skipped = np.zeros((h_mbs, w_mbs), dtype=bool)

    bw = BitWriter()
    bw.ue(0)  # first_mb_in_slice
    bw.ue(5)  # slice_type 5: P (all slices)
    bw.ue(0)  # pic_parameter_set_id
    bw.u(frame_num & 15, 4)  # frame_num
    if poc_lsb is not None:  # poc_type-0 SPS (the B tier)
        bw.u(poc_lsb, H_POC_LSB_BITS)
    bw.u(0, 1)  # num_ref_idx_active_override_flag
    bw.u(0, 1)  # ref_pic_list_modification_flag_l0
    bw.u(0, 1)  # adaptive_ref_pic_marking_mode_flag
    bw.ue(0)  # cabac_init_idc (present for CABAC non-I slices)
    bw.se(qp - 26)  # slice_qp_delta
    bw.ue(1)  # disable_deblocking_filter_idc: filter off
    while bw.bit_position % 8:
        bw.u(1, 1)  # cabac_alignment_one_bit

    enc = CabacEncoder(bw)
    ctx = _MbCtx(h_mbs, w_mbs)

    def _skip_inc(mby, mbx):
        a = mbx > 0 and not skipped[mby, mbx - 1]
        b = mby > 0 and not skipped[mby - 1, mbx]
        return (1 if a else 0) + (1 if b else 0)

    def _amvd(mby, mbx, comp):
        s = 0
        if mbx > 0:
            s += abs(int(mvds[mby, mbx - 1, comp]))
        if mby > 0:
            s += abs(int(mvds[mby - 1, mbx, comp]))
        return s

    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            pskip = HP._pskip_mv(mvs, mby, mbx, w_mbs)
            mv = HP._search_mv(frame, ref_y, mby, mbx, pskip, search_range)
            (cbp_luma_bits, levels16, c_dc, c_ac, cbp_chroma,
             rec_y, rec_c) = HP._analyze_mb_p(
                frame, src_c, ref_y, ref_c, mby, mbx, qp, mv
            )
            cbp = cbp_luma_bits | (cbp_chroma << 4)
            is_skip = cbp == 0 and mv == pskip
            enc.decision(
                _CTX_MB_SKIP + _skip_inc(mby, mbx), 1 if is_skip else 0
            )
            skipped[mby, mbx] = is_skip
            if is_skip:
                mvs[mby, mbx] = mv
                mvds[mby, mbx] = (0, 0)
                HP._commit(recon_y, recon_c, rec_y, rec_c, mby, mbx)
                ctx.commit_mb(mby, mbx, 0, 0, 0)
                ctx.prev_qp_delta_nz = 0
                _zero_mb_cbf(ctx, mby, mbx)
            else:
                # mb_type P_L0_16x16 = "000"
                enc.decision(_CTX_MB_TYPE_P, 0)
                enc.decision(_CTX_MB_TYPE_P + 1, 0)
                enc.decision(_CTX_MB_TYPE_P + 2, 0)
                mvp = HP._mv_pred(mvs, mby, mbx, w_mbs)
                mvd = (mv[0] - mvp[0], mv[1] - mvp[1])
                _code_mvd(
                    enc, True, _CTX_MVD_X, _mvd_inc0(_amvd(mby, mbx, 1)),
                    mvd[1],
                )
                _code_mvd(
                    enc, True, _CTX_MVD_Y, _mvd_inc0(_amvd(mby, mbx, 0)),
                    mvd[0],
                )
                mvs[mby, mbx] = mv
                mvds[mby, mbx] = (mvd[0], mvd[1])
                pending: dict = {}
                for g in range(4):
                    bit = (cbp_luma_bits >> g) & 1
                    enc.decision(
                        _CTX_CBP_LUMA
                        + ctx.cbp_luma_inc(mby, mbx, g, pending),
                        bit,
                    )
                    pending[(2 * mby + g // 2, 2 * mbx + g % 2)] = bit
                enc.decision(
                    _CTX_CBP_CHROMA + ctx.cbp_chroma_inc(mby, mbx, False),
                    1 if cbp_chroma > 0 else 0,
                )
                if cbp_chroma > 0:
                    enc.decision(
                        _CTX_CBP_CHROMA
                        + ctx.cbp_chroma_inc(mby, mbx, True),
                        1 if cbp_chroma == 2 else 0,
                    )
                if cbp:
                    enc.decision(
                        _CTX_QP_DELTA + ctx.prev_qp_delta_nz, 0
                    )
                ctx.prev_qp_delta_nz = 0
                _code_p_residuals(
                    enc, True, mby, mbx, ctx,
                    cbp_luma_bits, cbp_chroma, levels16, c_dc, c_ac,
                )
                ctx.commit_mb(mby, mbx, 0, cbp_luma_bits, cbp_chroma)
                HP._commit(recon_y, recon_c, rec_y, rec_c, mby, mbx)
            last = mby == h_mbs - 1 and mbx == w_mbs - 1
            enc.terminate(1 if last else 0)
    bw.align_zero()
    nal = b"\x61" + rbsp_to_ebsp(bw.getvalue())
    if return_mvs:
        return nal, recon_y, recon_c, mvs
    return nal, recon_y, recon_c


def _zero_mb_cbf(ctx: _MbCtx, mby: int, mbx: int) -> None:
    """Skipped MBs carry no residual blocks: every cbf neighbor map
    records 0 for their positions."""
    ctx.dc_y.set(mby, mbx, 0)
    for y in range(4):
        for x in range(4):
            ctx.ac_y.set(4 * mby + y, 4 * mbx + x, 0)
    for comp in range(2):
        ctx.dc_c[comp].set(mby, mbx, 0)
        for y in range(2):
            for x in range(2):
                ctx.ac_c[comp].set(2 * mby + y, 2 * mbx + x, 0)


def _code_p_residuals(
    coder, writing, mby, mbx, ctx,
    cbp_luma_bits, cbp_chroma, levels16, c_dc, c_ac,
):
    """Inter residuals: 16 category-2 luma blocks + the shared chroma
    tail (identical block order to the I_NxN path)."""
    by0, bx0 = 4 * mby, 4 * mbx
    if writing:
        for blk in range(16):
            x, y = HI._BLK_XY[blk]
            by, bx = by0 + y, bx0 + x
            if cbp_luma_bits & (1 << (blk // 4)):
                scan = HI._zigzag_read(levels16[blk].reshape(4, 4))
                cbf = _write_residual(coder, 2, scan, ctx.ac_y.inc(by, bx))
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
        ctx.dc_y.set(mby, mbx, 0)
        return None
    dec = coder
    levels16 = np.zeros((16, 4, 4), dtype=np.int64)
    for blk in range(16):
        x, y = HI._BLK_XY[blk]
        by, bx = by0 + y, bx0 + x
        if cbp_luma_bits & (1 << (blk // 4)):
            scan, cbf = _read_residual(dec, 2, ctx.ac_y.inc(by, bx))
            levels16[blk] = HI._zigzag_write(scan)
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
    ctx.dc_y.set(mby, mbx, 0)
    return levels16, c_dc, c_ac


def decode_p_frame_cabac(
    nal: bytes, sps: dict, pps: dict, ref_y: np.ndarray, ref_c: list,
    return_mvs: bool = False,
) -> tuple:
    """The normative inverse of :func:`encode_p_frame_cabac`.  Returns
    ``(recon_y, recon_c)``; malformed data raises ValueError."""
    from real_time_trip_processing_project_spark.operators import (
        h264_inter as HP,
    )

    if not nal or nal[0] & 0x1F != 1:
        raise ValueError("not a non-IDR slice NAL")
    rbsp = ebsp_to_rbsp(nal[1:])
    r = BitReader(rbsp)
    if r.ue() != 0:
        raise ValueError("first_mb_in_slice != 0")
    if r.ue() % 5 != 0:
        raise ValueError("not a P slice")
    r.ue()  # pic_parameter_set_id
    r.u(sps["log2_max_frame_num"])
    if sps["poc_type"] == 0:  # the B tier's SPS
        r.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
    if r.u(1):
        raise ValueError("num_ref_idx override not supported")
    if r.u(1):
        raise ValueError("ref_pic_list_modification not supported")
    if r.u(1):
        raise ValueError("adaptive ref marking not supported")
    if r.ue() > 2:
        raise ValueError("cabac_init_idc out of range")
    qp = 26 + r.se()
    HI._check_qp(qp)
    if pps.get("deblocking_control"):
        idc = r.ue()
        if idc != 1:
            r.se()
            r.se()
    while r.pos % 8:
        if r.u(1) != 1:
            raise ValueError("bad cabac_alignment bit")
    dec = CabacDecoder(rbsp, r.pos)

    h, w = sps["height"], sps["width"]
    h_mbs, w_mbs = h // MB, w // MB
    if ref_y.shape != (h, w):
        raise ValueError("reference picture dimensions mismatch")
    recon_y = np.zeros((h, w), dtype=np.uint8)
    recon_c = [np.zeros((h // 2, w // 2), dtype=np.uint8) for _ in range(2)]
    ctx = _MbCtx(h_mbs, w_mbs)
    mvs = np.zeros((h_mbs, w_mbs, 2), dtype=np.int64)
    mvds = np.zeros((h_mbs, w_mbs, 2), dtype=np.int64)
    skipped = np.zeros((h_mbs, w_mbs), dtype=bool)
    qpc = HI.chroma_qp(qp)

    def _skip_inc(mby, mbx):
        a = mbx > 0 and not skipped[mby, mbx - 1]
        b = mby > 0 and not skipped[mby - 1, mbx]
        return (1 if a else 0) + (1 if b else 0)

    def _amvd(mby, mbx, comp):
        s = 0
        if mbx > 0:
            s += abs(int(mvds[mby, mbx - 1, comp]))
        if mby > 0:
            s += abs(int(mvds[mby - 1, mbx, comp]))
        return s

    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            if dec.decision(_CTX_MB_SKIP + _skip_inc(mby, mbx)):
                skipped[mby, mbx] = True
                mv = HP._pskip_mv(mvs, mby, mbx, w_mbs)
                mvs[mby, mbx] = mv
                mvds[mby, mbx] = (0, 0)
                pred = HP._mc_luma(ref_y, mby * MB, mbx * MB, mv)
                HP._commit(
                    recon_y, recon_c,
                    np.clip(pred, 0, 255).astype(np.uint8),
                    [np.clip(c, 0, 255).astype(np.uint8)
                     for c in HP._mc_chroma(ref_c, mby, mbx, mv)],
                    mby, mbx,
                )
                ctx.commit_mb(mby, mbx, 0, 0, 0)
                ctx.prev_qp_delta_nz = 0
                _zero_mb_cbf(ctx, mby, mbx)
            else:
                skipped[mby, mbx] = False
                if dec.decision(_CTX_MB_TYPE_P):
                    raise ValueError(
                        "intra macroblocks in CABAC P slices not "
                        "supported"
                    )
                if dec.decision(_CTX_MB_TYPE_P + 1):
                    raise ValueError("P partition types not supported")
                if dec.decision(_CTX_MB_TYPE_P + 2):
                    raise ValueError("P_8x8 not supported")
                mvd_x = _code_mvd(
                    dec, False, _CTX_MVD_X, _mvd_inc0(_amvd(mby, mbx, 1))
                )
                mvd_y = _code_mvd(
                    dec, False, _CTX_MVD_Y, _mvd_inc0(_amvd(mby, mbx, 0))
                )
                mvp = HP._mv_pred(mvs, mby, mbx, w_mbs)
                mv = (mvp[0] + mvd_y, mvp[1] + mvd_x)
                if abs(mv[0]) > 4 * h or abs(mv[1]) > 4 * w:
                    raise ValueError("motion vector out of range")
                mvs[mby, mbx] = mv
                mvds[mby, mbx] = (mvd_y, mvd_x)
                cbp_luma_bits = 0
                pending = {}
                for g in range(4):
                    bit = dec.decision(
                        _CTX_CBP_LUMA
                        + ctx.cbp_luma_inc(mby, mbx, g, pending)
                    )
                    cbp_luma_bits |= bit << g
                    pending[(2 * mby + g // 2, 2 * mbx + g % 2)] = bit
                cbp_chroma = 0
                if dec.decision(
                    _CTX_CBP_CHROMA + ctx.cbp_chroma_inc(mby, mbx, False)
                ):
                    cbp_chroma = 2 if dec.decision(
                        _CTX_CBP_CHROMA
                        + ctx.cbp_chroma_inc(mby, mbx, True)
                    ) else 1
                qp_delta = 0
                if cbp_luma_bits or cbp_chroma:
                    if dec.decision(
                        _CTX_QP_DELTA + ctx.prev_qp_delta_nz
                    ):
                        k = 1
                        while dec.decision(
                            _CTX_QP_DELTA + (2 if k == 1 else 3)
                        ):
                            k += 1
                            if k > 104:
                                raise ValueError(
                                    "mb_qp_delta out of range"
                                )
                        qp_delta = (k + 1) // 2 if k & 1 else -(k // 2)
                ctx.prev_qp_delta_nz = 1 if qp_delta else 0
                qp += qp_delta
                HI._check_qp(qp)
                qpc = HI.chroma_qp(qp)
                levels16, c_dc, c_ac = _code_p_residuals(
                    dec, False, mby, mbx, ctx,
                    cbp_luma_bits, cbp_chroma, None, None, None,
                )
                ctx.commit_mb(mby, mbx, 0, cbp_luma_bits, cbp_chroma)
                pred = HP._mc_luma(ref_y, mby * MB, mbx * MB, mv)
                rec_y = np.empty((MB, MB), dtype=np.uint8)
                for blk in range(16):
                    x, y = HI._BLK_XY[blk]
                    res = (
                        HI.inv4x4(HI.dequant4x4(levels16[blk], qp))
                        if cbp_luma_bits & (1 << (blk // 4))
                        else np.zeros((4, 4), dtype=np.int64)
                    )
                    rec_y[4 * y : 4 * y + 4, 4 * x : 4 * x + 4] = np.clip(
                        pred[4 * y : 4 * y + 4, 4 * x : 4 * x + 4] + res,
                        0,
                        255,
                    )
                c_preds = HP._mc_chroma(ref_c, mby, mbx, mv)
                rec_c = HI._chroma_recon(c_dc, c_ac, c_preds, cbp_chroma,
                                         qpc)
                HP._commit(recon_y, recon_c, rec_y, rec_c, mby, mbx)
            eos = dec.terminate()
            last = mby == h_mbs - 1 and mbx == w_mbs - 1
            if eos != (1 if last else 0):
                raise ValueError("end_of_slice_flag out of place")
    if return_mvs:
        return recon_y, recon_c, mvs
    return recon_y, recon_c


# ---------------------------------------------------------------------------
# B slices under CABAC (r12): the arithmetic twin of h264_b.py — per-MB
# mb_skip_flag under the B-slice context block, the Table 9-37 B
# mb_type binarization ('100' B_L0_16x16 / '101' B_L1_16x16 / '110000'
# B_Bi_16x16; '0' B_Direct decodes to the explicit-seam ValueError),
# one UEG3 mvd pair per used list with PER-LIST |mvd|-sum neighbor
# contexts, and the shared inter CBP/residual pipeline.  The
# MOTION/ANALYSIS layer is h264_b's verbatim (shared _mv_pred_b,
# _predict, SAD mode decision and _analyze_mb_from_pred), so a CABAC B
# stream decodes to pixels bit-identical to the CAVLC B stream.
# Context-index assignment note (same stance as the uniform inits
# documented at the top of this module): bin 0 of mb_type uses
# 27 + condTermFlag(A) + condTermFlag(B) per 9.3.3.1.1.3, bin 1 uses
# 27+3, bin 2 uses 27+4, bins 3+ use 27+5 — encoder and decoder share
# the table, so a deviation from the published assignment is
# rate-only, never wrong pixels.

_CTX_MB_SKIP_B = 24  # + inc 0..2 (B slices)
_CTX_MB_TYPE_B = 27  # + inc (see note above)


def _code_b_mb_type(coder, writing: bool, inc0: int, mb_type: int = 0):
    """Table 9-37 B mb_type bins for the 16x16 types incl. direct.
    Decoding rejects any '11'-prefixed value other than B_Bi_16x16 —
    the sub-16x16 partition seam."""
    if writing:
        if mb_type == 0:  # B_Direct_16x16: '0'
            coder.decision(_CTX_MB_TYPE_B + inc0, 0)
            return None
        coder.decision(_CTX_MB_TYPE_B + inc0, 1)
        if mb_type in (1, 2):  # '10x'
            coder.decision(_CTX_MB_TYPE_B + 3, 0)
            coder.decision(_CTX_MB_TYPE_B + 4, mb_type - 1)
        else:  # B_Bi_16x16: '110000'
            coder.decision(_CTX_MB_TYPE_B + 3, 1)
            coder.decision(_CTX_MB_TYPE_B + 4, 0)
            for _ in range(3):
                coder.decision(_CTX_MB_TYPE_B + 5, 0)
        return None
    dec = coder
    if not dec.decision(_CTX_MB_TYPE_B + inc0):
        return 0  # B_Direct_16x16
    if not dec.decision(_CTX_MB_TYPE_B + 3):
        return 1 + dec.decision(_CTX_MB_TYPE_B + 4)
    suffix = dec.decision(_CTX_MB_TYPE_B + 4)
    for _ in range(3):
        suffix = (suffix << 1) | dec.decision(_CTX_MB_TYPE_B + 5)
    if suffix != 0:
        raise ValueError(
            f"unsupported B-slice mb_type suffix {suffix} (only "
            "B_Direct/B_L0/B_L1/B_Bi_16x16)"
        )
    return 3


def encode_b_frame_cabac(
    frame: np.ndarray,
    ref0_y: np.ndarray,
    ref0_c: list,
    ref1_y: np.ndarray,
    ref1_c: list,
    qp: int = 26,
    frame_num: int = 2,
    poc_lsb: int = 2,
    search_range: int = 8,
    col_mvs: np.ndarray | None = None,
    direct_mode: str = "spatial",
    weights: tuple | None = None,
) -> tuple:
    """One CABAC non-reference B-slice NAL: the arithmetic twin of
    ``h264_b.encode_b_frame``, sharing its mode decision
    (``h264_b._decide_mb`` — spatial direct / L0 / L1 / Bi by SAD),
    refIdx-aware predictors and residual analysis, so the decoded
    pixels are identical across entropy coders.  B_Skip codes as
    mb_skip_flag=1; B_Direct_16x16 as the single '0' mb_type bin.
    Returns ``(nal, recon_y, recon_c)``."""
    from real_time_trip_processing_project_spark.operators import (
        h264_b as HB,
        h264_inter as HP,
    )

    frame = np.asarray(frame)
    h, w = frame.shape
    if h % MB or w % MB:
        raise ValueError("frame dimensions must be multiples of 16")
    if frame.dtype != np.uint8:
        raise ValueError("frame must be uint8")
    HI._check_qp(qp)
    if direct_mode not in ("spatial", "temporal"):
        raise ValueError(f"unknown direct_mode {direct_mode!r}")
    h_mbs, w_mbs = h // MB, w // MB

    src_c = [np.full((h // 2, w // 2), 128, dtype=np.uint8)] * 2
    recon_y = np.zeros((h, w), dtype=np.uint8)
    recon_c = [np.zeros((h // 2, w // 2), dtype=np.uint8) for _ in range(2)]
    mvs = np.zeros((2, h_mbs, w_mbs, 2), dtype=np.int64)
    used = np.zeros((2, h_mbs, w_mbs), dtype=bool)
    mvds = np.zeros((2, h_mbs, w_mbs, 2), dtype=np.int64)
    skipped = np.zeros((h_mbs, w_mbs), dtype=bool)
    direct_or_skip = np.zeros((h_mbs, w_mbs), dtype=bool)
    refs_y, refs_c = (ref0_y, ref1_y), (ref0_c, ref1_c)

    bw = BitWriter()
    bw.ue(0)  # first_mb_in_slice
    bw.ue(6)  # slice_type 6: B (all slices)
    bw.ue(0)  # pic_parameter_set_id
    bw.u(frame_num & 15, 4)  # frame_num
    bw.u(poc_lsb & (2**H_POC_LSB_BITS - 1), H_POC_LSB_BITS)
    bw.u(1 if direct_mode == "spatial" else 0, 1)  # direct_spatial_mv_pred_flag
    bw.u(0, 1)  # num_ref_idx_active_override_flag
    bw.u(0, 1)  # ref_pic_list_modification_flag_l0
    bw.u(0, 1)  # ref_pic_list_modification_flag_l1
    if weights is not None:
        # pred_weight_table — identical Exp-Golomb syntax to the
        # CAVLC twin (headers are never CABAC'd)
        bw.ue(HB.WP_LOG2_DENOM)
        bw.ue(HB.WP_LOG2_DENOM)
        for w_, o_ in weights:
            bw.u(1, 1)
            bw.se(w_)
            bw.se(o_)
            bw.u(0, 1)
    # nal_ref_idc 0 → NO dec_ref_pic_marking
    bw.ue(0)  # cabac_init_idc
    bw.se(qp - 26)  # slice_qp_delta
    bw.ue(1)  # disable_deblocking_filter_idc
    while bw.bit_position % 8:
        bw.u(1, 1)  # cabac_alignment_one_bit

    enc = CabacEncoder(bw)
    ctx = _MbCtx(h_mbs, w_mbs)

    def _skip_inc(mby, mbx):
        # 9.3.3.1.1.1: condTermFlagN = 1 iff mbN available and NOT skip
        a = mbx > 0 and not skipped[mby, mbx - 1]
        b = mby > 0 and not skipped[mby - 1, mbx]
        return (1 if a else 0) + (1 if b else 0)

    def _type_inc(mby, mbx):
        # 9.3.3.1.1.3: condTermFlagN = 1 iff mbN available and NOT
        # B_Skip/B_Direct_16x16
        a = mbx > 0 and not direct_or_skip[mby, mbx - 1]
        b = mby > 0 and not direct_or_skip[mby - 1, mbx]
        return (1 if a else 0) + (1 if b else 0)

    def _amvd(lst, mby, mbx, comp):
        s = 0
        if mbx > 0:
            s += abs(int(mvds[lst, mby, mbx - 1, comp]))
        if mby > 0:
            s += abs(int(mvds[lst, mby - 1, mbx, comp]))
        return s

    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            (mb_type, dflags, mv0, mvp0, mv1, mvp1,
             pred, c_preds) = HB._decide_mb(
                frame, refs_y, refs_c, mvs, used, mby, mbx, w_mbs,
                col_mvs, search_range, direct_mode, weights,
            )
            (cbp_luma_bits, levels16, c_dc, c_ac, cbp_chroma,
             rec_y, rec_c) = HP._analyze_mb_from_pred(
                frame, src_c, pred, c_preds, mby, mbx, qp
            )
            cbp = cbp_luma_bits | (cbp_chroma << 4)
            HB._commit_mb_motion(
                mvs, used, mby, mbx, mb_type, dflags, mv0, mv1
            )
            is_skip = mb_type == HB.B_DIRECT_16X16 and cbp == 0
            enc.decision(
                _CTX_MB_SKIP_B + _skip_inc(mby, mbx), 1 if is_skip else 0
            )
            if is_skip:
                skipped[mby, mbx] = True
                direct_or_skip[mby, mbx] = True
                HP._commit(recon_y, recon_c, rec_y, rec_c, mby, mbx)
                ctx.commit_mb(mby, mbx, 0, 0, 0)
                ctx.prev_qp_delta_nz = 0
                _zero_mb_cbf(ctx, mby, mbx)
            else:
                _code_b_mb_type(enc, True, _type_inc(mby, mbx), mb_type)
                direct_or_skip[mby, mbx] = mb_type == HB.B_DIRECT_16X16
                if mb_type != HB.B_DIRECT_16X16:
                    for lst, mv, mvp in ((0, mv0, mvp0), (1, mv1, mvp1)):
                        if lst in HB._MB_TYPE_LISTS[mb_type]:
                            mvd = (mv[0] - mvp[0], mv[1] - mvp[1])
                            _code_mvd(
                                enc, True, _CTX_MVD_X,
                                _mvd_inc0(_amvd(lst, mby, mbx, 1)),
                                mvd[1],
                            )
                            _code_mvd(
                                enc, True, _CTX_MVD_Y,
                                _mvd_inc0(_amvd(lst, mby, mbx, 0)),
                                mvd[0],
                            )
                            mvds[lst, mby, mbx] = (mvd[0], mvd[1])
                pending: dict = {}
                for g in range(4):
                    bit = (cbp_luma_bits >> g) & 1
                    enc.decision(
                        _CTX_CBP_LUMA
                        + ctx.cbp_luma_inc(mby, mbx, g, pending),
                        bit,
                    )
                    pending[(2 * mby + g // 2, 2 * mbx + g % 2)] = bit
                enc.decision(
                    _CTX_CBP_CHROMA + ctx.cbp_chroma_inc(mby, mbx, False),
                    1 if cbp_chroma > 0 else 0,
                )
                if cbp_chroma > 0:
                    enc.decision(
                        _CTX_CBP_CHROMA
                        + ctx.cbp_chroma_inc(mby, mbx, True),
                        1 if cbp_chroma == 2 else 0,
                    )
                if cbp:
                    enc.decision(_CTX_QP_DELTA + ctx.prev_qp_delta_nz, 0)
                ctx.prev_qp_delta_nz = 0
                _code_p_residuals(
                    enc, True, mby, mbx, ctx,
                    cbp_luma_bits, cbp_chroma, levels16, c_dc, c_ac,
                )
                ctx.commit_mb(mby, mbx, 0, cbp_luma_bits, cbp_chroma)
                HP._commit(recon_y, recon_c, rec_y, rec_c, mby, mbx)
            last = mby == h_mbs - 1 and mbx == w_mbs - 1
            enc.terminate(1 if last else 0)
    bw.align_zero()
    return b"\x01" + rbsp_to_ebsp(bw.getvalue()), recon_y, recon_c


def decode_b_frame_cabac(
    nal: bytes,
    sps: dict,
    pps: dict,
    ref0_y: np.ndarray,
    ref0_c: list,
    ref1_y: np.ndarray,
    ref1_c: list,
    col_mvs: np.ndarray | None = None,
) -> tuple:
    """The normative inverse of :func:`encode_b_frame_cabac`.  Returns
    ``(recon_y, recon_c)``; malformed data → ValueError.  ``col_mvs``:
    the colocated (list-1) reference's motion field for the
    spatial-direct derivation, as in ``h264_b.decode_b_frame``."""
    from real_time_trip_processing_project_spark.operators import (
        h264_b as HB,
        h264_inter as HP,
    )

    if not nal or nal[0] & 0x1F != 1:
        raise ValueError("not a non-IDR slice NAL")
    if nal[0] >> 5:
        raise ValueError("reference B slices not supported")
    rbsp = ebsp_to_rbsp(nal[1:])
    r = BitReader(rbsp)
    if r.ue() != 0:
        raise ValueError("first_mb_in_slice != 0")
    if r.ue() % 5 != 1:
        raise ValueError("not a B slice")
    r.ue()  # pic_parameter_set_id
    r.u(sps["log2_max_frame_num"])
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
    spatial_direct = bool(r.u(1))  # direct_spatial_mv_pred_flag
    if r.u(1):
        raise ValueError("num_ref_idx override not supported")
    if r.u(1) or r.u(1):
        raise ValueError("ref_pic_list_modification not supported")
    weights = None
    if pps.get("weighted_bipred_idc") == 2:
        if r.ue() != HB.WP_LOG2_DENOM or r.ue() != HB.WP_LOG2_DENOM:
            raise ValueError("unsupported weight denominators")
        wlist = []
        for _lst in range(2):
            if not r.u(1):
                wlist.append((1 << HB.WP_LOG2_DENOM, 0))
            else:
                w_ = r.se()
                o_ = r.se()
                if not (-128 <= w_ <= 127 and -128 <= o_ <= 127):
                    raise ValueError("luma weight/offset out of range")
                wlist.append((w_, o_))
            if r.u(1):
                raise ValueError("chroma weights not supported")
        weights = tuple(wlist)
    if r.ue() != 0:
        raise ValueError("cabac_init_idc != 0 not supported")
    qp = 26 + r.se()
    HI._check_qp(qp)
    if pps.get("deblocking_control"):
        idc = r.ue()
        if idc != 1:
            r.se()
            r.se()
    while r.pos % 8:
        if r.u(1) != 1:
            raise ValueError("bad cabac_alignment bit")
    dec = CabacDecoder(rbsp, r.pos)

    h, w = sps["height"], sps["width"]
    h_mbs, w_mbs = h // MB, w // MB
    if ref0_y.shape != (h, w) or ref1_y.shape != (h, w):
        raise ValueError("reference picture dimensions mismatch")
    recon_y = np.zeros((h, w), dtype=np.uint8)
    recon_c = [np.zeros((h // 2, w // 2), dtype=np.uint8) for _ in range(2)]
    ctx = _MbCtx(h_mbs, w_mbs)
    mvs = np.zeros((2, h_mbs, w_mbs, 2), dtype=np.int64)
    used = np.zeros((2, h_mbs, w_mbs), dtype=bool)
    mvds = np.zeros((2, h_mbs, w_mbs, 2), dtype=np.int64)
    skipped = np.zeros((h_mbs, w_mbs), dtype=bool)
    direct_or_skip = np.zeros((h_mbs, w_mbs), dtype=bool)
    refs_y, refs_c = (ref0_y, ref1_y), (ref0_c, ref1_c)
    qpc = HI.chroma_qp(qp)

    def _skip_inc(mby, mbx):
        a = mbx > 0 and not skipped[mby, mbx - 1]
        b = mby > 0 and not skipped[mby - 1, mbx]
        return (1 if a else 0) + (1 if b else 0)

    def _type_inc(mby, mbx):
        a = mbx > 0 and not direct_or_skip[mby, mbx - 1]
        b = mby > 0 and not direct_or_skip[mby - 1, mbx]
        return (1 if a else 0) + (1 if b else 0)

    def _amvd(lst, mby, mbx, comp):
        s = 0
        if mbx > 0:
            s += abs(int(mvds[lst, mby, mbx - 1, comp]))
        if mby > 0:
            s += abs(int(mvds[lst, mby - 1, mbx, comp]))
        return s

    def _direct_pred(mby, mbx):
        if spatial_direct:
            d0, d1, dmv0, dmv1 = HB._direct_mvs(
                mvs, used, mby, mbx, w_mbs, col_mvs
            )
        else:
            d0, d1, dmv0, dmv1 = HB._direct_mvs_temporal(
                mby, mbx, col_mvs
            )
        y0, x0 = mby * MB, mbx * MB
        if d0 and d1:
            pl0 = HP._mc_luma(refs_y[0], y0, x0, dmv0)
            pl1 = HP._mc_luma(refs_y[1], y0, x0, dmv1)
            pred = (
                HB._wp_bi(pl0, pl1, weights[0], weights[1])
                if weights is not None
                else HB._bi_pred(pl0, pl1)
            )
            c_preds = [
                HB._bi_pred(a, b)
                for a, b in zip(
                    HP._mc_chroma(refs_c[0], mby, mbx, dmv0),
                    HP._mc_chroma(refs_c[1], mby, mbx, dmv1),
                )
            ]
        elif d0:
            pred = HP._mc_luma(refs_y[0], y0, x0, dmv0)
            if weights is not None:
                pred = HB._wp_single(pred, weights[0])
            c_preds = HP._mc_chroma(refs_c[0], mby, mbx, dmv0)
        else:
            pred = HP._mc_luma(refs_y[1], y0, x0, dmv1)
            if weights is not None:
                pred = HB._wp_single(pred, weights[1])
            c_preds = HP._mc_chroma(refs_c[1], mby, mbx, dmv1)
        HB._commit_mb_motion(
            mvs, used, mby, mbx, HB.B_DIRECT_16X16, (d0, d1), dmv0, dmv1
        )
        return pred, c_preds

    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            if dec.decision(_CTX_MB_SKIP_B + _skip_inc(mby, mbx)):
                # B_Skip: spatial direct, no residual
                skipped[mby, mbx] = True
                direct_or_skip[mby, mbx] = True
                pred, c_preds = _direct_pred(mby, mbx)
                HP._commit(
                    recon_y, recon_c,
                    np.clip(pred, 0, 255).astype(np.uint8),
                    [np.clip(c, 0, 255).astype(np.uint8)
                     for c in c_preds],
                    mby, mbx,
                )
                ctx.commit_mb(mby, mbx, 0, 0, 0)
                ctx.prev_qp_delta_nz = 0
                _zero_mb_cbf(ctx, mby, mbx)
            else:
                mb_type = _code_b_mb_type(
                    dec, False, _type_inc(mby, mbx)
                )
                direct_or_skip[mby, mbx] = mb_type == HB.B_DIRECT_16X16
                if mb_type == HB.B_DIRECT_16X16:
                    pred, c_preds = _direct_pred(mby, mbx)
                else:
                    mv0 = mv1 = (0, 0)
                    for lst in HB._MB_TYPE_LISTS[mb_type]:
                        mvp = HB._mv_pred_b(
                            mvs, used, mby, mbx, w_mbs, lst
                        )
                        mvd_x = _code_mvd(
                            dec, False, _CTX_MVD_X,
                            _mvd_inc0(_amvd(lst, mby, mbx, 1)),
                        )
                        mvd_y = _code_mvd(
                            dec, False, _CTX_MVD_Y,
                            _mvd_inc0(_amvd(lst, mby, mbx, 0)),
                        )
                        mv = (mvp[0] + mvd_y, mvp[1] + mvd_x)
                        if abs(mv[0]) > 4 * h or abs(mv[1]) > 4 * w:
                            raise ValueError("motion vector out of range")
                        mvs[lst, mby, mbx] = mv
                        used[lst, mby, mbx] = True
                        mvds[lst, mby, mbx] = (mvd_y, mvd_x)
                        if lst == 0:
                            mv0 = mv
                        else:
                            mv1 = mv
                    pred, c_preds = HB._predict(
                        refs_y, refs_c, mby, mbx, mb_type, mv0, mv1,
                        weights,
                    )
                cbp_luma_bits = 0
                pending: dict = {}
                for g in range(4):
                    bit = dec.decision(
                        _CTX_CBP_LUMA
                        + ctx.cbp_luma_inc(mby, mbx, g, pending)
                    )
                    cbp_luma_bits |= bit << g
                    pending[(2 * mby + g // 2, 2 * mbx + g % 2)] = bit
                cbp_chroma = 0
                if dec.decision(
                    _CTX_CBP_CHROMA + ctx.cbp_chroma_inc(mby, mbx, False)
                ):
                    cbp_chroma = 1 + dec.decision(
                        _CTX_CBP_CHROMA
                        + ctx.cbp_chroma_inc(mby, mbx, True)
                    )
                qp_delta = 0
                if cbp_luma_bits or cbp_chroma:
                    if dec.decision(
                        _CTX_QP_DELTA + ctx.prev_qp_delta_nz
                    ):
                        k = 1
                        while dec.decision(
                            _CTX_QP_DELTA + (2 if k == 1 else 3)
                        ):
                            k += 1
                            if k > 104:
                                raise ValueError(
                                    "mb_qp_delta out of range"
                                )
                        qp_delta = (k + 1) // 2 if k & 1 else -(k // 2)
                ctx.prev_qp_delta_nz = 1 if qp_delta else 0
                qp += qp_delta
                HI._check_qp(qp)
                qpc = HI.chroma_qp(qp)
                levels16, c_dc, c_ac = _code_p_residuals(
                    dec, False, mby, mbx, ctx, cbp_luma_bits, cbp_chroma,
                    None, None, None,
                )
                ctx.commit_mb(mby, mbx, 0, cbp_luma_bits, cbp_chroma)
                rec_y, rec_c = HP._recon_inter_mb(
                    pred, c_preds, levels16, c_dc, c_ac,
                    cbp_luma_bits, cbp_chroma, qp, qpc,
                )
                HP._commit(recon_y, recon_c, rec_y, rec_c, mby, mbx)
            last = mby == h_mbs - 1 and mbx == w_mbs - 1
            if dec.terminate() != (1 if last else 0):
                raise ValueError("end_of_slice_flag mismatch")
    return recon_y, recon_c
