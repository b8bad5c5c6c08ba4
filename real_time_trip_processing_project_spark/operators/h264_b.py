"""Bi-predictive (B) H.264 frames — the codec family's last documented
seam (multimodal.py's ``NotImplementedError``: "B frames /
multi-reference"), built on the P tier's motion compensation
(h264_inter.py) and the shared intra transform/CAVLC pipeline.

Scope, stated precisely:

- **B slices of B_L0_16x16 / B_L1_16x16 / B_Bi_16x16 macroblocks**
  (Table 7-14 mb_types 1–3) over a TWO-picture decoded-picture buffer:
  list 0 holds the past reference, list 1 the future reference (the
  POC-ordered initialisation of 8.2.4.2.3 for exactly one picture on
  each side; num_ref_idx_active is 1 per list, so no ref_idx syntax is
  coded and refIdxLX is 0 wherever predFlagLX is 1).
- **Per-list motion-vector prediction (8.4.1.3)**, refIdx-aware: a
  neighbor that did not predict from list X contributes
  ``mvLXN = (0,0), refIdxLXN = -1``; the exactly-one-matching-neighbor
  shortcut, the 16x16 B/C-unavailable→mvA rule and the C→D
  substitution all apply per list independently.
- **Bi-prediction (8.4.2.3)**: each list interpolated at full
  quarter-sample luma / eighth-sample chroma precision via the P
  tier's 8.4.2.2 kernels, then the default (non-weighted) rounded
  average ``(predL0 + predL1 + 1) >> 1`` per sample.
- **POC / reordering**: B streams carry pic_order_cnt_type 0 SPSes
  (h264.encode_sps(poc_type=0)) because decode order differs from
  display order; every slice header writes ``pic_order_cnt_lsb =
  2·display_index mod 65536``.  frame_num follows 7.4.3: references
  increment it, a non-reference B carries PrevRefFrameNum+1.
- **B_Skip / B_Direct_16x16 with SPATIAL direct derivation
  (8.4.1.2.2)**: refIdxLX = MinPositive over the A/B/C neighbors, the
  directZeroPrediction fallback, and the colZeroFlag rule — a list
  with refIdx 0 takes the zero vector when the colocated macroblock
  (in RefPicList1[0], whose motion field threads through ``col_mvs``)
  is inter with both vector components ≤ 1 quarter-pel; otherwise the
  8.4.1.3 median predictor.  The per-MB mode decision
  (:func:`_decide_mb`, shared with the CABAC twin) weighs direct
  against the explicit modes by SAD, and a direct MB with an all-zero
  CBP collapses into ``mb_skip_run`` — static content codes at ~7
  bytes/frame-row instead of ~60.
- **Non-reference NALs**: B slices are emitted with nal_ref_idc 0
  (header byte 0x01) and therefore carry NO dec_ref_pic_marking; the
  decoder never feeds a B reconstruction back as a reference, so a
  wrong B frame cannot drift the GOP (tests pin this by corrupting a
  B and checking the following P still decodes bit-exactly).
- **GOP containers**: ``h264.encode_mp4_h264(codec="i16pb")`` writes
  decode-order samples IDR P B P B … with a real ``ctts``
  composition-offset box (run-length, version 0) mapping them back to
  display order I B P B P …; ``decode_mp4_h264`` sorts emitted frames
  by composition time.
- **Temporal direct (8.4.1.2.3)** as the alternative derivation
  (``direct_mode="temporal"`` / ``encode_mp4_h264(b_direct=...)``):
  the proportional colocated-motion split mvL0 = (DistScaleFactor ·
  mvCol + 128) >> 8, mvL1 = mvL0 − mvCol, with the ladder's constant
  POC geometry (td=4, tb=2 → DistScaleFactor 129); the decoder
  dispatches on the parsed direct_spatial_mv_pred_flag, so both
  stream flavors decode through one path.  Rate is ≈ spatial on this
  tier's content (the explicit modes absorb the motion-accuracy win);
  the value is conformance coverage of both derivations.
- **Explicit weighted bi-prediction (8.4.2.3.2, weighted_bipred_idc
  2)**: slice-header pred_weight_table with per-list luma (w, o) at
  logWD 6 (chroma on default weights — identity for the constant-128
  planes), the weighted single-list and bi forms applied to every
  luma prediction including direct/skip, and per-slice least-squares
  weight estimation (:func:`estimate_weights`) — flash/fade content
  codes at a fraction of the default-bipred rate
  (``encode_mp4_h264(b_weighted=True)``).
- **Explicit seams** (ValueError-gated in the decoder, never emitted
  by the encoder): >1 active reference per list IN B SLICES (P slices
  grew the 2-deep te(v) ref_idx list in r12 — h264_inter.py
  ``extra_refs``), implicit weighted bi-prediction
  (weighted_bipred_idc 1), chroma weights, reference B slices,
  sub-16x16 B partitions.  CABAC B slices shipped in r12 too
  (h264_cabac.encode_b_frame_cabac, ``codec="i16pb_cabac"``) over
  this module's analysis, including skip/direct in both derivations
  and the weighted forms.

Shared-table caveat: identical stance to h264_inter.py — encoder and
decoder share Table 9-4's inter CBP column, so a transcription slip
could only produce externally-nonconformant streams, never wrong
pixels here.

Reference parity note: the reference pipeline
(Real-Time-Trip-Processing-Project) has no media processing at all —
north-star multimodal tier.

At 100 TB: row-local Arrow-batched work inside ``mapInPandas``;
nothing here shuffles.
"""

from __future__ import annotations

import numpy as np

from real_time_trip_processing_project_spark.operators.h264 import (
    MB,
    POC_LSB_BITS,
    BitReader,
    BitWriter,
    ebsp_to_rbsp,
    rbsp_to_ebsp,
)
from real_time_trip_processing_project_spark.operators import h264_intra as HI
from real_time_trip_processing_project_spark.operators import h264_inter as HP

# Table 7-14 (B slices): the coded 16x16 mb_types.
B_DIRECT_16X16 = 0
B_L0_16X16 = 1
B_L1_16X16 = 2
B_BI_16X16 = 3

#: which lists each EXPLICIT mb_type predicts from (direct derives its
#: own prediction flags — see :func:`_direct_mvs`)
_MB_TYPE_LISTS = {B_L0_16X16: (0,), B_L1_16X16: (1,), B_BI_16X16: (0, 1)}


def _direct_mvs(
    mvs: np.ndarray,
    used: np.ndarray,
    mby: int,
    mbx: int,
    w_mbs: int,
    col_mvs: np.ndarray | None,
) -> tuple:
    """Spatial direct motion derivation (8.4.1.2.2) for B_Skip /
    B_Direct_16x16, specialized to this tier's invariants (every
    in-slice refIdx is 0; the colocated picture — RefPicList1[0], the
    future reference — is either all-intra IDR, ``col_mvs=None``, or a
    single-ref P frame whose per-MB vectors arrive in ``col_mvs``).

    Returns ``(pred0, pred1, mv0, mv1)``:

    - refIdxLX = MinPositive over neighbors A/B/C (C→D substitution):
      0 when any available neighbor predicts from list X, else -1.
    - Both lists referenceless → directZeroPrediction: bi-predict with
      zero vectors (predFlags 1/1).
    - colZeroFlag (the colocated 4x4 block — per-MB uniform here, the
      colocated P macroblocks are 16x16/skip with refIdx 0): colocated
      inter with both |mv| components ≤ 1 quarter-pel.  A list with
      refIdx 0 under colZeroFlag takes the zero vector; otherwise the
      8.4.1.3 median predictor for refIdx 0."""
    avail = []
    for lst in (0, 1):
        a = mbx > 0 and used[lst, mby, mbx - 1]
        b = mby > 0 and used[lst, mby - 1, mbx]
        if mby > 0 and mbx + 1 < w_mbs:
            c = used[lst, mby - 1, mbx + 1]
        elif mby > 0 and mbx > 0:
            c = used[lst, mby - 1, mbx - 1]
        else:
            c = False
        avail.append(bool(a or b or c))
    ref0 = 0 if avail[0] else -1
    ref1 = 0 if avail[1] else -1
    if ref0 < 0 and ref1 < 0:  # directZeroPredictionFlag
        return True, True, (0, 0), (0, 0)
    col_zero = col_mvs is not None and bool(
        abs(int(col_mvs[mby, mbx, 0])) <= 1
        and abs(int(col_mvs[mby, mbx, 1])) <= 1
    )
    out = []
    for lst, ref in ((0, ref0), (1, ref1)):
        if ref < 0 or col_zero:
            out.append((0, 0))
        else:
            out.append(_mv_pred_b(mvs, used, mby, mbx, w_mbs, lst))
    return ref0 >= 0, ref1 >= 0, out[0], out[1]


#: Temporal-direct POC geometry of the IBP ladder: every B sits exactly
#: mid-way between its references (display distance 1 each side, POC
#: units of 2) → td = 4, tb = 2, tx = (16384 + td//2) // td = 4096,
#: DistScaleFactor = clip3(-1024, 1023, (tb·tx + 32) >> 6) = 129.
#: General POC-scaled temporal direct would thread the reference POCs
#: the way ``col_mvs`` threads motion; the ladder makes them constants.
_TD_DIST_SCALE = 129


def _direct_mvs_temporal(
    mby: int, mbx: int, col_mvs: np.ndarray | None
) -> tuple:
    """Temporal direct motion derivation (8.4.1.2.3) under the ladder
    geometry above: always bi-predictive (predFlags 1/1, refIdx 0 both
    lists), ``mvL0 = (DistScaleFactor·mvCol + 128) >> 8`` and
    ``mvL1 = mvL0 − mvCol`` per component — the colocated (future
    reference) motion split proportionally across the two sides.  A
    colocated intra picture (``col_mvs=None``) contributes mvCol = 0."""
    if col_mvs is None:
        return True, True, (0, 0), (0, 0)
    cy, cx = int(col_mvs[mby, mbx, 0]), int(col_mvs[mby, mbx, 1])
    mv0 = (
        (_TD_DIST_SCALE * cy + 128) >> 8,
        (_TD_DIST_SCALE * cx + 128) >> 8,
    )
    return True, True, mv0, (mv0[0] - cy, mv0[1] - cx)


def _decide_mb(
    frame: np.ndarray,
    refs_y: tuple,
    refs_c: tuple,
    mvs: np.ndarray,
    used: np.ndarray,
    mby: int,
    mbx: int,
    w_mbs: int,
    col_mvs: np.ndarray | None,
    search_range: int,
    direct_mode: str = "spatial",
    weights: tuple | None = None,
) -> tuple:
    """Shared B mode decision (CAVLC h264_b + CABAC h264_cabac emit
    identical pixel streams because they both call THIS): evaluate
    direct (spatial 8.4.1.2.2 or temporal 8.4.1.2.3 per
    ``direct_mode``), L0, L1 and Bi by SAD, ties preferring the
    cheaper syntax (direct < L0 < L1 < Bi).  ``weights``: explicit
    per-list (w, o) luma weights — every candidate's SAD is computed
    on the WEIGHTED prediction, so the decision optimizes the actual
    coded residual (motion search itself stays unweighted: a global
    scale/offset shifts all candidates alike).  Returns ``(mb_type,
    direct_flags, mv0, mvp0, mv1, mvp1, pred, c_preds)``."""
    y0, x0 = mby * MB, mbx * MB
    block = frame[y0 : y0 + MB, x0 : x0 + MB].astype(np.int64)

    def wp1(p, lst):
        return p if weights is None else _wp_single(p, weights[lst])

    def wpbi(p0_, p1_):
        if weights is None:
            return _bi_pred(p0_, p1_)
        return _wp_bi(p0_, p1_, weights[0], weights[1])

    if direct_mode == "temporal":
        d0, d1, dmv0, dmv1 = _direct_mvs_temporal(mby, mbx, col_mvs)
    else:
        d0, d1, dmv0, dmv1 = _direct_mvs(
            mvs, used, mby, mbx, w_mbs, col_mvs
        )
    if d0 and d1:
        dpred = wpbi(
            HP._mc_luma(refs_y[0], y0, x0, dmv0),
            HP._mc_luma(refs_y[1], y0, x0, dmv1),
        )
    elif d0:
        dpred = wp1(HP._mc_luma(refs_y[0], y0, x0, dmv0), 0)
    else:
        dpred = wp1(HP._mc_luma(refs_y[1], y0, x0, dmv1), 1)
    mvp0 = _mv_pred_b(mvs, used, mby, mbx, w_mbs, 0)
    mvp1 = _mv_pred_b(mvs, used, mby, mbx, w_mbs, 1)
    mv0 = HP._search_mv(frame, refs_y[0], mby, mbx, mvp0, search_range)
    mv1 = HP._search_mv(frame, refs_y[1], mby, mbx, mvp1, search_range)
    p0 = wp1(HP._mc_luma(refs_y[0], y0, x0, mv0), 0)
    p1 = wp1(HP._mc_luma(refs_y[1], y0, x0, mv1), 1)
    sads = (
        int(np.abs(block - dpred).sum()),
        int(np.abs(block - p0).sum()),
        int(np.abs(block - p1).sum()),
        int(np.abs(
            block - wpbi(
                HP._mc_luma(refs_y[0], y0, x0, mv0),
                HP._mc_luma(refs_y[1], y0, x0, mv1),
            )
        ).sum()),
    )
    mb_type = min(range(4), key=lambda k: (sads[k], k))
    if mb_type == B_DIRECT_16X16:
        mv0, mv1 = dmv0, dmv1
        if d0 and d1:
            c_preds = [
                _bi_pred(a, b)
                for a, b in zip(
                    HP._mc_chroma(refs_c[0], mby, mbx, dmv0),
                    HP._mc_chroma(refs_c[1], mby, mbx, dmv1),
                )
            ]
        elif d0:
            c_preds = HP._mc_chroma(refs_c[0], mby, mbx, dmv0)
        else:
            c_preds = HP._mc_chroma(refs_c[1], mby, mbx, dmv1)
        return mb_type, (d0, d1), mv0, mvp0, mv1, mvp1, dpred, c_preds
    pred, c_preds = _predict(
        refs_y, refs_c, mby, mbx, mb_type, mv0, mv1, weights
    )
    return mb_type, None, mv0, mvp0, mv1, mvp1, pred, c_preds


def _commit_mb_motion(
    mvs, used, mby, mbx, mb_type, direct_flags, mv0, mv1
):
    """The derived motion state of a coded/skipped B MB — direct MBs
    carry their DERIVED refIdx/mv into subsequent predictions (spec
    8.4.1.2.2's outputs feed 8.4.1.3 for later neighbors)."""
    if mb_type == B_DIRECT_16X16:
        d0, d1 = direct_flags
        if d0:
            mvs[0, mby, mbx] = mv0
            used[0, mby, mbx] = True
        if d1:
            mvs[1, mby, mbx] = mv1
            used[1, mby, mbx] = True
        return
    for lst, mv in ((0, mv0), (1, mv1)):
        if lst in _MB_TYPE_LISTS[mb_type]:
            mvs[lst, mby, mbx] = mv
            used[lst, mby, mbx] = True


def _mv_pred_b(
    mvs: np.ndarray,
    used: np.ndarray,
    mby: int,
    mbx: int,
    w_mbs: int,
    lst: int,
) -> tuple:
    """Median predictor for a 16x16 B partition, list ``lst``
    (8.4.1.3 / 8.4.1.3.1), refIdx-aware: ``used[lst]`` marks MBs whose
    prediction flag for the list is 1 (refIdx 0 — the only coded
    index).  A neighbor with predFlagLX 0 contributes mv (0,0) and a
    non-matching refIdx, exactly as step 1 of 8.4.1.3.1 assigns."""
    avail_a = mbx > 0
    avail_b = mby > 0
    avail_c = mby > 0 and mbx + 1 < w_mbs
    avail_d = mby > 0 and mbx > 0

    def at(y, x, avail):
        if not avail or not used[lst, y, x]:
            return (0, 0), False
        return (int(mvs[lst, y, x, 0]), int(mvs[lst, y, x, 1])), True

    mv_a, m_a = at(mby, mbx - 1, avail_a)
    if avail_c:
        mv_c, m_c = at(mby - 1, mbx + 1, True)
    elif avail_d:
        mv_c, m_c = at(mby - 1, mbx - 1, True)
        avail_c = True
    else:
        mv_c, m_c = (0, 0), False
    mv_b, m_b = at(mby - 1, mbx, avail_b)
    # 16x16 special case: B and C (and D) outside the picture → mvA
    if avail_a and not avail_b and not avail_c:
        return mv_a
    # exactly one neighbor predicts from this list with the same
    # refIdx → its vector verbatim
    matches = [mv for mv, m in ((mv_a, m_a), (mv_b, m_b), (mv_c, m_c)) if m]
    if len(matches) == 1:
        return matches[0]
    return (
        HP._median3(mv_a[0], mv_b[0], mv_c[0]),
        HP._median3(mv_a[1], mv_b[1], mv_c[1]),
    )


def _bi_pred(p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
    """Default bi-prediction (8.4.2.3.2, no weighted prediction):
    per-sample rounded average of the two list predictions."""
    return (p0 + p1 + 1) >> 1


# Explicit weighted prediction (8.4.2.3.2, weighted_bipred_idc 2) with
# the fixed luma_log2_weight_denom 6 this tier emits.  Chroma keeps the
# DEFAULT weights (w=64, o=0 — the planes are constant 128), under
# which the weighted formulas reduce exactly to the unweighted ones,
# so only LUMA paths ever apply these.

WP_LOG2_DENOM = 6


def _wp_single(p: np.ndarray, wo: tuple) -> np.ndarray:
    """Weighted single-list luma prediction: ((p·w + 32) >> 6) + o,
    clipped — 8.4.2.3.2 with logWD ≥ 1."""
    w, o = wo
    return np.clip(((p * w + 32) >> WP_LOG2_DENOM) + o, 0, 255)


def _wp_bi(p0: np.ndarray, p1: np.ndarray, wo0: tuple, wo1: tuple):
    """Weighted bi-predictive luma: ((p0·w0 + p1·w1 + 64) >> 7) +
    ((o0 + o1 + 1) >> 1), clipped."""
    (w0, o0), (w1, o1) = wo0, wo1
    return np.clip(
        ((p0 * w0 + p1 * w1 + (1 << WP_LOG2_DENOM))
         >> (WP_LOG2_DENOM + 1))
        + ((o0 + o1 + 1) >> 1),
        0, 255,
    )


def estimate_weights(
    frame: np.ndarray, ref0_y: np.ndarray, ref1_y: np.ndarray
) -> tuple:
    """Per-slice explicit-weight estimation: least-squares scale+offset
    of the frame against each reference (w = 64·cov/var, o = the mean
    residue), clipped to the spec's se(v) weight range [-128, 127].
    Deterministic integer outputs; the GOP encoder uses these whenever
    ``b_weighted`` is on."""
    out = []
    f = frame.astype(np.float64)
    for ref in (ref0_y, ref1_y):
        r = ref.astype(np.float64)
        var = float(((r - r.mean()) ** 2).mean())
        if var < 1e-9:
            w = 64
        else:
            cov = float(((f - f.mean()) * (r - r.mean())).mean())
            w = int(round(64.0 * cov / var))
        w = max(-128, min(127, w))
        o = int(round(float(f.mean()) - w * float(r.mean()) / 64.0))
        out.append((w, max(-128, min(127, o))))
    return tuple(out)


def _predict(
    refs_y: tuple, refs_c: tuple, mby: int, mbx: int,
    mb_type: int, mv0: tuple, mv1: tuple,
    weights: tuple | None = None,
):
    """Luma + chroma prediction for a coded B mb_type.  ``weights``
    (((w0, o0), (w1, o1)), logWD 6) applies the explicit 8.4.2.3.2
    luma forms; chroma keeps default weights (identity — the planes
    are constant 128)."""
    y0, x0 = mby * MB, mbx * MB
    if mb_type == B_L0_16X16:
        p = HP._mc_luma(refs_y[0], y0, x0, mv0)
        if weights is not None:
            p = _wp_single(p, weights[0])
        return p, HP._mc_chroma(refs_c[0], mby, mbx, mv0)
    if mb_type == B_L1_16X16:
        p = HP._mc_luma(refs_y[1], y0, x0, mv1)
        if weights is not None:
            p = _wp_single(p, weights[1])
        return p, HP._mc_chroma(refs_c[1], mby, mbx, mv1)
    p0 = HP._mc_luma(refs_y[0], y0, x0, mv0)
    p1 = HP._mc_luma(refs_y[1], y0, x0, mv1)
    c0 = HP._mc_chroma(refs_c[0], mby, mbx, mv0)
    c1 = HP._mc_chroma(refs_c[1], mby, mbx, mv1)
    luma = (
        _wp_bi(p0, p1, weights[0], weights[1])
        if weights is not None
        else _bi_pred(p0, p1)
    )
    return luma, [_bi_pred(a, b) for a, b in zip(c0, c1)]


def encode_b_frame(
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
    """One non-reference B-slice NAL (type 1, nal_ref_idc 0)
    predicting from the past (list 0) and future (list 1) reference
    pictures.  Returns ``(nal, recon_y, recon_c)`` — the
    reconstruction is for the caller's distortion accounting only; it
    is never a reference (B frames here are non-reference by
    construction, so B error cannot propagate).

    Per-MB mode decision (:func:`_decide_mb`, shared with the CABAC
    twin): spatial direct, list-0, list-1 and bi-predictive SADs;
    minimum wins, ties prefer the cheaper syntax (direct < L0 < L1 <
    Bi).  A direct MB with an all-zero CBP collapses into the
    ``mb_skip_run`` (B_Skip, r12).  ``col_mvs``: the list-1
    (colocated) reference's per-MB motion field for the 8.4.1.2.2
    colZeroFlag — None (an intra colocated picture) keeps the flag
    0.  ``direct_mode="temporal"`` switches the direct derivation to
    8.4.1.2.3 (proportional split of the colocated motion) and writes
    direct_spatial_mv_pred_flag 0; the decoder dispatches on the
    parsed flag.  ``weights = ((w0, o0), (w1, o1))`` (r12, explicit
    weighted bi-prediction): the slice header carries a
    pred_weight_table (luma_log2_weight_denom 6, per-list luma
    weights, default chroma) and every luma prediction uses the
    8.4.2.3.2 weighted forms — the stream then REQUIRES a PPS with
    weighted_bipred_idc 2 (h264.encode_pps(weighted_b=True))."""
    if direct_mode not in ("spatial", "temporal"):
        raise ValueError(f"unknown direct_mode {direct_mode!r}")
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
    nz_y = HI._NzCtx(h_mbs, w_mbs, 4)
    nz_c = [HI._NzCtx(h_mbs, w_mbs, 2) for _ in range(2)]
    mvs = np.zeros((2, h_mbs, w_mbs, 2), dtype=np.int64)
    used = np.zeros((2, h_mbs, w_mbs), dtype=bool)
    refs_y, refs_c = (ref0_y, ref1_y), (ref0_c, ref1_c)

    bw = BitWriter()
    bw.ue(0)  # first_mb_in_slice
    bw.ue(6)  # slice_type 6: B (all slices in picture)
    bw.ue(0)  # pic_parameter_set_id
    bw.u(frame_num & 15, 4)  # frame_num (7.4.3: PrevRefFrameNum+1)
    bw.u(poc_lsb & (2**POC_LSB_BITS - 1), POC_LSB_BITS)
    bw.u(1 if direct_mode == "spatial" else 0, 1)  # direct_spatial_mv_pred_flag
    bw.u(0, 1)  # num_ref_idx_active_override_flag
    bw.u(0, 1)  # ref_pic_list_modification_flag_l0
    bw.u(0, 1)  # ref_pic_list_modification_flag_l1
    if weights is not None:
        # pred_weight_table (7.3.3.2): fixed denom 6, explicit luma
        # weights per list, chroma on default weights
        bw.ue(WP_LOG2_DENOM)  # luma_log2_weight_denom
        bw.ue(WP_LOG2_DENOM)  # chroma_log2_weight_denom
        for w_, o_ in weights:  # l0 then l1, one ref each
            bw.u(1, 1)  # luma_weight_lX_flag
            bw.se(w_)
            bw.se(o_)
            bw.u(0, 1)  # chroma_weight_lX_flag (default)
    # nal_ref_idc 0 → NO dec_ref_pic_marking
    bw.se(qp - 26)  # slice_qp_delta
    bw.ue(1)  # disable_deblocking_filter_idc: filter off

    skip_run = 0
    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            (mb_type, dflags, mv0, mvp0, mv1, mvp1,
             pred, c_preds) = _decide_mb(
                frame, refs_y, refs_c, mvs, used, mby, mbx, w_mbs,
                col_mvs, search_range, direct_mode, weights,
            )
            (cbp_luma_bits, levels16, c_dc, c_ac, cbp_chroma,
             rec_y, rec_c) = HP._analyze_mb_from_pred(
                frame, src_c, pred, c_preds, mby, mbx, qp
            )
            cbp = cbp_luma_bits | (cbp_chroma << 4)
            _commit_mb_motion(
                mvs, used, mby, mbx, mb_type, dflags, mv0, mv1
            )
            if mb_type == B_DIRECT_16X16 and cbp == 0:
                # B_Skip: direct prediction only, part of the run
                skip_run += 1
                HP._commit(recon_y, recon_c, rec_y, rec_c, mby, mbx)
                HP._set_nz(nz_y, nz_c, mby, mbx, 0)
                continue
            bw.ue(skip_run)
            skip_run = 0
            bw.ue(mb_type)
            if mb_type != B_DIRECT_16X16:
                for lst, mv, mvp in ((0, mv0, mvp0), (1, mv1, mvp1)):
                    if lst in _MB_TYPE_LISTS[mb_type]:
                        bw.se(mv[1] - mvp[1])  # mvd_lX x (spec order)
                        bw.se(mv[0] - mvp[0])  # mvd_lX y
            bw.ue(HP._CBP_INTER_INV[cbp])  # coded_block_pattern me(v)
            if cbp:
                bw.se(0)  # mb_qp_delta
            HP._write_inter_residual(
                bw, levels16, c_dc, c_ac, cbp_luma_bits, cbp_chroma,
                nz_y, nz_c, mby, mbx,
            )
            HP._commit(recon_y, recon_c, rec_y, rec_c, mby, mbx)
    if skip_run:
        bw.ue(skip_run)  # trailing skips
    bw.rbsp_trailing_bits()
    return b"\x01" + rbsp_to_ebsp(bw.getvalue()), recon_y, recon_c


def decode_b_frame(
    nal: bytes,
    sps: dict,
    pps: dict,
    ref0_y: np.ndarray,
    ref0_c: list,
    ref1_y: np.ndarray,
    ref1_c: list,
    col_mvs: np.ndarray | None = None,
) -> tuple:
    """The normative inverse of :func:`encode_b_frame`.  Returns
    ``(recon_y, recon_c)``.  Malformed data → ValueError (the codec
    family's corrupted-stream contract).  ``col_mvs``: the colocated
    (list-1) reference's motion field, required to reproduce the
    encoder's spatial-direct derivation — None treats the colocated
    picture as intra (colZeroFlag 0), matching an IDR list-1 ref."""
    if not nal or nal[0] & 0x1F != 1:
        raise ValueError("not a non-IDR slice NAL")
    if nal[0] >> 5:
        raise ValueError("reference B slices not supported")
    r = BitReader(ebsp_to_rbsp(nal[1:]))
    if r.ue() != 0:
        raise ValueError("first_mb_in_slice != 0")
    if r.ue() % 5 != 1:
        raise ValueError("not a B slice")
    r.ue()  # pic_parameter_set_id
    r.u(sps["log2_max_frame_num"])  # frame_num
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
    spatial_direct = bool(r.u(1))  # direct_spatial_mv_pred_flag
    if r.u(1):
        raise ValueError("num_ref_idx override not supported")
    if r.u(1) or r.u(1):
        raise ValueError("ref_pic_list_modification not supported")
    weights = None
    if pps.get("weighted_bipred_idc") == 2:
        # pred_weight_table (7.3.3.2), this tier's emitted subset
        if r.ue() != WP_LOG2_DENOM or r.ue() != WP_LOG2_DENOM:
            raise ValueError("unsupported weight denominators")
        wlist = []
        for _lst in range(2):
            if not r.u(1):  # luma_weight_lX_flag
                wlist.append((1 << WP_LOG2_DENOM, 0))
            else:
                w_ = r.se()
                o_ = r.se()
                if not (-128 <= w_ <= 127 and -128 <= o_ <= 127):
                    raise ValueError("luma weight/offset out of range")
                wlist.append((w_, o_))
            if r.u(1):
                raise ValueError("chroma weights not supported")
        weights = tuple(wlist)
    # nal_ref_idc 0 → no dec_ref_pic_marking
    qp = 26 + r.se()
    HI._check_qp(qp)
    if pps.get("deblocking_control"):
        idc = r.ue()
        if idc != 1:
            r.se()
            r.se()

    h, w = sps["height"], sps["width"]
    h_mbs, w_mbs = h // MB, w // MB
    if ref0_y.shape != (h, w) or ref1_y.shape != (h, w):
        raise ValueError("reference picture dimensions mismatch")
    recon_y = np.zeros((h, w), dtype=np.uint8)
    recon_c = [np.zeros((h // 2, w // 2), dtype=np.uint8) for _ in range(2)]
    nz_y = HI._NzCtx(h_mbs, w_mbs, 4)
    nz_c = [HI._NzCtx(h_mbs, w_mbs, 2) for _ in range(2)]
    mvs = np.zeros((2, h_mbs, w_mbs, 2), dtype=np.int64)
    used = np.zeros((2, h_mbs, w_mbs), dtype=bool)
    refs_y, refs_c = (ref0_y, ref1_y), (ref0_c, ref1_c)
    qpc = HI.chroma_qp(qp)

    def _direct_recon(mby, mbx):
        """Prediction-only direct/skip reconstruction + motion state,
        dispatching on the slice header's direct_spatial_mv_pred_flag."""
        if spatial_direct:
            d0, d1, dmv0, dmv1 = _direct_mvs(
                mvs, used, mby, mbx, w_mbs, col_mvs
            )
        else:
            d0, d1, dmv0, dmv1 = _direct_mvs_temporal(mby, mbx, col_mvs)
        y0, x0 = mby * MB, mbx * MB
        if d0 and d1:
            pl0 = HP._mc_luma(refs_y[0], y0, x0, dmv0)
            pl1 = HP._mc_luma(refs_y[1], y0, x0, dmv1)
            pred = (
                _wp_bi(pl0, pl1, weights[0], weights[1])
                if weights is not None
                else _bi_pred(pl0, pl1)
            )
            c_preds = [
                _bi_pred(a, b)
                for a, b in zip(
                    HP._mc_chroma(refs_c[0], mby, mbx, dmv0),
                    HP._mc_chroma(refs_c[1], mby, mbx, dmv1),
                )
            ]
        elif d0:
            pred = HP._mc_luma(refs_y[0], y0, x0, dmv0)
            if weights is not None:
                pred = _wp_single(pred, weights[0])
            c_preds = HP._mc_chroma(refs_c[0], mby, mbx, dmv0)
        else:
            pred = HP._mc_luma(refs_y[1], y0, x0, dmv1)
            if weights is not None:
                pred = _wp_single(pred, weights[1])
            c_preds = HP._mc_chroma(refs_c[1], mby, mbx, dmv1)
        _commit_mb_motion(
            mvs, used, mby, mbx, B_DIRECT_16X16, (d0, d1), dmv0, dmv1
        )
        return pred, c_preds

    n_mbs = h_mbs * w_mbs
    i = 0
    while i < n_mbs:
        skip_run = r.ue()
        if skip_run > n_mbs - i:
            raise ValueError("mb_skip_run overruns the slice")
        for _ in range(skip_run):  # B_Skip: spatial direct, no residual
            mby, mbx = divmod(i, w_mbs)
            pred, c_preds = _direct_recon(mby, mbx)
            HP._commit(
                recon_y, recon_c,
                np.clip(pred, 0, 255).astype(np.uint8),
                [np.clip(c, 0, 255).astype(np.uint8) for c in c_preds],
                mby, mbx,
            )
            HP._set_nz(nz_y, nz_c, mby, mbx, 0)
            i += 1
        if i >= n_mbs:
            break
        mby, mbx = divmod(i, w_mbs)
        mb_type = r.ue()
        if mb_type == B_DIRECT_16X16:
            pred, c_preds = _direct_recon(mby, mbx)
        elif mb_type in _MB_TYPE_LISTS:
            mv0 = mv1 = (0, 0)
            for lst in _MB_TYPE_LISTS[mb_type]:
                mvp = _mv_pred_b(mvs, used, mby, mbx, w_mbs, lst)
                mvd_x = r.se()
                mvd_y = r.se()
                mv = (mvp[0] + mvd_y, mvp[1] + mvd_x)
                if abs(mv[0]) > 4 * h or abs(mv[1]) > 4 * w:
                    raise ValueError("motion vector out of range")
                mvs[lst, mby, mbx] = mv
                used[lst, mby, mbx] = True
                if lst == 0:
                    mv0 = mv
                else:
                    mv1 = mv
            pred, c_preds = _predict(
                refs_y, refs_c, mby, mbx, mb_type, mv0, mv1, weights
            )
        else:
            raise ValueError(
                f"unsupported B-slice mb_type {mb_type} (only "
                "B_Direct/B_L0/B_L1/B_Bi_16x16 and B_Skip)"
            )
        code_num = r.ue()
        if code_num >= len(HP.CBP_INTER_ME):
            raise ValueError("coded_block_pattern out of range")
        cbp = HP.CBP_INTER_ME[code_num]
        cbp_luma_bits, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            qp += r.se()
            HI._check_qp(qp)
            qpc = HI.chroma_qp(qp)
        levels16, c_dc, c_ac = HP._read_inter_residual(
            r, cbp_luma_bits, cbp_chroma, nz_y, nz_c, mby, mbx
        )
        rec_y, rec_c = HP._recon_inter_mb(
            pred, c_preds, levels16, c_dc, c_ac,
            cbp_luma_bits, cbp_chroma, qp, qpc,
        )
        HP._commit(recon_y, recon_c, rec_y, rec_c, mby, mbx)
        i += 1
    if r.u(1) != 1:
        raise ValueError("missing rbsp_stop_one_bit")
    return recon_y, recon_c


def encode_b_gop(
    frames: np.ndarray,
    qp: int = 26,
    search_range: int = 8,
    cabac: bool = False,
    direct_mode: str = "spatial",
    weighted: bool = False,
) -> list:
    """Encode frames (display order) as the IBP GOP: display
    I0 B1 P2 B3 P4 … (trailing P when no future reference exists),
    decode order I0 P2 B1 P4 B3 ….  Returns decode-ordered
    ``[(nal, display_idx), ...]``; poc_lsb = 2·display_idx, frame_num
    per 7.4.3 (references increment, a B carries PrevRefFrameNum+1).
    Used by ``h264.encode_mp4_h264(codec="i16pb")``, which derives the
    ctts composition offsets from the display indexes.  ``cabac``
    swaps every slice for its arithmetic twin (h264_cabac.py,
    codec="i16pb_cabac") — same motion/mode analysis, so the decoded
    pixels are identical across entropy coders.  ``weighted`` (r12):
    every B slice carries explicit per-list luma weights estimated by
    :func:`estimate_weights` (least-squares scale+offset against each
    reference) — flash/fade content then codes against
    brightness-corrected references; the container must pair this
    with the weighted_bipred_idc-2 PPS
    (``encode_mp4_h264(b_weighted=True)``)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n = frames.shape[0]
    if cabac:
        from real_time_trip_processing_project_spark.operators import (
            h264_cabac as HC,
        )

        enc_idr = lambda f, **kw: HC.encode_idr_frame_cabac(  # noqa: E731
            f, return_recon=True,
            **{k: v for k, v in kw.items()
               if k not in ("return_recon", "return_chroma")},
        )
        enc_p = HC.encode_p_frame_cabac
        enc_b = HC.encode_b_frame_cabac
    else:
        enc_idr = HI.encode_idr_frame_i16
        enc_p = HP.encode_p_frame
        enc_b = encode_b_frame
    nal, ry, rc = enc_idr(
        frames[0], qp=qp, idr_pic_id=0, return_recon=True,
        return_chroma=True, poc_lsb=0,
    )
    out = [(nal, 0)]
    prev_y, prev_c = ry, rc
    ref_frame_num = 0  # frame_num of the most recent reference
    d = 0  # display index of the past reference
    while d < n - 1:
        nd = min(d + 2, n - 1)  # next reference (P) display index
        ref_frame_num = (ref_frame_num + 1) & 15
        nal, py, pc, pmvs = enc_p(
            frames[nd], prev_y, prev_c, qp=qp,
            frame_num=ref_frame_num, search_range=search_range,
            poc_lsb=(2 * nd) & (2**POC_LSB_BITS - 1),
            return_mvs=True,
        )
        out.append((nal, nd))
        if nd - d == 2:  # a B frame sits between the two references
            bd = d + 1
            nal, _by, _bc = enc_b(
                frames[bd], prev_y, prev_c, py, pc, qp=qp,
                frame_num=(ref_frame_num + 1) & 15,
                poc_lsb=(2 * bd) & (2**POC_LSB_BITS - 1),
                search_range=search_range,
                col_mvs=pmvs,  # the L1 (colocated) motion field
                direct_mode=direct_mode,
                weights=(
                    estimate_weights(frames[bd], prev_y, py)
                    if weighted
                    else None
                ),
            )
            out.append((nal, bd))
        prev_y, prev_c = py, pc
        d = nd
    return out
