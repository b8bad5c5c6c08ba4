"""Multi-reference P-slice tests (operators/h264_inter.py, r12): the
ref_idx_l0 syntax over a 2-picture list 0 — num_ref_idx override in the
slice header, per-MB te(v) reference selection, refIdx-aware MV
prediction and P_Skip derivation — plus the i16p2 GOP container and the
corrupted-stream contract.  The classic win case is the flash/occlusion
sequence: when frame k looks like frame k-2 (not k-1), a second
reference buys what no single-reference encoder can."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_trip_processing_project_spark.operators import (
    h264 as H,
    h264_inter as HP,
    h264_intra as HI,
)


def _sps_pps(w: int, h: int, max_ref: int = 2):
    sps = H.parse_sps(H.encode_sps(w, h, max_ref=max_ref))
    pps = H.parse_pps(H.encode_pps(deblocking_control=True))
    return sps, pps


def _flash_frames(n=6, shape=(48, 64), seed=5):
    """Alternating A/B scenes: frame k matches frame k-2, never k-1 —
    the content class that NEEDS a 2-deep reference list."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, shape).astype(np.uint8)
    b = rng.integers(0, 256, shape).astype(np.uint8)
    out = []
    for k in range(n):
        base = (a if k % 2 == 0 else b).astype(np.int64)
        noise = rng.integers(-2, 3, shape)
        out.append(np.clip(base + noise, 0, 255).astype(np.uint8))
    return np.stack(out)


def _idr(frame, qp=12):
    _n, ry, rc = HI.encode_idr_frame_i16(
        frame, qp=qp, return_recon=True, return_chroma=True
    )
    return ry, rc


def test_mv_pred_ref_is_refidx_aware():
    """With mixed per-MB reference indexes, the exactly-one-match rule
    of 8.4.1.3.1 applies per refIdx: a neighbor predicting from the
    OTHER reference contributes (0,0)/-1, so the single same-ref
    neighbor's vector is used verbatim."""
    mvs = np.zeros((3, 3, 2), dtype=np.int64)
    refidx = np.full((3, 3), -1, dtype=np.int64)
    # interior MB (1,1): A=(1,0) ref1, B=(0,1) ref0, C=(0,2) ref1
    mvs[1, 0], refidx[1, 0] = (8, -4), 1
    mvs[0, 1], refidx[0, 1] = (20, 24), 0
    mvs[0, 2], refidx[0, 2] = (-8, 12), 1
    # predicting for refIdx 0: exactly one match (B) -> mvB verbatim
    assert HP._mv_pred_ref(mvs, refidx, 1, 1, 3, 0) == (20, 24)
    # predicting for refIdx 1: two matches (A, C) -> median over the
    # ACTUAL vectors of all three neighbors (a different-refIdx
    # neighbor fails the match test but still contributes its mv to
    # the median, per step 1 of 8.4.1.3.1)
    assert HP._mv_pred_ref(mvs, refidx, 1, 1, 3, 1) == (
        HP._median3(8, 20, -8),
        HP._median3(-4, 24, 12),
    )
    # top-row mvA fallback still honors the match rule
    assert HP._mv_pred_ref(mvs, refidx, 0, 1, 3, 1) == (0, 0)
    mvs[0, 0], refidx[0, 0] = (4, 4), 1
    assert HP._mv_pred_ref(mvs, refidx, 0, 1, 3, 1) == (4, 4)


def test_pskip_refidx_aware_zero_condition():
    """8.4.1.1: the P_Skip vector collapses to zero only when a
    neighbor has refIdx 0 AND zero mv (or is unavailable) — a zero mv
    on refIdx 1 does not trigger it."""
    mvs = np.full((2, 2, 2), 8, dtype=np.int64)
    refidx = np.zeros((2, 2), dtype=np.int64)
    assert HP._pskip_mv_ref(mvs, refidx, 1, 1, 2) == (8, 8)
    mvs[1, 0] = (0, 0)
    refidx[1, 0] = 1  # zero mv but on the OTHER reference
    assert HP._pskip_mv_ref(mvs, refidx, 1, 1, 2) != (0, 0)
    refidx[1, 0] = 0  # zero mv on refIdx 0 -> P_Skip goes zero
    assert HP._pskip_mv_ref(mvs, refidx, 1, 1, 2) == (0, 0)


def test_second_reference_wins_on_flash_content():
    """Frame f2 matches f0, not f1: the 2-ref encoder must (a) pick
    ref_idx 1 paths, (b) code far fewer bits than the 1-ref encoder,
    (c) decode bit-exactly."""
    fr = _flash_frames(3)
    sps, pps = _sps_pps(64, 48)
    r0y, r0c = _idr(fr[0])
    nal1, r1y, r1c = HP.encode_p_frame(fr[1], r0y, r0c, qp=12,
                                       frame_num=1)
    one_ref, _, _ = HP.encode_p_frame(fr[2], r1y, r1c, qp=12,
                                      frame_num=2)
    two_ref, ry2, rc2 = HP.encode_p_frame(
        fr[2], r1y, r1c, qp=12, frame_num=2,
        extra_refs=[(r0y, r0c)],
    )
    assert len(two_ref) * 3 < len(one_ref), (len(two_ref), len(one_ref))
    dy, dc = HP.decode_p_frame(two_ref, sps, pps, r1y, r1c,
                               extra_refs=[(r0y, r0c)])
    assert np.array_equal(dy, ry2)
    assert all(np.array_equal(a, b) for a, b in zip(dc, rc2))
    err = np.abs(ry2.astype(int) - fr[2].astype(int))
    assert err.max() <= 8 and err.mean() <= 1.0


def test_single_ref_path_unchanged():
    """extra_refs=None emits the exact legacy stream: no override flag,
    decodable by the 1-ref decoder call — the pinned i16p tiers cannot
    shift."""
    fr = _flash_frames(2)
    sps, pps = _sps_pps(64, 48, max_ref=1)
    r0y, r0c = _idr(fr[0])
    legacy, ry, _rc = HP.encode_p_frame(fr[1], r0y, r0c, qp=12)
    via_param, ry2, _rc2 = HP.encode_p_frame(
        fr[1], r0y, r0c, qp=12, extra_refs=None
    )
    assert legacy == via_param
    assert np.array_equal(ry, ry2)
    dy, _ = HP.decode_p_frame(legacy, sps, pps, r0y, r0c)
    assert np.array_equal(dy, ry)


def test_p2_gop_container_beats_single_ref_on_flash():
    fr = _flash_frames(6)
    p2 = H.encode_mp4_h264(fr, codec="i16p2", qp=12)
    p1 = H.encode_mp4_h264(fr, codec="i16p", qp=12)
    alli = H.encode_mp4_h264(fr, codec="i16", qp=12)
    assert len(p2) < 0.6 * len(p1), (len(p2), len(p1))
    # vs all-intra the win is bounded by the fresh per-frame noise the
    # matched reference cannot predict (measures 0.51 at qp12)
    assert len(p2) < 0.6 * len(alli)
    info = H.parse_mp4(p2)
    assert info["index_consistent"]
    assert info["sync_samples"] == [0]
    assert info["sps"]["max_num_ref_frames"] == 2
    assert info["ctts_offsets"] is None  # no reordering in a P chain
    _sps, dec = H.decode_mp4_h264(p2)
    assert [i for i, _f in dec] == list(range(len(fr)))
    for i, f in dec:
        assert np.abs(f.astype(int) - fr[i].astype(int)).max() <= 8
    # sampling decodes sequentially (GOP) but emits only the sampled
    _sps, dec2 = H.decode_mp4_h264(p2, every_nth=2)
    assert [i for i, _f in dec2] == [0, 2, 4]


def test_decoder_rejects_override_without_second_ref():
    fr = _flash_frames(3)
    sps, pps = _sps_pps(64, 48)
    r0y, r0c = _idr(fr[0])
    _n, r1y, r1c = HP.encode_p_frame(fr[1], r0y, r0c, qp=12)
    nal, _, _ = HP.encode_p_frame(
        fr[2], r1y, r1c, qp=12, extra_refs=[(r0y, r0c)]
    )
    with pytest.raises(ValueError, match="second reference"):
        HP.decode_p_frame(nal, sps, pps, r1y, r1c)


def test_bit_flip_fuzz_p2_decode_or_valueerror():
    fr = _flash_frames(3, shape=(32, 32), seed=11)
    sps, pps = _sps_pps(32, 32)
    r0y, r0c = _idr(fr[0])
    _n, r1y, r1c = HP.encode_p_frame(fr[1], r0y, r0c, qp=12)
    nal = bytearray(
        HP.encode_p_frame(
            fr[2], r1y, r1c, qp=12, extra_refs=[(r0y, r0c)]
        )[0]
    )
    rng = np.random.default_rng(17)
    n_bits = len(nal) * 8
    outcomes = {"ok": 0, "valueerror": 0}
    for _ in range(3000):
        i = int(rng.integers(8, n_bits))
        mut = bytearray(nal)
        mut[i // 8] ^= 1 << (7 - (i % 8))
        try:
            HP.decode_p_frame(bytes(mut), sps, pps, r1y, r1c,
                              extra_refs=[(r0y, r0c)])
            outcomes["ok"] += 1
        except ValueError:
            outcomes["valueerror"] += 1
    assert sum(outcomes.values()) == 3000
    assert outcomes["valueerror"] > 0
