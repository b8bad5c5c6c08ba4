"""Inter (P-frame) tier tests (operators/h264_inter.py): encoder/
decoder reference parity, motion compensation finding planted shifts,
P_Skip behavior, the GOP MP4 container with its stss sync table, rate
wins over all-intra, and the corrupted-stream ValueError contract."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_trip_processing_project_spark.operators import (
    h264 as H,
    h264_inter as HP,
    h264_intra as HI,
)


def _sps_pps(w: int, h: int):
    sps = H.parse_sps(H.encode_sps(w, h, max_ref=1))
    pps = H.parse_pps(H.encode_pps(deblocking_control=True))
    return sps, pps


def _moving_frames(n=6, shape=(48, 64), seed=21):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, shape).astype(np.uint8)]
    for _ in range(1, n):
        shifted = np.roll(np.roll(frames[-1], 2, axis=0), 4, axis=1)
        noise = rng.integers(-2, 3, shape)
        frames.append(
            np.clip(shifted.astype(np.int64) + noise, 0, 255).astype(
                np.uint8
            )
        )
    return np.stack(frames)


def test_cbp_inter_table_is_permutation():
    assert sorted(HP.CBP_INTER_ME) == list(range(48))


def test_mv_pred_median_and_edge_rules():
    mvs = np.zeros((3, 3, 2), dtype=np.int64)
    # first MB: everything unavailable -> (0,0)
    assert HP._mv_pred(mvs, 0, 0, 3) == (0, 0)
    # top row: B/C unavailable -> predictor is mvA verbatim
    mvs[0, 0] = (8, 16)
    assert HP._mv_pred(mvs, 0, 1, 3) == (8, 16)
    # interior: median of A, B, C
    mvs[1, 0] = (0, 8)
    mvs[0, 1] = (8, 0)
    mvs[0, 2] = (16, 24)
    assert HP._mv_pred(mvs, 1, 1, 3) == (8, 8)
    # right edge: C unavailable -> D (up-left) substitutes
    mvs[0, 1] = (4, 4)
    got = HP._mv_pred(mvs, 1, 2, 3)
    mv_a, mv_b, mv_d = (0, 0), (16, 24), (4, 4)
    assert got == (
        HP._median3(mv_a[0], mv_b[0], mv_d[0]),
        HP._median3(mv_a[1], mv_b[1], mv_d[1]),
    )


def test_pskip_mv_zero_conditions():
    mvs = np.full((2, 2, 2), 8, dtype=np.int64)
    assert HP._pskip_mv(mvs, 0, 1, 2) == (0, 0)  # top row
    assert HP._pskip_mv(mvs, 1, 0, 2) == (0, 0)  # left edge
    assert HP._pskip_mv(mvs, 1, 1, 2) == (8, 8)  # interior, nonzero nbrs
    mvs[1, 0] = (0, 0)
    assert HP._pskip_mv(mvs, 1, 1, 2) == (0, 0)  # zero-mv neighbor


def test_p_frame_roundtrip_reference_parity():
    """Decoder reconstruction equals the encoder's bit-for-bit at every
    frame of a moving GOP — the property that makes a P chain stable
    (any drift compounds)."""
    frames = _moving_frames()
    sps, pps = _sps_pps(64, 48)
    _nal, ry, rc = HI.encode_idr_frame_i16(
        frames[0], qp=12, return_recon=True, return_chroma=True
    )
    for k in range(1, len(frames)):
        nal, ry2, rc2 = HP.encode_p_frame(frames[k], ry, rc, qp=12,
                                          frame_num=k)
        dy, dc = HP.decode_p_frame(nal, sps, pps, ry, rc)
        assert np.array_equal(dy, ry2)
        assert all(np.array_equal(a, b) for a, b in zip(dc, rc2))
        err = np.abs(ry2.astype(int) - frames[k].astype(int))
        assert err.max() <= 8 and err.mean() <= 1.0
        ry, rc = ry2, rc2


def test_motion_compensation_beats_intra_rate():
    """On shifted content the P frame must be much smaller than the
    IDR — the point of temporal prediction (the search window covers
    the planted (2,4) shift)."""
    frames = _moving_frames()
    nal0, ry, rc = HI.encode_idr_frame_i16(
        frames[0], qp=12, return_recon=True, return_chroma=True
    )
    nal1, _, _ = HP.encode_p_frame(frames[1], ry, rc, qp=12)
    assert len(nal1) * 2 < len(nal0)


def test_static_content_mostly_skips():
    """A repeated frame codes as refinement-only: far below the IDR
    rate, and a SECOND repeat (predicting from an already-refined
    reference) collapses to near-pure skips."""
    f = _moving_frames(1)[0]
    _n, ry, rc = HI.encode_idr_frame_i16(
        f, qp=12, return_recon=True, return_chroma=True
    )
    n1, ry1, rc1 = HP.encode_p_frame(f, ry, rc, qp=12)
    n2, _, _ = HP.encode_p_frame(f, ry1, rc1, qp=12)
    assert len(n1) < 400
    # the refined reference leaves only ±quant-step residual churn:
    # most MBs skip, the rest code tiny refinements (measures 80 B for
    # a 12-MB frame vs 3.6 kB IDR)
    assert len(n2) < len(n1) and len(n2) <= 128, len(n2)


def test_gop_mp4_container_and_sampling():
    frames = _moving_frames()
    gop = H.encode_mp4_h264(frames, codec="i16p", qp=12)
    alli = H.encode_mp4_h264(frames, codec="i16", qp=12)
    assert len(gop) < 0.6 * len(alli)
    info = H.parse_mp4(gop)
    assert info["index_consistent"]
    assert info["sync_samples"] == [0]
    sps, dec = H.decode_mp4_h264(gop)
    assert [i for i, _ in dec] == list(range(len(frames)))
    for i, fr in dec:
        assert np.abs(fr.astype(int) - frames[i].astype(int)).max() <= 8
    # sampling on a GOP decodes sequentially but emits only sampled
    sps, dec2 = H.decode_mp4_h264(gop, every_nth=3)
    assert [i for i, _ in dec2] == [0, 3]
    full = {i: f for i, f in dec}
    for i, fr in dec2:
        assert np.array_equal(fr, full[i])
    # all-IDR containers still omit stss (absent = all sync)
    assert H.parse_mp4(alli)["sync_samples"] == list(range(len(frames)))


def test_quarter_pel_interpolation_positions():
    """Every fractional luma position (16) and chroma position (64)
    produces an in-range prediction, the center 'j' position filters
    unrounded intermediates (distinct from rounding-then-filtering),
    and sub-pel motion codes a half-pel-shifted smooth sequence far
    below the IDR rate."""
    rng = np.random.default_rng(33)
    ref = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    for fy in range(4):
        for fx in range(4):
            p = HP._mc_luma(ref, 16, 16, (8 + fy, 12 + fx))
            assert p.shape == (16, 16)
            assert p.min() >= 0 and p.max() <= 255
    for fy in range(8):
        for fx in range(8):
            c = HP._mc_chroma([ref[:24, :32]] * 2, 0, 0, (fy, fx))
            assert c[0].shape == (8, 8) and 0 <= c[0].min() <= c[0].max() <= 255
    # j != round-then-filter on a ramp-free random block (regression
    # guard for the unrounded-intermediate requirement)
    W = ref[14:36, 28:50].astype(np.int64)
    b1 = HP._hfilt(W, axis=1)
    j_spec = np.clip((HP._hfilt(b1, axis=0) + 512) >> 10, 0, 255)
    b_rounded = np.clip((b1 + 16) >> 5, 0, 255)
    j_wrong = np.clip((HP._hfilt(b_rounded, axis=0) + 16) >> 5, 0, 255)
    assert not np.array_equal(j_spec, j_wrong)
    # half-pel content: frame k = bilinear half-shift of frame k-1
    yy, xx = np.mgrid[0:48, 0:64]
    base = ((np.sin(yy / 6.0) + np.cos(xx / 7.0)) * 60 + 128).astype(
        np.uint8
    )
    prev = base.astype(np.int64)
    nxt = np.clip((prev + np.roll(prev, 1, axis=1) + 1) // 2, 0, 255).astype(
        np.uint8
    )
    nal0, ry, rc = HI.encode_idr_frame_i16(
        base, qp=12, return_recon=True, return_chroma=True
    )
    nal1, ry1, _ = HP.encode_p_frame(nxt, ry, rc, qp=12)
    sps, pps = _sps_pps(64, 48)
    dy, _ = HP.decode_p_frame(nal1, sps, pps, ry, rc)
    assert np.array_equal(dy, ry1)
    assert len(nal1) * 3 < len(nal0)
    assert np.abs(ry1.astype(int) - nxt.astype(int)).max() <= 4


def test_decoder_rejects_out_of_scope_streams():
    frames = _moving_frames(2)
    sps, pps = _sps_pps(64, 48)
    _n, ry, rc = HI.encode_idr_frame_i16(
        frames[0], qp=12, return_recon=True, return_chroma=True
    )
    nal, _, _ = HP.encode_p_frame(frames[1], ry, rc, qp=12)
    with pytest.raises(ValueError, match="non-IDR"):
        HP.decode_p_frame(b"\x65" + nal[1:], sps, pps, ry, rc)
    with pytest.raises(ValueError, match="dimensions mismatch"):
        HP.decode_p_frame(nal, sps, pps, ry[:32, :32],
                          [c[:16, :16] for c in rc])


def test_bit_flip_fuzz_decode_or_valueerror():
    """Corrupted P slices decode or raise ValueError — never hang,
    never leak a raw exception (the codec family's contract)."""
    frames = _moving_frames(2, shape=(32, 32), seed=9)
    sps, pps = _sps_pps(32, 32)
    _n, ry, rc = HI.encode_idr_frame_i16(
        frames[0], qp=12, return_recon=True, return_chroma=True
    )
    nal = bytearray(HP.encode_p_frame(frames[1], ry, rc, qp=12)[0])
    rng = np.random.default_rng(13)
    n_bits = len(nal) * 8
    outcomes = {"ok": 0, "valueerror": 0}
    for _ in range(3000):
        i = int(rng.integers(8, n_bits))
        mut = bytearray(nal)
        mut[i // 8] ^= 1 << (7 - (i % 8))
        try:
            HP.decode_p_frame(bytes(mut), sps, pps, ry, rc)
            outcomes["ok"] += 1
        except ValueError:
            outcomes["valueerror"] += 1
    assert sum(outcomes.values()) == 3000
    assert outcomes["valueerror"] > 0


def test_gop_truncation_raises():
    frames = _moving_frames(3, shape=(16, 16))
    gop = H.encode_mp4_h264(frames, codec="i16p", qp=12)
    for cut in range(8, len(gop), 97):
        try:
            H.decode_mp4_h264(gop[:cut])
        except ValueError:
            pass
