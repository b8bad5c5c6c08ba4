"""B-frame tier tests (operators/h264_b.py): refIdx-aware per-list MV
prediction, encoder/decoder reference parity, bi-prediction rate wins,
the i16pb GOP container with its ctts composition-offset box and
display-order emission, non-reference isolation (a corrupted B cannot
drift the GOP), and the corrupted-stream ValueError contract."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_trip_processing_project_spark.operators import (
    h264 as H,
    h264_b as HB,
    h264_inter as HP,
    h264_intra as HI,
)


def _sps_pps(w: int, h: int):
    sps = H.parse_sps(H.encode_sps(w, h, max_ref=2, poc_type=0))
    pps = H.parse_pps(H.encode_pps(deblocking_control=True))
    return sps, pps


def _moving_frames(n=7, shape=(48, 64), seed=21):
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


def _noisy_static(n=3, shape=(48, 64), sigma=6, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    clean = (np.sin(yy / 6.0) + np.cos(xx / 7.0)) * 60 + 128
    return np.stack(
        [
            np.clip(clean + rng.normal(0, sigma, shape), 0, 255).astype(
                np.uint8
            )
            for _ in range(n)
        ]
    )


def _bracket(frames, qp=12):
    """IDR(f0) and P(f2) reconstructions — a B(f1)'s two references."""
    _n, r0y, r0c = HI.encode_idr_frame_i16(
        frames[0], qp=qp, return_recon=True, return_chroma=True
    )
    _n2, r2y, r2c = HP.encode_p_frame(frames[2], r0y, r0c, qp=qp,
                                      frame_num=1)
    return (r0y, r0c), (r2y, r2c)


def test_poc_type0_sps_roundtrip():
    sps = H.parse_sps(H.encode_sps(64, 48, max_ref=2, poc_type=0))
    assert sps["poc_type"] == 0
    assert sps["log2_max_poc_lsb"] == H.POC_LSB_BITS
    assert sps["max_num_ref_frames"] == 2
    # the poc_type-2 tiers are untouched
    sps2 = H.parse_sps(H.encode_sps(64, 48, max_ref=1))
    assert sps2["poc_type"] == 2 and sps2["log2_max_poc_lsb"] is None


def test_slice_kind_peek():
    frames = _moving_frames(3)
    (r0y, r0c), (r2y, r2c) = _bracket(frames)
    idr, _, _ = HI.encode_idr_frame_i16(
        frames[0], qp=12, return_recon=True, return_chroma=True,
        poc_lsb=0,
    )
    p, _, _ = HP.encode_p_frame(frames[2], r0y, r0c, qp=12, poc_lsb=4)
    b, _, _ = HB.encode_b_frame(frames[1], r0y, r0c, r2y, r2c, qp=12)
    assert H.slice_kind(idr) == 2
    assert H.slice_kind(p) == 0
    assert H.slice_kind(b) == 1


def test_mv_pred_b_is_refidx_aware():
    """A neighbor that did not predict from list X contributes (0,0)
    and a non-matching refIdx — the exactly-one-match shortcut then
    returns the single matching neighbor's vector verbatim
    (8.4.1.3.1), which the list-blind P predictor cannot produce."""
    mvs = np.zeros((2, 3, 3, 2), dtype=np.int64)
    used = np.zeros((2, 3, 3), dtype=bool)
    # first MB: nothing available
    assert HB._mv_pred_b(mvs, used, 0, 0, 3, 0) == (0, 0)
    # top row: B/C unavailable -> mvA verbatim (if A used the list)
    mvs[0, 0, 0] = (8, 16)
    used[0, 0, 0] = True
    assert HB._mv_pred_b(mvs, used, 0, 1, 3, 0) == (8, 16)
    # ...but for list 1 (A never used it) the predictor is (0,0):
    # mvA is (0,0) by step 1 of 8.4.1.3.1
    assert HB._mv_pred_b(mvs, used, 0, 1, 3, 1) == (0, 0)
    # interior, exactly ONE neighbor used list 1 -> its mv verbatim
    mvs[1, 0, 1] = (40, -12)
    used[1, 0, 1] = True  # B neighbor of (1,1)
    mvs[0, 1, 0] = (4, 4)
    used[0, 1, 0] = True
    mvs[0, 0, 2] = (20, 20)
    used[0, 0, 2] = True
    assert HB._mv_pred_b(mvs, used, 1, 1, 3, 1) == (40, -12)
    # same position, list 0: A=(4,4), B=(0,0) unused, C=(20,20) ->
    # three candidates, two matching -> median
    assert HB._mv_pred_b(mvs, used, 1, 1, 3, 0) == (
        HP._median3(4, 0, 20),
        HP._median3(4, 0, 20),
    )


def test_b_frame_roundtrip_reference_parity():
    """Decoder reconstruction equals the encoder's bit-for-bit, and the
    B frame lands within the quantizer error bound of the source."""
    frames = _moving_frames(3)
    sps, pps = _sps_pps(64, 48)
    (r0y, r0c), (r2y, r2c) = _bracket(frames)
    nal, by, bc = HB.encode_b_frame(
        frames[1], r0y, r0c, r2y, r2c, qp=12, frame_num=2, poc_lsb=2
    )
    dy, dc = HB.decode_b_frame(nal, sps, pps, r0y, r0c, r2y, r2c)
    assert np.array_equal(dy, by)
    assert all(np.array_equal(a, b) for a, b in zip(dc, bc))
    err = np.abs(by.astype(int) - frames[1].astype(int))
    assert err.max() <= 8 and err.mean() <= 1.0
    # all three coded mb_types appear across a varied GOP eventually;
    # at minimum the stream decodes with some bi/list mix (smoke: the
    # NAL is a non-reference type-1 slice)
    assert nal[0] == 0x01


def test_bi_prediction_beats_p_on_noisy_content():
    """The statistical point of bi-prediction: averaging two noisy
    references halves the reference-noise variance, so coding the same
    frame as B (past+future) beats coding it as P (past only) —
    five fixed-seed trials, every one must win."""
    for seed in range(5):
        frames = _noisy_static(3, sigma=6, seed=seed)
        (r0y, r0c), (r2y, r2c) = _bracket(frames)
        nal_p, _, _ = HP.encode_p_frame(frames[1], r0y, r0c, qp=12)
        nal_b, _, _ = HB.encode_b_frame(
            frames[1], r0y, r0c, r2y, r2c, qp=12
        )
        assert len(nal_b) < len(nal_p), (seed, len(nal_b), len(nal_p))


def test_b_gop_container_ctts_and_display_order():
    frames = _moving_frames(7)
    bgop = H.encode_mp4_h264(frames, codec="i16pb", qp=12)
    alli = H.encode_mp4_h264(frames, codec="i16", qp=12)
    assert len(bgop) < 0.6 * len(alli)
    info = H.parse_mp4(bgop)
    assert info["index_consistent"]
    assert info["sync_samples"] == [0]
    # decode-order samples I P B P B P B -> ctts offsets 1/2/0 ticks
    assert info["ctts_offsets"] == [100, 200, 0, 200, 0, 200, 0]
    assert info["sps"]["poc_type"] == 0
    sps, dec = H.decode_mp4_h264(bgop)
    assert [i for i, _ in dec] == list(range(len(frames)))
    for i, fr in dec:
        assert np.abs(fr.astype(int) - frames[i].astype(int)).max() <= 8
    # sampling selects DISPLAY indexes on the reordered stream
    _sps, dec3 = H.decode_mp4_h264(bgop, every_nth=3)
    assert [i for i, _ in dec3] == [0, 3, 6]
    full = {i: f for i, f in dec}
    for i, fr in dec3:
        assert np.array_equal(fr, full[i])
    # trailing-P shape: an even frame count ends with a distance-1 P
    bgop4 = H.encode_mp4_h264(frames[:4], codec="i16pb", qp=12)
    info4 = H.parse_mp4(bgop4)
    assert info4["ctts_offsets"] == [100, 200, 0, 100]
    _s, dec4 = H.decode_mp4_h264(bgop4)
    assert [i for i, _ in dec4] == [0, 1, 2, 3]


def test_spatial_direct_derivation_rules():
    """8.4.1.2.2 unit cases: directZeroPrediction when no neighbor
    references exist; colZeroFlag zeroing a refIdx-0 list; the median
    predictor otherwise."""
    mvs = np.zeros((2, 2, 2, 2), dtype=np.int64)
    used = np.zeros((2, 2, 2), dtype=bool)
    # first MB, no neighbors: directZeroPrediction -> bi, zero mvs
    assert HB._direct_mvs(mvs, used, 0, 0, 2, None) == (
        True, True, (0, 0), (0, 0)
    )
    # left neighbor used L0 only -> refIdxL0=0, refIdxL1=-1
    mvs[0, 0, 0] = (8, 4)
    used[0, 0, 0] = True
    d0, d1, mv0, _mv1 = HB._direct_mvs(mvs, used, 0, 1, 2, None)
    assert (d0, d1) == (True, False)
    assert mv0 == (8, 4)  # mvA verbatim (top row rule, col intra)
    # colZeroFlag: colocated P MB with |mv| <= 1 quarter-pel zeroes it
    col = np.zeros((2, 2, 2), dtype=np.int64)
    col[0, 1] = (1, -1)
    d0, d1, mv0, _mv1 = HB._direct_mvs(mvs, used, 0, 1, 2, col)
    assert d0 and mv0 == (0, 0)
    # colocated moving (|mv| > 1) -> median predictor again
    col[0, 1] = (8, 0)
    d0, d1, mv0, _mv1 = HB._direct_mvs(mvs, used, 0, 1, 2, col)
    assert mv0 == (8, 4)


def test_b_skip_collapses_static_content():
    """A B frame between two reconstructions of the SAME source frame
    codes as (near-)pure skips — an order of magnitude below the
    pre-skip rate (726 B measured for the explicit-mode-only encoder
    on moving content) — and still decodes bit-exactly.  The skip run
    requires the decoder to replay the spatial-direct derivation with
    the colocated P motion field."""
    rng = np.random.default_rng(5)
    f = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    sps, pps = _sps_pps(64, 48)
    _n, r0y, r0c = HI.encode_idr_frame_i16(
        f, qp=12, return_recon=True, return_chroma=True
    )
    _n2, r2y, r2c, pmvs = HP.encode_p_frame(
        f, r0y, r0c, qp=12, frame_num=1, return_mvs=True
    )
    nal, by, bc = HB.encode_b_frame(
        f, r0y, r0c, r2y, r2c, qp=12, col_mvs=pmvs
    )
    assert len(nal) < 128, len(nal)  # measures 84 B for 12 MBs
    dy, dc = HB.decode_b_frame(nal, sps, pps, r0y, r0c, r2y, r2c,
                               col_mvs=pmvs)
    assert np.array_equal(dy, by)
    assert all(np.array_equal(a, b) for a, b in zip(dc, bc))
    err = np.abs(by.astype(int) - f.astype(int))
    assert err.max() <= 8


def test_b_direct_state_feeds_later_predictions():
    """The derived direct motion becomes the MB's state: encode a B
    whose first MBs skip, then verify decode parity on content that
    forces later explicit MBs to predict from the direct neighbors
    (mixed skip/coded slice)."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    # right half changes between refs -> explicit modes; left half
    # static -> skips whose derived mvs neighbor the explicit MBs
    f2 = base.copy()
    f2[:, 32:] = rng.integers(0, 256, (48, 32))
    mid = base.copy()
    mid[:, 32:] = np.clip(
        (base[:, 32:].astype(int) + f2[:, 32:].astype(int) + 1) // 2,
        0, 255,
    ).astype(np.uint8)
    sps, pps = _sps_pps(64, 48)
    _n, r0y, r0c = HI.encode_idr_frame_i16(
        base, qp=12, return_recon=True, return_chroma=True
    )
    _n2, r2y, r2c, pmvs = HP.encode_p_frame(
        f2, r0y, r0c, qp=12, frame_num=1, return_mvs=True
    )
    nal, by, bc = HB.encode_b_frame(
        mid, r0y, r0c, r2y, r2c, qp=12, col_mvs=pmvs
    )
    dy, dc = HB.decode_b_frame(nal, sps, pps, r0y, r0c, r2y, r2c,
                               col_mvs=pmvs)
    assert np.array_equal(dy, by)
    assert all(np.array_equal(a, b) for a, b in zip(dc, bc))


def test_temporal_direct_scaling_and_dispatch():
    """Temporal direct (8.4.1.2.3) under the ladder geometry: the
    proportional split mvL0 = (129·mvCol + 128) >> 8, mvL1 = mvL0 −
    mvCol; always bi-predictive; decoder dispatches on the parsed
    direct_spatial_mv_pred_flag, so spatial and temporal streams of
    the same frames both roundtrip bit-exactly."""
    col = np.zeros((1, 2, 2), dtype=np.int64)
    col[0, 0] = (16, 32)  # colocated P moved (4, 8) pel
    d0, d1, mv0, mv1 = HB._direct_mvs_temporal(0, 0, col)
    assert (d0, d1) == (True, True)
    assert mv0 == ((129 * 16 + 128) >> 8, (129 * 32 + 128) >> 8) == (8, 16)
    assert mv1 == (8 - 16, 16 - 32)
    col[0, 1] = (-16, 3)  # negative + odd components
    _d0, _d1, mv0, mv1 = HB._direct_mvs_temporal(0, 1, col)
    assert mv0 == ((129 * -16 + 128) >> 8, (129 * 3 + 128) >> 8)
    assert mv1 == (mv0[0] + 16, mv0[1] - 3)
    # intra colocated -> zero bi-prediction
    assert HB._direct_mvs_temporal(0, 0, None) == (
        True, True, (0, 0), (0, 0)
    )
    # end-to-end: temporal-direct B frame roundtrips; its stream
    # DIFFERS from the spatial one (the flag flips the derivation)
    frames = _moving_frames(3)
    sps, pps = _sps_pps(64, 48)
    _n, r0y, r0c = HI.encode_idr_frame_i16(
        frames[0], qp=12, return_recon=True, return_chroma=True
    )
    _n2, r2y, r2c, pmvs = HP.encode_p_frame(
        frames[2], r0y, r0c, qp=12, frame_num=1, return_mvs=True
    )
    nal_t, by_t, bc_t = HB.encode_b_frame(
        frames[1], r0y, r0c, r2y, r2c, qp=12, col_mvs=pmvs,
        direct_mode="temporal",
    )
    nal_s, _by_s, _bc_s = HB.encode_b_frame(
        frames[1], r0y, r0c, r2y, r2c, qp=12, col_mvs=pmvs,
        direct_mode="spatial",
    )
    assert nal_t != nal_s
    dy, dc = HB.decode_b_frame(nal_t, sps, pps, r0y, r0c, r2y, r2c,
                               col_mvs=pmvs)
    assert np.array_equal(dy, by_t)
    assert all(np.array_equal(a, b) for a, b in zip(dc, bc_t))
    with pytest.raises(ValueError, match="direct_mode"):
        HB.encode_b_frame(frames[1], r0y, r0c, r2y, r2c, qp=12,
                          direct_mode="nope")


def test_temporal_direct_gop_cross_coder_identity():
    """i16pb / i16pb_cabac GOPs with b_direct='temporal' decode in
    display order within the distortion bound and pixel-identical to
    each other (shared _decide_mb)."""
    frames = _moving_frames(7)
    td = H.encode_mp4_h264(frames, codec="i16pb", qp=12,
                           b_direct="temporal")
    tdc = H.encode_mp4_h264(frames, codec="i16pb_cabac", qp=12,
                            b_direct="temporal")
    _s, dt = H.decode_mp4_h264(td)
    _s, dtc = H.decode_mp4_h264(tdc)
    assert [i for i, _f in dt] == list(range(len(frames)))
    for (_, a), (_, b) in zip(dt, dtc):
        assert np.array_equal(a, b)
    for i, fr in dt:
        assert np.abs(fr.astype(int) - frames[i].astype(int)).max() <= 8


def test_weighted_biprediction_beats_default_on_flash():
    """Explicit weighted prediction (r12, weighted_bipred_idc 2 +
    pred_weight_table): a B frame 1.3× brighter than both references
    codes at a fraction of the default-bipred rate once the estimated
    scale/offset corrects the references — and decodes bit-exactly
    through the weighted PPS."""
    rng = np.random.default_rng(9)
    base = rng.integers(40, 160, (48, 64)).astype(np.uint8)
    f2 = np.clip(
        base.astype(np.int64) + rng.integers(-2, 3, (48, 64)), 0, 255
    ).astype(np.uint8)
    f1 = np.clip(
        base.astype(np.float64) * 1.3 + rng.normal(0, 2, (48, 64)),
        0, 255,
    ).astype(np.uint8)
    _n, r0y, r0c = HI.encode_idr_frame_i16(
        base, qp=12, return_recon=True, return_chroma=True
    )
    _n2, r2y, r2c, pmvs = HP.encode_p_frame(
        f2, r0y, r0c, qp=12, frame_num=1, return_mvs=True
    )
    w = HB.estimate_weights(f1, r0y, r2y)
    # the least-squares estimate recovers the 1.3x gain (83/64 = 1.297)
    assert all(78 <= wi <= 88 for wi, _oi in w), w
    plain, _, _ = HB.encode_b_frame(f1, r0y, r0c, r2y, r2c, qp=12,
                                    col_mvs=pmvs)
    wnal, wy, wc = HB.encode_b_frame(
        f1, r0y, r0c, r2y, r2c, qp=12, col_mvs=pmvs, weights=w
    )
    assert len(wnal) < 0.6 * len(plain), (len(wnal), len(plain))
    sps = H.parse_sps(H.encode_sps(64, 48, max_ref=2, poc_type=0))
    ppsw = H.parse_pps(H.encode_pps(deblocking_control=True,
                                    weighted_b=True))
    assert ppsw["weighted_bipred_idc"] == 2
    dy, dc = HB.decode_b_frame(wnal, sps, ppsw, r0y, r0c, r2y, r2c,
                               col_mvs=pmvs)
    assert np.array_equal(dy, wy)
    assert all(np.array_equal(a, b) for a, b in zip(dc, wc))
    err = np.abs(wy.astype(int) - f1.astype(int))
    assert err.max() <= 8 and err.mean() <= 1.0
    # extreme gain clips into the spec's se(v) weight range
    bright = np.clip(base.astype(np.int64) * 4, 0, 255).astype(np.uint8)
    wx = HB.estimate_weights(bright, r0y, r2y)
    assert all(-128 <= v <= 127 for pair in wx for v in pair)


def test_weighted_b_gop_flicker_and_cross_coder():
    """codec='i16pb'+b_weighted on exposure-flicker content: the
    weighted GOP beats the default one, decodes within the distortion
    bound in display order, and stays pixel-identical to its CABAC
    twin (shared decision + weights)."""
    rng = np.random.default_rng(9)
    base = rng.integers(40, 160, (48, 64)).astype(np.int64)
    frames = np.stack([
        np.clip(
            base * (1.0 if k % 2 == 0 else 1.3)
            + rng.normal(0, 2, (48, 64)),
            0, 255,
        ).astype(np.uint8)
        for k in range(7)
    ])
    plain = H.encode_mp4_h264(frames, codec="i16pb", qp=12)
    wgt = H.encode_mp4_h264(frames, codec="i16pb", qp=12,
                            b_weighted=True)
    wgt_c = H.encode_mp4_h264(frames, codec="i16pb_cabac", qp=12,
                              b_weighted=True)
    assert len(wgt) < 0.9 * len(plain), (len(wgt), len(plain))
    info = H.parse_mp4(wgt)
    assert info["index_consistent"]
    _s, dw = H.decode_mp4_h264(wgt)
    _s, dwc = H.decode_mp4_h264(wgt_c)
    assert [i for i, _f in dw] == list(range(7))
    for (_, a), (_, b) in zip(dw, dwc):
        assert np.array_equal(a, b)
    for i, fr in dw:
        assert np.abs(fr.astype(int) - frames[i].astype(int)).max() <= 8


def test_corrupted_b_cannot_drift_the_gop():
    """B frames are non-reference: zeroing a B sample's NAL in mdat
    (type 0 -> skipped) must leave every other frame bit-identical —
    the structural guarantee that B error never propagates."""
    frames = _moving_frames(5)
    bgop = bytearray(H.encode_mp4_h264(frames, codec="i16pb", qp=12))
    info = H.parse_mp4(bytes(bgop))
    _sps, clean = H.decode_mp4_h264(bytes(bgop))
    # sample 2 is the first B (decode order I P B P B)
    off, size = info["samples"][2]
    ls = info["length_size"]
    assert bgop[off + ls] & 0x1F == 1 and bgop[off + ls] >> 5 == 0
    for k in range(ls, size):
        bgop[off + k] = 0
    _sps, got = H.decode_mp4_h264(bytes(bgop))
    clean_map = dict(clean)
    got_map = dict(got)
    assert 1 not in got_map  # the zeroed B (display 1) vanished
    for i, fr in clean_map.items():
        if i == 1:
            continue
        assert np.array_equal(fr, got_map[i]), f"frame {i} drifted"


def test_decoder_rejects_out_of_scope_streams():
    frames = _moving_frames(3)
    sps, pps = _sps_pps(64, 48)
    (r0y, r0c), (r2y, r2c) = _bracket(frames)
    nal, _, _ = HB.encode_b_frame(frames[1], r0y, r0c, r2y, r2c, qp=12)
    with pytest.raises(ValueError, match="non-IDR"):
        HB.decode_b_frame(b"\x65" + nal[1:], sps, pps,
                          r0y, r0c, r2y, r2c)
    with pytest.raises(ValueError, match="reference B"):
        HB.decode_b_frame(b"\x41" + nal[1:], sps, pps,
                          r0y, r0c, r2y, r2c)
    p_nal, _, _ = HP.encode_p_frame(frames[2], r0y, r0c, qp=12, poc_lsb=4)
    with pytest.raises(ValueError, match="not a B slice"):
        # nal_ref_idc stripped so the slice_type check is reached
        HB.decode_b_frame(b"\x01" + p_nal[1:], sps, pps,
                          r0y, r0c, r2y, r2c)
    with pytest.raises(ValueError, match="dimensions mismatch"):
        HB.decode_b_frame(nal, sps, pps, r0y[:32, :32],
                          [c[:16, :16] for c in r0c], r2y, r2c)


def test_bit_flip_fuzz_decode_or_valueerror():
    """Corrupted B slices decode or raise ValueError — never hang,
    never leak a raw exception (the codec family's contract)."""
    frames = _moving_frames(3, shape=(32, 32), seed=9)
    sps, pps = _sps_pps(32, 32)
    (r0y, r0c), (r2y, r2c) = _bracket(frames)
    nal = bytearray(
        HB.encode_b_frame(frames[1], r0y, r0c, r2y, r2c, qp=12)[0]
    )
    rng = np.random.default_rng(13)
    n_bits = len(nal) * 8
    outcomes = {"ok": 0, "valueerror": 0}
    for _ in range(3000):
        i = int(rng.integers(8, n_bits))
        mut = bytearray(nal)
        mut[i // 8] ^= 1 << (7 - (i % 8))
        try:
            HB.decode_b_frame(bytes(mut), sps, pps,
                              r0y, r0c, r2y, r2c)
            outcomes["ok"] += 1
        except ValueError:
            outcomes["valueerror"] += 1
    assert sum(outcomes.values()) == 3000
    assert outcomes["valueerror"] > 0


def test_b_gop_truncation_raises():
    frames = _moving_frames(4, shape=(16, 16))
    bgop = H.encode_mp4_h264(frames, codec="i16pb", qp=12)
    for cut in range(8, len(bgop), 97):
        try:
            H.decode_mp4_h264(bgop[:cut])
        except ValueError:
            pass
