"""CABAC B-slice tests (operators/h264_cabac.py, r12): encoder/decoder
parity, cross-entropy-coder pixel identity with the CAVLC B tier
(shared analysis), the i16pb_cabac GOP container, rate sanity, and the
corrupted-stream ValueError contract."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_trip_processing_project_spark.operators import (
    h264 as H,
    h264_b as HB,
    h264_cabac as C,
    h264_inter as HP,
    h264_intra as HI,
)


def _sps_pps(w: int, h: int):
    sps = H.parse_sps(H.encode_sps(w, h, max_ref=2, poc_type=0))
    pps = H.parse_pps(H.encode_pps(deblocking_control=True, cabac=True))
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


def _bracket(frames, qp=12):
    _n, r0y, r0c = HI.encode_idr_frame_i16(
        frames[0], qp=qp, return_recon=True, return_chroma=True
    )
    _n2, r2y, r2c = HP.encode_p_frame(frames[2], r0y, r0c, qp=qp,
                                      frame_num=1)
    return (r0y, r0c), (r2y, r2c)


def test_cabac_b_roundtrip_and_cross_coder_pixels():
    """Decoder reconstruction equals the encoder's bit-for-bit AND the
    CAVLC B frame's exactly (shared per-list search, SAD mode decision
    and residual analysis); the arithmetic coder must not lose rate
    materially."""
    frames = _moving_frames(3)
    sps, pps = _sps_pps(64, 48)
    (r0y, r0c), (r2y, r2c) = _bracket(frames)
    nal_c, by, bc = C.encode_b_frame_cabac(
        frames[1], r0y, r0c, r2y, r2c, qp=12, frame_num=2, poc_lsb=2
    )
    dy, dc = C.decode_b_frame_cabac(nal_c, sps, pps,
                                    r0y, r0c, r2y, r2c)
    assert np.array_equal(dy, by)
    assert all(np.array_equal(a, b) for a, b in zip(dc, bc))
    nal_v, bv, _ = HB.encode_b_frame(
        frames[1], r0y, r0c, r2y, r2c, qp=12
    )
    assert np.array_equal(by, bv), "cross-coder pixel divergence"
    assert len(nal_c) <= 1.1 * len(nal_v)
    assert nal_c[0] == 0x01  # non-reference NAL


def test_cabac_b_gop_container_matches_cavlc_pixels():
    frames = _moving_frames(7)
    bc = H.encode_mp4_h264(frames, codec="i16pb_cabac", qp=12)
    bv = H.encode_mp4_h264(frames, codec="i16pb", qp=12)
    info = H.parse_mp4(bc)
    assert info["index_consistent"]
    assert info["pps"]["entropy_coding_mode"] == 1
    assert info["sps"]["poc_type"] == 0
    assert info["sync_samples"] == [0]
    assert info["ctts_offsets"] == [100, 200, 0, 200, 0, 200, 0]
    _s, dcc = H.decode_mp4_h264(bc)
    _s, dvv = H.decode_mp4_h264(bv)
    assert [i for i, _f in dcc] == list(range(len(frames)))
    assert [i for i, _f in dcc] == [i for i, _f in dvv]
    for (_, a), (_, b) in zip(dcc, dvv):
        assert np.array_equal(a, b)
    # display-index sampling works through the CABAC GOP too
    _s, d3 = H.decode_mp4_h264(bc, every_nth=3)
    assert [i for i, _f in d3] == [0, 3, 6]


def test_cabac_b_decoder_rejects_out_of_scope():
    frames = _moving_frames(3)
    sps, pps = _sps_pps(64, 48)
    (r0y, r0c), (r2y, r2c) = _bracket(frames)
    nal, _, _ = C.encode_b_frame_cabac(
        frames[1], r0y, r0c, r2y, r2c, qp=12
    )
    with pytest.raises(ValueError, match="non-IDR"):
        C.decode_b_frame_cabac(b"\x65" + nal[1:], sps, pps,
                               r0y, r0c, r2y, r2c)
    with pytest.raises(ValueError, match="reference B"):
        C.decode_b_frame_cabac(b"\x41" + nal[1:], sps, pps,
                               r0y, r0c, r2y, r2c)
    with pytest.raises(ValueError, match="dimensions mismatch"):
        C.decode_b_frame_cabac(nal, sps, pps, r0y[:32, :32],
                               [c[:16, :16] for c in r0c], r2y, r2c)
    # a CAVLC B NAL is not CABAC-decodable: the engine reads garbage
    # and must fail as a data error somewhere in the slice
    nal_v, _, _ = HB.encode_b_frame(frames[1], r0y, r0c, r2y, r2c, qp=12)
    with pytest.raises(ValueError):
        C.decode_b_frame_cabac(nal_v, sps, pps, r0y, r0c, r2y, r2c)


def test_cabac_b_bit_flip_fuzz():
    frames = _moving_frames(3, shape=(32, 32), seed=9)
    sps, pps = _sps_pps(32, 32)
    (r0y, r0c), (r2y, r2c) = _bracket(frames)
    nal = bytearray(
        C.encode_b_frame_cabac(frames[1], r0y, r0c, r2y, r2c, qp=12)[0]
    )
    rng = np.random.default_rng(13)
    n_bits = len(nal) * 8
    outcomes = {"ok": 0, "valueerror": 0}
    for _ in range(2000):
        i = int(rng.integers(8, n_bits))
        mut = bytearray(nal)
        mut[i // 8] ^= 1 << (7 - (i % 8))
        try:
            C.decode_b_frame_cabac(bytes(mut), sps, pps,
                                   r0y, r0c, r2y, r2c)
            outcomes["ok"] += 1
        except ValueError:
            outcomes["valueerror"] += 1
    assert sum(outcomes.values()) == 2000
    assert outcomes["valueerror"] > 0


def test_cabac_b_gop_truncation_raises():
    frames = _moving_frames(4, shape=(16, 16))
    bc = H.encode_mp4_h264(frames, codec="i16pb_cabac", qp=12)
    for cut in range(8, len(bc), 97):
        try:
            H.decode_mp4_h264(bc[:cut])
        except ValueError:
            pass
