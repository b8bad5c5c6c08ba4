"""Intra_16x16 + CAVLC tier tests (operators/h264_intra.py,
operators/h264_cavlc.py).

No external H.264 decoder exists in this container, so conformance
rests on: (a) every VLC table prefix-free, (b) the published CAVLC
worked example (Richardson, "H.264 and MPEG-4 Video Compression",
§6.4.13 / the classic TotalCoeffs=5 block) reproduced bit-for-bit,
(c) §9.2.2 level-escape boundaries hit explicitly, (d) encode→decode
identity fuzz across the full parameter space, and (e) decoder output
== the encoder's own reconstruction loop EXACTLY (the normative-inverse
property), with PSNR floors for distortion vs source.
"""

from __future__ import annotations

import numpy as np
import pytest

from real_time_trip_processing_project_spark.operators import h264 as H
from real_time_trip_processing_project_spark.operators import (
    h264_cavlc as CV,
)
from real_time_trip_processing_project_spark.operators import (
    h264_intra as HI,
)
from real_time_trip_processing_project_spark.operators.h264 import (
    BitReader,
    BitWriter,
)

PPS_I16 = H.parse_pps(H.encode_pps(deblocking_control=True))


def _sps(w, h):
    return H.parse_sps(H.encode_sps(w, h))


# ---------------------------------------------------------------------------
# CAVLC tables + bit codec


def _assert_prefix_free(tbl, name):
    codes = list(tbl.values())
    assert len(set(codes)) == len(codes), f"{name}: duplicate codes"
    for l1, c1 in codes:
        for l2, c2 in codes:
            if (l1, c1) != (l2, c2) and l1 < l2 and (c2 >> (l2 - l1)) == c1:
                raise AssertionError(
                    f"{name}: {c1:0{l1}b} prefixes {c2:0{l2}b}"
                )


def test_all_vlc_tables_prefix_free():
    for nm, t in (
        ("coeff_token nc<2", CV.COEFF_TOKEN_NC0),
        ("coeff_token nc<4", CV.COEFF_TOKEN_NC2),
        ("coeff_token nc<8", CV.COEFF_TOKEN_NC4),
        ("coeff_token chroma-dc", CV.COEFF_TOKEN_CHROMA_DC),
    ):
        _assert_prefix_free(t, nm)
        # full (T1 <= min(3, tc), tc) domain present
        maxtc = 4 if t is CV.COEFF_TOKEN_CHROMA_DC else 16
        for tc in range(maxtc + 1):
            for t1 in range(min(3, tc) + 1):
                assert (t1, tc) in t, (nm, t1, tc)
    for k, t in CV.TOTAL_ZEROS_4x4.items():
        _assert_prefix_free(t, f"total_zeros[{k}]")
        assert len(t) == 17 - k  # total_zeros in 0..16-tc
    for k, t in CV.TOTAL_ZEROS_CHROMA_DC.items():
        _assert_prefix_free(t, f"chroma_total_zeros[{k}]")
        assert len(t) == 5 - k
    for k, t in CV.RUN_BEFORE.items():
        _assert_prefix_free(t, f"run_before[{k}]")


def test_published_cavlc_worked_example():
    """The classic published example: zigzag coefficients
    0,3,0,1,-1,-1,0,1,0... with nC=0 encodes to the exact 24-bit
    string 000010001110010111101101 (TotalCoeffs=5, T1=3,
    total_zeros=3)."""
    coeffs = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    bw = BitWriter()
    tc = CV.write_residual_block(bw, coeffs, 0, 16)
    assert tc == 5
    bw.rbsp_trailing_bits()  # flush: appended bits land after the vector
    got = bw.getvalue()
    bits = "".join(f"{b:08b}" for b in got)[:24]
    assert bits == "000010001110010111101101"
    # and it decodes back
    br = BitReader(got)
    dec, tc2 = CV.read_residual_block(br, 0, 16)
    assert dec == coeffs and tc2 == 5


def test_level_escape_boundaries():
    """§9.2.2 boundary magnitudes: the prefix-14 4-bit escape at
    suffixLength 0 and the prefix-15 12-bit escape band edges must all
    roundtrip (these are the values where hand-rolled CAVLC coders
    classically corrupt the stream)."""
    for mag in (7, 8, 15, 16, 2047, 2048, 2064, 4096, 10000, 100000):
        for sign in (1, -1):
            coeffs = [sign * mag] + [0] * 15
            bw = BitWriter()
            CV.write_residual_block(bw, coeffs, 0, 16)
            bw.rbsp_trailing_bits()
            dec, _ = CV.read_residual_block(BitReader(bw.getvalue()), 0, 16)
            assert dec == coeffs, (mag, sign, dec[:2])


def test_cavlc_roundtrip_fuzz():
    import random

    rng = random.Random(7)
    for _ in range(4000):
        max_coeffs = rng.choice([4, 15, 16])
        nc = -1 if max_coeffs == 4 else rng.choice([0, 1, 3, 5, 7, 8, 20])
        n_nz = rng.randint(0, max_coeffs)
        coeffs = [0] * max_coeffs
        mag = rng.choice([1, 2, 6, 30, 300, 3000, 30000])
        for p in rng.sample(range(max_coeffs), n_nz):
            v = 0
            while v == 0:
                v = rng.randint(-mag, mag)
            coeffs[p] = v
        bw = BitWriter()
        tc = CV.write_residual_block(bw, coeffs, nc, max_coeffs)
        bw.rbsp_trailing_bits()
        got, tc2 = CV.read_residual_block(
            BitReader(bw.getvalue()), nc, max_coeffs
        )
        assert got == coeffs and tc == tc2 == n_nz


# ---------------------------------------------------------------------------
# Transforms


def test_core_transform_identity():
    rng = np.random.default_rng(3)
    for _ in range(50):
        blk = rng.integers(-255, 256, (4, 4)).astype(np.int64)
        # qp=0: finest quantizer — quant∘rescale is x4 per class, the
        # inverse transform's >>6 absorbs the x16 forward gain
        lv = HI.quant4x4(HI.fwd4x4(blk), 0, skip_dc=False)
        r = HI.inv4x4(HI.dequant4x4(lv, 0))
        assert np.abs(r - blk).max() <= 1


def test_dc_paths_land_in_dequant_domain():
    """The DC chains must deliver 4·W00 — the same x4 dequantized
    domain as the AC path — or smooth content reconstructs wrong (the
    bug class this pins: a 1:1-calibrated DC path looked fine on noise
    and failed on ramps by 8x)."""
    rng = np.random.default_rng(5)
    wdc = rng.integers(-3000, 3000, (4, 4)).astype(np.int64)
    back = HI.luma_dc_inv(HI.luma_dc_fwd(wdc, 10), 10)
    ratio = back[wdc != 0] / (4.0 * wdc[wdc != 0])
    assert np.all(np.abs(ratio - 1.0) < 0.05)
    w2 = rng.integers(-3000, 3000, (2, 2)).astype(np.int64)
    back2 = HI.chroma_dc_inv(HI.chroma_dc_fwd(w2, 10), 10)
    ratio2 = back2[w2 != 0] / (4.0 * w2[w2 != 0])
    assert np.all(np.abs(ratio2 - 1.0) < 0.05)


# ---------------------------------------------------------------------------
# Frame codec


def _roundtrip(frame, qp, **kw):
    nal, recon = HI.encode_idr_frame_i16(
        frame, qp=qp, return_recon=True, **kw
    )
    dec = HI.decode_idr_frame_auto(
        nal, _sps(frame.shape[1], frame.shape[0]), PPS_I16
    )
    return nal, recon, dec


def test_decoder_matches_encoder_reconstruction_exactly():
    """THE codec property: decode(encode(f)) == the encoder's own
    reconstruction, bit-for-bit, at every qp — prediction, transforms,
    CAVLC, and nC contexts all in lockstep across engines-of-one."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:48, 0:64]
    frames = [
        (xx * 2 + yy).astype(np.uint8),
        rng.integers(0, 256, (48, 64)).astype(np.uint8),
        np.tile((np.arange(64) * 3 % 256).astype(np.uint8), (48, 1)),
    ]
    for f in frames:
        for qp in (0, 4, 17, 26, 35, 44, 51):
            _, recon, dec = _roundtrip(f, qp)
            assert np.array_equal(recon, dec), qp


def test_rate_distortion_floors():
    """PSNR floors by qp on mixed content (gradient + texture + flat),
    and rate must fall monotonically with qp."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:48, 0:64]
    frame = (xx * 2 + yy + rng.integers(0, 25, (48, 64))).astype(np.uint8)
    frame[16:32, 16:48] = 200
    prev_bytes = None
    for qp, floor in ((4, 50.0), (20, 40.0), (32, 28.0)):
        nal, _, dec = _roundtrip(frame, qp)
        mse = ((dec.astype(float) - frame.astype(float)) ** 2).mean()
        psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
        assert psnr >= floor, (qp, psnr)
        if prev_bytes is not None:
            assert len(nal) < prev_bytes
        prev_bytes = len(nal)


def test_smooth_content_lossless_at_fine_qp():
    """A pure gradient at qp=4 must reconstruct EXACTLY — the finest
    quantizer resolves every low-frequency coefficient the ramp
    produces (this is the case the mis-scaled DC path broke)."""
    yy, xx = np.mgrid[0:48, 0:64]
    frame = (xx * 2 + yy).astype(np.uint8)
    _, _, dec = _roundtrip(frame, 4)
    assert np.array_equal(dec, frame)


def test_prediction_modes_exploit_structure():
    """Rate evidence that directional prediction works: vertical
    stripes after the first MB row should cost almost nothing (V mode
    predicts them perfectly from the top row)."""
    stripes = np.tile((np.arange(64) * 7 % 256).astype(np.uint8), (64, 1))
    nal, _, dec = _roundtrip(stripes, 10)
    assert np.array_equal(dec, stripes) or np.abs(
        dec.astype(int) - stripes.astype(int)
    ).max() <= 2
    # 16 MBs; stripes compress to a tiny fraction of one PCM MB (384 B)
    assert len(nal) < 1200


def test_pcm_fallback_mixes_into_slice():
    """qp=0 noise makes the CAVLC form exceed I_PCM's 384 bytes — the
    encoder must fall back per-MB, the decoder must handle the mixed
    slice, and parity must hold."""
    rng = np.random.default_rng(4)
    frame = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    nal, recon, dec = _roundtrip(frame, 0)
    assert np.array_equal(recon, dec)
    # PCM is lossless: wherever fallback fired, recon == source; whole
    # frame at qp=0 should be (near-)exact either way
    assert np.abs(dec.astype(int) - frame.astype(int)).max() <= 1
    # prove the fallback actually fired: the stream should be PCM-sized
    assert len(nal) >= 4 * 384


def test_mp4_i16_container_roundtrip():
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:32, 0:48]
    frames = np.stack(
        [
            ((xx * 3 + yy * 2 + 17 * i) % 256).astype(np.uint8)
            for i in range(5)
        ]
    )
    payload = H.encode_mp4_h264(frames, codec="i16", qp=12)
    info = H.parse_mp4(payload)
    assert info["index_consistent"]
    assert info["pps"]["deblocking_control"] is True
    assert len(info["samples"]) == 5
    sps, decoded = H.decode_mp4_h264(payload)
    assert [i for i, _ in decoded] == list(range(5))
    for i, dec in decoded:
        direct, recon = HI.encode_idr_frame_i16(
            frames[i], qp=12, idr_pic_id=i % 2, return_recon=True
        )
        assert np.array_equal(dec, recon)
    _, sampled = H.decode_mp4_h264(payload, every_nth=2)
    assert [i for i, _ in sampled] == [0, 2, 4]


def test_pcm_mp4_still_decodes_through_auto_path():
    """The unified decode path must keep the lossless I_PCM contract."""
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (3, 32, 16)).astype(np.uint8)
    payload = H.encode_mp4_h264(frames, codec="i_pcm")
    info = H.parse_mp4(payload)
    assert info["pps"]["deblocking_control"] is False
    _, decoded = H.decode_mp4_h264(payload)
    for i, dec in decoded:
        assert np.array_equal(dec, frames[i])


def test_bad_qp_and_dims_rejected():
    f = np.zeros((16, 16), dtype=np.uint8)
    with pytest.raises(ValueError):
        HI.encode_idr_frame_i16(f, qp=52)
    with pytest.raises(ValueError):
        HI.encode_idr_frame_i16(np.zeros((15, 16), dtype=np.uint8))
    with pytest.raises(ValueError):
        H.encode_mp4_h264(np.zeros((1, 16, 16), dtype=np.uint8), codec="x")


# ---------------------------------------------------------------------------
# Intra_4x4 tier


def test_cbp_intra_me_table_is_permutation():
    assert sorted(HI.CBP_INTRA_ME) == list(range(48))


def test_i4_modes_exact_along_own_direction():
    """Each directional mode must reproduce a pattern constant along
    its own prediction direction to within interpolation rounding —
    the invariant that catches transposed/shifted spec formulas (it
    caught three index bugs in VR/HD during development).  Mode 8's
    z>5 positions CLAMP to the last left sample by spec, so HU is
    checked only on its unclamped region."""
    yy, xx = np.mgrid[0:12, 0:12]
    dirs = {0: xx, 1: yy, 3: xx + yy, 4: xx - yy,
            5: 2 * xx - yy, 6: 2 * yy - xx, 7: 2 * xx + yy,
            8: xx + 2 * yy}
    y0 = x0 = 4
    for m, d in dirs.items():
        recon = (50 + 6 * (d - d.min()) % 200).astype(np.uint8)
        truth = recon[y0 : y0 + 4, x0 : x0 + 4].astype(np.int64)
        pred = HI.predict_i4(recon, y0, x0, m, True, True, True)
        dev = np.abs(pred - truth)
        if m == 8:
            # z==5 is already the (l2+3*l3)/4 blend INTO the clamp —
            # only z<=4 is pure directional interpolation
            zz = (np.arange(4)[None, :] + 2 * np.arange(4)[:, None])
            dev = dev[zz <= 4]
        assert dev.max() <= 2, (m, dev.max())
    # DC on constant neighborhood is exact
    flat = np.full((12, 12), 77, dtype=np.uint8)
    assert np.all(HI.predict_i4(flat, 4, 4, 2, True, True, True) == 77)


def test_intra_combined_parity_and_rate():
    """encode_idr_frame_intra (per-MB I4x4/I16/PCM decision): decoder
    output == encoder reconstruction at every qp on every content
    class, and the combined encoder never codes WORSE than i16-only
    (the mode decision is min-bits by construction) — strictly better
    on directional content."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:48, 0:64]
    frames = {
        "gradient": (xx * 2 + yy).astype(np.uint8),
        "noise": rng.integers(0, 256, (48, 64)).astype(np.uint8),
        "diag": ((xx + yy * 3) % 256).astype(np.uint8),
    }
    sps = _sps(64, 48)
    for name, f in frames.items():
        for qp in (0, 4, 17, 26, 35, 44, 51):
            nal, recon = HI.encode_idr_frame_intra(
                f, qp=qp, return_recon=True
            )
            dec = HI.decode_idr_frame_auto(nal, sps, PPS_I16)
            assert np.array_equal(recon, dec), (name, qp)
        nal_c = HI.encode_idr_frame_intra(f, qp=10)
        nal_16 = HI.encode_idr_frame_i16(f, qp=10)
        # slight slack: PCM-fallback threshold interactions can cost a
        # few bytes on noise, never on structured content
        assert len(nal_c) <= len(nal_16) + 8, name
    grad = frames["gradient"]
    assert len(HI.encode_idr_frame_intra(grad, qp=10)) < len(
        HI.encode_idr_frame_i16(grad, qp=10)
    )


def test_mp4_intra_codec_roundtrip():
    yy, xx = np.mgrid[0:32, 0:48]
    frames = np.stack(
        [((xx * 3 + yy * 2 + 29 * i) % 256).astype(np.uint8)
         for i in range(4)]
    )
    payload = H.encode_mp4_h264(frames, codec="intra", qp=10)
    info = H.parse_mp4(payload)
    assert info["index_consistent"]
    _sps_d, decoded = H.decode_mp4_h264(payload)
    assert [i for i, _ in decoded] == list(range(4))
    for i, dec in decoded:
        _, recon = HI.encode_idr_frame_intra(
            frames[i], qp=10, idr_pic_id=i % 2, return_recon=True
        )
        assert np.array_equal(dec, recon)


def test_i4_mpm_signaling_roundtrips_every_mode():
    """Frames engineered so different blocks pick different directional
    modes exercise both MPM hit (flag=1) and rem_intra4x4_pred_mode
    paths; parity proves the decoder recovers the exact mode choices."""
    rng = np.random.default_rng(3)
    # patchwork of directional textures
    yy, xx = np.mgrid[0:32, 0:32]
    f = np.zeros((32, 32), dtype=np.uint8)
    f[:16, :16] = (xx[:16, :16] * 9).astype(np.uint8)          # vertical
    f[:16, 16:] = (yy[:16, :16] * 9).astype(np.uint8)          # horizontal
    f[16:, :16] = ((xx[:16, :16] + yy[:16, :16]) * 7).astype(np.uint8)
    f[16:, 16:] = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    for qp in (4, 20, 38):
        nal, recon = HI.encode_idr_frame_intra(f, qp=qp, return_recon=True)
        dec = HI.decode_idr_frame_auto(nal, _sps(32, 32), PPS_I16)
        assert np.array_equal(recon, dec), qp


def test_corrupted_intra_stream_never_hangs_or_leaks():
    """Bit-flip fuzz over a full intra slice: every corruption must
    either decode to SOME frame or raise ValueError — never IndexError/
    struct.error (the parse_mp4 normalization contract) and never an
    unbounded loop (the CAVLC readers carry explicit overrun bounds)."""
    import random

    rng = np.random.default_rng(7)
    pyrng = random.Random(7)
    frame = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    sps = _sps(32, 32)
    nal = bytearray(HI.encode_idr_frame_intra(frame, qp=18))
    for _ in range(120):
        b = bytearray(nal)
        for _ in range(pyrng.randint(1, 4)):
            i = pyrng.randrange(1, len(b))
            b[i] ^= 1 << pyrng.randrange(8)
        try:
            out = HI.decode_idr_frame_auto(bytes(b), sps, PPS_I16)
            assert out.shape == (32, 32)
        except ValueError:
            pass
