"""CABAC tier tests (operators/h264_cabac.py): arithmetic-engine
roundtrip and entropy efficiency, cross-entropy-coder decoded-pixel
equivalence with the CAVLC tier (shared analysis => bit-identical
pixels), MP4 container dispatch on entropy_coding_mode_flag, and the
corrupted-stream ValueError contract under bit-flip fuzzing."""

from __future__ import annotations

import math

import numpy as np
import pytest

from real_time_trip_processing_project_spark.operators import (
    h264 as H,
    h264_cabac as C,
    h264_intra as HI,
)
from real_time_trip_processing_project_spark.operators.h264 import BitWriter


def _sps_pps(w: int, h: int, cabac: bool = True):
    sps = H.parse_sps(H.encode_sps(w, h))
    pps = H.parse_pps(H.encode_pps(deblocking_control=True, cabac=cabac))
    return sps, pps


def test_engine_tables_structurally_sound():
    """Table invariants the spec guarantees: 64 states x 4 quartiles,
    rLPS monotone non-increasing in pStateIdx and strictly increasing
    across quartiles (more range -> bigger LPS share), terminal row of
    2s, LPS transitions never increase past the source state + 1 and
    MPS transitions walk toward the most-confident state."""
    assert len(C.RANGE_TAB_LPS) == 64
    for row in C.RANGE_TAB_LPS[:-1]:
        assert all(row[i] < row[i + 1] for i in range(3))
    for i in range(62):
        for q in range(4):
            assert C.RANGE_TAB_LPS[i][q] >= C.RANGE_TAB_LPS[i + 1][q]
    assert C.RANGE_TAB_LPS[63] == [2, 2, 2, 2]
    assert len(C.TRANS_IDX_LPS) == 64
    assert all(
        C.TRANS_IDX_LPS[i] <= max(i, 1) for i in range(64)
    ), "LPS must not increase confidence"
    assert C.TRANS_IDX_MPS[62] == 62 and C.TRANS_IDX_MPS[63] == 63


def test_engine_roundtrip_random_streams():
    """Every (ctx, bin) / bypass sequence decodes back exactly — the
    core correctness property of the arithmetic coder pair."""
    rng = np.random.default_rng(42)
    for _ in range(30):
        ops = []
        for _ in range(int(rng.integers(1, 500))):
            if rng.integers(0, 10) < 6:
                ops.append(
                    ("d", int(rng.integers(0, C.N_CTX)),
                     int(rng.integers(0, 2)))
                )
            else:
                ops.append(("b", int(rng.integers(0, 2))))
        bw = BitWriter()
        enc = C.CabacEncoder(bw)
        for op in ops:
            enc.decision(op[1], op[2]) if op[0] == "d" else enc.bypass(
                op[1]
            )
        enc.terminate(1)
        bw.align_zero()
        dec = C.CabacDecoder(bw.getvalue(), 0)
        for op in ops:
            got = dec.decision(op[1]) if op[0] == "d" else dec.bypass()
            assert got == op[-1]
        assert dec.terminate() == 1


def test_engine_entropy_efficiency():
    """Adaptive single-context coding of a biased i.i.d. source lands
    within 10% of the Shannon bound — a grossly mis-transcribed
    rangeTabLPS could not achieve this."""
    rng = np.random.default_rng(7)
    for p in (0.05, 0.2, 0.5):
        n = 20_000
        src = (rng.random(n) < p).astype(int)
        bw = BitWriter()
        enc = C.CabacEncoder(bw)
        for b in src:
            enc.decision(100, int(b))
        enc.terminate(1)
        bw.align_zero()
        hp = p * math.log2(1 / p) + (1 - p) * math.log2(1 / (1 - p))
        assert len(bw.getvalue()) * 8 <= 1.10 * hp * n + 64


def test_cabac_decodes_bit_identical_to_cavlc():
    """The headline property: both entropy coders serialize the same
    _analyze_mb_i16 model, so their decoded pixels must be EQUAL —
    a cross-entropy-coder conformance check with no external decoder."""
    rng = np.random.default_rng(3)
    for shape in ((16, 16), (32, 48)):
        h, w = shape
        sps, ppsc = _sps_pps(w, h)
        ppsv = H.parse_pps(H.encode_pps(deblocking_control=True))
        for qp in (8, 12, 26, 40):
            for f in (
                rng.integers(0, 256, shape).astype(np.uint8),
                (np.add.outer(np.arange(h), np.arange(w)) * 2 % 256)
                .astype(np.uint8),
            ):
                cab = C.encode_idr_frame_i16_cabac(f, qp=qp)
                cav = HI.encode_idr_frame_i16(f, qp=qp, pcm_fallback=False)
                d1 = C.decode_idr_frame_cabac(cab, sps, ppsc)
                d2 = HI.decode_idr_frame_auto(cav, sps, ppsv)
                assert np.array_equal(d1, d2)


def test_cabac_beats_cavlc_rate_on_multi_mb_frames():
    """On frames big enough for the contexts to adapt, the arithmetic
    coder compresses at least as well as the VLC tables (the reason
    CABAC exists); single-MB frames may pay the flush overhead."""
    rng = np.random.default_rng(5)
    f = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    ramp = (np.add.outer(np.arange(64), np.arange(64)) % 256).astype(
        np.uint8
    )
    for frame in (f, ramp):
        cab = len(C.encode_idr_frame_i16_cabac(frame, qp=12))
        cav = len(
            HI.encode_idr_frame_i16(frame, qp=12, pcm_fallback=False)
        )
        assert cab <= cav


def test_mp4_container_dispatch():
    """codec='i16_cabac' produces a real MP4 whose PPS carries
    entropy_coding_mode_flag=1; decode_mp4_h264 dispatches on it and
    the frames equal the CAVLC container's."""
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (4, 32, 48)).astype(np.uint8)
    cab = H.encode_mp4_h264(frames, codec="i16_cabac", qp=12)
    cav = H.encode_mp4_h264(frames, codec="i16", qp=12)
    info = H.parse_mp4(cab)
    assert info["pps"]["entropy_coding_mode"] == 1
    assert info["index_consistent"] and len(info["samples"]) == 4
    _, dc = H.decode_mp4_h264(cab)
    _, dv = H.decode_mp4_h264(cav)
    assert [i for i, _ in dc] == [i for i, _ in dv]
    for (_, a), (_, b) in zip(dc, dv):
        assert np.array_equal(a, b)
    # frame sampling by table arithmetic works under CABAC too
    assert len(H.decode_mp4_h264(cab, 2)[1]) == 2


def test_truncated_i4_prefix_raises():
    """A slice whose data ends right after an I_NxN mb_type prefix is
    malformed — the decoder must fail with ValueError, not hang or
    leak (the well-formed stream decodes before and after)."""
    sps, pps = _sps_pps(16, 16)
    f = np.zeros((16, 16), dtype=np.uint8)
    nal = C.encode_idr_frame_i16_cabac(f, qp=26)
    bw = BitWriter()
    bw.ue(0)
    bw.ue(7)
    bw.ue(0)
    bw.u(0, 4)
    bw.ue(0)
    bw.u(0, 2)
    bw.se(0)
    bw.ue(1)
    while bw.bit_position % 8:
        bw.u(1, 1)
    enc = C.CabacEncoder(bw)
    enc.decision(3, 0)  # mb_type prefix 0 -> I_NxN, then nothing
    enc.terminate(1)
    bw.align_zero()
    with pytest.raises(ValueError):
        C.decode_idr_frame_cabac(b"\x65" + H.rbsp_to_ebsp(bw.getvalue()),
                                 sps, pps)
    assert nal  # the well-formed stream still decodes
    C.decode_idr_frame_cabac(nal, sps, pps)


def test_full_intra_cabac_mode_decision_and_roundtrip():
    """The full-baseline-intra CABAC tier (r11): per-MB exact-bit
    I4-vs-I16 trials from the live engine/context state.  On ramp
    content Intra_4x4 must WIN rate (directional prediction), every
    stream roundtrips within the quantizer bound, and the tier beats
    its own CAVLC twin on structured content."""
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:48, 0:64]
    ramp = ((yy * 3 + xx * 5) % 256).astype(np.uint8)
    edges = np.where(
        (xx // 8) % 2 == 0, yy * 4 % 256, 255 - (yy * 4 % 256)
    ).astype(np.uint8)
    noise = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    sps, pps = _sps_pps(64, 48)
    for qp in (8, 12, 26):
        for f in (ramp, edges, noise):
            nal = C.encode_idr_frame_intra_cabac(f, qp=qp)
            d = C.decode_idr_frame_cabac(nal, sps, pps)
            err = int(np.abs(d.astype(int) - f.astype(int)).max())
            if qp <= 12:
                assert err <= 8, (qp, err)
    # directional prediction wins on the ramp (measures 0.90x)
    assert len(C.encode_idr_frame_intra_cabac(ramp, qp=12)) < len(
        C.encode_idr_frame_i16_cabac(ramp, qp=12)
    )
    # arithmetic coding beats the CAVLC intra twin on structured frames
    from real_time_trip_processing_project_spark.operators import (
        h264_intra as HI_,
    )

    assert len(C.encode_idr_frame_intra_cabac(edges, qp=12)) < len(
        HI_.encode_idr_frame_intra(edges, qp=12)
    )
    # MP4 e2e with the intra_cabac codec switch
    frames = np.stack([ramp, edges, noise])
    mp4 = H.encode_mp4_h264(frames, codec="intra_cabac", qp=12)
    info = H.parse_mp4(mp4)
    assert info["pps"]["entropy_coding_mode"] == 1
    _, dec = H.decode_mp4_h264(mp4)
    assert len(dec) == 3
    for i, fr in dec:
        assert np.abs(fr.astype(int) - frames[i].astype(int)).max() <= 8


def test_full_intra_cabac_fuzz():
    """Bit-flip fuzz over the mixed-mb_type CABAC stream: decode or
    ValueError only."""
    rng = np.random.default_rng(19)
    yy, xx = np.mgrid[0:32, 0:32]
    f = ((yy * 7 + xx * 3) % 256).astype(np.uint8)
    sps, pps = _sps_pps(32, 32)
    nal = bytearray(C.encode_idr_frame_intra_cabac(f, qp=12))
    n_bits = len(nal) * 8
    bad = 0
    for _ in range(2000):
        i = int(rng.integers(8, n_bits))
        mut = bytearray(nal)
        mut[i // 8] ^= 1 << (7 - (i % 8))
        try:
            C.decode_idr_frame_cabac(bytes(mut), sps, pps)
        except ValueError:
            bad += 1
    assert bad > 0


def test_bit_flip_fuzz_decode_or_valueerror():
    """Corrupted CABAC slices decode or raise ValueError — never hang,
    never leak a raw IndexError/struct.error (the codec family's
    corrupted-stream contract, mirroring the CAVLC fuzz test)."""
    rng = np.random.default_rng(17)
    f = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    sps, pps = _sps_pps(32, 32)
    nal = bytearray(C.encode_idr_frame_i16_cabac(f, qp=12))
    n_bits = len(nal) * 8
    outcomes = {"ok": 0, "valueerror": 0}
    for _ in range(3000):
        i = int(rng.integers(8, n_bits))  # keep the NAL header byte
        mut = bytearray(nal)
        mut[i // 8] ^= 1 << (7 - (i % 8))
        try:
            C.decode_idr_frame_cabac(bytes(mut), sps, pps)
            outcomes["ok"] += 1
        except ValueError:
            outcomes["valueerror"] += 1
    assert sum(outcomes.values()) == 3000
    assert outcomes["valueerror"] > 0


def test_truncation_raises():
    f = np.full((16, 16), 77, dtype=np.uint8)
    sps, pps = _sps_pps(16, 16)
    nal = C.encode_idr_frame_i16_cabac(f, qp=12)
    for cut in range(4, len(nal) - 1):
        try:
            C.decode_idr_frame_cabac(nal[:cut], sps, pps)
        except ValueError:
            pass  # the only acceptable failure mode


def test_multimodal_stats_codec_switch():
    """mp4_i16_frame_stats(codec='i16_cabac') plumbs through: identical
    distortion columns to the CAVLC i16 run (shared analysis), only
    the rate columns may differ."""
    pytest.importorskip("pyspark")
    # exercised without Spark: the underlying kernel path
    from real_time_trip_processing_project_spark.operators import (
        multimodal as MM,
    )

    txt = "cabac tier end to end " * 40
    px = MM._text_frames(txt, 256)
    frames = px.reshape(-1, 16, 16)
    cab = H.encode_mp4_h264(frames, codec="i16_cabac", qp=12)
    cav = H.encode_mp4_h264(frames, codec="i16", qp=12)
    _, dc = H.decode_mp4_h264(cab)
    _, dv = H.decode_mp4_h264(cav)
    assert len(dc) == len(dv) == len(frames)
    for (_, a), (_, b) in zip(dc, dv):
        assert np.array_equal(a, b)


def test_cabac_p_slices_match_cavlc_pixels():
    """CABAC P slices (r11): shared motion search + analysis with the
    CAVLC inter tier means the decoded pixels must be EQUAL frame by
    frame; the arithmetic coder should also not lose rate materially.
    Also pins the CABAC GOP container (codec='i16p_cabac') against the
    CAVLC GOP decode."""
    from real_time_trip_processing_project_spark.operators import (
        h264_inter as HP,
    )

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    frames = [base]
    for _ in range(1, 5):
        s_ = np.roll(np.roll(frames[-1], 2, 0), 4, 1)
        frames.append(
            np.clip(
                s_.astype(np.int64) + rng.integers(-2, 3, s_.shape), 0, 255
            ).astype(np.uint8)
        )
    frames = np.stack(frames)
    sps = H.parse_sps(H.encode_sps(64, 48, max_ref=1))
    ppsc = H.parse_pps(H.encode_pps(True, cabac=True))
    _n, ry, rc = HI.encode_idr_frame_i16(
        frames[0], qp=12, return_recon=True, return_chroma=True
    )
    for k in range(1, len(frames)):
        nal_c, ry2, rc2 = C.encode_p_frame_cabac(
            frames[k], ry, rc, qp=12, frame_num=k
        )
        dy, dc = C.decode_p_frame_cabac(nal_c, sps, ppsc, ry, rc)
        assert np.array_equal(dy, ry2)
        assert all(np.array_equal(a, b) for a, b in zip(dc, rc2))
        nal_v, ry2v, _ = HP.encode_p_frame(
            frames[k], ry, rc, qp=12, frame_num=k
        )
        assert np.array_equal(ry2, ry2v), "cross-coder pixel divergence"
        assert len(nal_c) <= 1.1 * len(nal_v)
        ry, rc = ry2, rc2
    gc = H.encode_mp4_h264(frames, codec="i16p_cabac", qp=12)
    gv = H.encode_mp4_h264(frames, codec="i16p", qp=12)
    info = H.parse_mp4(gc)
    assert info["pps"]["entropy_coding_mode"] == 1
    assert info["sync_samples"] == [0]
    _, dcc = H.decode_mp4_h264(gc)
    _, dvv = H.decode_mp4_h264(gv)
    assert [i for i, _ in dcc] == [i for i, _ in dvv]
    for (_, a), (_, b) in zip(dcc, dvv):
        assert np.array_equal(a, b)


def test_cabac_p_skip_and_fuzz():
    """Static content under CABAC P: skip flags dominate (stream far
    below IDR rate); bit-flip fuzz holds the ValueError contract."""
    from real_time_trip_processing_project_spark.operators import (
        h264_inter as HP_,  # noqa: F401 (parity of imports with twin)
    )

    rng = np.random.default_rng(9)
    f = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    sps = H.parse_sps(H.encode_sps(32, 32, max_ref=1))
    ppsc = H.parse_pps(H.encode_pps(True, cabac=True))
    _n, ry, rc = HI.encode_idr_frame_i16(
        f, qp=12, return_recon=True, return_chroma=True
    )
    n1, ry1, rc1 = C.encode_p_frame_cabac(f, ry, rc, qp=12)
    n2, _, _ = C.encode_p_frame_cabac(f, ry1, rc1, qp=12)
    assert len(n2) < len(n1) < 400
    nal = bytearray(n1)
    n_bits = len(nal) * 8
    bad = 0
    for _ in range(1500):
        i = int(rng.integers(8, n_bits))
        mut = bytearray(nal)
        mut[i // 8] ^= 1 << (7 - (i % 8))
        try:
            C.decode_p_frame_cabac(bytes(mut), sps, ppsc, ry, rc)
        except ValueError:
            bad += 1
    assert bad > 0
