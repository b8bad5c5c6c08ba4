"""MP4/H.264 codec unit tests (operators/h264.py): bit-exact I_PCM
roundtrip, Exp-Golomb read/write, emulation prevention, SPS/PPS
parse-back, container index resolution, and malformed-input handling.
No Spark — the codec is plain numpy; the Spark plumbing is covered by
the registered queries' oracles."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from real_time_trip_processing_project_spark.operators import h264 as H


def _frames(n=3, h=32, w=16, seed=7):
    rng = np.random.RandomState(seed)
    f = rng.randint(0, 256, size=(n, h, w)).astype(np.uint8)
    f[0, :8] = 0  # zero runs → emulation-prevention territory
    return f


def test_expgolomb_roundtrip():
    bw = H.BitWriter()
    uvals = list(range(64)) + [255, 256, 1000, 65535, 1 << 20]
    svals = list(range(-40, 41)) + [1 << 15, -(1 << 15)]
    for v in uvals:
        bw.ue(v)
    for v in svals:
        bw.se(v)
    bw.rbsp_trailing_bits()
    br = H.BitReader(bw.getvalue())
    assert [br.ue() for _ in uvals] == uvals
    assert [br.se() for _ in svals] == svals


def test_emulation_prevention_roundtrip_and_patterns():
    # every 0x000000/01/02/03 in RBSP must gain an 0x03 in EBSP
    rbsp = b"\x00\x00\x00\x00\x01\x00\x00\x02\x00\x00\x03ab\x00\x00"
    ebsp = H.rbsp_to_ebsp(rbsp)
    assert b"\x00\x00\x00" not in ebsp
    assert b"\x00\x00\x01" not in ebsp
    assert H.ebsp_to_rbsp(ebsp) == rbsp
    rng = np.random.RandomState(3)
    for _ in range(300):
        raw = rng.randint(0, 5, size=rng.randint(0, 80)).astype(
            np.uint8
        ).tobytes()
        assert H.ebsp_to_rbsp(H.rbsp_to_ebsp(raw)) == raw


def test_sps_pps_parse_back():
    sps = H.parse_sps(H.encode_sps(48, 32))
    assert (sps["width"], sps["height"]) == (48, 32)
    assert sps["profile_idc"] == 66
    assert sps["poc_type"] == 2
    pps = H.parse_pps(H.encode_pps())
    assert pps["entropy_coding_mode"] == 0
    with pytest.raises(ValueError):
        H.encode_sps(17, 16)  # not a macroblock multiple


def test_idr_ipcm_frame_roundtrip_lossless():
    for frame in _frames(4, 32, 48):
        nal = H.encode_idr_frame(frame)
        assert nal[0] == 0x65  # IDR, nal_ref_idc 3
        sps = H.parse_sps(H.encode_sps(48, 32))
        back = H.decode_idr_frame(nal, sps)
        assert np.array_equal(back, frame)


def test_mp4_roundtrip_and_sampling():
    frames = _frames(5)
    payload = H.encode_mp4_h264(frames)
    info = H.parse_mp4(payload)
    assert info["index_consistent"]
    assert (info["width"], info["height"]) == (16, 32)
    assert (info["sps"]["width"], info["sps"]["height"]) == (16, 32)
    assert len(info["samples"]) == 5
    sps, decoded = H.decode_mp4_h264(payload)
    assert [i for i, _ in decoded] == list(range(5))
    for i, f in decoded:
        assert np.array_equal(f, frames[i])
    _, sampled = H.decode_mp4_h264(payload, every_nth=2)
    assert [i for i, _ in sampled] == [0, 2, 4]


def test_parse_mp4_flags_corruption():
    payload = bytearray(H.encode_mp4_h264(_frames(2)))
    # corrupt the stsz entry of sample 0 (entries start at at+16, after
    # version/flags + sample_size + sample_count): resolved samples no
    # longer tile mdat with exact length-prefix coverage
    at = payload.find(b"stsz")
    assert at > 0
    n0 = struct.unpack_from(">I", payload, at + 16)[0]
    struct.pack_into(">I", payload, at + 16, n0 + 4)
    info = H.parse_mp4(bytes(payload))
    assert not info["index_consistent"]


def test_parse_mp4_flags_inflated_sample_count():
    payload = bytearray(H.encode_mp4_h264(_frames(2)))
    # inflate stsz.sample_count (at+12): si != n_samples path.  The
    # count points past the real entry table, so the strict parser reads
    # junk/past-buffer — normalized to ValueError, OR flags inconsistent.
    at = payload.find(b"stsz")
    n0 = struct.unpack_from(">I", payload, at + 12)[0]
    struct.pack_into(">I", payload, at + 12, n0 + 4)
    try:
        info = H.parse_mp4(bytes(payload))
    except ValueError:
        pass
    else:
        assert not info["index_consistent"]


def test_parse_mp4_truncation_normalizes_to_valueerror():
    # hard truncation mid-sample-table: struct.error/IndexError inside
    # the strict parser must surface as ValueError (the one exception
    # mp4_container_index's sentinel path handles)
    payload = H.encode_mp4_h264(_frames(2))
    at = payload.find(b"stsz")
    for cut in (at + 14, at + 6, len(payload) - 3):
        with pytest.raises(ValueError):
            H.parse_mp4(payload[:cut])


def test_tkhd_box_byte_layout():
    # ISO 14496-12 v0 tkhd: after 4 (version/flags) + 20 (times, track,
    # reserved, duration) come exactly 16 reserved/layer/volume bytes,
    # then the 36-byte identity matrix, then width/height as 16.16.
    payload = H.encode_mp4_h264(_frames(1))
    at = payload.find(b"tkhd")
    assert at > 0
    size = struct.unpack_from(">I", payload, at - 4)[0]
    assert size == 8 + 4 + 20 + 16 + 36 + 8
    body = at + 4 + 4  # past type + version/flags
    assert payload[body + 20 : body + 36] == b"\x00" * 16
    matrix = struct.unpack_from(">9I", payload, body + 36)
    assert matrix == (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    w, h = struct.unpack_from(">II", payload, body + 72)
    assert (w >> 16, h >> 16) == (16, 32)


def test_parse_mp4_rejects_missing_boxes():
    payload = H.encode_mp4_h264(_frames(1))
    # truncate before moov: required sample tables disappear
    mdat_end = payload.find(b"moov") - 4
    with pytest.raises(ValueError):
        H.parse_mp4(payload[:mdat_end])


def test_decode_rejects_non_ipcm_and_bad_nals():
    sps = H.parse_sps(H.encode_sps(16, 16))
    with pytest.raises(ValueError):
        H.decode_idr_frame(b"\x41\x00", sps)  # non-IDR NAL type
    # a slice whose mb_type is not I_PCM is the documented narrow seam
    bw = H.BitWriter()
    bw.ue(0)
    bw.ue(7)
    bw.ue(0)
    bw.u(0, 4)
    bw.ue(0)
    bw.u(0, 2)
    bw.se(0)
    bw.ue(0)  # mb_type 0 = Intra_4x4 — unsupported by design
    bw.align_zero()
    bw.rbsp_trailing_bits()
    with pytest.raises(ValueError, match="I_PCM"):
        H.decode_idr_frame(b"\x65" + H.rbsp_to_ebsp(bw.getvalue()), sps)
