"""Baseline JPEG + MJPEG-AVI codec contracts (operators/jpeg.py).

The Spark query (`multimodal_mjpeg_frames`) is rows-only — float DCT
rounding has no SQL oracle — so the codec's measurable guarantees are
pinned here instead: near-lossless roundtrip at unit quantization,
marker-level spec conformance, container sampling, and the end-to-end
Spark pipeline against exact source-byte statistics."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from real_time_trip_processing_project_spark.operators import jpeg as J
from real_time_trip_processing_project_spark.operators import multimodal as MM

Q1 = np.ones((8, 8), dtype=np.int64)


def test_flat_image_roundtrips_exactly():
    img = np.full((24, 24), 77, dtype=np.uint8)
    assert (J.jpeg_decode_gray(J.jpeg_encode_gray(img, Q1)) == img).all()


def test_unit_quant_roundtrip_error_bounded_one():
    """With quant=1 the only loss is float-DCT rounding: every pixel of
    every image must come back within ±1 — including hard cases
    (random noise, checkerboard extremes, non-multiple-of-8 dims)."""
    rng = np.random.RandomState(42)
    cases = [
        rng.randint(0, 256, (16, 16), dtype=np.uint8),
        rng.randint(0, 256, (23, 31), dtype=np.uint8),  # padded edges
        np.indices((17, 9)).sum(0).astype(np.uint8) * 7,
        np.tile(np.array([[0, 255], [255, 0]], np.uint8), (8, 8)),
    ]
    for img in cases:
        dec = J.jpeg_decode_gray(J.jpeg_encode_gray(img, Q1))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= 1, (img.shape, err)


def test_standard_quant_is_lossy_but_sane():
    """Annex K quantization must actually compress (smaller than unit
    quant) and still reconstruct a smooth gradient closely."""
    g = np.linspace(0, 255, 32 * 32).reshape(32, 32).astype(np.uint8)
    lossy = J.jpeg_encode_gray(g)                  # Annex K table
    lossless = J.jpeg_encode_gray(g, Q1)
    assert len(lossy) < len(lossless)
    dec = J.jpeg_decode_gray(lossy)
    mse = ((dec.astype(float) - g.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr > 30, psnr


def test_marker_structure_is_spec_conformant():
    """SOI first, EOI last; DQT/SOF0/DHT×2/SOS present with correct
    lengths; every 0xFF inside entropy data is stuffed."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    enc = J.jpeg_encode_gray(img)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    pos, seen = 2, []
    while pos < len(enc) - 2:
        marker = struct.unpack(">H", enc[pos : pos + 2])[0]
        seen.append(marker)
        size = struct.unpack(">H", enc[pos + 2 : pos + 4])[0]
        if marker == 0xFFDA:
            entropy = enc[pos + 2 + size : -2]
            i = 0
            while i < len(entropy):
                if entropy[i] == 0xFF:
                    assert entropy[i + 1] == 0x00, f"unstuffed FF at {i}"
                    i += 2
                else:
                    i += 1
            break
        pos += 2 + size
    assert seen[:2] == [0xFFDB, 0xFFC0] and seen.count(0xFFC4) == 2
    assert seen[-1] == 0xFFDA


def test_decoder_rejects_non_baseline():
    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(J.jpeg_encode_gray(img))
    with pytest.raises(ValueError):
        J.jpeg_decode_gray(b"\x00\x01" + bytes(enc))
    # flip SOF0 to SOF2 (progressive) — must refuse, not mis-decode
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError):
        J.jpeg_decode_gray(bytes(enc))


def test_mjpeg_avi_roundtrip_and_sampling():
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (9, 16, 16), dtype=np.uint8)
    avi = J.encode_avi_mjpeg(frames, quant=Q1)
    out = J.decode_avi_mjpeg(avi)
    assert [i for i, _ in out] == list(range(9))
    for i, f in out:
        assert np.abs(f.astype(int) - frames[i].astype(int)).max() <= 1
    sampled = J.decode_avi_mjpeg(avi, every_nth=4)
    assert [i for i, _ in sampled] == [0, 4, 8]
    # container refuses to MJPEG-decode an uncompressed stream
    rgb = MM.encode_avi_rgb24(
        rng.randint(0, 256, (2, 4, 4, 3), dtype=np.uint8)
    )
    with pytest.raises(ValueError):
        J.decode_avi_mjpeg(rgb)
    # and the uncompressed decoder refuses MJPEG
    with pytest.raises(ValueError):
        MM.decode_avi_rgb24(avi)


def test_avi_idx1_entries_match_movi_walk():
    """The idx1 parser returns one entry per encoded frame, with
    offsets that reproduce the movi chunk layout (word-aligned, 4-based)
    and sizes equal to each JPEG body — the exact invariants
    `mjpeg_container_index` hashes through its full oracle."""
    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, (5, 16, 16), dtype=np.uint8)
    avi = J.encode_avi_mjpeg(frames, quant=Q1)
    entries = MM.avi_idx1_entries(avi)
    _strf, bodies = MM.avi_raw_frames(avi)
    assert len(entries) == len(bodies) == 5
    off = 4
    for (fourcc, flags, e_off, e_size), (_i, b) in zip(entries, bodies):
        assert fourcc == b"00dc" and flags == 0x10
        assert (e_off, e_size) == (off, len(b))
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
        off += 8 + len(b) + (len(b) & 1)
    # an indexless container yields [], not an error
    assert MM.avi_idx1_entries(b"RIFF" + struct.pack("<I", 4) + b"AVI ") == []


def test_avi_idx1_entries_rejects_malformed_headers():
    """The idx1 parser holds avi_raw_frames' untrusted-input line: a
    missing 'AVI ' form tag, an over-declared RIFF size, or an idx1
    body that is not a whole number of 16-byte entries must raise —
    never silently return a partial index that could read as
    consistent (r8 advisor items)."""
    rng = np.random.RandomState(13)
    frames = rng.randint(0, 256, (2, 16, 16), dtype=np.uint8)
    avi = bytearray(J.encode_avi_mjpeg(frames, quant=Q1))

    # wrong form tag
    bad = bytearray(avi)
    bad[8:12] = b"WAVE"
    with pytest.raises(ValueError):
        MM.avi_idx1_entries(bytes(bad))

    # RIFF size declares more than the payload carries (truncation on a
    # chunk boundary)
    bad = bytearray(avi)
    bad[4:8] = struct.pack("<I", len(avi))  # should be len-8
    with pytest.raises(ValueError):
        MM.avi_idx1_entries(bytes(bad))

    # idx1 body not a multiple of 16: grow the idx1 chunk by 8 junk
    # bytes (and the RIFF size to match) so the walk still parses
    pos = bytes(avi).rindex(b"idx1")
    size = struct.unpack("<I", avi[pos + 4 : pos + 8])[0]
    bad = bytearray(avi)
    bad[pos + 4 : pos + 8] = struct.pack("<I", size + 8)
    bad[pos + 8 + size : pos + 8 + size] = b"\x00" * 8
    bad[4:8] = struct.pack("<I", len(bad) - 8)
    with pytest.raises(ValueError):
        MM.avi_idx1_entries(bytes(bad))


def test_mjpeg_container_index_maps_malformed_idx1_to_inconsistent(spark):
    """A structurally malformed index (misaligned idx1 body) must turn
    index_consistent false in the query — not kill the task."""
    import pandas as pd

    img = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    avi = bytearray(J.encode_avi_mjpeg(img, quant=Q1))
    pos = bytes(avi).rindex(b"idx1")
    size = struct.unpack("<I", avi[pos + 4 : pos + 8])[0]
    avi[pos + 4 : pos + 8] = struct.pack("<I", size + 8)
    avi[pos + 8 + size : pos + 8 + size] = b"\x00" * 8
    avi[4:8] = struct.pack("<I", len(avi) - 8)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [bytes(avi)]})
    )
    row = MM.mjpeg_container_index(media).collect()[0]
    assert not row["index_consistent"]
    assert row["frame_count"] == 1  # the movi walk itself is unaffected


def test_mjpeg_container_index_detects_corrupted_idx1(spark):
    """index_consistent must actually guard the index: flipping one
    idx1 size byte turns it false while the frame walk stays intact."""
    import pandas as pd

    img = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    avi = bytearray(J.encode_avi_mjpeg(img, quant=Q1))
    pos = bytes(avi).rindex(b"00dc")  # the idx1 entry (movi copy is earlier)
    avi[pos + 12] ^= 0x01  # entry size field
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2],
                      "payload": [bytes(J.encode_avi_mjpeg(img, quant=Q1)),
                                  bytes(avi)]})
    )
    rows = {r["media_id"]: r for r in MM.mjpeg_container_index(media).collect()}
    assert rows[1]["index_consistent"] and rows[1]["jpeg_ok_frames"] == 1
    assert not rows[2]["index_consistent"]
    assert rows[2]["frame_count"] == 1  # walk itself unaffected


def test_real_decode_seam_handles_mjpeg_and_bare_jpeg():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    meta = MM._real_decode(J.jpeg_encode_gray(img))
    assert (meta["frame_count"], meta["width"], meta["height"]) == (1, 16, 16)
    avi = J.encode_avi_mjpeg(np.stack([img, img.T]), quant=Q1)
    meta = MM._real_decode(avi)
    assert (meta["frame_count"], meta["width"], meta["height"]) == (2, 16, 16)


def test_mjpeg_query_matches_source_byte_stats(spark):
    """End to end through Spark: `multimodal_mjpeg_frames` must emit one
    row per 256-byte frame of each ASCII doc, with px_sum within
    256·1 of the exact source-byte sum (±1/pixel roundtrip bound) and
    px_max within 1 of the exact source max — the quantitative contract
    that replaces the SQL oracle for this lossy path."""
    import duckdb

    from real_time_trip_processing_project_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {
        (r.media_id, r.frame_idx): (r.px_sum, r.px_max)
        for r in REGISTRY["multimodal_mjpeg_frames"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH s AS (
            SELECT doc_id, encode(text) AS b,
                   octet_length(encode(text)) AS n
            FROM '{sf}/documents.parquet'
            WHERE regexp_matches(text, '^[\\x00-\\x7F]*$')
        ),
        fr AS (
            SELECT doc_id, b, n,
                   unnest(range(0, greatest((n + 255) // 256, 1)))
                       AS frame_idx
            FROM s
        )
        SELECT doc_id, frame_idx,
               coalesce(list_sum(list_transform(range(1, 257),
                   j -> CASE WHEN frame_idx * 256 + j <= n
                        THEN ascii(substr(CAST(b AS VARCHAR),
                             CAST(frame_idx * 256 + j AS INT), 1))
                        ELSE 0 END)), 0) AS sum_exact,
               coalesce(list_max(list_transform(range(1, 257),
                   j -> CASE WHEN frame_idx * 256 + j <= n
                        THEN ascii(substr(CAST(b AS VARCHAR),
                             CAST(frame_idx * 256 + j AS INT), 1))
                        ELSE 0 END)), 0) AS max_exact
        FROM fr
        """
    ).fetchall()
    assert rows and len(got) == len(rows)
    for doc_id, frame_idx, sum_exact, max_exact in rows:
        px_sum, px_max = got[(doc_id, frame_idx)]
        assert abs(px_sum - sum_exact) <= 256, (doc_id, frame_idx)
        assert abs(px_max - max_exact) <= 1, (doc_id, frame_idx)


# ---------------------------------------------------------------------------
# PNG (operators/png.py): the lossless compressed path.
# ---------------------------------------------------------------------------


def test_png_roundtrip_exact_gray_and_rgb():
    from real_time_trip_processing_project_spark.operators import png as P

    rng = np.random.RandomState(3)
    g = rng.randint(0, 256, (13, 29), dtype=np.uint8)
    assert (P.decode_png(P.encode_png(g)) == g).all()
    c = rng.randint(0, 256, (7, 11, 3), dtype=np.uint8)
    assert (P.decode_png(P.encode_png(c)) == c).all()


def test_png_decodes_all_five_foreign_filters():
    """A conforming file may use any per-row filter; decode must
    reverse Sub/Up/Average/Paeth, not just the filter-0 rows our own
    encoder writes — pinned with an independently-written filterer."""
    import zlib

    from real_time_trip_processing_project_spark.operators import png as P

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (5, 17), dtype=np.uint8)
    rows = []
    prev = np.zeros(17, dtype=np.int32)
    for r, ft in zip(range(5), [0, 1, 2, 3, 4]):
        line = px[r].astype(np.int32)
        f = line.copy()
        if ft == 1:
            for i in range(16, 0, -1):
                f[i] = (f[i] - line[i - 1]) & 0xFF
        elif ft == 2:
            f = (line - prev) & 0xFF
        elif ft == 3:
            for i in range(16, -1, -1):
                left = line[i - 1] if i >= 1 else 0
                f[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(16, -1, -1):
                a = line[i - 1] if i >= 1 else 0
                b = int(prev[i])
                c = int(prev[i - 1]) if i >= 1 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                f[i] = (line[i] - pred) & 0xFF
        rows.append(bytes([ft]) + bytes(f.astype(np.uint8)))
        prev = line
    ihdr = struct.pack(">IIBBBBB", 17, 5, 8, 0, 0, 0, 0)
    foreign = (
        P._SIG
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + P._chunk(b"IEND", b"")
    )
    assert (P.decode_png(foreign) == px).all()


def test_png_rejects_corruption_and_unsupported():
    from real_time_trip_processing_project_spark.operators import png as P

    g = np.zeros((4, 4), dtype=np.uint8)
    enc = bytearray(P.encode_png(g))
    enc[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError):
        P.decode_png(bytes(enc))
    # interlaced flag set -> refuse, not mis-decode
    enc2 = bytearray(P.encode_png(g))
    ihdr_at = enc2.find(b"IHDR")
    body = bytearray(enc2[ihdr_at + 4 : ihdr_at + 17])
    body[-1] = 1  # interlace = Adam7
    import zlib as _z
    crc = _z.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF
    enc2[ihdr_at + 4 : ihdr_at + 17] = body
    enc2[ihdr_at + 17 : ihdr_at + 21] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="interlace"):
        P.decode_png(bytes(enc2))


def test_real_decode_seam_handles_png():
    from real_time_trip_processing_project_spark.operators import png as P

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    meta = MM._real_decode(P.encode_png(img))
    assert (meta["frame_count"], meta["width"], meta["height"]) == (1, 8, 8)


# ---------------------------------------------------------------------------
# G.711 mu-law (operators/multimodal.py): compressed audio.
# ---------------------------------------------------------------------------


def test_mulaw_matches_audioop():
    """The vectorized mu-law kernels must be bit-compatible with
    CPython's audioop over the ENTIRE int16 domain (encode) and all
    256 byte values (decode) — the independent reference that pins the
    14-bit-shift G.711 variant including the segment-8 saturation."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    all16 = np.arange(-32768, 32768, dtype=np.int16)
    ref_enc = np.frombuffer(
        audioop.lin2ulaw(all16.tobytes(), 2), dtype=np.uint8
    )
    assert (MM.mulaw_encode(all16) == ref_enc).all()
    allb = np.arange(256, dtype=np.uint8)
    ref_dec = np.frombuffer(audioop.ulaw2lin(allb.tobytes(), 2), dtype="<i2")
    assert (MM.mulaw_decode(allb) == ref_dec).all()


def test_mulaw_sql_twin_full_domain():
    """The DuckDB round-trip expression must equal the numpy
    decode(encode(s)) path for every int16 value."""
    import duckdb

    con = duckdb.connect()
    expr = MM.mulaw_decode_sql("s")
    sql_out = con.execute(
        f"SELECT {expr} FROM (SELECT unnest(range(-32768, 32768)) AS s)"
    ).fetchnumpy()
    sqlv = list(sql_out.values())[0].astype(np.int64)
    all16 = np.arange(-32768, 32768, dtype=np.int16)
    npv = MM.mulaw_decode(MM.mulaw_encode(all16)).astype(np.int64)
    assert (sqlv == npv).all()


def test_mulaw_wav_container_roundtrip():
    s = ((np.arange(300) % 256) - 128).astype(np.int64) * 256
    wav = MM.encode_wav_mulaw(s.astype(np.int16))
    d, rate = MM.decode_wav_mulaw(wav)
    assert rate == MM.WAV_SAMPLE_RATE and len(d) == 300
    want = MM.mulaw_decode(MM.mulaw_encode(s))
    assert (d == want).all()
    # PCM16 decoder refuses the mu-law container and vice versa
    with pytest.raises(ValueError):
        MM.decode_wav_pcm16(wav)
    with pytest.raises(ValueError):
        MM.decode_wav_mulaw(MM.encode_wav_pcm16(s.astype(np.int16)))
