"""Multimodal (binary) column plumbing (SURVEY.md §2.7).

The reference is text/number-only; a 100 TB training-data pipeline also
carries images/audio/video as opaque ``binary`` columns with typed
metadata.  This module makes the Spark-side plumbing real — schema,
Arrow batch shape, ``mapInPandas`` signature, partition behavior — with
REAL pure-Python container codecs for all three fixture modalities:
audio (RIFF/WAVE PCM16), image (24-bit uncompressed BMP), and video
(uncompressed 24-bit AVI: RIFF header tree, DIB frame chunks, idx1
index) — plus two real COMPRESSED paths since r7: baseline JPEG
(DCT/quant/Huffman, operators/jpeg.py) carried as MJPEG-in-AVI, and
lossless PNG (DEFLATE + scanline filters, operators/png.py).
Since r9, MP4/H.264 is real too: an I_PCM-profile encoder/decoder over
a full ISO-BMFF container (operators/h264.py) — lossless, so its pixel
queries are fully SQL-oracled.  The remaining marked seam behind
``codec="real"`` narrows to PREDICTED H.264 macroblocks
(Intra/CAVLC/CABAC, inter frames), which genuinely need PIL/av.

Layout conventions that matter at scale:

- media rows are (id, payload: binary, meta: struct) — the payload never
  enters a shuffle key; metadata is columnar so filters on mime/size
  prune without touching bytes.
- feature extraction is ``mapInPandas`` over Arrow record batches:
  payloads stream through Python in zero-copy Arrow buffers, batch size
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
- derived features are small fixed-width columns → the expensive binary
  column is dropped as early as possible (projection pushdown keeps it
  out of downstream scans entirely).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _text_frames(text: str, frame_bytes: int):
    """UTF-8 bytes → a flat zero-padded array holding ≥1 frames of
    ``frame_bytes`` each — THE deterministic text→pixels mapping every
    synthetic media encoder shares (AVI RGB24, MJPEG, MP4 I_PCM, MP4
    Intra_16x16).  One definition so frame inventories stay
    bit-identical across codecs: the MP4 SQL oracles and the i16-vs-
    I_PCM parity test both assume identical frame counts per doc."""
    import numpy as np

    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n_frames = max(-(-len(b) // frame_bytes), 1)
    px = np.zeros(n_frames * frame_bytes, dtype=np.uint8)
    px[: len(b)] = b
    return px


#: Default sample rate for generated WAV fixtures (plain 16 kHz mono).
WAV_SAMPLE_RATE = 16_000


def encode_wav_pcm16(samples, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Serialize int16 mono samples as a canonical RIFF/WAVE byte string
    (PCM format 1, 16-bit little-endian, 44-byte header) — pure Python,
    no audio libraries.  The real codec for the multimodal seam."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(pcm),  # container size after this field
        b"WAVE",
        b"fmt ",
        16,  # PCM fmt chunk is 16 bytes
        1,  # audio format: PCM
        1,  # channels
        sample_rate,
        sample_rate * 2,  # byte rate (16-bit mono)
        2,  # block align
        16,  # bits per sample
        b"data",
        len(pcm),
    )
    return hdr + pcm


def decode_wav_pcm16(payload: bytes):
    """Parse a RIFF/WAVE payload into (int16 numpy samples, sample_rate,
    n_channels) by walking the chunk list (odd-sized chunks carry a pad
    byte, per spec).  Only uncompressed PCM16 is supported — anything
    else raises ``ValueError`` with the offending field."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = data = None
    while pos + 8 <= end:
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        if pos + 8 + size > end:
            # size fields are untrusted input: a truncated/corrupt
            # payload must fail as ValueError, not silently shorten the
            # sample stream or escape as struct.error downstream
            raise ValueError(
                f"truncated chunk {cid!r}: declares {size} bytes, "
                f"{end - pos - 8} remain"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"fmt chunk too short: {len(body)} < 16")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV encoding: format={audio_format}, bits={bits}"
        )
    samples = np.frombuffer(data, dtype="<i2")
    if n_channels > 1:
        samples = samples[: len(samples) - len(samples) % n_channels]
        samples = samples.reshape(-1, n_channels)
    return samples, sample_rate, n_channels

def encode_bmp_rgb24(pixels, top_down: bool = False) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as a real 24-bit
    uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, BGR byte
    order, rows padded to 4 bytes, bottom-up unless ``top_down``) —
    pure Python, no image libraries.  The image codec for the
    multimodal seam, exercising the format's actual gotchas (channel
    flip, row padding, row order)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {px.shape}")
    h, w, _ = px.shape
    bgr = px[:, :, ::-1]
    if not top_down:
        bgr = bgr[::-1, :, :]  # bottom-up row order
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = b"".join(
        bgr[r].tobytes() + b"\x00" * pad for r in range(h)
    )
    bi_height = -h if top_down else h
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, bi_height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return file_hdr + info + body


def decode_bmp_rgb24(payload: bytes):
    """Parse a 24-bit uncompressed BMP back into an (h, w, 3) uint8 RGB
    array, handling bottom-up and top-down (negative height) row order
    and row padding.  Size fields are untrusted: truncation raises
    ``ValueError``, as do compressed or non-24-bit images."""
    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size, w, bi_h, _planes, bits, compression = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if bits != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP encoding: bits={bits}, compression={compression}"
        )
    if w <= 0 or bi_h == 0:
        raise ValueError(f"bad dimensions: {w}x{bi_h}")
    top_down = bi_h < 0
    h = -bi_h if top_down else bi_h
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_offset + stride * h
    if need > len(payload):
        raise ValueError(
            f"truncated BMP: needs {need} bytes, has {len(payload)}"
        )
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)
    bgr = raw[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1, :, :]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def encode_avi_rgb24(frames, fps: int = 10) -> bytes:
    """Serialize an (n, h, w, 3) uint8 RGB frame stack as a real
    uncompressed AVI (RIFF 'AVI ': LIST hdrl with avih + strl
    (strh 'vids'/'DIB ' + strf BITMAPINFOHEADER), LIST movi of '00db'
    DIB frames — bottom-up BGR rows padded to 4-byte strides, exactly
    like BMP bodies — and an idx1 index) — pure Python, no video
    libraries.  The video codec for the multimodal seam."""
    import numpy as np

    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB frames, got {fr.shape}")
    n, h, w, _ = fr.shape
    if n == 0 or h == 0 or w == 0:
        raise ValueError(f"empty frame stack: {fr.shape}")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    frame_size = stride * h

    def dib(frame) -> bytes:
        bgr = frame[::-1, :, ::-1]  # bottom-up rows, BGR channels
        if pad:
            return b"".join(
                bgr[r].tobytes() + b"\x00" * pad for r in range(h)
            )
        return bgr.tobytes()

    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,          # scale / rate → fps frames per second
        0, n,            # start, length (in frames)
        frame_size, 0xFFFFFFFF, 0,  # buffer size, quality, sample size
        0, 0, w, h,      # rcFrame
    )
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) \
        + b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack(
        "<I", 4 + 8 + len(avih) + len(strl)
    ) + b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    chunks, idx, off = [], [], 4  # offsets relative to 'movi' fourcc
    frame_pad = frame_size & 1
    for i in range(n):
        chunks.append(
            b"00db" + struct.pack("<I", frame_size) + dib(fr[i])
            + b"\x00" * frame_pad
        )
        idx.append(struct.pack("<4sIII", b"00db", 0x10, off, frame_size))
        off += 8 + frame_size + frame_pad
    movi_body = b"movi" + b"".join(chunks)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx1 = b"idx1" + struct.pack("<I", 16 * n) + b"".join(idx)
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_raw_frames(payload: bytes, every_nth: int = 1):
    """Walk a RIFF/AVI chunk tree and return
    ``(strf_header, [(frame_idx, chunk_bytes)])`` for every
    ``every_nth`` movi frame chunk — the container layer shared by the
    uncompressed (:func:`decode_avi_rgb24`) and MJPEG
    (operators/jpeg.py:decode_avi_mjpeg) decoders.  Only SELECTED
    frames are sliced; an unsampled frame costs one offset addition —
    the random-access property a frame-sampling pipeline exploits.
    Size fields are untrusted: truncation raises ``ValueError``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if 8 + riff_size > len(payload):
        # a truncation landing exactly on a chunk boundary would
        # otherwise decode silently as a shorter video
        raise ValueError(
            f"truncated RIFF: declares {riff_size} bytes, "
            f"{len(payload) - 8} remain"
        )
    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")
    strf = None
    n_frames = 0
    frame_bodies: list[tuple[int, bytes]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal strf, n_frames
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            if pos + 8 + size > end:
                raise ValueError(
                    f"truncated chunk {cid!r}: declares {size} bytes, "
                    f"{end - pos - 8} remain"
                )
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + size)  # skip the list type
            elif cid == b"strf" and strf is None:
                if size < 40:
                    raise ValueError(f"strf too short: {size} < 40")
                strf = struct.unpack(
                    "<IiiHHI", payload[body_at : body_at + 20]
                )
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                if n_frames % every_nth == 0:  # slice ONLY sampled frames
                    frame_bodies.append(
                        (n_frames, payload[body_at : body_at + size])
                    )
                n_frames += 1
            pos = body_at + size + (size & 1)  # chunks are word-aligned

    walk(12, len(payload))
    if strf is None:
        raise ValueError("missing strf (stream format) chunk")
    return strf, frame_bodies


def decode_avi_rgb24(payload: bytes, every_nth: int = 1):
    """Parse an uncompressed 24-bit AVI back into a list of
    (frame_idx, (h, w, 3) uint8 RGB array) — only every ``every_nth``
    frame (container walk shared with the MJPEG decoder via
    :func:`avi_raw_frames`).  Because the stream is uncompressed,
    frames are independent DIB bodies — bottom-up BGR rows padded to
    4-byte strides, exactly like BMP.  Compressed streams and
    non-24-bit frames raise ``ValueError``."""
    import numpy as np

    strf, frame_bodies = avi_raw_frames(payload, every_nth)
    _size, w, bi_h, _planes, bits, compression = strf
    if bits != 24 or compression != 0:
        raise ValueError(
            f"unsupported AVI encoding: bits={bits}, compression={compression}"
        )
    if w <= 0 or bi_h <= 0:
        raise ValueError(f"bad frame dimensions: {w}x{bi_h}")
    h = bi_h
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    frames = []
    for idx, body in frame_bodies:
        if len(body) < stride * h:
            raise ValueError(
                f"truncated frame: needs {stride * h} bytes, has {len(body)}"
            )
        raw = np.frombuffer(
            body, dtype=np.uint8, count=stride * h
        ).reshape(h, stride)
        bgr = raw[:, :row_bytes].reshape(h, w, 3)
        frames.append((idx, bgr[::-1, :, ::-1].copy()))  # bottom-up, BGR→RGB
    return frames


#: Schema of the synthetic media table derived from ``documents``.
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Output schema of the feature extractor.
MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("frame_count", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: payload = UTF-8 bytes of the text.

    Stands in for `spark.read.format("binaryFile")` / a parquet table
    with a binary column; every downstream op treats payload as opaque.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image/video decoder.

    Real deployment: replace with PIL/av/soundfile decode —
    ``decode_media(..., codec="real")`` is the marked seam.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "content_hash": hashlib.md5(payload).hexdigest(),
        # fake "video": one frame per 64 bytes, ≥1
        "frame_count": max(n // 64, 1),
        # fake dimensions derived from content length (deterministic)
        "width": 64 + (n % 577),
        "height": 64 + (n % 433),
    }


def _real_decode(payload: bytes) -> dict:
    """Real codec for the seam: WAV (RIFF/PCM16) payloads decode fully
    via :func:`decode_wav_pcm16` (frame_count = sample frames; the
    image-only width/height stay NULL for audio); BMP, uncompressed
    AVI, MJPEG AVI, bare baseline JPEG, PNG and MP4/H.264 — full
    baseline intra (I_PCM, Intra_16x16, Intra_4x4 + CAVLC —
    operators/h264.py, h264_intra.py), CABAC full intra + P slices
    (h264_cabac.py), quarter-pel P-frame GOPs (h264_inter.py) and
    bi-predictive B-frame GOPs with ctts reordering (h264_b.py, r12)
    — all decode for real, as do the 2-reference ref_idx P GOPs
    (h264_inter.py ``extra_refs``, r12) and CABAC B GOPs
    (h264_cabac.py, r12).  The remaining explicit
    ``NotImplementedError`` seam is any OTHER container/codec format
    (needs PIL/av, absent from this container); within H.264 the
    ValueError-gated sub-seams are >2 active references,
    ref_pic_list_modification, sub-16x16 B partitions, implicit
    weighted prediction and chroma weights (h264_b.py docstring;
    B_Skip/B_Direct with BOTH direct derivations AND explicit
    weighted bi-prediction shipped r12)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, _rate, n_channels = decode_wav_pcm16(bytes(payload))
        n_frames = len(samples) if n_channels == 1 else samples.shape[0]
        return {
            "n_bytes": len(payload),
            "content_hash": hashlib.md5(payload).hexdigest(),
            "frame_count": n_frames,
            "width": None,
            "height": None,
        }
    if payload[:2] == b"BM":
        px = decode_bmp_rgb24(bytes(payload))
        return {
            "n_bytes": len(payload),
            "content_hash": hashlib.md5(payload).hexdigest(),
            "frame_count": 1,
            "width": px.shape[1],
            "height": px.shape[0],
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from real_time_trip_processing_project_spark.operators import jpeg as J

        strf, _bodies = avi_raw_frames(bytes(payload), every_nth=1)
        if strf[5] == struct.unpack("<I", b"MJPG")[0]:
            mframes = J.decode_avi_mjpeg(bytes(payload))
            h, w = mframes[0][1].shape if mframes else (0, 0)
            return {
                "n_bytes": len(payload),
                "content_hash": hashlib.md5(payload).hexdigest(),
                "frame_count": len(mframes),
                "width": w,
                "height": h,
            }
        frames = decode_avi_rgb24(bytes(payload))
        h, w = (
            (frames[0][1].shape[0], frames[0][1].shape[1])
            if frames
            else (0, 0)
        )
        return {
            "n_bytes": len(payload),
            "content_hash": hashlib.md5(payload).hexdigest(),
            "frame_count": len(frames),
            "width": w,
            "height": h,
        }
    if payload[:2] == b"\xff\xd8":
        from real_time_trip_processing_project_spark.operators import jpeg as J

        px = J.jpeg_decode_gray(bytes(payload))
        return {
            "n_bytes": len(payload),
            "content_hash": hashlib.md5(payload).hexdigest(),
            "frame_count": 1,
            "width": px.shape[1],
            "height": px.shape[0],
        }
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from real_time_trip_processing_project_spark.operators.png import (
            decode_png,
        )

        px = decode_png(bytes(payload))
        return {
            "n_bytes": len(payload),
            "content_hash": hashlib.md5(payload).hexdigest(),
            "frame_count": 1,
            "width": px.shape[1],
            "height": px.shape[0],
        }
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        from real_time_trip_processing_project_spark.operators import (
            h264 as H,
        )

        info = H.parse_mp4(bytes(payload))
        return {
            "n_bytes": len(payload),
            "content_hash": hashlib.md5(payload).hexdigest(),
            "frame_count": len(info["samples"]),
            "width": info["width"],
            "height": info["height"],
        }
    # STUB: every format this repo EMITS decodes for real — audio
    # (RIFF/PCM16, mu-law), image (BMP, PNG, baseline JPEG),
    # uncompressed AVI, MJPEG AVI, and the whole MP4/H.264 family
    # (I_PCM, Intra_16x16, Intra_4x4 + CAVLC as of r10; CABAC full
    # intra + P slices as of r11; quarter-pel P GOPs as of r11;
    # bi-predictive B GOPs with ctts reordering as of r12 —
    # operators/h264.py, h264_intra.py, h264_cabac.py, h264_inter.py,
    # h264_b.py).  The remaining seam is any OTHER container format.
    raise NotImplementedError(
        "real decode supports WAV (RIFF/PCM16 + mu-law), BMP (24-bit "
        "BI_RGB), PNG (8-bit gray/RGB), uncompressed AVI, MJPEG AVI, "
        "baseline grayscale JPEG, and MP4/H.264 (full baseline intra "
        "CAVLC + CABAC full intra/P, quarter-pel P GOPs, B GOPs with "
        "ctts); other container formats need PIL/av — use codec='fake'"
    )


def extract_media_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Feature-extract every media row via Arrow-batched ``mapInPandas``.

    The UDF signature (Iterator[pd.DataFrame] → Iterator[pd.DataFrame])
    is the real production shape: per-batch processing, no per-row Python
    overhead, bounded memory (one Arrow batch resident at a time).
    Partitioning is inherited — no shuffle is introduced.

    ``codec="real"`` decodes WAV payloads for real (see
    :func:`_real_decode`); other mimes raise the documented seam error.
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec: {codec}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                feats = [_real_decode(p) for p in pdf["payload"]]
            else:
                feats = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "payload").mapInPandas(run, MEDIA_FEATURES)


def sample_frames(
    media: DataFrame, every_nth: int = 10, codec: str = "fake"
) -> DataFrame:
    """Frame sampling: explode the frame index space and keep every nth
    frame — the front half of video-frame extraction, where the
    per-frame decode lives in a second ``mapInPandas`` stage
    (:func:`video_frame_features`).  ``codec="real"`` reads the REAL
    frame count out of the container (AVI/WAV/BMP via
    :func:`_real_decode`); ``"fake"`` keeps the deterministic stub."""
    feats = extract_media_features(media, codec=codec)
    frames = feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("frame_count").cast("long") - 1)
        ).alias("frame_idx"),
    )
    return frames.filter(F.col("frame_idx") % every_nth == 0)


#: Output schema of the audio window featurizer — exact integers only,
#: so the DuckDB oracle (character codes of the ASCII fixture payload)
#: matches bit-for-bit.
AUDIO_WINDOWS = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("win", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
    ]
)

#: Audio framing defaults: 256-byte windows, 50% hop.
AUDIO_FRAME = 256
AUDIO_HOP = 128


def media_wav_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL RIFF/WAVE bytes: each doc's
    text bytes become int16 samples (``byte − 128``, the same amplitude
    mapping as the uint8-PCM interpretation) serialized through
    :func:`encode_wav_pcm16`.  Downstream consumers must decode the
    container to get at the signal — this is the fixture generator for
    the real-codec path, shaped like any other ``mapInPandas`` encode
    stage (binary in, binary out, no shuffle)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav_pcm16(
                    np.frombuffer(
                        t.encode("utf-8"), dtype=np.uint8
                    ).astype(np.int16)
                    - 128
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].values, "payload": payloads}
            )

    out_schema = "media_id long, payload binary"
    wav = docs.select("doc_id", "text").mapInPandas(run, out_schema)
    return wav.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit("wav-encoder").alias("source"),
        ).alias("meta"),
    )


def audio_window_features(
    media: DataFrame,
    frame: int = AUDIO_FRAME,
    hop: int = AUDIO_HOP,
    codec: str = "pcm8",
) -> DataFrame:
    """Windowed signal statistics over a binary audio payload: slide
    ``frame``-sample windows at ``hop`` spacing and emit per-window
    energy (Σ amp², exact int) and peak amplitude — the front half of a
    VAD/loudness filter.

    ``codec`` selects the payload interpretation:

    - ``"pcm8"`` — raw unsigned 8-bit PCM; amplitude = byte − 128.
    - ``"wav"`` — a real RIFF/PCM16 container, decoded per payload via
      :func:`decode_wav_pcm16` (channel 0 when multi-channel).

    Scale shape: ``mapInPandas`` over Arrow batches, one numpy
    vectorized pass per batch; output is (windows × 5 ints) — the binary
    column never leaves the stage, and the expansion factor is
    len/hop rows of 40 bytes each.
    """
    import numpy as np

    if codec not in ("pcm8", "wav"):
        raise ValueError(f"unknown audio codec: {codec}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, wins, lens, sums, peaks = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if codec == "wav":
                    s, _rate, n_ch = decode_wav_pcm16(bytes(payload))
                    if n_ch > 1:
                        s = s[:, 0]
                    b = s.astype(np.int64)
                else:
                    b = (
                        np.frombuffer(payload, dtype=np.uint8).astype(
                            np.int64
                        )
                        - 128
                    )
                n = len(b)
                off = 0
                w = 0
                while off < n:
                    seg = b[off : off + frame]
                    mids.append(mid)
                    wins.append(w)
                    lens.append(len(seg))
                    sums.append(int((seg * seg).sum()))
                    peaks.append(int(np.abs(seg).max()))
                    off += hop
                    w += 1
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "win": wins,
                    "n_samples": lens,
                    "sum_sq": sums,
                    "peak": peaks,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, AUDIO_WINDOWS)


#: Fixed width of generated BMP fixtures; height derives from text size.
IMG_W = 8

#: Output schema of the image featurizer — exact integers only, so the
#: DuckDB oracle (character codes of the ASCII fixture text) matches
#: bit-for-bit.
IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_max", T.LongType(), True),
    ]
)


def media_bmp_from_documents(docs: DataFrame, width: int = IMG_W) -> DataFrame:
    """Media table whose payloads are REAL 24-bit BMP bytes: each doc's
    text bytes fill an RGB pixel grid of ``width`` columns (zero-padded
    to the last row), serialized through :func:`encode_bmp_rgb24` —
    bottom-up rows, BGR channels, padded strides and all.  Consumers
    must decode the container to get the pixels back; the fixture
    generator for the real image-codec path."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                h = max(-(-len(b) // (3 * width)), 1)
                px = np.zeros(h * width * 3, dtype=np.uint8)
                px[: len(b)] = b
                payloads.append(
                    encode_bmp_rgb24(px.reshape(h, width, 3))
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].values, "payload": payloads}
            )

    out_schema = "media_id long, payload binary"
    bmp = docs.select("doc_id", "text").mapInPandas(run, out_schema)
    return bmp.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit("bmp-encoder").alias("source"),
        ).alias("meta"),
    )


def image_features(media: DataFrame) -> DataFrame:
    """Decode each BMP payload (:func:`decode_bmp_rgb24`) and emit exact
    integer pixel statistics: dimensions, channel-value sum, and peak
    channel value.  Same scale shape as the other featurizers —
    ``mapInPandas`` over Arrow batches, binary column dropped at this
    stage, small fixed-width output."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, ws, hs, sums, maxs = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_bmp_rgb24(bytes(payload))
                mids.append(mid)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                sums.append(int(px.astype(np.int64).sum()))
                maxs.append(int(px.max()))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "width": ws,
                    "height": hs,
                    "px_sum": sums,
                    "px_max": maxs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, IMAGE_FEATURES
    )


#: Fixed frame geometry of generated AVI fixtures: 4×4 RGB → 48 bytes
#: of text fill one frame.
VID_W = 4
VID_H = 4

#: Output schema of the per-frame video featurizer — exact integers so
#: the DuckDB oracle (character codes over each frame's byte slice of
#: the ASCII fixture text) matches bit-for-bit.
VIDEO_FRAME_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_max", T.LongType(), True),
    ]
)


def media_avi_from_documents(
    docs: DataFrame, width: int = VID_W, height: int = VID_H
) -> DataFrame:
    """Media table whose payloads are REAL uncompressed-AVI bytes: each
    doc's text bytes fill consecutive ``height×width`` RGB frames
    (zero-padded to the last frame, ≥1 frame) serialized through
    :func:`encode_avi_rgb24` — RIFF header tree, bottom-up BGR DIB
    frames, idx1 index and all.  Consumers must walk the container to
    get frames back; the fixture generator for the real video-codec
    path."""
    import numpy as np

    frame_bytes = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                px = _text_frames(t, frame_bytes)
                n_frames = len(px) // frame_bytes
                payloads.append(
                    encode_avi_rgb24(
                        px.reshape(n_frames, height, width, 3)
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].values, "payload": payloads}
            )

    out_schema = "media_id long, payload binary"
    avi = docs.select("doc_id", "text").mapInPandas(run, out_schema)
    return avi.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("video/x-msvideo").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit("avi-encoder").alias("source"),
        ).alias("meta"),
    )


def video_frame_features(
    media: DataFrame, every_nth: int = 1
) -> DataFrame:
    """Decode AVI payloads (:func:`decode_avi_rgb24`) and emit exact
    integer per-FRAME pixel statistics (channel-value sum and peak) for
    every ``every_nth`` frame.  With ``every_nth > 1`` unsampled frames
    are never materialized — the decoder seeks over them by offset
    arithmetic (the uncompressed container's random-access property),
    so sampling divides BOTH output rows and decode bytes.  Binary
    column dropped here; output is sampled-frames × 4 ints."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, sums, maxs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, frame in decode_avi_rgb24(bytes(payload), every_nth):
                    mids.append(mid)
                    idxs.append(i)
                    sums.append(int(frame.astype(np.int64).sum()))
                    maxs.append(int(frame.max()))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": idxs,
                    "px_sum": sums,
                    "px_max": maxs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, VIDEO_FRAME_FEATURES
    )


def audio_zero_crossings(
    media: DataFrame,
    frame: int = AUDIO_FRAME,
    hop: int = AUDIO_HOP,
    codec: str = "pcm8",
) -> DataFrame:
    """Per-window zero-crossing counts — the classic cheap
    voiced/unvoiced discriminator next to energy/peak
    (:func:`audio_window_features`): the number of adjacent sample
    pairs whose amplitudes have strictly opposite signs (product < 0;
    a zero sample crosses nothing).  Exact integers end to end, same
    windowing as the energy featurizer, same Arrow ``mapInPandas``
    scale shape."""
    import numpy as np

    if codec not in ("pcm8", "wav"):
        raise ValueError(f"unknown audio codec: {codec}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, wins, lens, crossings = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if codec == "wav":
                    s, _rate, n_ch = decode_wav_pcm16(bytes(payload))
                    if n_ch > 1:
                        s = s[:, 0]
                    b = s.astype(np.int64)
                else:
                    b = (
                        np.frombuffer(payload, dtype=np.uint8).astype(
                            np.int64
                        )
                        - 128
                    )
                n = len(b)
                if n == 0:
                    continue
                for w in range((n - 1) // hop + 1):
                    seg = b[w * hop : w * hop + frame]
                    mids.append(mid)
                    wins.append(w)
                    lens.append(len(seg))
                    crossings.append(
                        int((seg[:-1] * seg[1:] < 0).sum())
                        if len(seg) > 1
                        else 0
                    )
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "win": wins,
                    "n_samples": lens,
                    "n_crossings": crossings,
                }
            )

    return media.mapInPandas(
        run,
        "media_id long, win long, n_samples long, n_crossings long",
    )


def video_motion_energy(media: DataFrame) -> DataFrame:
    """Per-consecutive-frame-pair motion energy — Σ |pixel difference|
    between decoded frames f and f+1, the temporal feature a
    scene-cut / static-content filter runs over video corpora.  Exact
    integers over the REAL AVI codec (decode per payload, vectorized
    numpy diff); single-frame videos emit nothing."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, pairs, motions = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_avi_rgb24(bytes(payload))
                if len(frames) < 2:
                    continue
                arr = np.stack([f for _i, f in frames]).astype(np.int64)
                d = np.abs(arr[1:] - arr[:-1]).sum(axis=(1, 2, 3))
                for i, m in enumerate(d):
                    mids.append(mid)
                    pairs.append(i)
                    motions.append(int(m))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_pair": pairs,
                    "motion": motions,
                }
            )

    return media.mapInPandas(
        run, "media_id long, frame_pair long, motion long"
    )


# ---------------------------------------------------------------------------
# MJPEG: the compressed-video path (operators/jpeg.py holds the codec).
# ---------------------------------------------------------------------------

#: MJPEG frame dimensions: 16×16 grayscale = 4 DCT blocks per frame.
MJPEG_W = 16
MJPEG_H = 16


def media_mjpeg_from_documents(
    docs: DataFrame, width: int = MJPEG_W, height: int = MJPEG_H,
    lossless: bool = True,
) -> DataFrame:
    """Media table whose payloads are REAL MJPEG AVIs: each doc's text
    bytes fill consecutive ``height×width`` GRAYSCALE frames
    (zero-padded, ≥1 frame), every frame DCT-transformed, quantized,
    Huffman-coded into an independent baseline JPEG inside the RIFF
    container (operators/jpeg.py:encode_avi_mjpeg).  With
    ``lossless=True`` the quant table is all-ones, bounding roundtrip
    error to ±1/pixel (float DCT rounding) — the measurable contract
    the bench quality floor asserts; ``lossless=False`` uses the Annex
    K table (real lossy compression)."""
    import numpy as np

    from real_time_trip_processing_project_spark.operators import jpeg as J

    frame_bytes = width * height
    quant = (
        np.ones((8, 8), dtype=np.int64) if lossless else J.QUANT_LUMA
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                px = _text_frames(t, frame_bytes)
                n_frames = len(px) // frame_bytes
                payloads.append(
                    J.encode_avi_mjpeg(
                        px.reshape(n_frames, height, width), quant=quant
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].values, "payload": payloads}
            )

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    # DCT+Huffman per frame is the CPU-heaviest per-row work in the
    # repo — a one-file local fixture would serialize it onto one task
    mj = spread_small_input(docs.select("doc_id", "text")).mapInPandas(
        run, "media_id long, payload binary"
    )
    return mj.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("video/x-motion-jpeg").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit("mjpeg-encoder").alias("source"),
        ).alias("meta"),
    )


def mjpeg_frame_features(media: DataFrame, every_nth: int = 1) -> DataFrame:
    """Decode MJPEG payloads (container walk + per-frame baseline JPEG
    decode) and emit per-frame pixel statistics of the DECODED (lossy)
    frames.  Sampling skips the JPEG decode entirely for unsampled
    frames — each '00dc' chunk is self-contained, so the walk costs one
    offset addition per skipped frame (the same random-access property
    as the uncompressed path, now with real compression)."""
    import numpy as np

    from real_time_trip_processing_project_spark.operators import jpeg as J

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, sums, maxs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, frame in J.decode_avi_mjpeg(
                    bytes(payload), every_nth
                ):
                    a = frame.astype(np.int64)
                    mids.append(mid)
                    idxs.append(i)
                    sums.append(int(a.sum()))
                    maxs.append(int(a.max()))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": idxs,
                    "px_sum": sums,
                    "px_max": maxs,
                }
            )

    return media.mapInPandas(
        run, "media_id long, frame_idx long, px_sum long, px_max long"
    )


def avi_idx1_entries(payload: bytes) -> list[tuple[bytes, int, int, int]]:
    """Parse the top-level ``idx1`` chunk of a RIFF/AVI payload into
    ``[(fourcc, flags, offset, size)]`` — offsets relative to the
    'movi' fourcc, exactly as both encoders write them.  Returns []
    when the container carries no index.  Header and size fields are
    untrusted (same discipline as :func:`avi_raw_frames`): a missing
    'AVI ' form tag, a RIFF size exceeding the payload, a truncated
    chunk, or an idx1 body that is not a whole number of 16-byte
    entries all raise ``ValueError`` — a partially-valid index must
    never read as consistent."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if 8 + riff_size > len(payload):
        raise ValueError(
            f"truncated RIFF: declares {riff_size} bytes, "
            f"{len(payload) - 8} remain"
        )
    pos, end = 12, len(payload)
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if pos + 8 + size > end:
            raise ValueError(
                f"truncated chunk {cid!r}: declares {size} bytes, "
                f"{end - pos - 8} remain"
            )
        if cid == b"idx1":
            body = payload[pos + 8 : pos + 8 + size]
            if len(body) % 16:
                raise ValueError(
                    f"idx1 body is {len(body)} bytes — not a whole "
                    "number of 16-byte entries"
                )
            return [
                struct.unpack("<4sIII", body[i : i + 16])
                for i in range(0, len(body), 16)
            ]
        pos += 8 + size + (size & 1)
    return []


def mjpeg_container_index(media: DataFrame) -> DataFrame:
    """EXACT container-walk index of an MJPEG AVI — the deterministic
    half of the MJPEG path (the pixel half goes through float DCT and
    stays rows-only).  Per media payload:

    - ``frame_count`` / ``width`` / ``height`` from the movi walk +
      strf header;
    - ``jpeg_ok_frames``: frames whose chunk body is marker-framed as a
      JPEG (SOI ``FFD8`` first, EOI ``FFD9`` last) — every encoder
      frame must qualify;
    - ``index_consistent``: the idx1 entries cross-checked against the
      movi walk itself (fourcc, declared size, and the recomputed
      word-aligned offset of every chunk must all agree);
    - ``px_count``: frames × width × height.

    Everything here is byte-exact, so unlike the decoded-pixel path
    this carries a FULL SQL oracle: frame count and pixel count derive
    from the source text length, and the validity/consistency columns
    are invariants of a correct container (any walk or encoder defect
    flips them and fails the hash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, counts, ws, hs, oks, cons, pxs = [], [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pb = bytes(payload)
                strf, bodies = avi_raw_frames(pb, every_nth=1)
                _size, w, h, _planes, _bits, _compression = strf
                ok = sum(
                    1
                    for _i, b in bodies
                    if len(b) >= 4
                    and b[:2] == b"\xff\xd8"
                    and b[-2:] == b"\xff\xd9"
                )
                # recompute each chunk's movi-relative offset from the
                # walked bodies and require idx1 to agree entry-for-entry;
                # a structurally malformed index (misaligned body, bad
                # form tag) is inconsistent, not a task failure
                try:
                    entries = avi_idx1_entries(pb)
                except ValueError:
                    entries = None
                consistent = (
                    entries is not None and len(entries) == len(bodies)
                )
                entries = entries or []
                off = 4
                for (fourcc, _flags, e_off, e_size), (_i, b) in zip(
                    entries, bodies
                ):
                    if not (
                        fourcc == b"00dc"
                        and e_off == off
                        and e_size == len(b)
                    ):
                        consistent = False
                        break
                    off += 8 + len(b) + (len(b) & 1)
                mids.append(mid)
                counts.append(len(bodies))
                ws.append(int(w))
                hs.append(int(h))
                oks.append(ok)
                cons.append(consistent)
                pxs.append(len(bodies) * int(w) * int(h))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_count": counts,
                    "width": ws,
                    "height": hs,
                    "jpeg_ok_frames": oks,
                    "index_consistent": cons,
                    "px_count": pxs,
                }
            )

    return media.mapInPandas(
        run,
        "media_id long, frame_count long, width long, height long, "
        "jpeg_ok_frames long, index_consistent boolean, px_count long",
    )


# ---------------------------------------------------------------------------
# PNG: the LOSSLESS compressed path (operators/png.py holds the codec).
# ---------------------------------------------------------------------------

#: PNG image width (grayscale, one byte per pixel).
PNG_W = 16


def media_png_from_documents(docs: DataFrame, width: int = PNG_W) -> DataFrame:
    """Media table whose payloads are REAL PNG bytes: each doc's text
    bytes fill a ``width``-column grayscale grid (zero-padded to the
    last row), DEFLATE-compressed through operators/png.py — chunk
    framing, CRC32s, scanline filter bytes and all.  PNG is lossless,
    so the decoded pixels equal the source bytes EXACTLY — which is
    what lets the consumer query carry a full SQL oracle through a
    genuinely compressed container (MJPEG, being lossy, cannot)."""
    import numpy as np

    from real_time_trip_processing_project_spark.operators.png import (
        encode_png,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                h = max(-(-len(b) // width), 1)
                px = np.zeros(h * width, dtype=np.uint8)
                px[: len(b)] = b
                payloads.append(encode_png(px.reshape(h, width)))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].values, "payload": payloads}
            )

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    png = spread_small_input(docs.select("doc_id", "text")).mapInPandas(
        run, "media_id long, payload binary"
    )
    return png.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit("png-encoder").alias("source"),
        ).alias("meta"),
    )


def png_features(media: DataFrame) -> DataFrame:
    """Decode each PNG payload (chunk walk + CRC verify + inflate +
    unfilter) and emit exact integer pixel statistics — identical
    output shape to the BMP featurizer, now through a compressed
    container whose decode is bit-exact."""
    import numpy as np

    from real_time_trip_processing_project_spark.operators.png import (
        decode_png,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, ws, hs, sums, maxs = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_png(bytes(payload)).astype(np.int64)
                mids.append(mid)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                sums.append(int(px.sum()))
                maxs.append(int(px.max()))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "width": ws,
                    "height": hs,
                    "px_sum": sums,
                    "px_max": maxs,
                }
            )

    return media.mapInPandas(
        run,
        "media_id long, width long, height long, px_sum long, px_max long",
    )


# ---------------------------------------------------------------------------
# G.711 μ-law: the compressed-AUDIO path (8-bit companded, format 7).
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84
_ULAW_CLIP14 = 8159


def mulaw_encode(samples) -> "np.ndarray":
    """int16 → 8-bit μ-law bytes, vectorized — bit-compatible with
    CPython's ``audioop.lin2ulaw`` (the 14-bit-shift G.711 variant:
    arithmetic ``s >> 2``, clip 8159, bias 33, 8 segments, inverted
    output).  Pinned over the ENTIRE int16 domain by
    ``test_mulaw_matches_audioop``."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    v14 = s >> 2  # arithmetic shift = floor division by 4
    neg = v14 < 0
    v = np.where(neg, -v14, v14)
    # +33 bias, then saturate to 8191: audioop's seg-8 overflow branch
    # (clip 8159 + 33 = 8192 would otherwise index past segment 7)
    v = np.minimum(np.minimum(v, _ULAW_CLIP14) + 33, 8191)
    seg = np.searchsorted(
        np.array([63, 127, 255, 511, 1023, 2047, 4095]), v, side="left"
    )
    mant = (v >> (seg + 1)) & 0xF
    uval = (seg << 4) | mant
    return (uval ^ np.where(neg, 0x7F, 0xFF)).astype(np.uint8)


def mulaw_decode(ulaw_bytes) -> "np.ndarray":
    """8-bit μ-law → int16, vectorized (``audioop.ulaw2lin`` twin)."""
    import numpy as np

    u = np.asarray(ulaw_bytes, dtype=np.int64) ^ 0xFF
    seg = (u >> 4) & 0x7
    mant = u & 0xF
    t = (((mant << 3) + _ULAW_BIAS) << seg) - _ULAW_BIAS
    return np.where(u & 0x80, -t, t).astype(np.int16)


def mulaw_decode_sql(byte_sql: str) -> str:
    """DuckDB twin of decode∘encode for an int16 sample expression —
    the full companding round trip as ONE pure-SQL integer expression,
    so a query whose samples go through the REAL μ-law container can
    still be hash-verified.  ``byte_sql`` must yield the int16 sample
    (BIGINT)."""
    s = byte_sql
    # floor division by 4 (arithmetic >> 2) via the pmod discipline
    v14 = f"(({s} - ((({s} % 4) + 4) % 4)) // 4)"
    v = (
        f"least(least(CASE WHEN {v14} < 0 THEN -{v14} ELSE {v14} END,"
        f" {_ULAW_CLIP14}) + 33, 8191)"
    )
    seg = (
        f"(CASE WHEN {v} <= 63 THEN 0 WHEN {v} <= 127 THEN 1"
        f" WHEN {v} <= 255 THEN 2 WHEN {v} <= 511 THEN 3"
        f" WHEN {v} <= 1023 THEN 4 WHEN {v} <= 2047 THEN 5"
        f" WHEN {v} <= 4095 THEN 6 ELSE 7 END)"
    )
    two_seg1 = (
        f"(CASE {seg} WHEN 0 THEN 2 WHEN 1 THEN 4 WHEN 2 THEN 8"
        f" WHEN 3 THEN 16 WHEN 4 THEN 32 WHEN 5 THEN 64"
        f" WHEN 6 THEN 128 ELSE 256 END)"
    )
    mant = f"(({v} // {two_seg1}) % 16)"
    # decode of (seg, mant): t = ((mant*8 + BIAS) << seg) - BIAS
    two_seg = f"({two_seg1} // 2)"
    t = f"((({mant} * 8 + {_ULAW_BIAS}) * {two_seg}) - {_ULAW_BIAS})"
    return f"(CASE WHEN {v14} < 0 THEN -{t} ELSE {t} END)"


def encode_wav_mulaw(samples, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Serialize int16 mono samples as a REAL G.711 μ-law WAV
    (WAVE_FORMAT_MULAW = 7, 8 bits per sample) — half the bytes of
    PCM16 through actual companding, the telephony container."""
    import numpy as np

    ul = mulaw_encode(np.asarray(samples, dtype=np.int16)).tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(ul), b"WAVE",
        b"fmt ", 16,
        7,  # WAVE_FORMAT_MULAW
        1, sample_rate, sample_rate, 1, 8,
        b"data", len(ul),
    )
    return hdr + ul


def decode_wav_mulaw(payload: bytes):
    """Parse a μ-law WAV back to (int16 samples, sample_rate) — chunk
    walk as the PCM16 decoder, then the companding expansion."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if pos + 8 + size > end:
            raise ValueError(f"truncated chunk {cid!r}")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 7 or bits != 8 or n_channels != 1:
        raise ValueError(
            f"not mono 8-bit mu-law: format={audio_format}, bits={bits}"
        )
    return mulaw_decode(np.frombuffer(data, dtype=np.uint8)), sample_rate


def media_mulaw_from_documents(docs: DataFrame) -> DataFrame:
    """Media table of REAL μ-law WAVs: each doc's text bytes become
    full-scale int16 samples ``(byte − 128) · 256`` (so the whole
    companding curve is exercised, all 8 segments), companded to 8-bit
    μ-law and wrapped in a format-7 RIFF container."""
    import numpy as np

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                if not len(b):
                    b = np.zeros(1, dtype=np.uint8)
                s = (b.astype(np.int64) - 128) * 256
                payloads.append(encode_wav_mulaw(s.astype(np.int16)))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].values, "payload": payloads}
            )

    wav = spread_small_input(docs.select("doc_id", "text")).mapInPandas(
        run, "media_id long, payload binary"
    )
    return wav.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("audio/basic").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit("mulaw-encoder").alias("source"),
        ).alias("meta"),
    )


def mulaw_features(media: DataFrame) -> DataFrame:
    """Decode μ-law WAV payloads and emit exact integer per-doc sample
    statistics of the EXPANDED (decoded) signal — sum, peak magnitude,
    count.  Deterministic integers end to end, so the consumer query
    carries a full SQL oracle through the companding round trip."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, ns, sums, peaks = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, _rate = decode_wav_mulaw(bytes(payload))
                a = s.astype(np.int64)
                mids.append(mid)
                ns.append(len(a))
                sums.append(int(a.sum()))
                peaks.append(int(np.abs(a).max()))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "n_samples": ns,
                    "sum_decoded": sums,
                    "peak_abs": peaks,
                }
            )

    return media.mapInPandas(
        run,
        "media_id long, n_samples long, sum_decoded long, peak_abs long",
    )


# ---------------------------------------------------------------------------
# MP4 / H.264 (operators/h264.py): the former seam, now a real codec path

MP4_W = 16
MP4_H = 16


def media_mp4_from_documents(
    docs: DataFrame,
    width: int = MP4_W,
    height: int = MP4_H,
    codec: str = "i_pcm",
    qp: int = 26,
) -> DataFrame:
    """Media table whose payloads are REAL MP4s: each doc's text bytes
    fill consecutive ``height×width`` grayscale frames (zero-padded,
    ≥1 frame), every frame encoded as an H.264 IDR picture of I_PCM
    macroblocks inside an ISO-BMFF container with full sample tables
    (operators/h264.py:encode_mp4_h264).  I_PCM is the profile's
    lossless mode, so — unlike the MJPEG float-DCT path — the decoded
    pixels here are BIT-EXACT and the consumer queries carry FULL SQL
    oracles.  ``codec``/``qp`` select the slice encoder exactly as
    :func:`h264.encode_mp4_h264` does (``"i16"``/``"intra"`` give the
    lossy predicted tiers — container invariants stay byte-exact, only
    pixel values pick up quantizer loss)."""
    import numpy as np

    from real_time_trip_processing_project_spark.operators import h264 as H

    frame_bytes = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                px = _text_frames(t, frame_bytes)
                n_frames = len(px) // frame_bytes
                payloads.append(
                    H.encode_mp4_h264(
                        px.reshape(n_frames, height, width),
                        codec=codec,
                        qp=qp,
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].values, "payload": payloads}
            )

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    mp4 = spread_small_input(docs.select("doc_id", "text")).mapInPandas(
        run, "media_id long, payload binary"
    )
    return mp4.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("video/mp4").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit("h264-encoder").alias("source"),
        ).alias("meta"),
    )


def mp4_container_index(
    media: DataFrame, rate_bound_bytes: int | None = None
) -> DataFrame:
    """EXACT box-tree index of an MP4/H.264 payload — the container
    sibling of :func:`mjpeg_container_index`, byte-exact and fully
    SQL-oracled.  Per payload:

    - ``frame_count`` / ``width`` / ``height`` from the sample table
      and the avc1 entry, cross-checked against the PARSED SPS (a
      mismatch between container and bitstream dims flips
      ``index_consistent``);
    - ``idr_ok_frames``: samples whose length-prefixed NAL is an IDR
      slice (type 5) starting at macroblock 0 — every encoder sample
      must qualify;
    - ``index_consistent``: stsc×stco×stsz resolve to exactly
      stsz.sample_count samples, all inside mdat, each holding exactly
      its length-prefixed NALs, stts covering each sample once
      (operators/h264.py:parse_mp4);
    - ``px_count``: frames × width × height.

    ``rate_bound_bytes`` (r10 verdict item 6, for the lossy-codec
    variants): when set, appends a ``within_rate_bound`` column — TRUE
    iff EVERY sample's coded size ≤ the bound.  The per-MB I_PCM
    fallback guarantees this statically for the i16/intra encoders, so
    a FULL SQL oracle can assert the column as a literal TRUE and a
    CAVLC rate regression flips the driver hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from real_time_trip_processing_project_spark.operators import (
            h264 as H,
        )

        for pdf in batches:
            mids, counts, ws, hs, oks, cons, pxs = [], [], [], [], [], [], []
            bounded: list[bool] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pb = bytes(payload)
                try:
                    info = H.parse_mp4(pb)
                except ValueError:
                    mids.append(mid)
                    counts.append(0)
                    ws.append(0)
                    hs.append(0)
                    oks.append(0)
                    cons.append(False)
                    pxs.append(0)
                    bounded.append(False)
                    continue
                consistent = info["index_consistent"] and (
                    info["width"] == info["sps"]["width"]
                    and info["height"] == info["sps"]["height"]
                )
                ls = info["length_size"]
                ok = 0
                for off, size in info["samples"]:
                    if size >= ls + 1:
                        ln = int.from_bytes(pb[off : off + ls], "big")
                        nal0 = pb[off + ls] if ln >= 1 else 0
                        if nal0 & 0x1F == 5:
                            ok += 1
                mids.append(mid)
                counts.append(len(info["samples"]))
                ws.append(info["width"])
                hs.append(info["height"])
                oks.append(ok)
                cons.append(bool(consistent))
                pxs.append(
                    len(info["samples"]) * info["width"] * info["height"]
                )
                bounded.append(
                    rate_bound_bytes is None
                    or all(
                        sz <= rate_bound_bytes
                        for _off, sz in info["samples"]
                    )
                )
            out = {
                "media_id": mids,
                "frame_count": counts,
                "width": ws,
                "height": hs,
                "idr_ok_frames": oks,
                "index_consistent": cons,
                "px_count": pxs,
            }
            if rate_bound_bytes is not None:
                out["within_rate_bound"] = bounded
            yield pd.DataFrame(out)

    schema = (
        "media_id long, frame_count long, width long, height long, "
        "idr_ok_frames long, index_consistent boolean, px_count long"
    )
    if rate_bound_bytes is not None:
        schema += ", within_rate_bound boolean"
    return media.mapInPandas(run, schema)


def mp4_gop_index(
    docs: DataFrame,
    qp: int = 12,
    search_range: int = 4,
    codec: str = "i16p",
    count_b: bool = False,
) -> DataFrame:
    """Container index of the GOP tiers (h264_inter.py P chains;
    h264_b.py B GOPs): encode each doc's text frames as IDR + P (+ B)
    with a real stss sync table, walk the container back, and emit the
    text-derivable invariants a correct GOP must satisfy — frame
    count, dims, exactly ONE IDR NAL (sample 0), sync table = [0],
    stsc×stco×stsz consistency (ctts run-length total included, for
    the B tier) and pixel count.  All integer-deterministic, so the
    registered queries carry FULL SQL oracles (the GOP twin of
    :func:`mp4_container_index`'s role for the all-IDR tiers).

    ``count_b`` (codec="i16pb"): appends ``b_frames`` — samples whose
    ctts composition offset is 0, i.e. the non-reference B pictures
    that display one tick before their decode slot.  The IBP ladder
    makes it exactly ``(frame_count-1)//2``, so the oracle derives it
    from text length alone and any reorder/ctts defect flips the
    driver hash.  Arrow-batched ``mapInPandas``; row-local."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from real_time_trip_processing_project_spark.operators import (
            h264 as H,
        )

        frame_bytes = MP4_W * MP4_H
        for pdf in batches:
            out = {
                "media_id": [], "frame_count": [], "width": [],
                "height": [], "idr_frames": [], "sync_count": [],
                "first_sync": [], "index_consistent": [], "px_count": [],
            }
            if count_b:
                out["b_frames"] = []
            for mid, t in zip(pdf["doc_id"], pdf["text"]):
                px = _text_frames(t, frame_bytes)
                frames = px.reshape(-1, MP4_H, MP4_W)
                payload = H.encode_mp4_h264(
                    frames, codec=codec, qp=qp, search_range=search_range
                )
                try:
                    info = H.parse_mp4(payload)
                except ValueError:
                    info = None
                out["media_id"].append(mid)
                if info is None:
                    for k in ("frame_count", "width", "height",
                              "idr_frames", "sync_count", "px_count"):
                        out[k].append(0)
                    out["first_sync"].append(-1)
                    out["index_consistent"].append(False)
                    if count_b:
                        out["b_frames"].append(0)
                    continue
                ls = info["length_size"]
                idr = 0
                for off, size in info["samples"]:
                    if size >= ls + 1:
                        nal0 = payload[off + ls]
                        if nal0 & 0x1F == 5:
                            idr += 1
                sync = info["sync_samples"]
                out["frame_count"].append(len(info["samples"]))
                out["width"].append(info["width"])
                out["height"].append(info["height"])
                out["idr_frames"].append(idr)
                out["sync_count"].append(len(sync))
                out["first_sync"].append(sync[0] if sync else -1)
                out["index_consistent"].append(
                    bool(
                        info["index_consistent"]
                        and info["width"] == info["sps"]["width"]
                        and info["height"] == info["sps"]["height"]
                    )
                )
                out["px_count"].append(
                    len(info["samples"]) * info["width"] * info["height"]
                )
                if count_b:
                    offs = info["ctts_offsets"] or []
                    out["b_frames"].append(
                        sum(1 for o in offs if o == 0)
                    )
            yield pd.DataFrame(out)

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    schema = (
        "media_id long, frame_count long, width long, height long, "
        "idr_frames long, sync_count long, first_sync long, "
        "index_consistent boolean, px_count long"
    )
    if count_b:
        schema += ", b_frames long"
    return spread_small_input(docs.select("doc_id", "text")).mapInPandas(
        run, schema
    )


def mp4_frame_features(media: DataFrame, every_nth: int = 1) -> DataFrame:
    """Decode MP4/H.264 payloads and emit per-frame pixel statistics.
    Every sample is a self-contained IDR, so sampling skips unsampled
    frames by TABLE lookup (stsz/stco arithmetic) — no decode cost for
    skipped frames.  I_PCM decode is lossless, so px_sum/px_max are
    exact integers and the consumer query carries a FULL SQL oracle —
    the first compressed-container VIDEO path in the repo whose pixel
    values hash-verify cross-engine."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from real_time_trip_processing_project_spark.operators import (
            h264 as H,
        )

        for pdf in batches:
            mids, idxs, sums, maxs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _sps, frames = H.decode_mp4_h264(bytes(payload), every_nth)
                for i, frame in frames:
                    a = frame.astype(np.int64)
                    mids.append(mid)
                    idxs.append(i)
                    sums.append(int(a.sum()))
                    maxs.append(int(a.max()))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": idxs,
                    "px_sum": sums,
                    "px_max": maxs,
                }
            )

    return media.mapInPandas(
        run, "media_id long, frame_idx long, px_sum long, px_max long"
    )


def mp4_i16_frame_stats(
    docs: DataFrame,
    width: int = MP4_W,
    height: int = MP4_H,
    qp: int = 12,
    codec: str = "i16",
) -> DataFrame:
    """PREDICTED-macroblock video tier end-to-end (r10): the same
    deterministic text→frames pixels as :func:`media_mp4_from_documents`
    encoded as **Intra_16x16 + CAVLC** at ``qp`` (operators/
    h264_intra.py — real spatial prediction, 4x4 integer transform +
    DC Hadamard, spec quant, CAVLC entropy coding), containered as MP4,
    then DECODED back through the full parse path; emits per-frame
    distortion stats vs the source pixels plus the compressed size.

    ``codec`` selects the slice encoder: ``"i16"`` (pure Intra_16x16,
    the default the i16 query's floors are pinned to), ``"intra"``
    (per-MB Intra_4x4/I16/PCM mode decision — the full-baseline-intra
    query's path) or ``"i16_cabac"`` (the same I16 analysis under the
    arithmetic entropy coder, h264_cabac.py — identical distortion
    stats by construction, different rate).  Lossy by quantizer (unlike the I_PCM twin), so the
    registered queries are rows-only with bench floors on mean/max
    pixel error and the PCM-bound sample size — the MJPEG discipline.  The whole pipeline is INTEGER-deterministic (no float
    DCT), so the stats themselves are stable across runs/machines and
    golden-pinned in tests.  Arrow-batched ``mapInPandas``; row-local,
    nothing shuffles at any scale."""
    import numpy as np

    frame_bytes = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from real_time_trip_processing_project_spark.operators import (
            h264 as H,
        )

        for pdf in batches:
            mids, idxs, sads, mxs, nals, szs, pxs = (
                [], [], [], [], [], [], [],
            )
            for mid, t in zip(pdf["doc_id"], pdf["text"]):
                px = _text_frames(t, frame_bytes)
                src = px.reshape(-1, height, width)
                payload = H.encode_mp4_h264(src, codec=codec, qp=qp)
                info = H.parse_mp4(payload)
                sample_sizes = [sz for _off, sz in info["samples"]]
                _sps, decoded = H.decode_mp4_h264(payload)
                for i, frame in decoded:
                    err = np.abs(
                        frame.astype(np.int64) - src[i].astype(np.int64)
                    )
                    mids.append(mid)
                    idxs.append(i)
                    sads.append(int(err.sum()))
                    mxs.append(int(err.max()))
                    # per-FRAME coded size (length-prefixed NAL sample)
                    # — the rate figure; mp4_bytes is the whole-file
                    # size repeated per row (container amortization)
                    nals.append(int(sample_sizes[i]))
                    szs.append(len(payload))
                    pxs.append(frame_bytes)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": idxs,
                    "sum_abs_err": sads,
                    "max_abs_err": mxs,
                    "sample_bytes": nals,
                    "mp4_bytes": szs,
                    "px_count": pxs,
                }
            )

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    return spread_small_input(docs.select("doc_id", "text")).mapInPandas(
        run,
        "media_id long, frame_idx long, sum_abs_err long, "
        "max_abs_err long, sample_bytes long, mp4_bytes long, "
        "px_count long",
    )
