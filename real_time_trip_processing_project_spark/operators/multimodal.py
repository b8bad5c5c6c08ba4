"""Multimodal (binary) column plumbing (SURVEY.md §2.7).

The reference is text/number-only; a 100 TB training-data pipeline also
carries images/audio/video as opaque ``binary`` columns with typed
metadata.  This module makes the Spark-side plumbing real — schema,
Arrow batch shape, ``mapInPandas`` signature, partition behavior — while
the actual codec step is stubbed (no image/audio libs in this
container): ``decode_media`` raises ``NotImplementedError`` unless the
deterministic fake decoder is selected.

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
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def extract_media_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Feature-extract every media row via Arrow-batched ``mapInPandas``.

    The UDF signature (Iterator[pd.DataFrame] → Iterator[pd.DataFrame])
    is the real production shape: per-batch processing, no per-row Python
    overhead, bounded memory (one Arrow batch resident at a time).
    Partitioning is inherited — no shuffle is introduced.
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec: {codec}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                # STUB: container has no image/audio libraries
                # (PIL / pyav / soundfile).  The Arrow plumbing above and
                # the schema below are production-real; only this codec
                # call is missing.
                raise NotImplementedError(
                    "real media decode requires PIL/av; use codec='fake'"
                )
            feats = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "payload").mapInPandas(run, MEDIA_FEATURES)


def sample_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing: explode the (fake) frame index space and
    keep every nth frame — the shape of video-frame extraction, where the
    per-frame decode would live in a second ``mapInPandas`` stage.
    """
    feats = extract_media_features(media)
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


def audio_window_features(
    media: DataFrame, frame: int = AUDIO_FRAME, hop: int = AUDIO_HOP
) -> DataFrame:
    """Windowed signal statistics over a binary audio payload: treat the
    payload as unsigned 8-bit PCM, slide ``frame``-byte windows at
    ``hop`` spacing, and emit per-window energy (Σ(b−128)², exact int)
    and peak amplitude — the front half of a VAD/loudness filter.

    Scale shape: ``mapInPandas`` over Arrow batches, one numpy
    vectorized pass per batch; output is (windows × 5 ints) — the binary
    column never leaves the stage, and the expansion factor is
    len/hop rows of 40 bytes each.  A real pipeline swaps the uint8
    interpretation for the decoded waveform behind the same seam as
    :func:`extract_media_features`.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, wins, lens, sums, peaks = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64) - 128
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
