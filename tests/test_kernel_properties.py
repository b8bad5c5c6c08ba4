"""Property-based (hypothesis) tests for the pure-Python/numpy kernels —
the pieces whose correctness everything Spark-side composes on but which
need no SparkSession to falsify: the winnowing pipeline's numpy kernel
vs a brute-force reference, the Karp–Rabin constants' overflow bounds,
the media codecs' round-trips on arbitrary shapes, and the group-state
eviction invariants.

These run in milliseconds per example (no JVM), so hypothesis can
afford hundreds of adversarial cases per property.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_trip_processing_project_spark.functions import rolling as RK
from real_time_trip_processing_project_spark.operators import dedup as DD
from real_time_trip_processing_project_spark.operators import multimodal as MM

#: Text alphabet spanning ASCII, Latin-1, BMP CJK, and astral plane —
#: every UTF-32 width class the codepoint kernels must handle.
TEXT = st.text(
    alphabet=st.sampled_from("ab c.\n\tñé£€北京🎉𝄞"), max_size=400
)


def _brute_winnow(text: str, k: int, w: int) -> set[int]:
    """O(n·k·w) reference winnowing: literal Schleimer et al. — poly
    hash of every gram recomputed from scratch, min of every window."""
    codes = [ord(c) for c in text]
    g = len(codes) - k + 1
    if g < w:
        return set()
    hs = []
    for i in range(g):
        h = 0
        for j in range(k):
            h = (h * RK.KR_BASE + codes[i + j]) % RK.KR_MOD
        hs.append(h)
    return {min(hs[i : i + w]) for i in range(g - w + 1)}


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_winnow_numpy_kernel_matches_brute_force(text):
    """The vectorized kernel inside winnow_fingerprints (shifted MACs +
    doubling-ladder sliding min + unique) must equal the from-scratch
    reference on arbitrary unicode, including texts straddling the
    k / k+w−1 boundaries."""
    k, w = DD.WINNOW_K, DD.WINNOW_W
    want = _brute_winnow(text, k, w)
    # replicate the kernel exactly as the mapInPandas body computes it
    g = len(text) - k + 1
    if g < w:
        got = set()
    else:
        codes = np.frombuffer(
            text.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        h = np.zeros(g, dtype=np.int64)
        for j, p in enumerate(RK.kr_pows(k)):
            h += (codes[j : j + g] * p) % RK.KR_MOD
        h %= RK.KR_MOD
        lvl, d = h, 1
        p2 = 1 << (w.bit_length() - 1)
        while d < p2:
            lvl = np.minimum(lvl[:-d], lvl[d:])
            d *= 2
        if w != p2:
            off = w - p2
            lvl = np.minimum(lvl[: g - w + 1], lvl[off : off + g - w + 1])
        else:
            lvl = lvl[: g - w + 1]
        got = set(np.unique(lvl).tolist())
    assert got == want


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_kr_gram_hashes_never_overflow_int64(text):
    """The overflow discipline the rolling module documents, checked on
    arbitrary codepoints: every pre-mod term and every k-term residue
    sum stays below 2^63 (numpy would wrap silently otherwise)."""
    k = DD.WINNOW_K
    codes = [ord(c) for c in text]
    if len(codes) < k:
        return
    pows = RK.kr_pows(k)
    for i in range(len(codes) - k + 1):
        acc = 0
        for j, p in enumerate(pows):
            term = codes[i + j] * p
            assert term < 2**63
            acc += term % RK.KR_MOD
        assert acc < 2**63


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 4),   # frames
    st.integers(1, 6),   # height
    st.integers(1, 6),   # width
    st.integers(0, 2**32 - 1),  # pixel seed
)
def test_avi_roundtrip_arbitrary_shapes(n, h, w, seed):
    """encode→decode is the identity for every (n, h, w) shape — row
    padding, odd widths, single-pixel frames included — and sampled
    decode returns exactly the strided subset."""
    rng = np.random.default_rng(seed)
    fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    payload = MM.encode_avi_rgb24(fr)
    back = MM.decode_avi_rgb24(payload)
    assert [i for i, _ in back] == list(range(n))
    assert all(np.array_equal(fr[i], b) for i, b in back)
    for step in (2, 3):
        sampled = MM.decode_avi_rgb24(payload, every_nth=step)
        assert [i for i, _ in sampled] == list(range(0, n, step))
        assert all(np.array_equal(fr[i], b) for i, b in sampled)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 7),
    st.integers(1, 7),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_bmp_roundtrip_arbitrary_shapes(h, w, top_down, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    back = MM.decode_bmp_rgb24(MM.encode_bmp_rgb24(px, top_down=top_down))
    assert np.array_equal(back, px)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-(2**15), 2**15 - 1), max_size=300))
def test_wav_roundtrip_arbitrary_samples(samples):
    s, rate, ch = MM.decode_wav_pcm16(MM.encode_wav_pcm16(samples))
    assert ch == 1 and rate == MM.WAV_SAMPLE_RATE
    assert s.tolist() == samples


@settings(max_examples=120, deadline=None)
@given(
    st.dictionaries(
        st.text(st.sampled_from("abcdef"), min_size=1, max_size=4),
        st.tuples(
            st.booleans(),  # has start payload
            st.booleans(),  # has end payload
            st.booleans(),  # completed
            st.integers(0, 20),  # last-touched batch
        ),
        max_size=12,
    ),
    st.integers(1, 25),  # current batch number
    st.integers(1, 8),   # keep_for window
)
def test_group_state_eviction_invariants(entries, batch_no, keep_for):
    """_evict_group_state: (a) never drops an OPEN trip with payload,
    (b) always drops empty placeholders, (c) drops a completed trip iff
    its last touch is ≥ keep_for batches old, (d) keep_for=None keeps
    every completed trip."""
    from real_time_trip_processing_project_spark.streaming.correlator import (
        _evict_group_state,
    )

    def build():
        trips, last = {}, {}
        for tid, (has_s, has_e, c, touched) in entries.items():
            s = {"trip_id": tid} if has_s else None
            e = {"trip_id": tid} if has_e else None
            trips[tid] = [s, e, c]
            last[tid] = touched
        return trips, last

    trips, last = build()
    _evict_group_state(trips, last, batch_no, keep_for)
    for tid, (has_s, has_e, c, touched) in entries.items():
        placeholder = not has_s and not has_e and not c
        stale = c and (batch_no - touched >= keep_for)
        expect_gone = placeholder or stale
        assert (tid not in trips) == expect_gone, (
            tid, has_s, has_e, c, touched, batch_no, keep_for
        )
        assert (tid in last) == (tid in trips)

    trips, last = build()
    _evict_group_state(trips, last, batch_no, None)
    for tid, (has_s, has_e, c, touched) in entries.items():
        placeholder = not has_s and not has_e and not c
        assert (tid not in trips) == placeholder
