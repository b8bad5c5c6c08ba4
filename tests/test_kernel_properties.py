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
        trips = {}
        for tid, (has_s, has_e, c, touched) in entries.items():
            s = [tid] if has_s else None  # v3: positional payload arrays
            e = [tid] if has_e else None
            trips[tid] = [s, e, c, touched]
        return trips

    trips = build()
    _evict_group_state(trips, batch_no, keep_for)
    for tid, (has_s, has_e, c, touched) in entries.items():
        placeholder = not has_s and not has_e and not c
        stale = c and (batch_no - touched >= keep_for)
        expect_gone = placeholder or stale
        assert (tid not in trips) == expect_gone, (
            tid, has_s, has_e, c, touched, batch_no, keep_for
        )

    trips = build()
    _evict_group_state(trips, batch_no, None)
    for tid, (has_s, has_e, c, touched) in entries.items():
        placeholder = not has_s and not has_e and not c
        assert (tid not in trips) == placeholder


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=600_000), min_size=5, max_size=40
    )
)
def test_zscore_integerization_equals_float_form(vals):
    """The integerized 3σ test (v·n − S)² > 9·(n·S₂ − S²) must agree
    with the float z² > 9 comparison away from exact-boundary ties
    (where the integer form is the DEFINED semantics)."""
    import math

    n = len(vals)
    S = sum(vals)
    S2 = sum(v * v for v in vals)
    for v in vals:
        lhs = (v * n - S) ** 2
        rhs = 9 * (n * S2 - S * S)
        int_flag = lhs > rhs
        mu = S / n
        var = S2 / n - mu * mu
        if var > 0:
            z2 = (v - mu) ** 2 / var
            if not math.isclose(z2, 9.0, rel_tol=1e-9):
                assert int_flag == (z2 > 9.0), (v, vals)
        else:
            # zero variance ⇒ every v equals μ ⇒ never an outlier
            assert not int_flag


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=12),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_triangle_reference_orientations_agree(pairs):
    """Degree-ordered and id-ordered triangle enumeration (the Spark
    operator's trick vs the oracle's) must count identically — checked
    here against a third, brute-force reference over random graphs."""
    import itertools

    edges = {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }
    nodes = sorted({x for e in edges for x in e})
    # brute force: every 3-subset
    per_node = {u: 0 for u in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if (
            (x, y) in edges
            and (y, z) in edges
            and (x, z) in edges
        ):
            per_node[x] += 1
            per_node[y] += 1
            per_node[z] += 1
    # id-ordered two-join enumeration (the oracle's shape)
    per_node2 = {u: 0 for u in nodes}
    es = sorted(edges)
    for u, v in es:
        for v2, w in es:
            if v2 == v and (u, w) in edges:
                per_node2[u] += 1
                per_node2[v] += 1
                per_node2[w] += 1
    assert per_node == per_node2


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=15),
            st.integers(min_value=1, max_value=15),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_bfs_reference_matches_python_bfs(pairs, cap):
    """The multi-source local-minima BFS semantics (what both the Spark
    loop and the recursive oracle implement) against a plain Python
    BFS."""
    from collections import deque

    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if not adj:
        return
    seeds = [u for u, nbrs in adj.items() if all(v > u for v in nbrs)]
    depth = {u: 0 for u in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if depth[u] >= cap:
            continue
        for v in adj[u]:
            if v not in depth:
                depth[v] = depth[u] + 1
                q.append(v)
    # recursive-CTE shape: min over all ≤cap-hop path lengths from seeds
    ref: dict[int, int] = {}
    frontier = {u: 0 for u in seeds}
    ref.update(frontier)
    for d in range(1, cap + 1):
        nxt = {}
        for u in frontier:
            for v in adj[u]:
                if v not in ref and v not in nxt:
                    nxt[v] = d
        ref.update(nxt)
        frontier = nxt
    assert depth == ref


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=24), min_size=1, max_size=12))
def test_h32_sql_twin_matches_python_reference(strings):
    """The DuckDB twin of the minhash 32-bit md5-nibble hash must equal
    a direct Python computation of the same definition for arbitrary
    strings (the Spark side is pinned separately by the full
    dedup_minhash_lsh oracle hash)."""
    import hashlib

    import duckdb

    from real_time_trip_processing_project_spark.operators.dedup import (
        h32_sql,
    )

    con = duckdb.connect()
    for s in strings:
        digest = hashlib.md5(s.encode("utf-8")).hexdigest()
        want = int(digest[:8], 16)
        got = con.execute(
            f"SELECT {h32_sql('s')} FROM (SELECT ? AS s)", [s]
        ).fetchone()[0]
        assert got == want, (s, got, want)


def test_zscore_merge_redelivery_is_noop():
    """At-least-once guard on the rolling-z-score buffer: redelivering
    an already-buffered event_id (source file reprocessed after
    checkpoint loss) must not re-emit it nor perturb the prefix sums —
    the batch containing only the duplicate is a no-op, and a
    duplicate-plus-fresh batch emits exactly what the fresh-only batch
    would."""
    import pandas as pd

    from real_time_trip_processing_project_spark.streaming.jobs import (
        _zscore_merge_batch,
    )

    T0 = 1_704_067_200_000_000
    def pdf(rows):
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([T0 + r[1] for r in rows], unit="us"),
                "user_id": 7,
                "value": [r[2] for r in rows],
            }
        )

    batch1 = [(1, 0, 1.0), (2, 1_000_000, 2.0), (3, 2_000_000, 3.0)]
    _, state = _zscore_merge_batch(
        ([], [], []), pdf(batch1), 7, 86_400_000_000, 2
    )
    assert sorted(state[2]) == [1, 2, 3]

    # pure redelivery: no output, state unchanged
    out, state2 = _zscore_merge_batch(
        state, pdf([batch1[1]]), 7, 86_400_000_000, 2
    )
    assert out is None
    assert state2 == state

    # duplicate + fresh arrival == fresh-only arrival
    fresh = [(4, 3_000_000, 4.0)]
    out_mixed, st_mixed = _zscore_merge_batch(
        state, pdf([batch1[0]] + fresh), 7, 86_400_000_000, 2
    )
    out_fresh, st_fresh = _zscore_merge_batch(
        state, pdf(fresh), 7, 86_400_000_000, 2
    )
    assert out_mixed.to_dict("records") == out_fresh.to_dict("records")
    assert st_mixed == st_fresh
    assert sorted(st_mixed[2]) == [1, 2, 3, 4]


def test_h32_spark_matches_python(spark):
    """The Spark side of the 32-bit md5-nibble shingle hash (now a
    single ``conv(substring(md5, 1, 8), 16, 10)``) must equal the
    direct Python definition for assorted strings, including unicode —
    pinning that the conv rewrite kept the value identical to the
    DuckDB strpos-arithmetic twin."""
    import hashlib

    from real_time_trip_processing_project_spark.operators.dedup import _h32
    from pyspark.sql import functions as F

    strings = ["", "a", "hello world", "héllo wörld", "0", "ffffffff",
               "the quick brown fox", "é中文", " spaces  "]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", _h32(F.col("s")).alias("h")).collect()}
    for s in strings:
        want = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
        assert got[s] == want, (s, got[s], want)


def test_minhash_kernel_matches_expr_form(spark):
    """The Arrow minhash-signature kernel must produce BIT-identical
    signatures to the JVM expression form (explode → 64-min hash agg)
    on real fixture docs plus edge shapes — same md5 base, same
    universal transforms, same minima."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_project_spark.operators import dedup as D
    from real_time_trip_processing_project_spark.sources.readers import (
        load_fixture,
    )

    docs = load_fixture(spark, "/root/testdata/sf0.001", "documents").limit(
        60
    )
    extra = spark.createDataFrame(
        [
            (100001, "one two three four five six seven"),
            (100002, "x " * 300),  # long, repetitive
            (100003, "unique tokens only here now ok fine yes"),
        ],
        "doc_id long, text string",
    )
    sh = D.shingled_docs(docs.select("doc_id", "text").unionByName(extra))
    kernel = {
        r["id"]: (r["n_sh"], tuple(r["sig"]))
        for r in D._minhash_from_sh(sh).collect()
    }
    expr = {
        r["id"]: (r["n_sh"], tuple(r["sig"]))
        for r in D._minhash_from_sh_expr(sh).collect()
    }
    assert kernel == expr and kernel


# ---------------------------------------------------------------------------
# r14 text-kernel properties: the pure per-document computations the new
# Arrow kernels run, falsified against literal references (no JVM)
# ---------------------------------------------------------------------------

_SYM = st.sampled_from(["a", "b", "c", "ab", "bc", "x", " "])


@settings(max_examples=400, deadline=None)
@given(
    st.lists(_SYM, max_size=40),
    _SYM, _SYM,
)
def test_greedy_merge_scan_equals_fold_reference(syms, a, b):
    """tokenizer._greedy_merge_scan (the BPE kernel's pass) must equal
    the aggregate fold's literal semantics — replace acc[-1] when
    (acc[-1], s) == (a, b) — for arbitrary streams and rules, including
    a == b runs and rules whose merged token collides with other
    symbols in the stream."""
    from real_time_trip_processing_project_spark.operators.tokenizer import (
        _greedy_merge_scan,
    )

    m = a + b
    acc = []
    for s in syms:
        if acc and acc[-1] == a and s == b:
            acc[-1] = m
        else:
            acc.append(s)
    assert _greedy_merge_scan(syms, a, b, m) == acc


_ASCII_TEXT = st.text(
    alphabet=st.sampled_from("ab1 .\t\nxy!Z"), max_size=200
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_ASCII_TEXT, max_size=8))
def test_pair_count_byte_mask_equals_string_reference(texts):
    """The byte-bigram mask trick (join words with ' ', drop pairs
    containing the separator byte) must equal the per-word substring
    enumeration the expression form implements."""
    from collections import Counter

    want = Counter()
    for t in texts:
        for w in t.split():
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    want[w[i : i + 2]] += 1

    joined = " ".join(" ".join((t or "").split()) for t in texts)
    b = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
    got = Counter()
    if len(b) >= 2:
        sep = np.uint8(32)
        mask = (b[:-1] != sep) & (b[1:] != sep)
        codes = (
            b[:-1][mask].astype(np.int32) * 256
            + b[1:][mask].astype(np.int32)
        )
        uniq, cnt = np.unique(codes, return_counts=True)
        for u, n in zip(uniq.tolist(), cnt.tolist()):
            got[chr(u >> 8) + chr(u & 0xFF)] += n
    assert got == want


@settings(max_examples=300, deadline=None)
@given(_ASCII_TEXT)
def test_script_profile_bincount_equals_char_classes(t):
    """The per-doc bincount classes must equal literal per-char
    classification (space is the literal ' ' only — tab/newline are
    'other', matching the [^ ] regex class)."""
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    cnt = np.bincount(b, minlength=256)
    n_alpha = int(cnt[65:91].sum() + cnt[97:123].sum())
    n_digit = int(cnt[48:58].sum())
    n_space = int(cnt[32])
    n_other = len(b) - n_alpha - n_digit - n_space
    assert n_alpha == sum(1 for c in t if c.isascii() and c.isalpha())
    assert n_digit == sum(1 for c in t if c.isdigit())
    assert n_space == t.count(" ")
    assert n_other == sum(
        1 for c in t
        if not (c.isascii() and c.isalpha()) and not c.isdigit() and c != " "
    )


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 8),          # queries
    st.integers(2, 12),         # cells
    st.integers(1, 4),          # m subspaces
    st.integers(2, 8),          # ks codebook entries
    st.integers(0, 60),         # corpus rows in the batch
    st.integers(1, 9),          # kr shortlist bound
    st.integers(0, 2**31 - 1),  # seed
)
def test_ivfpq_scorer_flat_gather_matches_reference(
    nq, n_cells, m, ks, n, kr, seed
):
    """The r17 flat-offset ADC gather (boolean cell LUT + single-array
    fancy index + array-built frames) must be BIT-identical to the
    literal reference scorer it replaced: per-query ``np.isin`` cell
    mask, three-array fancy-index LUT gather, per-query frames.
    ``pq_topk``'s inline scorer is the no-mask special case of the same
    kernel."""
    import pandas as pd

    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )

    rng = np.random.default_rng(seed)
    qids = np.arange(nq, dtype=np.int64) * 7
    luts = np.full((nq, n_cells, m, ks), np.inf)
    n_probes = max(1, n_cells // 2)
    probe = np.argsort(rng.random((nq, n_cells)), axis=1)[:, :n_probes]
    for qi in range(nq):
        luts[qi, probe[qi]] = rng.random((n_probes, m, ks))
    probesets = [set(map(int, probe[qi])) for qi in range(nq)]

    pdf = pd.DataFrame(
        {
            "neighbor_id": np.arange(n, dtype=np.int64),
            "cell": rng.integers(0, n_cells, n).astype("int32"),
            "codes": list(rng.integers(0, ks, (n, m), dtype=np.int32)),
        }
    )

    # Literal pre-r17 reference semantics.
    marange = np.arange(m)
    outs = []
    if n:
        cell = pdf["cell"].to_numpy()
        Cc = np.stack(pdf["codes"].to_numpy())
        nid = pdf["neighbor_id"].to_numpy()
        for qi in range(nq):
            mask = np.isin(cell, list(probesets[qi]))
            if not mask.any():
                continue
            cc = cell[mask]
            cd = Cc[mask]
            adc = luts[qi][cc[:, None], marange[None, :], cd].sum(1)
            take = min(kr, len(adc))
            sel = np.argpartition(adc, take - 1)[:take]
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "neighbor_id": nid[mask][sel],
                        "adc": adc[sel],
                    }
                )
            )

    got = list(SIM._ivfpq_scorer(qids, luts, probesets, kr, m)(iter([pdf])))
    if not outs:
        assert got == []
        return
    want = pd.concat(outs, ignore_index=True)
    assert len(got) == 1
    g = got[0]
    assert list(g.columns) == list(want.columns)
    assert (g["query_id"].to_numpy() == want["query_id"].to_numpy()).all()
    assert (
        g["neighbor_id"].to_numpy() == want["neighbor_id"].to_numpy()
    ).all()
    # exact float equality — the gather is the SAME elements summed on
    # the same axis, so any drift here is a real kernel change
    assert (g["adc"].to_numpy() == want["adc"].to_numpy()).all()


@settings(max_examples=50, deadline=None)
@given(
    st.integers(2, 40),          # rows per side
    st.sampled_from([8, 64, 256, 1024]),  # dimensions
    st.floats(0.5, 0.99),        # threshold
    st.integers(0, 2**31 - 1),   # seed
)
def test_f32_prefilter_band_never_drops_true_pairs(n, d, t, seed):
    """The r17 float32 score-stage gemm with the dimension-aware band
    (``_f32_prefilter_band``) must keep EVERY pair whose exact f64
    sequential cosine is ≥ t — losing one would change
    ``cosine_pairs_blocked``'s output; over-fetching is fine (the exact
    verify stage re-filters).  Vectors are drawn adversarially close to
    the threshold: random pairs are blended toward cos = t so the band
    is exercised where it matters."""
    from real_time_trip_processing_project_spark.operators.similarity import (
        _f32_prefilter_band,
    )

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    # blend half the rows toward row 0 so many cosines land near t
    alpha = np.sqrt(max(t, 0.0))
    X[n // 2:] = alpha * X[0] + np.sqrt(1 - alpha**2) * X[n // 2:]
    X /= np.linalg.norm(X, axis=1, keepdims=True)

    # exact sequential-order f64 cosine (the verify stage / oracle form)
    exact = np.array(
        [
            [float(sum(float(a) * float(b) for a, b in zip(X[i], X[j])))
             for j in range(n)]
            for i in range(n)
        ]
    )
    true_pairs = {(i, j) for i in range(n) for j in range(n) if exact[i, j] >= t}

    Xf = X.astype(np.float32)
    Xf = Xf / np.maximum(np.linalg.norm(Xf, axis=1, keepdims=True), 1e-12)
    t32 = np.float32(t - _f32_prefilter_band(d))
    got = Xf @ Xf.T >= t32
    kept = {(i, j) for i in range(n) for j in range(n) if got[i, j]}
    assert true_pairs <= kept, sorted(true_pairs - kept)[:5]
