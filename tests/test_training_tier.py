"""Semantics tests for the training-data pipeline tier that the DuckDB
oracle can't express: LSH recall vs exact twins, SimHash locality, and
the multimodal codec seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_project_spark.operators import multimodal as MM
from real_time_trip_processing_project_spark.plans import REGISTRY, RETIRED
from real_time_trip_processing_project_spark.sources.readers import load_fixture

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_matches_exact_jaccard(spark):
    """At the fixture's planted ~0.99-Jaccard near-dups, 16×4 banding has
    collision probability ≈ 1 − 1e-22 — LSH must find the exact pair set."""
    exact = {
        (r.id_a, r.id_b)
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, SF).collect()
    }
    assert exact, "fixture should contain planted near-dup pairs"
    # verification filter makes LSH ⊆ exact; banding makes exact ⊆ LSH here
    assert lsh == exact


def test_cc_star_contraction_logarithmic_on_path_graph(spark):
    """A planted 50-node path (worst case for min-label propagation:
    diameter 49 rounds) must converge in O(log n) star-contraction
    rounds with every node labeled by the path's minimum id."""
    from real_time_trip_processing_project_spark.operators import dedup as DD

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 50)], "id_a LONG, id_b LONG"
    )
    stars, rounds, converged = DD.cc_star_contraction(pairs)
    assert converged
    assert rounds <= 10, f"expected O(log n) rounds, used {rounds}"
    labels = {r.doc_id: r.canonical_id
              for r in DD.connected_components(pairs).collect()}
    assert labels == {i: 1 for i in range(1, 51)}


def test_cc_nonconverged_still_one_label_per_node(spark):
    """Truncated contraction (max_iterations=1 on a 50-path) must still
    honor the one-canonical-per-doc contract via the min-label collapse,
    with labels consistent (every label is a node ≤ its doc)."""
    import warnings

    from real_time_trip_processing_project_spark.operators import dedup as DD

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 50)], "id_a LONG, id_b LONG"
    )
    _, _, converged = DD.cc_star_contraction(pairs, max_iterations=1)
    assert not converged
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rows = DD.connected_components(pairs, max_iterations=1).collect()
    labels = {}
    for r in rows:
        assert r.doc_id not in labels, f"duplicate label for {r.doc_id}"
        labels[r.doc_id] = r.canonical_id
    assert set(labels) == set(range(1, 51))
    assert all(c <= d for d, c in labels.items())


def test_cc_multiple_components_and_cycles(spark):
    """Two components (one with a cycle + chord) resolve to their min
    ids; no cross-contamination."""
    from real_time_trip_processing_project_spark.operators import dedup as DD

    pairs = spark.createDataFrame(
        [(3, 7), (7, 5), (5, 3), (7, 9), (20, 21), (21, 22)],
        "id_a LONG, id_b LONG",
    )
    labels = {r.doc_id: r.canonical_id
              for r in DD.connected_components(pairs).collect()}
    assert labels == {3: 3, 5: 3, 7: 3, 9: 3, 20: 20, 21: 20, 22: 20}


def test_jaccard_prefix_filter_prunes_candidates(spark):
    """The PPJoin prefix filter must (a) lose no qualifying pair — the
    registered query equals the unfiltered full-index join — and (b)
    measurably shrink the candidate set (the Zipf guard it exists for)."""
    from real_time_trip_processing_project_spark.operators import dedup as DD
    from real_time_trip_processing_project_spark.plans.training import JACCARD_T

    docs = load_fixture(spark, SF, "documents")
    sh = DD.shingled_docs(docs)
    posting = sh.select("id", "n_sh", F.explode("shingles").alias("shingle"))
    a, b = posting.alias("a"), posting.alias("b")
    t = JACCARD_T
    full_cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.n_sh") * F.lit(t) <= F.col("a.n_sh"))
            & (F.col("a.n_sh") * F.lit(t) <= F.col("b.n_sh")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    full_pairs = {
        (r.id_a, r.id_b, r.jaccard)
        for r in DD._verify_pairs(full_cand, sh, t).collect()
    }
    pp_pairs = {
        (r.id_a, r.id_b, r.jaccard)
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF).collect()
    }
    assert pp_pairs == full_pairs and pp_pairs
    n_full = full_cand.count()
    n_prefix = DD.jaccard_prefix_candidates(docs, t).count()
    print(f"\nPPJoin candidates: {n_prefix} vs full-index {n_full} "
          f"({n_full / max(n_prefix, 1):.1f}x reduction)")
    assert n_prefix < n_full


def test_prefix_l2_candidates_match_l1(spark):
    """The 2-token pair-key prefix scheme (the quadratic-resistant order
    the operator auto-selects above _PREFIX_L2_MIN_DOCS — SCALE.md r13)
    must produce EXACTLY the same verified pairs as the classic 1-token
    scheme on the fixture corpus, and its candidate set must be a
    subset (the l-prefix lemma only ever removes false positives)."""
    from real_time_trip_processing_project_spark.operators import dedup as DD
    from real_time_trip_processing_project_spark.plans.training import JACCARD_T

    docs = load_fixture(spark, SF, "documents")
    t = JACCARD_T
    p1 = {
        (r.id_a, r.id_b, r.jaccard)
        for r in DD.jaccard_pairs(docs, t, l=1).collect()
    }
    p2 = {
        (r.id_a, r.id_b, r.jaccard)
        for r in DD.jaccard_pairs(docs, t, l=2).collect()
    }
    assert p1 and p2 == p1
    c1 = {
        (r.id_a, r.id_b)
        for r in DD.jaccard_prefix_candidates(docs, t, l=1).collect()
    }
    c2 = {
        (r.id_a, r.id_b)
        for r in DD.jaccard_prefix_candidates(docs, t, l=2).collect()
    }
    assert c2 <= c1
    assert {(a, b) for a, b, _ in p1} <= c2  # still a sound superset


def test_cosine_topk_numpy_kernel_matches_expr(spark):
    """The Arrow/BLAS matmul scoring kernel (auto-selected above
    _COSINE_NUMPY_MIN_ROWS corpus rows — 22× at 200 k vectors, SCALE.md
    r13) must return rows IDENTICAL to the sequential-order codegen
    expression the DuckDB oracle mirrors, including the round-6 cosine
    and the (cos DESC, neighbor_id ASC) ranks — the per-batch local
    top-k pre-reduction is exact by the union argument."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )
    from real_time_trip_processing_project_spark.plans.training import (
        _ann_queries,
    )

    emb = load_fixture(spark, SF, "embeddings")
    q = _ann_queries(emb)
    expr = {tuple(r) for r in SIM.cosine_topk(emb, q, 10, kernel="expr").collect()}
    np_k = {tuple(r) for r in SIM.cosine_topk(emb, q, 10, kernel="numpy").collect()}
    assert expr and np_k == expr


def test_prefix_l2_edge_cases(spark):
    """Hand-built corpus hitting the l=2 scheme's seams: single-shingle
    docs (overlap bound < 2 → routed through the residual 1-token
    tier), two-shingle exact twins (the smallest pair-key-eligible
    docs), and a pair at EXACTLY the 0.8 threshold (the ceil-slack
    boundary).  SHINGLE_W = 3, so an n-word doc has n−2 shingles."""
    from real_time_trip_processing_project_spark.operators import dedup as DD

    rows = [
        # single-shingle twins (3 words): Jaccard 1.0, n_sh = 1
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),
        # two-shingle twins (4 words): smallest ⌈t·n⌉ ≥ 2 docs
        (3, "delta epsilon zeta eta"),
        (4, "delta epsilon zeta eta"),
        # boundary pair: 7 words (5 shingles) vs 6 words (4 shingles,
        # a prefix subset) → overlap 4, union 5, Jaccard exactly 0.8
        (5, "w1 w2 w3 w4 w5 w6 w7"),
        (6, "w1 w2 w3 w4 w5 w6"),
        # unrelated doc — must pair with nothing
        (7, "theta iota kappa lambda mu"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {(1, 2, 1.0), (3, 4, 1.0), (5, 6, 0.8)}
    for l in (1, 2):
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in DD.jaccard_pairs(docs, 0.8, l=l).collect()
        }
        assert got == want, (l, got)


def test_ann_recall_vs_brute_force(spark):
    """8 tables × 8 bits + radius-2 multi-probe on quasi-random 64-d
    vectors: recall@10 ≈ 0.97 measured at sf0.1; assert a floor with
    margin for fixture drift (chance ≈ k/N ≈ 0.02)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, SF).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_ann_lsh"].fn(spark, SF).collect()
    }
    assert bf
    assert len(bf & ann) / len(bf) >= 0.85


def test_ivf_recall_vs_brute_force(spark):
    """IVF (64 cells, 40 probes — the fixture vectors are nearly
    unclustered, so credible recall needs a wide probe; finer cells at
    the same scanned fraction buy recall, r6): recall@10 ≈ 0.945
    measured at sf0.1; assert a floor with drift margin."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, SF).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_ann_ivf"].fn(spark, SF).collect()
    }
    assert bf
    assert len(bf & ivf) / len(bf) >= 0.75


def test_blocked_cosine_pairs_match_brute_force(spark):
    """Metric blocking (k-means cells + triangle-inequality pruning) is
    lossless: the registered query must be row-identical to the O(N²)
    brute-force twin."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )
    from real_time_trip_processing_project_spark.plans.training import COSINE_T

    emb = load_fixture(spark, SF, "embeddings")
    brute = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in SIM.cosine_pairs(emb, COSINE_T).collect()
    }
    blocked = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, SF).collect()
    }
    assert brute, "fixture should contain qualifying pairs"
    assert blocked == brute


def test_blocked_cosine_invariant_to_cell_count_and_tile(spark, monkeypatch):
    """The blocking is lossless by construction, so the output must not
    depend on tuning knobs: same rows at n_cells=64 as the registered
    auto-√N plan, same rows again with the score matmul forced through
    many tiny tiles (_SCORE_TILE=7 → multi-tile on every block)."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )
    from real_time_trip_processing_project_spark.plans.training import COSINE_T

    emb = load_fixture(spark, SF, "embeddings")
    base = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, SF).collect()
    }
    assert base, "fixture should contain qualifying pairs"
    cells64 = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in SIM.cosine_pairs_blocked(emb, COSINE_T, n_cells=64).collect()
    }
    assert cells64 == base
    monkeypatch.setattr(SIM, "_SCORE_TILE", 7)
    tiled = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in SIM.cosine_pairs_blocked(emb, COSINE_T, n_cells=64).collect()
    }
    assert tiled == base


def test_cell_pair_join_path_matches_driver_loop(spark, monkeypatch):
    """Past _CELL_PAIR_JOIN_MIN_K the candidate cell pairs come from a
    broadcast centroid self-join instead of the driver k² loop; forcing
    the join path at fixture scale must leave the output unchanged."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )
    from real_time_trip_processing_project_spark.plans.training import COSINE_T

    emb = load_fixture(spark, SF, "embeddings")
    loop = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in SIM.cosine_pairs_blocked(emb, COSINE_T, n_cells=24).collect()
    }
    monkeypatch.setattr(SIM, "_CELL_PAIR_JOIN_MIN_K", 0)
    joined = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in SIM.cosine_pairs_blocked(emb, COSINE_T, n_cells=24).collect()
    }
    assert loop, "fixture should contain qualifying pairs"
    assert joined == loop


def test_ivf_output_stable_across_partitioning(spark):
    """kmeans init is ordered-by-id, so sim_ann_ivf must be byte-identical
    under different file-split decisions (the failure mode of a bare
    ``limit`` without ``orderBy``)."""
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, str(128 * 1024 * 1024))
        a = sorted(map(tuple, REGISTRY["sim_ann_ivf"].fn(spark, SF).collect()))
        spark.conf.set(key, str(64 * 1024))
        b = sorted(map(tuple, REGISTRY["sim_ann_ivf"].fn(spark, SF).collect()))
    finally:
        spark.conf.set(key, old)
    assert a == b


def test_kmeans_small_corpus_clamps(spark):
    """k larger than the corpus must clamp instead of raising."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )

    emb = load_fixture(spark, SF, "embeddings").limit(5)
    cents = SIM.kmeans_fit(emb, k=16, iters=1)
    assert 1 <= len(cents) <= 5


def test_simhash_locality(spark):
    """Planted near-dup pairs must sit closer in Hamming space than the
    population median — the property SimHash bucketing exploits."""
    sims = {
        r.id: r.simhash for r in REGISTRY["dedup_simhash"].fn(spark, SF).collect()
    }
    near = [
        (r.id_a, r.id_b)
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF).collect()
    ]
    assert near

    def ham(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    near_d = [ham(sims[a], sims[b]) for a, b in near]
    ids = sorted(sims)[:80]
    far_d = [
        ham(sims[a], sims[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if (a, b) not in set(near)
    ]
    avg_near = sum(near_d) / len(near_d)
    avg_far = sum(far_d) / len(far_d)
    assert avg_near < avg_far / 2, (avg_near, avg_far)


def test_approx_count_distinct_error_bound(spark):
    """The HLL++ estimate (rows-only for the driver) must sit within a
    generous multiple of its configured 2% relative standard deviation
    of the exact distinct counts."""
    from real_time_trip_processing_project_spark.sources.readers import (
        load_fixture,
    )

    orders = load_fixture(spark, SF, "orders")
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r["o_orderstatus"]: r["n_custs_approx"]
        for r in REGISTRY["approx_count_distinct"].fn(spark, SF).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(5, 0.1 * n), (k, approx[k], n)


def test_multimodal_real_codec_is_stubbed(spark):
    """The 'real' decode path on NON-WAV payloads is an explicit
    NotImplementedError seam (text bytes are not a RIFF container)."""
    docs = load_fixture(spark, SF, "documents").limit(4)
    media = MM.media_from_documents(docs)
    with pytest.raises(Exception) as ei:
        MM.extract_media_features(media, codec="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
    with pytest.raises(ValueError):
        MM.extract_media_features(media, codec="nope")


def test_wav_codec_roundtrip():
    """encode_wav_pcm16 → decode_wav_pcm16 recovers samples and rate
    bit-exactly, including negative amplitudes and an odd-length data
    chunk's pad byte handling on a trailing chunk."""
    import numpy as np

    s = np.array([0, 1, -1, 32767, -32768, 128, -200], dtype=np.int16)
    payload = MM.encode_wav_pcm16(s, sample_rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert len(payload) == 44 + 2 * len(s)
    got, rate, n_ch = MM.decode_wav_pcm16(payload)
    assert rate == 8000 and n_ch == 1
    assert np.array_equal(got, s)
    # chunk walker: an unknown odd-sized chunk before fmt/data, with its
    # spec-mandated pad byte, must be skipped cleanly
    extra = b"LIST" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    patched = payload[:12] + extra + payload[12:]
    patched = (
        patched[:4]
        + (len(patched) - 8).to_bytes(4, "little")
        + patched[8:]
    )
    got2, _, _ = MM.decode_wav_pcm16(patched)
    assert np.array_equal(got2, s)
    with pytest.raises(ValueError):
        MM.decode_wav_pcm16(b"\x89PNG not audio")
    # untrusted size fields: a data chunk declaring more bytes than the
    # payload holds must raise ValueError, not silently truncate samples
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_wav_pcm16(payload[:-4])
    # a fmt chunk shorter than its 16 mandatory bytes → ValueError, not
    # struct.error
    short_fmt = (
        b"RIFF" + (30).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (8).to_bytes(4, "little") + b"\x01\x00\x01\x00\x40\x1f\x00\x00"
        + b"data" + (0).to_bytes(4, "little")
    )
    with pytest.raises(ValueError, match="fmt chunk too short"):
        MM.decode_wav_pcm16(short_fmt)


def test_common_span_pairs_semantics(spark):
    """Winnowing span dedup: a verbatim run ≥ w+k−1 chars shared by two
    docs is GUARANTEED detected; disjoint docs and sub-k overlaps are
    not; a fingerprint in > max_postings docs is capped out."""
    import random

    from real_time_trip_processing_project_spark.operators import dedup as DD

    rng = random.Random(5)
    alpha = "abcdefghijklmnopqrstuvwxyz "

    def rand_text(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    shared = rand_text(DD.WINNOW_W + DD.WINNOW_K - 1)  # detection floor
    boiler = rand_text(DD.WINNOW_W + DD.WINNOW_K - 1)
    rows = [
        (1, rand_text(80) + shared + rand_text(80)),
        (2, rand_text(90) + shared + rand_text(70)),
        (3, rand_text(200)),                  # fresh text — no pair
        (4, rand_text(30)),                   # too short for the floor
    ]
    # boilerplate: identical text in MANY docs → every fingerprint hits
    # the postings cap, no pairs (mixed-content docs can still pair via
    # window minimizers straddling the boilerplate boundary, which only
    # a subset shares — by design)
    rows += [(100 + i, boiler) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in DD.common_span_pairs(docs, max_postings=4).collect()
    }
    assert (1, 2) in got
    assert all(3 not in p and 4 not in p for p in got)
    assert not any(a >= 100 and b >= 100 for a, b in got), (
        "boilerplate span must be capped out"
    )


def test_winnow_arrow_matches_expr_twin(spark):
    """The Arrow (numpy) winnowing default must be row-identical to the
    pure-expression twin — the shape the DuckDB oracle evaluates — on
    adversarial inputs: non-ASCII codepoints (astral included), docs at
    exactly the k / k+w−1 length boundaries, empty and null texts."""
    import random

    from real_time_trip_processing_project_spark.operators import dedup as DD

    rng = random.Random(11)
    alpha = "abcdefgh ñé北京🎉"  # multibyte + astral plane
    def rand_text(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    k, w = DD.WINNOW_K, DD.WINNOW_W
    shared = rand_text(w + k - 1)
    rows = [
        (1, rand_text(120) + shared + rand_text(40)),
        (2, shared + rand_text(100)),
        (3, rand_text(k + w - 2)),   # one below the floor
        (4, rand_text(k + w - 1)),   # exactly the floor → 1 window
        (5, rand_text(k - 1)),       # below gram size → no grams
        (6, ""),
        (7, None),
        (8, rand_text(500)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, DD.winnow_fingerprints(docs).collect()))
    b = sorted(map(tuple, DD.winnow_fingerprints_expr(docs).collect()))
    assert a == b
    assert any(d == 4 for d, _ in a)      # floor doc fingerprinted
    assert all(d not in (3, 5, 6, 7) for d, _ in a)


def test_bmp_codec_roundtrip():
    """encode_bmp_rgb24 → decode_bmp_rgb24 recovers the RGB array
    bit-exactly across odd widths (row padding), bottom-up and top-down
    row order; untrusted size fields fail as ValueError."""
    import numpy as np

    rng = np.random.default_rng(7)
    for h, w in ((1, 1), (3, 5), (7, 8), (4, 3)):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for td in (False, True):
            back = MM.decode_bmp_rgb24(MM.encode_bmp_rgb24(px, top_down=td))
            assert np.array_equal(back, px), (h, w, td)
    payload = MM.encode_bmp_rgb24(
        rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    )
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_bmp_rgb24(payload[:-3])
    with pytest.raises(ValueError, match="not a BMP"):
        MM.decode_bmp_rgb24(b"\x89PNG not an image")
    # 24-bit BI_RGB only: a declared 8-bit image must be rejected
    bad_bits = bytearray(payload)
    bad_bits[28] = 8
    with pytest.raises(ValueError, match="unsupported BMP"):
        MM.decode_bmp_rgb24(bytes(bad_bits))


def test_avi_codec_roundtrip():
    """encode_avi_rgb24 → decode_avi_rgb24 recovers every RGB frame
    bit-exactly across frame counts and odd widths (DIB row padding);
    untrusted size fields fail as ValueError, as do compressed or
    non-24-bit streams."""
    import numpy as np

    rng = np.random.default_rng(11)
    for n, h, w in ((1, 1, 1), (3, 4, 4), (5, 3, 5), (2, 7, 1)):
        fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        back = MM.decode_avi_rgb24(MM.encode_avi_rgb24(fr))
        assert [i for i, _ in back] == list(range(n)), (n, h, w)
        assert all(np.array_equal(a, b) for a, (_, b) in zip(fr, back))
        # sampled decode: only every 2nd frame materializes, indices true
        sampled = MM.decode_avi_rgb24(MM.encode_avi_rgb24(fr), every_nth=2)
        assert [i for i, _ in sampled] == list(range(0, n, 2))
        assert all(np.array_equal(fr[i], b) for i, b in sampled)
    payload = MM.encode_avi_rgb24(
        rng.integers(0, 256, (3, 4, 4, 3), dtype=np.uint8)
    )
    for cut in (len(payload) // 2, len(payload) - 1, 13):
        with pytest.raises(ValueError, match="truncated|missing"):
            MM.decode_avi_rgb24(payload[:cut])
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        MM.decode_avi_rgb24(b"\x00\x01\x02 not a video")
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        MM.decode_avi_rgb24(MM.encode_wav_pcm16([1, 2, 3]))  # RIFF, not AVI
    # uncompressed 24-bit only: find strf in the header tree and flip
    # its biBitCount to 8 — must be rejected, not mis-sliced
    bad = bytearray(payload)
    at = payload.index(b"strf")
    bad[at + 8 + 14] = 8  # biBitCount low byte inside BITMAPINFOHEADER
    with pytest.raises(ValueError, match="unsupported AVI"):
        MM.decode_avi_rgb24(bytes(bad))


def test_real_decode_avi_frame_count():
    """The real-codec seam reports the true decoded frame count and
    dimensions for AVI payloads — the r5 seam raised NotImplementedError
    for video; only compressed formats remain stubbed."""
    import numpy as np

    fr = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    feats = MM._real_decode(MM.encode_avi_rgb24(fr))
    assert feats["frame_count"] == 2
    assert (feats["width"], feats["height"]) == (4, 4)
    # JPEG, PNG and MP4/H.264 I_PCM are REAL codecs (operators/jpeg.py,
    # operators/png.py, operators/h264.py since r9): a malformed stream
    # is a decode error, not a stub; the marked seam shrank to
    # predicted/entropy-coded H.264 macroblocks
    with pytest.raises(ValueError):
        MM._real_decode(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ValueError):
        MM._real_decode(b"\x89PNG\r\n\x1a\n not-a-real-png")
    with pytest.raises(ValueError, match="missing"):
        MM._real_decode(b"\x00\x00\x00\x18ftypmp42 rest-of-mp4")
    with pytest.raises(NotImplementedError, match="B GOPs"):
        MM._real_decode(b"not-any-known-container at all............")


def test_real_decode_bmp_dimensions():
    """The real-codec seam reports true decoded dimensions for BMP
    payloads (frame_count 1), unlike the fake codec's derived fakes."""
    import numpy as np

    px = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(5, 3, 3)
    feats = MM._real_decode(MM.encode_bmp_rgb24(px))
    assert (feats["width"], feats["height"]) == (3, 5)
    assert feats["frame_count"] == 1


def test_wav_windows_match_pcm8_path(spark):
    """The real-codec path (text → int16 samples → RIFF bytes → decode →
    windows) must emit row-identical features to the synthetic uint8-PCM
    interpretation of the same text — the parity the shared DuckDB
    oracle asserts, checked here engine-side only."""
    docs = load_fixture(spark, SF, "documents").limit(40).filter(
        F.col("text").rlike(r"\A[\x00-\x7F]*\z")
    )
    pcm8 = {
        (r.media_id, r.win): (r.n_samples, r.sum_sq, r.peak)
        for r in MM.audio_window_features(
            MM.media_from_documents(docs)
        ).collect()
    }
    wav = {
        (r.media_id, r.win): (r.n_samples, r.sum_sq, r.peak)
        for r in MM.audio_window_features(
            MM.media_wav_from_documents(docs), codec="wav"
        ).collect()
    }
    assert pcm8 and wav == pcm8


def test_wav_real_codec_features(spark):
    """codec='real' feature extraction on genuine WAV payloads: correct
    byte count, md5 of the container, and frame_count = sample count."""
    import hashlib

    docs = load_fixture(spark, SF, "documents").limit(8)
    media = MM.media_wav_from_documents(docs)
    raw = {r.media_id: bytes(r.payload) for r in media.collect()}
    feats = {
        r.media_id: r
        for r in MM.extract_media_features(media, codec="real").collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(feats) == set(raw)
    for mid, r in feats.items():
        assert r.n_bytes == len(raw[mid])
        assert r.content_hash == hashlib.md5(raw[mid]).hexdigest()
        assert r.frame_count == len(texts[mid].encode("utf-8"))
        assert r.width is None and r.height is None


def test_frame_sample_counts(spark):
    """Frame sampling keeps ceil(frame_count/10) frames per media row."""
    docs = load_fixture(spark, SF, "documents").limit(50)
    media = MM.media_from_documents(docs)
    feats = {r.media_id: r.frame_count for r in MM.extract_media_features(media).collect()}
    sampled = (
        MM.sample_frames(media, every_nth=10)
        .groupBy("media_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = {r.media_id: r.n for r in sampled}
    want = {m: (fc + 9) // 10 for m, fc in feats.items()}
    assert got == want


# ---------------------------------------------------------------------------
# Curation ops: controlled-input semantics (the oracle checks parity on
# fixture data; these pin the *meaning* on hand-built corpora)
# ---------------------------------------------------------------------------

def _split_of(doc_id: int) -> str:
    import hashlib

    h = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
    return "train" if h < "cccc" else "eval"


def test_contamination_semantics(spark):
    """An eval doc copied verbatim from a train doc is 100% contaminated;
    a disjoint-vocabulary eval doc is 0%."""
    from real_time_trip_processing_project_spark.operators import curation as CU

    train_id = next(i for i in range(1000) if _split_of(i) == "train")
    eval_ids = [i for i in range(1000) if _split_of(i) == "eval"]
    copy_id, fresh_id = eval_ids[0], eval_ids[1]
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (train_id, base),
            (copy_id, base),
            (fresh_id, "uno dos tres cuatro cinco seis siete ocho"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in CU.contamination_check(docs).collect()}
    assert set(got) == {copy_id, fresh_id}  # train docs are not audited
    assert got[copy_id]["contamination_ppm"] == 1_000_000
    assert got[copy_id]["n_contaminated"] == got[copy_id]["n_shingles"]
    assert got[fresh_id]["contamination_ppm"] == 0


def test_pack_sequences_semantics(spark):
    """Contiguous packing: bin = floor(start_offset / budget) in the
    deterministic md5 order, independently per md5 shard; totals and
    doc counts conserved."""
    import hashlib

    from real_time_trip_processing_project_spark.operators import curation as CU

    ids = list(range(6))
    docs = spark.createDataFrame(
        [(i, "en", "tok " * 6) for i in ids],  # 6 ws-tokens each
        "doc_id LONG, lang STRING, text STRING",
    )
    rows = CU.pack_sequences(docs, budget=10).collect()
    by_shard: dict[str, list[int]] = {}
    for i in ids:
        by_shard.setdefault(
            hashlib.md5(str(i).encode()).hexdigest()[0], []
        ).append(i)
    exp_bins: dict[tuple[str, int], list[int]] = {}
    for shard, members in by_shard.items():
        order = sorted(
            members,
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        for pos, i in enumerate(order):
            exp_bins.setdefault((shard, (pos * 6) // 10), []).append(i)
    got = {(r["shard"], r["bin"]): r for r in rows}
    assert set(got) == set(exp_bins)
    for key, members in exp_bins.items():
        assert got[key]["n_docs"] == len(members)
        assert got[key]["bin_tokens"] == 6 * len(members)
        assert got[key]["min_doc_id"] == min(members)


def test_pack_sequences_shards_bound_language_skew(spark):
    """A 95%-one-language corpus must spread its window work across the
    md5 shards (not one partition per lang): the dominant stratum shows
    ≥ 8 distinct shards, each conserving its doc/token totals."""
    from real_time_trip_processing_project_spark.operators import curation as CU

    rows = [(i, "en" if i % 20 else "fr", "w " * 5) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    out = CU.pack_sequences(docs, budget=50).collect()
    en_shards = {r["shard"] for r in out if r["stratum"] == "en"}
    assert len(en_shards) >= 8, en_shards
    assert sum(r["n_docs"] for r in out) == 400
    assert sum(r["bin_tokens"] for r in out) == 400 * 5
    # the window spec itself must carry the shard key
    plan = CU.pack_sequences(docs, budget=50)._jdf.queryExecution().toString()
    assert "shard" in plan


def test_pii_redact_semantics(spark):
    """Every pattern family detected and replaced; clean text untouched."""
    from real_time_trip_processing_project_spark.functions import text as TX

    df = spark.createDataFrame(
        [
            (1, "write to a.user+x@ex-1.org or 123-45-6789 or 4111111111111111 ok"),
            (2, "no pii here, just 42 and v1.2"),
        ],
        "id LONG, text STRING",
    )
    counts = TX.pii_count_exprs("text")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            counts["email"].alias("e"),
            counts["ssn"].alias("s"),
            counts["card"].alias("c"),
            TX.pii_redact_expr("text").alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["s"], out[1]["c"]) == (1, 1, 1)
    assert out[1]["red"] == "write to <EMAIL> or <SSN> or <NUM> ok"
    assert (out[2]["e"], out[2]["s"], out[2]["c"]) == (0, 0, 0)
    assert out[2]["red"] == "no pii here, just 42 and v1.2"


def test_quantize_int8_codes_in_range_and_error_bound(spark):
    """Quantization semantics the oracle can't state: every code fits in
    int8, and per-element reconstruction error ≤ (scale/2)² ⇒ total
    ≤ d·(scale/2)²."""
    from real_time_trip_processing_project_spark.operators.similarity import (
        quantize_int8,
    )

    emb = load_fixture(spark, SF, "embeddings")
    q = quantize_int8(emb)
    joined = q.join(emb.select("vec_id", F.size("embedding").alias("d")), "vec_id")
    bad = joined.filter(
        (F.col("sq_err") > F.col("d") * (F.col("scale_r") / 2) ** 2 + 1e-6)
    ).count()
    assert bad == 0
    # codes in [-127, 127]: reconstruct code range from the hash inputs
    codes = (
        quantize_int8(emb)
        .select("vec_id")
        .join(emb, "vec_id")
        .select(
            F.aggregate(
                F.transform("embedding", lambda x: F.abs(x.cast("double"))),
                F.lit(0.0),
                lambda a, x: F.greatest(a, x),
            ).alias("amax")
        )
    )
    # |x|/scale ≤ 127 by construction of scale = amax/127 — spot-check engine-side
    assert codes.filter(F.col("amax") < 0).count() == 0


def test_mixture_sample_rates(spark):
    """Per-stratum keep rates track the md5-prefix thresholds (16-bit
    uniform hash ⇒ binomial; assert within ±0.15 absolute at n≥50)."""
    from real_time_trip_processing_project_spark.plans.training import (
        MIXTURE_THRESHOLDS,
    )

    docs = load_fixture(spark, SF, "documents")
    kept = REGISTRY["mixture_weighted_sample"].fn(spark, SF)
    tot = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    k = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, thr in MIXTURE_THRESHOLDS.items():
        want = int(thr, 16) / 65536
        got = k.get(lang, 0) / tot[lang]
        assert abs(got - want) < 0.15, (lang, want, got)


def test_seq_length_histogram_partitions_corpus(spark):
    """Buckets are powers of two and together cover every document."""
    docs_n = load_fixture(spark, SF, "documents").count()
    h = REGISTRY["seq_length_histogram"].fn(spark, SF).collect()
    assert sum(r.n_docs for r in h) == docs_n
    for r in h:
        assert r.bucket_lo & (r.bucket_lo - 1) == 0  # power of two
        assert r.max_tok < 2 * r.bucket_lo


def test_repetition_semantics(spark):
    """Hand-built docs: a degenerate loop ('go go go go go') must score
    dup_frac near 1; an all-distinct doc scores exactly 0."""
    from real_time_trip_processing_project_spark.operators.dedup import word_bigrams

    df = spark.createDataFrame(
        [(1, "go go go go go"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    g = df.select("doc_id", F.explode(word_bigrams(F.col("text"))).alias("g"))
    per = g.groupBy("doc_id", "g").count()
    rows = {
        r.doc_id: (r.n_distinct, r.total)
        for r in per.groupBy("doc_id")
        .agg(F.count("*").alias("n_distinct"), F.sum("count").alias("total"))
        .collect()
    }
    assert rows[1] == (1, 4)  # 4 identical 'go go' bigrams
    assert rows[2] == (4, 4)  # all distinct


def test_lm_score_orders_common_above_rare(spark):
    """A doc made of corpus-frequent tokens must out-score a doc of
    singleton tokens under the corpus's own unigram LM."""
    from real_time_trip_processing_project_spark.plans import RETIRED

    scored = {
        r.doc_id: r.avg_logp
        for r in RETIRED["text_lm_score"].fn(spark, SF).collect()
    }
    docs = load_fixture(spark, SF, "documents")
    # most docs share the fixture's small vocab; compare extremes
    assert max(scored.values()) > min(scored.values())
    assert all(v < 0 for v in scored.values())  # log probs are negative


def test_approx_quantiles_within_rank_error(spark):
    """GK sketch with accuracy=1000 ⇒ rank error ≤ N/1000.  Compare each
    approximate quantile against the exact value at the allowed rank
    displacement on the same data."""
    orders = load_fixture(spark, SF, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    approx = {
        (r.o_orderstatus, r.q): r.v
        for r in REGISTRY["approx_quantiles"].fn(spark, SF).collect()
    }
    rows = orders.collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r.o_orderstatus, []).append(r.o_totalprice)
    for (status, q), v in approx.items():
        vals = sorted(by_status[status])
        n = len(vals)
        p = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}[q]
        target = int(p * (n - 1))
        slack = max(2, n // 1000 + 1)
        lo = vals[max(0, target - slack)]
        hi = vals[min(n - 1, target + slack)]
        assert lo <= v <= hi, (status, q, v, lo, hi)


def test_leakage_safe_split_keeps_duplicates_together(spark):
    """Every duplicate group must land entirely in one split — the
    property the per-doc split violates and this query exists for.  The
    fixture has no EXACT copies (its planted near-dups are ~0.99
    Jaccard), so plant copies on a hand-built corpus: ids are chosen so
    a naive per-doc md5 split WOULD separate the copies (md5('1')
    prefix c4ca < cccc = train, md5('3') prefix eccb = eval), while the
    canonical-keyed split cannot."""
    from pyspark.sql import Window
    from real_time_trip_processing_project_spark.operators.curation import (
        split_expr,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta"), (3, "alpha beta"), (4, "gamma delta"), (6, "unique")],
        "doc_id long, text string",
    )
    w = Window.partitionBy(F.md5("text"))
    canon = df.select(
        "doc_id", F.min("doc_id").over(w).alias("canonical")
    ).withColumn("split", split_expr("canonical"))
    rows = canon.collect()
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canonical, set()).add(r.split)
    assert all(len(s) == 1 for s in by_canon.values())
    # copies really share one canonical (non-vacuous)
    assert [r.canonical for r in rows if r.doc_id in (1, 3)] == [1, 1]
    # and the naive per-doc split would have separated them
    naive = {
        r.doc_id: r.s
        for r in df.select("doc_id", split_expr("doc_id").alias("s")).collect()
    }
    assert naive[1] != naive[3]


def _py_bpe(texts: list[str], n_merges: int):
    """Sequential reference BPE (Sennrich word-frequency variant)."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    vocab: dict[tuple, int] = {}
    for w, c in words.items():
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, a, b, a + b, n))
        nv: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


def test_train_bpe_matches_sequential_reference(spark):
    """The distributed merge loop must learn the identical merge table
    (same pairs, same order, same counts) as a sequential BPE over the
    same corpus — including greedy left-to-right merge semantics on
    runs like 'aaa' and deterministic tie-breaks."""
    from real_time_trip_processing_project_spark.operators import (
        tokenizer as TK,
    )

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "aaa aaaa banana",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in TK.train_bpe(docs, n_merges=10).collect()]
    assert got == _py_bpe(texts, 10)


def test_train_bpe_on_fixture_is_deterministic(spark):
    """Registry entry: runs on the documents fixture, produces exactly
    n_merges ranked rows, stable across invocations (pure function of
    the corpus — the rows-only driver contract leans on this)."""
    a = [tuple(r) for r in REGISTRY["tokenizer_train_bpe"].fn(spark, SF).collect()]
    b = [tuple(r) for r in REGISTRY["tokenizer_train_bpe"].fn(spark, SF).collect()]
    assert a == b
    assert len(a) == 8
    assert [r[0] for r in a] == list(range(8))
    assert all(r[3] == r[1] + r[2] for r in a)


def test_apply_bpe_respects_word_boundaries(spark):
    """apply_bpe merges inside words only: the learned 'lo'/'low' tokens
    appear, and no token spans the word-separator sentinel."""
    from real_time_trip_processing_project_spark.operators import (
        tokenizer as TK,
    )

    texts = ["low low lower"]
    docs = spark.createDataFrame([(1, texts[0])], "doc_id long, text string")
    merges = TK.train_bpe(docs, n_merges=3).collect()
    toks = TK.apply_bpe(docs, merges).collect()[0]["symbols"]
    assert "low" in toks
    assert all(" " not in t or t == " " for t in toks)


def test_apply_bpe_blank_doc_yields_zero_symbols(spark):
    """A blank or whitespace-only doc tokenizes to ZERO symbols — not the
    phantom ['', sentinel] pair Spark's split('', '\\s+') == [''] would
    leak — and the registered count query agrees with its oracle on a
    corpus containing such docs (the r5 oracle/plan disagreed: 1 vs 2)."""
    import duckdb

    from real_time_trip_processing_project_spark.operators import (
        tokenizer as TK,
    )
    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark import testing

    # corpus rich enough that 8 merges stay intra-word (a degenerate
    # 2-word corpus exhausts its pairs and drifts into tie-break
    # territory the fixture never reaches)
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, ""),
        (3, "   "),
        (4, "a b"),
        (5, "pack my box with five dozen liquor jugs"),
        (6, "sphinx of black quartz judge my vow"),
        (7, "the jay pig fox zebra and my wolves quack"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = TK.train_bpe(docs, n_merges=2).collect()
    toks = {
        r["doc_id"]: r["symbols"]
        for r in TK.apply_bpe(docs, merges).collect()
    }
    assert toks[2] == [] and toks[3] == []
    assert len(toks[4]) == 4  # a, sentinel, b, sentinel

    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{d}/documents.parquet'"
        )
        qdef = REGISTRY["tokenizer_apply_bpe_counts"]
        res = testing.compare_query(
            qdef.name, qdef.fn(spark, d), qdef.oracle, con
        )
        assert res.ok, res.detail


def test_ivf_persistent_index_matches_adhoc(spark, tmp_path):
    """build_ivf_index + ivf_topk_indexed must return exactly what the
    ad-hoc ivf_topk returns (same deterministic quantizer, same probes,
    same re-rank), and the index read must prune to the probed cell
    partitions (PartitionFilters on `cell`, not a full scan)."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )

    emb = load_fixture(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).limit(10)
    path = str(tmp_path / "ivf")
    SIM.build_ivf_index(emb, path)
    adhoc = {
        tuple(r)
        for r in SIM.ivf_topk(emb, queries, k=10).collect()
    }
    indexed_df = SIM.ivf_topk_indexed(spark, path, queries, k=10)
    indexed = {tuple(r) for r in indexed_df.collect()}
    assert adhoc
    assert indexed == adhoc
    # partition pruning: the cells scan must carry a partition filter
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        indexed_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    import re

    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("cell" in ln for ln in pf), pf


def test_lsh_persistent_index_matches_adhoc(spark, tmp_path):
    """build_lsh_index + ann_topk_indexed must reproduce ann_topk exactly
    (same deterministic planes, probes, re-rank) with partition filters
    on the bucket scan."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )

    emb = load_fixture(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).limit(10)
    path = str(tmp_path / "lsh")
    SIM.build_lsh_index(emb, path, dim=64)
    adhoc = {
        tuple(r) for r in SIM.ann_topk(emb, queries, k=10, dim=64).collect()
    }
    indexed_df = SIM.ann_topk_indexed(spark, path, queries, k=10, dim=64)
    indexed = {tuple(r) for r in indexed_df.collect()}
    assert adhoc
    assert indexed == adhoc
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        indexed_df.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln or "table" in ln for ln in pf), pf


def test_cms_estimates_bounded_overcounts(spark):
    """CMS guarantees: est >= exact always; overcount <= 2N/width for
    all but ~(1/2)^depth of tokens — with depth 4 and the fixture's N,
    assert every top-50 estimate sits within the bound (collisions at
    this N/width are rare enough that the strict check is stable)."""
    rows = REGISTRY["heavy_hitters_cms"].fn(spark, SF).collect()
    # top-50, or the whole vocabulary when it is smaller (sf0.001 has
    # a ~31-token synthetic vocab)
    assert 0 < len(rows) <= 50
    from real_time_trip_processing_project_spark.functions import text as TX
    from real_time_trip_processing_project_spark.plans.training import CMS_WIDTH

    docs = load_fixture(spark, SF, "documents")
    n_total = docs.select(
        F.explode(TX.ws_tokens("text")).alias("w")
    ).count()
    bound = 2 * n_total / CMS_WIDTH
    for r in rows:
        assert r.tf_cms >= r.tf_exact, (r.tok, r.tf_cms, r.tf_exact)
        assert r.tf_cms - r.tf_exact <= bound, (r.tok, r.tf_cms, r.tf_exact)


def test_train_bpe_stops_early_on_exhausted_corpus(spark):
    """A corpus of single-character words has no pairs: the loop must
    break on the first empty argmax and return zero merges, not loop
    n_merges times or crash on sequence(1, 0)."""
    from real_time_trip_processing_project_spark.operators import (
        tokenizer as TK,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "b c")], "doc_id long, text string"
    )
    assert TK.train_bpe(docs, n_merges=5).count() == 0


def test_bucket_refine_percentiles_constant_column(spark):
    """All-equal values degenerate the sketch range to zero: width
    clamps to 1 and the quantiles still come out exact."""
    from real_time_trip_processing_project_spark.plans.core import (
        bucket_refine_percentiles,
    )

    vals = spark.range(100).select(
        F.lit("g").alias("flag"), F.lit(777).cast("long").alias("cents")
    )
    rows = bucket_refine_percentiles(
        vals, (("p50", 0.50),)
    ).collect()
    assert len(rows) == 1 and rows[0].p50 == 7.77


def test_wav_codec_fuzz_roundtrip():
    """Seeded random int16 signals of assorted lengths (including empty
    and length-1) must round-trip bit-exactly through the RIFF codec."""
    import random

    import numpy as np

    rng = random.Random(13)
    for _ in range(25):
        n = rng.choice([0, 1, 2, 7, 128, 1023])
        s = np.array(
            [rng.randint(-32768, 32767) for _ in range(n)], dtype=np.int16
        )
        rate = rng.choice([8000, 16000, 44100])
        got, got_rate, ch = MM.decode_wav_pcm16(MM.encode_wav_pcm16(s, rate))
        assert got_rate == rate and ch == 1
        assert np.array_equal(got, s)


def test_kmv_sketch_is_mergeable(spark):
    """The property KMV exists for: the union of two shard sketches
    (keep the k smallest of the merged hash sets) must equal the
    whole-corpus sketch — so per-partition sketches combine without
    rescanning.  Verified on the orders fixture split odd/even."""
    from real_time_trip_processing_project_spark.sources.readers import (
        load_fixture,
    )

    K = 256
    orders = load_fixture(spark, "/root/testdata/sf0.01", "orders")
    hv = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10
    ).cast("long")

    def k_smallest(df):
        h = df.select(hv.alias("hv")).distinct()
        return [
            r.hv
            for r in h.orderBy("hv").limit(K).collect()
        ]

    whole = k_smallest(orders)
    a = k_smallest(orders.filter(F.col("o_orderkey") % 2 == 0))
    b = k_smallest(orders.filter(F.col("o_orderkey") % 2 == 1))
    merged = sorted(set(a) | set(b))[:K]
    assert merged == whole


def test_bloom_contamination_superset_of_exact(spark):
    """Bloom filters have no false negatives: per eval doc,
    n_bloom_hits ≥ the exact semi-join's contaminated count, at BOTH
    the registered 2^20-bit shape and a deliberately tiny 2^10-bit
    filter.  The tiny filter must also produce actual false positives
    (fill ratio ≈ 1) — otherwise the superset assertion is vacuous."""
    from real_time_trip_processing_project_spark.operators import (
        curation as CU,
    )

    docs = load_fixture(spark, SF, "documents")
    exact = {
        r.doc_id: r.n_contaminated
        for r in REGISTRY["curation_contamination"].fn(spark, SF).collect()
    }
    for bits, want_fp in ((CU.BLOOM_BITS, False), (1 << 10, True)):
        bloom = {
            r.doc_id: r.n_bloom_hits
            for r in CU.bloom_contamination(docs, bits=bits).collect()
        }
        assert set(bloom) == set(exact)
        assert all(bloom[d] >= exact[d] for d in exact), f"bits={bits}"
        fp = sum(bloom[d] - exact[d] for d in bloom)
        if want_fp:
            assert fp > 0, "saturated filter must show false positives"


def test_pagerank_integer_semantics(spark):
    """Integer PageRank on a hand-checkable star-plus-path graph: the
    star hub outranks every leaf, path ends rank below the middle, the
    total mass stays within integer-truncation loss of `scale`, and the
    result is deterministic across runs."""
    from real_time_trip_processing_project_spark.operators import graph as GR

    # star: 1 is hub of 2..6; path: 10-11-12
    pairs = spark.createDataFrame(
        [(1, k) for k in range(2, 7)] + [(10, 11), (11, 12)],
        "id_a LONG, id_b LONG",
    )
    a = {r.id: r.rank_fp for r in GR.pagerank_integer(pairs, iters=8).collect()}
    b = {r.id: r.rank_fp for r in GR.pagerank_integer(pairs, iters=8).collect()}
    assert a == b, "must be deterministic"
    assert set(a) == {1, 2, 3, 4, 5, 6, 10, 11, 12}
    leaves = [a[k] for k in range(2, 7)]
    assert len(set(leaves)) == 1, "symmetric leaves must tie exactly"
    assert a[1] > leaves[0], "hub must outrank its leaves"
    assert a[11] > a[10] == a[12], "path middle outranks symmetric ends"
    total = sum(a.values())
    # mass only shrinks via integer truncation: ≤ (iters+1)·n·100 units
    assert GR.PR_SCALE * 0.95 < total <= GR.PR_SCALE


def test_ivf_index_append_matches_full_assignment(spark, tmp_path):
    """Incremental IVF maintenance: build on a subset, append the rest —
    the index must hold EXACTLY the (id, cell) assignments that
    assigning the full corpus with the SAVED quantizer produces (no
    retraining, no lost or duplicated vectors), and the appended index
    must answer queries identically to one materialized directly from
    that full assignment."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )

    emb = load_fixture(spark, SF, "embeddings")
    s1 = emb.filter(F.col("vec_id") % 3 != 0)
    s2 = emb.filter(F.col("vec_id") % 3 == 0)
    path = str(tmp_path / "ivf")
    SIM.build_ivf_index(s1, path)
    SIM.ivf_index_append(spark, path, s2)

    got = {
        (r.neighbor_id, r.cell)
        for r in spark.read.parquet(f"{path}/cells").collect()
    }
    import numpy as np

    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = np.asarray(
        [r.centroid for r in sorted(cent_rows, key=lambda r: r.cell)]
    )
    want = {
        (r.neighbor_id, r.cell)
        for r in emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.element_at(
                SIM._assign_udf(centroids, 1)(F.col("embedding")), 1
            ).alias("cell"),
        ).collect()
    }
    assert got == want
    assert len(got) == emb.count(), "every vector exactly once"

    queries = emb.filter(F.col("vec_id") % 50 == 0).limit(8)
    res = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in SIM.ivf_topk_indexed(spark, path, queries, 10).collect()
    }
    # reference: an index written in one shot from the full corpus with
    # the same saved centroids must answer identically
    ref_path = str(tmp_path / "ivf-ref")
    full = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    ).withColumn(
        "cell",
        F.element_at(SIM._assign_udf(centroids, 1)(F.col("cv")), 1),
    )
    full.write.mode("overwrite").partitionBy("cell").parquet(
        f"{ref_path}/cells"
    )
    spark.read.parquet(f"{path}/centroids").write.mode("overwrite").parquet(
        f"{ref_path}/centroids"
    )
    ref = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in SIM.ivf_topk_indexed(spark, ref_path, queries, 10).collect()
    }
    assert res == ref


def test_bloom_index_build_probe_matches_inline(spark, tmp_path):
    """The persisted Bloom index (build on the train split, probe eval
    later) must produce row-identical output to the inline sketch that
    aggregates the train vocabulary in the same job — and the probe
    must not read the train corpus at all (only the saved bits)."""
    from real_time_trip_processing_project_spark.operators import (
        curation as CU,
    )

    docs = load_fixture(spark, SF, "documents")
    train = docs.filter(CU.split_expr() == "train")
    evald = docs.filter(CU.split_expr() == "eval")
    path = str(tmp_path / "bloom")
    CU.build_bloom_index(train, path)
    got = sorted(
        map(tuple, CU.bloom_probe_indexed(spark, path, evald).collect())
    )
    want = sorted(map(tuple, CU.bloom_contamination(docs).collect()))
    assert got == want and got


def test_kmeans_exact_ticks_semantics(spark):
    """Hand-checkable corpus: two tight groups far apart, k=2.  Both
    clusters must converge to the group integer-mean centroids, with
    deterministic lowest-id init and exact member counts."""
    from real_time_trip_processing_project_spark.operators.similarity import (
        kmeans_exact_ticks,
    )

    rows = [
        (1, [0.0, 0.0]),
        (2, [0.2, 0.0]),       # group A around x≈0.1
        (3, [0.9, 0.9]),
        (4, [0.7, 0.9]),       # group B around (0.8, 0.9)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_exact_ticks(emb, k=2, iters=3, dim=2).collect()
    got = {(r.cluster_id, r.i): (r.centroid_tick, r.n_members) for r in out}
    # init = vecs 1,2 → first iter splits {1,2} vs {3,4}; stable after
    assert got[(0, 0)] == (100_000, 2)   # mean(0, 0.2)·1e6
    assert got[(0, 1)] == (0, 2)
    assert got[(1, 0)] == (800_000, 2)   # mean(0.9, 0.7)·1e6
    assert got[(1, 1)] == (900_000, 2)


def test_kmeans_exact_ticks_empty_cluster_keeps_centroid(spark):
    """A centroid that attracts no members must survive unchanged (not
    vanish or go to zero) — k=3 over two points leaves the middle seed
    empty immediately."""
    from real_time_trip_processing_project_spark.operators.similarity import (
        kmeans_exact_ticks,
    )

    rows = [(1, [0.0]), (2, [0.5]), (3, [1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k=3: every point is its own seed; then point 2 is nearer seed 2's
    # side after updates… force the empty case with k=3, iters=1 on a
    # corpus where seed 1 (0.5) loses ties: argmin tie-break prefers the
    # LOWEST cluster id, so equidistant points drain away from later ids.
    out = kmeans_exact_ticks(emb, k=3, iters=1, dim=1).collect()
    got = {r.cluster_id: (r.centroid_tick, r.n_members) for r in out}
    # each seed keeps exactly its own point here (distinct seeds) —
    # sanity: all three clusters present with n=1 and exact ticks
    assert got == {0: (0, 1), 1: (500_000, 1), 2: (1_000_000, 1)}


def test_kmeans_empty_cluster_retained_exactly(spark):
    """Direct empty-cluster construction: duplicate seeds mean cluster 1
    can never win a tie against cluster 0 — its centroid must pass
    through verbatim with n_members=0."""
    from real_time_trip_processing_project_spark.operators.similarity import (
        kmeans_exact_ticks,
    )

    rows = [(1, [0.25]), (2, [0.25]), (3, [0.75])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # seeds: c0=0.25, c1=0.25 (duplicate).  Iteration 1: every point ties
    # or loses to cluster 0, so cluster 1 is EMPTY and must keep its seed
    # tick verbatim while cluster 0 absorbs all three:
    # mean(0.25, 0.25, 0.75) = 5/12 → floor(1250000/3) = 416666.
    out1 = kmeans_exact_ticks(emb, k=2, iters=1, dim=1).collect()
    got1 = {r.cluster_id: (r.centroid_tick, r.n_members) for r in out1}
    assert got1[1] == (250_000, 0)
    assert got1[0] == (416_666, 3)
    # Iteration 2: the kept centroid re-enters the race and WINS the two
    # 0.25 points back from the drifted c0 — empty clusters recover.
    out2 = kmeans_exact_ticks(emb, k=2, iters=2, dim=1).collect()
    got2 = {r.cluster_id: (r.centroid_tick, r.n_members) for r in out2}
    assert got2[1] == (250_000, 2)
    assert got2[0] == (750_000, 1)


def test_pq_ann_recall_vs_exact(spark):
    """PQ-ADC with m=32 subspaces must recover ≥0.9 of the exact top-10
    pair set on the fixture corpus (measured 1.0 at sf0.001/sf0.01 and
    0.98 at sf0.1; floor also asserted in bench quality)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, SF).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_ann_pq"].fn(spark, SF).collect()
    }
    assert bf
    assert len(bf & pq) / len(bf) >= 0.9


def test_pq_codes_shape_and_determinism(spark):
    """Encoding is deterministic (seedless: codebooks derive from the
    md5-ordered sample) and every code fits the 4-bit codebook."""
    from real_time_trip_processing_project_spark.operators.similarity import (
        PQ_KS,
        PQ_M,
        _pq_encode_udf,
        pq_train_codebooks,
    )

    emb = load_fixture(spark, SF, "embeddings")
    b1 = pq_train_codebooks(emb)
    b2 = pq_train_codebooks(emb)
    assert (b1 == b2).all()
    codes = (
        emb.select(_pq_encode_udf(b1)("embedding").alias("c"))
        .selectExpr("max(array_max(c)) AS mx", "min(array_min(c)) AS mn",
                    "max(size(c)) AS n")
        .collect()[0]
    )
    assert codes["n"] == PQ_M
    assert 0 <= codes["mn"] and codes["mx"] < PQ_KS


def test_triangle_count_hand_graph(spark):
    """Planted shapes: K4 on {1,2,3,4} (each node in C(3,2)=3
    triangles), a chain 10-11-12 (zero triangles), one extra triangle
    {20,21,22}, and duplicate/reversed pair rows that must not double
    count."""
    from real_time_trip_processing_project_spark.operators import graph as GR

    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    pairs = spark.createDataFrame(
        k4
        + [(10, 11), (11, 12)]
        + [(20, 21), (21, 22), (20, 22)]
        + [(2, 1), (21, 20)],  # reversed duplicates — must be ignored
        "id_a LONG, id_b LONG",
    )
    got = {r.id: r.n_triangles for r in GR.triangle_count(pairs).collect()}
    assert got == {
        1: 3, 2: 3, 3: 3, 4: 3,
        10: 0, 11: 0, 12: 0,
        20: 1, 21: 1, 22: 1,
    }


def test_ivfpq_recall_vs_exact(spark):
    """IVFADC (64 cells × 40 probes, residual 32×4-bit PQ, 16× refine)
    must land within the plain-IVF routing ceiling's neighborhood:
    measured 0.92/0.98/0.94 at sf0.001/0.01/0.1."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, SF).collect()
    }
    iv = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_ann_ivfpq"].fn(spark, SF).collect()
    }
    assert bf
    assert len(bf & iv) / len(bf) >= 0.85


def test_ivfpq_index_build_probe_matches_inline(spark, tmp_path):
    """The persisted IVFADC index must return EXACTLY the inline
    ivfpq_topk result (training is deterministic end to end), and the
    probe's code scan must be partition-pruned on the cell filter."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )

    emb = load_fixture(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    path = str(tmp_path / "ivfpq")
    SIM.build_ivfpq_index(emb, path)
    inline = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in SIM.ivfpq_topk(emb, queries, 10).collect()
    }
    indexed_df = SIM.ivfpq_topk_indexed(spark, path, emb, queries, 10)
    indexed = {
        (r.query_id, r.neighbor_id, r.rank) for r in indexed_df.collect()
    }
    assert indexed == inline and indexed
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200]


def test_bfs_depths_hand_graph(spark):
    """Path 1-2-3-4-5 (one local min: 1), triangle {10,11,12} (local
    min 10), plus node pair (20,21): depths are hop distances from
    each component's local minima."""
    from real_time_trip_processing_project_spark.operators import graph as GR

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "id_a LONG, id_b LONG",
    )
    got = {r.id: r.depth for r in GR.bfs_depths(pairs).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4,
                   10: 0, 11: 1, 12: 1,
                   20: 0, 21: 1}


def test_bfs_depth_cap_excludes_far_nodes(spark):
    """A 12-node path with max_depth=3 labels only the first 4 nodes."""
    from real_time_trip_processing_project_spark.operators import graph as GR

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "id_a LONG, id_b LONG"
    )
    got = {r.id: r.depth for r in GR.bfs_depths(pairs, max_depth=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_kmeans_arrow_assignment_matches_expression_twin(spark):
    """The Arrow argmin kernel must agree row-for-row with the
    interpreted expression form (which is what the DuckDB oracle
    executes) — including on duplicate-seed ties."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )

    emb = load_fixture(spark, SF, "embeddings")
    ticks = SIM._kmeans_ticks(emb, "embedding", "vec_id")
    cents = [list(r["tv"]) for r in ticks.orderBy("vec_id").limit(8).collect()]
    cents[1] = list(cents[0])  # duplicate seed → exercised tie-break
    a = {r["vec_id"]: r["cl"]
         for r in SIM._kmeans_assign(ticks, cents).collect()}
    b = {r["vec_id"]: r["cl"]
         for r in SIM._kmeans_assign_expr(ticks, cents).collect()}
    assert a == b and a


def test_hll_sketch_merge_is_lossless_and_accurate(spark):
    """The mergeable-sketch contract: (a) unioning the per-status
    sketches estimates the whole column within the sketch's own error
    band (the union may carry a different internal register mode than a
    direct build, so equality is statistical, not bitwise — both
    estimates must sit within 5% of exact), and (b) every per-slice
    estimate is within 5% of its exact distinct count."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark.sources.readers import (
        load_fixture,
    )

    sf = "/root/testdata/sf0.01"
    out = {
        r.o_orderstatus: r.n_custs_est
        for r in REGISTRY["hll_sketch_mergeable"].fn(spark, sf).collect()
    }
    orders = load_fixture(spark, sf, "orders")
    whole = (
        orders.agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("e"))
        .collect()[0]["e"]
    )
    assert abs(out["ALL"] - whole) / max(whole, 1) < 0.02  # merge ~ whole
    exact = {
        r.o_orderstatus: r.n
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["ALL"] = orders.select("o_custkey").distinct().count()
    for k, est in out.items():
        assert abs(est - exact[k]) / max(exact[k], 1) < 0.05, (k, est)


def test_dsir_log_tick_cross_engine_parity(spark):
    """The DSIR resampler's acceptance test compares integer micro-tick
    quantizations of ln((h+1)/65536) across engines.  There are exactly
    65536 possible inputs — pin bit-identical quantized output for ALL
    of them in Spark vs DuckDB, so a libm last-ulp divergence can never
    silently flip an accept/reject at a tick boundary."""
    import duckdb

    # NB: the Spark side must divide DOUBLES — a bare 65536.0 literal in
    # SQL text parses as DECIMAL and decimal division truncates the
    # quotient (the pipeline's DataFrame expression uses F.lit(65536.0),
    # a DoubleType literal, which this mirrors)
    spark_ticks = [
        r.lt
        for r in spark.range(65536)
        .selectExpr(
            "CAST(floor(ln(CAST(id + 1 AS DOUBLE) / CAST(65536 AS DOUBLE))"
            " * 1e6 + 0.5) AS LONG) AS lt"
        )
        .orderBy("id")
        .collect()
    ]
    duck_ticks = [
        row[0]
        for row in duckdb.sql(
            "SELECT CAST(floor(ln((h + 1) / 65536.0) * 1e6 + 0.5) AS BIGINT)"
            " FROM range(65536) t(h) ORDER BY h"
        ).fetchall()
    ]
    assert spark_ticks == duck_ticks
    # endpoint sanity: h=65535 -> ln(1)=0; h=0 -> ln(1/65536) ~= -11.09
    assert spark_ticks[-1] == 0
    assert spark_ticks[0] == -11090355


def test_dsir_pipeline_resample_semantics(spark):
    """The resampled set is exactly {scored pool docs: log_tick(h) <
    score_tick - cal} where cal = floor(mean pool score) is the
    self-normalization offset (r10 verdict item 2) — verified doc-by-doc
    against the scoring query, acceptance monotone in score
    (P[accept] = min(1, e^{s-cal})), and NON-vacuous: a meaningful
    fraction of the pool must survive."""
    import math

    sf = "/root/testdata/sf0.001"
    scores = {
        r.doc_id: r.score_tick
        for r in REGISTRY["curation_importance_resample"].fn(spark, sf).collect()
    }
    cal = math.floor(sum(scores.values()) / len(scores))
    import hashlib

    def lt(doc_id: int) -> int:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
        return math.floor(math.log((h + 1) / 65536.0) * 1e6 + 0.5)

    expect_keep = {d for d, s in scores.items() if lt(d) < s - cal}
    got = REGISTRY["curation_dsir_pipeline"].fn(spark, sf).collect()
    n_docs = sum(r.n_docs for r in got)
    assert n_docs == len(expect_keep)
    # de-vacuation gate: the driver-scale 0-row hash match proved
    # nothing — require a real surviving fraction at every fixture sf
    assert 0 < n_docs < len(scores), (n_docs, len(scores))
    assert n_docs >= len(scores) // 10, "acceptance fraction collapsed"
    # accounting cross-check: sum of kept score ticks matches
    assert sum(r.sum_score_tick for r in got) == sum(
        scores[d] for d in expect_keep
    )
    # above-mean docs are all kept (e^{s-cal} >= 1 accepts
    # unconditionally except the h=65535 tie, excluded by s - cal > 0)
    assert all(d in expect_keep for d, s in scores.items() if s - cal > 0)


def test_mp4_i16_stats_deterministic_and_bounded(spark):
    """The Intra_16x16+CAVLC video query is integer-deterministic:
    identical stats across runs, bounded quantizer distortion (qp=12
    measures mean 0.48 / max 4 px err on text-derived frames), and the
    frame inventory matches the lossless I_PCM twin's (same container
    sampling semantics)."""
    sf = "/root/testdata/sf0.001"
    a = REGISTRY["multimodal_mp4_i16_stats"].fn(spark, sf).collect()
    b = REGISTRY["multimodal_mp4_i16_stats"].fn(spark, sf).collect()
    key = lambda r: (r.media_id, r.frame_idx)  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0
    total_px = sum(r.px_count for r in a)
    total_err = sum(r.sum_abs_err for r in a)
    assert total_err / total_px <= 1.0
    assert max(r.max_abs_err for r in a) <= 8
    pcm = {
        (r.media_id, r.frame_idx)
        for r in REGISTRY["multimodal_mp4_frames"].fn(spark, sf).collect()
    }
    assert {key(r) for r in a} == pcm


def test_mp4_lossy_index_invariants_and_rate_bound(spark):
    """The lossy-codec container indexes (r10 verdict item 6) emit the
    text-derivable invariants the FULL oracle asserts: frame_count from
    text length, container dims ≡ SPS, every sample an IDR slice,
    stsc×stco×stsz consistency, AND every coded sample within the
    static I_PCM rate bound.  Cross-checked against the lossless
    I_PCM index row-for-row (same container semantics, different slice
    encoder) and against the i16 stats query's per-sample sizes."""
    import math

    sf = "/root/testdata/sf0.001"
    i16 = {
        r.media_id: r
        for r in REGISTRY["multimodal_mp4_i16_index"].fn(spark, sf).collect()
    }
    pcm = {
        r.media_id: r
        for r in RETIRED["multimodal_mp4_index"].fn(spark, sf).collect()
    }
    assert i16 and set(i16) == set(pcm)
    docs = {
        r.doc_id: len(r.text.encode())
        for r in load_fixture(spark, sf, "documents").collect()
        if r.doc_id in i16
    }
    fb = MM.MP4_W * MM.MP4_H
    for mid, row in i16.items():
        expect_fc = max(math.ceil(docs[mid] / fb), 1)
        assert row.frame_count == expect_fc == pcm[mid].frame_count
        assert (row.width, row.height) == (MM.MP4_W, MM.MP4_H)
        assert row.idr_ok_frames == expect_fc
        assert row.index_consistent
        assert row.within_rate_bound
        assert row.px_count == expect_fc * fb
    # the quarter-slice intra twin covers exactly the doc_id%4 subset
    intra = {
        r.media_id
        for r in REGISTRY["multimodal_mp4_intra_index"].fn(spark, sf).collect()
    }
    assert intra == {m for m in i16 if m % 4 == 0}
    # corrupted payload → sentinel row with within_rate_bound=False
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [b"\x00" * 64]})
    )
    sent = MM.mp4_container_index(bad, rate_bound_bytes=400).collect()[0]
    assert not sent.index_consistent and not sent.within_rate_bound


def test_repetition_kernel_matches_expression_twin(spark):
    """r14: text_repetition's map-only Arrow kernel (tokenize+Counter
    per doc) must agree row-for-row with the explode → groupBy
    expression form it replaced — all four stats are exact integers, so
    equality is total, not approximate."""
    from real_time_trip_processing_project_spark.operators import dedup as DD

    docs = load_fixture(spark, SF, "documents")
    kern = {
        r["id"]: (r["n_grams"], r["n_distinct"], r["max_c"])
        for r in DD.repetition_stats(docs).collect()
    }
    g = docs.select(
        "doc_id", F.explode(DD.word_bigrams(F.col("text"))).alias("g")
    )
    expr = {
        r["doc_id"]: (r["n_grams"], r["n_distinct"], r["max_c"])
        for r in g.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("max_c"),
        )
        .collect()
    }
    assert kern == expr and kern


def test_repetition_kernel_edge_docs(spark):
    """Empty / single-word / whitespace-only docs yield no bigrams in
    BOTH forms (absent from output); a doc of one repeated bigram is
    fully duplicated."""
    from real_time_trip_processing_project_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "   "), (4, "a b a b a"), (5, "x y")],
        "doc_id LONG, text STRING",
    )
    got = {
        r["id"]: (r["n_grams"], r["n_distinct"], r["max_c"])
        for r in DD.repetition_stats(docs).collect()
    }
    assert got == {4: (4, 2, 2), 5: (1, 1, 1)}


def test_quality_counts_kernel_matches_expression_twin(spark):
    """r14: curation_corpus_pipeline's one-pass Arrow kernel must emit
    the SAME integer counts as TX.quality_exprs and the same md5 key —
    the seam that keeps the kernel-fed score bit-identical to the
    expression form and the DuckDB oracle."""
    from real_time_trip_processing_project_spark.functions import text as TX
    from real_time_trip_processing_project_spark.operators import (
        curation as CU,
    )

    docs = load_fixture(spark, SF, "documents")
    q = TX.quality_exprs("text")
    stop = F.size(
        F.filter(
            F.split(F.col("text"), TX.WORD_SPLIT_PATTERN),
            lambda t: t.isin(*TX.STOPWORDS),
        )
    ).cast("long")
    punct = (
        F.length("text")
        - F.length(F.regexp_replace("text", TX.PUNCT_PATTERN, ""))
    ).cast("long")
    alpha = F.length(
        F.regexp_replace(F.col("text"), r"[^A-Za-z]", "")
    ).cast("long")
    expr = {
        r["doc_id"]: (
            r["h"], r["lang"], r["n_chars"], r["n_tokens"],
            r["stop"], r["punct"], r["alpha"],
        )
        for r in docs.select(
            "doc_id", "lang", F.md5("text").alias("h"),
            q["n_chars"].alias("n_chars"), q["n_tokens"].alias("n_tokens"),
            stop.alias("stop"), punct.alias("punct"), alpha.alias("alpha"),
        ).collect()
    }
    kern = {
        r["id"]: (
            r["h"], r["lang"], r["n_chars"], r["n_tokens"],
            r["stop"], r["punct"], r["alpha"],
        )
        for r in CU.quality_counts(docs).collect()
    }
    assert kern == expr and kern


def test_quality_counts_kernel_edge_docs(spark):
    """Empty text: split(trim(''), '\\s+') = [''] → n_tokens 1 in the
    expression form — the kernel must reproduce that, plus zero stops,
    zero punct, and the md5 of the empty string."""
    from real_time_trip_processing_project_spark.operators import (
        curation as CU,
    )

    docs = spark.createDataFrame(
        [(1, "en", ""), (2, "en", "the quick, brown fox!")],
        "doc_id LONG, lang STRING, text STRING",
    )
    got = {
        r["id"]: (r["n_chars"], r["n_tokens"], r["stop"], r["punct"],
                  r["alpha"])
        for r in CU.quality_counts(docs).collect()
    }
    assert got[1] == (0, 1, 0, 0, 0)
    assert got[2] == (21, 4, 1, 2, 16)


def test_triangle_clustered_matches_global_and_oracle_shape(spark):
    """r14: the cluster-first triangle path must equal the global
    degree-ordered wedge join node-for-node — on a graph with several
    components, including nodes in no triangle (count 0)."""
    from real_time_trip_processing_project_spark.operators import graph as GR

    edges = spark.createDataFrame(
        # K4 (ids 1-4), a triangle (10-12), a chain (20-22: no triangle)
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (10, 11), (11, 12), (10, 12), (20, 21), (21, 22)],
        "id_a LONG, id_b LONG",
    )
    glob = {r["id"]: r["n_triangles"]
            for r in GR.triangle_count(edges).collect()}
    clus = {r["id"]: r["n_triangles"]
            for r in GR.triangle_count_clustered(edges).collect()}
    assert clus == glob
    assert clus[1] == 3 and clus[10] == 1 and clus[20] == 0


def test_triangle_clustered_accepts_precomputed_components(spark):
    """Passing the dedup pipeline's existing (doc_id, canonical_id)
    table skips the CC rounds and must give the same answer."""
    from real_time_trip_processing_project_spark.operators import graph as GR
    from real_time_trip_processing_project_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (7, 8)], "id_a LONG, id_b LONG"
    )
    comps = connected_components(edges)
    a = {r["id"]: r["n_triangles"]
         for r in GR.triangle_count_clustered(
             edges, components=comps).collect()}
    assert a == {1: 1, 2: 1, 3: 1, 7: 0, 8: 0}


def test_triangle_clustered_guard_raises_before_materializing(spark):
    """A component above max_component_edges must raise the documented
    ValueError from the driver-side pre-check — not an executor OOM."""
    import pytest

    from real_time_trip_processing_project_spark.operators import graph as GR

    edges = spark.createDataFrame(
        [(i, j) for i in range(1, 8) for j in range(i + 1, 8)],
        "id_a LONG, id_b LONG",
    )
    with pytest.raises(ValueError, match="max_component_edges"):
        GR.triangle_count_clustered(edges, max_component_edges=5)


def test_lang_marker_counts_kernel_matches_expression_twin(spark):
    """r14: text_lang_id's marker-count kernel must emit the same
    per-language integer scores as TX.lang_score_exprs — including the
    carried-through declared lang column."""
    from real_time_trip_processing_project_spark.functions import text as TX
    from real_time_trip_processing_project_spark.operators import (
        curation as CU,
    )

    docs = load_fixture(spark, SF, "documents")
    scores = TX.lang_score_exprs("text")
    expr = {
        r["doc_id"]: tuple(r[f"s_{lang}"] for lang, _ in TX.LANG_MARKERS)
        for r in docs.select(
            "doc_id",
            *[scores[lang].alias(f"s_{lang}") for lang, _ in TX.LANG_MARKERS],
        ).collect()
    }
    kern_rows = CU.lang_marker_counts(docs, carry_cols=("lang",)).collect()
    kern = {
        r["id"]: tuple(r[f"s_{lang}"] for lang, _ in TX.LANG_MARKERS)
        for r in kern_rows
    }
    assert kern == expr and kern
    declared = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    assert {r["id"]: r["lang"] for r in kern_rows} == declared


def test_lang_marker_counts_adjacent_repeats(spark):
    """' the the the ' counts 3 (the split form's guarantee over the
    old replace-length trick); empty and marker-free docs score 0."""
    from real_time_trip_processing_project_spark.operators import (
        curation as CU,
    )

    docs = spark.createDataFrame(
        [(1, "en", " the the the "), (2, "de", ""), (3, "es", "xyz abc")],
        "doc_id LONG, lang STRING, text STRING",
    )
    got = {r["id"]: r["s_en"] for r in
           CU.lang_marker_counts(docs, carry_cols=("lang",)).collect()}
    assert got == {1: 3, 2: 0, 3: 0}


def test_apply_bpe_counts_kernel_matches_fold_form(spark):
    """r14: the linear greedy-scan kernel must equal
    size(apply_bpe(...).symbols) doc-for-doc under the fixture-trained
    merge table — including chainable rules (a==b) exercised below."""
    from real_time_trip_processing_project_spark.operators import (
        tokenizer as TK,
    )

    docs = load_fixture(spark, SF, "documents").filter(
        ~F.col("text").contains("␟")
    )
    merges = TK.train_bpe(docs, n_merges=8).collect()
    fold = {
        r["doc_id"]: r["n"]
        for r in TK.apply_bpe(docs, merges)
        .select("doc_id", F.size("symbols").cast("long").alias("n"))
        .collect()
    }
    kern = {
        r["id"]: r["n_tokens"]
        for r in TK.apply_bpe_counts(docs, merges).collect()
    }
    assert kern == fold and kern


def test_apply_bpe_counts_chainable_rules(spark):
    """Hand-picked adversarial merges: a==b runs ('x x x' style) and a
    rule whose left side is another rule's output — both forms must
    agree (merged tokens never re-merge within one rule's pass)."""
    from real_time_trip_processing_project_spark.operators import (
        tokenizer as TK,
    )

    docs = spark.createDataFrame(
        [(1, "xxxx xx"), (2, "abab"), (3, ""), (4, "x")],
        "doc_id LONG, text STRING",
    )
    merges = [
        {"rank": 0, "left": "x", "right": "x", "merged": "xx"},
        {"rank": 1, "left": "xx", "right": "xx", "merged": "xxxx"},
        {"rank": 2, "left": "a", "right": "b", "merged": "ab"},
    ]
    fold = {
        r["doc_id"]: r["n"]
        for r in TK.apply_bpe(docs, merges)
        .select("doc_id", F.size("symbols").cast("long").alias("n"))
        .collect()
    }
    kern = {
        r["id"]: r["n_tokens"]
        for r in TK.apply_bpe_counts(docs, merges).collect()
    }
    assert kern == fold
    assert kern[3] == 0 and kern[4] == 2  # 'x' + word sentinel


def test_pair_count_partials_matches_expression_whole_table(spark):
    """r14: the numpy byte-bigram kernel (summed) must equal the
    explode/transform expression form over the WHOLE pair table — not
    just the top-20 the registered query emits."""
    from real_time_trip_processing_project_spark.operators import (
        tokenizer as TK,
    )

    docs = load_fixture(spark, SF, "documents")
    words = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    expr = {
        r["pair"]: r["n"]
        for r in words.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kern = {
        r["pair"]: r["n"]
        for r in TK.pair_count_partials(docs)
        .groupBy("pair")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert kern == expr and kern


def test_pair_count_partials_edge_docs(spark):
    """Single-char words, empty docs, and multi-space runs contribute
    no pairs; cross-word pairs never count."""
    from real_time_trip_processing_project_spark.operators import (
        tokenizer as TK,
    )

    docs = spark.createDataFrame(
        [(1, "ab  a b"), (2, ""), (3, "   "), (4, "abc")],
        "doc_id LONG, text STRING",
    )
    got = {
        r["pair"]: r["n"]
        for r in TK.pair_count_partials(docs)
        .groupBy("pair")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert got == {"ab": 2, "bc": 1}


def test_script_profile_kernel_matches_expression_whole_table(spark):
    """r14: the bincount kernel must equal the regexp_replace
    length-diff expression form on every count column."""
    from real_time_trip_processing_project_spark.operators import (
        curation as CU,
    )

    docs = load_fixture(spark, SF, "documents")

    def n(pat):
        return F.length(
            F.regexp_replace(F.col("text"), pat, "")
        ).cast("long")

    expr = {
        r["doc_id"]: (r["a"], r["d"], r["s"], r["o"], r["t"])
        for r in docs.select(
            "doc_id",
            n(r"[^a-zA-Z]").alias("a"), n(r"[^0-9]").alias("d"),
            n(r"[^ ]").alias("s"), n(r"[a-zA-Z0-9 ]").alias("o"),
            F.length("text").cast("long").alias("t"),
        ).collect()
    }
    kern = {
        r["id"]: (r["n_alpha"], r["n_digit"], r["n_space"],
                  r["n_other"], r["n_chars_total"])
        for r in CU.script_profile_counts(docs).collect()
    }
    assert kern == expr and kern


def test_script_profile_kernel_edge_docs(spark):
    """Empty text, tabs/newlines count as 'other' (not space — the
    class is literal ' '), mixed content."""
    from real_time_trip_processing_project_spark.operators import (
        curation as CU,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "a1 \t\nZ!")],
        "doc_id LONG, text STRING",
    )
    got = {
        r["id"]: (r["n_alpha"], r["n_digit"], r["n_space"],
                  r["n_other"], r["n_chars_total"])
        for r in CU.script_profile_counts(docs).collect()
    }
    assert got[1] == (0, 0, 0, 0, 0)
    assert got[2] == (2, 1, 1, 3, 7)


def test_lsh_occupancy_cap_identity_when_under_cap(spark, monkeypatch):
    """r16 occupancy cap (sf30 watch item): with the split machinery
    FORCED ON but no bucket over the cap, the sub-bucketed join must
    return exactly the flat path's rows — pins the arrays_zip/explode/
    depth-map plumbing as a no-op outside the capped regime."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )
    from real_time_trip_processing_project_spark.plans.training import (
        TOPK,
        _ann_queries,
    )

    emb = load_fixture(spark, SF, "embeddings")
    qs = _ann_queries(emb)

    def rows(df):
        return sorted(
            (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in df.collect()
        )

    flat = rows(SIM.ann_topk(emb, qs, TOPK, dim=64))
    monkeypatch.setattr(SIM, "_LSH_SPLIT_MIN_CORPUS", 0)
    monkeypatch.setattr(SIM, "_LSH_MAX_OCC", 10**9)
    assert rows(SIM.ann_topk(emb, qs, TOPK, dim=64)) == flat


def test_lsh_occupancy_cap_split_regime(spark, monkeypatch):
    """Degenerate cap (=1: every multi-occupant bucket splits, depth
    1-3 at fixture occupancy): output stays k rows per query with exact
    re-rank cosines, runs deterministically, and recall holds at the
    measured 0.96 (floor 0.85 with drift margin) — r17's radius-1
    sibling sub-probe recovered the one-bit-disagreement mass that
    own-sub-only probing lost (0.72 measured at this cap; the old floor
    was 0.65).  Splitting removes candidates, never corrupts survivors.
    The production cap (1024) never bites buckets this small; this pins
    the mechanism at its harshest setting."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )
    from real_time_trip_processing_project_spark.plans.training import (
        TOPK,
        _ann_queries,
    )

    emb = load_fixture(spark, SF, "embeddings")
    qs = _ann_queries(emb)
    monkeypatch.setattr(SIM, "_LSH_SPLIT_MIN_CORPUS", 0)
    monkeypatch.setattr(SIM, "_LSH_MAX_OCC", 1)
    got = SIM.ann_topk(emb, qs, TOPK, dim=64)
    rows1 = sorted(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in got.collect()
    )
    rows2 = sorted(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in SIM.ann_topk(emb, qs, TOPK, dim=64).collect()
    )
    assert rows1 == rows2, "split path must be deterministic"
    per_q = {}
    for q, *_ in rows1:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(v <= TOPK for v in per_q.values())
    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, SF).collect()
    }
    s = {(a, b) for a, b, _, _ in rows1}
    assert len(bf & s) / len(bf) >= 0.85


def test_lsh_sibling_sub_probe_recovers_recall(spark, monkeypatch):
    """r17 (verdict item 2): at split buckets the query probes its
    radius-1 siblings on the extra bits.  Pins (a) the recovery is real
    — sibling probing strictly beats own-sub-only at the harshest cap —
    and (b) the A/B arm (own-sub-only) still produces valid exact
    re-ranked output, so the knob is a pure candidate-set dial."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )
    from real_time_trip_processing_project_spark.plans.training import (
        TOPK,
        _ann_queries,
    )

    emb = load_fixture(spark, SF, "embeddings")
    qs = _ann_queries(emb)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, SF).collect()
    }
    monkeypatch.setattr(SIM, "_LSH_SPLIT_MIN_CORPUS", 0)
    monkeypatch.setattr(SIM, "_LSH_MAX_OCC", 1)

    def recall(on):
        monkeypatch.setattr(SIM, "_LSH_SUB_PROBE_R1", on)
        s = {
            (r.query_id, r.neighbor_id)
            for r in SIM.ann_topk(emb, qs, TOPK, dim=64).collect()
        }
        return len(bf & s) / len(bf)

    r_on, r_off = recall(True), recall(False)
    # measured 0.96 vs 0.72 at this cap on the fixture corpus
    assert r_on > r_off
    assert r_on >= 0.85


def test_graph_edge_volume_guard_fires_with_exact_count(spark, monkeypatch):
    """r17 (verdict item 3): past the iterative-shuffle edge budget,
    bfs_depths and pagerank_integer must fail fast with the EXACT
    doubled-edge count in the message — and release the DISK_ONLY edge
    persist on the way out.  At the default budget the same graph runs
    clean (no-fire pin)."""
    from real_time_trip_processing_project_spark.operators import graph as GR

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a LONG, id_b LONG"
    )
    # doubled + distinct = 8 rows; budget 7 fires, default passes
    monkeypatch.setattr(GR, "_MAX_GRAPH_EDGES", 7)
    with pytest.raises(ValueError, match=r"bfs_depths: .*8 rows"):
        GR.bfs_depths(pairs)
    with pytest.raises(ValueError, match=r"pagerank_integer: .*8 rows"):
        GR.pagerank_integer(pairs)
    monkeypatch.setattr(GR, "_MAX_GRAPH_EDGES", 600_000_000)
    assert GR.bfs_depths(pairs).count() == 6
    assert GR.pagerank_integer(pairs).count() == 6


def test_graph_edge_budget_is_env_tunable(monkeypatch):
    import importlib

    from real_time_trip_processing_project_spark.operators import graph as GR

    monkeypatch.setenv("SPARK_GRAFT_MAX_GRAPH_EDGES", "123")
    importlib.reload(GR)
    try:
        assert GR._MAX_GRAPH_EDGES == 123
    finally:
        monkeypatch.delenv("SPARK_GRAFT_MAX_GRAPH_EDGES")
        importlib.reload(GR)


def test_span_pair_volume_preguard_fires_before_enumeration(spark):
    """r17: common_span_pairs(max_pair_rows=...) must raise with the
    exact Σ s(s−1) posting volume when over budget, and produce the
    identical pair set when under it (the guard is read-only)."""
    from real_time_trip_processing_project_spark.operators import dedup as DD

    docs = load_fixture(spark, SF, "documents")
    base = {
        (r.id_a, r.id_b, r.n_shared_fps)
        for r in DD.common_span_pairs(docs).collect()
    }
    guarded = {
        (r.id_a, r.id_b, r.n_shared_fps)
        for r in DD.common_span_pairs(docs, max_pair_rows=10**18).collect()
    }
    assert guarded == base and base
    with pytest.raises(ValueError, match=r"doubled\s+pair rows"):
        DD.common_span_pairs(docs, max_pair_rows=1).count()
