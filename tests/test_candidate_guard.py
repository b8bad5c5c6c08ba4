"""The exact-dedup candidate fan-out guard (r15 sf30 probe finding).

At sf30 the l=2 candidate self-join's output (EXACTLY Σ cnt(pair-key)²
rows before the id/length filters) reached 8.65e8 rows and its shuffle
spill exhausted the box's 70 GB free disk mid-stage ("No space left on
device").  The guard converts that into an immediate ValueError naming
the designed 100 TB path (MinHash-LSH), computed from one aggregate
over the DISK_ONLY-persisted pair-key index — so a passing guard costs
one cheap count pass, and the join then re-reads the persisted index
instead of recomputing the rank/window pipeline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_project_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, "the quick brown fox jumps over the lazy dog wordy text " + str(i % 7))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingled(docs):
    return DD.shingled_docs(docs, "doc_id", "text")


def test_guard_trips_on_shrunk_budget(docs, monkeypatch):
    monkeypatch.setattr(DD, "_MAX_CANDIDATE_ROWS", 10)
    with pytest.raises(ValueError) as e:
        DD._prefix_candidates(_shingled(docs), 0.8, l=2, big=True).count()
    msg = str(e.value)
    assert "fan-out" in msg and "minhash" in msg
    assert "SPARK_GRAFT_MAX_CAND_ROWS" in msg


def test_guard_passes_within_budget_and_output_unchanged(docs):
    sh = _shingled(docs)
    # big=True routes through the guarded persist+aggregate path;
    # big=False is the historical un-guarded shape — same candidates
    guarded = DD._prefix_candidates(sh, 0.8, l=2, big=True)
    plain = DD._prefix_candidates(sh, 0.8, l=2, big=False)
    assert guarded.exceptAll(plain).isEmpty()
    assert plain.exceptAll(guarded).isEmpty()
    assert guarded.count() > 0


def test_default_budget_is_env_tunable(monkeypatch):
    import importlib

    monkeypatch.setenv("SPARK_GRAFT_MAX_CAND_ROWS", "123")
    importlib.reload(DD)
    try:
        assert DD._MAX_CANDIDATE_ROWS == 123
    finally:
        monkeypatch.delenv("SPARK_GRAFT_MAX_CAND_ROWS")
        importlib.reload(DD)


def test_session_overlap_enumeration_guard(spark, monkeypatch):
    """Same guard discipline on session_overlap_top_pairs: shrink the
    budget and the sf-smoke fixture must trip it with the actionable
    message; the driver's sf0.01 oracle run (test_queries_oracle) pins
    that the default budget does NOT trip at oracle scale."""
    from real_time_trip_processing_project_spark.plans import extended as EXT

    monkeypatch.setattr(EXT, "_MAX_OVERLAP_CANDIDATES", 1)
    with pytest.raises(ValueError) as e:
        EXT.session_overlap_top_pairs(spark, "/root/testdata/sf0.001").count()
    msg = str(e.value)
    assert "enumeration" in msg and "SPARK_GRAFT_MAX_OVERLAP_CAND" in msg


def test_cosine_fanout_guard_trips_on_shrunk_budget(spark, monkeypatch):
    """r16: the last semantics-quadratic shape gets the same pre-flight
    discipline — Σ |cell_a|·|cell_b| over surviving blocks (the exact
    matmul pair count) vs a budget, BEFORE any vector shuffles."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )
    from real_time_trip_processing_project_spark.plans import REGISTRY

    monkeypatch.setattr(SIM, "_MAX_COSINE_CANDIDATES", 10)
    with pytest.raises(ValueError) as e:
        REGISTRY["dedup_embedding_cosine"].fn(
            spark, "/root/testdata/sf0.001"
        ).count()
    msg = str(e.value)
    assert "fan-out" in msg and "ann" in msg.lower()
    assert "SPARK_GRAFT_MAX_COSINE_CAND" in msg
    # the message carries the EXACT comparison count for remediation
    assert "comparisons" in msg


def test_cosine_fanout_guard_trips_on_join_path_too(spark, monkeypatch):
    """The distributed (broadcast self-join) cell-pair path computes the
    same fan sum as the driver loop and must trip identically."""
    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )
    from real_time_trip_processing_project_spark.sources.readers import (
        load_fixture,
    )

    emb = load_fixture(spark, "/root/testdata/sf0.001", "embeddings")
    monkeypatch.setattr(SIM, "_CELL_PAIR_JOIN_MIN_K", 0)
    monkeypatch.setattr(SIM, "_MAX_COSINE_CANDIDATES", 10)
    # r17 (ADVICE r16): the raise path must release the DISK_ONLY
    # survivor-set persist, not leave it in the CacheManager — capture
    # the persisted handle and check its storage level is reset.
    captured = {}
    orig = SIM._candidate_cell_pairs

    def spy(*a, **kw):
        out = orig(*a, **kw)
        captured["surv"] = out[2]
        return out

    monkeypatch.setattr(SIM, "_candidate_cell_pairs", spy)
    with pytest.raises(ValueError, match="SPARK_GRAFT_MAX_COSINE_CAND"):
        SIM.cosine_pairs_blocked(emb, 0.8, n_cells=24).count()
    surv = captured["surv"]
    assert surv is not None
    assert not surv.storageLevel.useDisk and not surv.storageLevel.useMemory


def test_cosine_fanout_paths_agree_on_the_count(spark, monkeypatch):
    """Driver-loop and broadcast-join candidate paths must report the
    SAME Σ |cᵢ|·|cⱼ| (the guard's correctness claim: the count is exact,
    not an estimate)."""
    import numpy as np

    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )

    rng = np.random.RandomState(3)
    C = rng.standard_normal((12, 8))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    radii = {i: 0.4 for i in range(12)}
    counts = {i: (i + 1) * 3 for i in range(12)}
    _, fan_loop, _ = SIM._candidate_cell_pairs(spark, C, radii, 0.6, counts)
    monkeypatch.setattr(SIM, "_CELL_PAIR_JOIN_MIN_K", 0)
    pair_df, fan_join, surv = SIM._candidate_cell_pairs(
        spark, C, radii, 0.6, counts
    )
    assert fan_loop == fan_join > 0
    assert surv is not None
    surv.unpersist()


def test_cosine_budget_is_env_tunable(monkeypatch):
    import importlib

    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )

    monkeypatch.setenv("SPARK_GRAFT_MAX_COSINE_CAND", "456")
    importlib.reload(SIM)
    try:
        assert SIM._MAX_COSINE_CANDIDATES == 456
    finally:
        monkeypatch.delenv("SPARK_GRAFT_MAX_COSINE_CAND")
        importlib.reload(SIM)
