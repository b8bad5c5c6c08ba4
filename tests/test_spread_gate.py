"""spread_small_input's row-group gate (r15 sf30 probe finding).

Parquet reads are row-group atomic: a file whose row count is below the
writer's row-group size is ONE row group, so Spark's byte-range splits
all read 0 rows except the one containing the group — the whole scan
lands on a single task no matter how many splits exist.  The original
spread heuristic gated on `rdd.getNumPartitions()` (the SPLIT count),
which such a file satisfies, so CPU-heavy scan-adjacent stages
serialized onto one core (measured: `sim_cosine_topk` at sf30 ran its
120 M-row pinned-expr scoring on task 15-of-32 for 39 minutes while 31
tasks read 904 footer bytes each).  The gate now also reads the parquet
footers' `num_row_groups` — the true scan-parallelism bound — when the
split count alone would skip the spread.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from real_time_trip_processing_project_spark.sources.readers import (
    _parquet_row_groups,
    spread_small_input,
)

N_ROWS = 60_000


def _vec_table() -> pa.Table:
    rng = np.random.RandomState(7)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(N_ROWS, dtype=np.int64)),
            # 64-dim doubles make the file big enough that Spark carves
            # more byte-range splits than the spread floor — the exact
            # regime where the split-count heuristic lies
            "embedding": pa.array(
                rng.standard_normal((N_ROWS, 64)).tolist(),
                type=pa.list_(pa.float64()),
            ),
        }
    )


@pytest.fixture(scope="module")
def single_group(tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("sg") / "emb.parquet")
    pq.write_table(_vec_table(), path)  # pyarrow default: ONE row group
    assert pq.read_metadata(path).num_row_groups == 1
    return path


@pytest.fixture(scope="module")
def multi_group(tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("mg") / "emb.parquet")
    pq.write_table(_vec_table(), path, row_group_size=4_096)
    assert pq.read_metadata(path).num_row_groups >= 8
    return path


def test_row_group_metadata_probe(spark, single_group, multi_group):
    one = _parquet_row_groups(spark.read.parquet(single_group), cap=64)
    many = _parquet_row_groups(spark.read.parquet(multi_group), cap=64)
    assert one == 1
    assert many >= 8
    # survives projection/filter above the scan (inputFiles walks the plan)
    derived = (
        spark.read.parquet(single_group)
        .select("vec_id", "embedding")
        .filter("vec_id >= 0")
    )
    assert _parquet_row_groups(derived, cap=64) == 1
    # non-file sources: unknowable, not an error
    local = spark.range(10)
    assert _parquet_row_groups(local, cap=64) is None


def test_single_row_group_file_is_spread(spark, single_group):
    df = spark.read.parquet(single_group)
    cores = spark.sparkContext.defaultParallelism
    floor = max(2, cores // 2)
    # the trap: enough byte-range SPLITS to pass the old heuristic
    assert df.rdd.getNumPartitions() >= floor, (
        "fixture too small to reproduce the many-splits/one-group regime"
    )
    spread = spread_small_input(df)
    assert spread is not df
    assert spread.rdd.getNumPartitions() == cores
    # and the spread actually distributes rows, not just renames splits
    sizes = spread.rdd.glom().map(len).collect()
    assert sum(1 for s in sizes if s > 0) >= floor


def test_multi_row_group_file_is_left_alone(spark, multi_group):
    df = spark.read.parquet(multi_group)
    floor = max(2, spark.sparkContext.defaultParallelism // 2)
    if df.rdd.getNumPartitions() < floor:
        pytest.skip("box carved fewer splits than the floor")
    assert spread_small_input(df) is df  # no-op: real scale shape


def test_no_spread_env_wins(spark, single_group, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_SPREAD", "1")
    df = spark.read.parquet(single_group)
    assert spread_small_input(df) is df


def test_percent_encoded_path_still_probed(spark, tmp_path):
    """inputFiles() percent-encodes special characters in its URIs
    (a space becomes %20); the probe must unquote before handing the
    path to pyarrow, or such fixtures silently skip the spread and
    reintroduce the single-task regression (ADVICE r15)."""
    d = tmp_path / "row group dir ü"
    d.mkdir()
    path = str(d / "emb file.parquet")
    pq.write_table(_vec_table(), path)
    df = spark.read.parquet(path)
    uris = df.inputFiles()
    assert any("%" in u for u in uris), (
        "fixture path was not percent-encoded; trap not reproduced"
    )
    assert _parquet_row_groups(df, cap=64) == 1
