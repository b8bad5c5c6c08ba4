"""r18 bench-honesty pin (VERDICT r17 "what's wrong" items 1-2).

A query fn that persists a subtree registers an identical analyzed plan
every rep, and Spark's CacheManager serves later reps from the first
rep's materialized cache — the bench's min-of-N was then a warm-cache
read for every persisted query.  bench.py now evicts the cache between
reps; this test pins the mechanism: after one materialization the
CacheManager is non-empty (the query really does persist — the premise),
and after ``clearCache()`` it is empty again, so the next rep pays full
materialization.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_persisted_query_rep2_is_cold_after_clearcache(spark):
    from real_time_trip_processing_project_spark.plans import REGISTRY

    spark.catalog.clearCache()
    cm = _cache_manager(spark)
    assert cm.isEmpty(), "test precondition: session cache not empty"

    # distinct_kmv persists its shared distinct set (DISK_ONLY)
    df = REGISTRY["distinct_kmv"].fn(spark, SF_SMOKE)
    assert not cm.isEmpty(), (
        "premise broken: distinct_kmv no longer persists — "
        "drop this pin alongside the bench clearCache comment"
    )
    df.write.mode("overwrite").format("noop").save()

    # the bench's between-reps eviction: rep 2 must not find this cache
    spark.catalog.clearCache()
    assert cm.isEmpty(), "clearCache left persisted plans registered"


def test_bench_time_loop_evicts_between_reps():
    """The clearCache call must live INSIDE the per-rep loop of both
    bench timing loops (main + retest), not once per query."""
    import ast
    import pathlib

    src = (pathlib.Path(__file__).parent.parent / "bench.py").read_text()
    tree = ast.parse(src)
    hits = 0
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "clearCache"
        ):
            hits += 1
    assert hits >= 2, "bench.py lost its between-reps cache eviction"
