"""Registry cache-lifetime scoping (registry.persisted / _evict_previous).

Round-5 advice: the query wrapper used session-global
``spark.catalog.clearCache()``, which evicted every user's cached
frames in a long-lived shared session (the HiveServer2/STS deployment
shape). The fix tracks the frames each registered query persists and
unpersists ONLY those when the next registered query starts. These
tests pin both halves of that contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F

import hive_service_spark.registry as registry
from tests.conftest import SF_DIR

_SPECS = registry.load_all()


def test_external_cache_survives_registered_queries(spark):
    """A frame cached OUTSIDE the registry must keep its storage level
    across registered-query invocations — the exact frame clearCache()
    used to evict (MV caches, other users' frames)."""
    ext = spark.range(1000).withColumn("x", F.col("id") * 2).persist()
    ext.count()  # materialize into the cache manager
    try:
        # one query that persists intermediates, then a second call so
        # the wrapper's eviction pass actually runs over tracked frames
        _SPECS["skew_time_hierarchy_rollup"].fn(spark, SF_DIR).collect()
        _SPECS["scan_project_filter"].fn(spark, SF_DIR).collect()
        assert ext.storageLevel.useMemory, (
            "externally-cached frame was evicted by a registered query"
        )
    finally:
        ext.unpersist()


def test_previous_query_persists_are_evicted(spark):
    """The wrapper must drop the PREVIOUS query's tracked persists when
    the next one starts — the memory bound that replaced clearCache()."""
    _SPECS["skew_time_hierarchy_rollup"].fn(spark, SF_DIR).collect()
    with registry._LIVE_LOCK:
        tracked = list(registry._LIVE_FRAMES)
    assert tracked, "the rollup query should persist via registry.persisted"
    assert all(df.storageLevel.useMemory for df in tracked)
    _SPECS["scan_project_filter"].fn(spark, SF_DIR).collect()
    assert all(not df.storageLevel.useMemory for df in tracked), (
        "previous query's persists must be unpersisted on the next call"
    )


def test_concurrent_registered_queries_stay_correct(spark):
    """Two registered queries running CONCURRENTLY may evict each
    other's tracked persists mid-flight (a new arrival drops the
    previous call's frames). The documented contract is that eviction
    costs a recompute, never a wrong answer — proven by racing two
    persisting queries in threads and comparing both results to their
    serial runs."""
    import concurrent.futures as cf

    names = ["skew_time_hierarchy_rollup", "dedup_exact"]
    serial = {
        n: sorted(tuple(r) for r in _SPECS[n].fn(spark, SF_DIR).collect())
        for n in names
    }

    def run(n):
        return n, sorted(
            tuple(r) for r in _SPECS[n].fn(spark, SF_DIR).collect()
        )

    for _ in range(2):  # race twice: interleavings vary run to run
        with cf.ThreadPoolExecutor(max_workers=2) as ex:
            got = dict(ex.map(run, names))
        for n in names:
            assert got[n] == serial[n], f"{n} diverged under concurrency"
