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
    import threading

    _SPECS["skew_time_hierarchy_rollup"].fn(spark, SF_DIR).collect()
    with registry._LIVE_LOCK:
        tracked = list(
            registry._LIVE_FRAMES.get(threading.get_ident(), [])
        )
    assert tracked, "the rollup query should persist via registry.persisted"
    assert all(df.storageLevel.useMemory for df in tracked)
    _SPECS["scan_project_filter"].fn(spark, SF_DIR).collect()
    assert all(not df.storageLevel.useMemory for df in tracked), (
        "previous query's persists must be unpersisted on the next call"
    )


def test_concurrent_registered_queries_stay_correct(spark):
    """Two registered queries running CONCURRENTLY must (a) both
    return their serial answers and (b) never evict each other's
    in-flight persists — round-6 advice: the old session-global
    tracked list made every new arrival unpersist the peer's frames,
    silently recomputing iterative consumers' whole lineage per
    iteration. Eviction is now per-thread, so the peer's tracked
    frames must still be cached when both calls finish."""
    import concurrent.futures as cf

    names = ["skew_time_hierarchy_rollup", "dedup_exact"]
    serial = {
        n: sorted(tuple(r) for r in _SPECS[n].fn(spark, SF_DIR).collect())
        for n in names
    }

    def run(n):
        import threading

        rows = sorted(
            tuple(r) for r in _SPECS[n].fn(spark, SF_DIR).collect()
        )
        with registry._LIVE_LOCK:
            mine = list(
                registry._LIVE_FRAMES.get(threading.get_ident(), [])
            )
        # (b): whatever THIS thread persisted during its run is still
        # cached at completion — a concurrent peer did not evict it.
        still_cached = all(df.storageLevel.useMemory for df in mine)
        return n, rows, still_cached

    for _ in range(2):  # race twice: interleavings vary run to run
        with cf.ThreadPoolExecutor(max_workers=2) as ex:
            got = {n: (rows, ok) for n, rows, ok in ex.map(run, names)}
        for n in names:
            rows, ok = got[n]
            assert rows == serial[n], f"{n} diverged under concurrency"
            assert ok, (
                f"{n}: a concurrent peer evicted this query's "
                "in-flight persists (per-thread scoping regressed)"
            )


def test_peer_thread_persists_survive_other_threads_queries(spark):
    """Direct pin of the per-thread eviction contract: frames a
    worker thread persisted stay cached while ANOTHER thread runs
    registered queries back-to-back (each run evicts only its own
    thread's previous frames)."""
    import threading

    holder = {}

    def persist_on_worker():
        _SPECS["skew_time_hierarchy_rollup"].fn(spark, SF_DIR).collect()
        with registry._LIVE_LOCK:
            holder["frames"] = list(
                registry._LIVE_FRAMES.get(threading.get_ident(), [])
            )

    t = threading.Thread(target=persist_on_worker)
    t.start()
    t.join()
    assert holder["frames"], "worker query should have persisted frames"
    # main thread runs two registered queries — its evictions must not
    # touch the (now-idle) worker thread's tracked frames
    _SPECS["scan_project_filter"].fn(spark, SF_DIR).collect()
    _SPECS["dedup_exact"].fn(spark, SF_DIR).collect()
    try:
        assert all(
            df.storageLevel.useMemory for df in holder["frames"]
        ), "another thread's queries evicted the worker's persists"
    finally:
        for df in holder["frames"]:
            df.unpersist()
        with registry._LIVE_LOCK:
            # drop the dead worker's entry so later tests/suites don't
            # inherit its eviction duty via thread-id reuse
            registry._LIVE_FRAMES.pop(
                next(
                    (
                        k
                        for k, v in registry._LIVE_FRAMES.items()
                        if v and v[0] is holder["frames"][0]
                    ),
                    -1,
                ),
                None,
            )
