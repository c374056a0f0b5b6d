"""Query registry: the driver-contract surface.

Every implemented operator family registers one or more named queries
here via the ``@query`` decorator. ``__spark_entry__.py`` exposes the
collected registry as ``queries()`` / ``oracle_sql()``.

A registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus
an optional ANSI-SQL oracle string DuckDB can run over the same parquet
tables. Column names/aliases MUST match between the two — the driver
sorts columns by name before value-hashing.
"""

from __future__ import annotations

import functools
import importlib
import threading
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check


_REGISTRY: dict[str, QuerySpec] = {}

# Cache-lifetime tracking: handles persisted by registered queries via
# :func:`persisted`, evicted when the NEXT registered query starts ON
# THE SAME THREAD. This scopes eviction twice over: (a) to frames the
# registry itself created — a session-global
# ``spark.catalog.clearCache()`` here (the round-5 shape) would also
# evict every OTHER user's cached frames and MV caches in a long-lived
# shared session (the HiveServer2/STS deployment shape this engine
# mirrors) — and (b) to the invoking thread, so concurrent registered
# queries can no longer evict an in-flight peer's persists and force
# iterative consumers (the PageRank loop, the BPE merge chain) to
# silently recompute their whole lineage per iteration (round-6
# advice). Keyed by thread id; a reused id simply inherits eviction
# duty for its predecessor's frames, which bounds the leak from
# threads that die between queries.
_LIVE_FRAMES: dict[int, list[DataFrame]] = {}
_LIVE_LOCK = threading.Lock()


def persisted(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` whose handle the registry tracks for eviction.

    Registered queries persist intermediates they cannot unpersist
    themselves (the caller collects the returned frame later), so cache
    lifetime is a registry concern: the wrapper drops the PREVIOUS
    query's tracked frames before running the next one, bounding live
    executor cache to one query's persists. Evicted frames recompute if
    an old handle is ever re-collected — a memory-lifetime decision,
    never a correctness one. Frames cached outside this helper (user
    caches, MV caches) are never touched.
    """
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    with _LIVE_LOCK:
        _LIVE_FRAMES.setdefault(threading.get_ident(), []).append(df)
    return df


def _evict_previous() -> None:
    """Unpersist the CURRENT thread's previous query's tracked frames.

    Other threads' lists are untouched — a concurrently-running peer
    keeps its persisted intermediates for its whole invocation
    (test_registry_cache.py pins this)."""
    with _LIVE_LOCK:
        frames = _LIVE_FRAMES.pop(threading.get_ident(), [])
    for df in frames:
        try:
            df.unpersist()
        except Exception:
            # session stopped/restarted since the frame was cached —
            # nothing left to evict
            pass

# Modules that register queries on import. Order = SURVEY.md §7 waves.
_QUERY_MODULES = (
    "hive_service_spark.operators.scans",
    "hive_service_spark.operators.joins",
    "hive_service_spark.operators.aggregates",
    "hive_service_spark.operators.windows",
    "hive_service_spark.operators.setops",
    "hive_service_spark.operators.lateral",
    "hive_service_spark.operators.subqueries",
    "hive_service_spark.operators.transform_script",
    "hive_service_spark.operators.sql_script",
    "hive_service_spark.operators.ddl_catalog",
    "hive_service_spark.operators.dml_lifecycle",
    "hive_service_spark.operators.materialized_views",
    "hive_service_spark.operators.bitmap_index",
    "hive_service_spark.operators.acid_snapshots",
    "hive_service_spark.operators.tpch",
    "hive_service_spark.operators.tpch_extra",
    "hive_service_spark.operators.tpch_more",
    "hive_service_spark.operators.skew_scale",
    "hive_service_spark.operators.partition_pruning",
    "hive_service_spark.operators.optimizer_features",
    "hive_service_spark.operators.sequence_analytics",
    "hive_service_spark.operators.matchpath",
    "hive_service_spark.operators.temporal_joins",
    "hive_service_spark.operators.recursive_cte",
    "hive_service_spark.operators.graph_analytics",
    "hive_service_spark.functions.function_queries",
    "hive_service_spark.functions.sql_shims",
    "hive_service_spark.functions.percentile_hive",
    "hive_service_spark.sources.source_queries",
    "hive_service_spark.sources.python_datasource",
    "hive_service_spark.llm.text",
    "hive_service_spark.llm.dedup",
    "hive_service_spark.llm.similarity",
    "hive_service_spark.llm.multimodal",
    "hive_service_spark.llm.pipeline",
    "hive_service_spark.llm.corpus",
    "hive_service_spark.llm.classify",
    "hive_service_spark.llm.selection",
    "hive_service_spark.llm.tokenizer",
    "hive_service_spark.streaming.events",
    "hive_service_spark.streaming.ingest",
    "hive_service_spark.streaming.notifications",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with its SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Drop the PREVIOUS registered query's tracked persists on
            # THIS thread (see :func:`persisted`) — bounds live
            # executor cache to one query's frames per thread without
            # touching caches built outside the registry (round-5
            # advice: clearCache() was session-global) and without
            # evicting a concurrent peer's in-flight intermediates
            # (round-6 advice: the global list made new arrivals
            # thrash iterative peers' caches).
            _evict_previous()
            return fn(spark, sf_dir)

        _REGISTRY[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            # module not built yet — fine during incremental development
            pass
    return dict(_REGISTRY)
