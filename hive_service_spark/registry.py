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
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with its SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Queries persist() intermediates they cannot unpersist
            # (the caller collects the returned frame later), so a
            # long-lived session running many registered queries would
            # accumulate executor cache without bound (round-4
            # advice). Dropping the PREVIOUS query's cached frames
            # here bounds live cache to one query's persists; evicted
            # frames recompute if an old handle is ever re-collected,
            # so this is purely a memory-lifetime decision.
            spark.catalog.clearCache()
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
