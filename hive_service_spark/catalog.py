"""Table layer: the deterministic test warehouse.

Mirrors the reference's metastore-backed Database→Table model
(SURVEY.md §1.1, §3.3): schemas are fixed (schema-on-read), tables are
registered in the session catalog as views so both the DataFrame API
and ``spark.sql`` resolve them. At 100 TB these would be external
partitioned/bucketed tables in a real metastore; locally they are the
driver-generated parquet files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Every table the driver pre-registers for the DuckDB oracle.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor
# (region=5 rows, nation=25 rows — fixed-cardinality in TPC-H).
BROADCASTABLE = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (vectorized parquet scan).

    ``events.ts`` has shipped in two physical encodings across testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark's reader rejects
    with [PARQUET_TYPE_ILLEGAL] unless read as long) and plain
    TIMESTAMP(MICROS). Handle both: read with nanosAsLong enabled, and
    only when the column actually comes back as a long, convert with
    integer division (ns ≈ 1.7e18 overflows double's 2^53 mantissa, so
    ``div`` not ``/``), truncating toward microseconds the same way
    DuckDB's reader does.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        import pyspark.sql.functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # session TZ is pinned UTC, so NTZ -> TIMESTAMP is
            # value-preserving; downstream epoch arithmetic
            # (cast to bigint, window ranges) needs TimestampType.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def par(spark: SparkSession, mult: int = 1) -> int:
    """Target parallelism for explicit repartitions.

    Derived from the cluster's ``defaultParallelism`` (total executor
    cores) instead of a hard-coded constant, so the same code fans out
    to thousands of tasks on a 1000-executor cluster and a handful
    locally. Default mult=1 = one task per core: oversubscribing
    shuffle-heavy stages (mult=2) measurably HURTS at bench scale
    (per-task overhead dominates: clean_corpus 3.7s@64 vs 2.1s@32 on
    local[32]) and on a real cluster AQE already splits stragglers.
    Pass mult>1 only for pair-expansion stages whose output is much
    bigger than their input.
    """
    return max(spark.sparkContext.defaultParallelism * mult, 4)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries.

    Temp view over a file scan keeps full predicate pushdown / column
    pruning — Catalyst sees straight through the view to the
    FileSourceScan.
    """
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
