"""SparkSession construction for tests and bench.

The driver passes us its own session for ``queries()``; this builder is
for local runs. Config choices mirror what a 1000-executor deployment
would set (AQE on, skew-join handling, partition coalescing) scaled to
local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _local_dir() -> str:
    """Shuffle-spill directory: RAM-backed tmpfs when available (this
    host's shared disk shows multi-second I/O jitter — see bench notes
    in SURVEY §8), overridable via SPARK_GRAFT_LOCAL_DIR, falling back
    to Spark's default (java.io.tmpdir) when /dev/shm is absent or the
    host shouldn't spill to RAM."""
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override:
        return override
    if os.path.isdir("/dev/shm"):
        return "/dev/shm/spark-local"
    return ""


def get_session(app: str = "hive_service_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or CPUS
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        # shuffle partitions sized to cores locally; AQE coalesces down.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Whole-stage codegen over a ~120-query suite overflows the JVM's
        # default 240MB code cache; once full, the JIT disables and the
        # generated loops run interpreted (measured 10-30x CPU inflation
        # with wild run-to-run variance on the array-heavy dedup queries).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.sql.session.timeZone", "UTC")
        # Hive 2.3 semantics: non-ANSI arithmetic (overflow wraps, / on
        # ints yields double) — matches reference and DuckDB tolerance.
        .config("spark.sql.ansi.enabled", "false")
        # Arrow for any pandas-UDF path (LLM extensions).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    # Shuffle/spill on tmpfs where safe: this host's shared disk shows
    # multi-second I/O jitter that hit the shuffle-heavy dedup queries
    # with 2-10x run-to-run swings (CPU-bound window queries stayed
    # flat, fingering the disk, not the JVM). 126G of RAM-backed
    # /dev/shm dwarfs local-mode shuffle volume; a real cluster puts
    # spark.local.dir on node-local SSDs. Guarded: hosts without
    # /dev/shm keep Spark's default so large jobs still spill to disk.
    local_dir = _local_dir()
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()
