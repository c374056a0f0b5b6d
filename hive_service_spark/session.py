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
        # per-uid like scratch.SCRATCH_ROOT (r14): a world-shared
        # parent is created 0755 by its first owner, so a second uid
        # cannot create its own subdirectories under it
        return f"/dev/shm/spark-local-{os.getuid()}"
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
        # r13 NEGATIVE RESULT, kept as documentation: flipping
        # coalescePartitions.parallelismFirst to false (+ a 64m
        # advisory size), per the guide's "fewer, larger reduce
        # partitions", was benched head-to-head and REGRESSED the
        # suite 55.5 -> 60.1s — the text/dedup/graph stages are
        # CPU-dense per byte (pair expansion, regex, gram hashing), so
        # byte-based coalescing serialized them onto 1-2 tasks
        # (text_phrase_search +2.6s, graph_pagerank +1.5s,
        # dedup_ngram_jaccard +0.6s). Spark's parallelism-first
        # default is the right call for this workload at EVERY scale:
        # partitions stay ~cores-wide locally and AQE still merges
        # genuinely tiny post-shuffle partitions.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r13 (guide §3.1): allow the planner to pick shuffled-hash
        # over sort-merge when its size conditions hold (skips both
        # sort passes), and let AQE rewrite SMJ->SHJ at runtime when
        # every post-shuffle partition's build side fits locally. Both
        # policies are size-gated, never unconditional; explicit
        # merge/shuffle_hash hints in query code still win. Robustness
        # note (r14, guide §5): the static flip relies on PRE-AQE size
        # estimates, and a shuffled-hash build has far less spill
        # headroom than sort-merge — a memory-constrained or
        # skew-heavy deployment should flip preferSortMergeJoin back
        # to true per-session (the AQE threshold below is the safer
        # half: it sees REAL post-shuffle sizes); AQE skew-join
        # splitting stays active under SHJ either way (pinned in
        # tests/test_plans.py::test_shj_policy_skew_interaction).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m"
        )
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
