"""Physical-plan inspection — the scale-discipline gate.

The reference's physical optimizer decides vectorization, map-join
selection, and partition pruning per query (SURVEY.md §4.2:
Vectorizer, CommonJoinResolver, PartitionPruner). In Spark those
decisions are Catalyst's; this module makes them ASSERTABLE so tests
can pin the plan shape we want at 100 TB — filters pushed to the
parquet scan, small dims broadcast, no cartesian products, codegen
covering the hot path — instead of hoping the optimizer behaved.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text of the optimized physical plan."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every `PushedFilters:` list in the plan, flattened.

    A predicate that should prune parquet row-groups at 100 TB must
    appear here — a filter evaluated only post-scan reads the whole
    table off disk.
    """
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip()
            if body.startswith("[") and body.endswith("]"):
                body = body[1:-1]
            out.extend(p.strip() for p in body.split(",") if p.strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Every `PartitionFilters:` list in the plan, flattened.

    Directory-level skipping: a predicate here prunes whole partitions
    before any file is opened — Hive's PartitionPruner analog. DPP shows
    up as a `dynamicpruningexpression(...)` entry.
    """
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PartitionFilters:"):
            body = line.split(":", 1)[1].strip()
            if body.startswith("[") and body.endswith("]"):
                body = body[1:-1]
            if body:
                out.append(body)
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """Every `ReadSchema:` line — the columns each scan actually reads.

    Column pruning is the other half of scan efficiency: a 2-column
    projection must not read 16 columns at 100 TB.
    """
    return [
        line.strip().split(":", 1)[1].strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def operators(df: DataFrame) -> str:
    """Node names of the executed plan (one string, for `in` checks)."""
    return formatted_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or (
        "BroadcastNestedLoopJoin" in formatted_plan(df)
    )


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in formatted_plan(df)


def hinted_subtrees(df: DataFrame) -> list[str]:
    """The analyzed-plan subtree under every explicit join-strategy
    hint (`ResolvedHint`), one string each.

    Forced `F.broadcast(...)` hints bypass AQE's size check, so a hint
    wrapping an sf-scaled frame (part/supplier/customer-derived) is a
    latent executor-OOM at 100 TB even though it "works" at test scale
    (round-6 advice #4). Tests grep these subtrees for big-table
    column signatures: hints must cover only fixed-cardinality frames
    (nation=25, region=5, 1-row scalar aggregates).

    Parsed from the analyzed logical plan's indentation: a hint's
    subtree is every following line indented deeper than the hint node.
    """
    text = df._jdf.queryExecution().analyzed().toString()
    lines = text.splitlines()

    def indent(ln: str) -> int:
        return len(ln) - len(ln.lstrip(" :+-"))

    out: list[str] = []
    for i, ln in enumerate(lines):
        if "ResolvedHint" not in ln:
            continue
        d = indent(ln)
        sub = []
        for nxt in lines[i + 1 :]:
            if indent(nxt) <= d:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — fused JVM loops covering
    the operators (the analog of the reference's 730 vectorized kernels,
    SURVEY.md §4.2, except compiled and fused).

    Uses explain("codegen"), whose header reads
    `Found N WholeStageCodegen subtrees.` Under AQE the pre-execution
    AdaptiveSparkPlan reports 0 (codegen is decided per query stage at
    runtime), so AQE is switched off around this *static inspection
    only* — execution configs are untouched."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            # select("*") makes a fresh Dataset (new QueryExecution) so
            # physical planning happens under the AQE-off conf instead
            # of reusing a plan cached while AQE was on.
            df.select("*").explain(mode="codegen")
        text = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    for line in text.splitlines():
        if "WholeStageCodegen subtrees" in line:
            return int(line.split()[1])
    return 0
