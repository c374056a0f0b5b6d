"""Partition-pruning wave — static pruning + dynamic partition pruning (DPP).

Reference surface (SURVEY.md §4.1 #11, §4.2): Hive prunes partitions
statically at compile time (`ppr/PartitionPruner` +
`pcr/PartitionConditionRemover` push partition-column predicates into
the metastore listing [jar: hive-exec!ql/optimizer/ppr/PartitionPruner])
and dynamically at runtime — one branch of the DAG computes the join
keys and an `AppMasterEventOperator` ships them to the Tez AM, which
drops the unneeded partitions of the other branch before its tasks are
scheduled [jar: hive-exec!ql/exec/AppMasterEventOperator;
ql/exec/tez/DynamicPartitionPruner].

Spark-first mapping: both are built into Catalyst. A filter on a
partition column becomes `PartitionFilters` on the `FileSourceScan`
(zero files read for pruned partitions); a selective dim-side filter on
a join against a partition column becomes a
`dynamicpruningexpression(... IN subquery)` partition filter that
reuses the broadcast exchange (`spark.sql.optimizer.
dynamicPartitionPruning.enabled`, default on). At 100 TB this is the
difference between scanning 84 months and scanning 2 — the fact table
is laid out `PARTITIONED BY (ship_month)` exactly so these two
mechanisms can skip whole directories; nothing here is custom code,
the queries exist to pin the plan shape the deployment relies on.

Tests: tests/test_plans.py pins `PartitionFilters` non-empty on the
static scan and `dynamicpruning` present on the DPP scan.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.registry import query

_SCRATCH = "/root/repo/.scratch/partitioned"


def staged_lineitem_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem laid out as a month-partitioned table (the 100 TB layout).

    Written once per scale factor: `PARTITIONED BY (ship_month)` with
    ship_month = 'yyyy-MM' of l_shipdate (~84 directories). Dynamic
    partition write — the reference's SortedDynPartitionOptimizer path,
    Spark's `partitionBy` on write (SURVEY.md §2.1 FileSinkOperator).
    """
    dest = f"{_SCRATCH}/{os.path.basename(os.path.normpath(sf_dir))}/lineitem_by_month"
    marker = f"{dest}/_SUCCESS"
    src = f"{sf_dir}/lineitem.parquet"
    stale = not os.path.exists(marker) or os.path.getmtime(marker) < os.path.getmtime(src)
    if stale:
        (
            load(spark, sf_dir, "lineitem")
            .withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
            # one file per partition directory: repartition on the
            # partition column so 32 tasks don't each write 84 tiny files
            .repartition("ship_month")
            .write.mode("overwrite")
            .partitionBy("ship_month")
            .parquet(dest)
        )
    return spark.read.parquet(dest)


_STATIC_ORACLE = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       COUNT(*) AS n_rows,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m') IN ('1996-01', '1996-02', '1996-03')
GROUP BY 1
ORDER BY ship_month
"""


@query("part_static_partition_pruning", oracle=_STATIC_ORACLE)
def part_static_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter on the partition column → directory-level skip.

    The IN-list lands in `PartitionFilters` (not `PushedFilters`): Spark
    lists only the 3 matching directories; the other ~81 months are
    never opened. Hive analog: PartitionPruner consulting the metastore
    (`get_partitions_by_expr`).
    """
    li = staged_lineitem_by_month(spark, sf_dir)
    return (
        li.filter(F.col("ship_month").isin("1996-01", "1996-02", "1996-03"))
        .groupBy("ship_month")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("ship_month")
    )


_DPP_ORACLE = """
WITH hot_months AS (
    SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
)
SELECT l.ship_month,
       COUNT(*) AS n_rows,
       ROUND(SUM(l.l_quantity), 2) AS qty
FROM (SELECT *, strftime(l_shipdate, '%Y-%m') AS ship_month FROM lineitem) l
JOIN hot_months m ON l.ship_month = m.ship_month
GROUP BY 1
ORDER BY l.ship_month
"""


@query("part_dynamic_partition_pruning", oracle=_DPP_ORACLE)
def part_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime pruning: dim-side filter decides which fact partitions load.

    The months worth scanning are only known after filtering `orders` —
    Catalyst inserts `dynamicpruningexpression(ship_month IN subquery)`
    into the fact scan's PartitionFilters, reusing the broadcast
    exchange as the subquery. Hive analog: AppMasterEventOperator →
    DynamicPartitionPruner dropping Tez splits at runtime.
    """
    li = staged_lineitem_by_month(spark, sf_dir)
    hot_months = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("ship_month"))
        .distinct()
    )
    return (
        li.join(hot_months, "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .orderBy("ship_month")
    )
