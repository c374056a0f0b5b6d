"""Skew & scale patterns — the 100 TB survival kit, demonstrated.

The reference handles hot keys with a dedicated physical pass
(SkewJoinOptimizer / GenMRSkewJoinProcessor — SURVEY.md §2.5, §4.2)
that splits skewed keys into separate jobs. Spark's first line of
defense is AQE skew-join splitting (on in session.py); these queries
implement the two patterns AQE can't do for you — salted two-phase
aggregation and a salted replicated join — as reusable shapes, with
exact plain-SQL oracles proving the salting is semantics-preserving.

`events.event_type` is the demo skew column: single-digit cardinality,
so at 100 TB every value is a hot key that would pin one reducer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.registry import persisted, query

_SALTS = 32  # one shard per executor-ish; tune to cluster width at 100 TB


# --- salted two-phase aggregation -------------------------------------------

_SALTED_AGG_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value,
       ROUND(MAX(value), 2) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("skew_salted_two_phase_agg", oracle=_SALTED_AGG_ORACLE)
def skew_salted_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY on a hot low-cardinality key via explicit salting:
    phase 1 groups by (key, salt) spreading each hot key over _SALTS
    reducers; phase 2 merges the partials per key. COUNT/SUM/MAX are
    all decomposable, so the result is exactly the plain GROUP BY.

    (Catalyst's partial aggregation already does map-side combine; the
    salt additionally splits the REDUCE side, which matters when one
    key's partials alone exceed an executor — the reference needed
    GroupByOperator hash-flush + skew split for the same situation.)
    """
    ev = load(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(_SALTS)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("p_cnt"),
        F.sum("value").alias("p_sum"),
        F.max("value").alias("p_max"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("p_cnt").alias("n_events"),
            F.round(F.sum("p_sum"), 2).alias("total_value"),
            F.round(F.max("p_max"), 2).alias("max_value"),
        )
        .orderBy("event_type")
    )


# --- salted replicated join --------------------------------------------------

_SALTED_JOIN_ORACLE = """
SELECT t.event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(e.value * t.weight), 2) AS weighted_value
FROM events e
JOIN (
  SELECT event_type, AVG(value) AS weight
  FROM events GROUP BY event_type
) t ON e.event_type = t.event_type
GROUP BY t.event_type
ORDER BY t.event_type
"""


@query("skew_salted_replicated_join", oracle=_SALTED_JOIN_ORACLE)
def skew_salted_replicated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join where EVERY key of the big side is hot: the small side
    is replicated _SALTS× (explode on a salt array), the big side gets
    a deterministic salt, and the join key becomes (key, salt) — no
    single reducer sees a whole hot key. This is the reference's
    skew-join split expressed as a plan rewrite; when the small side
    fits in memory a plain broadcast is better (and AQE would pick it),
    so this shape is for mid-size dims at 100 TB where broadcast
    doesn't fit but per-key volume still skews.
    """
    ev = load(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("weight"))
    dim_rep = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1)))
    )
    big = ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(_SALTS)))
    joined = big.alias("e").join(
        dim_rep.alias("t"),
        (F.col("e.event_type") == F.col("t.event_type"))
        & (F.col("e.salt") == F.col("t.salt")),
    )
    return (
        joined.groupBy(F.col("t.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("e.value") * F.col("t.weight")), 2).alias(
                "weighted_value"
            ),
        )
        .orderBy("event_type")
    )


# --- multi-granularity time rollup ------------------------------------------

_ROLLUP_ORACLE = """
SELECT grain, bucket, n, ROUND(total, 2) AS total
FROM (
  SELECT 'day' AS grain, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS n, SUM(value) AS total
  FROM events GROUP BY 2
  UNION ALL
  SELECT 'week', CAST(date_trunc('week', ts) AS TIMESTAMP), COUNT(*), SUM(value)
  FROM events GROUP BY 2
  UNION ALL
  SELECT 'month', CAST(date_trunc('month', ts) AS TIMESTAMP), COUNT(*), SUM(value)
  FROM events GROUP BY 2
)
ORDER BY grain, bucket
"""


@query("skew_time_hierarchy_rollup", oracle=_ROLLUP_ORACLE)
def skew_time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup (day/week/month) in
    ONE pass: aggregate at the finest grain first, then re-aggregate
    the day partials upward — at 100 TB the raw table is read once and
    the coarser grains aggregate ~1/1000th of the data instead of
    rescanning. (The reference's floor_day/floor_week/floor_month
    Druid-granularity UDFs are the same bucketing — SURVEY.md §2.7
    date/time; Spark: date_trunc.)
    """
    ev = load(spark, sf_dir, "events")
    day = persisted(
        ev.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )

    def _up(grain: str) -> DataFrame:
        return day.groupBy(
            F.date_trunc(grain, "bucket").alias("bucket")
        ).agg(F.sum("n").alias("n"), F.sum("total").alias("total"))

    out = (
        day.select(F.lit("day").alias("grain"), "bucket", "n", "total")
        .unionAll(
            _up("week").select(F.lit("week").alias("grain"), "bucket", "n", "total")
        )
        .unionAll(
            _up("month").select(
                F.lit("month").alias("grain"), "bucket", "n", "total"
            )
        )
    )
    return out.select(
        "grain", "bucket", "n", F.round("total", 2).alias("total")
    ).orderBy("grain", "bucket")
