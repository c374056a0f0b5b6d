"""Temporal joins — as-of join and banded range join.

Neither exists in the reference (SURVEY.md §2.5: "Range / as-of /
interval joins — not present") NOR as a Spark builtin; both are core
training-data-pipeline operators, so they're implemented here as
compositions of shuffle-safe primitives:

- **as-of join**: the union-tag + window formulation — tag both sides,
  union, one window per join key ordered by time carrying the last
  build-side value forward, keep probe rows. ONE shuffle on the key,
  no range blow-up, no per-row lookup: the canonical distributed as-of
  (what pandas.merge_asof does single-node).
- **range join**: time-banding — quantize to fixed buckets, equi-join
  on (key, bucket) for own+adjacent buckets, residual-filter the exact
  predicate. Candidate mass is bounded by per-bucket density, never
  O(n²); this is the standard interval-join decomposition Structured
  Streaming uses for stream-stream time-bound joins.

Oracles: DuckDB ships a native ASOF JOIN (used verbatim — strong
cross-check of the window formulation) and evaluates the small-scale
inequality join directly for the range case.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hive_service_spark.catalog import load
from hive_service_spark.registry import query

# --- as-of join: each purchase matched to the user's latest prior view ------

_ASOF_ORACLE = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       CAST(v.ts AS TIMESTAMP) AS view_ts,
       v.event_id AS view_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY purchase_id
"""


@query("temporal_asof_join", oracle=_ASOF_ORACLE)
def temporal_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union-tag + window: purchases pick up the most
    recent view (ts_view <= ts_purchase) per user. Build rows (views)
    and probe rows (purchases) are unioned with a side tag; a single
    window per user ordered by (ts, side, event_id) carries the last
    view forward; probe rows keep the carried value. At 100 TB: one
    shuffle on user_id total — contrast a naive range join, which is a
    per-user cross product. Ties (view.ts == purchase.ts) sort the view
    first, matching ASOF's >= semantics.

    DuckDB's native ASOF JOIN breaks event_id ties arbitrarily when two
    views share the boundary timestamp, so view_id picks the LATEST
    (max event_id) view among equal timestamps — deterministic in both
    engines (testdata has no such ties, but the contract is pinned).
    """
    ev = load(spark, sf_dir, "events")
    # side=0 sorts views before purchases at equal ts (>= semantics)
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("side"), F.col("event_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), F.col("event_id")
    )
    tagged = views.unionAll(purchases).withColumn(
        "v_ts", F.when(F.col("side") == 0, F.col("ts"))
    ).withColumn("v_id", F.when(F.col("side") == 0, F.col("event_id")))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.last("v_ts", ignorenulls=True).over(w).alias("view_ts"),
        F.last("v_id", ignorenulls=True).over(w).alias("view_id"),
    )
    return (
        carried.where(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "view_ts",
            "view_id",
        )
        .orderBy("purchase_id")
    )


# --- banded range join: event pairs within 60s per user ---------------------

_RANGE_ORACLE = """
SELECT a.user_id,
       a.event_id AS id_a, b.event_id AS id_b,
       CAST(a.ts AS TIMESTAMP) AS ts_a, CAST(b.ts AS TIMESTAMP) AS ts_b
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(date_diff('second', a.ts, b.ts)) <= 60
ORDER BY a.user_id, id_a, id_b
"""


@query("temporal_range_join_banded", oracle=_RANGE_ORACLE)
def temporal_range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All event pairs of the same user within 60 seconds, via time
    banding: bucket = floor(epoch/60); the left side joins buckets
    {b-1, b, b+1} (explode of a 3-element array), the exact |Δt| <= 60
    predicate filters residually. The join is a pure equi-join on
    (user_id, bucket): candidate volume is sum of per-bucket densities
    — bounded at 100 TB — instead of per-user O(n²). The same
    decomposition Structured Streaming applies to stream-stream
    time-interval joins; bucket width tunes candidate mass vs
    replication (3x here)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.floor(F.unix_timestamp("ts") / 60).alias("bkt")
    )
    left = ev.select(
        "user_id",
        F.col("event_id").alias("id_a"),
        F.col("ts").alias("ts_a"),
        F.explode(
            F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
        ).alias("jbkt"),
    )
    right = ev.select(
        "user_id",
        F.col("event_id").alias("id_b"),
        F.col("ts").alias("ts_b"),
        F.col("bkt").alias("jbkt"),
    )
    return (
        left.join(right, ["user_id", "jbkt"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(
                    F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a")
                )
                <= 60
            )
        )
        .select("user_id", "id_a", "id_b", "ts_a", "ts_b")
        .orderBy("user_id", "id_a", "id_b")
    )


_SCD2_PIT_ORACLE = """
WITH dim AS (
  -- v1 valid from the epoch sentinel, not the data's first order date:
  -- validity intervals must genuinely PARTITION the timeline (the
  -- docstring's claim), so a regenerated corpus with earlier orders
  -- attributes them to version 1 instead of silently dropping them on
  -- both engines (round-13 review)
  SELECT c_custkey, c_mktsegment AS segment,
         TIMESTAMP '1970-01-01' AS valid_from,
         CASE WHEN c_custkey % 7 = 0 THEN TIMESTAMP '1997-01-01' END
           AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 'MACHINERY2' AS segment,
         TIMESTAMP '1997-01-01' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT d.segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS revenue
FROM orders o
JOIN dim d
  ON o.o_custkey = d.c_custkey
 AND o.o_orderdate >= d.valid_from
 AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
GROUP BY d.segment
"""


@query("temporal_scd2_pointintime", oracle=_SCD2_PIT_ORACLE)
def temporal_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact-to-SCD2 join — the warehouse pattern the SCD2
    maintenance query (ddl_scd2_dimension) exists to enable: every
    order is attributed to the dimension version that was CURRENT on
    its order date (customers with c_custkey % 7 = 0 switch segment on
    1997-01-01; their pre-1997 orders must land on the old segment).
    Spark-first shape: an equi-join on the dimension key carrying the
    validity-range residual — SCD2 guarantees few versions per key, so
    the per-key pair expansion is bounded by version count, and at
    100 TB this is an ordinary key-partitioned shuffle join (bucket
    both sides by the key and it is shuffle-free). Exactly one version
    matches per (order, key) because validity intervals partition the
    timeline."""
    cust = load(spark, sf_dir, "customer")
    v1 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        # epoch sentinel — see the oracle comment (round-13 review)
        F.lit("1970-01-01").cast("timestamp").alias("valid_from"),
        F.when(
            F.col("c_custkey") % 7 == 0,
            F.lit("1997-01-01").cast("timestamp"),
        ).alias("valid_to"),
    )
    v2 = (
        cust.where(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            F.lit("MACHINERY2").alias("segment"),
            F.lit("1997-01-01").cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
    )
    dim = v1.unionByName(v2)
    o = load(spark, sf_dir, "orders")
    joined = o.join(
        dim,
        (o.o_custkey == dim.c_custkey)
        & (o.o_orderdate >= dim.valid_from)
        & (dim.valid_to.isNull() | (o.o_orderdate < dim.valid_to)),
    )
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# SCD2 BUILDER: construct the slowly-changing dimension from a change log
# ---------------------------------------------------------------------------

_SCD2_BUILD_ORACLE = """
WITH changes AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
kept AS (
  SELECT user_id, ts, event_id, event_type
  FROM changes WHERE prev IS NULL OR event_type <> prev
),
versioned AS (
  SELECT user_id, event_type AS attr, ts AS valid_from,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS version,
         LEAD(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS next_ts
  FROM kept
)
SELECT user_id, attr, valid_from,
       COALESCE(next_ts, TIMESTAMP '2999-12-31 00:00:00') AS valid_to,
       CAST(version AS BIGINT) AS version,
       next_ts IS NULL AS is_current
FROM versioned
"""


@query("temporal_scd2_build", oracle=_SCD2_BUILD_ORACLE)
def temporal_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an SCD Type-2 dimension FROM a change log — the writer
    side of temporal_scd2_pointintime (which consumes a pre-built
    dimension). Each event is 'the user's attribute became
    event_type at ts'; consecutive no-change records collapse (lag
    filter), surviving changes get contiguous validity ranges
    (valid_to = next change's valid_from, open tail pinned to a
    sentinel high date) and version numbers. This is the standard
    warehouse ETL that turns CDC streams into point-in-time-joinable
    dimensions (reference: the MERGE-based SCD2 maintenance pattern
    Hive's docs prescribe for ACID tables).

    Scale: two window passes partitioned by the dimension's natural
    key — each user's change history sorts locally within its hash
    partition; no global sort, no driver state. At 100 TB the heavy
    side (the raw change log) is filtered to real changes BEFORE the
    second window, so versioning touches only surviving rows."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    kept = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        .drop("prev")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        kept.withColumn("version", F.row_number().over(w2))
        .withColumn("next_ts", F.lead("ts").over(w2))
        .select(
            "user_id",
            F.col("event_type").alias("attr"),
            F.col("ts").alias("valid_from"),
            F.coalesce(
                "next_ts", F.lit("2999-12-31 00:00:00").cast("timestamp")
            ).alias("valid_to"),
            F.col("version").cast("bigint").alias("version"),
            F.col("next_ts").isNull().alias("is_current"),
        )
    )


# ---------------------------------------------------------------------------
# period-over-period: MoM / YoY growth over the month spine
# ---------------------------------------------------------------------------

_POP_ORACLE = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE
           AS revenue
  FROM orders
  GROUP BY 1
),
seq AS (
  SELECT month, n_orders, revenue,
         LAG(revenue, 1) OVER (ORDER BY month) AS prev_rev,
         LAG(revenue, 12) OVER (ORDER BY month) AS yoy_rev
  FROM monthly
)
SELECT month, n_orders, revenue,
       COALESCE(prev_rev, 0.0) + 0.0 AS prev_month_revenue,
       CASE WHEN prev_rev IS NULL OR prev_rev = 0 THEN 0.0
            ELSE (revenue - prev_rev) / prev_rev END + 0.0 AS mom_growth,
       COALESCE(yoy_rev, 0.0) + 0.0 AS year_ago_revenue,
       CASE WHEN yoy_rev IS NULL OR yoy_rev = 0 THEN 0.0
            ELSE (revenue - yoy_rev) / yoy_rev END + 0.0 AS yoy_growth
FROM seq
ORDER BY month
"""


@query("temporal_period_over_period", oracle=_POP_ORACLE)
def temporal_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: monthly revenue with
    month-over-month and year-over-year growth via positional lags
    over the month spine — the standard finance/ops rollup every BI
    deployment runs on the warehouse. Revenue sums in DECIMAL
    (order-independent), growth ratios are UNROUNDED quotients of the
    same two doubles on both engines (identical IEEE results; a final
    ROUND would reopen the repr-boundary divergence), and NULL lags at
    the spine edges pin to 0.0 on both sides.

    Scale: one month-grain aggregate (map-side combined), then
    windows over the MONTH spine — dozens of rows regardless of fact
    size, so the single-partition lag window is control-plane work."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("revenue"),
    )
    w = Window.orderBy("month")
    seq = monthly.select(
        "month",
        "n_orders",
        "revenue",
        F.lag("revenue", 1).over(w).alias("prev_rev"),
        F.lag("revenue", 12).over(w).alias("yoy_rev"),
    )
    growth = lambda cur, prev: (
        F.when(
            prev.isNull() | (prev == 0), F.lit(0.0)
        ).otherwise((cur - prev) / prev)
        + 0.0
    )
    return seq.select(
        "month",
        "n_orders",
        "revenue",
        (F.coalesce("prev_rev", F.lit(0.0)) + 0.0).alias(
            "prev_month_revenue"
        ),
        growth(F.col("revenue"), F.col("prev_rev")).alias("mom_growth"),
        (F.coalesce("yoy_rev", F.lit(0.0)) + 0.0).alias("year_ago_revenue"),
        growth(F.col("revenue"), F.col("yoy_rev")).alias("yoy_growth"),
    ).orderBy("month")
