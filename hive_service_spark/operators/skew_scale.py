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
from pyspark.sql import DataFrame, SparkSession, Window

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


# --- hot-key quarantine: the upstream bot-key drop, as an operator ----------


def quarantine_hot_keys(
    df: DataFrame,
    key: str = "user_id",
    max_share: float | tuple[int, int] = 0.01,
    min_rows: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (clean, hot_keys): keys owning more than
    ``max_share`` of all rows are routed OUT of the stream before any
    per-key-ORDER operator sees them (round 12, verdict #2 — the
    engine-side answer the 50%/90%-ownership skew tables keep
    recommending: "at a true bot key the fix is dropping the key
    upstream"). This is the reference's skew philosophy —
    SkewJoinOptimizer / GenMRSkewJoinProcessor (hive-exec-2.3.10-core
    .jar!ql/optimizer/physical/) route skewed keys into a separate
    physical job — applied to the per-key window/sequence operators
    AQE's skew-join splitting cannot help (a window partition is
    unsplittable).

    Shape, and why it scales: ONE map-side-combined groupBy(key)
    produces the per-key counts (the only full-data pass); the total
    is a 1-row aggregate over those counts, broadcast back. By
    construction at most floor(1/max_share) keys can exceed the share,
    so the hot set is always tiny and BROADCASTABLE — the clean-stream
    filter is a broadcast anti-join, no second shuffle of the corpus.
    ``min_rows`` is an optional absolute floor (a key must also own at
    least this many rows) so a small-sample share blip cannot
    quarantine a legitimate key; at 100 TB the share term dominates.
    ``max_share`` also accepts an exact rational ``(num, den)`` —
    share > num/den evaluated as ``n * den > total * num`` in
    BIGINT-exact arithmetic (round-12 ADVICE: a float threshold
    multiplies the total in IEEE double, so a key landing EXACTLY on
    the boundary could flip between engines computing the product in
    double vs decimal; the rational form removes the boundary
    entirely, and a testdata regeneration moves both the operator and
    any oracle together).
    The anti-join is NULL-SAFE on the key: missing-id traffic (a
    classic bot signature) is a quarantinable key like any other.

    Returns ``(clean, hot)`` where ``hot`` has (key, n_rows,
    row_share), so the quarantined keys stay auditable instead of
    silently vanishing. The count lineage is embedded in BOTH outputs:
    a pipeline that materializes clean AND hot in separate actions
    runs the per-key count twice — persist ``hot`` (tiny by
    construction) between them to pay the count pass once; the
    registered demos each consume a single output, so they don't."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("__qk_n"))
    total = counts.agg(F.sum("__qk_n").alias("__qk_total"))
    if isinstance(max_share, tuple):
        if len(max_share) != 2:
            raise ValueError(
                f"quarantine_hot_keys: rational max_share must be "
                f"(num, den), got {max_share!r}"
            )
        num, den = (int(x) for x in max_share)
        if num <= 0 or den <= 0:
            raise ValueError(
                f"quarantine_hot_keys: rational max_share must be "
                f"positive, got {max_share!r}"
            )
        cond = F.col("__qk_n") * F.lit(den) > F.col("__qk_total") * F.lit(num)
    else:
        cond = F.col("__qk_n") > F.col("__qk_total") * F.lit(max_share)
    if min_rows is not None:
        cond = cond & (F.col("__qk_n") >= F.lit(min_rows))
    hot = (
        counts.crossJoin(F.broadcast(total))
        .where(cond)
        .select(
            key,
            F.col("__qk_n").cast("bigint").alias("n_rows"),
            (F.col("__qk_n") / F.col("__qk_total")).alias("row_share"),
        )
    )
    clean = df.join(
        F.broadcast(hot.select(F.col(key).alias("__qk_key"))),
        df[key].eqNullSafe(F.col("__qk_key")),
        "left_anti",
    )
    return clean, hot


# demo thresholds: on the near-uniform test events (150 users at
# sf0.01, ~0.67% each) share > 0.8% = 1/125 marks the heaviest handful
# of users; the absolute floor keeps the tiny sf0.001 sample (15 users,
# ~6.7% each) from quarantining everyone. A real pipeline tunes both
# to its bot threshold; the synthetic 50%/90%-ownership probe
# (tools/scale_probe.py) is where a true bot key exists. The share is
# the RATIONAL 1/125, not the float 0.008 (round-12 ADVICE): both the
# operator and the oracles compare n*125 > total in BIGINT-exact
# arithmetic, so a key exactly at the boundary cannot flip between
# Spark's double and DuckDB's decimal, and a testdata regeneration
# moves both sides identically.
_QK_MAX_SHARE = (1, 125)  # share > 1/125 = 0.8%
_QK_MIN_ROWS = 80

_QUARANTINE_AUDIT_ORACLE = f"""
WITH c AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
),
t AS (SELECT SUM(n) AS total FROM c)
SELECT c.user_id,
       CAST(c.n AS BIGINT) AS n_rows,
       c.n * 1.0 / t.total AS row_share
FROM c, t
WHERE c.n * {_QK_MAX_SHARE[1]} > t.total * {_QK_MAX_SHARE[0]}
  AND c.n >= {_QK_MIN_ROWS}
ORDER BY user_id
"""


@query("skew_quarantine_audit", oracle=_QUARANTINE_AUDIT_ORACLE)
def skew_quarantine_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine operator's audit side: which keys own more than
    the share threshold (0.8%, with the 80-row floor), how many rows,
    what share. One map-side-combined groupBy + a broadcast 1-row
    total — the only full-data pass this query makes."""
    ev = load(spark, sf_dir, "events")
    _clean, hot = quarantine_hot_keys(
        ev, "user_id", _QK_MAX_SHARE, _QK_MIN_ROWS
    )
    return hot.orderBy("user_id")


_SESSION_QUARANTINED_ORACLE = f"""
WITH c AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
),
t AS (SELECT SUM(n) AS total FROM c),
hot AS (
  SELECT c.user_id FROM c, t
  WHERE c.n * {_QK_MAX_SHARE[1]} > t.total * {_QK_MAX_SHARE[0]}
    AND c.n >= {_QK_MIN_ROWS}
),
f AS (
  -- NOT EXISTS with IS NOT DISTINCT FROM, not NOT IN: the operator's
  -- anti-join is null-safe (a NULL key is quarantinable), and NOT IN
  -- against a hot set containing NULL would empty the whole stream
  -- (round-12 review)
  SELECT * FROM events e
  WHERE NOT EXISTS (
    SELECT 1 FROM hot h WHERE h.user_id IS NOT DISTINCT FROM e.user_id
  )
),
g AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess,
         event_id
  FROM f
),
s AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_no
  FROM g
)
SELECT user_id, session_no,
       COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) AS TIMESTAMP) AS session_end,
       ROUND(SUM(value), 2) AS session_value
FROM s
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


@query("seq_sessionize_quarantined", oracle=_SESSION_QUARANTINED_ORACLE)
def seq_sessionize_quarantined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization composed BEHIND the hot-key quarantine (round
    12, verdict #2's demo): quarantine_hot_keys routes bot-share keys
    out, then the standard gap sessionization runs on the clean
    stream. Contrast with seq_sessionize_capped: the budget TRUNCATES
    a hot key's tail but still walks its history once inside the
    capping window (the measured ownership-linear floor in SCALE.md's
    90% table); the quarantine never lets the hot key reach the
    window exchange at all — the broadcast anti-join drops it at scan
    time, so the per-key sort sees only clean keys and the pipeline
    cost is flat in the hot key's ownership. The quarantined keys land
    in the audit output (skew_quarantine_audit), not the void."""
    ev = load(spark, sf_dir, "events")
    clean, _hot = quarantine_hot_keys(
        ev, "user_id", _QK_MAX_SHARE, _QK_MIN_ROWS
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap in MICROseconds (round-13 review): cast('long') truncates to
    # whole seconds while the oracle compares full-microsecond
    # intervals — a true gap in (1800, 1801)s with frac(t2) > frac(t1)
    # would start a session in DuckDB but not here. unix_micros is the
    # exact integer both engines agree on.
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = clean.withColumn("new_sess", new_sess).withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_no")
    )


# import-time budget shared with the capped operators (cycle-safe:
# sequence_analytics never imports this module)
from hive_service_spark.operators.sequence_analytics import (  # noqa: E402
    _USER_EVENT_CAP as _QK_CAP,
    capped_user_prefix as _qk_capped_prefix,
)

_SESSION_GUARDED_ORACLE = f"""
WITH c0 AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
),
t AS (SELECT SUM(n) AS total FROM c0),
hot AS (
  SELECT c0.user_id FROM c0, t
  WHERE c0.n * {_QK_MAX_SHARE[1]} > t.total * {_QK_MAX_SHARE[0]}
    AND c0.n >= {_QK_MIN_ROWS}
),
f AS (
  SELECT * FROM events e
  WHERE NOT EXISTS (
    SELECT 1 FROM hot h WHERE h.user_id IS NOT DISTINCT FROM e.user_id
  )
),
r AS (
  SELECT user_id, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_total
  FROM f
),
cp AS (SELECT * FROM r WHERE rn <= {_QK_CAP}),
g AS (
  SELECT user_id, ts, value, n_total,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess,
         event_id
  FROM cp
),
s AS (
  SELECT user_id, ts, value, n_total,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_no
  FROM g
)
SELECT user_id, session_no,
       COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) AS TIMESTAMP) AS session_end,
       ROUND(SUM(value), 2) AS session_value,
       CAST(MAX(CASE WHEN n_total > {_QK_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS user_capped
FROM s
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


@query("seq_sessionize_guarded", oracle=_SESSION_GUARDED_ORACLE)
def seq_sessionize_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Defense in depth: quarantine THEN cap THEN sessionize — the
    full production guard stack for per-key-ORDER operators in one
    pipeline. quarantine_hot_keys drops keys owning a bot-level share
    of all rows (the upstream fix the skew tables recommend — their
    history never reaches the window exchange); capped_user_prefix
    then bounds the LEGITIMATE heavy tail to the per-user budget and
    stamps user_capped; gap sessionization runs on what survives.
    Scale story: one map-side-combined count + broadcast anti-join
    (quarantine), then ONE hash exchange on user_id shared by the
    capping window, the session windows, and the final aggregate —
    the quarantined bot key costs nothing downstream, and every
    surviving key is <= budget rows after the one capping pass."""
    ev = load(spark, sf_dir, "events")
    clean, _hot = quarantine_hot_keys(
        ev, "user_id", _QK_MAX_SHARE, _QK_MIN_ROWS
    )
    capped = _qk_capped_prefix(clean, _QK_CAP)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap in MICROseconds (round-13 review): cast('long') truncates to
    # whole seconds while the oracle compares full-microsecond
    # intervals — a true gap in (1800, 1801)s with frac(t2) > frac(t1)
    # would start a session in DuckDB but not here. unix_micros is the
    # exact integer both engines agree on.
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = capped.withColumn("new_sess", new_sess).withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.max("user_capped").alias("user_capped"),
        )
        .orderBy("user_id", "session_no")
    )
