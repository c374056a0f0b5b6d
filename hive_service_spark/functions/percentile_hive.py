"""Hive-parity ``percentile_approx`` — the NumericHistogram quantile.

Reference surface (SURVEY.md §2.3): Hive's ``GenericUDAFPercentileApprox``
[jar: hive-exec!ql/udf/generic/GenericUDAFPercentileApprox.class] does
NOT use Spark's ApproximatePercentile sketch — it builds a Ben-Haim &
Tom-Tov streaming ``NumericHistogram`` of ``nbins`` (x, y) centroids and
answers quantile(q) by linear interpolation between adjacent centroids:

    csum = cumulative y up to the first bin where csum/sum >= q
    r    = x[b-1] + (q*sum - csum_before_b) * (x[b] - x[b-1]) / y[b]
    (first bin: r = x[0])

That formula is why Hive and Spark report different percentile_approx
values on the same data (the SURVEY §2.3 parity gap). This module
implements Hive's algorithm Spark-first, distributed end-to-end:

- the histogram is a groupBy count per (group, value) — when
  nbins >= NDV the BT histogram never merges centroids, so the exact
  per-value histogram IS the Hive histogram and the whole computation
  is deterministic and oracle-checkable (the regime the query runs in);
- the interpolation is window cumulative sums + one filter + one
  row_number per quantile — no collect, no UDF, pure codegen.

At 100 TB: shuffle size is |groups| × NDV(value), not row count; for
continuous columns you'd bucket values first (that bucketing IS the
centroid-merge step, made explicit and deterministic instead of
merge-order-dependent).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hive_service_spark.catalog import load
from hive_service_spark.registry import query


def percentile_approx_hive(
    df: DataFrame, key: str, value: str, quantiles: list[float]
) -> DataFrame:
    """Hive NumericHistogram.quantile per ``key`` group, one output row
    per (key, q): columns (key, q, p_hive)."""
    hist = df.groupBy(key, value).agg(F.count("*").cast("double").alias("y"))
    w = Window.partitionBy(key).orderBy(value)
    wp = Window.partitionBy(key)
    hist = (
        hist.withColumn("csum", F.sum("y").over(w))
        .withColumn("total", F.sum("y").over(wp))
        .withColumn("prev_x", F.lag(value).over(w))
        .withColumn("prev_csum", F.col("csum") - F.col("y"))
    )
    qdf = df.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    # first bin where csum/total >= q, per (key, q)
    cand = hist.join(F.broadcast(qdf), F.col("csum") / F.col("total") >= F.col("q"))
    wq = Window.partitionBy(key, "q").orderBy(value)
    first = cand.withColumn("rn", F.row_number().over(wq)).where(F.col("rn") == 1)
    interp = F.when(F.col("prev_x").isNull(), F.col(value)).otherwise(
        F.col("prev_x")
        + (F.col("q") * F.col("total") - F.col("prev_csum"))
        * (F.col(value) - F.col("prev_x"))
        / F.col("y")
    )
    return first.select(key, "q", interp.alias("p_hive"))


_PA_HIVE_ORACLE = """
WITH hist AS (
  SELECT l_returnflag, l_quantity AS x, COUNT(*)::DOUBLE AS y
  FROM lineitem GROUP BY l_returnflag, l_quantity
),
cum AS (
  SELECT l_returnflag, x, y,
         SUM(y) OVER (PARTITION BY l_returnflag ORDER BY x) AS csum,
         SUM(y) OVER (PARTITION BY l_returnflag) AS total,
         LAG(x) OVER (PARTITION BY l_returnflag ORDER BY x) AS prev_x
  FROM hist
),
qs AS (SELECT UNNEST([0.25, 0.5, 0.75, 0.95])::DOUBLE AS q),
cand AS (
  SELECT c.*, q.q,
         ROW_NUMBER() OVER (PARTITION BY c.l_returnflag, q.q ORDER BY c.x)
           AS rn
  FROM cum c JOIN qs q ON c.csum / c.total >= q.q
)
SELECT l_returnflag, q,
       ROUND(CASE WHEN prev_x IS NULL THEN x
             ELSE prev_x + (q * total - (csum - y)) * (x - prev_x) / y
             END, 4) AS p_hive
FROM cand WHERE rn = 1
ORDER BY l_returnflag, q
"""


@query("agg_percentile_approx_hive", oracle=_PA_HIVE_ORACLE)
def agg_percentile_approx_hive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx with HIVE's sketch semantics (not Spark's),
    run in the exact regime (l_quantity has ~50 distinct values <
    nbins, so the BT histogram is the per-value count table and the
    answer is deterministic). The oracle replays the same NumericHistogram
    interpolation in SQL — matching values prove this is Hive's
    algorithm, closing the SURVEY §2.3 percentile_approx parity gap."""
    li = load(spark, sf_dir, "lineitem")
    out = percentile_approx_hive(
        li, "l_returnflag", "l_quantity", [0.25, 0.5, 0.75, 0.95]
    )
    return out.select(
        "l_returnflag", "q", F.round("p_hive", 4).alias("p_hive")
    ).orderBy("l_returnflag", "q")
