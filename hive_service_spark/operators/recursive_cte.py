"""Recursive CTEs (``WITH RECURSIVE``) — iterative set computation.

The reference has no recursive queries: Hive 2.3's CTE support
(`hive-exec!org/apache/hadoop/hive/ql/parse/QBExpr` + the CTE handling
in `SemanticAnalyzer`, SURVEY.md §2.6) is strictly non-recursive, and
hierarchy walks there are done by unrolling a fixed number of
self-joins by hand. Spark 4 executes ``WITH RECURSIVE`` natively
(Catalyst ``UnionLoop``), so this module registers the two canonical
shapes users unroll by hand on Hive — both oracle-checked, since DuckDB
shares the SQL:2016 recursion semantics:

- calendar densification (a date spine left-joined to daily facts, so
  zero-activity days appear), and
- a hierarchy walk (chase parent pointers to the root, then roll up).

Scale notes (100 TB): recursion here is driver-COORDINATED, not
driver-computed — each iteration is a distributed step over the
previous iteration's frame. Depth is what matters: the date spine's
depth is the calendar span (bounded by the window we densify, never by
data volume) and the hierarchy depth is log10(max key) ≈ 6 at any
scale factor, so both loops run a handful of distributed iterations
regardless of input size. The per-iteration frames stay tiny (one row
per day / one row per live chain), and the single big join against the
fact table is an ordinary shuffle join that Catalyst plans after the
loop completes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.registry import query

_SPINE_ORACLE = """
WITH RECURSIVE spine(d) AS (
  SELECT DATE '1997-01-01'
  UNION ALL
  SELECT d + INTERVAL 1 DAY FROM spine WHERE d < DATE '1997-06-30'
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         COUNT(*) AS n_orders,
         ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-07-01'
  GROUP BY 1
)
SELECT CAST(s.d AS VARCHAR) AS day,
       CAST(COALESCE(y.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(y.revenue, 0) AS DOUBLE) AS revenue
FROM spine s LEFT JOIN daily y ON s.d = y.d
"""


@query("cte_recursive_date_spine", oracle=_SPINE_ORACLE)
def cte_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: a recursive date spine (H1 1997, 181
    iterations) LEFT JOINed to daily order aggregates so days with no
    orders appear with zero counts — the classic gap-filling query
    Hive users emulate with a pre-built calendar table. Spark's default
    recursion guard is 100 levels; the spine needs 181, so the limit is
    raised explicitly (the row limit stays at its default — the spine
    is 181 rows total). DATE output is cast to string and the money sum
    is rounded in DECIMAL then cast to DOUBLE, both driver-canon rules."""
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "400")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_rcte")
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
          SELECT DATE '1997-01-01'
          UNION ALL
          SELECT date_add(d, 1) FROM spine WHERE d < DATE '1997-06-30'
        ),
        daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 COUNT(*) AS n_orders,
                 ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS revenue
          FROM orders_rcte
          WHERE o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1997-07-01'
          GROUP BY 1
        )
        SELECT CAST(s.d AS STRING) AS day,
               CAST(COALESCE(y.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(y.revenue, 0) AS DOUBLE) AS revenue
        FROM spine s LEFT JOIN daily y ON s.d = y.d
        """
    )


_HIERARCHY_ORACLE = """
WITH RECURSIVE walk(custkey, node, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT custkey, node // 10, depth + 1 FROM walk WHERE node >= 10
)
SELECT CAST(w.node AS BIGINT)      AS root,
       CAST(COUNT(*) AS BIGINT)    AS n_members,
       CAST(MAX(w.depth) AS BIGINT) AS max_depth,
       CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS total_bal
FROM walk w JOIN customer c ON w.custkey = c.c_custkey
WHERE w.node < 10
GROUP BY w.node
"""


@query("cte_recursive_org_rollup", oracle=_HIERARCHY_ORACLE)
def cte_recursive_org_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy walk + rollup: every customer chases a synthetic
    parent pointer (parent key = key div 10 — a deterministic forest
    whose roots are keys 1..9) to its root, then the forest rolls up
    members, depth, and account balance per root. This is the
    parent-child org/BOM traversal that needs depth-many hand-written
    self-joins on the reference. Depth is log10(max custkey): 6 levels
    at SF100, so iteration count is effectively constant in data size."""
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "400")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_rcte")
    return spark.sql(
        """
        WITH RECURSIVE walk(custkey, node, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer_rcte
          UNION ALL
          SELECT custkey, node div 10, depth + 1 FROM walk WHERE node >= 10
        )
        SELECT CAST(w.node AS BIGINT)       AS root,
               CAST(COUNT(*) AS BIGINT)     AS n_members,
               CAST(MAX(w.depth) AS BIGINT) AS max_depth,
               CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total_bal
        FROM walk w JOIN customer_rcte c ON w.custkey = c.c_custkey
        WHERE w.node < 10
        GROUP BY w.node
        """
    )
