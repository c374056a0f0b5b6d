"""TPC-H completion wave — the remaining query shapes (Q2, Q4, Q8,
Q11, Q13, Q15, Q16, Q17, Q20, Q21), adapted to the driver schema.

The reference ships the TPC-H corpus as plan-golden files
(`ql/src/test/queries/clientpositive/perf/query*.q` — SURVEY.md §5);
these are the remaining shapes not covered by tpch.py / tpch_extra.py.
Schema adaptations (driver testdata has no `partsupp`, no
`l_commitdate`/`l_receiptdate`/`l_shipmode`, no comment columns):

- partsupp-based queries (Q2, Q11, Q16, Q20) use **lineitem as the
  part↔supplier association** (supply cost ≈ min unit price observed,
  avail qty ≈ shipped qty) — identical join/subquery shapes, different
  fact table.
- "late" (Q4, Q21) = shipped more than N days after `o_orderdate`
  instead of receipt-vs-commit.

Every query keeps the ORIGINAL's plan-shape signature (the thing the
reference's optimizer chapters exercise): correlated scalar subqueries
(Q2, Q17), EXISTS/NOT EXISTS (Q4, Q21), 8-table snowflake with
conditional share (Q8), HAVING against a global scalar (Q11), left
outer + double aggregation (Q13), view + scalar max (Q15), NOT IN +
count-distinct (Q16), nested semi-joins (Q20).

Scale notes (100 TB): all correlated subqueries decorrelate to
joins/semi-joins (Catalyst RewriteCorrelatedScalarSubquery /
RewritePredicateSubquery ≙ HiveSubQueryRemoveRule + HiveRelDecorrelator
— SURVEY.md §4.1b); dims broadcast; fact-fact joins shuffle on keys
with AQE skew handling. No driver-side collect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hive_service_spark.catalog import load
from hive_service_spark.registry import persisted, query


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --- Q2: minimum-cost supplier (correlated scalar subquery) -----------------

_Q2_ORACLE = """
WITH assoc AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name,
       p_partkey, p_type, a.unit_cost
FROM part, supplier s, assoc a, nation, region
WHERE p_partkey = a.l_partkey AND s_suppkey = a.l_suppkey
  AND s.s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  AND a.unit_cost = (
    SELECT MIN(a2.unit_cost)
    FROM assoc a2, supplier s2, nation n2, region r2
    WHERE a2.l_partkey = p_partkey AND a2.l_suppkey = s2.s_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated scalar-min subquery), supply cost
    adapted to min observed unit price per (part, supplier) from
    lineitem. Expressed as a window-min over the EU association — the
    decorrelated form Catalyst/HiveRelDecorrelator would produce —
    so the part only shuffles once on l_partkey. Fixed-size dims
    (nation/region) broadcast by hint; sf-scaled frames (part,
    supplier) are left to AQE + the broadcast threshold, which still
    picks broadcast at test sfs but degrades safely to shuffle join at
    100 TB instead of OOMing executors (round-6 advice #4)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    assoc = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_assoc = assoc.join(eu_supp, assoc.l_suppkey == eu_supp.s_suppkey)
    w = Window.partitionBy("l_partkey")
    best = eu_assoc.withColumn("min_cost", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        # no ROUND here: both engines derive unit_cost from the same
        # IEEE doubles (min of identical divisions → identical bits);
        # ROUND(x, 4) flaps on half-ulp ties (26.24125 → .2412 vs
        # .2413 across engines) while raw doubles hash identically.
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- Q4: order priority checking (EXISTS) -----------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o.o_orderkey
      AND l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join ("order has
    at least one line shipped >90 days after order date", the schema's
    analog of commit<receipt lateness). The semi join carries the
    non-equi correlation (l_shipdate > o_orderdate + 90d) as a join
    residual — exactly how the reference plans EXISTS after
    HiveSubQueryRemoveRule (SURVEY.md §4.1b)."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q8: national market share ----------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         ns.n_name AS supp_nation
  FROM part, lineitem, orders, customer, supplier,
       nation nc, nation ns, region
  WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey AND l_suppkey = s_suppkey
    AND c_nationkey = nc.n_nationkey AND nc.n_regionkey = r_regionkey
    AND s_nationkey = ns.n_nationkey
    AND r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) t
GROUP BY o_year
ORDER BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: the widest snowflake in the suite (7 joins) with a
    conditional-share aggregate. The snowflake arms are COLLAPSED
    OFF THE FACT PATH first (reference: Hive's join-reorder does the
    same via star-schema detection, SURVEY.md §4.1a): region⋈nation⋈
    customer reduces to a one-column AMERICA-customer key set, and
    supplier⋈nation to (s_suppkey, supp_nation) — tiny dim⋈dim
    broadcast joins that run once. The fact stream (lineitem) then
    passes through only FOUR joins — part, supplier-dim, orders
    (the one big shuffle pair), customer-dim — instead of seven;
    fewer per-row probes AND fewer broadcast builds, which round-2
    benchmarking showed dominate this query's wall-clock on slow
    hosts. The same nation table joins twice (customer side, supplier
    side) — alias discipline mirrors the reference's QBJoinTree."""
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(_ts("1995-01-01"), _ts("1996-12-31"))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nc = load(spark, sf_dir, "nation").alias("nc")
    ns = load(spark, sf_dir, "nation").alias("ns")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    # snowflake arms, collapsed once off the fact path
    cust_am = (
        cust.join(
            F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey")
        )
        .join(
            F.broadcast(region),
            F.col("nc.n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nat = supp.join(
        F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey")
    ).select("s_suppkey", F.col("ns.n_name").alias("supp_nation"))
    # reduce ORDERS before the one big shuffle pair, not after: the
    # AMERICA-customer key set (c_custkey is unique, so the inner join
    # is a semi-filter that cannot duplicate) cuts the orders side to
    # region-fraction x date-fraction of the table, and only
    # (o_orderkey, o_year) survive the projection — the fact⋈orders
    # shuffle then moves ~6% of the rows the round-5 plan moved
    # (round-5 advice #8)
    orders_am = orders.join(
        cust_am, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    t = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders_am, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_year",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    share_num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(0.0)
    )
    return (
        t.groupBy("o_year")
        .agg(F.round(share_num / F.sum("volume"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


# --- Q11: important stock (HAVING vs global scalar) -------------------------

_Q11_ORACLE = """
WITH stock AS (
  SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS value
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, ROUND(value, 2) AS value
FROM stock
WHERE value > (SELECT SUM(value) * 0.002 FROM stock)
ORDER BY value DESC, p_partkey
"""


@query("q11_important_stock", oracle=_Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value filtered against a global
    scalar aggregate of the same derived table (HAVING > SELECT SUM).
    The derived `stock` frame is computed once and reused for both the
    per-part values and the global threshold via a broadcast
    cross-join of the 1-row total — at 100 TB the alternative
    (recompute in a scalar subquery) doubles the fact scan.

    Threshold fraction 0.002 is tuned so the filter passes rows at
    sf0.01 (TPC-H's 0.005 leaves it empty against this data's flatter
    per-part value distribution)."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    stock = persisted(
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    total = stock.agg((F.sum("value") * 0.002).alias("threshold"))
    return (
        stock.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


# --- Q13: customer order-count distribution ---------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left outer join (keeping order-less customers with
    count 0) + two-level aggregation — the histogram-of-counts shape.
    COUNT(o_orderkey) counts non-null keys only, which is what makes
    the outer join's null rows land in bucket 0; the priority filter
    rides in the JOIN condition, not WHERE (moving it to WHERE would
    silently turn the join inner — the classic outer-join trap the
    reference's ppd pass must also respect)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cond, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q15: top supplier (view + scalar max) ----------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view + scalar-max subquery. The view is
    computed once (persist) and its 1-row max is broadcast back — the
    decorrelated plan; a window max over an unpartitioned frame would
    funnel everything to one task, so the agg+broadcast form is the
    scale-correct one."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = persisted(
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --- Q16: parts/supplier relationship (NOT IN + count distinct) -------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_parts_supplier", oracle=_Q16_ORACLE)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN (→ left-anti join; negative-balance
    suppliers stand in for the original's complaint-comment filter) +
    COUNT(DISTINCT) per group. The excluded-supplier set and filtered
    part are sf-scaled, so broadcast is AQE's call (it still chooses
    BHJ at test sfs — plan-pinned); distinct-agg plans as Catalyst's
    two-phase distinct expansion (≙ HiveExpandDistinctAggregatesRule)."""
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    li = load(spark, sf_dir, "lineitem")
    bad_supp = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        li.join(
            bad_supp.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- Q17: small-quantity-order revenue (correlated scalar avg) --------------

_Q17_ORACLE = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


@query("q17_small_quantity", oracle=_Q17_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar AVG per part, decorrelated to an
    aggregate-then-join (the exact plan HiveRelDecorrelator /
    Catalyst's RewriteCorrelatedScalarSubquery emit): per-part averages
    computed once over the full lineitem, joined back (strategy left
    to AQE — the per-part frame is O(part), not fixed-size), then
    the quantity filter. Note the avg is over ALL lineitem for the
    part, not just Brand#3 rows — matching the subquery's scope."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    brand_li = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
    avgs = (
        li.join(
            part.select("p_partkey"),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((0.5 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        brand_li.join(
            avgs, F.col("l_partkey") == F.col("avg_partkey")
        )
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --- Q20: potential part promotion (nested semi-joins) ----------------------

_Q20_ORACLE = """
SELECT s_name, n_name
FROM supplier, nation
WHERE s_nationkey = n_nationkey
  AND n_name IN ('NATION_3', 'NATION_11')
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(l_quantity) > 50
  )
ORDER BY s_name
"""


@query("q20_promotion_suppliers", oracle=_Q20_ORACLE)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries → chained semi-joins.
    Suppliers who moved >50 units of some PROMO part in 1996 (the
    schema's analog of ps_availqty > half the year's shipments),
    restricted to two nations. The inner aggregate runs on the pruned
    lineitem scan; its distinct supplier set is data-dependent
    (O(supplier) worst case), so the semi-join strategy is AQE's call
    rather than a forced broadcast."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    heavy = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_11")
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            heavy,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# --- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) -----------

_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_2'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3, orders o3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND o3.o_orderkey = l3.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("q21_suppliers_waiting", oracle=_Q21_ORACLE)
def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: the EXISTS + NOT EXISTS double-correlation ("this
    supplier shipped late AND some other supplier is on the order AND
    no other supplier shipped late"), with lateness = >60 days after
    o_orderdate. Decorrelated per-order with window counts over ONE
    shuffle on l_orderkey: n_supp (distinct suppliers on the order) and
    n_late_supp (distinct late suppliers) replace both subqueries —
    strictly better at 100 TB than two extra self-joins of the largest
    fact table."""
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    tagged = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ).cast("int"),
    )
    w = Window.partitionBy("l_orderkey")
    annotated = (
        tagged.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late") == 1, F.col("l_suppkey"))
                ).over(w)
            ),
        )
    )
    waiting = annotated.where(
        (F.col("is_late") == 1)
        & (F.col("n_supp") > 1)
        & (F.col("n_late_supp") == 1)
    )
    return (
        waiting.join(
            supp.join(
                F.broadcast(nation),
                F.col("s_nationkey") == F.col("n_nationkey"),
            ).select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# --- Q22: global sales opportunity (scalar avg + NOT EXISTS anti-join) ------

_Q22_ORACLE = """
WITH eligible AS (
  SELECT c_custkey, c_acctbal, c_nationkey % 10 AS cntrycode
  FROM customer
  WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5, 6, 7)
),
cutoff AS (
  SELECT AVG(c_acctbal) AS avg_bal FROM eligible WHERE c_acctbal > 0.00
)
SELECT cntrycode,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM eligible e, cutoff
WHERE e.c_acctbal > cutoff.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = e.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("q22_global_sales_opportunity", oracle=_Q22_ORACLE)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (reference perf corpus
    `ql/src/test/queries/clientpositive/perf/query*.q` — SURVEY.md §5):
    customers in a country-code set with above-average positive balance
    and NO urgent orders. Driver testdata has no c_phone, so
    cntrycode = c_nationkey % 10, and every testdata customer has at
    least one order, so "no orders" is adapted to "no 1-URGENT order"
    (same IN-list + scalar-avg + NOT EXISTS plan signature, non-empty
    answer). Spark-first decorrelation: the positive-balance average
    is a 1-row aggregate broadcast via crossJoin (map-side partial agg,
    no full shuffle of customer), and NOT EXISTS becomes a left_anti
    join against the o_custkey projection — at 100 TB that anti-join
    shuffles both sides once on custkey; customer never shuffles twice."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    eligible = cust.select(
        "c_custkey",
        "c_acctbal",
        (F.col("c_nationkey") % 10).alias("cntrycode"),
    ).where(F.col("cntrycode").isin(1, 2, 3, 4, 5, 6, 7))
    cutoff = eligible.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = eligible.crossJoin(F.broadcast(cutoff)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = rich.join(
        orders.select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return (
        no_orders.groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
