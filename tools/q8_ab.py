"""q8_market_share plan A/B: pre-reduction vs round-5 shape, measured.

Round-11 verdict (What's wrong #2): q8's host-corrected ratio vs the
round-1 anchor crept 1.60 -> 1.61 -> 1.66-1.85 -> 1.92 across rounds
8-11, always read on jittery boxes. The documented trade-off (PLANS.md
NOTE) is that the registered PRE-REDUCTION shape — orders filtered by
the AMERICA-customer key set BEFORE the lineitem joins orders — costs
~1.25-1.30x locally (every dim join is broadcast at sf0.1, so the
extra orders-side pass is pure overhead) and pays off at scale (the
big shuffle carries region x date fraction of orders; SCALE.md's x8
probe shows at-or-below-linear growth). This tool settles whether the
creep is real: BOTH variants, one warmup + 5 measured repetitions
each, interleaved A/B/A/B so box drift hits both equally, one JSON
line. Run on an IDLE box (see the bench gotchas: never right after a
heavy Spark job).

Usage: python tools/q8_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from hive_service_spark.catalog import load  # noqa: E402
from hive_service_spark.session import get_session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


def _arms(spark):
    part = load(spark, SF, "part").where(F.col("p_type") == "ECONOMY")
    li = load(spark, SF, "lineitem")
    orders = load(spark, SF, "orders").where(
        F.col("o_orderdate").between(_ts("1995-01-01"), _ts("1996-12-31"))
    )
    cust = load(spark, SF, "customer")
    supp = load(spark, SF, "supplier")
    nc = load(spark, SF, "nation").alias("nc")
    ns = load(spark, SF, "nation").alias("ns")
    region = load(spark, SF, "region").where(F.col("r_name") == "AMERICA")
    cust_am = (
        cust.join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .join(F.broadcast(region), F.col("nc.n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nat = supp.join(
        F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey")
    ).select("s_suppkey", F.col("ns.n_name").alias("supp_nation"))
    return part, li, orders, cust_am, supp_nat


def _agg(t):
    share_num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(0.0)
    )
    return (
        t.groupBy("o_year")
        .agg(F.round(share_num / F.sum("volume"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


def q8_pre_reduction(spark):
    """The registered shape: orders joined to the AMERICA customer set
    BEFORE the lineitem joins orders (round-6; operators/tpch_more.py)."""
    part, li, orders, cust_am, supp_nat = _arms(spark)
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
    return _agg(t)


def q8_post_reduction(spark):
    """The round-5 shape: the fact stream joins the date-filtered
    orders first; the AMERICA customer filter lands AFTER the big
    shuffle pair."""
    part, li, orders, cust_am, supp_nat = _arms(spark)
    t = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select(
                "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_am, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_year",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return _agg(t)


def main() -> None:
    spark = get_session("q8-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/nation.parquet").count()
    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = None

    variants = {"pre_reduction": q8_pre_reduction, "post_reduction": q8_post_reduction}
    # answers must agree before the times mean anything — compared
    # with a float tolerance, not rounded equality: the two join
    # orders accumulate the double sums differently, and round(x, 6)
    # can split a value straddling a 0.5e-6 boundary (round-12 review)
    a = {r["o_year"]: r["mkt_share"] for r in q8_pre_reduction(spark).collect()}
    b = {r["o_year"]: r["mkt_share"] for r in q8_post_reduction(spark).collect()}
    assert a.keys() == b.keys(), "variants disagree on years"
    for y in a:
        assert abs(a[y] - b[y]) <= 1e-6, f"variants disagree at {y}: {a[y]} vs {b[y]}"

    samples: dict[str, list[float]] = {k: [] for k in variants}
    # one uncounted warmup each, then 5 measured reps, interleaved
    for rep in range(6):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if rep:
                samples[name].append(round(dt, 3))
            spark.catalog.clearCache()

    stats = {
        name: {
            "samples": vals,
            "min": min(vals),
            "median": round(statistics.median(vals), 3),
        }
        for name, vals in samples.items()
    }
    ratio = round(
        stats["pre_reduction"]["median"] / stats["post_reduction"]["median"], 3
    )
    print(
        json.dumps(
            {
                "q8_ab": stats,
                "pre_over_post_median": ratio,
                "sf": SF,
                "loadavg_start": loadavg,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
