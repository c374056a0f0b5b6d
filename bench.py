"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": "..."}

Each query is forced end-to-end with a noop write (full computation on
the executors, no driver-side row transfer), which is how a cluster
deployment would be measured. Run: python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_service_spark.registry import load_all  # noqa: E402
from hive_service_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, heaviest variants.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "agg_multi_distinct",
    "agg_rollup",
    "window_ranking",
    "window_rows_frame",
    "join_theta_residual",
    "setop_except_all",
    "explode_word_count",
    "q8_market_share",
    "q9_product_profit",
    "q18_large_volume_customer",
    "q21_suppliers_waiting",
    "q22_global_sales_opportunity",
    "opt_runtime_bloom_filter",
    "temporal_asof_join",
    "seq_sessionize_batch",
    "skew_salted_replicated_join",
    "part_dynamic_partition_pruning",
    "mv_rewrite_rollup",
    "agg_ewah_bitmap_ops",
    "cte_recursive_org_rollup",
    "graph_pagerank_cosupply",
    # LLM-pipeline extensions
    "dedup_minhash_lsh",
    "pipeline_clean_corpus",
    "dedup_ngram_jaccard",
    "text_quality_scores",
    "knn_cosine_bruteforce",
    "ann_lsh_hyperplane",
    "ann_ivf_kmeans",
    "dedup_semdedup_cells",
    "mm_feature_extract",
]


def main() -> None:
    specs = load_all()
    spark = get_session("hive_service_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM + file-listing warmup (not counted)
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in specs:
            continue
        # one warmup run (uncounted) then two measured runs, keep the
        # min: single-JVM local mode has 2-15x run-to-run JIT-deopt /
        # codegen-compilation noise on the array-heavy queries; the best
        # warm number is the one that models steady-state executors on a
        # cluster, where generated code is compiled once and reused
        # across thousands of tasks.
        samples = []
        for measured in (False, True, True):
            # time fn() + the sink action: declarative queries only
            # build a plan in fn() (sub-ms), but the iterative ones
            # (k-means, PageRank) run their loop jobs inside fn() —
            # starting the clock after fn() would hide that work.
            t0 = time.perf_counter()
            df = specs[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            if measured:
                samples.append(time.perf_counter() - t0)
            # drop persisted frames between runs so each run is standalone
            # and a cache-heavy query doesn't inflate later ones via
            # storage-memory eviction/GC pressure (measured: 3-10x tails)
            spark.catalog.clearCache()
        times[name] = round(min(samples), 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
