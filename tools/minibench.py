"""Focused re-measurement of specific bench entries with the EXACT
bench.py protocol (noop sink, 1 warmup + min of 2 measured, cache clear
between runs). For optimization-loop iteration only — graded numbers
come from bench.py.

Usage: python tools/minibench.py q1_pricing_summary ml_logreg_quality ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR  # noqa: E402
from hive_service_spark.registry import load_all  # noqa: E402
from hive_service_spark.session import get_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    specs = load_all()
    spark = get_session("hive_service_spark-minibench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    # warm prefix: JIT/codegen warm-up so targets measure like their
    # mid-suite bench position, not a cold JVM (uncounted)
    for warm in ("agg_rollup", "explode_word_count", "q1_pricing_summary"):
        df = specs[warm].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    times = {}
    for name in names:
        samples = []
        for measured in (False, True, True):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            if measured:
                samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        times[name] = round(min(samples), 3)
    print(json.dumps(times))
    spark.stop()


if __name__ == "__main__":
    main()
