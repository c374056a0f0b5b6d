"""two_level_cumsum must equal the plain per-partition running sum.

The helper exists purely for scale (bucket-parallel level 1 instead of
one task per source) — its contract is bit-identical output to
``Window.partitionBy(part).orderBy(order)`` with an inclusive frame,
including on gapped / non-contiguous order keys and parts smaller than
one bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.window import Window

from hive_service_spark.llm.pipeline import two_level_cumsum


def _reference(df, part, order, val):
    w = (
        Window.partitionBy(part)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("cum", F.sum(val).over(w))


def _check(spark, rows, width):
    df = spark.createDataFrame(rows, "src string, doc_id long, v long")
    got = two_level_cumsum(df, "src", "doc_id", "v", out_col="cum", width=width)
    want = _reference(df, "src", "doc_id", "v")
    key = ["src", "doc_id"]
    assert sorted(got.select(*key, "cum").collect()) == sorted(
        want.select(*key, "cum").collect()
    )


def test_matches_plain_window_gapped_ids(spark):
    # ids with gaps, bucket boundaries crossed, one part smaller than
    # a bucket, one empty bucket range in the middle
    rows = [
        ("a", i, (i * 7) % 13 + 1) for i in [0, 1, 5, 7, 8, 9, 31, 64, 65, 200]
    ] + [("b", i, i + 1) for i in [3, 4, 70]]
    _check(spark, rows, width=8)


def test_matches_plain_window_single_bucket(spark):
    # everything inside one bucket -> level 2 offset must be all zero
    rows = [("a", i, 2) for i in range(10)]
    _check(spark, rows, width=1000)


def test_matches_plain_window_width_one(spark):
    # degenerate width=1: every row its own bucket; level 2 does all
    # the work (the fully-serial extreme) — still identical
    rows = [("a", i, i % 5 + 1) for i in range(12)] + [("b", 2, 9)]
    _check(spark, rows, width=1)


# --- property: random gapped ids / widths / multi-part frames ---------
# The helper is load-bearing for two registered queries
# (pipeline_pack_shards, tok_bpe_aware_pack); its bucket-boundary index
# arithmetic is exactly the class hypothesis catches regressions in.
# doc_id is unique per part (the packing contract) — duplicate order
# keys would make BOTH window formulations tie-order-dependent.

_ids_vals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),  # gapped, boundary-heavy
        st.integers(min_value=-50, max_value=100),  # negatives too: cumsum
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@given(
    parts=st.dictionaries(
        st.sampled_from(["a", "b", "c"]), _ids_vals, min_size=1, max_size=3
    ),
    width=st.integers(min_value=1, max_value=64),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # deterministic corpus: CI-stable, still adversarial
)
def test_matches_plain_window_property(spark, parts, width):
    rows = [(p, i, v) for p, ivs in parts.items() for i, v in ivs]
    _check(spark, rows, width=width)
