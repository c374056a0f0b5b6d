"""Data-selection operators (llm/selection.py): plan shapes + the
invariants the DuckDB oracle can't phrase.

Values are covered by the registered oracles (pipeline_dsir_importance,
text_zipf_fit, text_cms_heavy_hitters all hash-match DuckDB). These
tests pin what matters at 100 TB: the DSIR selection is a distributed
top-K (never a global-window sort of the corpus), its model broadcasts,
the CMS probe never goes cartesian, and the CMS no-undercount guarantee
holds for EVERY probed word, not just the pinned testdata.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hive_service_spark.plans import inspect as P
from hive_service_spark.registry import load_all
from tests.conftest import SF_DIR

_SPECS = load_all()


def _df(spark, name):
    return _SPECS[name].fn(spark, SF_DIR)


def test_dsir_topk_is_take_ordered_not_global_window(spark):
    """The K-row selection must be TakeOrderedAndProject (distributed
    top-K); the rank window runs AFTER the K-row cut, so no stage
    sorts the full per-doc score frame in one partition."""
    plan = P.formatted_plan(_df(spark, "pipeline_dsir_importance"))
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_dsir_model_broadcasts(spark):
    """Scoring joins the 256-row log-ratio model by broadcast — the
    corpus-side feature stream must never shuffle on the bucket id."""
    plan = P.formatted_plan(_df(spark, "pipeline_dsir_importance"))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "CartesianProduct" not in plan


def test_dsir_output_bounded_at_any_sf(spark):
    """|selected| <= K by construction — the scale contract that keeps
    downstream work independent of corpus growth."""
    from hive_service_spark.llm.selection import _DSIR_K

    rows = _df(spark, "pipeline_dsir_importance").collect()
    assert 0 < len(rows) <= _DSIR_K
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_cms_probe_no_cartesian(spark):
    plan = P.formatted_plan(_df(spark, "text_cms_heavy_hitters"))
    assert "CartesianProduct" not in plan, plan[:3000]


def test_cms_never_undercounts(spark):
    """The count-min invariant (est >= exact) must hold for every
    probed word — the sketch is only correct if the per-row minimum is
    taken over genuinely superset counters."""
    rows = _df(spark, "text_cms_heavy_hitters").collect()
    assert rows
    for r in rows:
        assert r["no_undercount"] and r["overcount"] >= 0, r
        assert r["est_cnt"] == r["exact_cnt"] + r["overcount"]


def test_zipf_slope_is_negative_with_enough_points(spark):
    """Zipf slope of natural-ish text is negative on every language
    (the synthetic corpus has a small vocabulary, so the fit runs on
    min(n_types, R) points — assert it's non-degenerate)."""
    rows = _df(spark, "text_zipf_fit").collect()
    assert rows
    for r in rows:
        assert r["zipf_slope"] < 0, r
        assert r["n_types"] >= 3, r  # >= 3 points: a real regression


def test_zipf_regression_matches_numpy(spark):
    """The integer-moment regression must agree with a float
    least-squares fit on the same quantized points (guards against a
    moment-algebra slip the oracle would faithfully replicate)."""
    import numpy as np

    from hive_service_spark.catalog import load
    from hive_service_spark.llm.selection import _ZIPF_R

    d = load(spark, SF_DIR, "documents")
    counts = (
        d.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .where(F.col("lang") == "en")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(_ZIPF_R)
        .collect()
    )
    qx = np.round(np.log(np.arange(1, len(counts) + 1)) * 1e6)
    qy = np.round(np.log(np.array([r["c"] for r in counts])) * 1e6)
    slope_np = np.polyfit(qx, qy, 1)[0]
    got = {
        r["lang"]: r["zipf_slope"] for r in _df(spark, "text_zipf_fit").collect()
    }
    assert abs(got["en"] - slope_np) < 1e-3, (got["en"], slope_np)


def test_containment_and_ahash_never_cartesian(spark):
    """Round-4 dedup additions keep the candidate-generation
    discipline: containment rides the postings equi-join, aHash rides
    the 16-bit band equi-join — no cross join at any size."""
    for name in ("dedup_containment_pairs", "mm_image_ahash_neardup"):
        plan = P.formatted_plan(_df(spark, name))
        assert "CartesianProduct" not in plan, (name, plan[:2000])


def test_scd2_build_no_single_partition_sort(spark):
    """The SCD2 builder's windows partition by user_id — a global
    (single-partition) sort would serialize the 100 TB change log."""
    plan = P.formatted_plan(_df(spark, "temporal_scd2_build"))
    assert "SinglePartition" not in plan, plan[:2000]


def test_dsir_feature_stream_reused_not_recomputed(spark):
    """The hashed feature stream feeds model fit AND scoring; the
    persist must make the second consumer an InMemoryTableScan, not a
    re-explode of the corpus."""
    plan = P.formatted_plan(_df(spark, "pipeline_dsir_importance"))
    assert "InMemoryTableScan" in plan, plan[:2000]
