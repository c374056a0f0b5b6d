"""Generate PLANS.md: the physical plan of every bench headline query.

The scale claims in README §"Design for 100 TB" are plan properties
(PushedFilters, PartitionFilters/dynamicpruning, broadcast joins, no
cartesian products, codegen coverage). tests/test_plans.py asserts
them; this tool snapshots the actual `explain("formatted")` output so
the evidence is reviewable without running Spark.

Usage: python tools/plan_audit.py   (writes /root/repo/PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, SF_DIR  # noqa: E402
from hive_service_spark.plans.inspect import (  # noqa: E402
    codegen_stage_count,
    formatted_plan,
)
from hive_service_spark.registry import load_all  # noqa: E402
from hive_service_spark.session import get_session  # noqa: E402


def _scrub(plan: str) -> str:
    """Strip run-varying noise (expression ids, paths) for stable diffs."""
    plan = re.sub(r"#\d+L?", "#x", plan)
    plan = re.sub(r"\[plan_id=\d+\]", "[plan_id=x]", plan)
    return plan.strip()


def _shuffle_budget(plan: str) -> dict[str, int]:
    """Count the plan features the 100 TB claims are made of."""
    return {
        # formatted mode: shuffle exchanges are "(n) Exchange" nodes with
        # hashpartitioning/rangepartitioning arguments; broadcast
        # exchanges are distinct "BroadcastExchange" nodes
        "exchanges": len(
            re.findall(r"\(\d+\) Exchange\b", plan)
        ),
        "broadcasts": len(re.findall(r"\(\d+\) BroadcastExchange", plan)),
        "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "shj": len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)),
        "cartesian": plan.count("CartesianProduct"),
    }


# Per-query audit notes, rendered under the query's section so they
# survive regeneration (PLANS.md is fully overwritten by this tool).
NOTES = {
    "q8_market_share": (
        "Round-6 shape: ORDERS is reduced by the AMERICA-customer key "
        "set BEFORE the one lineitem⋈orders shuffle pair (the round-5 "
        "plan filtered after), so the big shuffle carries "
        "region-fraction x date-fraction of orders — the win is an "
        "at-scale property. MEASURED LOCAL COST (round-6 verdict, "
        "three independent measurements): the pre-reduction runs "
        "1.25-1.30x the round-5 shape at sf0.1 — the round-6 A/B's "
        "'equal within noise' undersold it; at this scale every dim "
        "join is a broadcast and the extra orders-side projection/"
        "filter pass is pure overhead. The at-scale side of the trade "
        "is now MEASURED too, not argued: SCALE.md's lineitem+orders "
        "x8 probe (matching key offsets, so the fact⋈orders join "
        "scales) runs q8 at-or-below linear growth. Round 7 also "
        "dropped the forced F.broadcast hints on the sf-scaled arms "
        "(cust_am, part, supp_nat — round-6 advice #4); AQE still "
        "picks broadcast here via the threshold (plan-pinned in "
        "test_tpch_no_forced_broadcast_of_sf_scaled_frames). The "
        "verdict-suggested lineitem pre-aggregate to (orderkey, "
        "volume) was evaluated and rejected: after the p_type filter "
        "there is ~1 surviving lineitem per order, so the extra "
        "aggregation shuffle saves nothing. ROUND-12 SETTLEMENT of "
        "the creep watch item (r11 verdict: q8's host-corrected ratio "
        "vs the r01 anchor crept 1.60 -> 1.92 across rounds 8-11, "
        "always read on jittery boxes): tools/q8_ab.py ran BOTH plan "
        "variants A/B-interleaved, 1 warmup + 5 measured reps each, "
        "on a settling box (loadavg_start 0.35) — pre-reduction "
        "median 1.392 s {1.585, 1.392, 1.289, 1.250, 1.412} vs "
        "post-reduction (round-5 shape) median 1.413 s {1.413, "
        "1.226, 1.429, 1.464, 1.174}, ratio 0.985. The two shapes "
        "are EQUAL within noise: the round-6 'pre-reduction costs "
        "1.25-1.30x locally' penalty is no longer observed, and "
        "whatever drift exists vs the r01 anchor affects both "
        "variants identically — instrument noise, not the "
        "pre-reduction trade-off. The registered plan stays "
        "pre-reduction (the at-scale winner per the x8 probe) with "
        "its local penalty now measured at zero."
        " ROUND-13 re-read (idle box, loadavg_start 0.76): pre 1.251 s {1.420, 1.251, 1.185, 1.331, 1.077} vs post 1.221 s {1.359, 1.210, 1.302, 1.221, 1.121}, ratio 1.025 — still equal within noise; the graded-bench q8_corrected field (new this round) read 2.005 in-suite while the idle-box A/B min corrects to ~1.49, confirming the residual drift is in-suite jitter, not the plan."
    ),
    "q7_volume_shipping": (
        "Round-6 shape: the nation-pair disjunction is hand-factored "
        "into per-side IN pre-filters on the supplier and customer "
        "arms (Catalyst does not infer constraints across OR "
        "branches), so both fact-side joins see 2/25-nation inputs and "
        "the residual disjunction only removes the (A,A)/(B,B) "
        "combinations. Plan-pinned in tests/test_plans.py."
    ),
    "text_bm25_wand_retrieval": (
        "ROUND-13 OPTIMIZATION: the fallback arm (phase 3) is one "
        "postings pass against the broadcast probe-capped unsafe-term "
        "frame + per-(query,doc) sum + anti-join — the old extra-keys "
        "set build and the keys x all-terms rescore (two postings "
        "touches, the SMJ pair this table used to show) are gone. "
        "Before/after in plans/r13/; 2.93 -> 1.99 s. "
        "Details: OPTIMIZATION_r13.md."
    ),
    "text_phrase_search": (
        "ROUND-13 OPTIMIZATION: the phrase string no longer rides the "
        "hit-row shuffle into the (query, doc, start) aggregation — "
        "integers shuffle, the phrase re-attaches to the tiny match "
        "output via the per-query phrase dim. 2.07 -> 1.48 s."
    ),
    "graph_pagerank_cosupply": (
        "ROUND-13 OPTIMIZATION: (a) co-supply edges expand MAP-SIDE "
        "from a per-order collect_set (bounded by order size) instead "
        "of distinct + lineitem self-join; (b) rank/deg pre-divides "
        "per NODE each iteration so the loop streams the narrow "
        "(src, dst) edge cache against per-node contributions; (c) "
        "iteration checkpoints are lazy (materialize inside the final "
        "job). 2.65 -> 2.1-2.3 s. The loop stages stay invisible in "
        "this final-plan snapshot, as before."
    ),
    "dedup_span_excision": (
        "ROUND-13 OPTIMIZATION: the rebuild is a per-doc covered-index "
        "collect_set + order-preserving array_except over the doc's "
        "own word array — the token-level posexplode/DISTINCT/"
        "equi-join/collect_list pipeline (four corpus-sized shuffles) "
        "is gone. 1.32 -> 1.02 s."
    ),
    "ml_logreg_quality": (
        "ROUND-13 OPTIMIZATION: the persisted feature/label frames "
        "hash-partition on doc_id at materialization, so the GD "
        "steps' joins and margins aggregates co-locate behind the "
        "cache. The single-pass featurize rewrite was MEASURED SLOWER "
        "(interleaved A/B) and deliberately not taken — see "
        "OPTIMIZATION_r13.md."
    ),
}


def main() -> None:
    specs = load_all()
    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of the bench headline queries",
        "",
        f"Generated by `python tools/plan_audit.py` at sf dir `{SF_DIR}`.",
        "Expression ids are scrubbed (`#x`) so regenerating gives stable",
        "diffs. What to look for per README §Design for 100 TB:",
        "`PushedFilters` (row-group skip), `ReadSchema` (column pruning),",
        "`PartitionFilters` incl. `dynamicpruningexpression` (directory",
        "skip/DPP), `BroadcastHashJoin` on dim sides, absence of",
        "`CartesianProduct`, `WholeStageCodegen` spans.",
        "",
    ]
    sections: list[str] = []
    budget_rows: list[str] = []
    for name in HEADLINE:
        if name not in specs:
            continue
        df = specs[name].fn(spark, SF_DIR)
        plan = _scrub(formatted_plan(df))
        b = _shuffle_budget(plan)
        # the pre-execution AdaptiveSparkPlan string carries no codegen
        # ids (AQE decides codegen per query stage at runtime), so the
        # formatted-plan regex undercounted to 0 — count via
        # explain("codegen") with AQE statically off instead
        b["codegen"] = codegen_stage_count(df)
        budget_rows.append(
            f"| {name} | {b['exchanges']} | {b['broadcasts']} | "
            f"{b['bhj']}/{b['smj']}/{b['shj']} | {b['cartesian']} | "
            f"{b['codegen']} |"
        )
        sections.append(f"## {name}\n")
        if name in NOTES:
            sections.append(f"> {NOTES[name]}\n")
        sections.append("```")
        sections.append(plan)
        sections.append("```\n")
    out += [
        "## Shuffle budget (per final-plan snapshot; iterative queries'",
        "loop stages run as separate jobs and are audited in their",
        "module docstrings)",
        "",
        "| query | shuffles | broadcasts | BHJ/SMJ/SHJ | cartesian | codegen spans |",
        "|---|---|---|---|---|---|",
        *budget_rows,
        "",
    ]
    out += sections
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(dest, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {dest} ({len(out)} blocks)")


if __name__ == "__main__":
    main()
