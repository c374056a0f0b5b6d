"""Scale probe: replicate the corpus N-fold and measure that the
extension stack's runtime grows ~linearly — evidence for the "would
this hold at 100x?" question per-sf correctness gates can't answer.

Replicas are PERTURBED so workload density stays constant instead of
exploding combinatorially:

- documents: every word is prefixed with a replica tag, so each
  replica reproduces the base corpus's shingle/near-dup structure
  without creating cross-replica near-dup pairs (those would grow the
  TRUE pair count quadratically in N — a data-density change, not an
  engine-scaling one).
- embeddings: each replica shifts every dimension by a small constant,
  preserving cluster geometry without exact cross-replica duplicates.
- lineitem + orders: key-offset copies with MATCHING l_orderkey /
  o_orderkey offsets per replica, so fact⋈orders joins scale with the
  data instead of degenerating to replica-0 matches (scan/agg/join
  probe — q1, q8).

Cell/bucket-scoped operators (SemDeDup, IVF) are parameter-bounded:
their pair space is sum(cell^2) ~ n^2/k, so the codebook size k MUST
grow with the corpus (SemDeDup's published regime: k ~ n/cell_size).
The probe measures them with SPARK_GRAFT_KMEANS_K scaled by the same
factor as the data — the configuration a real deployment ships — via a
subprocess, since the knob is bound at import on both the Spark and
oracle sides.

Non-scaled tables are symlinked so registered queries run unchanged
against the scaled dir. Writes SCALE.md.

Usage: python tools/scale_probe.py            # orchestrate + report
       python tools/scale_probe.py --build N_docs N_vecs N_li
       python tools/scale_probe.py --measure <sf_dir> q1,q2,...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DEFAULT = "/root/repo/.scratch/scale_probe"
OUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", OUT_DEFAULT)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

N_DOCS, N_VECS, N_LI = 16, 8, 8
N_EV, N_PART = 8, 8
# the aux dir replicates events / a graph-growing lineitem / part —
# kept separate from OUT because the graph probe offsets l_suppkey,
# which would break OUT's q8 joins against non-replicated supplier
OUT_AUX = OUT + "_aux"

# linear probes: candidate generation is equi-join / broadcast / capped
LINEAR = [
    ("q1_pricing_summary", "lineitem", N_LI),
    # round-6 advice #5: q8's orders-side pre-reduction costs ~1.25x
    # locally (measured, see PLANS.md NOTE) with the payoff claimed at
    # scale — this probe IS that claim's evidence (orders+lineitem x8
    # with matching keys, so the fact⋈orders shuffle pair scales)
    ("q8_market_share", "lineitem+orders", N_LI),
    ("text_quality_scores", "documents", N_DOCS),
    ("dedup_minhash_lsh", "documents", N_DOCS),
    ("dedup_ngram_jaccard", "documents", N_DOCS),
    ("pipeline_dsir_importance", "documents", N_DOCS),
    # the two queries whose packing cumsum was rewritten as the
    # two-level bucketed prefix sum (round-4 advice #3's done-criterion:
    # prove the parallelism claim at x16, not just output equivalence)
    ("pipeline_pack_shards", "documents", N_DOCS),
    ("tok_bpe_aware_pack", "documents", N_DOCS),
    ("dedup_containment_pairs", "documents", N_DOCS),
    # round-6 retrieval addition: postings build is one corpus pass;
    # probe count grows with the corpus (doc_id % 97) while per-probe
    # candidate sets stay replica-local, so expected growth is linear
    ("text_bm25_retrieval", "documents", N_DOCS),
    # round-7 WAND variant: at sf0.1 its fallback machinery costs ~3x
    # plain BM25 (the gate corpus's 31-word vocabulary is ~all hot, so
    # probes legitimately fall back — measured in BENCH_r7); the claim
    # is the SCALING shape, so the probe measures it
    ("text_bm25_wand_retrieval", "documents", N_DOCS),
    # round-6 advice #3: the hybrid fusion's dense side is now a
    # CAPPED probe set (<=100 probes at any sf, the _HE_QCAP
    # discipline) — this probe is the done-criterion evidence
    ("text_hybrid_rrf_retrieval", "documents", N_DOCS),
    ("tok_bpe_train_merges", "documents", N_DOCS),
    ("ml_bigram_lm_quality", "documents", N_DOCS),
    ("text_ngram_novelty", "documents", N_DOCS),
    # round-9: passage-span flagging is linear in total gram count
    # (min<>max per gram + one equi-join back) — this row is the claim
    ("text_duplicate_spans", "documents", N_DOCS),
    ("dedup_span_excision", "documents", N_DOCS),
    # round-10: phrase search — postings build is one corpus pass and
    # candidate volume is bounded by the (capped) probes' term dfs;
    # probe count grows with the corpus like BM25's, so expected
    # growth is linear
    ("text_phrase_search", "documents", N_DOCS),
    # round-10: classifier training — every GD step is one broadcast
    # join + two bounded-key groupBys, so steps scale with one corpus
    # pass each
    ("ml_logreg_quality", "documents", N_DOCS),
    ("knn_cosine_bruteforce", "embeddings", N_VECS),
]
# cell-scoped probes: run with k scaled by the data factor
CELL = [
    ("dedup_semdedup_cells", "embeddings", N_VECS),
    ("ann_ivf_kmeans", "embeddings", N_VECS),
]
# aux probes (round-7 advice #2): the sequence/time-series wave over a
# replicated events table (users xN with per-user sequence density
# constant), label propagation over a lineitem whose GRAPH grows
# (suppkey-offset replicas: nodes xN, edges xN), and the skyline over
# a part table with per-replica price perturbation
AUX = [
    ("seq_window_funnel", "events", N_EV),
    ("seq_markov_transitions", "events", N_EV),
    ("seq_top_journey_paths", "events", N_EV),
    ("ts_gapfill_locf_interpolate", "events", N_EV),
    ("ts_time_weighted_avg", "events", N_EV),
    ("ts_seasonal_decompose", "events", N_EV),
    ("ts_mad_robust_anomalies", "events", N_EV),
    ("ts_m4_downsample", "events", N_EV),
    ("ts_lttb_downsample", "events", N_EV),
    ("ts_cusum_changepoint", "events", N_EV),
    ("seq_attribution_credit", "events", N_EV),
    ("seq_matchpath_general", "events", N_EV),
    ("seq_matchpath_chain4", "events", N_EV),
    ("seq_matchpath_overlap", "events", N_EV),
    ("seq_matchpath_nested", "events", N_EV),
    ("seq_matchpath_optional_lead", "events", N_EV),
    ("seq_matchpath_capped", "events", N_EV),
    ("seq_attribution_capped", "events", N_EV),
    ("graph_label_propagation", "lineitem(graph)", N_LI),
    ("window_skyline_pareto", "part", N_PART),
]

# hot-key skew probes (round-8 verdict #2): the per-USER sequence
# operators' window/group key is user_id, which cannot be salted (the
# semantics are per-user order), so a power-law hot user is their real
# 100x risk — volume replicas can't see it. OUT_SKEW replays the same
# xN events volume with ONE user owning ~10% of all events; skew_x =
# t_skew / t_uniform at identical volume isolates the hot-key cost.
OUT_SKEW = OUT + "_skew"
# round 10: 50% ownership — the bot-key breaking point; measured only
# for the capped-vs-uncapped contrast pairs (SKEW50 below)
OUT_SKEW50 = OUT + "_skew50"
# round 11 (verdict #6): 90% ownership — does the 50%-table's fused
# capping-walk floor (sessionize/attribution capped at 1.83-1.86x)
# stay flat or grow as ownership rises? Measured only for the fused
# pairs (SKEW90 below).
OUT_SKEW90 = OUT + "_skew90"
HOT_USER = 424_242
SKEW = [
    # pure groupBy-user aggregations: partial (map-side) aggregation
    # absorbs the hot key — expect skew_x ~ 1
    "seq_window_funnel",
    # window-partition operators: the hot user's whole sequence lands
    # in ONE task (a window partition is unsplittable, and AQE's
    # skew-join splitting does not apply to window exchanges) — the
    # measured skew_x is the straggler cost at 10% ownership
    "seq_sessionize_batch",
    # round-9: the capped variant — the budget bounds every pass after
    # the one narrow capping window, so its skew_x under the same hot
    # user is the mitigation's measured payoff
    "seq_sessionize_capped",
    "seq_markov_transitions",
    "seq_top_journey_paths",
    "seq_attribution_credit",
    "seq_matchpath_general",
    "seq_matchpath_chain4",
    "seq_matchpath_alternation",
    # round 10: the overlap lead-chain plan is also a window-partition
    # operator — same straggler exposure, measured alongside
    "seq_matchpath_overlap",
]

# round 10: capped-vs-uncapped contrast at 50% ownership — each pair
# runs the same semantics with and without capped_user_prefix's
# 48-event budget; skew_x(uncapped) is the breaking point, skew_x
# (capped) is the bound the budget buys (the capping window itself
# still walks the hot sequence once, but it is the ONLY pass that
# does)
SKEW50_PAIRS = [
    ("seq_sessionize_batch", "seq_sessionize_capped"),
    ("seq_matchpath_general", "seq_matchpath_capped"),
    ("seq_attribution_credit", "seq_attribution_capped"),
    ("seq_markov_transitions", "seq_markov_capped"),
    ("seq_top_journey_paths", "seq_journeys_capped"),
]
SKEW50 = [q for pair in SKEW50_PAIRS for q in pair]

# round 11: the two pairs whose capped skew_x at 50% sat at the fused
# capping-walk floor — probed again at 90% ownership (plus one
# post-cap-dominated pair, matchpath, as the control that the budget's
# erased-straggler reading also holds at 90%)
SKEW90_PAIRS = [
    ("seq_sessionize_batch", "seq_sessionize_capped"),
    ("seq_attribution_credit", "seq_attribution_capped"),
    ("seq_matchpath_general", "seq_matchpath_capped"),
]
SKEW90 = [q for pair in SKEW90_PAIRS for q in pair]

# round 12 (verdict #2): the quarantine contrast — the 90% table's own
# recommendation ("at a true bot key the fix is dropping the key
# upstream") shipped as an operator. quarantine_hot_keys routes the
# bot key out via one map-side-combined count + a broadcast anti-join
# BEFORE the window exchange, so unlike the capped variant (whose one
# capping walk still reads the hot history — the ownership-linear
# floor) the quarantined pipeline's per-key sort never sees the hot
# key at all. Expected: skew_x ~flat across 50% and 90% ownership.
SKEW_QUAR = ["seq_sessionize_quarantined"]


def _build(n_docs: int, n_vecs: int, n_li: int) -> None:
    import pyspark.sql.functions as F

    from hive_service_spark.session import get_session

    spark = get_session("scale_build")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    # a reused OUT dir from an earlier probe version may hold a
    # SYMLINK where this version writes a replicated table (orders
    # was linked before round 7): Spark's overwrite would recurse
    # through the link into the read-only base dir — unlink first.
    for t in ("documents", "embeddings", "lineitem", "orders"):
        p = f"{OUT}/{t}.parquet"
        if os.path.islink(p):
            os.remove(p)

    d = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = [
        d.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            (
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(F.lit(f"r{k}"), w),
                    ),
                    " ",
                )
                if k
                else F.col("text")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for k in range(n_docs)
    ]
    out = parts[0]
    for r in parts[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{OUT}/documents.parquet"
    )

    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    parts = [
        e.select(
            (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
            "label",
            (
                F.transform("embedding", lambda x: x + F.lit(float(k) * 1e-4))
                if k
                else F.col("embedding")
            ).alias("embedding"),
        )
        for k in range(n_vecs)
    ]
    out = parts[0]
    for r in parts[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{OUT}/embeddings.parquet"
    )

    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 100_000_000))
        for k in range(n_li)
    ]
    out = parts[0]
    for r in parts[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{OUT}/lineitem.parquet"
    )

    # orders replicates with the SAME key offsets as lineitem so the
    # fact⋈orders join matches within every replica — without this the
    # scaled q8 would only join replica 0 and the probe would measure
    # an 8x scan against a 1x join (not the claim under test)
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    parts = [
        orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * 100_000_000)
        )
        for k in range(n_li)
    ]
    out = parts[0]
    for r in parts[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{OUT}/orders.parquet"
    )

    replicated = {"documents", "embeddings", "lineitem", "orders"}
    for t in TABLES:
        if t in replicated:
            continue  # just written above as real (overwritten) dirs
        link = f"{OUT}/{t}.parquet"
        # recreate unconditionally: a reused OUT dir with a changed
        # BASE would otherwise keep stale links to the old base and
        # silently measure mixed-scale data (round-4 advice)
        if os.path.islink(link):
            os.remove(link)
        elif os.path.exists(link):
            raise RuntimeError(
                f"{link} exists and is not a symlink — refusing to mix "
                "replicated and linked tables in one scale dir"
            )
        os.symlink(f"{BASE}/{t}.parquet", link)

    # ---- aux dir: events / graph-growing lineitem / part ----------
    from hive_service_spark.catalog import load as _cat_load

    os.makedirs(OUT_AUX, exist_ok=True)
    aux_replicated = {"events", "lineitem", "part"}
    for t in aux_replicated:
        p = f"{OUT_AUX}/{t}.parquet"
        if os.path.islink(p):
            os.remove(p)

    # events: users xN with per-user sequence density constant (both
    # ids offset per replica), timestamps untouched — the funnel /
    # journey / time-series shapes see N x the users and N x the
    # points per series bucket, the way production growth looks
    ev = _cat_load(spark, BASE, "events")
    parts = [
        ev.select(
            (F.col("event_id") + k * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + k * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(N_EV)
    ]
    out = parts[0]
    for r in parts[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{OUT_AUX}/events.parquet"
    )

    # lineitem for the GRAPH probes: l_suppkey offset per replica so
    # the co-supply graph genuinely grows (nodes xN, edges xN, degree
    # distribution preserved) — this is why the aux dir exists: the
    # suppkey offset would break OUT's q8 join against the
    # non-replicated supplier table
    li_g = spark.read.parquet(f"{BASE}/lineitem.parquet")
    parts = [
        li_g.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * 100_000_000)
        ).withColumn(
            "l_suppkey", F.col("l_suppkey") + F.lit(k * 10_000_000)
        )
        for k in range(N_LI)
    ]
    out = parts[0]
    for r in parts[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{OUT_AUX}/lineitem.parquet"
    )

    # part for the skyline probe: keys offset, price perturbed by a
    # distinct cent per replica so replicated points interleave
    # instead of stacking into exact ties
    pt = spark.read.parquet(f"{BASE}/part.parquet")
    parts = [
        pt.withColumn(
            "p_partkey", F.col("p_partkey") + F.lit(k * 10_000_000)
        ).withColumn(
            "p_retailprice", F.col("p_retailprice") + F.lit(k * 0.01)
        )
        for k in range(N_PART)
    ]
    out = parts[0]
    for r in parts[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{OUT_AUX}/part.parquet"
    )

    for t in TABLES:
        if t in aux_replicated:
            continue
        link = f"{OUT_AUX}/{t}.parquet"
        if os.path.islink(link):
            os.remove(link)
        elif os.path.exists(link):
            raise RuntimeError(
                f"{link} exists and is not a symlink — refusing to mix "
                "replicated and linked tables in one scale dir"
            )
        os.symlink(f"{BASE}/{t}.parquet", link)

    # ---- skew dir: same events volume, ONE user owns ~10% ---------
    # identical xN_EV replication as the aux events EXCEPT that a
    # deterministic 10% of every replica's events (event_id % 10 == 0,
    # same rows in each replica) are reassigned to HOT_USER — the
    # power-law head the per-user sequence operators meet in real
    # clickstreams. Volume matches OUT_AUX exactly, so skew_x is the
    # key-distribution cost alone.
    # round 10: a second skew dir at 50% ownership (the bot-key
    # breaking point the capped operators exist for) — same recipe,
    # event_id % 2 instead of % 10. Round 11: a third at 90% (the
    # fused-floor question), hot when event_id % 10 != 9.
    for skew_dir, hot in (
        (OUT_SKEW, lambda c: c % 10 == 0),
        (OUT_SKEW50, lambda c: c % 2 == 0),
        (OUT_SKEW90, lambda c: c % 10 != 9),
    ):
        os.makedirs(skew_dir, exist_ok=True)
        p = f"{skew_dir}/events.parquet"
        if os.path.islink(p):
            os.remove(p)
        parts = [
            ev.select(
                (F.col("event_id") + k * 100_000_000).alias("event_id"),
                "ts",
                F.when(hot(F.col("event_id")), F.lit(HOT_USER))
                .otherwise(F.col("user_id") + k * 10_000_000)
                .alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for k in range(N_EV)
        ]
        out = parts[0]
        for r in parts[1:]:
            out = out.unionByName(r)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{skew_dir}/events.parquet"
        )
        for t in TABLES:
            if t == "events":
                continue
            link = f"{skew_dir}/{t}.parquet"
            if os.path.islink(link):
                os.remove(link)
            elif os.path.exists(link):
                raise RuntimeError(
                    f"{link} exists and is not a symlink — refusing to "
                    "mix replicated and linked tables in one scale dir"
                )
            os.symlink(f"{BASE}/{t}.parquet", link)
    spark.stop()


def _measure(sf_dir: str, names: list[str]) -> None:
    from hive_service_spark.registry import load_all
    from hive_service_spark.session import get_session

    specs = load_all()
    spark = get_session("scale_measure")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    for name in names:
        best = None
        for measured in (False, True, True):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if measured and (best is None or dt < best):
                best = dt
            spark.catalog.clearCache()
        print(json.dumps({"query": name, "sf": sf_dir, "t": round(best, 3)}))
    spark.stop()


def _wand_mix() -> None:
    """Measure WAND's pruned-vs-fallback probe mix on a corpus with a
    REALISTIC Zipf vocabulary (round-7 advice #5). The sf0.1 gate
    corpus has a 31-word vocabulary where ~every term is hot
    (df > n/8), so the graded bench's WAND entry is ~all fallback —
    the honest local price of the prune machinery. This probe builds a
    2000-word Zipf corpus with the SAME document count and records how
    many probes the upper bound actually clears (pruned) vs falls back,
    plus wall times for WAND vs plain BM25 on that corpus, so the
    bench number carries its context in measured evidence."""
    import random

    from hive_service_spark.llm.text import (
        _BM25_QCAP,
        _BM25_QMOD,
        _wand_frames,
    )
    from hive_service_spark.registry import load_all
    from hive_service_spark.session import get_session

    spark = get_session("wand_mix")
    spark.sparkContext.setLogLevel("ERROR")
    zdir = OUT + "_zipf"
    os.makedirs(zdir, exist_ok=True)
    n_docs = spark.read.parquet(f"{BASE}/documents.parquet").count()
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(2000)]
    weights = [1.0 / (i + 1) for i in range(2000)]
    rows = [
        (i, " ".join(rng.choices(vocab, weights=weights, k=60)), "en", "zipf", 60)
        for i in range(n_docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    ).repartition(8).write.mode("overwrite").parquet(
        f"{zdir}/documents.parquet"
    )
    for t in TABLES:
        if t == "documents":
            continue
        link = f"{zdir}/{t}.parquet"
        if os.path.islink(link):
            os.remove(link)
        if not os.path.exists(link):
            os.symlink(f"{BASE}/{t}.parquet", link)

    n_probes = sum(
        1 for i in range(n_docs) if i % _BM25_QMOD == 0 and i < _BM25_QCAP
    )
    n_fallback = _wand_frames(spark, zdir)["unsafe"].count()
    spark.catalog.clearCache()

    specs = load_all()
    times = {}
    for name in ("text_bm25_wand_retrieval", "text_bm25_retrieval"):
        best = None
        for measured in (False, True, True):
            t0 = time.perf_counter()
            specs[name].fn(spark, zdir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            if measured and (best is None or dt < best):
                best = dt
            spark.catalog.clearCache()
        times[name] = round(best, 3)
    print(
        json.dumps(
            {
                "wand_mix": {
                    "n_docs": n_docs,
                    "vocab": len(vocab),
                    "n_probes": n_probes,
                    "n_fallback": n_fallback,
                    "n_pruned": n_probes - n_fallback,
                    "t_wand_s": times["text_bm25_wand_retrieval"],
                    "t_bm25_s": times["text_bm25_retrieval"],
                }
            }
        )
    )
    spark.stop()


def _mp_cost() -> None:
    """Automaton-vs-compiled cost lines (round-8 verdict #4; round 10
    adds the overlap class): run the SAME MatchPath pattern over the
    x8 events replica down BOTH paths — the compiled JVM plan (island
    walk for view.view*.purchase; lead chain for the overlapping
    signup.(view|click){1,2}.(click|purchase){1,2}) and the Arrow
    automaton (force_automaton=True) — verifying the answers agree via
    an aggregate fingerprint, and report both wall times. This is the
    measured price a genuinely irregular pattern (one NEITHER compiler
    can take: unbounded overlap, nested groups, min-0 first atoms)
    pays for the Python stage."""
    import pyspark.sql.functions as F

    from hive_service_spark.catalog import load
    from hive_service_spark.operators.matchpath import matchpath
    from hive_service_spark.session import get_session

    spark = get_session("mp_cost")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load(spark, OUT_AUX, "events")
    cases = (
        (
            "view.view*.purchase",
            "island walk",
            lambda: {
                "view": F.col("event_type") == "view",
                "purchase": F.col("event_type") == "purchase",
            },
        ),
        (
            "signup.(view|click){1,2}.(click|purchase){1,2}",
            "lead chain (overlap, r10)",
            lambda: {
                "signup": F.col("event_type") == "signup",
                "view": F.col("event_type") == "view",
                "click": F.col("event_type") == "click",
                "purchase": F.col("event_type") == "purchase",
            },
        ),
        (
            "signup.(view.click|click){1,2}.purchase",
            "lead chain (nested AST, r10b)",
            lambda: {
                "signup": F.col("event_type") == "signup",
                "view": F.col("event_type") == "view",
                "click": F.col("event_type") == "click",
                "purchase": F.col("event_type") == "purchase",
            },
        ),
        (
            "view*.click+.purchase",
            "island walk (min-0 lead, r10b)",
            lambda: {
                "view": F.col("event_type") == "view",
                "click": F.col("event_type") == "click",
                "purchase": F.col("event_type") == "purchase",
            },
        ),
    )
    rows = []
    for pattern, plan_kind, syms in cases:
        times, prints = {}, {}
        for key, force in (("compiled", False), ("automaton", True)):
            best = None
            for measured in (False, True, True):
                t0 = time.perf_counter()
                out = matchpath(
                    ev,
                    partition_by="user_id",
                    order_by=["ts", "event_id"],
                    symbols=syms(),
                    pattern=pattern,
                    force_automaton=force,
                )
                out.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if measured and (best is None or dt < best):
                    best = dt
                spark.catalog.clearCache()
            times[key] = round(best, 3)
            fp = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("match_len").alias("sl"),
                F.sum("start_rn").alias("sr"),
            ).first()
            prints[key] = (fp["n"], fp["sl"], fp["sr"])
        assert prints["compiled"] == prints["automaton"], (pattern, prints)
        rows.append(
            {
                "pattern": pattern,
                "plan_kind": plan_kind,
                "events_x": N_EV,
                "n_matches": prints["compiled"][0],
                "t_compiled_s": times["compiled"],
                "t_automaton_s": times["automaton"],
                "automaton_x": round(
                    times["automaton"] / times["compiled"], 2
                ),
            }
        )
    print(json.dumps({"mp_cost": rows}))
    spark.stop()


def _lead_caps() -> None:
    """Measure the lead-chain expression caps instead of asserting
    them (round-10 verdict #4): `_LEAD_MAX_COMPS` shipped at 512 with
    the claim 'past this the coalesce expression tree stops paying for
    itself vs one Arrow pass' — this probe runs a branch-count pattern
    family (one fixed first atom + n alternating OVERLAPPING optional
    groups => 2^n backtracking branches, total length n+1 <= the lead
    cap) down BOTH paths at 8..1024 branches over the x8 events
    replica, answers fingerprint-verified identical. Over-cap cases
    temporarily raise the cap so the crossover is measured, not
    extrapolated. Round-11 history: against the per-group
    applyInPandas automaton the crossover measured ~256; the
    mapInPandas automaton rewrite (flat ~1.2 s at any branch count)
    moved it to 16-32, where the cap now sits."""
    import pyspark.sql.functions as F

    import hive_service_spark.operators.matchpath as mp
    from hive_service_spark.catalog import load
    from hive_service_spark.session import get_session

    spark = get_session("lead_caps")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load(spark, OUT_AUX, "events")
    syms = lambda: {  # noqa: E731
        "signup": F.col("event_type") == "signup",
        "view": F.col("event_type") == "view",
        "click": F.col("event_type") == "click",
        "purchase": F.col("event_type") == "purchase",
    }
    rows = []
    old_cap = mp._LEAD_MAX_COMPS
    try:
        for n in (3, 4, 5, 6, 8, 10):
            atoms = [
                "(view|click)?" if i % 2 == 0 else "(click|purchase)?"
                for i in range(n)
            ]
            pattern = ".".join(["signup"] + atoms)
            mp._LEAD_MAX_COMPS = 4096  # measure past the shipped cap
            times, prints = {}, {}
            for key, force in (("compiled", False), ("automaton", True)):
                best = None
                for measured in (False, True, True):
                    t0 = time.perf_counter()
                    out = mp.matchpath(
                        ev,
                        partition_by="user_id",
                        order_by=["ts", "event_id"],
                        symbols=syms(),
                        pattern=pattern,
                        force_automaton=force,
                    )
                    out.write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    if measured and (best is None or dt < best):
                        best = dt
                    spark.catalog.clearCache()
                if key == "compiled":
                    # the measurement is only honest if the compiled
                    # path really took the lead-chain plan
                    plan = out._sc._jvm.PythonSQLUtils.explainString(
                        out._jdf.queryExecution(), "simple"
                    )
                    assert "Python" not in plan and "Arrow" not in plan, (
                        pattern,
                        "compiled run fell back to the automaton",
                    )
                times[key] = round(best, 3)
                fp = out.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("match_len").alias("sl"),
                    F.sum("start_rn").alias("sr"),
                ).first()
                prints[key] = (fp["n"], fp["sl"], fp["sr"])
            assert prints["compiled"] == prints["automaton"], (
                pattern,
                prints,
            )
            rows.append(
                {
                    "branches": 2**n,
                    "k_max": n + 1,
                    "events_x": N_EV,
                    "n_matches": prints["compiled"][0],
                    "t_compiled_s": times["compiled"],
                    "t_automaton_s": times["automaton"],
                    "automaton_x": round(
                        times["automaton"] / times["compiled"], 2
                    ),
                }
            )
            print(json.dumps(rows[-1]))
    finally:
        mp._LEAD_MAX_COMPS = old_cap
    print(json.dumps({"lead_caps": rows}))
    spark.stop()


def _soak() -> None:
    """Streaming funnel soak (round-8 verdict #5): 20 real micro-batches
    with per-batch state-store metrics — the SCALE.md row source; the
    assertions live in tests/test_streaming_soak.py."""
    import shutil
    import tempfile

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from funnel_soak import CLICKER, PURCHASER, run_soak

    from hive_service_spark.session import get_session

    spark = get_session("funnel_soak")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="funnel_soak_")
    try:
        res = run_soak(spark, d, n_batches=20)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    clk = res["final_state"][CLICKER]
    pur = res["final_state"][PURCHASER]
    print(
        json.dumps(
            {
                "soak": {
                    "batches": res["batches"],
                    "clicks_delivered": res["clicks_delivered"],
                    "clicker_final_clicks": clk["n_clicks"],
                    "purchaser_final_purchases": pur["n_purchases"],
                    "hot_users_after_future_batch": sum(
                        1
                        for k in (CLICKER, PURCHASER)
                        if k in res["after_future"]
                    ),
                }
            }
        )
    )
    spark.stop()


def _run_measure(sf_dir: str, names: list[str], extra_env=None) -> dict[str, float]:
    env = dict(os.environ)
    env.update(extra_env or {})
    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--measure",
            sf_dir,
            ",".join(names),
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3000,
    )
    times = {}
    for line in out.stdout.splitlines():
        try:
            rec = json.loads(line)
            times[rec["query"]] = rec["t"]
        except (json.JSONDecodeError, KeyError):
            pass
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(f"measure subprocess failed for {sf_dir}")
    return times


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--build":
        _build(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--measure":
        _measure(sys.argv[2], sys.argv[3].split(","))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--wand-mix":
        _wand_mix()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--mp-cost":
        _mp_cost()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--lead-caps":
        _lead_caps()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--soak":
        _soak()
        return

    # --skip-build (round 11): re-measure on existing replica dirs —
    # for re-running the suite on an idle box after a noisy reading
    # (one slow measure subprocess poisons every ratio computed
    # against it) without paying the rebuild
    if "--skip-build" not in sys.argv:
        subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--build",
                str(N_DOCS),
                str(N_VECS),
                str(N_LI),
            ],
            check=True,
            cwd=REPO,
            timeout=1200,
        )

    lin_names = [n for n, _, _ in LINEAR]
    cell_names = [n for n, _, _ in CELL]
    aux_names = [n for n, _, _ in AUX]
    base_lin = _run_measure(BASE, lin_names)
    base_cell = _run_measure(BASE, cell_names)  # default k=8
    base_aux = _run_measure(BASE, aux_names)
    big_lin = _run_measure(OUT, lin_names)
    big_cell = _run_measure(
        OUT, cell_names, {"SPARK_GRAFT_KMEANS_K": str(8 * N_VECS)}
    )
    big_aux = _run_measure(OUT_AUX, aux_names)
    # hot-key skew: same volume (x8 events), one user owning ~10%
    skew_uniform = _run_measure(OUT_AUX, SKEW)
    skew_hot = _run_measure(OUT_SKEW, SKEW)
    # round 10: 50% ownership, capped-vs-uncapped contrast pairs
    skew50_uniform = _run_measure(OUT_AUX, SKEW50)
    skew50_hot = _run_measure(OUT_SKEW50, SKEW50)
    # round 11: 90% ownership for the fused-floor pairs (+ matchpath
    # control); uniform baselines reuse the skew50 measurements (same
    # names, same OUT_AUX dir)
    skew90_hot = _run_measure(OUT_SKEW90, SKEW90)
    # round 12: the quarantined pipeline at uniform, 50% and 90%
    # ownership — the contrast row for the upstream bot-key drop
    quar_uniform = _run_measure(OUT_AUX, SKEW_QUAR)
    quar_50 = _run_measure(OUT_SKEW50, SKEW_QUAR)
    quar_90 = _run_measure(OUT_SKEW90, SKEW_QUAR)

    def _json_sub(flag: str, key: str, timeout: int):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=timeout,
        )
        for line in out.stdout.splitlines():
            try:
                rec = json.loads(line)
                if key in rec:
                    return rec[key]
            except json.JSONDecodeError:
                pass
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(f"{flag} subprocess failed")

    mp_cost = _json_sub("--mp-cost", "mp_cost", 1800)
    lead_caps = _json_sub("--lead-caps", "lead_caps", 3600)
    soak = _json_sub("--soak", "soak", 1800)

    wand_mix = None
    mix_out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--wand-mix"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    for line in mix_out.stdout.splitlines():
        try:
            rec = json.loads(line)
            if "wand_mix" in rec:
                wand_mix = rec["wand_mix"]
        except json.JSONDecodeError:
            pass
    if mix_out.returncode != 0 or wand_mix is None:
        sys.stderr.write(mix_out.stderr[-3000:])
        raise SystemExit("wand-mix subprocess failed")

    rows = []
    for group, base_t, big_t, note in (
        (LINEAR, base_lin, big_lin, "equi-join / broadcast / capped"),
        (CELL, base_cell, big_cell, f"k scaled 8 -> {8 * N_VECS} with data"),
        (AUX, base_aux, big_aux, "users / graph nodes / points xN"),
    ):
        for name, table, fac in group:
            tb, tg = base_t[name], big_t[name]
            rows.append(
                {
                    "query": name,
                    "table": table,
                    "data_x": fac,
                    "t_base_s": round(tb, 2),
                    "t_scaled_s": round(tg, 2),
                    "time_x": round(tg / tb, 2),
                    "efficiency": round(fac / (tg / tb), 2),
                    "note": note,
                }
            )
            print(json.dumps(rows[-1]))

    lines = [
        "# SCALE — N-fold replica probe\n",
        f"Base: `{BASE}`; scaled: documents x{N_DOCS}, embeddings "
        f"x{N_VECS}, lineitem+orders x{N_LI} (matching key offsets, "
        "so fact⋈orders joins scale with the data). Replicas are "
        "perturbed so "
        "duplicate/near-dup density per replica matches the base "
        "corpus (see tools/scale_probe.py). `time_x` = scaled/base "
        "wall time (min of 2 warm runs, one JVM per measurement set); "
        "`efficiency` = data_x / time_x — >= ~1 means at-or-below-"
        "linear growth (fixed overheads amortize), << 1 flags a "
        "superlinear hazard.\n",
        "Cell-scoped operators (SemDeDup, k-means IVF) have pair space "
        "sum(cell^2) ~ n^2/k, so their codebook size is scaled with "
        "the data (SPARK_GRAFT_KMEANS_K, the SemDeDup paper's "
        "k ~ n/cell_size regime) — holding k fixed while data grows "
        "8x is a misconfiguration, not an engine property.\n",
        f"Aux probes (separate `{OUT_AUX}` dir): events x{N_EV} with "
        "users offset per replica (per-user sequence density constant "
        "— the funnel/journey/time-series wave), lineitem with "
        "l_suppkey offset per replica so the co-supply GRAPH grows "
        f"(nodes x{N_LI}, edges x{N_LI} — kept out of the main dir "
        "because the suppkey offset would break q8's supplier join), "
        f"and part x{N_PART} with per-replica price perturbation for "
        "the skyline.\n",
        "| query | table | data_x | t_base (s) | t_scaled (s) | "
        "time_x | efficiency | note |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['query']} | {r['table']} | {r['data_x']} | "
            f"{r['t_base_s']} | {r['t_scaled_s']} | {r['time_x']} | "
            f"{r['efficiency']} | {r['note']} |"
        )
    lines.append("")
    lines.append("## Hot-key skew — per-user sequence operators\n")
    lines.append(
        f"Same x{N_EV} events volume as the aux probes, but ONE user "
        "(the power-law head) owns ~10% of ALL events "
        "(tools/scale_probe.py OUT_SKEW). These operators' key is "
        "user_id and their semantics are per-user ORDER, so the hot "
        "key cannot be salted; `skew_x` = t_hot / t_uniform at "
        "identical volume isolates the key-distribution cost. "
        "Interpretation: plain groupBy-user aggregations (the batch "
        "funnel's chained min-aggregates) are rescued by partial "
        "map-side aggregation — the hot key arrives pre-combined. "
        "Window-partition operators (sessionize, markov, journeys, "
        "attribution, matchpath) serialize the hot user into one "
        "task: a window partition is unsplittable and AQE's skew "
        "splitting applies to joins, not window exchanges — their "
        "measured skew_x is the straggler cost at 10% ownership, and "
        "the production mitigation at worse ratios is a DOCUMENTED "
        "hot-key cap (drop or truncate users beyond a per-user event "
        "budget — a data-quality rule, not an engine rewrite; bot "
        "traffic at this ownership share is filtered upstream in any "
        "real clickstream pipeline).\n"
    )
    lines.append(
        "| query | t_uniform (s) | t_hot (s) | skew_x | key shape |"
    )
    lines.append("|---|---|---|---|---|")
    for name in SKEW:
        tu, th = skew_uniform[name], skew_hot[name]
        if name == "seq_window_funnel":
            shape = "groupBy (partial-agg rescued)"
        elif name == "seq_sessionize_capped":
            shape = (
                "capped window (the 48-event budget bounds every pass "
                "after the one narrow capping window; its local cost "
                "shows here, its payoff is the BOUND at worse ratios)"
            )
        else:
            shape = "window partition (one-task hot key)"
        lines.append(
            f"| {name} | {round(tu, 2)} | {round(th, 2)} | "
            f"{round(th / tu, 2)} | {shape} |"
        )
    lines.append("")
    lines.append(
        "## Hot-key skew at 50% ownership — capped vs uncapped "
        "(round 10)\n"
    )
    lines.append(
        "The bot-key breaking point: same x8 volume, ONE user owning "
        "~50% of ALL events (tools/scale_probe.py OUT_SKEW50). Each "
        "pair runs identical semantics without and with "
        "capped_user_prefix's 48-event budget "
        "(hive_service_spark/operators/sequence_analytics.py). "
        "Uncapped, the window-partition operators serialize ~half the "
        "dataset into one unsplittable task; capped, the one narrow "
        "capping window is the only pass that walks the hot sequence "
        "— every downstream window/group/join sees <= 48 rows per "
        "user. skew_x = t_hot / t_uniform at identical volume; the "
        "capped rows' skew_x is the bound the budget buys (their "
        "t_uniform differs from the uncapped operator's because the "
        "capped variants also emit the user_capped flag). Reading the "
        "measured split (round-11 re-measure): where the post-cap "
        "passes dominate the operator (markov's transition counting, "
        "journeys' trigram counting) the budget ERASES the straggler "
        "(skew_x ~ 1.0 vs 2.2-2.5x uncapped); matchpath's capped twin "
        "is BOUNDED to roughly half the uncapped straggler (its "
        "island/lead machinery post-cap is cheap, the capping walk "
        "itself remains); where the downstream windows fuse into the "
        "capping pass's own sorted stage (sessionize's lag/cumsum, "
        "attribution's running count), that single fused walk of the "
        "hot sequence remains the floor — the budget still "
        "hard-bounds every SUBSEQUENT stage (the join fan-in, the "
        "session/credit aggregates), which is what stops the "
        "straggler compounding through the rest of the pipeline. "
        "Instrument note: hot-key rows are single-task-dominated and "
        "show ±30-50% run-to-run variance (two same-code runs this "
        "round measured sessionize-capped at 1.5 and 2.6) — read the "
        "capped-vs-uncapped CONTRAST, not the digits.\n"
    )
    lines.append(
        "| operator | variant | t_uniform (s) | t_hot (s) | skew_x |"
    )
    lines.append("|---|---|---|---|---|")
    for unc, cap in SKEW50_PAIRS:
        for name, label in ((unc, "uncapped"), (cap, "capped-48")):
            tu, th = skew50_uniform[name], skew50_hot[name]
            lines.append(
                f"| {name} | {label} | {round(tu, 2)} | {round(th, 2)} "
                f"| {round(th / tu, 2)} |"
            )
    lines.append("")
    lines.append(
        "## Hot-key skew at 90% ownership — the fused-floor question "
        "(round 11)\n"
    )
    lines.append(
        "Round 10 read the 50% table's sessionize/attribution capped "
        "rows (skew_x 1.83-1.86) as 'the one fused capping walk of the "
        "hot sequence is the floor per-key ORDER semantics pays' — "
        "this probe tests that reading at 90% ownership (same x8 "
        "volume, ONE user owning ~90% of all events, "
        "tools/scale_probe.py OUT_SKEW90; uniform baselines shared "
        "with the 50% table). If the floor claim is right, the capped "
        "rows' skew_x should track the hot sequence's share of total "
        "rows (the single sorted walk grows with ownership but stays "
        "ONE pass); the uncapped rows should keep degrading toward "
        "serializing the whole dataset into one task. matchpath rides "
        "along as the post-cap-dominated control. MEASURED ANSWER "
        "(round 11): the floor is NOT flat — every capped row's "
        "skew_x grows from 50% to 90% roughly with the hot sequence's "
        "share of total rows, which is exactly the linear cost of the "
        "one capping walk (it must still read the hot user's whole "
        "history once); the uncapped twins degrade faster and stay "
        "strictly worse at both ownerships. So the round-10 'floor' "
        "reading survives in its precise form — ONE pass pays it, "
        "nothing downstream compounds it — but the pass's cost tracks "
        "ownership, and at a true bot key the upstream fix remains "
        "dropping the key before the engine, not any per-key-ORDER "
        "operator.\n"
    )
    lines.append(
        "| operator | variant | t_uniform (s) | t_hot (s) | skew_x "
        "@90% | skew_x @50% |"
    )
    lines.append("|---|---|---|---|---|---|")
    for unc, cap in SKEW90_PAIRS:
        for name, label in ((unc, "uncapped"), (cap, "capped-48")):
            tu, th = skew50_uniform[name], skew90_hot[name]
            t50 = skew50_hot[name]
            lines.append(
                f"| {name} | {label} | {round(tu, 2)} | {round(th, 2)} "
                f"| {round(th / tu, 2)} | {round(t50 / tu, 2)} |"
            )
    for name in SKEW_QUAR:
        tu, th = quar_uniform[name], quar_90[name]
        t50 = quar_50[name]
        lines.append(
            f"| {name} | quarantined | {round(tu, 2)} | {round(th, 2)} "
            f"| {round(th / tu, 2)} | {round(t50 / tu, 2)} |"
        )
    lines.append("")
    lines.append(
        "Round 12 adds the table's own recommendation as a measured "
        "row: `seq_sessionize_quarantined` composes sessionization "
        "behind `quarantine_hot_keys` (one map-side-combined per-key "
        "count + a broadcast null-safe anti-join — the bot key never "
        "reaches the window exchange). Its skew_x should read ~flat "
        "across 50% and 90% ownership where the capped variant's "
        "floor is ownership-linear; the residual above 1.0 is the "
        "count pass itself, which any share-based policy must pay "
        "once. The quarantined keys stay auditable via "
        "skew_quarantine_audit.\n"
    )
    lines.append("## MatchPath compiled vs automaton — same pattern\n")
    lines.append(
        f"Each pattern over the x{mp_cost[0]['events_x']} events "
        "replica down BOTH paths, answers verified identical by "
        "aggregate fingerprint. `automaton_x` is the automaton's wall "
        "relative to the compiled plan's (> 1 = compiled faster). "
        "HONEST round-11 re-reading: the mapInPandas automaton "
        "rewrite removed the per-key Python invocation overhead that "
        "used to dominate its cost (old automaton_x 3.5-9.3 on these "
        "patterns), and the rewritten automaton now measures WITHIN "
        "~2x OF — sometimes under — the island-walk plans locally. "
        "The compiled plans remain the default for what local wall "
        "time cannot see: they stay entirely JVM-side (no Python "
        "worker fleet on every executor, no Arrow boundary "
        "serializing every event row), their per-row cost is O(1) in "
        "run length where the automaton's per-start regex is O(L) "
        "with backtracking (the unbounded-hot-key hazard the per-user "
        "budget exists for), and whole-stage codegen fuses them into "
        "the surrounding plan. The lead-chain table below prices "
        "where the compiled coalesce genuinely loses; the cap now "
        "sits exactly on that measured edge.\n"
    )
    lines.append(
        "| pattern | compiled plan | n_matches | t_compiled (s) | "
        "t_automaton (s) | automaton_x |"
    )
    lines.append("|---|---|---|---|---|---|")
    for r in mp_cost:
        lines.append(
            f"| `{r['pattern']}` | {r['plan_kind']} | {r['n_matches']} "
            f"| {r['t_compiled_s']} | {r['t_automaton_s']} | "
            f"{r['automaton_x']} |"
        )
    lines.append("")
    lines.append(
        "## Lead-chain branch caps — measured, not asserted "
        "(round 11)\n"
    )
    lines.append(
        "`_LEAD_MAX_COMPS` (matchpath.py) shipped at 512 with the "
        "CLAIM that past it the coalesce expression tree stops paying "
        "for itself vs one Arrow pass. Measurement: a branch-count "
        "pattern family (one fixed first atom + n alternating "
        "overlapping optional groups => 2^n backtracking branches, "
        "k_max = n+1 lead offsets) down both paths over the x8 events "
        "replica, fingerprint-verified identical; over-cap rows run "
        "with the cap temporarily raised so the crossover is measured "
        "rather than extrapolated. automaton_x > 1 means the compiled "
        "lead chain is still the cheaper plan at that branch count. "
        "The measurement moved the cap TWICE in round 11: ~256 "
        "against the old per-group automaton, then 16-32 after the "
        "automaton's own mapInPandas rewrite made it flat in branch "
        "count — the cap is now 32 (the break-even edge; ties go to "
        "the Python-free plan). Past ~512 branches the compiled tree "
        "also blows the JVM's 64 KB generated-method limit ('Code "
        "grows beyond 64 KB', janino) and falls back to interpreted "
        "expression evaluation — a cliff, not a slope. This family is "
        "the compiled plan's WORST case (every signup row is a "
        "candidate start); sparse-start patterns favor it longer. "
        "Round-12 re-measure: the 16/32-branch readings moved from "
        "1.04/0.92 (r11) to the table below — run-to-run drift of "
        "~25% AROUND the same break-even band, not a new crossover; "
        "the cap stays 32 because near break-even the tie-breakers "
        "are non-local (no Python worker fleet per executor, no "
        "Arrow boundary, O(1)-per-row vs O(L) backtracking on the "
        "hot-key hazard, codegen fusion), and flapping the cap on "
        "each round's instrument noise would churn plans for zero "
        "measured win.\n"
    )
    lines.append(
        "| branches | k_max | n_matches | t_compiled (s) | "
        "t_automaton (s) | automaton_x |"
    )
    lines.append("|---|---|---|---|---|---|")
    for r in lead_caps:
        lines.append(
            f"| {r['branches']} | {r['k_max']} | {r['n_matches']} | "
            f"{r['t_compiled_s']} | {r['t_automaton_s']} | "
            f"{r['automaton_x']} |"
        )
    lines.append("")
    lines.append("## Streaming funnel soak — 20 micro-batches\n")
    lines.append(
        "tools/scale_probe.py --soak (assertions in "
        "tests/test_streaming_soak.py): a never-converting clicker and "
        "purchaser sustained through 20 real micro-batches (file "
        "source, maxFilesPerTrigger=1, watermark advancing between "
        "batches), plus one fresh converter per batch and a late-signup "
        "user (clicks arm the signup-less timeout, then a signup must "
        "clear it). State rows grow ONLY with live users (exactly 3 + "
        "converters), and the clicker's candidate array holds the "
        "watermark horizon, not "
        f"the history: {soak['clicker_final_clicks']} clicks retained "
        f"of {soak['clicks_delivered']} delivered "
        f"(purchaser: {soak['purchaser_final_purchases']}); after a "
        "far-future batch fires the armed event-time timeouts, "
        f"{soak['hot_users_after_future_batch']} of the 2 signup-less "
        "users remain in the store (0 = fully garbage-collected).\n"
    )
    lines.append("| batch | rows_in | state_rows | state_removed |")
    lines.append("|---|---|---|---|")
    for b in soak["batches"]:
        lines.append(
            f"| {b['batch_id']} | {b['rows_in']} | {b['state_rows']} | "
            f"{b['state_removed']} |"
        )
    lines.append("")
    lines.append(
        "## WAND pruned-vs-fallback mix on a realistic vocabulary\n"
    )
    lines.append(
        f"The sf0.1 gate corpus has a ~31-word vocabulary where almost "
        "every term is hot (df > n/8), so the graded bench's WAND "
        "entry runs ~all probes through the exact per-query fallback — "
        "the honest local price of the prune machinery. On a "
        f"{wand_mix['vocab']}-word Zipf corpus with the same document "
        f"count ({wand_mix['n_docs']} docs, 60 words/doc): "
        f"**{wand_mix['n_pruned']}/{wand_mix['n_probes']} probes "
        "pruned** (upper bound proves the hot-term cut safe), "
        f"{wand_mix['n_fallback']} fell back; wall "
        f"{wand_mix['t_wand_s']} s (WAND) vs {wand_mix['t_bm25_s']} s "
        "(plain BM25) on that corpus.\n"
    )
    with open(os.path.join(REPO, "SCALE.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote SCALE.md")


if __name__ == "__main__":
    main()
