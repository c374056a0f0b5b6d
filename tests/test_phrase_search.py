"""Positional phrase search (llm/text.py phrase_search): the
edge cases the corpus-derived oracle probes cannot be relied on to
cover — phrases that REPEAT a term, overlapping occurrences, and
boundary starts. The registered query's values are covered by the
DuckDB oracle; these tests pin the count(DISTINCT off) == n_terms
argument directly against a sliding-window Python reference on
handcrafted corpora."""

from __future__ import annotations

import pyspark.sql.functions as F

from hive_service_spark.llm.text import phrase_search


def _run(spark, docs, phrases):
    """docs: [(doc_id, [words])]; phrases: [(query_id, [terms])]."""
    d = spark.createDataFrame(
        [(i, ws) for i, ws in docs], "doc_id bigint, w array<string>"
    )
    rows = [
        (q, " ".join(ts), len(ts), off, t)
        for q, ts in phrases
        for off, t in enumerate(ts)
    ]
    p = spark.createDataFrame(
        rows,
        "query_id bigint, phrase string, n_terms int, off int, term string",
    )
    out = phrase_search(d, p)
    return sorted(
        (r["query_id"], r["doc_id"], r["start_pos"]) for r in out.collect()
    )


def _ref(docs, phrases):
    """Sliding-window reference."""
    out = []
    for q, ts in phrases:
        for i, ws in docs:
            for s in range(len(ws) - len(ts) + 1):
                if ws[s : s + len(ts)] == ts:
                    out.append((q, i, s + 1))  # 1-based
    return sorted(out)


def test_repeated_term_phrase_overlapping_occurrences(spark):
    """Phrase 'a a b' over docs with 'a'-runs: a hit needs ALL THREE
    offsets at one start — two 'a'-postings landing on the same start
    via different offsets must not double-count (count DISTINCT off),
    and a run of a's yields exactly the starts the window reference
    finds."""
    docs = [
        (1, ["a", "a", "b"]),
        (2, ["a", "a", "a", "b"]),  # only start 2 matches
        (3, ["a", "a", "a", "a", "b"]),
        (4, ["a", "b", "a", "a", "b"]),
        (5, ["a", "a"]),  # too short / no b
        (6, ["b", "a", "a", "b", "a", "a", "b"]),  # two matches
    ]
    phrases = [(100, ["a", "a", "b"])]
    assert _run(spark, docs, phrases) == _ref(docs, phrases)


def test_all_same_term_phrase(spark):
    """'a a a' over runs: starts slide one by one; n_off must count
    offsets, not distinct words."""
    docs = [(1, ["a"] * 5), (2, ["a", "a"]), (3, ["b", "a", "a", "a"])]
    phrases = [(7, ["a", "a", "a"])]
    assert _run(spark, docs, phrases) == _ref(docs, phrases)


def test_boundary_starts_and_multiple_queries(spark):
    """Matches at position 1 and at the last possible start; two
    queries sharing terms must not cross-contaminate; start_pos >= 1
    must reject a partial hit implying a negative/zero start."""
    docs = [
        (1, ["x", "y", "z"]),
        (2, ["y", "z", "x", "y", "z"]),
        (3, ["z", "x", "y"]),
    ]
    phrases = [(1, ["x", "y", "z"]), (2, ["y", "z"])]
    assert _run(spark, docs, phrases) == _ref(docs, phrases)


def test_plan_is_broadcast_probe_no_cartesian(spark):
    """The phrase frame must broadcast into the postings scan; no
    cartesian product anywhere."""
    from hive_service_spark.plans import inspect as P

    d = spark.createDataFrame([(1, ["a", "b"])], "doc_id bigint, w array<string>")
    p = spark.createDataFrame(
        [(1, "a b", 2, 0, "a"), (1, "a b", 2, 1, "b")],
        "query_id bigint, phrase string, n_terms int, off int, term string",
    )
    plan = P.formatted_plan(phrase_search(d, p))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
