"""compile_pattern unit tests — the round-2 verdict's latent
wrong-answer bug: with >=25 symbols the old 'x'-skip assigned the same
char to two symbols, silently cross-matching their pattern elements."""

from __future__ import annotations

import pytest

from hive_service_spark.operators.matchpath import compile_pattern


def test_symbol_chars_unique_at_26_symbols():
    names = [f"s{i}" for i in range(26)]
    chars, _ = compile_pattern("s0.s25", names)
    assert len(set(chars.values())) == 26
    assert "x" not in chars.values()


def test_symbol_chars_unique_at_51_and_cap():
    names = [f"s{i}" for i in range(51)]
    chars, _ = compile_pattern("s0", names)
    assert len(set(chars.values())) == 51
    with pytest.raises(ValueError, match="too many symbols"):
        compile_pattern("s0", [f"s{i}" for i in range(52)])


def test_regex_source_uses_assigned_chars():
    chars, rx = compile_pattern("up.down*.up", ["up", "down", "flat"])
    assert rx == chars["up"] + chars["down"] + "*" + chars["up"]


def test_unknown_symbol_raises():
    with pytest.raises(ValueError, match="unknown symbol"):
        compile_pattern("up.bogus", ["up", "down"])


# ---------------------------------------------------------------------------
# round 8: the X.Y*.Z chain class compiles to a pure JVM window plan
# ---------------------------------------------------------------------------


def _mp(spark, rows, pattern, symbols_of):
    import pyspark.sql.functions as F

    from hive_service_spark.operators.matchpath import matchpath

    df = spark.createDataFrame(
        [
            (u, i, sym)
            for u, seq in rows
            for i, sym in enumerate(seq)
        ],
        "user_id bigint, pos bigint, sym string",
    ).select(
        "user_id",
        F.timestamp_micros(F.col("pos") * 1_000_000).alias("ts"),
        "pos",
        "sym",
    )
    out = matchpath(
        df,
        partition_by="user_id",
        order_by=["pos"],
        symbols=symbols_of(F),
        pattern=pattern,
    )
    return sorted(
        (r["user_id"], r["start_rn"], r["match_len"]) for r in out.collect()
    )


def _pysim(rows, pattern_regex, classify):
    """Reference model: per-sequence symbol string + anchored regex at
    every position (the Python automaton's exact semantics)."""
    import re as _re

    rx = _re.compile(pattern_regex)
    out = []
    for u, seq in rows:
        s = "".join(classify(x) for x in seq)
        for i in range(len(s)):
            m = rx.match(s, i)
            if m and m.end() > i:
                out.append((u, i + 1, m.end() - i))
    return sorted(out)


_CHAIN_SYMS = lambda F: {  # noqa: E731
    "a": F.col("sym") == "A",
    "b": F.col("sym") == "B",
    "c": F.col("sym") == "C",
}


def test_jvm_chain_matches_automaton_semantics(spark):
    """Exhaustive-ish equivalence: every 6-symbol sequence over
    {A, B, C, other} is run through the routed (JVM) path for both the
    x != y chain a.b*.c and the x == y chain a.a*.b, and compared to
    the anchored-regex reference model — the exact semantics the
    Python automaton implements."""
    import itertools

    rows = [
        (i, list(seq))
        for i, seq in enumerate(
            itertools.product("ABCX", repeat=6)
        )
    ]

    def classify(x):
        return {"A": "a", "B": "b", "C": "c"}.get(x, "x")

    for pattern, rx in (
        ("a.b*.c", "ab*c"),
        ("a.a*.b", "aa*b"),
        ("a.b+.c", "ab+c"),
        ("a.a+.b", "aa+b"),
        ("a.b?.c", "ab?c"),
        ("a.a?.b", "aa?b"),
    ):
        got = _mp(spark, rows, pattern, _CHAIN_SYMS)
        want = _pysim(rows, rx, classify)
        assert got == want, f"pattern {pattern} diverges from {rx}"


def test_chain_detection_and_fallback_scope():
    """z == y backtracks in the regex but not in the island rewrite —
    must NOT route to the JVM plan; alternation/grouping likewise."""
    from hive_service_spark.operators.matchpath import _parse_chain

    assert _parse_chain("view.view*.purchase") == (
        "view", "view", "purchase", "*",
    )
    assert _parse_chain("a.b*.c") == ("a", "b", "c", "*")
    assert _parse_chain("a.b+.c") == ("a", "b", "c", "+")
    assert _parse_chain("a.b?.c") == ("a", "b", "c", "?")
    assert _parse_chain("a.b*.b") is None  # z == y: regex backtracks
    assert _parse_chain("a.b+.b") is None
    assert _parse_chain("a.(b|c)*.d") is None
    assert _parse_chain("a.b.c") is None


def test_z_equals_y_pattern_still_exact_via_python_path(spark):
    """The excluded z == y shape must still be answered (by the Python
    automaton) and match the regex model, proving the fallback isn't
    dead code."""
    import itertools

    rows = [
        (i, list(seq))
        for i, seq in enumerate(itertools.product("ABX", repeat=5))
    ]

    def classify(x):
        return {"A": "a", "B": "b"}.get(x, "x")

    got = _mp(spark, rows, "a.b*.b", _CHAIN_SYMS)
    want = _pysim(rows, "ab*b", classify)
    assert got == want


def test_registered_matchpath_plan_has_no_python_stage(spark):
    """seq_matchpath_general's pattern (view.view*.purchase) is in the
    chain class, so its physical plan must contain NO Python/Arrow
    stage — the walk stays in JVM window exec (round-7 advice #4)."""
    from hive_service_spark.plans import inspect as P
    from hive_service_spark.registry import load_all
    from tests.conftest import SF_DIR

    df = load_all()["seq_matchpath_general"].fn(spark, SF_DIR)
    plan = P.formatted_plan(df)
    for marker in ("Python", "Arrow", "Pandas"):
        assert marker not in plan, f"{marker} stage in plan:\n{plan[:600]}"
