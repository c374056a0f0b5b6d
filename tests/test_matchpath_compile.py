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
