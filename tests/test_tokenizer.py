"""BPE trainer (llm/tokenizer.py): the pipe-encoded replace must be
EXACTLY greedy BPE — including runs and adjacent repeats, the cases
where delimiter-sharing encodings silently undercount.

The registered query's values are oracle-checked (tok_bpe_train_merges
hash-matches DuckDB); these tests prove the encoding itself against an
independent reference implementation of greedy BPE merging, and pin
the scale shape (merge rounds are vocabulary-sized, the corpus is
scanned once)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_service_spark.registry import load_all
from tests.conftest import SF_DIR

_SPECS = load_all()


def _ref_bpe_merge(symbols: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right BPE merge of pair (a, b)."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _encode(symbols: list[str]) -> str:
    return "|" + "||".join(symbols) + "|"


def _decode(seq: str) -> list[str]:
    return seq.strip("|").split("||")


@given(
    word=st.text(alphabet="abc", min_size=1, max_size=12),
    pair=st.tuples(
        st.text(alphabet="abc", min_size=1, max_size=2),
        st.text(alphabet="abc", min_size=1, max_size=2),
    ),
)
@settings(max_examples=300, deadline=None)
def test_pipe_replace_is_exact_greedy_bpe(word, pair):
    """For ANY word over a tiny alphabet and ANY merge pair, the
    pipe-encoded string replace equals the reference greedy merge —
    runs ('aaaa' + (a,a)), overlaps, and multi-char symbols included."""
    a, b = pair
    symbols = list(word)
    got = _decode(
        _encode(symbols).replace(f"|{a}||{b}|", f"|{a}{b}|")
    )
    assert got == _ref_bpe_merge(symbols, a, b), (word, pair, got)


def test_bpe_merges_are_distinct_and_ranked(spark):
    rows = _SPECS["tok_bpe_train_merges"].fn(spark, SF_DIR).collect()
    assert [r["merge_rank"] for r in rows] == [1, 2, 3]
    assert len({(r["left_sym"], r["right_sym"]) for r in rows}) == 3
    # counts are non-increasing: a later merge can never beat an
    # earlier one (the earlier argmax would have picked it)
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    for r in rows:
        assert r["merged"] == r["left_sym"] + r["right_sym"]
        assert r["pair_count"] > 0


def test_bpe_round_runs_on_vocabulary_not_corpus(spark):
    """Scale pin: the corpus (documents.parquet) appears in the plan
    exactly once per checkpointed lineage — every merge round's pair
    count derives from the checkpointed word-frequency frame, so its
    plan contains NO documents scan."""
    df = _SPECS["tok_bpe_train_merges"].fn(spark, SF_DIR)
    from hive_service_spark.plans import inspect as P

    plan = P.formatted_plan(df)
    # the final output unions three 1-row checkpointed argmax frames;
    # none of them re-derives from the raw corpus
    assert "documents.parquet" not in plan, plan[:2000]
