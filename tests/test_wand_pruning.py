"""WAND-style df-capped BM25 (text_bm25_wand_retrieval).

The gate corpus's 31-word vocabulary makes nearly every term hot
(df > n/8), so the registered query's oracle check at sf0.01 mostly
exercises the FALLBACK arm. These tests build a Zipf-ish corpus with
genuine rare terms and pin the other arm: the upper bound proves the
hot-term cut safe, so NOTHING outside the rare candidate set is
enumerated — while the top-3 stays exactly equal to brute force.

WAND reference: Broder et al., "Efficient query evaluation using a
two-level retrieval process", CIKM 2003.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from hive_service_spark.llm.text import (
    _bm25_scored,
    _wand_frames,
    _WAND_RARE_FRACTION_DEN,
)


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """96 docs: 'the'/'of' in every doc (hot, df = n); rare topic words
    in <= n/8 docs each. Doc 0 is the only probe (doc_id % 97 == 0):
    its first six words are [alpha beta gamma the of the], so the
    query mixes three rare terms with two stop words."""
    out = str(tmp_path_factory.mktemp("wand") / "corpus")
    rows = []
    for i in range(96):
        words = ["the", "of", f"junk{i}"]
        if i < 10:
            words += ["alpha"] * (1 + i % 3)
        if i < 8:
            words += ["beta"]
        if i < 6:
            words += ["gamma"] * 2
        if i == 0:
            words = ["alpha", "beta", "gamma", "the", "of", "the"] + words
        text = " ".join(words)
        rows.append((i, text, "en", "unit", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    import os

    os.makedirs(out, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_prune_engages_and_enumerates_nothing_extra(spark, corpus_dir):
    """alpha/beta/gamma have df 10/8/6 <= 96/8 = 12 -> rare; 'the'/'of'
    have df 96 -> hot. Rare idf_q (~2200) dwarfs hot idf_q (~5), so
    theta3 (3rd-best rare-candidate full score) strictly beats the
    summed hot upper bound: the bound must declare the query SAFE and
    the fallback enumeration must stay empty."""
    frames = _wand_frames(spark, corpus_dir)
    assert frames["unsafe"].count() == 0, (
        "bound failed to prove safety on a corpus built to be prunable"
    )
    assert frames["extra_keys"].count() == 0
    # candidate set = union of the rare terms' postings only: docs 0-9
    cand_docs = {
        r["doc_id"] for r in frames["cand_keys"].select("doc_id").collect()
    }
    assert cand_docs == set(range(10)), cand_docs


def test_wand_top3_equals_bruteforce(spark, corpus_dir):
    """Exactness on the prunable corpus: WAND's top-3 (score AND
    doc_id tie-break) must equal brute force over all candidates."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    brute = (
        _bm25_scored(spark, corpus_dir)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("query_id", "rnk", "doc_id", "score")
        .collect()
    )
    wand = (
        _wand_frames(spark, corpus_dir)["full"]
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("query_id", "rnk", "doc_id", "score")
        .collect()
    )
    assert sorted(map(tuple, wand)) == sorted(map(tuple, brute))
    assert len(wand) == 3  # one probe query, full top-3


def test_rare_fraction_is_scale_invariant():
    """The cap is RELATIVE (df * den <= n): growing the corpus with
    fixed term frequencies must not reclassify terms — the failure
    mode of an absolute cap (everything goes hot, WAND degenerates to
    always-fallback)."""
    for n, df in ((96, 12), (96_000, 12_000), (96_000_000, 12_000_000)):
        assert df * _WAND_RARE_FRACTION_DEN <= n
        assert (df * 9) * _WAND_RARE_FRACTION_DEN > n  # just over -> hot
