"""pipeline_clean_corpus gate-regex fusion (r14): the three
regexp_extract_all passes (EN markers, ES markers, punct class) were
fused into ONE combined-alternation scan classified by array ops. This
property test pins per-pattern extraction equality on generated
adversarial strings — both variants evaluated by the SAME engine
(Spark's regex) in one job, so it tests the actual production
semantics, not a Python re proxy.

Adversarial shapes covered: markers glued to each other and to word
chars (no \\b), '_' and digits (word chars in Java regex), markers as
prefixes of other markers (un/una), punct adjacent to markers, case
variants (patterns are case-sensitive), empty-ish and punct-only
strings, and long random mixtures of all of the above.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from hive_service_spark.llm.pipeline import (
    _EN_RE,
    _ES_RE,
    _GATE_RE,
    _PUNCT_RE,
)
from hive_service_spark.llm.text import _EN_MARKERS, _ES_MARKERS


def _adversarial_strings() -> list[str]:
    rnd = random.Random(14)
    atoms = (
        _EN_MARKERS
        + _ES_MARKERS
        + [m.capitalize() for m in _EN_MARKERS[:4]]
        + [m.upper() for m in _ES_MARKERS[:4]]
        + ["un", "una", "unas", "la", "las", "lass", "then", "a", "y"]
        + ["the_", "_the", "the1", "1the", "a_b", "x", "qué", "ñ"]
        + list(".,;:!?-()[]{}'\"`~@#$%^&*+=|\\/<>")
        + [" ", "", "...", "!!!", "a.", ".a", "y.y", "de,en", "the.the"]
    )
    seps = [" ", "", ".", ",", "  ", "-", "_", "1", "!", "\t"]
    out = [
        "",
        "the a and or of to in is for on with",
        "el la los las de en y que un una por",
        "thethe thela lathe unauna",
        "the,la.de!en?y:un;una",
        "_the_ the_ _the 1the the1",
        "The LA De EN Y",
        "!@#$%^&*()_+-=[]{}|;:'\",.<>?/",
        "a" * 50,
        ("the " * 30).strip(),
    ]
    for _ in range(300):
        n = rnd.randint(1, 25)
        parts = []
        for _ in range(n):
            parts.append(rnd.choice(atoms))
            parts.append(rnd.choice(seps))
        out.append("".join(parts))
    return out


def test_combined_gate_regex_matches_three_passes(spark):
    rows = [(i, s) for i, s in enumerate(_adversarial_strings())]
    df = spark.createDataFrame(rows, "id long, text string")
    hits = F.regexp_extract_all("text", F.lit(_GATE_RE), 0)
    fused = df.select(
        "id",
        F.size(
            F.filter(hits, lambda m: m.isin(*_EN_MARKERS))
        ).alias("en_new"),
        F.size(
            F.filter(hits, lambda m: m.isin(*_ES_MARKERS))
        ).alias("es_new"),
        (
            F.size(hits)
            - F.size(F.filter(hits, lambda m: m.isin(*_EN_MARKERS)))
            - F.size(F.filter(hits, lambda m: m.isin(*_ES_MARKERS)))
        ).alias("punct_new"),
        F.size(F.regexp_extract_all("text", F.lit(_EN_RE))).alias("en_old"),
        F.size(F.regexp_extract_all("text", F.lit(_ES_RE))).alias("es_old"),
        F.size(F.regexp_extract_all("text", F.lit(_PUNCT_RE), 0)).alias(
            "punct_old"
        ),
    )
    bad = fused.where(
        (F.col("en_new") != F.col("en_old"))
        | (F.col("es_new") != F.col("es_old"))
        | (F.col("punct_new") != F.col("punct_old"))
    ).collect()
    assert not bad, bad[:10]


def test_marker_sets_disjoint_no_shared_first_letters():
    """The exactness argument in pipeline.py requires (a) disjoint
    marker sets and (b) no cross-set same-position prefix conflicts;
    (b) is guaranteed by disjoint FIRST LETTERS between the sets. Pin
    both so a future marker-list edit re-opens the fusion question
    loudly instead of silently breaking count equality."""
    assert not set(_EN_MARKERS) & set(_ES_MARKERS)
    en_first = {m[0] for m in _EN_MARKERS}
    es_first = {m[0] for m in _ES_MARKERS}
    assert not en_first & es_first, (en_first, es_first)
