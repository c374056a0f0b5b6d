"""LLM-pipeline extension — text analysis over `documents`.

Beyond the reference surface (BASELINE.json mandate): language ID,
quality scoring, token counting, n-gram stats (the reference's `ngrams`
UDAF re-expressed), and content fingerprinting. Everything is pure
Column expressions / explode pipelines — JVM-side, codegen-friendly, no
Python UDFs — so the same code runs unchanged on a 100 TB corpus: the
only shuffles are the final groupBys, and those are on bounded keys
(word, lang) or pre-aggregated per-doc rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.registry import persisted, query

# deterministic marker lists for the language-ID heuristic
_EN_MARKERS = "the a and or of to in is for on with".split()
_ES_MARKERS = "el la los las de en y que un una por".split()

_TOKEN_ORACLE = """
SELECT
  doc_id,
  length(text)                                        AS n_chars_actual,
  len(string_split(text, ' '))                        AS n_ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_ish,
  len(list_distinct(string_split(text, ' ')))         AS n_unique_words,
  length(replace(text, ' ', ''))                      AS n_nonspace_chars
FROM documents
"""


@query("text_token_stats", oracle=_TOKEN_ORACLE)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer
    (letters / digits / single punctuation, the pre-tokenizer split
    most BPE vocabularies assume)."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        F.size(words).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(
                "text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
            )
        ).alias("n_bpe_ish"),
        F.size(F.array_distinct(words)).alias("n_unique_words"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias(
            "n_nonspace_chars"
        ),
    )


_QUALITY_ORACLE = """
SELECT
  doc_id,
  n_words,
  mean_word_len,
  punct_ratio,
  stop_ratio,
  CASE WHEN n_words >= 20 AND stop_ratio > 0.02 AND punct_ratio < 0.2
       THEN 1 ELSE 0 END AS keep_flag
FROM (
  SELECT
    doc_id,
    len(string_split(text, ' ')) AS n_words,
    ROUND(length(replace(text, ' ', '')) * 1.0
          / len(string_split(text, ' ')), 4) AS mean_word_len,
    ROUND(len(regexp_extract_all(text, '[[:punct:]]')) * 1.0
          / length(text), 6) AS punct_ratio,
    ROUND(len(regexp_extract_all(text,
          '\\b(the|a|and|or|of|to|in|is|for|on|with)\\b')) * 1.0
          / len(string_split(text, ' ')), 6) AS stop_ratio
  FROM documents
)
"""


@query("text_quality_scores", oracle=_QUALITY_ORACLE)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation ratio / stopword ratio +
    a keep/drop gate — the standard pretraining-corpus filter shape
    (C4/Gopher-style rules), computed fully JVM-side."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    mean_word_len = F.round(
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n_words, 4
    )
    punct_ratio = F.round(
        F.size(F.regexp_extract_all("text", F.lit(r"[\!-/\:-@\[-`\{-~]")))
        / F.length("text"),
        6,
    )
    stop_re = r"\b(" + "|".join(_EN_MARKERS) + r")\b"
    stop_ratio = F.round(
        F.size(F.regexp_extract_all("text", F.lit(stop_re))) / n_words, 6
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        F.when(
            (n_words >= 20) & (stop_ratio > 0.02) & (punct_ratio < 0.2), 1
        )
        .otherwise(0)
        .alias("keep_flag"),
    )


_LANGID_ORACLE = """
SELECT
  doc_id,
  lang AS labeled_lang,
  CASE WHEN en_hits >= es_hits AND en_hits > 0 THEN 'en'
       WHEN es_hits > en_hits THEN 'es'
       ELSE 'unknown' END AS predicted_lang,
  en_hits,
  es_hits
FROM (
  SELECT doc_id, lang,
    len(regexp_extract_all(text, '\\b(the|a|and|or|of|to|in|is|for|on|with)\\b')) AS en_hits,
    len(regexp_extract_all(text, '\\b(el|la|los|las|de|en|y|que|un|una|por)\\b')) AS es_hits
  FROM documents
)
"""


@query("text_langid_heuristic", oracle=_LANGID_ORACLE)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (n-gram-heuristic family): count hits
    from per-language function-word lists, argmax. At 100 TB this stays
    one regexp pass per language over each doc — no shuffle at all
    until a downstream groupBy."""
    d = load(spark, sf_dir, "documents")
    en_re = r"\b(" + "|".join(_EN_MARKERS) + r")\b"
    es_re = r"\b(" + "|".join(_ES_MARKERS) + r")\b"
    en_hits = F.size(F.regexp_extract_all("text", F.lit(en_re)))
    es_hits = F.size(F.regexp_extract_all("text", F.lit(es_re)))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when((en_hits >= es_hits) & (en_hits > 0), "en")
        .when(es_hits > en_hits, "es")
        .otherwise("unknown")
        .alias("predicted_lang"),
        en_hits.alias("en_hits"),
        es_hits.alias("es_hits"),
    )


_FINGERPRINT_ORACLE = """
SELECT
  doc_id,
  md5(lower(text))                                   AS content_md5,
  list_reduce(
    list_transform(string_split(lower(text), ' '),
                   w -> length(w) * 17 + ascii(w)),
    (h, x) -> (h * 31 + x) % 1000000007)             AS rolling_hash
FROM documents
"""


@query("text_fingerprint", oracle=_FINGERPRINT_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: canonical md5 + a polynomial rolling
    hash over the word stream (Karp-Rabin family), both as pure
    expressions (F.aggregate ≙ list_reduce)."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.lower("text"), " ")
    rolling = F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda h, w: (h * 31 + F.length(w) * 17 + F.ascii(w)) % 1000000007,
    )
    return d.select(
        "doc_id",
        F.md5(F.lower("text")).alias("content_md5"),
        rolling.alias("rolling_hash"),
    )


_NGRAM_ORACLE = """
SELECT gram, COUNT(*) AS freq
FROM (
  SELECT unnest(list_transform(
           generate_series(1, len(w) - 1),
           i -> w[i] || ' ' || w[i+1])) AS gram
  FROM (SELECT string_split(text, ' ') AS w FROM documents)
)
GROUP BY gram
ORDER BY freq DESC, gram
LIMIT 30
"""


@query("text_ngrams_top", oracle=_NGRAM_ORACLE)
def text_ngrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `ngrams` UDAF (SURVEY.md §2.3 — no Spark
    builtin) re-expressed as transform→explode→groupBy: bigram
    frequency top-k. Shuffle key = gram (bounded cardinality);
    partial aggregation keeps the shuffle small at scale."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    # guard the short-doc edge (round-13 review): sequence(0, -1) is a
    # DESCENDING [0, -1] in Spark, and element_at(w, 0) then throws
    # INVALID_INDEX_OF_ZERO — a 1-word document would crash the job
    # where the oracle's generate_series is simply empty
    grams = F.when(F.size(w) >= 2, F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.concat_ws(" ", F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "gram")
        .limit(30)
    )


# --- context_ngrams: most frequent completions of a 2-word context ----------

_CONTEXT_NGRAM_ORACLE = """
SELECT ctx_w1 || ' ' || ctx_w2 AS context, w3 AS completion,
       COUNT(*) AS freq
FROM (
  SELECT unnest(list_transform(generate_series(1, len(w) - 2),
                i -> {'c1': w[i], 'c2': w[i+1], 'c3': w[i+2]})) AS g
  FROM (SELECT string_split(text, ' ') AS w FROM documents)
), LATERAL (SELECT g.c1 AS ctx_w1, g.c2 AS ctx_w2, g.c3 AS w3)
WHERE ctx_w2 = 'the'
GROUP BY 1, 2
ORDER BY freq DESC, context, completion
LIMIT 30
"""


@query("text_context_ngrams", oracle=_CONTEXT_NGRAM_ORACLE)
def text_context_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `context_ngrams` UDAF (SURVEY.md §2.3:
    `context_ngrams(sentences, array(null,'the',null), k)` — no Spark
    builtin): top completions of every "<w> the ___" context. Same
    explode→filter→groupBy pipeline as `ngrams`, with the context
    filter applied BEFORE the shuffle so only matching trigrams move —
    at 100 TB the filter drops ~99% of grams map-side."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    # same short-doc guard as text_ngrams_top (round-13 review): a
    # <3-word document's sequence(0, -1) walks DESCENDING into
    # element_at(w, 0) and crashes where the oracle is just empty
    tri = F.when(F.size(w) >= 3, F.transform(
        F.sequence(F.lit(0), F.size(w) - 3),
        lambda i: F.struct(
            F.element_at(w, i + 1).alias("c1"),
            F.element_at(w, i + 2).alias("c2"),
            F.element_at(w, i + 3).alias("c3"),
        ),
    )).otherwise(
        F.array().cast("array<struct<c1:string,c2:string,c3:string>>")
    )
    g = d.select(F.explode(tri).alias("g")).where(F.col("g.c2") == "the")
    return (
        g.select(
            F.concat_ws(" ", "g.c1", "g.c2").alias("context"),
            F.col("g.c3").alias("completion"),
        )
        .groupBy("context", "completion")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "context", "completion")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# repetition filtering (Gopher-style quality signals)
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
SELECT doc_id, top_bigram_ratio, dup_word_frac,
       CASE WHEN top_bigram_ratio <= 0.08 AND dup_word_frac <= 0.6
            THEN 1 ELSE 0 END AS keep_flag
FROM (
  SELECT doc_id,
    ROUND(list_max(list_transform(list_distinct(bg),
          g -> len(list_filter(bg, x -> x = g)))) * 1.0 / len(bg), 4)
      AS top_bigram_ratio,
    ROUND(1.0 - len(list_distinct(w)) * 1.0 / len(w), 4) AS dup_word_frac
  FROM (
    SELECT doc_id,
           list_transform(generate_series(1, len(w)-1),
                          i -> w[i]||' '||w[i+1]) AS bg,
           w
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    WHERE len(w) >= 2
  )
)
"""


@query("text_repetition_filter", oracle=_REPETITION_ORACLE)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filtering (the Gopher/MassiveText rules
    family): per-doc top-bigram frequency ratio and duplicate-word
    fraction, with a keep/drop flag (thresholds at ~p90 of this
    corpus). Entirely map-side array expressions — the per-doc
    distinct-gram counting is O(distinct x grams) inside one row, there
    is NO shuffle at all, so at 100 TB this runs scan-speed with
    perfect parallelism (quality scoring is the canonical
    embarrassingly-parallel corpus pass)."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    bg = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i), F.element_at(w, i + 1)
        ),
    )
    base = d.where(F.size(w) >= 2).select(
        "doc_id", bg.alias("bg"), w.alias("w")
    )
    top = F.array_max(
        F.transform(
            F.array_distinct("bg"),
            lambda g: F.size(F.filter("bg", lambda x: x == g)),
        )
    )
    scored = base.select(
        "doc_id",
        F.round(top / F.size("bg"), 4).alias("top_bigram_ratio"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("w")) / F.size("w"), 4
        ).alias("dup_word_frac"),
    )
    return scored.withColumn(
        "keep_flag",
        F.when(
            (F.col("top_bigram_ratio") <= 0.08)
            & (F.col("dup_word_frac") <= 0.6),
            1,
        ).otherwise(0),
    )


_PII_ORACLE = r"""
WITH aug AS (
  SELECT doc_id, source,
         text || ' contact user' || doc_id ||
         '@mail' || (doc_id % 7) || '.example.com or call 555-' ||
         lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
         CASE WHEN doc_id % 3 = 0
              THEN ' ssn ' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
                   || '-' || lpad((doc_id % 100)::VARCHAR, 2, '0')
                   || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
              ELSE '' END AS text
  FROM documents
),
red AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
         len(regexp_extract_all(text, '\b555-[0-9]{4}\b')) AS n_phones,
         len(regexp_extract_all(text,
           '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS n_ssns,
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
           '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
  FROM aug
)
SELECT source,
       CAST(SUM(n_emails) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phones) AS BIGINT) AS phones_redacted,
       CAST(SUM(n_ssns) AS BIGINT)   AS ssns_redacted,
       CAST(SUM(CASE WHEN n_emails + n_phones + n_ssns > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_touched,
       CAST(SUM(len(redacted)) AS BIGINT) AS redacted_chars,
       CAST(SUM(CASE WHEN redacted LIKE '%@%' THEN 1 ELSE 0 END)
            AS BIGINT) AS leak_check
FROM red GROUP BY source ORDER BY source
"""


@query("text_pii_redaction", oracle=_PII_ORACLE)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every training-data pipeline
    runs before tokenization (emails / phone numbers / SSN-shaped ids
    -> placeholder tokens). The synthetic corpus carries no PII, so a
    deterministic doc_id-derived injection runs first ON BOTH ENGINES,
    making every regex path value-checkable with nonzero counts
    (leak_check pins that no email survives redaction). Map-only: at
    100 TB this is a pure scan->regexp->write pipeline, no shuffle
    except the final per-source rollup."""
    d = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" ssn "),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\b555-[0-9]{4}\b"
    ssn_re = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
    red = (
        d.select("doc_id", "source", aug.alias("text"))
        .select(
            "doc_id",
            "source",
            F.size(F.regexp_extract_all("text", F.lit(email_re), F.lit(0)))
            .alias("n_emails"),
            F.size(F.regexp_extract_all("text", F.lit(phone_re), F.lit(0)))
            .alias("n_phones"),
            F.size(F.regexp_extract_all("text", F.lit(ssn_re), F.lit(0)))
            .alias("n_ssns"),
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("text", email_re, "<EMAIL>"),
                    ssn_re,
                    "<SSN>",
                ),
                phone_re,
                "<PHONE>",
            ).alias("redacted"),
        )
    )
    return (
        red.groupBy("source")
        .agg(
            F.sum("n_emails").cast("bigint").alias("emails_redacted"),
            F.sum("n_phones").cast("bigint").alias("phones_redacted"),
            F.sum("n_ssns").cast("bigint").alias("ssns_redacted"),
            F.sum(
                F.when(
                    F.col("n_emails") + F.col("n_phones") + F.col("n_ssns")
                    > 0,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("docs_touched"),
            F.sum(F.length("redacted")).cast("bigint").alias("redacted_chars"),
            F.sum(
                F.when(F.col("redacted").contains("@"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("leak_check"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# feature-hashing embeddings: documents -> vectors without a model
# ---------------------------------------------------------------------------

_HE_DIM = 64
_HE_QMOD = 37  # every 37th doc serves as a query probe ...
_HE_QCAP = 7400  # ... capped at doc_id < 7400 (≤200 probes at ANY sf —
# the same fixed-cap discipline as knn_cosine_bruteforce: without it
# the broadcast side and the O(probes·corpus) search grow linearly
# with the corpus)

_HASH_EMBED_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
),
tf AS (
  SELECT doc_id,
         (('0x' || substr(md5(t), 1, 8))::BIGINT % {_HE_DIM}) AS b,
         COUNT(*)::DOUBLE AS c
  FROM tok GROUP BY 1, 2
),
ids AS (SELECT DISTINCT doc_id FROM tf),
grid AS (
  SELECT ids.doc_id, g.i AS b
  FROM ids CROSS JOIN (SELECT unnest(generate_series(0, {_HE_DIM - 1})) AS i) g
),
vec AS (
  SELECT grid.doc_id, list(COALESCE(tf.c, 0.0) ORDER BY grid.b) AS e
  FROM grid LEFT JOIN tf ON tf.doc_id = grid.doc_id AND tf.b = grid.b
  GROUP BY grid.doc_id
),
n AS (SELECT doc_id, e, sqrt(list_dot_product(e, e)) AS nr FROM vec),
q AS (SELECT * FROM n WHERE doc_id % {_HE_QMOD} = 0 AND doc_id < {_HE_QCAP}),
scored AS (
  SELECT q.doc_id AS doc_id, c.doc_id AS neighbor_id,
         ROUND(list_dot_product(q.e, c.e) / (q.nr * c.nr), 4) + 0.0 AS cosine
  FROM q JOIN n c ON q.doc_id <> c.doc_id
)
SELECT doc_id, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn = 1
"""


def _hash_vec_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 64-dim hash-embedding per document plus its L2 norm —
    the shared featurizer of text_hash_embed_knn and the hybrid-RRF
    fusion. Returns (doc_id, e:array<double>, nr:double), persisted
    (both consumers probe it from two aliases)."""
    from hive_service_spark.catalog import par
    from hive_service_spark.llm.dedup import _h
    from hive_service_spark.llm.similarity import _dot

    tok = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    tf = (
        tok.select("doc_id", (_h(F.col("t")) % _HE_DIM).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    vec = (
        tf.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("m"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(_HE_DIM - 1)),
                lambda i: F.coalesce(
                    F.element_at("m", i.cast("bigint")), F.lit(0.0)
                ),
            ).alias("e"),
        )
    )
    return persisted(
        vec.repartition(par(spark))
        .withColumn("nr", F.sqrt(_dot(F.col("e"), F.col("e"))))
    )


@query("text_hash_embed_knn", oracle=_HASH_EMBED_ORACLE)
def text_hash_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-embeddings (the feature-hashing trick) + exact top-1
    neighbor: every document becomes a dense 64-dim term-frequency
    vector with NO model — token -> md5-derived bucket, value = count —
    then each sampled probe doc (doc_id % 37 = 0 AND doc_id < 7400,
    i.e. a FIXED ≤200-probe set at any sf) finds its nearest corpus
    neighbor by cosine. This closes the documents->vectors gap:
    the similarity/dedup stack (LSH, IVF, SemDeDup) otherwise assumes a
    pre-supplied `embeddings` table; hash-embeddings derive one from
    raw text deterministically in pure JVM expressions, so the oracle
    replays featurization AND search end-to-end.

    Engine-lockstep notes: bucket hash is the shared 32-bit md5 prefix
    (`_h`, llm/dedup.py) mod 64 (non-negative on both sides); all dot
    products are sums of products of integer counts — exact in double
    at any summation order — and norms are correctly-rounded sqrts, so
    the rounded cosine and its ORDER BY are bit-identical across
    engines.

    Scale (100 TB): featurization is one narrow map + a
    (doc, bucket<=64) partial-combine groupBy + a 64-cell map-assembly
    groupBy per doc — embarrassingly parallel; the probe is the
    broadcast-sample exact-search pattern of knn_cosine_bruteforce
    (bounded query set, one corpus map pass). A full-corpus ANN over
    these derived vectors reuses the LSH/IVF index paths unchanged
    (same array<double> shape as the embeddings table)."""
    from hive_service_spark.llm.similarity import _dot
    from pyspark.sql import Window

    n = _hash_vec_frame(spark, sf_dir)
    q = n.where(
        (F.col("doc_id") % _HE_QMOD == 0) & (F.col("doc_id") < _HE_QCAP)
    )
    cos = F.round(
        _dot(F.col("q.e"), F.col("c.e")) / (F.col("q.nr") * F.col("c.nr")), 4
    )
    scored = (
        F.broadcast(q.alias("q"))
        .join(n.alias("c"), F.col("q.doc_id") != F.col("c.doc_id"))
        .select(
            F.col("q.doc_id").alias("doc_id"),
            F.col("c.doc_id").alias("neighbor_id"),
            (cos + 0.0).alias("cosine"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# character-entropy filter (gibberish / low-information detection)
# ---------------------------------------------------------------------------

_ENTROPY_MIN = 3.0  # bits/char below which text reads as degenerate

_ENTROPY_ORACLE = f"""
WITH chars AS (
  SELECT doc_id, c, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '')) AS c
        FROM documents)
  GROUP BY doc_id, c
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_chars_counted,
         CAST(COUNT(*) AS BIGINT) AS distinct_chars,
         CAST(SUM(cnt * CAST(ROUND(log2(CAST(cnt AS DOUBLE)) * 1000000)
                             AS BIGINT)) AS BIGINT) AS s_q
  FROM chars GROUP BY doc_id
)
SELECT doc_id, n_chars_counted, distinct_chars,
       ROUND(log2(CAST(n_chars_counted AS DOUBLE))
             - CAST(s_q AS DOUBLE) / n_chars_counted / 1000000.0, 4) + 0.0
         AS entropy_bits,
       (log2(CAST(n_chars_counted AS DOUBLE))
        - CAST(s_q AS DOUBLE) / n_chars_counted / 1000000.0)
         >= {_ENTROPY_MIN} AS keep_flag
FROM per_doc
"""


@query("text_entropy_filter", oracle=_ENTROPY_ORACLE)
def text_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy filter — the gibberish/low-information gate
    (key-mash, repeated-char padding, binary-in-text) that sits next
    to the length/stopword rules in crawl cleaning. Shannon entropy is
    computed from exact integer counts via
    H = log2(n) − (Σ c·log2(c)) / n, with the per-character
    c·log2(c) terms BIGINT-quantized (round(1e6·log2 c)) so the sum is
    order-independent and both engines derive H from the SAME two
    integers with identical float steps. Scale: one map-side-combined
    (doc, char) count — alphabet-bounded per doc — and one per-doc
    aggregate; no Python, no shuffle beyond the two groupBys."""
    d = load(spark, sf_dir, "documents")
    chars = (
        d.select(
            "doc_id", F.explode(F.split(F.lower("text"), "")).alias("c")
        )
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = chars.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_chars_counted"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chars"),
        F.sum(
            F.col("cnt")
            * F.round(F.log2(F.col("cnt").cast("double")) * 1000000).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("s_q"),
    )
    h = (
        F.log2(F.col("n_chars_counted").cast("double"))
        - F.col("s_q").cast("double") / F.col("n_chars_counted") / 1000000.0
    )
    return per_doc.select(
        "doc_id",
        "n_chars_counted",
        "distinct_chars",
        (F.round(h, 4) + 0.0).alias("entropy_bits"),
        (h >= _ENTROPY_MIN).alias("keep_flag"),
    )


# ---------------------------------------------------------------------------
# BM25 lexical retrieval — the keyword side of the similarity stack
# ---------------------------------------------------------------------------

# Okapi BM25 with k1=1.2, b=0.75 (Robertson & Walker 1994), carried out
# in exact integer arithmetic so both engines rank identically:
#   idf_q  = floor(1024 * ln((N - df + 0.5)/(df + 0.5) + 1))     [BIGINT]
#   avgdl  = floor(avg(dl))                                      [BIGINT]
#   tfpart = tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl))
#          = 22*tf*avgdl / (10*tf*avgdl + 3*avgdl + 9*dl)   (x10 rational
#            form — numerator and denominator are exact integers)
#   c      = floor(1000.0 * idf_q * 22*tf*avgdl / den)           [BIGINT]
#   score  = sum(c)  — an exact integer sum, order-independent.
# floor (never round) on every quantization: floor of a double is the
# same bits on both engines, while round-to-int of a shortest-repr
# double can flip on .5-adjacent values (the half-cent divergence the
# verify recipe documents).
# shared CTE block: everything through the per-(query, doc) integer
# BM25 scores — reused verbatim by the hybrid-RRF oracle below
_BM25_QMOD = 97  # every 97th doc serves as a query probe ...
_BM25_QCAP = 9700  # ... capped at doc_id < 9700 (≤100 probes at ANY sf —
# the _HE_QCAP discipline: without the cap the probe set, the q_idf
# broadcast, and the probe×postings candidate space all grow linearly
# with the corpus; with it they are fixed-size at 100 TB)
_BM25_CTES = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
dl AS (SELECT doc_id, len(w) AS dl FROM docs),
stats AS (
  SELECT COUNT(*) AS n, CAST(FLOOR(AVG(dl)) AS BIGINT) AS avgdl FROM dl
),
post AS (
  SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(w) AS t FROM docs)
  GROUP BY doc_id, t
),
idf AS (
  SELECT term,
         CAST(FLOOR(1024 * LN((n - df + 0.5) / (df + 0.5) + 1)) AS BIGINT)
           AS idf_q
  FROM (SELECT term, COUNT(*) AS df FROM post GROUP BY term), stats
),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, t AS term
  FROM (SELECT doc_id, unnest(w[1:6]) AS t FROM docs
        WHERE doc_id % {_BM25_QMOD} = 0 AND doc_id < {_BM25_QCAP})
),
cand AS (
  SELECT q.query_id, p.doc_id,
         CAST(FLOOR(1000.0 * i.idf_q * 22 * p.tf * s.avgdl /
              (10 * p.tf * s.avgdl + 3 * s.avgdl + 9 * d.dl)) AS BIGINT) AS c
  FROM qterms q
  JOIN idf i ON i.term = q.term
  JOIN post p ON p.term = q.term
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score
  FROM cand GROUP BY query_id, doc_id
)
"""

_BM25_ORACLE = _BM25_CTES + """
SELECT query_id, rnk, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT)
           AS rnk
  FROM scored
)
WHERE rnk <= 3
ORDER BY query_id, rnk
"""


def _bm25_contrib() -> F.Column:
    """The per-(posting, query-term) integer BM25 contribution — the
    exact-rational form of _BM25_CTES' `c` (needs tf, dl, idf_q, avgdl
    columns in scope)."""
    den = (
        F.lit(10) * F.col("tf") * F.col("avgdl")
        + F.lit(3) * F.col("avgdl")
        + F.lit(9) * F.col("dl")
    )
    return (
        F.floor(
            F.lit(1000.0)
            * F.col("idf_q")
            * 22
            * F.col("tf")
            * F.col("avgdl")
            / den
        ).cast("bigint")
    )


def _bm25_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The shared BM25 retrieval index: (post, idf, qterms).

    post   = inverted postings (doc_id, dl, term, tf) — one corpus pass
    idf    = per-term (term, df, avgdl, idf_q) — df kept so callers can
             split rare/hot terms (the WAND variant's pruning key)
    qterms = the capped probe set's distinct (query_id, term) pairs
    """
    # NOTE (r13): deliberately NO repartition off the single-split
    # scan here — measured 0.9s SLOWER at bench scale (the corpus is
    # 5k docs / 270k tokens, so the index build is orchestration-bound
    # and the extra exchange only adds a stage); at 100 TB the scan
    # has thousands of splits and parallelism comes free. Contrast the
    # dedup shingle pipeline, whose repartition feeds a pair-space
    # explosion that IS compute-bound even at bench scale.
    d = persisted(
        load(spark, sf_dir, "documents").select(
            "doc_id", F.split("text", " ").alias("w")
        )
        .withColumn("dl", F.size("w").cast("bigint"))
        # consumed three times: stats, postings, probe extraction
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.avg("dl")).cast("bigint").alias("avgdl"),
    )
    post = (
        d.select("doc_id", "dl", F.explode("w").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        post.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "df",
            "n",
            "avgdl",
            F.floor(
                F.lit(1024)
                * F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
            )
            .cast("bigint")
            .alias("idf_q"),
        )
    )
    qterms = (
        d.where(
            (F.col("doc_id") % _BM25_QMOD == 0)
            & (F.col("doc_id") < _BM25_QCAP)
        )
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("w", 1, 6)).alias("term"),
        )
        .distinct()
    )
    return post, idf, qterms


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-quantized BM25 scores per (query, candidate doc) —
    the shared core of text_bm25_retrieval and the hybrid-RRF fusion.
    Returns columns (query_id, doc_id, score:BIGINT)."""
    post, idf, qterms = _bm25_index(spark, sf_dir)
    # probe set ⋈ idf first: result is <= |queries| x 6 rows — THAT is
    # what broadcasts into the corpus-sized postings frame (bounded by
    # the _BM25_QCAP probe cap, not sf-scaled)
    q_idf = qterms.join(idf, "term").select(
        "query_id", "term", "idf_q", "avgdl"
    )
    cand = post.join(F.broadcast(q_idf), "term").select(
        "query_id", "doc_id", _bm25_contrib().alias("c")
    )
    return cand.groupBy("query_id", "doc_id").agg(
        F.sum("c").cast("bigint").alias("score")
    )


@query("text_bm25_retrieval", oracle=_BM25_ORACLE)
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-3 lexical retrieval over an inverted term index — the
    keyword complement of the embedding ANN stack (reference surface:
    nothing in Hive 2.3; this is the extension's retrieval family next
    to knn_cosine_bruteforce / ann_lsh_*). Probe queries are derived
    deterministically from the corpus (every 97th doc's first six
    words), so the probe set is non-empty at every scale factor and
    self-retrieval doubles as a sanity gauge.

    Plan shape, 100 TB reading: ONE corpus pass builds the postings
    list (explode + map-side-combined groupBy — the inverted-index
    build), one aggregation derives df -> idf; the tiny probe set joins
    idf first (broadcast, yields <= |queries| x 6 rows) and THEN hits
    postings as a broadcast map-side filter, so the corpus-sized
    postings frame is never shuffled for candidate generation.
    Candidates are bounded by sum(df) over the query's terms; the
    top-3 cut is a per-query window over only those candidates. A
    production deployment adds impact-ordered / df-capped postings
    (WAND-style pruning) to bound hot-term fanout — a ranking-neutral
    optimization for top-k, omitted here to keep the oracle exact.
    Scoring is integer-quantized BM25 (see _BM25_CTES) so ranks
    cannot diverge on float ulps."""
    from pyspark.sql import Window

    scored = _bm25_scored(spark, sf_dir)
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn(
            "rnk", F.row_number().over(w_rank).cast("bigint")
        )
        .where(F.col("rnk") <= 3)
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# WAND-style df-capped retrieval — bounded candidate generation
# ---------------------------------------------------------------------------

# rare = appears in at most 1/8 of the corpus — a RELATIVE cap, so the
# rare/hot split is scale-invariant (an absolute df cap silently turns
# every term hot as the corpus grows, reducing WAND to the fallback)
_WAND_RARE_FRACTION_DEN = 8


@query("text_bm25_wand_retrieval", oracle=_BM25_ORACLE)
def text_bm25_wand_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-3 with WAND-style df-capped candidate generation —
    IDENTICAL results to text_bm25_retrieval (same oracle), reached
    without materializing the hot-term candidate space (round-6
    stretch #8; the WAND idea: Broder et al., CIKM'03).

    text_bm25_retrieval joins the probe terms against the FULL
    postings of every query term, so one stop-word-like term with
    df = millions fans a query out to millions of candidate rows. Here
    candidates come only from RARE terms (df <= n/8 — a relative cap,
    scale-invariant where an absolute one silently goes all-hot as the
    corpus grows); candidates are then rescored against ALL the
    query's terms via a bounded (doc_id, term) equi-join. Hot terms
    are handled by an upper bound, never by enumeration:

      ub_t       = max over t's postings of t's integer contribution
                   (an aggregate scan — map-side-combined max, no
                   candidate materialization)
      hot_ub(q)  = sum of ub_t over q's hot terms
      theta3(q)  = the 3rd-best FULL score among q's rare candidates

    A doc outside the candidate set matches only hot terms, so it
    scores <= hot_ub; if hot_ub < theta3 STRICTLY, no outside doc can
    reach the top-3 (strictness also protects the doc_id tie-break) —
    the cut is provably unreachable, which is what keeps the oracle
    exact rather than approximate. Queries where the bound does NOT
    prove safety (all-hot queries, fewer than 3 rare candidates) fall
    back to full enumeration FOR THOSE QUERIES ONLY — exactness never
    depends on the cap being right, only speed does. NOTE on the
    synthetic gate corpus: its vocabulary is 31 words, 30 of which
    appear in >1/8 of all docs, so here most probes legitimately fall
    back (the bound correctly refuses to prune a stop-word-only
    query); tests/test_wand_pruning.py proves the prune ENGAGES — and
    enumerates nothing outside the rare candidate set — on a Zipf-ish
    handcrafted corpus.

    100 TB reading: candidate volume is O(probes x terms x df_cap)
    instead of O(probes x sum(df)); the hot terms' postings are
    touched only by two aggregate passes (idf build, ub max), both
    map-side combined. The fallback is per-query, so a pathological
    probe degrades itself, not the batch."""
    from pyspark.sql import Window

    full = _wand_frames(spark, sf_dir)["full"]
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        full.withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


def _wand_frames(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The WAND pipeline's intermediate frames, exposed so tests can
    pin that the bound actually PRUNES (unsafe/extra empty) on a
    corpus with real rare terms — see text_bm25_wand_retrieval."""
    from pyspark.sql import Window

    post, idf, qterms = _bm25_index(spark, sf_dir)
    post = persisted(post)  # consumed by: ub agg, rare cand, rescore
    q_idf = persisted(
        qterms.join(idf, "term").select(
            "query_id", "term", "idf_q", "avgdl", "df", "n"
        )
    )
    is_rare = F.col("df") * _WAND_RARE_FRACTION_DEN <= F.col("n")
    rare_q = q_idf.where(is_rare)
    hot_q = q_idf.where(~is_rare)

    # phase 1 — candidates from rare terms only (bounded by df cap)
    cand_keys = persisted(
        post.join(rare_q.select("query_id", "term"), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    # full rescore: every (candidate doc, query term) pair looked up in
    # postings by (doc_id, term) equi-join — missing terms contribute 0
    def _rescore(keys: DataFrame) -> DataFrame:
        pairs = keys.join(
            q_idf.select("query_id", "term", "idf_q", "avgdl"), "query_id"
        )
        return (
            pairs.join(post, ["doc_id", "term"])
            .select("query_id", "doc_id", _bm25_contrib().alias("c"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum("c").cast("bigint").alias("score"))
        )

    scored_cand = persisted(_rescore(cand_keys))

    # phase 2 — the hot-term upper bound vs the candidates' 3rd best
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    theta3 = (
        scored_cand.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") == 3)
        .select("query_id", F.col("score").alias("theta3"))
    )
    ub = (
        post.join(
            hot_q.select("term", "idf_q", "avgdl").distinct(), "term"
        )
        .select("term", _bm25_contrib().alias("c"))
        .groupBy("term")
        .agg(F.max("c").alias("ub"))
    )
    hot_ub = (
        hot_q.select("query_id", "term")
        .join(ub, "term")
        .groupBy("query_id")
        .agg(F.sum("ub").alias("hot_ub"))
    )
    unsafe = (
        q_idf.select("query_id")
        .distinct()
        .join(hot_ub, "query_id", "left")
        .join(theta3, "query_id", "left")
        .where(
            F.col("hot_ub").isNotNull()
            & (F.col("theta3").isNull() | (F.col("hot_ub") >= F.col("theta3")))
        )
        .select("query_id")
    )

    # phase 3 — full enumeration ONLY for queries the bound can't
    # clear. r13 optimization (guide §2.4/§2.3): the old shape built
    # the extra (query, doc) key set from one postings pass
    # (join+distinct), then _rescore exploded keys x ALL query terms
    # and equi-joined postings a SECOND time on (doc_id, term) — two
    # full touches of the postings frame plus a pair-space explode,
    # and at the gate corpus (all-hot vocabulary, every probe falls
    # back) that chain dominated the query. An unsafe query's full
    # enumeration is exactly the plain BM25 plan, so score it that
    # way: ONE postings pass against the BROADCAST (probe-capped,
    # <= |unsafe| x 6 rows) unsafe-query term frame, map-side-combined
    # sum per (query, doc), then anti-join the already-scored rare
    # candidates out. Value-identical: full-enumeration pairs minus
    # rare-candidate pairs IS the old extra set (a doc matching only
    # rare terms is in cand_keys; matching only hot terms, in extra;
    # matching neither, in neither), and each pair's score sums the
    # same matched-term contributions.
    unsafe_terms = (
        q_idf.join(unsafe, "query_id")
        .select("query_id", "term", "idf_q", "avgdl")
    )
    extra_scored = (
        post.join(F.broadcast(unsafe_terms), "term")
        .select("query_id", "doc_id", _bm25_contrib().alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").cast("bigint").alias("score"))
        .join(cand_keys, ["query_id", "doc_id"], "left_anti")
    )
    full = scored_cand.unionByName(extra_scored)
    return {
        "cand_keys": cand_keys,
        "unsafe": unsafe,
        "extra_keys": extra_scored.select("query_id", "doc_id"),
        "full": full,
    }


# ---------------------------------------------------------------------------
# hybrid retrieval — reciprocal-rank fusion of BM25 and embedding cosine
# ---------------------------------------------------------------------------

# Reciprocal-rank fusion (Cormack et al. 2009): rrf(d) = Σ 1/(k + r_d)
# over the result lists d appears in, k = 60. Each 1/(60+r) term is
# FLOOR-quantized to integers (x1e9) so fused scores are exact integer
# sums; both input rankings are already engine-exact (integer BM25
# scores; 4dp-rounded cosines with doc_id tie-breaks), so the fused
# top-3 cannot diverge. `self` hits are excluded from both lists —
# hybrid retrieval is about finding OTHER documents.
_RRF_ORACLE = _BM25_CTES + f"""
, tok2 AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
),
tf2 AS (
  SELECT doc_id,
         (('0x' || substr(md5(t), 1, 8))::BIGINT % {_HE_DIM}) AS b,
         COUNT(*)::DOUBLE AS c
  FROM tok2 GROUP BY 1, 2
),
ids2 AS (SELECT DISTINCT doc_id FROM tf2),
grid2 AS (
  SELECT ids2.doc_id, g.i AS b
  FROM ids2 CROSS JOIN
       (SELECT unnest(generate_series(0, {_HE_DIM - 1})) AS i) g
),
vec2 AS (
  SELECT grid2.doc_id, list(COALESCE(tf2.c, 0.0) ORDER BY grid2.b) AS e
  FROM grid2 LEFT JOIN tf2 ON tf2.doc_id = grid2.doc_id AND tf2.b = grid2.b
  GROUP BY grid2.doc_id
),
nv AS (SELECT doc_id, e, sqrt(list_dot_product(e, e)) AS nr FROM vec2),
qv AS (SELECT * FROM nv
       WHERE doc_id % {_BM25_QMOD} = 0 AND doc_id < {_BM25_QCAP}),
dense_scored AS (
  SELECT qv.doc_id AS query_id, c.doc_id AS doc_id,
         ROUND(list_dot_product(qv.e, c.e) / (qv.nr * c.nr), 4) + 0.0
           AS cosine
  FROM qv JOIN nv c ON qv.doc_id <> c.doc_id
),
dense5 AS (
  SELECT query_id, doc_id, rn AS dr FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id) AS rn
    FROM dense_scored
  ) WHERE rn <= 5
),
lex5 AS (
  SELECT query_id, doc_id, rn AS lr FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id) AS rn
    FROM scored WHERE doc_id <> query_id
  ) WHERE rn <= 5
),
fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         CAST(COALESCE(CAST(FLOOR(1000000000.0 / (60 + l.lr)) AS BIGINT), 0)
            + COALESCE(CAST(FLOOR(1000000000.0 / (60 + d.dr)) AS BIGINT), 0)
              AS BIGINT) AS rrf_score,
         CAST(COALESCE(l.lr, -1) AS BIGINT) AS lex_rank,
         CAST(COALESCE(d.dr, -1) AS BIGINT) AS vec_rank
  FROM lex5 l FULL OUTER JOIN dense5 d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, rnk, doc_id, rrf_score, lex_rank, vec_rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rnk
  FROM fused
) WHERE rnk <= 3
ORDER BY query_id, rnk
"""


@query("text_hybrid_rrf_retrieval", oracle=_RRF_ORACLE)
def text_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the BM25 lexical list and the hash-embedding
    cosine list for the SAME probe set (every 97th doc), fused with
    reciprocal-rank fusion — the standard production hybrid-search
    topology (sparse + dense retrievers, rank-level fusion, no score
    calibration needed because RRF only consumes ranks). Each side
    contributes its top-5 (self excluded); a full-outer join on
    (query, doc) merges the lists; rrf = Σ floor(1e9/(60+rank)) is an
    exact integer, and -1 marks a doc one retriever missed — the
    interesting hybrid cases are visible in the output, not collapsed.

    Scale: the lexical side reuses the inverted-postings discipline of
    text_bm25_retrieval; the dense side reuses the capped-probe exact
    search of text_hash_embed_knn (a production corpus swaps in the
    LSH/IVF index paths for the same (doc_id, e, nr) frame); fusion
    itself touches <= 10 rows per query."""
    from pyspark.sql import Window

    from hive_service_spark.llm.similarity import _dot

    lex_scored = _bm25_scored(spark, sf_dir).where(
        F.col("doc_id") != F.col("query_id")
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    lex5 = (
        lex_scored.withColumn("lr", F.row_number().over(w_lex))
        .where(F.col("lr") <= 5)
        .select("query_id", "doc_id", "lr")
    )

    n = _hash_vec_frame(spark, sf_dir)
    # capped probe set (the _HE_QCAP discipline): <=100 probes at ANY
    # scale factor, so the broadcast below is a fixed-size frame and the
    # probe x corpus exact search is O(100 x corpus) map-side work — the
    # round-6 verdict's "uncapped BNLJ" scale defect. A production
    # corpus swaps this arm for the persisted LSH/IVF index paths.
    q = n.where(
        (F.col("doc_id") % _BM25_QMOD == 0) & (F.col("doc_id") < _BM25_QCAP)
    )
    cos = F.round(
        _dot(F.col("q.e"), F.col("c.e")) / (F.col("q.nr") * F.col("c.nr")), 4
    )
    dense_scored = (
        F.broadcast(q.alias("q"))
        .join(n.alias("c"), F.col("q.doc_id") != F.col("c.doc_id"))
        .select(
            F.col("q.doc_id").alias("query_id"),
            F.col("c.doc_id").alias("doc_id"),
            (cos + 0.0).alias("cosine"),
        )
    )
    w_dense = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("doc_id")
    )
    dense5 = (
        dense_scored.withColumn("dr", F.row_number().over(w_dense))
        .where(F.col("dr") <= 5)
        .select("query_id", "doc_id", "dr")
    )

    def _rrf(rank_col):
        return F.coalesce(
            F.floor(F.lit(1000000000.0) / (F.lit(60) + rank_col)).cast(
                "bigint"
            ),
            F.lit(0).cast("bigint"),
        )

    fused = lex5.join(dense5, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (_rrf(F.col("lr")) + _rrf(F.col("dr"))).cast("bigint").alias(
            "rrf_score"
        ),
        F.coalesce(F.col("lr"), F.lit(-1)).cast("bigint").alias("lex_rank"),
        F.coalesce(F.col("dr"), F.lit(-1)).cast("bigint").alias("vec_rank"),
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w_f).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("query_id", "rnk", "doc_id", "rrf_score", "lex_rank", "vec_rank")
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# blocklist scrub — token-level redaction (PII/toxicity scrub plumbing)
# ---------------------------------------------------------------------------

# corpus-calibrated stand-ins for a real deployment's PII / toxicity
# blocklist (emails, phones, slurs). The synthetic corpus has no
# digits or punctuation, so the redaction TARGETS are plain words —
# the pipeline (tokenize -> match -> replace -> count) is the real
# thing and is exactly what swaps in regex classes on web text.
_BLOCKLIST = ("customer", "key", "value")
_BL_SQL = "('customer','key','value')"

_SCRUB_ORACLE = f"""
SELECT doc_id,
       CAST(len(list_filter(w, x -> x IN {_BL_SQL})) AS BIGINT)
         AS n_redactions,
       (len(list_filter(w, x -> x IN {_BL_SQL})) > 0) AS c4_drop,
       array_to_string(
         list_transform(w, x -> CASE WHEN x IN {_BL_SQL}
                                     THEN '[REDACTED]' ELSE x END),
         ' ') AS scrubbed
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
"""


@query("text_blocklist_scrub", oracle=_SCRUB_ORACLE)
def text_blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DICTIONARY-blocklist scrub — the C4-style bad-word gate (C4
    drops any page containing a word from the LDNOOBW blocklist;
    Raffel et al. 2020 §2.2), distinct from text_pii_redaction's
    REGEX-class scrub (emails/phones/SSNs): dictionary matching is an
    exact token `isin`, not a pattern engine, and the outputs differ —
    this emits the REWRITTEN text plus the C4 drop decision, where the
    PII query emits per-class counts and a leak check. Both policies
    (redact-and-keep vs drop-the-doc) ship from one pass.
    Reference surface: Hive's data-masking UDFs (`mask`, `mask_hash` —
    hive-exec!.../udf/generic/GenericUDFMask.java) cover single
    columns; this is the corpus-scale token-level analog.

    100 TB reading: pure map-only Column expressions (split /
    transform / filter / array_join) — no shuffle, no UDF, whole-stage
    codegen end to end; redaction counts and the drop flag ride the
    same pass as the rewrite. A production blocklist (~400 LDNOOBW
    entries) stays a literal `isin` list — Catalyst compiles it to a
    hash-set probe per token, still no join needed."""
    w = F.split("text", " ")
    blocked = lambda x: x.isin(*_BLOCKLIST)  # noqa: E731
    n_red = F.size(F.filter(w, blocked)).cast("bigint")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        n_red.alias("n_redactions"),
        (n_red > 0).alias("c4_drop"),
        F.array_join(
            F.transform(
                w,
                lambda x: F.when(blocked(x), F.lit("[REDACTED]")).otherwise(x),
            ),
            " ",
        ).alias("scrubbed"),
    )


# ---------------------------------------------------------------------------
# hard-negative mining for retrieval training (contrastive pairs)
# ---------------------------------------------------------------------------

_HARDNEG_ORACLE = _BM25_CTES + """
, pos AS (
  SELECT query_id, score AS pos_score FROM scored WHERE query_id = doc_id
),
negs AS (
  SELECT query_id, doc_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
  FROM scored WHERE query_id <> doc_id
)
SELECT n.query_id, n.rnk,
       n.doc_id AS neg_doc_id,
       n.score AS neg_score,
       CAST(p.pos_score - n.score AS BIGINT) AS margin
FROM negs n JOIN pos p ON n.query_id = p.query_id
WHERE n.rnk <= 3
ORDER BY n.query_id, n.rnk
"""


@query("text_hard_negative_mining", oracle=_HARDNEG_ORACLE)
def text_hard_negative_mining(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hard-negative mining for retrieval-model training (the
    DPR/sentence-transformers data-prep step, Karpukhin et al. 2020):
    for each probe query the positive is the query's own source
    document (self-retrieval), and the hard negatives are the top
    OTHER documents under BM25 — lexically close enough to be
    confusable, which is exactly what contrastive training needs
    (random negatives are too easy; BM25-mined ones carry the
    gradient). Emits (query, rank, negative, score, margin); a
    non-positive margin flags queries whose own document is outranked
    — the label-noise audit a training pipeline runs before export.

    Composes the SAME persisted BM25 index/scorer as
    text_bm25_retrieval (one postings build serves retrieval, WAND,
    hybrid fusion AND mining — the index-reuse discipline); the
    positive frame is one row per probe (capped <= 100 by _BM25_QCAP at
    any scale), so its join back to the ranked negatives broadcasts.
    Integer BM25 scores make rank and margin exact — no float ulp can
    flip a negative into the export set.

    100 TB reading: identical candidate-generation shape to
    text_bm25_retrieval (probe ⋈ idf first, then one broadcast probe
    pass over postings); ranking windows partition per query over
    df-bounded candidate sets. Mining for N training queries instead
    of 100 probes batches the probe frame — the corpus-side cost is
    one postings build regardless of N."""
    scored = _bm25_scored(spark, sf_dir)
    pos = scored.where(F.col("query_id") == F.col("doc_id")).select(
        "query_id", F.col("score").alias("pos_score")
    )
    from pyspark.sql import Window

    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    negs = (
        scored.where(F.col("query_id") != F.col("doc_id"))
        .withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("rnk") <= 3)
    )
    return (
        negs.join(F.broadcast(pos), "query_id")
        .select(
            "query_id",
            "rnk",
            F.col("doc_id").alias("neg_doc_id"),
            F.col("score").alias("neg_score"),
            (F.col("pos_score") - F.col("score"))
            .cast("bigint")
            .alias("margin"),
        )
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# n-gram novelty scoring: eval docs vs a held-out reference split
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
g AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, len(w) - 2),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
    FROM w
  )
),
split AS (
  SELECT *,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2
           AS b
  FROM g
),
ref AS (SELECT DISTINCT gh FROM split WHERE b = 0),
ev AS (SELECT doc_id, gh FROM split WHERE b = 1)
SELECT ev.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE ref.gh IS NULL) AS BIGINT) AS n_novel,
       CAST((1000000 * COUNT(*) FILTER (WHERE ref.gh IS NULL))
            // COUNT(*) AS BIGINT) AS novelty_ppm
FROM ev LEFT JOIN ref ON ev.gh = ref.gh
GROUP BY ev.doc_id
ORDER BY ev.doc_id
"""


@query("text_ngram_novelty", oracle=_NOVELTY_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY against a held-out reference split
    — the memorization/duplication profile a training-data pipeline
    runs to audit dedup quality and estimate how much of a candidate
    batch is genuinely new text (the inverse of
    pipeline_contamination_check, which hunts benchmark OVERLAP; here
    low novelty = redundant data, not leakage). Docs are split 50/50
    by an md5-derived bucket of doc_id (deterministic on both
    engines); each eval doc reports its distinct word-3-gram count,
    how many of those grams never occur in the reference half, and the
    exact integer novelty rate in ppm.

    100 TB reading: grams are hashed to 60-bit integers before any
    shuffle (8-byte keys), the reference gram set is deduped by one
    hash aggregate, and the membership probe is a plain LEFT equi-join
    on the gram hash — shuffle-partitioned, no broadcast hint (the
    reference set scales with the corpus; AQE may still broadcast it
    while it fits). Per-doc counts then reduce on doc_id. The same
    inverted-index discipline as dedup_ngram_jaccard, minus the
    pair-space expansion — novelty needs membership, not joins between
    documents."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
        ),
    )
    from hive_service_spark.catalog import par

    g = (
        d.where(F.size(words) >= 3)
        .repartition(par(spark))
        .select("doc_id", F.explode(grams).alias("gram"))
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("gh"),
        )
        .distinct()
    )
    b = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 2
    )
    g = persisted(g.withColumn("b", b))
    ref = g.where(F.col("b") == 0).select("gh").distinct()
    ev = g.where(F.col("b") == 1).select("doc_id", "gh")
    hit = ref.withColumn("hit", F.lit(1))
    return (
        ev.join(hit, "gh", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.count(F.when(F.col("hit").isNull(), 1))
            .cast("bigint")
            .alias("n_novel"),
            F.expr(
                "CAST((1000000 * COUNT(CASE WHEN hit IS NULL THEN 1 END))"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# cross-document repeated-passage spans (passage-level dedup audit)
# ---------------------------------------------------------------------------

_DUP_SPANS_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 5
),
g AS (
  SELECT doc_id, i AS pos,
         ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                             || w[i+3] || ' ' || w[i+4]), 1, 15))::BIGINT
           AS gh
  FROM w, unnest(generate_series(1, len(w) - 4)) AS t(i)
),
rep AS (
  SELECT gh FROM g GROUP BY gh HAVING MIN(doc_id) <> MAX(doc_id)
),
f AS (
  SELECT g.doc_id, g.pos,
         ROW_NUMBER() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS rn
  FROM g JOIN rep USING (gh)
),
s AS (
  SELECT doc_id, pos - rn AS isl,
         MIN(pos) AS span_start, MAX(pos) + 4 AS span_end,
         COUNT(*) AS n_dup_grams
  FROM f GROUP BY doc_id, pos - rn
)
SELECT doc_id,
       CAST(span_start AS BIGINT) AS span_start_word,
       CAST(span_end AS BIGINT) AS span_end_word,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_words,
       CAST(n_dup_grams AS BIGINT) AS n_dup_grams
FROM s
ORDER BY doc_id, span_start_word
"""


@query("text_duplicate_spans", oracle=_DUP_SPANS_ORACLE)
def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-PASSAGE spans — the passage-level dedup
    audit of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"): document-level near-dup removal leaves
    boilerplate/quotation passages duplicated ACROSS otherwise-unique
    documents, and those spans are exactly what models memorize. For
    every word-5-gram that occurs in MORE THAN ONE document, the
    per-document maximal runs of consecutive duplicated grams are
    emitted as spans (start/end word positions, width, gram count) —
    the actionable output a span-excision pass consumes.

    100 TB reading: grams hash to 60-bit integers before any shuffle
    (the same discipline as text_ngram_novelty); "appears in >1 doc"
    is MIN(doc_id) <> MAX(doc_id) per gram — one map-side-combined
    hash aggregate, strictly cheaper than COUNT(DISTINCT) and
    equivalent for the cross-doc predicate (a gram repeated only
    WITHIN one doc has min = max and is correctly not flagged); the
    flag-back is a plain equi-join on the gram hash (shuffle, no
    broadcast hint — the repeated-gram table scales with the corpus);
    span assembly is one per-document window (islands by
    pos - row_number) plus a (doc, island) aggregate. No pair-space
    expansion anywhere — unlike the O(pairs) near-dup joins, passage
    flagging is linear in total gram count."""
    from hive_service_spark.catalog import par

    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    g = (
        d.where(F.size(words) >= 5)
        .repartition(par(spark))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size(words) - 4),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(words, i),
                        F.element_at(words, i + 1),
                        F.element_at(words, i + 2),
                        F.element_at(words, i + 3),
                        F.element_at(words, i + 4),
                    ),
                )
            ).alias("p0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("pos"),
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("gh"),
        )
    )
    g = persisted(g)
    rep = (
        g.groupBy("gh")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .where(F.col("mn") != F.col("mx"))
        .select("gh")
    )
    # r13 NOTE: an array-based island assembly (collect positions per
    # doc, compute run boundaries with higher-order functions, explode
    # spans) was implemented and MEASURED SLOWER than this shape
    # (+0.3-0.5s at bench scale, beyond the run's noise band) — the
    # window + (doc, island) aggregate stays.
    from pyspark.sql import Window

    flagged = g.join(rep, "gh").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        flagged.withColumn("rn", F.row_number().over(w))
        .withColumn("isl", F.col("pos") - F.col("rn"))
        .groupBy("doc_id", "isl")
        .agg(
            F.min("pos").cast("bigint").alias("span_start_word"),
            (F.max("pos") + 4).cast("bigint").alias("span_end_word"),
            F.count(F.lit(1)).cast("bigint").alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "span_start_word",
            "span_end_word",
            (F.col("span_end_word") - F.col("span_start_word") + 1).alias(
                "span_words"
            ),
            "n_dup_grams",
        )
    )
    return spans.orderBy("doc_id", "span_start_word")


# ---------------------------------------------------------------------------
# duplicated-passage excision (the consumer of text_duplicate_spans)
# ---------------------------------------------------------------------------

_EXCISION_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
tok AS (
  SELECT doc_id, i AS idx, w[i] AS word
  FROM w, unnest(generate_series(1, len(w))) AS t(i)
),
g AS (
  SELECT doc_id, i AS pos,
         ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                             || w[i+3] || ' ' || w[i+4]), 1, 15))::BIGINT
           AS gh
  FROM w, unnest(generate_series(1, len(w) - 4)) AS t(i)
  WHERE len(w) >= 5
),
rep AS (
  SELECT gh, MIN(doc_id) AS canon
  FROM g GROUP BY gh HAVING MIN(doc_id) <> MAX(doc_id)
),
cov AS (
  SELECT DISTINCT g.doc_id, t.j
  FROM g JOIN rep USING (gh), unnest(generate_series(g.pos, g.pos + 4)) AS t(j)
  WHERE g.doc_id <> rep.canon
)
SELECT t.doc_id,
       CAST(COUNT(*) FILTER (WHERE c.j IS NULL) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE c.j IS NOT NULL) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN c.j IS NULL THEN t.word END, ' '
                           ORDER BY t.idx), '') AS clean_text
FROM tok t
LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.j = t.idx
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@query("dedup_span_excision", oracle=_EXCISION_ORACLE)
def dedup_span_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage EXCISION — the acting half of the
    text_duplicate_spans audit (Lee et al. 2022 remove duplicated
    passages rather than whole documents): every cross-document
    5-gram keeps its FIRST corpus occurrence (canonical owner =
    MIN(doc_id) per gram) and is excised everywhere else — the word
    positions covered by any non-canonical duplicated gram are
    dropped and the document is rebuilt, emitting (kept words,
    removed words, clean text) per document. Documents too short for
    grams pass through untouched; a fully-duplicated document
    collapses to an empty string, not a dropped row.

    100 TB reading: the gram/flag stages are the linear passes of
    text_duplicate_spans (60-bit hashes, min<>max flagging, equi-join
    flag-back — no pair space); covered indices aggregate straight to
    ONE row per document (a map-side-combined collect_set over the
    5 indices each flagged gram spans), and the document rebuilds with
    pure array ops — ``array_except(sequence(1, len), cut)`` keeps the
    surviving positions in order, ``element_at`` re-reads the words —
    so the only per-document state is the covered-index set and the
    word array, both bounded by single-document length, the unit every
    text pipeline already requires to fit a task (r13: this replaced a
    token-level rebuild that shuffled the corpus four times)."""
    from hive_service_spark.catalog import par

    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    g = (
        d.where(F.size(words) >= 5)
        .repartition(par(spark))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size(words) - 4),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(words, i),
                        F.element_at(words, i + 1),
                        F.element_at(words, i + 2),
                        F.element_at(words, i + 3),
                        F.element_at(words, i + 4),
                    ),
                )
            ).alias("p0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("pos"),
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("gh"),
        )
    )
    g = persisted(g)
    rep = (
        g.groupBy("gh")
        .agg(F.min("doc_id").alias("canon"), F.max("doc_id").alias("mx"))
        .where(F.col("canon") != F.col("mx"))
        .select("gh", "canon")
    )
    # r13 optimization (guide §2.4 remove shuffles / §8 decide with
    # small rows): the rebuild used to go through the TOKEN level —
    # posexplode every word, DISTINCT the exploded covered indices,
    # equi-join 270k token rows against them on (doc, idx), then a
    # per-doc collect_list + array_sort of surviving (idx, word)
    # structs — four corpus-sized shuffles. The covered-index set is
    # per-document bounded (a subset of the doc's word positions — the
    # same single-document-fits-a-task unit the collect_list already
    # assumed), so it aggregates straight to ONE row per doc
    # (collect_set subsumes the old DISTINCT, map-side combined), and
    # the document rebuilds with pure array ops against its own `w`
    # array: kept indices = array_except(sequence(1, len), cut) —
    # hash-set semantics, order-preserving on the first argument — and
    # kept words via element_at. One narrow shuffle of (doc_id,
    # covered-set) plus a per-doc-row join replaces the token-level
    # join pipeline; identical output (count and order both derive
    # from the same ascending index walk).
    cov_set = (
        g.join(rep, "gh")
        .where(F.col("doc_id") != F.col("canon"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + 4)
            ).alias("idx"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("idx").alias("cut"))
    )
    wn = F.size("w")
    kept_idx = F.array_except(
        F.sequence(F.lit(1), wn),
        F.coalesce(F.col("cut"), F.array().cast("array<int>")),
    )
    kept = F.transform(kept_idx, lambda i: F.element_at(F.col("w"), i))
    return (
        d.select("doc_id", words.alias("w"))
        .join(cov_set, "doc_id", "left_outer")
        .select(
            "doc_id",
            F.size(kept).cast("bigint").alias("n_kept"),
            (wn - F.size(kept)).cast("bigint").alias("n_removed"),
            F.array_join(kept, " ").alias("clean_text"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# exact phrase search over a POSITIONAL postings index (round 10)
# ---------------------------------------------------------------------------

_PHRASE_QMOD = 97  # every 97th doc's first three words form a probe phrase
_PHRASE_QCAP = 9700  # capped at doc_id < 9700 (bounded probes at ANY sf)

_PHRASE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
q AS (
  SELECT doc_id AS query_id, w[1] AS t0, w[2] AS t1, w[3] AS t2
  FROM d
  WHERE doc_id % {_PHRASE_QMOD} = 0 AND doc_id < {_PHRASE_QCAP}
    AND len(w) >= 3
),
p AS (  -- parallel unnests zip in DuckDB: positional postings
  SELECT doc_id,
         unnest(w) AS word,
         unnest(range(1, len(w) + 1)) AS pos
  FROM d
)
SELECT q.query_id, p0.doc_id, CAST(p0.pos AS INT) AS start_pos,
       q.t0 || ' ' || q.t1 || ' ' || q.t2 AS phrase
FROM q
JOIN p p0 ON p0.word = q.t0
JOIN p p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
         AND p1.word = q.t1
JOIN p p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2
         AND p2.word = q.t2
ORDER BY q.query_id, p0.doc_id, start_pos
"""


def phrase_search(docs_w, phrases) -> DataFrame:
    """The phrase-match core, factored for direct testing: ``docs_w``
    is (doc_id, w: array<string>); ``phrases`` is the unpivoted probe
    frame (query_id, phrase, off, term, n_terms) with off 0-based.
    One posexplode pass builds positional postings; the phrase frame
    BROADCASTS into the postings scan; each hit projects its implied
    start (pos − off) and a match is a (query_id, doc_id, start) group
    covering ALL n_terms offsets — count(DISTINCT off) == n_terms is
    correct even when the phrase repeats a term (offsets are distinct
    by construction, and a start needs every offset present; pinned
    with overlapping repeated-term cases in tests/
    test_phrase_search.py)."""
    post = docs_w.select(
        "doc_id", F.posexplode("w").alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    # r13 optimization (guide §2.3 project before the exchange): the
    # phrase STRING is functional on query_id, so it does not ride
    # through the candidate aggregation — the hit rows that shuffle
    # into the (query, doc, start) groups carry only integers, and the
    # phrase text re-attaches to the (tiny, probe-capped) match output
    # via one join against the distinct per-query phrase dim. Shuffle
    # bytes drop by the phrase width times Σ df(term) hit rows;
    # results identical.
    hits = post.join(
        F.broadcast(phrases), post["word"] == phrases["term"]
    ).select(
        "query_id",
        "doc_id",
        "n_terms",
        (F.col("pos") - F.col("off")).alias("start_pos"),
        "off",
    )
    phrase_dim = phrases.select("query_id", "phrase").distinct()
    return (
        hits.groupBy("query_id", "doc_id", "n_terms", "start_pos")
        .agg(F.count_distinct("off").alias("n_off"))
        .where(
            (F.col("n_off") == F.col("n_terms")) & (F.col("start_pos") >= 1)
        )
        .join(phrase_dim, "query_id")
        .select(
            "query_id",
            "doc_id",
            F.col("start_pos").cast("int").alias("start_pos"),
            "phrase",
        )
    )


@query("text_phrase_search", oracle=_PHRASE_ORACLE)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE search over a positional postings index — the
    consecutive-terms complement of the bag-of-words BM25 family
    (reference surface: nothing in Hive 2.3; this extends the
    retrieval stack next to text_bm25_* / text_hybrid_rrf). Probe
    phrases are derived deterministically from the corpus (every 97th
    doc's first three words, capped), so the probe set is non-empty
    and bounded at every scale factor and self-retrieval doubles as a
    sanity gauge.

    Spark-first shape, 100 TB reading: ONE corpus pass builds the
    positional postings frame (posexplode — doc_id, pos, word); the
    tiny phrase table unpivots to (query_id, off, term) and BROADCASTS
    into the postings scan, so candidate generation is a map-side
    hash probe that never shuffles the corpus. Each posting hit
    projects its implied phrase START (pos − off), and a phrase match
    is exactly a (query_id, doc_id, start) group covering ALL L
    offsets — so the classic L−1 positional self-joins collapse into
    ONE map-side-combinable count(DISTINCT off) aggregation whose
    input is bounded by Σ df(term) over phrase terms, not by the
    corpus. (A production variant additionally pre-filters candidates
    by the phrase's RAREST term — the positional analog of WAND's
    upper-bound prune, df_min·L instead of Σ df candidate rows —
    ranking-neutral and omitted here to keep the oracle exact.)
    The repeated-term and overlapping-occurrence edge cases are pinned
    directly on the factored core (phrase_search) in
    tests/test_phrase_search.py."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    phrases = (
        d.where(
            (F.col("doc_id") % _PHRASE_QMOD == 0)
            & (F.col("doc_id") < _PHRASE_QCAP)
            & (F.size("w") >= 3)
        )
        .select(
            F.col("doc_id").alias("query_id"),
            F.concat_ws(
                " ", F.col("w")[0], F.col("w")[1], F.col("w")[2]
            ).alias("phrase"),
            F.lit(3).alias("n_terms"),
            F.posexplode(F.slice("w", 1, 3)).alias("off", "term"),
        )
    )
    return phrase_search(d, phrases).orderBy(
        "query_id", "doc_id", "start_pos"
    )
