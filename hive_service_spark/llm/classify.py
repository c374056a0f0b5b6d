"""LLM-pipeline extension — distributed text classification.

Multinomial Naive Bayes trained AND applied entirely as DataFrame
algebra: the "learned" counterpart of the heuristic language-ID in
llm/text.py (the pattern a production corpus pipeline uses to route /
filter documents when hand rules stop scaling). No reference analog —
Hive has no ML surface (SURVEY.md §2.3); this is part of the
BASELINE.json training-data-pipeline mandate.

Scale design (100 TB):
- Training is two aggregations over exploded tokens — one shuffle on
  (word, label), one on label. The model (vocab × labels counts) is
  tiny relative to the corpus and BROADCASTS for inference.
- Inference avoids the naive docs × labels token explosion: matched
  (token ⋈ model) rows aggregate per (doc, label), and every
  unmatched token contributes the label's Laplace default weight via
  `(n_tokens - n_matched) * default_l` — so the big side is only ever
  exploded once, not once per label.
- Determinism across engines: all log weights are quantized to
  BIGINT (round(1024·ln p)) at model-build time and SUMMED AS
  INTEGERS, so scores are exact and order-independent — no
  float-accumulation-order hazard between Spark's left-to-right and
  DuckDB's tree aggregation, and argmax can't flip on a last-ulp tie.
  Ties break on label order, pinned identically on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hive_service_spark.catalog import load
from hive_service_spark.registry import query

_NB_SCORED_CTES = """tok AS (
  SELECT doc_id, doc_id % 5 = 0 AS is_test, lang,
         unnest(string_split(lower(text), ' ')) AS word
  FROM documents
),
wl AS (  -- token occurrences per (word, label) in TRAIN
  SELECT word, lang, COUNT(*) AS c_wl
  FROM tok WHERE NOT is_test GROUP BY word, lang
),
l AS (   -- tokens + docs per label in TRAIN
  SELECT lang, COUNT(*) AS c_l, COUNT(DISTINCT doc_id) AS n_docs
  FROM tok WHERE NOT is_test GROUP BY lang
),
v AS (SELECT COUNT(DISTINCT word) AS vocab FROM tok WHERE NOT is_test),
model AS (
  SELECT wl.word, wl.lang,
         CAST(ROUND(1024 * ln((wl.c_wl + 1.0) / (l.c_l + v.vocab)))
              AS BIGINT) AS w
  FROM wl, l, v WHERE wl.lang = l.lang
),
label AS (
  SELECT l.lang,
         CAST(ROUND(1024 * ln(CAST(l.n_docs AS DOUBLE)
                              / (SELECT SUM(n_docs) FROM l)))
              AS BIGINT) AS w_prior,
         CAST(ROUND(1024 * ln(1.0 / (l.c_l + v.vocab))) AS BIGINT)
           AS w_default
  FROM l, v
),
test_doc AS (
  SELECT doc_id, lang AS actual_lang, COUNT(*) AS n_tokens
  FROM tok WHERE is_test GROUP BY doc_id, lang
),
matched AS (
  SELECT t.doc_id, m.lang,
         CAST(SUM(m.w) AS BIGINT) AS w_sum, COUNT(*) AS n_matched
  FROM tok t JOIN model m ON t.word = m.word
  WHERE t.is_test
  GROUP BY t.doc_id, m.lang
),
scored AS (
  SELECT d.doc_id, d.actual_lang, lb.lang AS cand,
         lb.w_prior + COALESCE(ma.w_sum, 0)
           + (d.n_tokens - COALESCE(ma.n_matched, 0)) * lb.w_default
           AS score
  FROM test_doc d
  CROSS JOIN label lb
  LEFT JOIN matched ma ON ma.doc_id = d.doc_id AND ma.lang = lb.lang
)"""

_NB_ORACLE = f"""
WITH {_NB_SCORED_CTES},
predicted AS (
  SELECT doc_id, actual_lang, cand AS predicted_lang
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cand) AS rn
        FROM scored)
  WHERE rn = 1
)
SELECT actual_lang, predicted_lang, COUNT(*) AS n_docs
FROM predicted
GROUP BY actual_lang, predicted_lang
ORDER BY actual_lang, predicted_lang
"""


def _nb_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared NB scorer: per (test doc, candidate label) quantized
    log-posterior scores, with actual_lang and n_tokens carried —
    consumed by the confusion matrix and the calibration bins."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        (F.col("doc_id") % 5 == 0).alias("is_test"),
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("word"),
    )
    train = tok.where(~F.col("is_test"))
    test = tok.where(F.col("is_test"))

    wl = train.groupBy("word", "lang").agg(F.count(F.lit(1)).alias("c_wl"))
    lab = train.groupBy("lang").agg(
        F.count(F.lit(1)).alias("c_l"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    vocab = train.agg(F.count_distinct("word").alias("vocab"))

    def _q(col):  # quantized log weight — BIGINT, summed exactly
        return F.round(F.lit(1024) * F.log(col)).cast("bigint")

    model = (
        wl.join(F.broadcast(lab), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "word",
            "lang",
            _q((F.col("c_wl") + 1.0) / (F.col("c_l") + F.col("vocab"))).alias("w"),
        )
    )
    total_docs = lab.agg(F.sum("n_docs").alias("total_docs"))
    label = (
        lab.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(total_docs))
        .select(
            "lang",
            _q(F.col("n_docs").cast("double") / F.col("total_docs")).alias(
                "w_prior"
            ),
            _q(F.lit(1.0) / (F.col("c_l") + F.col("vocab"))).alias("w_default"),
        )
    )

    test_doc = test.groupBy("doc_id", F.col("lang").alias("actual_lang")).agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    matched = (
        test.select("doc_id", "word")
        .join(F.broadcast(model.withColumnRenamed("lang", "cand")), "word")
        .groupBy("doc_id", "cand")
        .agg(
            F.sum("w").cast("bigint").alias("w_sum"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )
    scored = (
        test_doc.crossJoin(F.broadcast(label.withColumnRenamed("lang", "cand")))
        .join(matched, ["doc_id", "cand"], "left")
        .select(
            "doc_id",
            "actual_lang",
            "cand",
            "n_tokens",
            (
                F.col("w_prior")
                + F.coalesce(F.col("w_sum"), F.lit(0))
                + (F.col("n_tokens") - F.coalesce(F.col("n_matched"), F.lit(0)))
                * F.col("w_default")
            ).alias("score"),
        )
    )
    return scored


@query("ml_naive_bayes_langid", oracle=_NB_ORACLE)
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language-ID: train on 80% of documents
    (doc_id % 5 != 0), classify the held-out 20%, emit the confusion
    matrix. See the module docstring for the scale + determinism
    design (broadcast model, default-weight trick for unmatched
    tokens, BIGINT-quantized log weights)."""
    scored = _nb_scored(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cand")
    predicted = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("actual_lang", F.col("cand").alias("predicted_lang"))
    )
    return (
        predicted.groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual_lang", "predicted_lang")
    )


_CALIB_ORACLE = f"""
WITH {{ctes}},
ranked AS (
  SELECT doc_id, actual_lang, cand, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand) AS rn
  FROM scored
),
perdoc AS (
  SELECT r1.doc_id,
         r1.cand = r1.actual_lang AS correct,
         (r1.score - r2.score) // d.n_tokens AS margin_per_token
  FROM (SELECT * FROM ranked WHERE rn = 1) r1
  JOIN (SELECT * FROM ranked WHERE rn = 2) r2 ON r1.doc_id = r2.doc_id
  JOIN test_doc d ON d.doc_id = r1.doc_id
)
SELECT CAST(LEAST(margin_per_token // 8, 7) AS INTEGER) AS confidence_bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE correct) AS BIGINT) AS n_correct,
       ROUND(COUNT(*) FILTER (WHERE correct) * 1.0 / COUNT(*), 4) + 0.0
         AS accuracy,
       ROUND(CAST(SUM(margin_per_token) AS DOUBLE)
             / COUNT(*) / 1024.0, 4) + 0.0 AS mean_margin_nats
FROM perdoc
GROUP BY 1
ORDER BY 1
"""


@query(
    "ml_calibration_bins",
    oracle=_CALIB_ORACLE.format(ctes=_NB_SCORED_CTES),
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration (reliability diagram): bin held-out
    documents by the NB decision margin — (top score − runner-up
    score) per token, in the same BIGINT-quantized log units as the
    model — and report accuracy per confidence bin. A well-calibrated
    classifier's accuracy rises with the bin; this is the check a
    pipeline runs before trusting classifier scores as soft labels or
    filter thresholds. Margins, bins, and counts are pure integer
    arithmetic (floor divisions), so both engines bin identically; the
    only floats are two final ratios.

    Scale: reuses the NB scorer (broadcast model, one shuffle on
    doc_id); binning adds one self-join of the tiny top-2 frame and
    one 8-row aggregate."""
    scored = _nb_scored(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cand")
    ranked = scored.withColumn("rn", F.row_number().over(w))
    r1 = ranked.where(F.col("rn") == 1).select(
        "doc_id",
        "n_tokens",
        (F.col("cand") == F.col("actual_lang")).alias("correct"),
        F.col("score").alias("s1"),
    )
    r2 = ranked.where(F.col("rn") == 2).select(
        "doc_id", F.col("score").alias("s2")
    )
    perdoc = r1.join(r2, "doc_id").select(
        "correct",
        F.expr("(s1 - s2) div n_tokens").alias("margin_per_token"),
    )
    return (
        perdoc.groupBy(
            F.least(F.expr("margin_per_token div 8"), F.lit(7))
            .cast("int")
            .alias("confidence_bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("correct"), 1))
            .cast("bigint")
            .alias("n_correct"),
            (
                F.round(
                    F.count(F.when(F.col("correct"), 1))
                    / F.count(F.lit(1)),
                    4,
                )
                + 0.0
            ).alias("accuracy"),
            (
                F.round(
                    F.sum("margin_per_token").cast("double")
                    / F.count(F.lit(1))
                    / 1024.0,
                    4,
                )
                + 0.0
            ).alias("mean_margin_nats"),
        )
        .orderBy("confidence_bin")
    )


# ---------------------------------------------------------------------------
# bigram-LM perplexity quality filter (CCNet-style)
# ---------------------------------------------------------------------------

_LM_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, source, i AS pos, w[i] AS w1, w[i+1] AS w2
  FROM (SELECT doc_id, lang, source,
               string_split(lower(text), ' ') AS w FROM documents),
       unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
train AS (SELECT * FROM tok WHERE lang = 'en' AND doc_id % 5 <> 0),
big AS (SELECT w1, w2, COUNT(*) AS c12 FROM train GROUP BY w1, w2),
uni AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM train),
model AS (
  SELECT b.w1, b.w2,
         CAST(ROUND(1024 * ln((b.c12 + 1.0) / (u.c1 + v.vocab)))
              AS BIGINT) AS q
  FROM big b, uni u, v WHERE b.w1 = u.w1
),
backoff AS (
  SELECT u.w1,
         CAST(ROUND(1024 * ln(1.0 / (u.c1 + v.vocab))) AS BIGINT) AS q
  FROM uni u, v
),
scored AS (
  SELECT t.doc_id, t.source,
         COALESCE(m.q, b.q,
                  (SELECT CAST(ROUND(1024 * ln(1.0 / vocab)) AS BIGINT)
                   FROM v)) AS q
  FROM tok t
  LEFT JOIN model m ON t.w1 = m.w1 AND t.w2 = m.w2
  LEFT JOIN backoff b ON t.w1 = b.w1
),
per_doc AS (
  SELECT doc_id, source,
         CAST(SUM(q) AS BIGINT) AS score_q,
         COUNT(*) AS n_bigrams
  FROM scored GROUP BY doc_id, source
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE score_q < -9 * 1024 * n_bigrams)
         AS n_flagged,
       ROUND(CAST(SUM(score_q) AS DOUBLE) / 1024.0
             / CAST(SUM(n_bigrams) AS DOUBLE) * -1.0, 6) AS mean_nll
FROM per_doc
GROUP BY source
ORDER BY source
"""


@query("ml_bigram_lm_quality", oracle=_LM_ORACLE)
def ml_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filtering: train an add-one-smoothed word
    BIGRAM language model on the reference slice (English training
    docs), score every document's mean negative log-likelihood per
    token, and flag docs worse than a fixed 9-nat threshold — the
    perplexity gate production pipelines put between raw crawl and
    training shards (a KenLM stand-in expressible as pure relational
    algebra). Same engine-exactness discipline as the NB classifier:
    BIGINT-quantized log weights, integer per-doc sums, the flag
    compare is integer-only (`score_q < -9·1024·n_bigrams`), and
    mean_nll is derived from two exact integer sums with one division.
    Scale: bigram/unigram models are corpus-vocabulary-sized and
    BROADCAST; the corpus is exploded once into bigrams (map-only) and
    aggregated per doc — one shuffle on doc_id, one on source."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    tok = (
        d.select("doc_id", "lang", "source", w.alias("w"))
        .where(F.size("w") >= 2)
        .select(
            "doc_id",
            "lang",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.struct(
                        F.element_at("w", i).alias("w1"),
                        F.element_at("w", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "lang", "source", "bg.w1", "bg.w2")
    )
    train = tok.where((F.col("lang") == "en") & (F.col("doc_id") % 5 != 0))
    big = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = train.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = train.agg(F.count_distinct("w2").alias("vocab"))

    def _q(col):
        return F.round(F.lit(1024) * F.log(col)).cast("bigint")

    model = (
        big.join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            _q((F.col("c12") + 1.0) / (F.col("c1") + F.col("vocab"))).alias("q_m"),
        )
    )
    backoff = uni.crossJoin(F.broadcast(vocab)).select(
        "w1", _q(F.lit(1.0) / (F.col("c1") + F.col("vocab"))).alias("q_b")
    )
    unseen = vocab.select(_q(F.lit(1.0) / F.col("vocab")).alias("q_u"))

    scored = (
        tok.select("doc_id", "source", "w1", "w2")
        .join(F.broadcast(model), ["w1", "w2"], "left")
        .join(F.broadcast(backoff), ["w1"], "left")
        .crossJoin(F.broadcast(unseen))
        .select(
            "doc_id",
            "source",
            F.coalesce("q_m", "q_b", "q_u").alias("q"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.sum("q").cast("bigint").alias("score_q"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(
                F.when(
                    F.col("score_q") < F.lit(-9) * 1024 * F.col("n_bigrams"),
                    1,
                )
            ).alias("n_flagged"),
            F.round(
                F.sum("score_q").cast("double")
                / F.lit(1024.0)
                / F.sum("n_bigrams").cast("double")
                * -1.0,
                6,
            ).alias("mean_nll"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# quality/language classifier TRAINING in the engine: full-batch
# logistic regression over hashed bag-of-words features (round 10) —
# shared exact-integer GD core; ml_logreg_quality trains on the full
# corpus (the trajectory-verification surface), ml_logreg_served_scores
# trains on the 80% split and scores the held-out 20% (the
# train/serve discipline surface)
# ---------------------------------------------------------------------------

_LR_B = 64        # hashed feature buckets (bias is bucket _LR_B)
_LR_XS = 10_000   # per-doc feature scale: x = round(XS * cnt / n_words)
_LR_ES = 1_000_000  # residual scale: e = round(ES * (p - y))
_LR_LR = 4.0      # learning rate (3 full-batch GD steps)


def _logreg_cte(train: str) -> str:
    """The shared DuckDB CTE chain: hashed features, labels, and the
    3-step exact-integer GD unrolled, with every training-side sum
    restricted by the ``train`` predicate (a SQL expression over
    doc_id). Yields CTEs: x, ylab (doc_id, y, is_train), ntot (train
    count), w1/w2/w3 (weights after each step)."""
    return f"""tok AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         ('0x'||substr(md5(word),1,8))::BIGINT % {_LR_B} AS b
  FROM (SELECT doc_id, lang,
               unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
),
nd AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
ylab AS (SELECT DISTINCT doc_id, y, ({train}) AS is_train FROM tok),
ntot AS (SELECT COUNT(*) AS nd_total FROM ylab WHERE is_train),
x AS (
  SELECT xb.doc_id, xb.b,
         CAST(ROUND({_LR_XS} * 1.0 * xb.c / nd.n) AS BIGINT) AS x
  FROM (SELECT doc_id, b, COUNT(*) AS c FROM tok GROUP BY doc_id, b) xb
  JOIN nd USING (doc_id)
  UNION ALL
  SELECT doc_id, {_LR_B} AS b, {_LR_XS} AS x FROM nd
),
e1 AS (
  SELECT doc_id, CAST(ROUND((0.5 - y) * {_LR_ES}) AS BIGINT) AS e
  FROM ylab WHERE is_train
),
w1 AS (
  SELECT g.b,
         CAST(0 - ROUND({_LR_LR} * g.g / ({_LR_XS} * 1.0 * n.nd_total))
              AS BIGINT) AS w
  FROM (SELECT x.b, CAST(SUM(e1.e * x.x) AS BIGINT) AS g
        FROM x JOIN e1 USING (doc_id) GROUP BY x.b) g, ntot n
),
m2 AS (
  SELECT x.doc_id, CAST(SUM(x.x * w1.w) AS BIGINT) AS mi
  FROM x JOIN w1 USING (b) GROUP BY x.doc_id
),
e2 AS (
  SELECT y.doc_id,
         CAST(ROUND(((0.5 + (m.mi / 1e10) / (2 * (1 + abs(m.mi / 1e10))))
                     - y.y) * {_LR_ES}) AS BIGINT) AS e
  FROM ylab y JOIN m2 m USING (doc_id) WHERE y.is_train
),
w2 AS (
  SELECT w1.b,
         w1.w - CAST(ROUND({_LR_LR} * g.g / ({_LR_XS} * 1.0 * n.nd_total))
                     AS BIGINT) AS w
  FROM (SELECT x.b, CAST(SUM(e2.e * x.x) AS BIGINT) AS g
        FROM x JOIN e2 USING (doc_id) GROUP BY x.b) g
  JOIN w1 USING (b), ntot n
),
m3 AS (
  SELECT x.doc_id, CAST(SUM(x.x * w2.w) AS BIGINT) AS mi
  FROM x JOIN w2 USING (b) GROUP BY x.doc_id
),
e3 AS (
  SELECT y.doc_id,
         CAST(ROUND(((0.5 + (m.mi / 1e10) / (2 * (1 + abs(m.mi / 1e10))))
                     - y.y) * {_LR_ES}) AS BIGINT) AS e
  FROM ylab y JOIN m3 m USING (doc_id) WHERE y.is_train
),
w3 AS (
  SELECT w2.b,
         w2.w - CAST(ROUND({_LR_LR} * g.g / ({_LR_XS} * 1.0 * n.nd_total))
                     AS BIGINT) AS w
  FROM (SELECT x.b, CAST(SUM(e3.e * x.x) AS BIGINT) AS g
        FROM x JOIN e3 USING (doc_id) GROUP BY x.b) g
  JOIN w2 USING (b), ntot n
)"""


_LOGREG_ORACLE = f"""
WITH {_logreg_cte("TRUE")},
m4 AS (
  SELECT x.doc_id, CAST(SUM(x.x * w3.w) AS BIGINT) AS mi
  FROM x JOIN w3 USING (b) GROUP BY x.doc_id
),
acc AS (
  SELECT CAST(COUNT(CASE WHEN (m.mi > 0) = (y.y = 1) THEN 1 END) AS BIGINT)
           AS n_correct
  FROM ylab y JOIN m4 m USING (doc_id)
)
SELECT w1.b, w1.w AS w_iter1, w2.w AS w_iter2, w3.w AS w_iter3,
       acc.n_correct AS n_correct_final
FROM w1 JOIN w2 USING (b) JOIN w3 USING (b), acc
ORDER BY w1.b
"""

_LOGREG_SERVED_ORACLE = f"""
WITH {_logreg_cte("doc_id % 5 <> 0")},
mt AS (
  SELECT x.doc_id, CAST(SUM(x.x * w3.w) AS BIGINT) AS margin_q
  FROM x JOIN w3 USING (b)
  WHERE x.doc_id % 5 = 0
  GROUP BY x.doc_id
)
SELECT y.doc_id, CAST(y.y AS INT) AS y,
       mt.margin_q,
       CAST(CASE WHEN mt.margin_q > 0 THEN 1 ELSE 0 END AS INT) AS pred_en,
       CAST(CASE WHEN (mt.margin_q > 0) = (y.y = 1) THEN 1 ELSE 0 END
            AS INT) AS correct
FROM ylab y JOIN mt USING (doc_id)
ORDER BY y.doc_id
"""


def _logreg_featurize(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The shared featurizer: documents (doc_id, lang, text) -> the
    exact-integer feature frame x = (doc_id, b, x: BIGINT) — hashed
    word buckets at scale _LR_XS plus the bias bucket — and the label
    frame (doc_id, y). Used verbatim by batch training AND the
    streaming scorer (the served-model property: featurization must
    be identical or served scores drift from the trained model)."""
    from hive_service_spark.llm.dedup import _h

    tok = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.explode(F.split(F.lower("text"), " ")).alias("word"),
    ).select("doc_id", "y", (_h(F.col("word")) % _LR_B).alias("b"))
    # NOTE (r13): the "obvious" single-pass rewrite — derive nd/ylab
    # from the (doc_id, b) aggregate instead of three explode passes —
    # was implemented and MEASURED SLOWER in an interleaved A/B
    # (medians 3.20s vs 3.10s without, 3.37s vs 2.81s with the doc_id
    # co-partitioning below): nd's lineage then rides the heavy
    # (doc, bucket)-keyed exchange instead of its own cheap map-side
    # count, and the explode passes it saves are trivial next to that
    # exchange. Kept as the three cheap passes deliberately.
    nd = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ylab = tok.select("doc_id", "y").distinct()
    xb = tok.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    x = (
        xb.join(nd, "doc_id")
        .select(
            "doc_id",
            "b",
            F.round(F.lit(_LR_XS) * F.col("c") / F.col("n"))
            .cast("bigint")
            .alias("x"),
        )
        .unionByName(
            nd.select(
                "doc_id",
                F.lit(_LR_B).alias("b"),
                F.lit(_LR_XS).cast("bigint").alias("x"),
            )
        )
    )
    return x, ylab


def _logreg_margins(x: DataFrame, w: DataFrame) -> DataFrame:
    """Exact BIGINT margins per doc under a BROADCAST weight vector —
    THE one scoring expression batch training (residuals), batch
    serving, and the streaming scorer all share, so the served-model
    property holds by construction, not just by test."""
    return (
        x.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("w")).cast("bigint").alias("mi"))
    )


def _logreg_scores(ylab: DataFrame, margins: DataFrame) -> DataFrame:
    """(doc_id, y) ⋈ exact margins -> the served row shape
    (doc_id, y, margin_q, pred_en, correct) — shared by the batch and
    streaming scorers."""
    return ylab.join(
        margins.withColumnRenamed("mi", "margin_q"), "doc_id"
    ).select(
        "doc_id",
        F.col("y").cast("int").alias("y"),
        "margin_q",
        F.when(F.col("margin_q") > 0, 1).otherwise(0)
        .cast("int")
        .alias("pred_en"),
        F.when((F.col("margin_q") > 0) == (F.col("y") == 1), 1)
        .otherwise(0)
        .cast("int")
        .alias("correct"),
    )


def _logreg_core(
    spark: SparkSession, sf_dir: str, train_col, prefilter=None
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """Shared Spark GD core. ``train_col`` is a boolean Column over
    doc_id selecting the training split. Returns (x, ylab, w1, w2, w3)
    — x persisted and reused by all three steps, ylab carrying
    (doc_id, y, is_train), weights BIGINT in 1e-6 units after each
    step. Every cross-row sum is BIGINT-exact; see ml_logreg_quality
    for the full exactness argument.

    ``prefilter`` (round-10 ADVICE #2): a boolean Column applied to
    the corpus BEFORE featurization. A train-only caller (the ingest
    stream's frozen static side, which never scores stored docs) passes
    its split predicate here with ``train_col=lit(True)`` so the 20%
    it will never train on is not featurized and persisted as dead
    weight; gradients are unchanged because every training aggregate
    joins through the train split anyway."""
    from hive_service_spark.registry import persisted

    from hive_service_spark.catalog import par

    d = load(spark, sf_dir, "documents")
    if prefilter is not None:
        d = d.where(prefilter)
    x0, ylab0 = _logreg_featurize(d)
    # ylab persists too: one row per doc, and WITHOUT it every
    # consumer (e1, both _resid steps, n_total, the final join)
    # re-runs the tokenize/explode/distinct corpus pass.
    # r13 optimization (guide §2.4 two operations keyed the same way
    # share one exchange): BOTH persisted frames are hash-partitioned
    # on doc_id at materialization. Every downstream consumer is keyed
    # on doc_id — each GD step's margins groupBy, the x ⋈ residuals
    # gradient join, ytrain ⋈ margins, the final scoring joins — so
    # establishing the partitioning once behind the cache removes a
    # per-step Exchange of the corpus-sized feature frame (the joins
    # then co-locate; only the 65-bucket gradient shuffle remains per
    # step). Partition count from par() (defaultParallelism), never a
    # local constant.
    ylab = persisted(
        ylab0.select("doc_id", "y", train_col.alias("is_train")).repartition(
            par(spark), "doc_id"
        )
    )
    x = persisted(x0.repartition(par(spark), "doc_id"))
    ytrain = ylab.where("is_train")
    n_total = ytrain.agg(F.count(F.lit(1)).alias("nd_total"))

    def _step(e_df: DataFrame, w_prev: DataFrame | None) -> DataFrame:
        """One GD step: exact-integer gradient on the 65-bucket key
        space, then the weight update (w_prev None = all-zero w)."""
        g = (
            x.join(e_df, "doc_id")
            .groupBy("b")
            .agg(F.sum(F.col("e") * F.col("x")).cast("bigint").alias("g"))
        )
        delta = F.round(
            F.lit(_LR_LR)
            * F.col("g")
            / (F.lit(_LR_XS) * F.col("nd_total").cast("double"))
        ).cast("bigint")
        g = g.crossJoin(F.broadcast(n_total))
        if w_prev is None:
            return g.select("b", (F.lit(0) - delta).alias("w"))
        return g.join(F.broadcast(w_prev), "b").select(
            "b", (F.col("w") - delta).alias("w")
        )

    def _resid(w_df: DataFrame) -> DataFrame:
        """Training residuals e = round(ES*(p - y)) from the exact
        integer margin under the broadcast weight vector."""
        m = _logreg_margins(x, w_df)
        mm = F.col("mi") / F.lit(1e10)
        p = F.lit(0.5) + mm / (F.lit(2) * (F.lit(1) + F.abs(mm)))
        return ytrain.join(m, "doc_id").select(
            "doc_id",
            F.round((p - F.col("y")) * F.lit(_LR_ES)).cast("bigint").alias("e"),
        )

    e1 = ytrain.select(
        "doc_id",
        F.round((F.lit(0.5) - F.col("y")) * F.lit(_LR_ES))
        .cast("bigint")
        .alias("e"),
    )
    w1 = persisted(_step(e1, None))
    w2 = persisted(_step(_resid(w1), w1))
    w3 = persisted(_step(_resid(w2), w2))
    return x, ylab, w1, w2, w3


@query("ml_logreg_quality", oracle=_LOGREG_ORACLE)
def ml_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a binary quality/language classifier IN the engine: 3
    full-batch gradient-descent steps of logistic regression over
    hashed bag-of-words features (label: lang == 'en') — the
    fastText-style linear classifier that web-scale curation pipelines
    (CCNet, FineWeb) train to score documents, here expressed as pure
    relational algebra so the same job trains on 100 TB (reference
    surface: nothing in Hive 2.3; this extends the engine's ML family
    next to naive-Bayes langid / OLS normal equations / Lloyd
    k-means). This surface trains on the FULL corpus and reports the
    whole GD trajectory; ml_logreg_served_scores is the train/serve
    split twin.

    Exactness discipline (the NB/BM25 integer pattern, extended to an
    ITERATIVE optimizer): every cross-row SUM is over BIGINTs — per-doc
    features x = round(XS·cnt/n), per-doc residuals e = round(ES·(p−y))
    — so aggregation order can never change a bit; every nonlinearity
    (the rational sigmoid surrogate p = 0.5 + m/(2(1+|m|)), computed
    from the exact integer margin — no exp(), so no libm divergence)
    is a pure scalar function requantized by one ROUND. DuckDB unrolls
    the identical three iterations in CTEs, so the value hash verifies
    the whole GD trajectory (w after each step) plus the final
    training accuracy.

    Plan shape, 100 TB reading: featurization is one explode +
    map-side-combined groupBy per doc (bounded key space: 65 buckets x
    docs); each GD step is (a) margins — join x against the BROADCAST
    65-row weight vector, groupBy doc_id; (b) residuals — pure scalar
    map; (c) gradient — one groupBy onto the 65-bucket key space
    (map-side combine collapses it before the shuffle). The model is
    model-bounded by construction (65 rows at any corpus size), the
    feature frame is persisted once and reused by all three steps, and
    nothing driver-side ever holds data-sized state."""
    x, ylab, w1, w2, w3 = _logreg_core(spark, sf_dir, F.lit(True))
    m4 = _logreg_margins(x, w3)
    acc = (
        ylab.join(m4, "doc_id")
        .agg(
            F.count(
                F.when((F.col("mi") > 0) == (F.col("y") == 1), 1)
            ).cast("bigint").alias("n_correct")
        )
    )
    return (
        w1.withColumnRenamed("w", "w_iter1")
        .join(w2.withColumnRenamed("w", "w_iter2"), "b")
        .join(w3.withColumnRenamed("w", "w_iter3"), "b")
        .crossJoin(F.broadcast(acc))
        .select(
            "b",
            "w_iter1",
            "w_iter2",
            "w_iter3",
            F.col("n_correct").alias("n_correct_final"),
        )
        .orderBy("b")
    )


@query("ml_logreg_served_scores", oracle=_LOGREG_SERVED_ORACLE)
def ml_logreg_served_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train/serve discipline twin of ml_logreg_quality: train the
    same 3-step exact-integer logistic regression on the 80% split
    (doc_id % 5 != 0 — the NB family's split convention) and SCORE the
    held-out 20%, emitting each test document's exact integer margin,
    prediction, and correctness — the per-document serving path a
    curation pipeline actually runs after training (threshold the
    margin to keep/drop documents). Featurization is shared verbatim
    with training (_logreg_core), the served-model property the DSIR
    batch/stream pair also pins. The value hash verifies every test
    margin exactly — weights AND scores are BIGINT, so there is no
    float tolerance anywhere in the served path."""
    x, ylab, _w1, _w2, w3 = _logreg_core(
        spark, sf_dir, F.col("doc_id") % 5 != 0
    )
    mt = _logreg_margins(x.where(F.col("doc_id") % 5 == 0), w3)
    return _logreg_scores(ylab, mt).orderBy("doc_id")
