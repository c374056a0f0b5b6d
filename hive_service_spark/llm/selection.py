"""Data-selection + corpus-statistics operators for training pipelines.

Three first-class components a 100 TB pretraining pipeline runs between
raw crawl and training shards, all pure relational algebra (no Python
on the data path) with fully value-checked DuckDB oracles:

- ``pipeline_dsir_importance`` — Data Selection via Importance
  Resampling (Xie et al. 2023, arXiv:2302.03169): hashed-n-gram bag
  distributions for a target slice vs the raw crawl, per-document
  importance log-ratios, deterministic top-K selection.
- ``text_zipf_fit`` — per-language Zipf law fit (log-log regression of
  word frequency on rank) over the ranked vocabulary, the standard
  corpus-health / tokenizer-design statistic.
- ``text_cms_heavy_hitters`` — a count-min sketch (Cormode &
  Muthukrishnan 2005) built AS relational algebra (d hash rows x w
  counters = one aggregate), probed for the exact top-k heavy hitters
  so the oracle replays sketch AND ground truth and checks the
  no-undercount invariant cell by cell.

No reference analog (Hive 2.3 ships none of these — SURVEY.md §2.3
covers its sketch set; these are the LLM-data-pipeline extension
surface). Engine-exactness discipline matches llm/classify.py: log
weights are BIGINT-quantized (round(1024*ln x)) so per-doc sums are
exact integers in any partition order; the Zipf regression runs on
1e6-quantized BIGINT moments so both engines sum identical integers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hive_service_spark.catalog import load
from hive_service_spark.llm.dedup import _h
from hive_service_spark.registry import persisted, query

# ---------------------------------------------------------------------------
# 1. DSIR importance resampling
# ---------------------------------------------------------------------------

_DSIR_B = 256     # hashed feature buckets (paper uses 10k; scale-free knob)
_DSIR_K = 150     # selected documents (fixed at any sf — bounded output)

# feature stream: unigrams + space-joined bigrams, md5-hashed into
# _DSIR_B buckets. The target slice is the English sub-corpus (the
# paper's "formal text" target); raw = the whole crawl.
_DSIR_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, lang, string_split(lower(text), ' ') AS w
  FROM documents
),
feats AS (
  SELECT doc_id, source, lang,
         (('0x' || substr(md5(f), 1, 8))::BIGINT % {_DSIR_B}) AS b
  FROM (
    SELECT doc_id, source, lang, unnest(w) AS f FROM d
    UNION ALL
    SELECT doc_id, source, lang, w[i] || ' ' || w[i + 1] AS f
    FROM d, unnest(generate_series(1, len(w) - 1)) AS t(i)
  )
),
model AS (
  SELECT b,
         COUNT(*) AS cr,
         COUNT(*) FILTER (WHERE lang = 'en') AS ct
  FROM feats GROUP BY b
),
tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM model),
logratio AS (
  SELECT m.b,
         CAST(ROUND(1024 * ln(((m.ct + 1.0) * (t.nr + {_DSIR_B}))
                              / ((m.cr + 1.0) * (t.nt + {_DSIR_B}))))
              AS BIGINT) AS q
  FROM model m, tot t
),
scored AS (
  SELECT f.doc_id, f.source, f.lang,
         CAST(SUM(l.q) AS BIGINT) AS score_q,
         COUNT(*) AS n_feats
  FROM feats f JOIN logratio l ON f.b = l.b
  GROUP BY f.doc_id, f.source, f.lang
),
ranked AS (
  SELECT doc_id, source, lang, CAST(n_feats AS BIGINT) AS n_feats,
         ROUND(score_q / 1024.0 / n_feats, 6) + 0.0 AS avg_logratio,
         ROW_NUMBER() OVER (ORDER BY score_q * 1.0 / n_feats DESC, doc_id)
           AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= {_DSIR_K}
"""


def _dsir_features(docs: DataFrame) -> DataFrame:
    """Hashed unigram+bigram feature stream (doc_id, source, lang, b)
    — shared by the batch selector and the streaming scorer (the
    featurization MUST be identical or the served scores drift from
    the trained model)."""
    w = F.split(F.lower("text"), " ")
    base = docs.select("doc_id", "source", "lang", w.alias("w"))
    unis = base.select(
        "doc_id", "source", "lang", F.explode("w").alias("f")
    )
    bigs = base.select(
        "doc_id",
        "source",
        "lang",
        F.explode(
            F.transform(
                F.slice("w", 1, F.size("w") - 1),
                lambda x, i: F.concat_ws(
                    " ", x, F.element_at("w", (i + 2).cast("int"))
                ),
            )
        ).alias("f"),
    )
    return unis.unionByName(bigs).select(
        "doc_id", "source", "lang", (_h(F.col("f")) % _DSIR_B).alias("b")
    )


def _dsir_model(feats: DataFrame) -> DataFrame:
    """256-row importance log-ratio model (b, q) from a feature
    stream; q is the BIGINT-quantized log-ratio."""
    model = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("ct"),
    )
    tot = model.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    return model.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            1024
            * F.log(
                ((F.col("ct") + 1.0) * (F.col("nr") + F.lit(_DSIR_B)))
                / ((F.col("cr") + 1.0) * (F.col("nt") + F.lit(_DSIR_B)))
            )
        )
        .cast("bigint")
        .alias("q"),
    )


@query("pipeline_dsir_importance", oracle=_DSIR_ORACLE)
def pipeline_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023, arXiv:2302.03169): select raw-crawl
    documents whose hashed-n-gram distribution looks like the target
    slice. Features = unigrams + bigrams md5-hashed into 256 buckets;
    two smoothed multinomials (target = lang='en', raw = everything)
    give a per-bucket importance log-ratio; a document's weight is the
    sum of its features' log-ratios, and the top-K by per-feature
    average are selected (the deterministic counterpart of the paper's
    Gumbel resampling — same weights, reproducible pick).

    Engine lockstep: the log-ratio is quantized to BIGINT
    (round(1024*ln x), one identical expression shape on both engines)
    so per-doc sums are exact integers regardless of partition order;
    ranking compares the same int/int division on both engines with a
    doc_id tie-break.

    Scale (100 TB): the model is ONE pass over the feature stream
    (map-side explode, 256-cell aggregate) and broadcasts as 256 rows;
    scoring is a broadcast equi-join + per-doc integer sum (one
    shuffle on doc_id); selection is a distributed top-K
    (TakeOrderedAndProject), never a global window — the rank is
    assigned after the K-row cut."""
    feats = persisted(_dsir_features(load(spark, sf_dir, "documents")))
    logratio = _dsir_model(feats)
    scored = (
        feats.join(F.broadcast(logratio), "b")
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.sum("q").cast("bigint").alias("score_q"),
            F.count(F.lit(1)).alias("n_feats"),
        )
    )
    ratio = F.col("score_q") / F.col("n_feats")
    top = scored.orderBy(F.desc(ratio), F.asc("doc_id")).limit(_DSIR_K)
    # rank over the K-row cut only (TakeOrderedAndProject did the
    # distributed top-K; the window touches <= K rows)
    rw = Window.orderBy(F.desc(ratio), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "source",
        "lang",
        F.col("n_feats").cast("bigint").alias("n_feats"),
        (F.round(F.col("score_q") / 1024.0 / F.col("n_feats"), 6) + 0.0).alias(
            "avg_logratio"
        ),
        F.row_number().over(rw).alias("rank"),
    )


# ---------------------------------------------------------------------------
# 2. Zipf law fit over the ranked vocabulary
# ---------------------------------------------------------------------------

_ZIPF_R = 200  # regression over the top R words per language

_ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS t FROM documents
),
counts AS (SELECT lang, t, COUNT(*) AS c FROM tok GROUP BY lang, t),
stats AS (
  SELECT lang, COUNT(*) AS n_types, CAST(SUM(c) AS BIGINT) AS n_tokens
  FROM counts GROUP BY lang
),
ranked AS (
  SELECT lang, c,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, t) AS r
  FROM counts
),
q AS (
  SELECT lang,
         CAST(ROUND(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS qx,
         CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS qy
  FROM ranked WHERE r <= {_ZIPF_R}
),
mom AS (
  SELECT lang, COUNT(*) AS n,
         CAST(SUM(qx) AS BIGINT) AS sx, CAST(SUM(qy) AS BIGINT) AS sy,
         CAST(SUM(qx * qy) AS BIGINT) AS sxy,
         CAST(SUM(qx * qx) AS BIGINT) AS sxx
  FROM q GROUP BY lang
)
SELECT m.lang, s.n_types, s.n_tokens,
       ROUND(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
             / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE), 4) + 0.0
         AS zipf_slope,
       ROUND((CAST(m.sy AS DOUBLE)
              - CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
                * CAST(m.sx AS DOUBLE))
             / CAST(m.n AS DOUBLE) / 1000000.0, 4) + 0.0
         AS zipf_intercept
FROM mom m JOIN stats s ON m.lang = s.lang
ORDER BY m.lang
"""


@query("text_zipf_fit", oracle=_ZIPF_ORACLE)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf fit: least-squares slope/intercept of
    ln(frequency) on ln(rank) over the top 200 vocabulary words — the
    corpus-health statistic (natural language ~ slope -1) tokenizer
    and mixture design starts from.

    Engine lockstep: ln(rank)/ln(count) are quantized to 1e-6 BIGINTs
    and the regression is computed from five exact integer moments
    (n, Sx, Sy, Sxy, Sxx) — both engines sum identical integers in any
    order, then perform the same two divisions; a float regr_slope
    would flap on parallel-sum association. Slope on the quantized
    scale equals slope on the raw scale (both axes share the 1e6
    factor); the intercept divides it back out.

    Scale (100 TB): word counts are one map-side-combined shuffle; the
    rank window partitions by language over the VOCABULARY (types, not
    tokens — bounded well below corpus size) and everything after the
    top-R cut is per-language constant work."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    counts = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("c"))
    stats = counts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").cast("bigint").alias("n_tokens"),
    )
    rw = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("t"))
    q = (
        counts.withColumn("r", F.row_number().over(rw))
        .where(F.col("r") <= _ZIPF_R)
        .select(
            "lang",
            F.round(F.log(F.col("r").cast("double")) * 1000000)
            .cast("bigint")
            .alias("qx"),
            F.round(F.log(F.col("c").cast("double")) * 1000000)
            .cast("bigint")
            .alias("qy"),
        )
    )
    mom = q.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qx").cast("bigint").alias("sx"),
        F.sum("qy").cast("bigint").alias("sy"),
        F.sum(F.col("qx") * F.col("qy")).cast("bigint").alias("sxy"),
        F.sum(F.col("qx") * F.col("qx")).cast("bigint").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("n").cast("double")
        / 1000000.0
    )
    return (
        mom.join(stats, "lang")
        .select(
            "lang",
            "n_types",
            "n_tokens",
            (F.round(slope, 4) + 0.0).alias("zipf_slope"),
            (F.round(intercept, 4) + 0.0).alias("zipf_intercept"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# 3. Count-min sketch as relational algebra
# ---------------------------------------------------------------------------

_CMS_D = 4    # hash rows
_CMS_W = 64   # counters per row
_CMS_K = 20   # heavy hitters probed

_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
),
cells AS (
  SELECT j,
         (('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || t), 1, 8))::BIGINT
          % {_CMS_W}) AS b,
         COUNT(*) AS cell
  FROM tok, unnest(generate_series(0, {_CMS_D - 1})) AS g(j)
  GROUP BY 1, 2
),
topk AS (
  SELECT t, COUNT(*) AS exact_cnt
  FROM tok GROUP BY t
  ORDER BY exact_cnt DESC, t
  LIMIT {_CMS_K}
),
probes AS (
  SELECT k.t, k.exact_cnt, g.j,
         (('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || k.t), 1, 8))
            ::BIGINT % {_CMS_W}) AS b
  FROM topk k, unnest(generate_series(0, {_CMS_D - 1})) AS g(j)
)
SELECT p.t AS word,
       CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(MIN(c.cell) AS BIGINT) AS est_cnt,
       CAST(MIN(c.cell) - p.exact_cnt AS BIGINT) AS overcount,
       MIN(c.cell) >= p.exact_cnt AS no_undercount
FROM probes p JOIN cells c ON p.j = c.j AND p.b = c.b
GROUP BY p.t, p.exact_cnt
ORDER BY exact_cnt DESC, word
"""


@query("text_cms_heavy_hitters", oracle=_CMS_ORACLE)
def text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) built as plain
    relational algebra — d=4 md5-derived hash rows x w=64 counters =
    ONE 256-cell aggregate — probed for the corpus's exact top-20
    words. Unlike engine-private sketch blobs (Spark's
    count_min_sketch returns opaque binary), this sketch is a
    DataFrame, so the DuckDB oracle replays every cell and the classic
    CMS invariant (estimate never undercounts; overcount bounded by
    collisions) is value-checked per word rather than trusted.

    Scale (100 TB): the sketch build is a map-side-combined aggregate
    to d*w cells no matter the corpus size — the streaming-friendly
    shape (cells are mergeable across shards by addition); the exact
    top-k is one word-count shuffle + distributed TakeOrdered; probing
    joins k*d probe rows against the 256-cell sketch (both
    broadcast-size)."""
    d = load(spark, sf_dir, "documents")
    tok = persisted(
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
    )  # two consumers: sketch build + exact top-k

    def _bucket(j_col, t_col):
        return _h(F.concat(j_col.cast("string"), F.lit(":"), t_col)) % _CMS_W

    jrows = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(_CMS_D - 1)),
            lambda j: F.struct(
                j.cast("int").alias("j"),
                _bucket(j, F.col("t")).alias("b"),
            ),
        )
    )
    cells = (
        tok.select(jrows.alias("jb"))
        .select("jb.j", "jb.b")
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("cell"))
    )
    topk = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("t"))
        .limit(_CMS_K)
    )
    probes = topk.select(
        "t",
        "exact_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j"),
    ).select(
        "t", "exact_cnt", "j", _bucket(F.col("j"), F.col("t")).alias("b")
    )
    est = (
        F.broadcast(probes)
        .join(F.broadcast(cells), ["j", "b"])
        .groupBy("t", "exact_cnt")
        .agg(F.min("cell").alias("est"))
    )
    return est.select(
        F.col("t").alias("word"),
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
        F.col("est").cast("bigint").alias("est_cnt"),
        (F.col("est") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
        (F.col("est") >= F.col("exact_cnt")).alias("no_undercount"),
    ).orderBy(F.desc("exact_cnt"), F.asc("word"))


# ---------------------------------------------------------------------------
# per-domain quality pruning: stratified top-quartile selection via an
# exact score-histogram threshold (no full-data sort)
# ---------------------------------------------------------------------------

_DOMAIN_PRUNE_ORACLE = """
WITH sc AS (
  SELECT doc_id, source,
         (1000000 * len(regexp_extract_all(text,
            '\\b(the|a|and|or|of|to|in|is|for|on|with)\\b'))
            // len(string_split(text, ' ')))
         - (1000000 * len(regexp_extract_all(text, '[[:punct:]]'))
            // length(text)) AS score_q
  FROM documents
),
hist AS (
  SELECT source, score_q, COUNT(*) AS c
  FROM sc GROUP BY source, score_q
),
cum AS (
  SELECT source, score_q,
         SUM(c) OVER (PARTITION BY source ORDER BY score_q DESC
                      ROWS UNBOUNDED PRECEDING) AS ge,
         SUM(c) OVER (PARTITION BY source) AS n
  FROM hist
),
th AS (
  SELECT source, MAX(score_q) AS threshold_q,
         CAST(MAX(n) AS BIGINT) AS n_source
  FROM cum
  WHERE ge >= CAST(CEIL(n / 4.0) AS BIGINT)
  GROUP BY source
)
SELECT sc.doc_id, sc.source,
       CAST(sc.score_q AS BIGINT) AS score_q,
       CAST(th.threshold_q AS BIGINT) AS threshold_q,
       th.n_source,
       CAST(CASE WHEN sc.score_q > th.threshold_q THEN 1 ELSE 0 END
            AS BIGINT) AS kept
FROM sc JOIN th USING (source)
ORDER BY sc.doc_id
"""


@query("sel_domain_quality_prune", oracle=_DOMAIN_PRUNE_ORACLE)
def sel_domain_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DOMAIN quality pruning: within each source, keep only the
    top quality quartile — the stratified filtering step real
    pretraining pipelines run so a low-quality-but-huge domain cannot
    pass the global gate while a clean domain gets over-pruned
    (FineWeb/RefinedWeb-style per-dump thresholds). Quality is an
    exact-integer composite (ppm stopword density minus ppm
    punctuation density — the same signals as text_quality_scores,
    floor-divided so both engines agree bit-for-bit).

    Scale shape (the reason this is not ROW_NUMBER per source): an
    exact per-domain quantile over 100 TB must not sort each domain's
    full partition. The threshold comes from the SCORE HISTOGRAM —
    groupBy (source, score_q) is map-side combinable onto a tiny key
    space, the descending cumulative count runs on that small frame,
    and the per-source threshold (largest score whose >=-count reaches
    ceil(n/4)) joins back by source — the corpus is touched map-only
    plus one broadcast-sized equi-join; no window ever sees a full
    domain partition. Boundary docs AT the threshold score are dropped
    (kept = score > T), so the kept set is deterministic without any
    per-doc tiebreak and never exceeds the quartile."""
    from hive_service_spark.llm.text import _EN_MARKERS

    d = load(spark, sf_dir, "documents")
    stop_re = r"\b(" + "|".join(_EN_MARKERS) + r")\b"
    sc = d.select(
        "doc_id",
        "source",
        F.size(F.regexp_extract_all("text", F.lit(stop_re))).alias(
            "stop_hits"
        ),
        F.size(
            F.regexp_extract_all("text", F.lit(r"[\!-/\:-@\[-`\{-~]"))
        ).alias("punct_hits"),
        F.size(F.split("text", " ")).alias("n_words"),
        F.length("text").alias("n_chars_txt"),
    ).select(
        "doc_id",
        "source",
        (
            F.expr("CAST((1000000 * stop_hits) DIV n_words AS BIGINT)")
            - F.expr(
                "CAST((1000000 * punct_hits) DIV n_chars_txt AS BIGINT)"
            )
        ).alias("score_q"),
    )
    hist = sc.groupBy("source", "score_q").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_desc = (
        Window.partitionBy("source")
        .orderBy(F.col("score_q").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "source",
        "score_q",
        F.sum("c").over(w_desc).alias("ge"),
        F.sum("c").over(Window.partitionBy("source")).alias("n"),
    )
    th = (
        cum.where(F.col("ge") >= F.ceil(F.col("n") / 4.0))
        .groupBy("source")
        .agg(
            F.max("score_q").cast("bigint").alias("threshold_q"),
            F.max("n").cast("bigint").alias("n_source"),
        )
    )
    return (
        sc.join(F.broadcast(th), "source")
        .select(
            "doc_id",
            "source",
            F.col("score_q").cast("bigint").alias("score_q"),
            "threshold_q",
            "n_source",
            F.when(F.col("score_q") > F.col("threshold_q"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("kept"),
        )
        .orderBy("doc_id")
    )
