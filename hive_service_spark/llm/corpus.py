"""LLM-pipeline extension — corpus preparation operators.

Three training-data operators a 100 TB pipeline needs between cleaning
and shard-packing (BASELINE.json mandate; no direct reference analog —
the reference's closest surfaces are the `ngrams` UDAF and TABLESAMPLE,
SURVEY.md §2.3/§2.6):

- context-window chunking: split each document into overlapping
  word-window chunks (the dataset shape every fixed-context trainer
  consumes). Pure explode of a per-row computed array — map-only, no
  shuffle; chunk count scales with corpus tokens, not documents².
- TF-IDF top terms per source: the classic corpus-characterization /
  domain-keyword report. Two aggregations (term frequency, document
  frequency) + one join on the term key. Because IDF is constant per
  term, the per-source score is SUM(tf) * idf — a single multiply, so
  no float-accumulation-order hazard between engines.
- deterministic per-group reservoir sample: fixed-size uniform sample
  per source via md5-hash priority (A-Res with a hash in place of the
  RNG). Fully reproducible across engines and runs — the property an
  auditable data pipeline needs that `TABLESAMPLE`/`rand()` can't give.
  One shuffle on the group key; the window top-k is the only sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hive_service_spark.catalog import load
from hive_service_spark.registry import query

_CHUNK_W = 32   # chunk size in words (the "context window")
_CHUNK_S = 24   # stride: 8-word overlap between consecutive chunks

_CHUNK_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
),
st AS (
  SELECT doc_id, w, n,
         unnest(generate_series(1, n, {_CHUNK_S})) AS start
  FROM w
)
SELECT doc_id,
       CAST((start - 1) // {_CHUNK_S} AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start_word,
       CAST(least({_CHUNK_W}, n - start + 1) AS BIGINT) AS n_chunk_words,
       md5(array_to_string(
         list_slice(w, start, least(start + {_CHUNK_W} - 1, n)), ' '))
         AS chunk_hash
FROM st
ORDER BY doc_id, chunk_idx
"""


@query("doc_chunking_overlap", oracle=_CHUNK_ORACLE)
def doc_chunking_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: every document becomes
    ceil(n_words / stride) chunks of up to {W} words starting every
    {S} words (8-word overlap keeps context across boundaries). The
    chunk text is verified by md5 so the oracle checks exact content,
    not just counts. Map-only: the chunk array is computed per row and
    exploded — at 100 TB this is one pass with output proportional to
    corpus size, and the downstream writer partitions by hash(doc_id)
    to keep shards balanced."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n = F.size(w)
    starts = F.sequence(F.lit(1), n, F.lit(_CHUNK_S))
    chunks = F.transform(
        starts,
        lambda st: F.struct(
            st.cast("long").alias("start_word"),
            F.least(F.lit(_CHUNK_W), n - st + 1).cast("long").alias(
                "n_chunk_words"
            ),
            F.md5(F.concat_ws(" ", F.slice(w, st, F.lit(_CHUNK_W)))).alias(
                "chunk_hash"
            ),
        ),
    )
    return (
        d.select("doc_id", F.posexplode(chunks).alias("pos", "c"))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("chunk_idx"),
            "c.start_word",
            "c.n_chunk_words",
            "c.chunk_hash",
        )
        .orderBy("doc_id", "chunk_idx")
    )


_TFIDF_ORACLE = """
WITH term_doc AS (
  SELECT doc_id, source, term, COUNT(*) AS tf
  FROM (
    SELECT doc_id, source, lower(unnest(string_split(text, ' '))) AS term
    FROM documents
  )
  WHERE length(term) >= 4
  GROUP BY doc_id, source, term
),
df AS (SELECT term, COUNT(*) AS df FROM term_doc GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT s.source, s.term, s.tf_sum, df.df,
         ROUND(s.tf_sum * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) + 0.0
           AS tfidf
  FROM (SELECT source, term, CAST(SUM(tf) AS BIGINT) AS tf_sum
        FROM term_doc GROUP BY source, term) s
  JOIN df USING (term) CROSS JOIN n
)
SELECT source, term, tf_sum, df, tfidf, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY tfidf DESC, term) AS rnk
  FROM scored
) WHERE rnk <= 5
ORDER BY source, rnk
"""


@query("text_tfidf_top_terms", oracle=_TFIDF_ORACLE)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per source by TF-IDF (ln(N/df), no smoothing —
    every term in the index has df >= 1). Shuffle profile at 100 TB:
    explode -> partial-aggregated groupBy on (doc, term), then two
    bounded-key aggregations (term, source x term) and one join on the
    term key; the N scalar broadcasts. Because idf is constant per
    term, score = SUM(tf) * idf — one multiply after an integer sum,
    so both engines compute bit-comparable doubles (ranking compares
    ROUND(score, 6) on both sides)."""
    d = load(spark, sf_dir, "documents")
    term_doc = (
        d.select(
            "doc_id",
            "source",
            F.explode(F.split("text", " ")).alias("t"),
        )
        .select("doc_id", "source", F.lower("t").alias("term"))
        .where(F.length("term") >= 4)
        .groupBy("doc_id", "source", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = term_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    src_tf = term_doc.groupBy("source", "term").agg(
        F.sum("tf").cast("bigint").alias("tf_sum")
    )
    scored = (
        src_tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "term",
            "tf_sum",
            "df",
            (
                F.round(
                    F.col("tf_sum")
                    * F.log(F.col("n_docs").cast("double") / F.col("df")),
                    6,
                )
                + 0.0
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
        .orderBy("source", "rnk")
    )


_RESERVOIR_K = 10

_RESERVOIR_ORACLE = f"""
SELECT source, sample_rank, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
  FROM documents
) WHERE sample_rank <= {_RESERVOIR_K}
ORDER BY source, sample_rank
"""


@query("sample_hash_reservoir", oracle=_RESERVOIR_ORACLE)
def sample_hash_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size uniform sample per source: each doc
    gets priority md5(doc_id) and the k smallest priorities per group
    win — Efraimidis-Spirakis reservoir sampling with a hash standing
    in for the RNG, so the sample is identical on every engine, run,
    and retry (the reproducibility TABLESAMPLE/rand() can't give an
    audited pipeline). One shuffle on the group key; at 100 TB the
    window becomes a per-partition top-k + re-merge (rank <= k lets
    Spark's TopK/limit pushdown bound the sort), and a skewed group
    costs only its own partition."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= _RESERVOIR_K)
        .select(
            "source",
            F.col("sample_rank").cast("long").alias("sample_rank"),
            "doc_id",
            "n_chars",
        )
        .orderBy("source", "sample_rank")
    )


# ---------------------------------------------------------------------------
# leakage-safe deterministic train/val/test split
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = """
WITH grouped AS (
  SELECT doc_id, source,
         md5(lower(trim(text))) AS content_group
  FROM documents
),
assigned AS (
  SELECT doc_id, source,
         CASE WHEN b < 80 THEN 'train'
              WHEN b < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, source,
               ('0x' || substr(md5(content_group), 1, 15))::BIGINT % 100 AS b
        FROM grouped)
)
SELECT source, split, COUNT(*) AS n_docs
FROM assigned
GROUP BY source, split
ORDER BY source, split
"""


@query("pipeline_train_val_test_split", oracle=_SPLIT_ORACLE)
def pipeline_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe deterministic train/val/test split (80/10/10): the
    split is assigned per CONTENT GROUP (md5 of normalized text), not
    per row, so exact duplicates can never straddle train and eval —
    the train-test-contamination failure a row-wise random split
    invites. Assignment is a pure hash of the group key (no RNG, no
    state): identical on every engine, run, retry, and cluster size,
    and new data lands in stable splits without reshuffling old rows.
    Map-only until the final count aggregate — no shuffle at 100 TB
    except one partial-agg tree on (source, split). A near-dup-safe
    variant would feed the MinHash-LSH cluster id (llm/dedup.py) in as
    the group key — same split logic, one extra join."""
    d = load(spark, sf_dir, "documents")
    group = F.md5(F.lower(F.trim(F.col("text"))))
    bucket = (
        F.conv(F.substring(F.md5(group), 1, 15), 16, 10).cast("bigint") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "split")
    )
