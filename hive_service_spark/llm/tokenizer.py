"""Distributed BPE tokenizer training — unrolled merge rounds.

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) is how
every modern LLM vocabulary is built. The trainer here uses the same
trick production BPE trainers do: after one pass that reduces the
corpus to a WORD-FREQUENCY table, every merge round runs over the
vocabulary (types × their counts), not the corpus — so at 100 TB the
corpus is touched exactly once (one map-side-combined word count) and
the iterative part is bounded by vocabulary size.

Engine-exactness: each word's symbol sequence is encoded as
``|s1||s2||...|`` (every symbol wrapped in its own pipes). Applying a
merge (a,b) is then a plain string ``replace`` of ``|a||b|`` with
``|ab|`` — and because each symbol carries BOTH its delimiters, the
non-overlapping left-to-right replace that Spark, DuckDB, and Python
all implement is exactly BPE's greedy merge, including runs
(``|a||a||a||a|`` -> ``|aa||aa|``) and adjacent repeats — no
shared-delimiter undercount. Pair counts are exact integers; the best
pair is argmax with a lexicographic (w1, w2) tie-break, so both
engines pick the identical merge every round. Words containing the
delimiter character are excluded up front (documented contract).

No reference analog (Hive 2.3 has no tokenizer surface); this is the
LLM-pipeline extension wave, sibling of ml_bigram_lm_quality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.registry import query

_BPE_MERGES = 3  # unrolled merge rounds (oracle replays each round)


def _seq_pairs_sql(src: str) -> str:
    """DuckDB: adjacent symbol pairs of each word's current sequence,
    weighted by word count."""
    return f"""
  SELECT s[i] AS w1, s[i + 1] AS w2, CAST(SUM(c) AS BIGINT) AS sc
  FROM (SELECT c, string_split(trim(seq, '|'), '||') AS s FROM {src}),
       unnest(generate_series(1, len(s) - 1)) AS t(i)
  GROUP BY 1, 2
"""


def _best_sql(pairs: str) -> str:
    return f"SELECT w1, w2, sc FROM {pairs} ORDER BY sc DESC, w1, w2 LIMIT 1"


def _apply_sql(src: str, best: str) -> str:
    return f"""
  SELECT w.word, w.c,
         replace(w.seq, '|' || b.w1 || '||' || b.w2 || '|',
                 '|' || b.w1 || b.w2 || '|') AS seq
  FROM {src} w, {best} b
"""


def _bpe_oracle() -> str:
    parts = [
        """
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
),
words AS (
  SELECT word, COUNT(*) AS c,
         '|' || array_to_string(regexp_extract_all(word, '.'), '||') || '|'
           AS seq
  FROM tok
  WHERE word <> '' AND word NOT LIKE '%|%'
  GROUP BY word
)"""
    ]
    src = "words"
    selects = []
    for r in range(_BPE_MERGES):
        parts.append(f", pairs{r} AS ({_seq_pairs_sql(src)})")
        parts.append(f", best{r} AS ({_best_sql(f'pairs{r}')})")
        parts.append(f", words{r + 1} AS ({_apply_sql(src, f'best{r}')})")
        selects.append(
            f"SELECT {r + 1} AS merge_rank, w1 AS left_sym, w2 AS right_sym,"
            f" w1 || w2 AS merged, sc AS pair_count FROM best{r}"
        )
        src = f"words{r + 1}"
    parts.append("\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY merge_rank")
    return "".join(parts)


_BPE_ORACLE = _bpe_oracle()


def _bpe_segment_oracle() -> str:
    parts = [
        """
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
),
words AS (
  SELECT word, COUNT(*) AS c,
         '|' || array_to_string(regexp_extract_all(word, '.'), '||') || '|'
           AS seq
  FROM tok
  WHERE word <> '' AND word NOT LIKE '%|%'
  GROUP BY word
)"""
    ]
    src = "words"
    for r in range(_BPE_MERGES):
        parts.append(f", pairs{r} AS ({_seq_pairs_sql(src)})")
        parts.append(f", best{r} AS ({_best_sql(f'pairs{r}')})")
        parts.append(f", words{r + 1} AS ({_apply_sql(src, f'best{r}')})")
        src = f"words{r + 1}"
    parts.append(
        f"""
SELECT CAST({_BPE_MERGES} AS INTEGER) AS n_merges,
       CAST(COUNT(*) AS BIGINT) AS vocab_types,
       CAST(SUM(c) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(c * length(word)) AS BIGINT) AS total_chars,
       CAST(SUM(c * len(string_split(trim(seq, '|'), '||'))) AS BIGINT)
         AS total_bpe_tokens,
       ROUND(CAST(SUM(c * length(word)) AS DOUBLE)
             / CAST(SUM(c * len(string_split(trim(seq, '|'), '||')))
                    AS DOUBLE), 4) + 0.0 AS chars_per_token
FROM {src}
"""
    )
    return "".join(parts)


_BPE_SEGMENT_ORACLE = _bpe_segment_oracle()


def _train_chain(
    spark: SparkSession, sf_dir: str, doc_filter=None
) -> tuple[DataFrame, list[DataFrame]]:
    """Shared trainer: returns (final vocabulary frame with merged
    sequences, one 1-row merge frame per round). ``doc_filter``
    restricts the TRAINING split (None = whole corpus, the original
    behavior for the three corpus-wide queries)."""
    d = load(spark, sf_dir, "documents")
    if doc_filter is not None:
        d = d.where(doc_filter)
    tok = d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
    words = (
        tok.where((F.col("word") != "") & (~F.col("word").contains("|")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "word",
            "c",
            F.concat(
                F.lit("|"),
                F.array_join(F.regexp_extract_all("word", F.lit("."), 0), "||"),
                F.lit("|"),
            ).alias("seq"),
        )
        .localCheckpoint(eager=True)
    )

    merge_rows: list[DataFrame] = []
    cur = words
    for r in range(_BPE_MERGES):
        syms = F.split(
            F.regexp_replace(F.regexp_replace("seq", r"^\|", ""), r"\|$", ""),
            r"\|\|",
        )
        pairs = (
            cur.select("c", syms.alias("s"))
            .select(
                "c",
                F.explode(
                    F.transform(
                        F.slice("s", 1, F.size("s") - 1),
                        lambda x, i: F.struct(
                            x.alias("w1"),
                            F.element_at("s", (i + 2).cast("int")).alias("w2"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.w1", "p.w2")
            .agg(F.sum("c").cast("bigint").alias("sc"))
        )
        best = pairs.orderBy(
            F.desc("sc"), F.asc("w1"), F.asc("w2")
        ).limit(1).localCheckpoint(eager=True)
        merge_rows.append(
            best.select(
                F.lit(r + 1).cast("int").alias("merge_rank"),
                F.col("w1").alias("left_sym"),
                F.col("w2").alias("right_sym"),
                F.concat("w1", "w2").alias("merged"),
                F.col("sc").alias("pair_count"),
            )
        )
        cur = (
            cur.crossJoin(F.broadcast(best))
            .select(
                "word",
                "c",
                F.replace(
                    F.col("seq"),
                    F.concat(F.lit("|"), "w1", F.lit("||"), "w2", F.lit("|")),
                    F.concat(F.lit("|"), "w1", "w2", F.lit("|")),
                ).alias("seq"),
            )
            .localCheckpoint(eager=True)
        )

    return cur, merge_rows


@query("tok_bpe_train_merges", oracle=_BPE_ORACLE)
def tok_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first N BPE merges on the corpus: reduce the corpus to
    word frequencies (the ONLY corpus-wide pass), split words into
    character symbols, then N times (a) count adjacent symbol pairs
    weighted by word frequency, (b) pick the most frequent pair
    (lexicographic tie-break), (c) merge it everywhere via the
    pipe-delimited replace (see module docstring for why that is
    exactly greedy BPE on both engines). Output: the learned merge
    table — rank, pair, merged symbol, weighted pair count — the
    artifact a tokenizer ships.

    Scale (100 TB): word counting is one map-side-combined shuffle of
    the corpus; every merge round is vocabulary-sized (types, not
    tokens): one explode of per-word symbol sequences, one pair-count
    aggregate, a 1-row argmax (TakeOrderedAndProject), and a map-only
    broadcast-apply of the merge. State between rounds is the
    vocabulary frame, localCheckpoint-truncated like the k-means loop
    so the plan doesn't double per round."""
    _, merge_rows = _train_chain(spark, sf_dir)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out.orderBy("merge_rank")


@query("tok_bpe_segment_stats", oracle=_BPE_SEGMENT_ORACLE)
def tok_bpe_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merges — segment the corpus with the trained
    tokenizer and report the numbers that grade a vocabulary: types,
    whitespace tokens, characters, BPE tokens after N merges, and
    chars-per-token (the compression a tokenizer buys). Because
    segmentation is materialized on the word-frequency table, applying
    the tokenizer to the whole corpus is a weighted aggregate over the
    vocabulary — no second corpus pass, which is exactly how a 100 TB
    deployment re-tokenizes: corpus joins the (word -> tokens) table
    instead of re-running merges per occurrence."""
    final, _ = _train_chain(spark, sf_dir)
    n_sym = F.size(
        F.split(
            F.regexp_replace(F.regexp_replace("seq", r"^\|", ""), r"\|$", ""),
            r"\|\|",
        )
    )
    return final.agg(
        F.lit(_BPE_MERGES).cast("int").alias("n_merges"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_types"),
        F.sum("c").cast("bigint").alias("total_ws_tokens"),
        F.sum(F.col("c") * F.length("word")).cast("bigint").alias("total_chars"),
        F.sum(F.col("c") * n_sym).cast("bigint").alias("total_bpe_tokens"),
        (
            F.round(
                F.sum(F.col("c") * F.length("word")).cast("double")
                / F.sum(F.col("c") * n_sym).cast("double"),
                4,
            )
            + 0.0
        ).alias("chars_per_token"),
    )


def _bpe_pack_oracle() -> str:
    parts = [
        """
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
),
words AS (
  SELECT word, COUNT(*) AS c,
         '|' || array_to_string(regexp_extract_all(word, '.'), '||') || '|'
           AS seq
  FROM tok
  WHERE word <> '' AND word NOT LIKE '%|%'
  GROUP BY word
)"""
    ]
    src = "words"
    for r in range(_BPE_MERGES):
        parts.append(f", pairs{r} AS ({_seq_pairs_sql(src)})")
        parts.append(f", best{r} AS ({_best_sql(f'pairs{r}')})")
        parts.append(f", words{r + 1} AS ({_apply_sql(src, f'best{r}')})")
        src = f"words{r + 1}"
    parts.append(
        f"""
, vocab AS (
  SELECT word, len(string_split(trim(seq, '|'), '||')) AS n_sym FROM {src}
),
doc_words AS (
  SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
),
doc_tokens AS (
  SELECT d.doc_id, d.source,
         CAST(SUM(v.n_sym) AS BIGINT) AS n_tokens
  FROM doc_words d JOIN vocab v ON d.word = v.word
  GROUP BY d.doc_id, d.source
),
packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0)
              AS BIGINT) AS shard_id
  FROM doc_tokens
)
SELECT source, shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
FROM packed
GROUP BY source, shard_id
ORDER BY source, shard_id
"""
    )
    return "".join(parts)


@query("tok_bpe_aware_pack", oracle=_bpe_pack_oracle())
def tok_bpe_aware_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware sequence packing — pipeline_pack_shards packs
    by whitespace counts; THIS packs by the trained tokenizer's actual
    token counts, which is what the training batch budget really
    spends. Composition: the learned vocabulary (word -> symbols after
    N merges) joins per-doc word counts, per-doc BPE token totals feed
    the same per-source cumulative-sum shard assignment. At 100 TB the
    vocabulary is the small side of the join (types, not tokens —
    broadcast-able), the corpus explodes once, and the shard cumsum is
    the two-level bucketed prefix sum (pipeline.two_level_cumsum) —
    bucket-parallel, output-identical to a per-source window, with
    reproducible doc_id order."""
    final, _ = _train_chain(spark, sf_dir)
    n_sym = F.size(
        F.split(
            F.regexp_replace(F.regexp_replace("seq", r"^\|", ""), r"\|$", ""),
            r"\|\|",
        )
    )
    vocab = final.select("word", n_sym.alias("n_sym"))
    d = load(spark, sf_dir, "documents")
    doc_words = d.select(
        "doc_id", "source", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    doc_tokens = (
        doc_words.join(vocab, "word")
        .groupBy("doc_id", "source")
        .agg(F.sum("n_sym").cast("bigint").alias("n_tokens"))
    )
    from hive_service_spark.llm.pipeline import two_level_cumsum

    packed = two_level_cumsum(
        doc_tokens, "source", "doc_id", "n_tokens", out_col="_cum"
    ).withColumn(
        "shard_id",
        F.floor((F.col("_cum") - F.col("n_tokens")) / 2048.0).cast("bigint"),
    )
    return (
        packed.groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        )
        .orderBy("source", "shard_id")
    )


# ---------------------------------------------------------------------------
# held-out vocabulary coverage — the train/test gauge of a tokenizer
# ---------------------------------------------------------------------------


def _vocab_coverage_oracle() -> str:
    parts = [
        """
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word
  FROM documents WHERE doc_id % 10 <> 0
),
words AS (
  SELECT word, COUNT(*) AS c,
         '|' || array_to_string(regexp_extract_all(word, '.'), '||') || '|'
           AS seq
  FROM tok
  WHERE word <> '' AND word NOT LIKE '%|%'
  GROUP BY word
)"""
    ]
    src = "words"
    for r in range(_BPE_MERGES):
        parts.append(f", pairs{r} AS ({_seq_pairs_sql(src)})")
        parts.append(f", best{r} AS ({_best_sql(f'pairs{r}')})")
        parts.append(f", words{r + 1} AS ({_apply_sql(src, f'best{r}')})")
        src = f"words{r + 1}"
    parts.append(
        """
, ttok AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS word
  FROM documents WHERE doc_id % 10 = 0
),
tw0 AS (
  SELECT lang, word, COUNT(*) AS c,
         '|' || array_to_string(regexp_extract_all(word, '.'), '||') || '|'
           AS seq
  FROM ttok
  WHERE word <> '' AND word NOT LIKE '%|%'
  GROUP BY lang, word
)"""
    )
    src_t = "tw0"
    for r in range(_BPE_MERGES):
        parts.append(
            f""", tw{r + 1} AS (
  SELECT w.lang, w.word, w.c,
         replace(w.seq, '|' || b.w1 || '||' || b.w2 || '|',
                 '|' || b.w1 || b.w2 || '|') AS seq
  FROM {src_t} w, best{r} b
)"""
        )
        src_t = f"tw{r + 1}"
    parts.append(
        f"""
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_ws_tokens,
       CAST(SUM(c * len(string_split(trim(seq, '|'), '||'))) AS BIGINT)
         AS n_bpe_tokens,
       CAST(SUM(c * len(list_filter(string_split(trim(seq, '|'), '||'),
                                    s -> length(s) > 1))) AS BIGINT)
         AS n_merged_tokens,
       ROUND(CAST(SUM(c * len(string_split(trim(seq, '|'), '||'))) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE), 4) + 0.0 AS tokens_per_word
FROM {src_t}
GROUP BY lang ORDER BY lang
"""
    )
    return "".join(parts)


@query("tok_vocab_coverage_heldout", oracle=_vocab_coverage_oracle())
def tok_vocab_coverage_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer generalization: train the merges on 90% of the corpus
    (doc_id % 10 <> 0), segment the HELD-OUT 10% with those merges, and
    report per-language fertility (tokens per word) plus how often the
    learned merges actually fire on unseen text (count of multi-char
    symbols emitted). This is the train/test discipline every
    production tokenizer ships with — a vocabulary that compresses its
    own training set but not held-out text (or one language but not
    another) shows up directly in these integers.

    Scale: training is the same vocabulary-sized loop as
    tok_bpe_train_merges (corpus touched once, per the module
    docstring); held-out segmentation materializes on the held-out
    WORD-FREQUENCY table (one map-side-combined groupBy of the 10%
    split), then applies each learned merge as a broadcast map-only
    string replace — no per-occurrence work, no extra corpus pass."""
    final, merges = _train_chain(
        spark, sf_dir, doc_filter=F.col("doc_id") % 10 != 0
    )
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    tok = d.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    cur = (
        tok.where((F.col("word") != "") & (~F.col("word").contains("|")))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "lang",
            "word",
            "c",
            F.concat(
                F.lit("|"),
                F.array_join(F.regexp_extract_all("word", F.lit("."), 0), "||"),
                F.lit("|"),
            ).alias("seq"),
        )
    )
    for m in merges:
        cur = (
            cur.crossJoin(F.broadcast(m.select("left_sym", "right_sym")))
            .select(
                "lang",
                "word",
                "c",
                F.replace(
                    F.col("seq"),
                    F.concat(
                        F.lit("|"), "left_sym", F.lit("||"), "right_sym",
                        F.lit("|"),
                    ),
                    F.concat(F.lit("|"), "left_sym", "right_sym", F.lit("|")),
                ).alias("seq"),
            )
        )
    syms = F.split(
        F.regexp_replace(F.regexp_replace("seq", r"^\|", ""), r"\|$", ""),
        r"\|\|",
    )
    n_sym = F.size(syms)
    n_merged = F.size(F.filter(syms, lambda s: F.length(s) > 1))
    return (
        cur.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_ws_tokens"),
            F.sum(F.col("c") * n_sym).cast("bigint").alias("n_bpe_tokens"),
            F.sum(F.col("c") * n_merged)
            .cast("bigint")
            .alias("n_merged_tokens"),
            (
                F.round(
                    F.sum(F.col("c") * n_sym).cast("double")
                    / F.sum("c").cast("double"),
                    4,
                )
                + 0.0
            ).alias("tokens_per_word"),
        )
        .orderBy("lang")
    )
