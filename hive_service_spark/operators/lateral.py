"""Wave 7 — table-generating functions / LATERAL VIEW / JSON.

Reference parity: UDTFOperator + LateralViewForward/JoinOperator
(SURVEY.md §2.1): explode / posexplode / inline / stack registered in
FunctionRegistry; get_json_object / json_tuple JSON surface
(SURVEY.md §2.7). Spark plans these as Generate nodes — per-row fanout
stays inside whole-stage codegen, no shuffle added by the explode
itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.registry import query

_JSON_ORACLE = """
SELECT
  event_type,
  COUNT(*)                                                   AS n_events,
  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))    AS max_k
FROM events
GROUP BY event_type
"""


@query("json_extract_agg", oracle=_JSON_ORACLE)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the events.props JSON column, then agg."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


_JSON_TUPLE_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
"""


@query("json_tuple_filter", oracle=_JSON_TUPLE_ORACLE)
def json_tuple_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple (UDTF form of JSON field extraction) + filter."""
    e = load(spark, sf_dir, "events")
    return (
        e.select("event_id", F.json_tuple("props", "k").alias("k"))
        .select("event_id", F.col("k").cast("int").alias("k"))
        .filter(F.col("k") > 90)
    )


_EXPLODE_ORACLE = """
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
"""


@query("explode_word_count", oracle=_EXPLODE_ORACLE)
def explode_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode(split(text)) → word count: the canonical
    UDTFOperator pipeline. Generate fans out in-task; only the groupBy
    shuffles (on word)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


_POSEXPLODE_ORACLE = """
SELECT doc_id,
       unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS pos,
       unnest(string_split(text, ' ')) AS word
FROM documents
WHERE doc_id < 5
"""


@query("posexplode_words", oracle=_POSEXPLODE_ORACLE)
def posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: position-preserving explode (UDTFOperator posexplode;
    DuckDB oracle zips parallel unnests)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


_EXPLODE_OUTER_ORACLE = """
SELECT doc_id, word
FROM (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN string_split(text, ' ') END AS words
  FROM documents
  WHERE doc_id < 50
) LEFT JOIN LATERAL (SELECT unnest(words) AS word) ON TRUE
"""


@query("explode_outer_nulls", oracle=_EXPLODE_OUTER_ORACLE)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER: rows with NULL/empty arrays survive with a
    NULL element (LateralViewJoinOperator outer semantics)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = F.when(F.col("lang") == "en", F.split("text", " "))
    return d.select("doc_id", F.explode_outer(words).alias("word"))


_STACK_ORACLE = """
SELECT s_suppkey, metric, val FROM (
  SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS val FROM supplier
  UNION ALL
  SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS val FROM supplier
)
"""


@query("stack_unpivot", oracle=_STACK_ORACLE)
def stack_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack(n, ...) — the UDTF the reference registers for UN-PIVOT
    shapes; Spark's stack generates the same rows in-task."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.expr(
            "stack(2, 'acctbal', s_acctbal, 'nationkey', CAST(s_nationkey AS DOUBLE))"
        ).alias("metric", "val"),
    )


_INLINE_ORACLE = """
SELECT n_nationkey, kind, score FROM (
  SELECT n_nationkey, 'base' AS kind, n_regionkey * 10 AS score FROM nation
  UNION ALL
  SELECT n_nationkey, 'alt' AS kind, n_nationkey + 100 AS score FROM nation
)
"""


@query("inline_structs", oracle=_INLINE_ORACLE)
def inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(array<struct>) — explode an array of structs into columns
    (GenericUDTFInline)."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.inline(
            F.array(
                F.struct(
                    F.lit("base").alias("kind"),
                    (F.col("n_regionkey") * 10).alias("score"),
                ),
                F.struct(
                    F.lit("alt").alias("kind"),
                    (F.col("n_nationkey") + 100).alias("score"),
                ),
            )
        ),
    )


_FROM_JSON_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
       MIN(CAST(json_extract(props, '$.k') AS INT)) AS k_min,
       MAX(CAST(json_extract(props, '$.k') AS INT)) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("json_from_json_typed", oracle=_FROM_JSON_ORACLE)
def json_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON with from_json: props parsed ONCE into a
    typed struct column, then aggregated on the typed field. Unlike
    get_json_object (per-path string extraction, re-parses per call),
    from_json parses each row once against a declared schema — at
    100 TB with several extracted paths that is the difference between
    one JSON parse per row and one per (row x path). Hive analog:
    DelimitedJSONSerDe schema-on-read (SURVEY.md §2.2)."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("p.k").alias("k_sum"),
            F.min("p.k").alias("k_min"),
            F.max("p.k").alias("k_max"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4 user-defined TABLE function surface)
# ---------------------------------------------------------------------------

_UDTF_ORACLE = """
SELECT d.doc_id,
       CAST(g.i AS INTEGER)                         AS win_idx,
       CAST(LEAST(10, len(w.ws) - g.i * 10) AS INTEGER) AS n_words,
       w.ws[g.i * 10 + 1]                           AS head_word
FROM (SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE doc_id < 50) w
JOIN documents d ON d.doc_id = w.doc_id
CROSS JOIN LATERAL (
  SELECT unnest(generate_series(0,
           CAST(CEIL(len(w.ws) / 10.0) AS INTEGER) - 1)) AS i
) g
"""


@query("udtf_python_word_windows", oracle=_UDTF_ORACLE)
def udtf_python_word_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined TABLE function in Python (Spark 4 `@udtf`) applied
    with a LATERAL join — the extension analog of Hive's GenericUDTF
    subclassing surface (`hive-exec!ql/udf/generic/GenericUDTF`,
    SURVEY.md §2.1 UDTFOperator): explode/posexplode/stack cover the
    builtins; this covers the USER-AUTHORED table function contract
    (one eval per input row, 0..n output rows, declared schema). The
    function windows each document into 10-word chunks and emits
    (win_idx, n_words, head_word) per chunk; the oracle replays the
    windowing with generate_series. Python UDTFs run Arrow-batched in
    the Python worker — fine for this control surface, but bulk
    chunking stays in mapInPandas/JVM expressions (doc_chunking_overlap)
    on the hot path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="win_idx: int, n_words: int, head_word: string")
    class WordWindows:
        def eval(self, text: str):
            words = text.split(" ")
            for i in range(0, len(words), 10):
                chunk = words[i : i + 10]
                yield i // 10, len(chunk), chunk[0]

    spark.udtf.register("hs_word_windows", WordWindows)
    load(spark, sf_dir, "documents").where(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.win_idx, t.n_words, t.head_word
        FROM docs_udtf d, LATERAL hs_word_windows(d.text) t
        """
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured type (Spark 4)
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS k_sum,
       CAST(ROUND(SUM(CAST(value * 2 AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS doubled_sum,
       CAST(COUNT(*) FILTER (WHERE json_extract(props, '$.missing') IS NULL)
            AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
"""


@query("json_variant_shred", oracle=_VARIANT_ORACLE)
def json_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured navigation (Spark 4): each event's JSON
    is parsed ONCE into the binary VARIANT encoding, then typed paths
    are extracted with variant_get / try_variant_get — the modern
    replacement for per-path get_json_object re-parsing and the typed
    from_json when the schema is open-ended. The row payload here is a
    constructed nested document (props object + a value array) so the
    paths exercise object fields, array indexing, and a missing path;
    the oracle recomputes every extracted value from the raw columns,
    verifying the parse->navigate->cast pipeline end to end."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.parse_json(
            F.to_json(
                F.struct(
                    F.from_json("props", "k INT").alias("props"),
                    F.array(F.col("value"), F.col("value") * 2).alias("vals"),
                )
            )
        ).alias("v"),
    )
    shredded = v.select(
        "event_type",
        F.expr("variant_get(v, '$.props.k', 'int')").alias("k"),
        F.expr("variant_get(v, '$.vals[1]', 'double')").alias("doubled"),
        F.expr("try_variant_get(v, '$.nope', 'int')").alias("missing"),
    )
    return shredded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.round(F.sum(F.col("doubled").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("doubled_sum"),
        F.count(F.when(F.col("missing").isNull(), 1)).alias("n_missing"),
    )
