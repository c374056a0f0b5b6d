"""Bitmap-index operator wave — Hive's EWAH bitmap aggregates at work.

Reference behavior (SURVEY.md §2.3): Hive bitmap indexes store, per
distinct column value, an EWAH-compressed bitmap of the blocks that
contain it; queries intersect/union those bitmaps to decide which
blocks to read. ``ewah_bitmap`` builds them, ``ewah_bitmap_and/or``
combine them, ``ewah_bitmap_empty`` answers "do these two values ever
co-occur?" without touching the data.

The query below is that exact pattern on the testdata: per
``l_returnflag`` (the indexed value), a bitmap of orderkey blocks
(position = ``l_orderkey % 8192`` — a block/bucket id, so bitmap size
is domain-bounded, NOT row-count-bounded). All flag pairs are then
compared: intersection/union cardinality, emptiness, and the EWAH
run count of the AND bitmap (the compressed-size proxy).

The DuckDB oracle computes the same cardinalities the way you would at
100 TB without an index — distinct-position joins — proving the bitmap
algebra agrees with relational set logic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.functions.bitmap import (
    ewah_bitmap,
    ewah_bitmap_and,
    ewah_bitmap_empty,
    ewah_bitmap_or,
    ewah_cardinality,
    ewah_runs,
)
from hive_service_spark.registry import query

_EWAH_ORACLE = """
WITH pos AS (
  SELECT DISTINCT l_returnflag AS flag, l_orderkey % 8192 AS p
  FROM lineitem
),
flags AS (SELECT DISTINCT flag FROM pos)
SELECT a.flag AS flag_a, b.flag AS flag_b,
       (SELECT COUNT(*) FROM pos WHERE flag = a.flag) AS card_a,
       (SELECT COUNT(*) FROM pos x JOIN pos y ON x.p = y.p
         WHERE x.flag = a.flag AND y.flag = b.flag) AS and_card,
       (SELECT COUNT(DISTINCT p) FROM pos
         WHERE flag IN (a.flag, b.flag)) AS or_card,
       (SELECT COUNT(*) FROM pos x JOIN pos y ON x.p = y.p
         WHERE x.flag = a.flag AND y.flag = b.flag) = 0 AS and_empty,
       (SELECT COUNT(*) FROM pos x JOIN pos y ON x.p = y.p
         WHERE x.flag = a.flag AND y.flag = b.flag
           AND NOT EXISTS (
             SELECT 1 FROM pos x2 JOIN pos y2 ON x2.p = y2.p
             WHERE x2.flag = a.flag AND y2.flag = b.flag
               AND x2.p = x.p - 1)) AS and_runs
FROM flags a JOIN flags b ON a.flag < b.flag
ORDER BY flag_a, flag_b
"""


@query("agg_ewah_bitmap_ops", oracle=_EWAH_ORACLE)
def agg_ewah_bitmap_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag block bitmaps, then pairwise AND/OR/empty/runs.

    Plan shape: the distinct() is the only real shuffle (≈ |flags| ×
    |domain| rows); the bitmap build is one groupBy over that; the
    pairwise comparison is a self-join of a |flags|-row frame —
    broadcast, trivially. At 100 TB the bitmaps stay domain-bounded,
    which is the whole point of indexing blocks instead of rows."""
    li = load(spark, sf_dir, "lineitem")
    pos = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            (F.col("l_orderkey") % 8192).alias("p"),
        )
        .distinct()
    )
    bm = pos.groupBy("flag").agg(ewah_bitmap(F.col("p")).alias("bitmap"))
    a = bm.select(F.col("flag").alias("flag_a"), F.col("bitmap").alias("bm_a"))
    b = bm.select(F.col("flag").alias("flag_b"), F.col("bitmap").alias("bm_b"))
    pairs = a.join(F.broadcast(b), F.col("flag_a") < F.col("flag_b"))
    and_bm = ewah_bitmap_and(F.col("bm_a"), F.col("bm_b"))
    or_bm = ewah_bitmap_or(F.col("bm_a"), F.col("bm_b"))
    return (
        pairs.select(
            "flag_a",
            "flag_b",
            ewah_cardinality(F.col("bm_a")).alias("card_a"),
            and_bm.alias("_and"),
            or_bm.alias("_or"),
        )
        # name the combined bitmaps before reusing them: referencing a
        # higher-order-function result N times would inline it N times
        .select(
            "flag_a",
            "flag_b",
            "card_a",
            ewah_cardinality(F.col("_and")).alias("and_card"),
            ewah_cardinality(F.col("_or")).alias("or_card"),
            ewah_bitmap_empty(F.col("_and")).alias("and_empty"),
            ewah_runs(F.col("_and")).alias("and_runs"),
        )
        .orderBy("flag_a", "flag_b")
    )
