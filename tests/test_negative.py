"""Negative corpus — the analog of the reference's
`ql/src/test/queries/clientnegative/*.q` (SURVEY.md §5: ~hundreds of
scripts asserting compile-time errors). Spark's Analyzer raises the
same classes of error the reference's SemanticAnalyzer does; each test
pins one class. Also pins the Hive-2.3 (non-ANSI) runtime semantics the
engine is configured for (session.py: spark.sql.ansi.enabled=false):
silent-null casts, null division, wrapping overflow — behaviors an
oracle can't see but users depend on.
"""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException, ParseException

from hive_service_spark.catalog import register_views

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_views(spark, SF)


def test_unresolved_column(spark):
    with pytest.raises(AnalysisException) as e:
        spark.sql("SELECT no_such_col FROM nation").collect()
    assert "UNRESOLVED_COLUMN" in str(e.value)


def test_unresolved_table(spark):
    with pytest.raises(AnalysisException) as e:
        spark.sql("SELECT * FROM no_such_table").collect()
    assert "TABLE_OR_VIEW_NOT_FOUND" in str(e.value)


def test_parse_error(spark):
    with pytest.raises(ParseException):
        spark.sql("SELEC * FROM nation")


def test_ambiguous_reference(spark):
    with pytest.raises(AnalysisException) as e:
        spark.sql(
            "SELECT n_name FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey"
        ).collect()
    assert "AMBIGUOUS" in str(e.value).upper()


def test_groupby_missing_column(spark):
    """Non-aggregated, non-grouped column — the classic SemanticAnalyzer
    error (Hive: 'Expression not in GROUP BY key')."""
    with pytest.raises(AnalysisException):
        spark.sql("SELECT n_name, COUNT(*) FROM nation GROUP BY n_regionkey").collect()


def test_wrong_arg_count(spark):
    with pytest.raises(AnalysisException):
        spark.sql("SELECT substr() FROM nation").collect()


def test_union_column_count_mismatch(spark):
    with pytest.raises(AnalysisException) as e:
        spark.sql(
            "SELECT n_nationkey FROM nation UNION ALL "
            "SELECT n_nationkey, n_name FROM nation"
        ).collect()
    assert "NUM_COLUMNS_MISMATCH" in str(e.value)


def test_aggregate_in_where(spark):
    """Aggregates are illegal in WHERE (Hive: 'Not yet supported place
    for UDAF'); HAVING is the legal form."""
    with pytest.raises(AnalysisException):
        spark.sql("SELECT n_regionkey FROM nation WHERE COUNT(*) > 1").collect()


# --- non-ANSI (Hive 2.3) runtime semantics ---------------------------------


def test_division_by_zero_yields_null(spark):
    row = spark.sql("SELECT 1 / 0 AS d, 1 div 0 AS i").collect()[0]
    assert row["d"] is None and row["i"] is None


def test_bad_cast_yields_null(spark):
    row = spark.sql("SELECT CAST('abc' AS INT) AS v").collect()[0]
    assert row["v"] is None


def test_int_division_yields_double(spark):
    """Hive `/` on ints is double division; `div` is integer — both
    pinned (SURVEY.md §7 hard parts)."""
    row = spark.sql("SELECT 7 / 2 AS d, 7 div 2 AS i").collect()[0]
    assert row["d"] == 3.5 and row["i"] == 3


def test_overflow_wraps(spark):
    """ANSI off: bigint overflow wraps (two's complement), matching
    Hive 2.3 Java semantics."""
    row = spark.sql(
        "SELECT 9223372036854775807 + CAST(1 AS BIGINT) AS v"
    ).collect()[0]
    assert row["v"] == -9223372036854775808
