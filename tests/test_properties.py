"""Property-based tests (hypothesis) — the deliberate improvement over
the reference's golden-file-only strategy (SURVEY.md §5: "no
property-based/randomized testing in the reference line").

Each property pits a distributed formulation against an independent
single-node model (plain Python / pandas) on adversarial generated
frames: nulls, empty inputs, hot keys, ties, negative values. These are
exactly the edge classes golden files miss.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, Window

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # deterministic corpus: CI-stable, still adversarial
)

# keys drawn from a tiny pool → guaranteed hot keys and collisions
_keys = st.integers(min_value=0, max_value=3)
_vals = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))
_rows = st.lists(st.tuples(_keys, _vals), max_size=60)


@given(rows=_rows)
@settings(**_SETTINGS)
def test_salted_two_phase_agg_equals_plain(spark, rows):
    """Salted (key, salt) partial agg + merge == plain groupBy, for
    decomposable aggregates (count/sum/max), on any input including
    all-null groups and empty frames — the algebraic fact that makes
    the skew_scale rewrite safe at 100 TB."""
    df = spark.createDataFrame(
        [Row(k=k, v=v, i=i) for i, (k, v) in enumerate(rows)],
        schema="k int, v int, i int",
    )
    salted = (
        df.withColumn("salt", F.pmod(F.hash("i"), F.lit(7)))
        .groupBy("k", "salt")
        .agg(
            F.count("v").alias("c"),
            F.sum("v").alias("s"),
            F.max("v").alias("m"),
        )
        .groupBy("k")
        .agg(
            F.sum("c").alias("c"),
            F.sum("s").alias("s"),
            F.max("m").alias("m"),
        )
    )
    got = {r["k"]: (r["c"], r["s"], r["m"]) for r in salted.collect()}

    model: dict[int, list] = defaultdict(lambda: [0, None, None])
    for k, v in rows:
        ent = model[k]
        if v is not None:
            ent[0] += 1
            ent[1] = v if ent[1] is None else ent[1] + v
            ent[2] = v if ent[2] is None else max(ent[2], v)
    want = {k: tuple(ent) for k, ent in model.items()}
    assert got == want


@given(rows=_rows)
@settings(**_SETTINGS)
def test_exact_dedup_counts(spark, rows):
    """Hash-groupBy dedup == Counter over values (nulls form their own
    group, like Hive/Spark GROUP BY semantics)."""
    df = spark.createDataFrame(
        [Row(v=v) for _, v in rows], schema="v int"
    )
    got = {r["v"]: r["n"] for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = dict(Counter(v for _, v in rows))
    assert got == want


@given(rows=_rows)
@settings(**_SETTINGS)
def test_window_cumsum_matches_model(spark, rows):
    """Running SUM over (partition, order) == per-key prefix sums with
    deterministic tie-break — the PTFOperator semantics (SURVEY.md
    §2.4) under ties and null values."""
    data = [Row(k=k, v=v, i=i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, schema="k int, v int, i int")
    w = (
        Window.partitionBy("k")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {r["i"]: r["cs"] for r in df.select("i", F.sum("v").over(w).alias("cs")).collect()}

    acc: dict[int, int | None] = {}
    want = {}
    for i, (k, v) in enumerate(rows):
        prev = acc.get(k)
        cur = prev if v is None else (v if prev is None else prev + v)
        acc[k] = cur
        want[i] = cur
    assert got == want


@given(rows=_rows)
@settings(**_SETTINGS)
def test_asof_union_tag_formulation(spark, rows):
    """The union-tag + last(ignorenulls) window as-of join
    (operators.temporal_joins) == direct per-probe linear scan model:
    each probe row picks the latest build row with ts <= probe ts
    (build-before-probe on equal ts), per key."""
    # alternate rows between build(side 0) and probe(side 1); ts from the
    # value column (None → skip), guaranteeing duplicates and ties
    build, probe = [], []
    for i, (k, v) in enumerate(rows):
        if v is None:
            continue
        (build if i % 2 == 0 else probe).append((k, v, i))
    b_df = spark.createDataFrame(
        [Row(k=k, ts=ts, side=0, rid=i) for k, ts, i in build],
        schema="k int, ts int, side int, rid int",
    )
    p_df = spark.createDataFrame(
        [Row(k=k, ts=ts, side=1, rid=i) for k, ts, i in probe],
        schema="k int, ts int, side int, rid int",
    )
    tagged = b_df.unionAll(p_df).withColumn(
        "b_rid", F.when(F.col("side") == 0, F.col("rid"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "side", "rid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.select(
        "k",
        "ts",
        "side",
        "rid",
        F.last("b_rid", ignorenulls=True).over(w).alias("matched"),
    ).where(F.col("side") == 1)
    got = {r["rid"]: r["matched"] for r in carried.collect()}

    want = {}
    for k, ts, rid in probe:
        cands = [
            (bts, brid)
            for bk, bts, brid in build
            if bk == k and bts <= ts
        ]
        # latest ts wins; among equal ts the largest rid (matches the
        # window order ts, side, rid carrying the LAST build row seen)
        want[rid] = max(cands)[1] if cands else None
    assert got == want


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_percentile_exact_matches_model(spark, vals):
    """Exact `percentile(v, 0.5)` == the reference UDAFPercentile
    definition (linear interpolation between closest ranks)."""
    if not vals:
        return
    df = spark.createDataFrame([Row(v=float(v)) for v in vals], schema="v double")
    got = df.agg(F.expr("percentile(v, 0.5)").alias("p")).collect()[0]["p"]
    s = sorted(vals)
    n = len(s)
    pos = (n - 1) * 0.5
    lo, hi = int(math.floor(pos)), int(math.ceil(pos))
    want = s[lo] + (pos - lo) * (s[hi] - s[lo])
    assert got is not None
    assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# HiveQL script splitter round-trip (operators/sql_script.py)
# ---------------------------------------------------------------------------

_IDENT = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_0123456789 ", min_size=1, max_size=20
).map(str.strip).filter(bool)
# statement bodies mixing identifiers with quoted literals that may
# contain semicolons, doubled quotes, and comment-lookalike text
_LITERAL = st.text(
    alphabet="abc;-- /*xyz*/'", min_size=0, max_size=12
).map(lambda s: "'" + s.replace("'", "''") + "'")
_STMT = st.lists(st.one_of(_IDENT, _LITERAL), min_size=1, max_size=5).map(
    lambda parts: "SELECT " + ", ".join(parts)
)


@given(st.lists(_STMT, min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_script_split_roundtrip(stmts):
    """Joining statements with ';' and re-splitting yields the same
    statements — semicolons inside string literals (including doubled
    quotes and comment-lookalike text) never split."""
    from hive_service_spark.operators.sql_script import split_statements

    script = ";\n".join(stmts) + ";"
    assert split_statements(script) == [s.strip() for s in stmts]
