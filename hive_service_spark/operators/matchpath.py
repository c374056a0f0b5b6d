"""General MatchPath: arbitrary symbol-pattern matching over row
sequences — the full analog of the reference's MatchPath PTF
(SURVEY.md §2.4, hive-exec!ql/udf/ptf/MatchPath.class: npath/matchpath,
the pre-MATCH_RECOGNIZE row-pattern surface).

The reference walks each PTF partition's ordered rows with a symbol
automaton compiled from a pattern string like ``LATE.EARLY*.ONTIME``
(symbols are boolean row-predicates; ``.`` chains; ``*``/``+``/``?``
quantify; ``|`` alternates) and, for every row where a match STARTS,
emits the row plus match metadata.

Spark-first layout (the plan a 100 TB run wants):

1. **Classify JVM-side**: one ``CASE`` expression maps each row to a
   single symbol character — stays in whole-stage codegen, no Python.
2. **One shuffle** on the partition key groups each entity's (bounded)
   row sequence.
3. **applyInPandas automaton**: per group, the symbol chars form a
   string and the compiled pattern — translated to an anchored Python
   regex — is tested at every position (greedy, leftmost-longest at
   each start, exactly the reference's per-row "does a match begin
   here" semantics). Arrow-batched, never row-at-a-time.

The DuckDB oracle reproduces the identical semantics declaratively:
``string_agg`` builds the same per-entity symbol string and
``regexp_extract('^...')`` anchors the same greedy regex at every
position — so the value hash verifies the automaton, not just counts.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.registry import query

# ---------------------------------------------------------------------------
# pattern compiler: "a.b*.c" over named symbols -> (classifier, regex)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[*+?()|]")


def compile_pattern(pattern: str, symbol_order: Iterable[str]) -> tuple[dict[str, str], str]:
    """Compile a MatchPath pattern to (symbol->char map, regex source).

    Grammar (the reference MatchPath surface): symbol names chained
    with ``.``, postfix quantifiers ``* + ?``, grouping ``( )`` and
    alternation ``|``. Symbols are assigned one character each in
    ``symbol_order``; the regex matches over the per-row symbol-char
    string. Rows matching no symbol get the reserved char ``'x'``,
    which no pattern element can match.
    """
    # allocate from a generator that SKIPS the reserved no-symbol char
    # 'x' (the old per-index bump collided: symbol 24 and symbol 25
    # both mapped to 'y'); spill past 'z' into other printable chars
    alphabet = [
        c
        for c in map(chr, range(ord("a"), ord("z") + 1))
        if c != "x"
    ] + [c for c in map(chr, range(ord("A"), ord("Z") + 1))]
    chars: dict[str, str] = {}
    for i, name in enumerate(symbol_order):
        if i >= len(alphabet):
            raise ValueError("too many symbols (max 51)")
        chars[name] = alphabet[i]
    assert len(set(chars.values())) == len(chars), "symbol chars collide"
    out: list[str] = []
    for tok in _TOKEN_RE.findall(pattern.replace(".", " ")):
        if tok in "*+?()|":
            out.append(tok)
        elif tok in chars:
            out.append(chars[tok])
        else:
            raise ValueError(f"unknown symbol {tok!r} in pattern {pattern!r}")
    return chars, "".join(out)


def _parse_chain(pattern: str) -> tuple[str, str, str, str] | None:
    """Detect the JVM-compilable chain class ``X.Y<q>.Z`` with
    quantifier q in {*, +, ?} (symbol names returned as (x, y, z, q)),
    the quantified-funnel shapes. Routed to the pure-window plan only
    when z != y: with z == y the greedy regex backtracks one element
    out of the maximal Y-run (``^xy*y`` on 'xyy' matches by shrinking
    y*), which the maximal-island rewrite cannot express — those
    patterns keep the Python automaton."""
    toks = _TOKEN_RE.findall(pattern.replace(".", " "))
    if (
        len(toks) == 4
        and toks[2] in ("*", "+", "?")
        and all(t not in "*+?()|" for t in (toks[0], toks[1], toks[3]))
        and toks[3] != toks[1]
    ):
        return toks[0], toks[1], toks[3], toks[2]
    return None


def _matchpath_jvm_chain(
    slim: DataFrame,
    order_cols: list[str],
    partition_by: str,
    cx: str,
    cy: str,
    cz: str,
    quant: str,
) -> DataFrame:
    """The ``X.Y<q>.Z`` chain (q in {*, +, ?}) compiled to pure window
    expressions — no Python stage anywhere (the analog of keeping the
    reference's MatchPath inside the PTFOperator instead of shelling
    out). Shape:

    - runs of equal symbol chars become islands (rn − per-char rn),
    - each island learns its end row and the char/ts AFTER it (lead at
      the island's last row, propagated island-wide by max),
    - a match starts at every X row whose following Y-run of length r
      (possibly 0, possibly the X row's own island when X == Y)
      terminates in Z, with the quantifier constraining r
      (*: any, +: r >= 1, ?: r <= 1); greedy length = r + 2.

    The ``?`` case needs no backtracking despite the regex shape
    ``^xy?z``: with z != y, a run of 2+ Ys can never satisfy it (the
    char after one Y is another Y), so r <= 1 is exact.

    Same one-shuffle-per-partition-key plan as the automaton, but the
    walk stays in JVM window exec / whole-stage codegen — no Arrow
    hop, no per-group string materialization."""
    from pyspark.sql import Window

    w = Window.partitionBy("pk").orderBy(*order_cols)
    wc = Window.partitionBy("pk", "_ch").orderBy(*order_cols)
    base = slim.select(
        "*",
        F.row_number().over(w).alias("rn"),
        (F.row_number().over(w) - F.row_number().over(wc)).alias("isl"),
        F.lead("_ch").over(w).alias("next_ch"),
        F.lead("_ts").over(w).alias("next_ts"),
    )
    wi = Window.partitionBy("pk", "_ch", "isl")
    base = base.select("*", F.max("rn").over(wi).alias("isl_end"))
    base = base.select(
        "*",
        F.max(
            F.when(F.col("rn") == F.col("isl_end"), F.col("next_ch"))
        ).over(wi).alias("after_ch"),
        F.max(
            F.when(F.col("rn") == F.col("isl_end"), F.col("next_ts"))
        ).over(wi).alias("after_ts"),
    )

    def _q_ok(r):
        if quant == "+":
            return r >= 1
        if quant == "?":
            return r <= 1
        return F.lit(True)

    if cx == cy:
        # the start row sits inside the Y-run itself: r = rows left in
        # its own island, terminator = the char after the island
        r = F.col("isl_end") - F.col("rn")
        term_ch, term_ts = F.col("after_ch"), F.col("after_ts")
    else:
        ld = base.select(
            "*",
            F.lead("isl_end").over(w).alias("ld_isl_end"),
            F.lead("after_ch").over(w).alias("ld_after_ch"),
            F.lead("after_ts").over(w).alias("ld_after_ts"),
        )
        base = ld
        nxt_is_y = F.col("next_ch") == cy
        r = F.when(nxt_is_y, F.col("ld_isl_end") - F.col("rn")).otherwise(
            F.lit(0)
        )
        term_ch = F.when(nxt_is_y, F.col("ld_after_ch")).otherwise(
            F.col("next_ch")
        )
        term_ts = F.when(nxt_is_y, F.col("ld_after_ts")).otherwise(
            F.col("next_ts")
        )
    cond = (F.col("_ch") == cx) & (term_ch == cz) & _q_ok(r)
    return base.where(cond).select(
        F.col("pk").alias(partition_by),
        F.col("rn").cast("int").alias("start_rn"),
        (r + 2).cast("int").alias("match_len"),
        F.col("_ts").alias("path_start"),
        term_ts.alias("path_end"),
    )


def matchpath(
    df: DataFrame,
    partition_by: str,
    order_by: list[str],
    symbols: dict[str, Column],
    pattern: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Generic MatchPath over any DataFrame.

    ``symbols`` maps symbol name -> boolean Column (first match wins,
    like the reference's symbol-arg ordering). Emits one row per match
    start: (partition key, start_rn, match_len, path_start, path_end).

    Patterns in the ``X.Y*.Z`` / ``X.Y+.Z`` / ``X.Y?.Z`` chain class
    (z != y) compile to a pure JVM window plan (_matchpath_jvm_chain)
    — no Python stage; every other pattern runs the Arrow-batched
    Python automaton below, the documented fallback for genuinely
    irregular patterns."""
    chars, rx_src = compile_pattern(pattern, symbols.keys())
    rx = re.compile(rx_src)

    ch = F.lit("x")
    # reversed: build CASE from last to first so the FIRST symbol wins
    for name, cond in reversed(list(symbols.items())):
        ch = F.when(cond, F.lit(chars[name])).otherwise(ch)

    slim = df.select(
        F.col(partition_by).alias("pk"),
        F.col(ts_col).alias("_ts"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_by)],
        ch.alias("_ch"),
    )
    order_cols = [f"_o{i}" for i in range(len(order_by))]

    chain = _parse_chain(pattern)
    if chain is not None:
        return _matchpath_jvm_chain(
            slim,
            order_cols,
            partition_by,
            chars[chain[0]],
            chars[chain[1]],
            chars[chain[2]],
            chain[3],
        )

    out_schema = (
        f"{partition_by} long, start_rn int, match_len int, "
        "path_start timestamp, path_end timestamp"
    )

    def _walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        s = "".join(pdf["_ch"])
        ts = pdf["_ts"]
        pk = pdf["pk"].iloc[0]
        rows = []
        for i in range(len(s)):
            m = rx.match(s, i)
            if m and m.end() > i:
                rows.append((pk, i + 1, m.end() - i, ts[i], ts[m.end() - 1]))
        return pd.DataFrame(
            rows,
            columns=[partition_by, "start_rn", "match_len", "path_start", "path_end"],
        )

    return slim.groupBy("pk").applyInPandas(_walk, out_schema)


# ---------------------------------------------------------------------------
# registered query: one-or-more views then a purchase (a pattern the
# fixed-LEAD funnel cannot express — requires the general automaton)
# ---------------------------------------------------------------------------

_GENERAL_ORACLE = """
WITH c AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'view' THEN 'a'
              WHEN event_type = 'purchase' THEN 'b'
              ELSE 'x' END AS ch,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
s AS (
  SELECT user_id, string_agg(ch, '' ORDER BY rn) AS str
  FROM c GROUP BY user_id
),
m AS (
  SELECT c.user_id, c.rn AS start_rn, c.ts AS path_start,
         length(regexp_extract(substr(s.str, CAST(c.rn AS INT)), '^aa*b'))
           AS match_len
  FROM c JOIN s USING (user_id)
)
SELECT m.user_id, CAST(m.start_rn AS INT) AS start_rn,
       CAST(m.match_len AS INT) AS match_len,
       CAST(m.path_start AS TIMESTAMP) AS path_start,
       CAST(e.ts AS TIMESTAMP) AS path_end
FROM m
JOIN c e ON e.user_id = m.user_id AND e.rn = m.start_rn + m.match_len - 1
WHERE m.match_len > 0
ORDER BY m.user_id, start_rn
"""


@query("seq_matchpath_general", oracle=_GENERAL_ORACLE)
def seq_matchpath_general(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General MatchPath: pattern ``view.view*.purchase`` (one or more
    consecutive views then a purchase) per user — a quantified pattern
    the fixed-LEAD funnel (seq_matchpath_funnel) cannot express. Each
    match start emits (start_rn, greedy match length, path start/end
    timestamps). See module docstring for the reference parity and the
    100 TB plan shape."""
    ev = load(spark, sf_dir, "events")
    out = matchpath(
        ev,
        partition_by="user_id",
        order_by=["ts", "event_id"],
        symbols={
            "view": F.col("event_type") == "view",
            "purchase": F.col("event_type") == "purchase",
        },
        pattern="view.view*.purchase",
    )
    return out.orderBy("user_id", "start_rn")
