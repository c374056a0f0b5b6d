"""Cross-engine null-ordering lint (round 13, r12 verdict #4).

Spark's default null placement for an ASC sort is NULLS FIRST; DuckDB's
is NULLS LAST (both flip for DESC). A sort key that can be NULL and
carries no explicit ``NULLS FIRST/LAST`` therefore orders differently
between a registered query and its oracle — silently, and only in the
positions where ordering changes VALUES:

- ``ORDER BY`` inside an ``OVER (...)`` window (row_number/lag/rank
  and frame contents change),
- ``ORDER BY`` inside an aggregate call (DuckDB ``string_agg(x, ''
  ORDER BY ...)`` / ``list(x ORDER BY ...)``),
- any ``ORDER BY`` in a query using ``LIMIT`` (top-k selection).

Top-level ORDER BY without LIMIT is exempt: the driver's canon sorts
result rows itself, so presentation order cannot affect the value hash.

The lint walks every registered oracle and requires each value-
affecting sort item to be (a) explicitly NULLS-annotated, (b) a base
testdata column — VERIFIED non-null against the parquet data in this
test, so a regeneration that introduces nulls fails loudly — or (c)
provably non-null through one hop of alias resolution: the item's text
plus its ``AS <alias>`` defining expressions must contain no
null-producing construct (LAG/LEAD/NULLIF/TRY_*/CASE-without-ELSE).
Anything else needs an ALLOWLIST entry with a comment saying why it is
non-null.

AUTHORING RULE (the Spark side of the contract): when a sort key in
one of the positions above CAN be null, spell ``NULLS FIRST``/``NULLS
LAST`` in BOTH the oracle SQL and the Spark builder
(asc_nulls_last()/desc_nulls_first()/...). This lint catches the
oracle side; the value-hash gate catches a builder that then disagrees.
"""

from __future__ import annotations

import glob
import re

import duckdb
import pyarrow.parquet as pq

from hive_service_spark.operators.matchpath import _split_order_suffix
from hive_service_spark.operators.materialized_views import _literal_mask
from hive_service_spark.registry import load_all

_SMOKE_SF = "/root/testdata/sf0.001"  # data-level non-null verification

# query name -> [(item regex, why the un-annotated key is non-null)]
ALLOWLIST: dict[str, list[tuple[str, str]]] = {
    # cosine / truncated-cosine scores: NULLIF(norm, 0) guards the
    # divisor, but every embedding row has a positive norm by
    # construction (the generator emits non-degenerate vectors), so
    # the score is never null; ties are broken by the trailing vec_id
    "ann_matryoshka_recall": [
        (r"(?s)^ROUND\(list_dot_product.*nullif", "NULLIF divisor guard; norms > 0"),
    ],
    # table-function outputs: generate_series/range aliases are
    # non-null by construction
    "mm_resize_thumbnail": [(r"^i$", "generate_series output")],
    "mm_image_ahash_neardup": [(r"^p\.k$", "generate_series output")],
    "mm_audio_vad_energy": [(r"^f$", "generate_series output")],
}


def _allowlisted(name: str, expr: str) -> bool:
    return any(
        re.match(pat, expr.strip()) for pat, _why in ALLOWLIST.get(name, [])
    )

_STOP = re.compile(r"(?i)\b(rows|range|groups|limit|frame)\b")
_NULL_PRODUCERS = re.compile(r"(?i)\b(lag|lead|nullif|try_\w+)\s*\(")


def _base_columns() -> set[str]:
    cols = set()
    for f in glob.glob(f"{_SMOKE_SF}/*.parquet"):
        cols |= {fl.name for fl in pq.read_schema(f)}
    return cols


def _order_lists(sql: str) -> list[tuple[int, str]]:
    """(paren-depth, items-text) for every ORDER BY in ``sql``."""
    mask = _literal_mask(sql)
    depths = []
    d = 0
    for i, ch in enumerate(sql):
        depths.append(d)
        if not mask[i]:
            if ch == "(":
                d += 1
            elif ch == ")":
                d -= 1
    out = []
    for m in re.finditer(r"(?i)\border\s+by\b", sql):
        if mask[m.start()]:
            continue
        depth = depths[m.start()]
        i, d, buf, n = m.end(), depth, [], len(sql)
        while i < n:
            ch = sql[i]
            if not mask[i]:
                if ch == "(":
                    d += 1
                elif ch == ")":
                    if d == depth:
                        break
                    d -= 1
                elif d == depth and _STOP.match(sql, i):
                    break
            buf.append(ch)
            i += 1
        out.append((depth, "".join(buf).strip()))
    return out


def _split_items(s: str) -> list[str]:
    mask = _literal_mask(s)
    parts, depth, cur = [], 0, []
    for i, ch in enumerate(s):
        if not mask[i]:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _case_without_else(txt: str) -> bool:
    t = txt
    for _ in range(20):
        m = re.search(r"(?is)\bcase\b((?:(?!\bcase\b|\bend\b).)*)\bend\b", t)
        if not m:
            return False
        if not re.search(r"(?i)\belse\b", m.group(1)):
            return True
        t = t[: m.start()] + " _ " + t[m.end() :]
    return False


def _defining_exprs(sql: str, alias: str) -> list[str]:
    """Every '<expr> AS <alias>' defining text: walk back from AS to
    the nearest top-level comma or opening paren."""
    mask = _literal_mask(sql)
    outs = []
    for m in re.finditer(rf"(?i)\bas\s+{re.escape(alias)}\b", sql):
        if mask[m.start()]:
            continue
        j, d, start = m.start() - 1, 0, 0
        while j >= 0:
            ch = sql[j]
            if not mask[j]:
                if ch == ")":
                    d += 1
                elif ch == "(":
                    if d == 0:
                        start = j + 1
                        break
                    d -= 1
                elif ch == "," and d == 0:
                    start = j + 1
                    break
            j -= 1
        frag = sql[start : m.start()]
        frag = re.sub(r"(?is)^\s*(select|then|when|else)\b", "", frag).strip()
        outs.append(frag)
    return outs


def _verify_item(sql: str, expr: str, base_cols: set[str]):
    """True, or (reason, detail) when the item needs NULLS or an
    allowlist entry."""
    texts = [expr]
    bare = re.fullmatch(r"(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)", expr.strip())
    if bare and bare.group(1) in base_cols:
        return True
    if bare:
        defs = _defining_exprs(sql, bare.group(1))
        if not defs:
            return ("unresolved alias", bare.group(1))
        texts += defs
    for t in texts:
        if _NULL_PRODUCERS.search(t):
            return ("null-producing construct", t[:80])
        if _case_without_else(t):
            return ("CASE without ELSE", t[:80])
    return True


def test_base_columns_are_non_null():
    """The lint's premise: every base testdata column is non-null. If
    a regeneration ever introduces nulls, this fails and every sort on
    that column needs explicit NULLS on both sides."""
    con = duckdb.connect()
    offenders = []
    for f in glob.glob(f"{_SMOKE_SF}/*.parquet"):
        for fl in pq.read_schema(f):
            n = con.sql(
                f'SELECT count(*) FROM \'{f}\' WHERE "{fl.name}" IS NULL'
            ).fetchone()[0]
            if n:
                offenders.append((f, fl.name, n))
    assert not offenders, (
        f"testdata now contains NULLs {offenders}: base-column sort "
        "keys are no longer provably non-null — add NULLS FIRST/LAST"
    )


def test_oracle_sort_keys_null_ordering_safe():
    base_cols = _base_columns()
    specs = load_all()
    failures = []
    for name, spec in specs.items():
        if not spec.oracle:
            continue
        sql = spec.oracle
        has_limit = re.search(r"(?i)\blimit\b", sql) is not None
        for depth, items in _order_lists(sql):
            if depth == 0 and not has_limit:
                continue  # driver canon re-sorts result rows
            for it in _split_items(items):
                expr, _desc, nulls = _split_order_suffix(it)
                if nulls:
                    continue  # explicitly annotated
                if _allowlisted(name, expr):
                    continue
                r = _verify_item(sql, expr, base_cols)
                if r is not True:
                    failures.append((name, expr, r))
    assert not failures, (
        "sort keys that may be NULL without explicit NULLS FIRST/LAST "
        "(Spark defaults nulls-first ASC, DuckDB nulls-last — annotate "
        "BOTH sides, or add an ALLOWLIST entry explaining why the key "
        f"is non-null): {failures}"
    )


def test_allowlist_entries_still_exist():
    """Every allowlist entry must still correspond to a live query —
    stale entries hide future regressions behind dead keys."""
    specs = load_all()
    stale = [q for q in ALLOWLIST if q not in specs]
    assert not stale, f"allowlist references unregistered queries: {stale}"


def test_lint_detects_the_hazard_classes():
    """Self-test: the extractor and verifier flag what they claim to."""
    base = {"ts", "event_id"}
    sql = (
        "SELECT k, LAG(ts) OVER (PARTITION BY k ORDER BY ts) AS prev, "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY prev) AS rn, "
        "string_agg(c, '' ORDER BY maybe) AS s FROM t"
    )
    lists = _order_lists(sql)
    assert [d for d, _ in lists] == [1, 1, 1]
    # aliased lag resolves through the one-hop definition and flags
    r = _verify_item(sql, "prev", base)
    assert r[0] == "null-producing construct"
    # unresolvable alias flags
    assert _verify_item(sql, "maybe", base)[0] == "unresolved alias"
    # base column passes; direct lag flags; CASE without ELSE flags
    assert _verify_item(sql, "ts", base) is True
    assert _verify_item(sql, "LAG(ts)", base)[0] == "null-producing construct"
    assert (
        _verify_item(sql, "CASE WHEN a THEN 1 END", base)[0]
        == "CASE without ELSE"
    )
    assert _verify_item(sql, "CASE WHEN a THEN 1 ELSE 0 END", base) is True
    # an explicitly annotated item never reaches the verifier
    expr, _d, nulls = _split_order_suffix("LAG(ts) DESC NULLS LAST")
    assert nulls == "last"
