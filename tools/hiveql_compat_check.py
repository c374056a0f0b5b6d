"""HiveQL migration compat report: which function names in a script
resolve here, and how.

The reference resolves all 286 FunctionRegistry names from query text;
this engine resolves them through four mechanisms (native Spark
builtin, session SQL-UDF shim, literal-aware macro expansion, or a
documented rewrite/operator). A migrating user's first question is
"will my script run?" — this tool answers it WITHOUT a Spark session:
it splits the script (operators/sql_script.split_statements), extracts
every called function name outside string literals, and classifies
each against functions/hive_compat.HIVE_FUNCTION_TABLE +
functions/sql_shims.

Usage:
    python tools/hiveql_compat_check.py script.sql
    python tools/hiveql_compat_check.py --sql "SELECT field(x,'a') FROM t"

Prints one line per distinct name: NAME  STATUS  detail. Exit code 1
iff any used name is documented non-applicable (na:) or the reflect2
refusal — the cases where the script genuinely cannot run unchanged.
Names absent from the Hive registry are reported as "not-hive"
(commonly a Spark builtin or a user UDF — verified at run time, not
here).
"""

from __future__ import annotations

import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_service_spark.functions.hive_compat import HIVE_FUNCTION_TABLE
from hive_service_spark.functions.sql_shims import (
    _EXPANDERS,
    _HIVEQL_QUOTES,
    _SQL_UDF_DEFS,
)
from hive_service_spark.operators.materialized_views import _literal_mask
from hive_service_spark.operators.sql_script import split_statements

# tokens followed by '(' that are SQL syntax, not function calls
_SYNTAX_TOKENS = frozenset(
    """select from where group order sort cluster distribute by having
    limit join on using values exists in and or not case when then else
    end as cast over partition rows range between window with union all
    distinct intersect except insert into overwrite table view create
    drop alter lateral tablesample interval filter within grouping
    sets cube rollup any some left right full inner outer cross semi
    anti natural if pattern symbols measures maxrows""".split()
)

_CALL_RE = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\(")


def called_names(sql: str) -> set[str]:
    """Every identifier used in call position outside string literals,
    plus the non-call-shaped GROUPING__ID virtual column."""
    mask = _literal_mask(sql, _HIVEQL_QUOTES)
    names = {
        m.group(1).lower()
        for m in _CALL_RE.finditer(sql)
        if not mask[m.start()]
    }
    if any(
        not mask[m.start()]
        for m in re.finditer(r"(?i)\bgrouping__id\b", sql)
    ):
        names.add("grouping__id")
    return names - _SYNTAX_TOKENS


def classify(name: str) -> tuple[str, str]:
    """(status, detail). Statuses: native / sql-udf / macro / ptf /
    rewrite / operator / python-helper / unsupported / not-hive."""
    if name in ("npath", "matchpath"):
        return (
            "ptf",
            "FROM-clause table function: routed through npath_sql's "
            "compiled plans (operators/sql_script._route_npath_calls)",
        )
    if name == "hash":
        return (
            "native-divergent",
            "resolves to Spark's Murmur3 hash — DIFFERENT values from "
            "Hive's Java hashCode; use hive_compat.hive_hash_string for "
            "bucket-layout parity",
        )
    if name == "reflect2":
        return (
            "unsupported",
            HIVE_FUNCTION_TABLE["reflect2"] + " — documented refusal "
            "(arbitrary JVM reflection); register a UDF instead",
        )
    impl = HIVE_FUNCTION_TABLE.get(name)
    if impl is None:
        return (
            "not-hive",
            "not a Hive 2.3 registry name — commonly a Spark builtin "
            "or user UDF; resolved at run time",
        )
    kind = impl.split(":", 1)[0]
    if kind == "builtin":
        return ("native", impl)
    if kind == "shim":
        if name in _SQL_UDF_DEFS:
            return ("sql-udf", impl)
        if name in _EXPANDERS or name == "grouping__id":
            return ("macro", impl)
        return (
            "python-helper",
            impl + " — Column helper only; not SQL-resolvable",
        )
    if kind == "alias":
        return ("rewrite", impl)
    if kind == "impl":
        return ("operator", impl)
    if kind == "na":
        return ("unsupported", impl)
    return ("unknown", impl)


def report(script: str) -> tuple[list[tuple[str, str, str]], bool]:
    """[(name, status, detail)] sorted by name; bool = any blocker."""
    names: set[str] = set()
    for stmt in split_statements(script):
        names |= called_names(stmt)
    rows = [(n, *classify(n)) for n in sorted(names)]
    blocked = any(s == "unsupported" for _n, s, _d in rows)
    return rows, blocked


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--sql":
        script = sys.argv[2]
    elif len(sys.argv) >= 2:
        with open(sys.argv[1]) as f:
            script = f.read()
    else:
        print(__doc__)
        return 2
    rows, blocked = report(script)
    width = max((len(n) for n, _s, _d in rows), default=4)
    for n, s, d in rows:
        print(f"{n:<{width}}  {s:<13}  {d}")
    return 1 if blocked else 0


if __name__ == "__main__":
    sys.exit(main())
