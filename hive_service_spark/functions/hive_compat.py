"""HiveQL-compat scalar function layer.

The reference registers 286 built-in scalar/UDTF names in its
FunctionRegistry (SURVEY.md §2.7). Spark ships same-name builtins for
the overwhelming majority; this module supplies Column-level shims for
the gaps — every shim composes JVM-side `pyspark.sql.functions`
expressions (whole-stage-codegen friendly; NO Python UDFs in this
module), so they cost the same as builtins at 100 TB.

``HIVE_FUNCTION_TABLE`` at the bottom is the machine-checkable
name→implementation inventory for all 286 registered names
(tests/test_functions.py asserts every "builtin:" mapping resolves in
this Spark build).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

_MAX_STR = 1 << 20  # "rest of string" length for substring arithmetic


# --- string --------------------------------------------------------------


def field(x: Column | str, *candidates: Column | str) -> Column:
    """Hive ``field(x, v1, v2, ...)``: 1-based index of first match, 0
    if absent — array_position, COALESCEd to 0 for a NULL probe
    (Hive's GenericUDFField / MySQL FIELD return 0 there, where
    array_position returns NULL; round-13 review)."""
    pos = F.array_position(
        F.array(*[F.lit(c) if isinstance(c, str) else c for c in candidates]),
        x,
    )
    return F.coalesce(pos, F.lit(0))


def substring_index(s: Column, delim: str, count: int) -> Column:
    """Hive substring_index — Spark has the same builtin; re-exported
    for the inventory table."""
    return F.substring_index(s, delim, count)


def printf(fmt: Column | str, *cols: Column) -> Column:
    """Hive ``printf`` ≙ Spark format_string."""
    return F.format_string(fmt, *cols)


# --- masking (Hive 2.1 GenericUDFMask* family) ---------------------------
#
# Default mask chars: upper→'X', lower→'x', digit→'n' (other chars kept),
# matching both Hive's defaults and Spark 3.4+'s `mask` builtin.


def _mask_all(c: Column) -> Column:
    c = F.regexp_replace(c, "[A-Z]", "X")
    c = F.regexp_replace(c, "[a-z]", "x")
    return F.regexp_replace(c, "[0-9]", "n")


def mask(c: Column) -> Column:
    return _mask_all(c)


def mask_first_n(c: Column, n: int = 4) -> Column:
    """Mask only the first n chars."""
    return F.concat(
        _mask_all(F.substring(c, 1, n)), F.substring(c, n + 1, _MAX_STR)
    )


def mask_last_n(c: Column, n: int = 4) -> Column:
    """Mask only the last n chars."""
    length = F.length(c)
    head_len = F.greatest(length - F.lit(n), F.lit(0))
    head = F.substring(c, 1, _MAX_STR).substr(F.lit(1), head_len)
    tail = c.substr(head_len + 1, F.lit(n))
    return F.concat(head, _mask_all(tail))


def mask_show_first_n(c: Column, n: int = 4) -> Column:
    """Mask everything EXCEPT the first n chars."""
    return F.concat(
        F.substring(c, 1, n), _mask_all(F.substring(c, n + 1, _MAX_STR))
    )


def mask_show_last_n(c: Column, n: int = 4) -> Column:
    """Mask everything EXCEPT the last n chars."""
    length = F.length(c)
    head_len = F.greatest(length - F.lit(n), F.lit(0))
    head = c.substr(F.lit(1), head_len)
    tail = c.substr(head_len + 1, F.lit(n))
    return F.concat(_mask_all(head), tail)


def mask_hash(c: Column) -> Column:
    """Hive 2.3 mask_hash = md5 hex of the string."""
    return F.md5(c.cast("string"))


# --- date/time: Druid-granularity floor_<unit> aliases -------------------


def _floor_unit(unit: str):
    def fn(ts: Column) -> Column:
        return F.date_trunc(unit, ts)

    fn.__name__ = f"floor_{unit}"
    fn.__doc__ = f"Hive floor_{unit}(ts) ≙ date_trunc('{unit}', ts)."
    return fn


floor_year = _floor_unit("year")
floor_quarter = _floor_unit("quarter")
floor_month = _floor_unit("month")
floor_week = _floor_unit("week")
floor_day = _floor_unit("day")
floor_hour = _floor_unit("hour")
floor_minute = _floor_unit("minute")
floor_second = _floor_unit("second")


# --- collections ---------------------------------------------------------


def sort_array_by(arr: Column, field_name: str, asc: bool = True) -> Column:
    """Hive ``sort_array_by(array<struct>, 'field')``: sort an array of
    structs by one field — array_sort with a comparator lambda. NULL
    field values order deterministically (smallest, like Hive's
    ObjectInspectorUtils.compare: first on ASC, last on DESC) — a
    comparator treating NULL as equal-to-everything is non-transitive
    and leaves array_sort's output ill-defined (round-13 review)."""
    sign = 1 if asc else -1

    def cmp(a: Column, b: Column) -> Column:
        fa, fb = a[field_name], b[field_name]
        return (
            F.when(fa.isNull() & fb.isNull(), F.lit(0))
            .when(fa.isNull(), F.lit(-sign))
            .when(fb.isNull(), F.lit(sign))
            .when(fa < fb, F.lit(-sign))
            .when(fa > fb, F.lit(sign))
            .otherwise(F.lit(0))
        )

    return F.array_sort(arr, cmp)


def create_union(tag: Column, *values: Column) -> Column:
    """Hive uniontype encoded as struct<tag, field0, field1...>
    (SURVEY.md §1.2: Spark has no union type; this is the documented
    encoding). Only the field matching ``tag`` is non-null."""
    fields = [tag.cast("tinyint").alias("tag")]
    for i, v in enumerate(values):
        fields.append(
            F.when(tag.cast("int") == i, v).alias(f"field{i}")
        )
    return F.struct(*fields)


def extract_union(u: Column, tag: int | None = None) -> Column:
    """Inverse of create_union: full struct, or one branch by tag."""
    if tag is None:
        return u
    return u[f"field{tag}"]


# --- URL -----------------------------------------------------------------


def parse_url_tuple(url: Column, *parts: str) -> list[Column]:
    """Hive parse_url_tuple UDTF ≙ N parallel parse_url projections.
    QUERY:<key> extracts one query parameter."""
    out = []
    for p in parts:
        if p.upper().startswith("QUERY:"):
            out.append(
                F.parse_url(url, F.lit("QUERY"), F.lit(p.split(":", 1)[1])).alias(
                    p.replace(":", "_").lower()
                )
            )
        else:
            out.append(F.parse_url(url, F.lit(p.upper())).alias(p.lower()))
    return out


# --- misc ----------------------------------------------------------------


def logged_in_user() -> Column:
    """Hive logged_in_user() ≙ current_user (no impersonation layer)."""
    return F.current_user()


def hive_hash_string(c: Column) -> Column:
    """Hive's ``hash(string)`` = Java ``String.hashCode()``:
    h = Σ s[i]·31^(n-1-i) in wrapping 32-bit arithmetic — NOT Spark's
    Murmur3 ``hash`` (SURVEY.md §2.7 ⚠). Computed JVM-side as a fold
    over the characters: accumulate in unsigned-64 mod 2³², then map
    back to signed 32-bit. Exact for single-UTF-16-unit characters
    (ascii() = the code unit); matches Hive/Java bucket-for-bucket, so
    layouts bucketed by Hive's hash can be reproduced."""
    chars = F.filter(F.split(c, ""), lambda ch: F.length(ch) > 0)
    h = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: F.pmod(
            acc * F.lit(31) + F.ascii(ch), F.lit(4294967296)
        ),
    )
    return F.when(h >= F.lit(2147483648), h - F.lit(4294967296)).otherwise(
        h
    ).cast("bigint")


def grouping_id_hive(*cols: Column | str) -> Column:
    """Hive 2.3's legacy ``GROUPING__ID`` virtual column: bit i is set
    when the i-th GROUP BY column IS AGGREGATED, with the FIRST column
    in the LOWEST bit — the reverse of Spark's/standard SQL's
    ``grouping_id()`` (first column in the highest bit; SURVEY.md §1.2
    flags the mismatch). Composed from per-column grouping() so it is
    correct for any subset of grouping sets."""
    out = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        out = out + (F.grouping(c).cast("bigint") * F.lit(1 << i))
    return out


def reflect2(*_args) -> Column:
    """Hive reflect2 invokes arbitrary Java methods on a value — not
    supported from PySpark by design (arbitrary JVM reflection is a
    sandbox hole and never needed by the oracle surface)."""
    raise NotImplementedError(
        "reflect2 requires arbitrary JVM reflection; use a registered UDF instead"
    )


def in_file(spark, col: Column, path: str) -> Column:
    """Hive ``in_file(str, filename)``: membership of a string against a
    file's lines. The reference evaluates it per-row against a local
    file; the Spark-first shape broadcasts the file's line set once per
    query (the file is small by the function's contract — it rides the
    broadcast, not a shuffle) and membership is a hash probe per row.
    Equivalent set-join form for big files:
    ``df.join(F.broadcast(spark.read.text(path)), col == value,
    'left_semi')``."""
    lines = [r[0] for r in spark.read.text(path).collect()]
    return col.isin(lines)


# --- the machine-checkable inventory ------------------------------------
#
# Every name the reference's FunctionRegistry registers (SURVEY.md §2.7,
# extracted from hive-exec-2.3.10 FunctionRegistry static init), mapped to
# its implementation here:
#   "builtin:<name>"  — Spark SQL builtin of that name (tests resolve it)
#   "alias:<expr>"    — direct Spark rewrite (different name/shape)
#   "shim:<fn>"       — function in this module; entries marked
#                       "(SQL: sql_shims ...)" are ALSO resolvable from
#                       HiveQL text via functions/sql_shims.py (round
#                       13: SQL UDF or literal-aware macro expansion),
#                       matching the reference's FunctionRegistry
#                       name-from-query-text resolution. Remaining
#                       text-unresolvable names: reflect2 (documented
#                       refusal), hash (the NAME resolves to Spark's
#                       Murmur3 builtin; Hive's Java-hashCode semantics
#                       stay Python-side via hive_hash_string),
#                       grouping__id resolves via a sql_shims macro in
#                       single-GROUP-BY statements (multi-block queries
#                       use the grouping_id_hive helper).
#   "na:<reason>"     — documented non-applicable
HIVE_FUNCTION_TABLE: dict[str, str] = {
    # operators / logic
    "!": "builtin:!", "!=": "builtin:!=", "%": "builtin:%", "&": "builtin:&",
    "*": "builtin:*", "+": "builtin:+", "-": "builtin:-", "/": "builtin:/",
    "<": "builtin:<", "<=": "builtin:<=", "<=>": "builtin:<=>", "<>": "builtin:!=",
    "=": "builtin:=", "==": "builtin:==", ">": "builtin:>", ">=": "builtin:>=",
    "^": "builtin:^", "|": "builtin:|", "~": "builtin:~",
    "and": "builtin:and", "or": "builtin:or", "not": "builtin:not",
    "between": "builtin:between", "in": "builtin:in", "like": "builtin:like",
    "rlike": "builtin:rlike", "regexp": "builtin:regexp", "div": "builtin:div",
    "mod": "builtin:mod", "$SUM0": "na:internal sum0 — Catalyst plans it",
    # conditionals
    "case": "builtin:case", "when": "builtin:when", "if": "builtin:if",
    "coalesce": "builtin:coalesce", "nullif": "builtin:nullif",
    "nvl": "builtin:nvl", "isnull": "builtin:isnull",
    "isnotnull": "builtin:isnotnull", "assert_true": "builtin:assert_true",
    # cast-as-function names
    "bigint": "alias:cast(x as bigint)", "binary": "alias:cast(x as binary)",
    "boolean": "alias:cast(x as boolean)", "char": "alias:cast(x as char(n))",
    "date": "alias:cast(x as date)", "decimal": "alias:cast(x as decimal(p,s))",
    "double": "alias:cast(x as double)", "float": "alias:cast(x as float)",
    "int": "alias:cast(x as int)",
    "interval_day_time": "alias:cast(x as interval day to second)",
    "interval_year_month": "alias:cast(x as interval year to month)",
    "smallint": "alias:cast(x as smallint)", "string": "alias:cast(x as string)",
    "timestamp": "alias:cast(x as timestamp)", "tinyint": "alias:cast(x as tinyint)",
    "varchar": "alias:cast(x as varchar(n))",
    # math
    "abs": "builtin:abs", "acos": "builtin:acos", "asin": "builtin:asin",
    "atan": "builtin:atan", "bin": "builtin:bin", "bround": "builtin:bround",
    "cbrt": "builtin:cbrt", "ceil": "builtin:ceil", "ceiling": "builtin:ceiling",
    "conv": "builtin:conv", "cos": "builtin:cos", "degrees": "builtin:degrees",
    "e": "builtin:e", "exp": "builtin:exp", "factorial": "builtin:factorial",
    "floor": "builtin:floor", "hex": "builtin:hex", "ln": "builtin:ln",
    "log": "builtin:log", "log10": "builtin:log10", "log2": "builtin:log2",
    "negative": "builtin:negative", "pi": "builtin:pi", "pmod": "builtin:pmod",
    "positive": "builtin:positive", "pow": "builtin:pow", "power": "builtin:power",
    "radians": "builtin:radians", "rand": "builtin:rand", "round": "builtin:round",
    "shiftleft": "builtin:shiftleft", "shiftright": "builtin:shiftright",
    "shiftrightunsigned": "builtin:shiftrightunsigned", "sign": "builtin:sign",
    "sin": "builtin:sin", "sqrt": "builtin:sqrt", "tan": "builtin:tan",
    "unhex": "builtin:unhex", "greatest": "builtin:greatest", "least": "builtin:least",
    # string
    "ascii": "builtin:ascii", "base64": "builtin:base64", "char_length": "builtin:char_length",
    "character_length": "builtin:character_length", "chr": "builtin:chr",
    "concat": "builtin:concat", "concat_ws": "builtin:concat_ws",
    "decode": "builtin:decode", "elt": "builtin:elt", "encode": "builtin:encode",
    "field": "shim:field (SQL: sql_shims macro)", "find_in_set": "builtin:find_in_set",
    "format_number": "builtin:format_number", "initcap": "builtin:initcap",
    "instr": "builtin:instr", "lcase": "builtin:lcase", "length": "builtin:length",
    "levenshtein": "builtin:levenshtein", "locate": "builtin:locate",
    "lower": "builtin:lower", "lpad": "builtin:lpad", "ltrim": "builtin:ltrim",
    "octet_length": "builtin:octet_length", "parse_url": "builtin:parse_url",
    "printf": "builtin:printf", "regexp_extract": "builtin:regexp_extract",
    "regexp_replace": "builtin:regexp_replace", "repeat": "builtin:repeat",
    "replace": "builtin:replace", "reverse": "builtin:reverse", "rpad": "builtin:rpad",
    "rtrim": "builtin:rtrim", "sentences": "builtin:sentences",
    "soundex": "builtin:soundex", "space": "builtin:space", "split": "builtin:split",
    "str_to_map": "builtin:str_to_map", "substr": "builtin:substr",
    "substring": "builtin:substring", "substring_index": "builtin:substring_index",
    "translate": "builtin:translate", "trim": "builtin:trim", "ucase": "builtin:ucase",
    "unbase64": "builtin:unbase64", "upper": "builtin:upper",
    # masking
    "mask": "builtin:mask", "mask_first_n": "shim:mask_first_n (SQL: sql_shims UDF)",
    "mask_last_n": "shim:mask_last_n (SQL: sql_shims UDF)", "mask_show_first_n": "shim:mask_show_first_n (SQL: sql_shims UDF)",
    "mask_show_last_n": "shim:mask_show_last_n (SQL: sql_shims UDF)", "mask_hash": "shim:mask_hash (SQL: sql_shims UDF)",
    # date/time
    "add_months": "builtin:add_months", "current_date": "builtin:current_date",
    "current_timestamp": "builtin:current_timestamp", "date_add": "builtin:date_add",
    "date_format": "builtin:date_format", "date_sub": "builtin:date_sub",
    "datediff": "builtin:datediff", "day": "builtin:day",
    "dayofmonth": "builtin:dayofmonth", "dayofweek": "builtin:dayofweek",
    "from_unixtime": "builtin:from_unixtime",
    "from_utc_timestamp": "builtin:from_utc_timestamp", "hour": "builtin:hour",
    "last_day": "builtin:last_day", "minute": "builtin:minute",
    "month": "builtin:month", "months_between": "builtin:months_between",
    "next_day": "builtin:next_day", "quarter": "builtin:quarter",
    "second": "builtin:second", "to_date": "builtin:to_date",
    "to_unix_timestamp": "builtin:to_unix_timestamp",
    "to_utc_timestamp": "builtin:to_utc_timestamp", "trunc": "builtin:trunc",
    "unix_timestamp": "builtin:unix_timestamp", "weekofyear": "builtin:weekofyear",
    "year": "builtin:year",
    "floor_day": "shim:floor_day (SQL: sql_shims UDF)", "floor_hour": "shim:floor_hour (SQL: sql_shims UDF)",
    "floor_minute": "shim:floor_minute (SQL: sql_shims UDF)", "floor_month": "shim:floor_month (SQL: sql_shims UDF)",
    "floor_quarter": "shim:floor_quarter (SQL: sql_shims UDF)", "floor_second": "shim:floor_second (SQL: sql_shims UDF)",
    "floor_week": "shim:floor_week (SQL: sql_shims UDF)", "floor_year": "shim:floor_year (SQL: sql_shims UDF)",
    # collections
    "array": "builtin:array", "array_contains": "builtin:array_contains",
    "index": "alias:col[i] (element_at)", "map": "builtin:map",
    "map_keys": "builtin:map_keys", "map_values": "builtin:map_values",
    "named_struct": "builtin:named_struct", "size": "builtin:size",
    "sort_array": "builtin:sort_array", "struct": "builtin:struct",
    "sort_array_by": "shim:sort_array_by (SQL: sql_shims macro)",
    "create_union": "shim:create_union (SQL: sql_shims macro)", "extract_union": "shim:extract_union (SQL: sql_shims macro)",
    "cardinality_violation": "na:internal MERGE guard (ACID-only)",
    # JSON/XML
    "get_json_object": "builtin:get_json_object", "json_tuple": "builtin:json_tuple",
    "xpath": "builtin:xpath", "xpath_boolean": "builtin:xpath_boolean",
    "xpath_double": "builtin:xpath_double", "xpath_float": "builtin:xpath_float",
    "xpath_int": "builtin:xpath_int", "xpath_long": "builtin:xpath_long",
    "xpath_number": "builtin:xpath_number", "xpath_short": "builtin:xpath_short",
    "xpath_string": "builtin:xpath_string",
    # hash/crypto
    "crc32": "builtin:crc32",
    "hash": "shim:hive_hash_string (Java hashCode semantics; Spark's "
            "Murmur3 builtin also available as hash)",
    "md5": "builtin:md5", "sha": "builtin:sha", "sha1": "builtin:sha1",
    "sha2": "builtin:sha2", "aes_decrypt": "builtin:aes_decrypt",
    "aes_encrypt": "builtin:aes_encrypt", "uuid": "builtin:uuid",
    # table-generating
    "explode": "builtin:explode", "posexplode": "builtin:posexplode",
    "inline": "builtin:inline", "stack": "builtin:stack",
    "parse_url_tuple": "shim:parse_url_tuple (N× parse_url; SQL: sql_shims macro)",
    "get_splits": "na:LLAP-specific", "replicate_rows": "na:internal — native set ops",
    # windowing (names registered in FunctionRegistry)
    "row_number": "builtin:row_number", "rank": "builtin:rank",
    "dense_rank": "builtin:dense_rank", "percent_rank": "builtin:percent_rank",
    "cume_dist": "builtin:cume_dist", "ntile": "builtin:ntile",
    "first_value": "builtin:first_value", "last_value": "builtin:last_value",
    "lead": "builtin:lead", "lag": "builtin:lag",
    # aggregates (registered names; §2.3)
    "avg": "builtin:avg", "count": "builtin:count", "sum": "builtin:sum",
    "min": "builtin:min", "max": "builtin:max", "std": "builtin:std",
    "stddev": "builtin:stddev", "stddev_pop": "builtin:stddev_pop",
    "stddev_samp": "builtin:stddev_samp", "var_pop": "builtin:var_pop",
    "var_samp": "builtin:var_samp", "variance": "builtin:variance",
    "corr": "builtin:corr", "covar_pop": "builtin:covar_pop",
    "covar_samp": "builtin:covar_samp", "percentile": "builtin:percentile",
    "percentile_approx": "builtin:percentile_approx",
    "histogram_numeric": "builtin:histogram_numeric",
    "collect_list": "builtin:collect_list", "collect_set": "builtin:collect_set",
    "compute_stats": "alias:ANALYZE TABLE ... COMPUTE STATISTICS",
    "bloom_filter": "impl:operators.sequence_analytics.seq_bloom_semi_join (md5-derived bit positions, oracle-verified)",
    "in_bloom_filter": "impl:operators.sequence_analytics.seq_bloom_semi_join (probe-side membership filter)",
    "regr_avgx": "builtin:regr_avgx", "regr_avgy": "builtin:regr_avgy",
    "regr_count": "builtin:regr_count", "regr_intercept": "builtin:regr_intercept",
    "regr_r2": "builtin:regr_r2", "regr_slope": "builtin:regr_slope",
    "regr_sxx": "builtin:regr_sxx", "regr_sxy": "builtin:regr_sxy",
    "regr_syy": "builtin:regr_syy",
    "ngrams": "alias:llm.text.ngram_frequencies (explode pipeline)",
    "context_ngrams": "alias:llm.text.ngram_frequencies with context filter",
    "ewah_bitmap": "impl:functions.bitmap.ewah_bitmap (position-set aggregate, oracle-verified)",
    "ewah_bitmap_and": "impl:functions.bitmap.ewah_bitmap_and",
    "ewah_bitmap_or": "impl:functions.bitmap.ewah_bitmap_or",
    "ewah_bitmap_empty": "impl:functions.bitmap.ewah_bitmap_empty",
    # misc / introspection
    "current_database": "builtin:current_database",
    "current_user": "builtin:current_user", "logged_in_user": "shim:logged_in_user (SQL: sql_shims UDF)",
    "version": "builtin:version", "reflect": "builtin:reflect",
    "java_method": "builtin:java_method", "reflect2": "shim:reflect2 (raises)",
    "in_file": "shim:in_file (broadcast semi-join; SQL: sql_shims macro)",
    "grouping": "builtin:grouping",
    "grouping__id": "shim:grouping_id_hive (legacy reversed bit order; SQL: sql_shims macro in single-GROUP-BY statements)",
    "internal_interval": "na:parser-internal",
    "sq_count_check": "na:Catalyst checks scalar subqueries natively",
    "noop": "na:test-only PTF", "noopstreaming": "na:test-only PTF",
    "noopwithmap": "na:test-only PTF", "noopwithmapstreaming": "na:test-only PTF",
    "matchpath": "impl:operators.sequence_analytics.seq_matchpath_funnel (LEAD-per-symbol window composition)",
}
