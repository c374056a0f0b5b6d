"""Output-schema lint: every registered query must be driver-canon-safe.

The external driver canonicalizes both the Spark result and the DuckDB
oracle result through pandas (sort_values -> factorize -> repr-hash).
That pipeline

  * CRASHES on unhashable cells  -> array/map/struct/binary outputs
    (round-1 driver reds agg_collect / agg_sketches), and
  * silently HASH-MISMATCHES on cells whose repr differs between
    engines even when values are equal -> Decimal (Spark Decimal('1.50')
    vs DuckDB-pandas float64 1.5; round-1 red window_range_decimal) and
    intervals.

So the contract is structural: no query may expose Array / Map / Struct
/ Binary / Decimal / Interval / CalendarInterval in its OUTPUT schema.
Serialize at the boundary instead (concat_ws/array_join for arrays,
to_json for structs, hex for binary, cast-to-double+round for decimal)
— internal arithmetic can and should stay exact.

This test walks all registered queries and fails listing every offender,
so a newly registered canon-unsafe query is caught before the driver
samples it.
"""

from __future__ import annotations

from pyspark.sql import types as T

from hive_service_spark.registry import load_all
from tests.conftest import SF_DIR

_FORBIDDEN = (
    T.ArrayType,
    T.MapType,
    T.StructType,
    T.BinaryType,
    T.DecimalType,
    T.DayTimeIntervalType,
    T.YearMonthIntervalType,
    T.CalendarIntervalType,
    # DATE: DuckDB's pandas path renders DATE as a midnight Timestamp
    # while Spark collects datetime.date — repr can never match.
    # TIMESTAMP outputs are allowed (round-1 sampled passes prove them).
    T.DateType,
)

# Queries whose output is exempt by design (none today — add a name here
# ONLY with a comment proving the driver canon accepts it).
_ALLOWLIST: frozenset[str] = frozenset()


def test_all_outputs_canon_safe(spark):
    specs = load_all()
    offenders: list[str] = []
    for name in sorted(specs):
        if name in _ALLOWLIST:
            continue
        df = specs[name].fn(spark, SF_DIR)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, _FORBIDDEN)
        ]
        if bad:
            offenders.append(f"{name} -> {bad}")
    assert not offenders, (
        "canon-unsafe output schemas (serialize at the query boundary):\n"
        + "\n".join(offenders)
    )
