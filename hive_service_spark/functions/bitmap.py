"""EWAH bitmap-index aggregate family (Hive ``ewah_bitmap*``).

Reference surface (SURVEY.md §2.3/§2.7): ``GenericUDAFEWAHBitmap``
aggregates row positions into an EWAH (Enhanced Word-Aligned Hybrid)
compressed bitmap; ``ewah_bitmap_and`` / ``ewah_bitmap_or`` combine two
bitmaps, ``ewah_bitmap_empty`` tests whether a bitmap has no set bit —
the building blocks of Hive's bitmap indexes (intersection of per-value
bitmaps selects matching blocks without scanning them).

Spark-first mapping: a bitmap IS a set of positions — the logical value
is a sorted distinct array<bigint>, built by ``collect_set`` (map-side
partial aggregation: each executor dedups locally, the shuffle carries
one set per group, exactly how the reference merges partial bitmaps).
AND/OR/empty are JVM array expressions inside whole-stage codegen.
EWAH's run-length compression shows up as ``ewah_runs`` — the number of
word-aligned literal runs a compressed encoding would store, computable
from the position set alone.

100 TB design: per-group bitmap size is bounded by the position domain
(here a block-bucket id), not the row count, so the shuffle carries
|groups| × |domain| entries at most. Cardinalities of combined bitmaps
at warehouse scale should come from joins (see the oracle, which does
exactly that) — the array form is the INDEX payload, small by design.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def ewah_bitmap(pos: Column) -> Column:
    """Aggregate: distinct positions → sorted bitmap array."""
    return F.sort_array(F.collect_set(pos.cast("bigint")))


def ewah_bitmap_and(a: Column, b: Column) -> Column:
    return F.sort_array(F.array_intersect(a, b))


def ewah_bitmap_or(a: Column, b: Column) -> Column:
    return F.sort_array(F.array_union(a, b))


def ewah_bitmap_empty(a: Column) -> Column:
    """True iff the bitmap has no set bit."""
    return F.size(a) == 0


def ewah_cardinality(a: Column) -> Column:
    return F.size(a).cast("bigint")


def ewah_runs(arr: Column) -> Column:
    """Number of consecutive-position runs in a sorted bitmap — the
    literal-run count an EWAH/RLE encoding would store (its compressed
    size is proportional to this, not to cardinality). A run starts at
    index i when i==0 or arr[i] != arr[i-1]+1. Guarded for the empty
    bitmap (F.sequence with a negative span yields a DESCENDING list)."""
    idx = F.sequence(F.lit(1), F.size(arr))
    # CASE WHEN (not bare OR) so element_at(arr, 0) is never evaluated:
    # SQL element_at throws on index 0, and boolean OR does not
    # short-circuit inside codegen.
    starts = F.filter(
        idx,
        lambda i: F.when(i == 1, F.lit(True)).otherwise(
            F.element_at(arr, i) != F.element_at(arr, i - 1) + 1
        ),
    )
    return (
        F.when(F.size(arr) > 0, F.size(starts)).otherwise(F.lit(0))
    ).cast("bigint")
