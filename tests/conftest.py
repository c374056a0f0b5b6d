"""Shared fixtures: one local SparkSession + a DuckDB oracle connection.

Mirrors the driver's t2 gate locally: every registered query with an
oracle is cross-checked (row count + schema width + order-insensitive
values) against DuckDB over the same parquet.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from hive_service_spark.catalog import TABLES
from hive_service_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_session("hive_service_spark-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_cell(v):
    """Canonicalize one value for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse float noise below what our queries' ROUNDs guarantee
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):  # date/datetime → wall-clock string
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_rows(cols, rows):
    """(sorted-col-order, row-sorted) canonical form, like the driver."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(map(repr, t)))


def assert_matches_oracle(spark, ddb, spec, sf_dir=SF_DIR):
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = ddb.execute(spec.oracle)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()
    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    assert sorted(s_cols) == sorted(d_cols), (
        f"{spec.name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    sc, sr = canon_rows(s_cols, s_rows)
    dc, dr = canon_rows(d_cols, d_rows)
    # repr-strict like the driver's value hash: 2 (bigint) != 2.0 (double)
    sr = [tuple(map(repr, t)) for t in sr]
    dr = [tuple(map(repr, t)) for t in dr]
    mism = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
    assert sr == dr, f"{spec.name}: value mismatch; first diffs: {mism}"
