"""Sparse-series engine-exactness for ts_lttb_downsample.

Round-8 ADVICE fix: LTTB's bucket anchors come from lag/lead over
OBSERVED buckets, so before the day-adjacency rule a long-retention
series with a multi-year gap produced anchors arbitrarily far apart
and the BIGINT twice-area cross product (dt * dv) could exceed 2^63 —
Spark wraps silently while DuckDB errors, breaking engine exactness.
With anchors restricted to day-adjacent buckets, |dt| < 3 days holds
unconditionally and gap-adjoining buckets follow the edge rule
(keep first/last point, area2 = -1 sentinel).

This test builds a synthetic events table whose gap would have
overflowed (30-year gap in microseconds x cents ~ 9e19 > 2^63) and
checks Spark against the registered DuckDB oracle — the exact
comparison the driver runs — plus the edge-rule shape.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from hive_service_spark.registry import load_all
from tests.conftest import assert_matches_oracle


def _write_sparse_events(path: str) -> None:
    def ts(y, m, d, h):
        return dt.datetime(y, m, d, h, 0, 0)

    rows = [
        # bucket A: 3 points on one day in 1990
        (1, ts(1990, 1, 5, 1), 10, "metric", 100.25, "{}"),
        (2, ts(1990, 1, 5, 12), 10, "metric", 499.75, "{}"),
        (3, ts(1990, 1, 5, 23), 10, "metric", 0.50, "{}"),
        # ~30-year GAP (dt in micros ~ 9.5e14; x |dv| in cents up to
        # ~5e4 -> ~5e19 > 2^63: overflows without the adjacency rule)
        # bucket B: 2 points in 2020
        (4, ts(2020, 3, 1, 2), 10, "metric", 450.00, "{}"),
        (5, ts(2020, 3, 1, 20), 10, "metric", 1.00, "{}"),
        # bucket C: day-adjacent to B -> interior anchoring applies
        (6, ts(2020, 3, 2, 3), 10, "metric", 300.00, "{}"),
        (7, ts(2020, 3, 2, 9), 10, "metric", 2.00, "{}"),
        (8, ts(2020, 3, 2, 21), 10, "metric", 120.00, "{}"),
        # bucket D: adjacent to C (so C is a true interior bucket)
        (9, ts(2020, 3, 3, 4), 10, "metric", 77.00, "{}"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)


def test_lttb_sparse_gap_is_exact_and_edge_ruled(spark, tmp_path):
    _write_sparse_events(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    spec = load_all()["ts_lttb_downsample"]
    # the driver-grade compare: row count + columns + exact values
    assert_matches_oracle(spark, con, spec, sf_dir=str(tmp_path))

    out = {r["day_num"]: r.asDict() for r in spec.fn(spark, str(tmp_path)).collect()}
    days = sorted(out)
    assert len(days) == 4
    a, b, c, d = days
    # A (series start) keeps its FIRST point; B follows a gap AND
    # precedes an adjacent bucket -> x0 is null -> first-point rule;
    # both are edges: area2 sentinel -1
    assert out[a]["area2"] == -1 and out[a]["sel_cents"] == 10025
    assert out[b]["area2"] == -1 and out[b]["sel_cents"] == 45000
    # C is interior (B and D are day-adjacent): real area chosen
    assert out[c]["area2"] >= 0
    # D is the series end -> last-point rule
    assert out[d]["area2"] == -1 and out[d]["sel_cents"] == 7700
    con.close()
