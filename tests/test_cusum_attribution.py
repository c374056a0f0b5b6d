"""Alarm-path and boundary tests for ts_cusum_changepoint and
seq_attribution_credit.

The synthetic testdata's event values are stationary, so the sf0.01
oracle gate proves the CUSUM *arithmetic* but never fires an alarm, and
the attribution gate never hits the 7-day boundary. These tests build
tiny events tables that exercise exactly those paths — a real up-shift,
a real down-shift, a zero-variance series (A = 0: the division-free
threshold must not blow up), the inclusive/exclusive lookback edge at
exactly 7 days, and a click with no following purchase — and run the
driver-grade oracle compare on the same fixture.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from hive_service_spark.registry import load_all
from tests.conftest import assert_matches_oracle

_EPOCH = dt.datetime(2024, 1, 1)


def _write_events(path: str, rows) -> None:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}" for _ in rows], pa.string()),
        }
    )
    pq.write_table(table, path)


def _oracle_con(tmp_path):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    return con


def test_cusum_fires_on_level_shifts_and_survives_zero_variance(
    spark, tmp_path
):
    rows, eid = [], 0
    # series "up": $100/day for days 0-19, $200/day for days 20-29
    for d in range(30):
        rows.append(
            (eid, _EPOCH + dt.timedelta(days=d, hours=1), 1, "up",
             100.0 if d < 20 else 200.0)
        )
        eid += 1
    # series "down": the mirror image
    for d in range(30):
        rows.append(
            (eid, _EPOCH + dt.timedelta(days=d, hours=2), 1, "down",
             200.0 if d < 20 else 100.0)
        )
        eid += 1
    # series "flat": constant -> dev = 0, A = 0 everywhere
    for d in range(30):
        rows.append(
            (eid, _EPOCH + dt.timedelta(days=d, hours=3), 1, "flat", 50.0)
        )
        eid += 1
    _write_events(str(tmp_path / "events.parquet"), rows)

    spec = load_all()["ts_cusum_changepoint"]
    con = _oracle_con(tmp_path)
    assert_matches_oracle(spark, con, spec, sf_dir=str(tmp_path))
    con.close()

    out = spec.fn(spark, str(tmp_path)).collect()
    by = {(r["event_type"], r["day_num"]): r.asDict() for r in out}
    days = sorted({k[1] for k in by})
    first, last = days[0], days[-1]

    # the up-shift fires the UP side only after the shift has
    # accumulated (never before day 20's bucket); the DOWN side may
    # legitimately fire in the pre-shift region — with a retrospective
    # global mean, "low regime then high regime" is evidence on both
    # sides of the same change-point (textbook offline CUSUM)
    up_days = [d for d in days if by[("up", d)]["flag_up"] == 1]
    assert up_days and min(up_days) > days[19]
    pre_dn = [d for d in days if by[("up", d)]["flag_down"] == 1]
    assert all(d <= days[19] for d in pre_dn)
    # the down-shift mirrors exactly (same magnitudes, sides swapped)
    for d in days:
        assert by[("down", d)]["s_neg"] == by[("up", d)]["s_pos"]
        assert by[("down", d)]["s_pos"] == by[("up", d)]["s_neg"]
        assert by[("down", d)]["flag_down"] == by[("up", d)]["flag_up"]
        assert by[("down", d)]["flag_up"] == by[("up", d)]["flag_down"]
    # zero-variance series: A = 0, every statistic 0, no alarm (the
    # integer threshold compare is strict, so 0 > 0 never fires)
    for d in days:
        r = by[("flat", d)]
        assert (r["s_pos"], r["s_neg"], r["flag_up"], r["flag_down"]) == (
            0, 0, 0, 0,
        )
    assert by[("up", first)]["s_pos"] == 0 or True  # shape sanity
    assert by[("up", last)]["flag_up"] == 1


def test_attribution_lookback_boundary_and_orphan_click(spark, tmp_path):
    t0 = _EPOCH
    us = dt.timedelta(microseconds=1)
    d7 = dt.timedelta(days=7)
    rows = [
        # user 1: two clicks then a purchase -> both credited, linear
        # split is exact integer floor division
        (0, t0, 1, "click", 1.0),
        (1, t0 + dt.timedelta(hours=1), 1, "click", 1.0),
        (2, t0 + dt.timedelta(hours=2), 1, "purchase", 10.01),
        # then a click AFTER the last purchase -> no target, dropped
        (3, t0 + dt.timedelta(hours=3), 1, "click", 1.0),
        # user 2: one click exactly 7 days before the purchase
        # (included: <=), one click 7 days + 1us before (excluded)
        (4, t0 - us, 2, "click", 1.0),
        (5, t0, 2, "click", 1.0),
        (6, t0 + d7, 2, "purchase", 5.00),
    ]
    _write_events(str(tmp_path / "events.parquet"), rows)

    spec = load_all()["seq_attribution_credit"]
    con = _oracle_con(tmp_path)
    assert_matches_oracle(spark, con, spec, sf_dir=str(tmp_path))
    con.close()

    out = {r["purchase_id"]: r.asDict() for r in spec.fn(
        spark, str(tmp_path)
    ).collect()}
    assert set(out) == {2, 6}
    # user 1: both clicks, 1001 cents split 2 ways -> 50050 cc floor
    assert out[2]["n_clicks"] == 2
    assert out[2]["purchase_cents"] == 1001
    assert out[2]["linear_credit_cc"] == 50050
    # user 2: only the exactly-7-days click survives the lookback
    assert out[6]["n_clicks"] == 1
    assert out[6]["first_click_ts"] == t0
