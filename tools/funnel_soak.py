"""Sustained-ingest soak driver for the stateful streaming funnel.

The registered streaming proofs are single-replay (availableNow) plus
one restart test; this driver exercises the production shape the
round-9 claim is about: ~20 REAL micro-batches (file source,
maxFilesPerTrigger=1) with the watermark advancing between batches, a
never-converting clicker and a never-converting purchaser sustained
across every batch, and one new converting user per batch. It captures
the per-batch state-store metrics (numRowsTotal / numRowsRemoved /
watermark) from the query progress and the FINAL state contents via
the state-store reader (`spark.read.format("statestore")`), so both
the pytest (tests/test_streaming_soak.py) and the SCALE.md probe
(tools/scale_probe.py --soak) assert/report from the same run.

What bounded state means here, concretely:

- numRowsTotal at batch k must be exactly 2 + (k+1): the two hot
  signup-less users plus one converter per batch — state ROWS grow
  only with genuinely live users, never with event volume.
- The clicker's candidate array in the final state must hold only the
  clicks newer than the watermark (the disorder horizon), NOT the
  full event history (the round-8 unbounded-growth hole).
- A final far-future batch advances the watermark past every hot
  candidate: the armed event-time timeouts fire and the signup-less
  users' state rows are REMOVED outright.
"""

from __future__ import annotations

import datetime as _dt

import pyspark.sql.functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

_T0 = _dt.datetime(2026, 1, 1, 0, 0, 0)
_SCHEMA = "user_id bigint, event_type string, ts timestamp, event_id bigint"
_OUT_SCHEMA = (
    "user_id bigint, depth bigint, t1_us bigint, t2_us bigint, "
    "t3_us bigint, converted_7d bigint"
)

CLICKER, PURCHASER, LATE_SIGNUP = 1, 2, 3
CLICKS_PER_BATCH = 10
BATCH_STEP_S = 60
WATERMARK = "90 seconds"  # ~1.5 batches of disorder horizon


def _batch_rows(k: int) -> list[tuple]:
    """Batch k's events: 10 clicks for the sustained clicker, 10
    purchases for the sustained purchaser (neither ever signs up),
    one fresh converter (signup -> click -> purchase), and the
    late-signup user — clicks in batches 0-4 (arming the signup-less
    timeout each time), a signup in batch 5, one qualifying click in
    batch 6, then silence: the armed timeout must NOT survive the
    signup invocation and reap the live frontier."""
    base = _T0 + _dt.timedelta(seconds=k * BATCH_STEP_S)
    eid = k * 1000
    rows = []
    for i in range(CLICKS_PER_BATCH):
        t = base + _dt.timedelta(seconds=2 * i)
        rows.append((CLICKER, "click", t, eid + i))
        rows.append((PURCHASER, "purchase", t, eid + 100 + i))
    conv = 100 + k
    rows.append((conv, "signup", base, eid + 200))
    rows.append((conv, "click", base + _dt.timedelta(seconds=5), eid + 201))
    rows.append(
        (conv, "purchase", base + _dt.timedelta(seconds=10), eid + 202)
    )
    if k < 5:
        rows.append((LATE_SIGNUP, "click", base, eid + 300))
    elif k == 5:
        rows.append((LATE_SIGNUP, "signup", base, eid + 300))
    elif k == 6:
        rows.append((LATE_SIGNUP, "click", base, eid + 300))
    return rows


def run_soak(spark, workdir: str, n_batches: int = 20) -> dict:
    """Run the soak; returns {"batches": [...], "final_state": {...},
    "after_future": {...}} for assertion/reporting."""
    from hive_service_spark.streaming.events import (
        FUNNEL_STATE_SCHEMA,
        _funnel_step,
    )

    src = f"{workdir}/src"
    ckpt = f"{workdir}/ckpt"

    def land(rows):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        q = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withWatermark("ts", WATERMARK)
            .withColumn("t", F.unix_micros("ts"))
            .groupBy("user_id")
            .applyInPandasWithState(
                _funnel_step,
                outputStructType=_OUT_SCHEMA,
                stateStructType=FUNNEL_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    # land every batch file up front IN ORDER (the file source picks
    # them up oldest-first, one per micro-batch via maxFilesPerTrigger)
    for k in range(n_batches):
        land(_batch_rows(k))
    q = run()

    batches = []
    for p in q.recentProgress:
        so = p["stateOperators"]
        if not so:
            continue
        batches.append(
            {
                "batch_id": p["batchId"],
                "rows_in": p["numInputRows"],
                "watermark": p["eventTime"].get("watermark"),
                "state_rows": so[0]["numRowsTotal"],
                "state_removed": so[0]["numRowsRemoved"],
            }
        )

    def read_state():
        st = spark.read.format("statestore").load(ckpt)
        out = {}
        for r in st.collect():
            g = r["value"]["groupState"]
            out[r["key"]["user_id"]] = {
                "t1": g["t1"],
                "n_clicks": len(g["clicks"] or []),
                "n_purchases": len(g["purchases"] or []),
            }
        return out

    final_state = read_state()

    # far-future batch: one touch for a fresh user pushes the
    # watermark past every hot candidate -> the armed timeouts fire
    future = _T0 + _dt.timedelta(days=30)
    land([(999, "signup", future, 999_999)])
    run()
    after_future = read_state()

    return {
        "batches": batches,
        "final_state": final_state,
        "after_future": after_future,
        "n_batches": n_batches,
        "clicks_delivered": n_batches * CLICKS_PER_BATCH,
    }
