"""Checkpoint recovery: exactly-once across a streaming-query restart.

The registered streaming queries prove per-run semantics against batch
oracles; this test proves the RESTART contract production jobs rely on
(reference analog: a periodic Hive batch job has no such contract —
re-running it double-counts unless the user hand-rolls dedup):

1. run an availableNow file-source -> file-sink query over files A,
2. stop, land new files B, re-run with the SAME checkpoint,
3. the sink must contain A union B exactly once — the checkpoint's
   source offsets skip A, and the file-sink commit log makes partially
   written output invisible to readers,
4. a third run with no new input must add nothing.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hive_service_spark.catalog import load
from tests.conftest import SF_DIR


def _run_once(spark, src, ckpt, sink, schema):
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("doubled", F.col("value") * 2)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    ev = load(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    part_a = ev.where(F.col("event_id") % 2 == 0)
    part_b = ev.where(F.col("event_id") % 2 == 1)
    n_a = part_a.count()
    n_total = ev.count()

    part_a.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    _run_once(spark, src, ckpt, sink, schema)
    out1 = spark.read.parquet(sink)
    assert out1.count() == n_a

    # new files land; SAME checkpoint — only the delta is processed
    part_b.coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, sink, schema)
    out2 = spark.read.parquet(sink)
    assert out2.count() == n_total, "restart must process exactly the new files"
    assert out2.select("event_id").distinct().count() == n_total, (
        "no event may be duplicated across the restart"
    )

    # idempotent re-run: no new input, no new output
    _run_once(spark, src, ckpt, sink, schema)
    assert spark.read.parquet(sink).count() == n_total

    # the transform survived the restart on both halves
    bad = spark.read.parquet(sink).where(
        F.col("doubled") != F.col("value") * 2
    )
    assert bad.count() == 0


def test_event_log_consumer_replay_is_idempotent(spark):
    """stream_event_log_consume lands one output dir per event_id and
    overwrites it on replay, so re-running the whole consumer (fresh
    checkpoint, same commit log) must produce the IDENTICAL decision
    table — the exactly-once contract a replication consumer needs when
    its checkpoint is lost and it re-polls from its stored offset."""
    from hive_service_spark.registry import load_all

    fn = load_all()["stream_event_log_consume"].fn
    first = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    second = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    assert first == second
    assert len(first) == 3  # events 2..4 past the stored offset


def test_funnel_state_survives_restart(spark, tmp_path):
    """The stateful funnel's GroupState must survive a query restart:
    half the events stream in run 1, the rest in run 2 with the SAME
    checkpoint — the recovered per-user frontiers must land exactly on
    the batch funnel over all events. This is the docstring's
    order-insensitive-fold claim tested under an actual restart, not
    just a single availableNow replay. The answer per user is the
    LAST emission (highest batch id) — a late-arriving earlier event
    may lawfully move a frontier timestamp DOWN, so max-over-emissions
    is not the right reduction; users untouched by run 2 keep their
    run-1 emission."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from hive_service_spark.registry import load_all
    from hive_service_spark.streaming.events import (
        FUNNEL_STATE_SCHEMA,
        _funnel_step,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "emissions")

    ev = load(spark, SF_DIR, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t"), "event_id"
    )
    cut = ev.agg(F.percentile_approx("t", 0.5)).first()[0]
    part_a = ev.where(F.col("t") <= cut)
    part_b = ev.where(F.col("t") > cut)
    part_a.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    out_schema = (
        "user_id bigint, depth bigint, t1_us bigint, t2_us bigint, "
        "t3_us bigint, converted_7d bigint"
    )

    def run():
        # memory sink cannot recover from a checkpoint; foreachBatch
        # appending to parquet is the fault-tolerant emission log
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .groupBy("user_id")
            .applyInPandasWithState(
                _funnel_step,
                outputStructType=out_schema,
                stateStructType=FUNNEL_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            .writeStream.foreachBatch(
                lambda df, _id: df.withColumn(
                    "batch_id", F.lit(_id)
                ).write.mode("append").parquet(sink)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    part_b.coalesce(1).write.mode("append").parquet(src)
    run()

    emissions = spark.read.parquet(sink)
    final = (
        emissions.groupBy("user_id")
        .agg(
            # last emission wins: the checkpoint carries batch ids
            # across the restart, so max(batch_id) is run-2's
            # emission when the user was touched there, run-1's
            # otherwise
            F.max(
                F.struct(
                    "batch_id", "depth", "t3_us", "t2_us", "t1_us",
                    "converted_7d",
                )
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.depth").alias("depth"),
            F.col("s.t1_us").alias("t1_us"),
            F.col("s.t2_us").alias("t2_us"),
            F.col("s.t3_us").alias("t3_us"),
            F.col("s.converted_7d").alias("converted_7d"),
        )
    )
    batch = load_all()["seq_window_funnel"].fn(spark, SF_DIR)
    got = {r["user_id"]: r.asDict() for r in final.collect()}
    want = {r["user_id"]: r.asDict() for r in batch.collect()}
    assert got == want


def test_funnel_out_of_order_across_batches(spark, tmp_path):
    """Round-8 ADVICE (medium): a click/purchase whose EVENT time is
    later than the signup's but which ARRIVES in an earlier micro-batch
    must not be dropped. Run 1 delivers only the click+purchase, run 2
    (same checkpoint) delivers the signup with the earliest event time
    — the final frontier must be the full depth-3 chain, exactly what
    the batch fold over all three events gives. The pre-fix greedy
    fold permanently discarded the run-1 events (no signup frontier
    yet) and converged on depth 1."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from hive_service_spark.streaming.events import (
        FUNNEL_STATE_SCHEMA,
        _funnel_step,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "emissions")

    def _events(rows):
        return spark.createDataFrame(
            rows, "user_id bigint, event_type string, t bigint, event_id bigint"
        )

    out_schema = (
        "user_id bigint, depth bigint, t1_us bigint, t2_us bigint, "
        "t3_us bigint, converted_7d bigint"
    )

    def run():
        q = (
            spark.readStream.schema(
                "user_id bigint, event_type string, t bigint, event_id bigint"
            )
            .parquet(src)
            .groupBy("user_id")
            .applyInPandasWithState(
                _funnel_step,
                outputStructType=out_schema,
                stateStructType=FUNNEL_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            .writeStream.foreachBatch(
                lambda df, _id: df.withColumn(
                    "batch_id", F.lit(_id)
                ).write.mode("append").parquet(sink)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: the LATER steps arrive first (out of order)
    _events(
        [(7, "click", 200, 11), (7, "purchase", 300, 12)]
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    # batch 2: the signup with the EARLIEST event time arrives last
    _events([(7, "signup", 100, 13)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()

    last = (
        spark.read.parquet(sink)
        .orderBy(F.col("batch_id").desc())
        .first()
        .asDict()
    )
    assert (last["depth"], last["t1_us"], last["t2_us"], last["t3_us"]) == (
        3, 100, 200, 300,
    )
    assert last["converted_7d"] == 1
