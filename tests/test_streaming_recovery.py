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
