"""Streaming NOTIFICATION-LOG consumer — the replication-consumer
topology of the reference's metastore event feed.

The batch query ``acid_event_log`` (operators/acid_snapshots.py) serves
one poll of ``get_next_notification(last_event_id)`` over the snapshot
commit log. A real replication consumer (the reference's REPL LOAD /
HiveReplicationV2 consumers sit on
``hive-metastore!…ThriftHiveMetastore$Iface.get_next_notification``)
does not poll once — it TAILS the log: every newly published event
triggers a consumer-side action (load the changed data, update the
replica). This module runs that topology as a Structured Streaming
query:

- source: the manifest log directory itself as a JSON file stream —
  each published commit manifest is one totally-ordered event, and the
  file source's checkpoint is the consumer's durable read position
  (the moving offset);
- the stored ``last_event_id`` filter reproduces the poll-from-offset
  contract (a consumer that already applied events <= N skips them on
  replay);
- sink: ``foreachBatch`` — for each event the consumer ACTS on it with
  a batch read of that event's snapshot (exactly what a replica
  applying an event does) and lands one idempotent per-event output
  dir, so a replayed micro-batch rewrites the same files (exactly-once
  via checkpoint batch-id + idempotent write, the production pattern).

Value-identical to the batch poll, so it shares _EVENT_LOG_ORACLE.

Scale: the stream carries MANIFESTS (O(bytes) metadata), never table
data; the per-event visible-count audit reads the snapshot at that
version — the consumer-side "apply" work a replica performs anyway.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.operators.acid_snapshots import (
    _CDC_APPLY_ORACLE,
    _EVENT_LOG_ORACLE,
    _event_log_table,
    _scratch as _acid_scratch,
    SnapshotTable,
)
from hive_service_spark.registry import query
from hive_service_spark.scratch import pid_dir

_MANIFEST_SCHEMA = (
    "version long, op string, deletes map<string, array<string>>"
)


@query("stream_event_log_consume", oracle=_EVENT_LOG_ORACLE)
def stream_event_log_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail the snapshot commit log as a stream and apply each event:
    the streaming sibling of ``acid_event_log`` (same DML sequence,
    same oracle). Each micro-batch's events are applied by reading the
    snapshot AT that event's version (time travel) and recording the
    Hive-style event payload + visible row count; outputs land in one
    dir per event_id so checkpoint replay is idempotent."""
    ns = pid_dir("proc")
    path = os.path.join(_acid_scratch(), "orders_events_stream")
    t = _event_log_table(spark, sf_dir, path)

    last_event_id = 1  # the consumer's stored offset
    target = f"{ns}/event_log_consume"
    ckpt = f"{ns}/checkpoints/hs_stream_event_log"
    shutil.rmtree(target, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    events = (
        spark.readStream.schema(_MANIFEST_SCHEMA)
        .json(os.path.join(path, "_log"))
        .where(F.col("version") > last_event_id)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # events are O(versions) metadata rows — collect is bounded by
        # the commit count, never by table size
        for r in batch_df.select("version", "op", "deletes").collect():
            v = int(r["version"])
            n = t.read(version=v).count()
            # every consumed event is a commit: versions at or below
            # the stored offset (incl. the v0 CREATE_TABLE event) never
            # pass the version filter (round-13 review: the v==0 branch
            # here was dead code implying v0 flows through)
            spark.createDataFrame(
                [
                    (
                        v,
                        "COMMIT_TXN",
                        r["op"],
                        bool(r["deletes"]),
                        n,
                    )
                ],
                "event_id bigint, event_type string, op string, "
                "has_delete_deltas boolean, n_rows_visible bigint",
            ).write.mode("overwrite").parquet(f"{target}/event-{v}")

    q = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{target}/event-*").orderBy("event_id")


# ---------------------------------------------------------------------------
# streaming CDC apply — the event stream DRIVING replica maintenance
# ---------------------------------------------------------------------------


@query("stream_cdc_apply_replica", oracle=_CDC_APPLY_ORACLE)
def stream_cdc_apply_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full replication-consumer loop, live: the primary's
    notification stream (its commit log, consumed exactly like
    stream_event_log_consume) DRIVES incremental replica maintenance —
    for each arriving event the consumer computes that event's
    PER-VERSION change set (v-1 vs v, the co-partitioned full-outer
    diff of acid_cdc_changes) and applies it to the replica with the
    consumer APIs a replication job actually has: MERGE for upserts,
    key-frame merge-on-read delete for deletes. This is the streaming
    sibling of acid_cdc_apply_replica (which applies one v0-vs-latest
    diff in batch) and shares its oracle: the replica's final state
    must be value-identical, and both anti-join drift counts against
    the primary must be ZERO.

    Exactly-once: an event re-delivered across restarts re-applies its
    delta, and both apply paths are idempotent (MERGE re-asserts the
    same values; a repeated key-frame delete re-deletes nothing) — the
    applied-version guard just skips the no-op work. Ordering: events
    are applied in version order within each micro-batch; the commit
    log's totally-ordered file names keep discovery order monotonic.

    Scale: the stream carries manifests (metadata); each apply moves
    |that event's changes| through the replica, never |table| — the
    same replication economics as the batch form, but with per-event
    freshness."""
    base = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 2500)
        .select(
            "o_orderkey",
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
    )
    ppath = os.path.join(_acid_scratch(), "orders_cdcstream_p")
    rpath = os.path.join(_acid_scratch(), "orders_cdcstream_r")
    primary = SnapshotTable.create(spark, ppath, base, key_col="o_orderkey")
    primary.update(
        (F.col("status") == "O") & (F.col("price") > 200000),
        {
            "price": F.round(
                F.col("price").cast("decimal(18,2)")
                * F.lit("1.05").cast("decimal(3,2)"),
                2,
            ).cast("double")
        },
    )
    primary.delete(F.col("price") < 20000)
    primary.merge(
        spark.createDataFrame(
            [(9000001, "N", 111.0), (9000002, "N", 222.0)],
            "o_orderkey long, status string, price double",
        ),
        update_cols=["status", "price"],
    )
    replica = SnapshotTable.create(
        spark, rpath, primary.read(version=0), key_col="o_orderkey"
    )

    ns = pid_dir("proc")
    ckpt = f"{ns}/checkpoints/hs_stream_cdc_apply"
    shutil.rmtree(ckpt, ignore_errors=True)
    events = (
        spark.readStream.schema(_MANIFEST_SCHEMA)
        .json(os.path.join(ppath, "_log"))
        .where(F.col("version") > 0)  # v0 = CREATE_TABLE, already seeded
    )
    applied: set[int] = set()

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # manifests are O(versions) metadata rows; apply in version order
        versions = sorted(
            int(r["version"]) for r in batch_df.select("version").collect()
        )
        for v in versions:
            if v in applied:
                continue
            applied.add(v)
            old = primary.read(version=v - 1).select(
                F.col("o_orderkey").alias("k"),
                F.col("status").alias("s_old"),
                F.col("price").alias("p_old"),
            )
            new = primary.read(version=v).select(
                F.col("o_orderkey").alias("k"),
                F.col("status").alias("s_new"),
                F.col("price").alias("p_new"),
            )
            # the diff is consumed up to four times below (two
            # emptiness probes + the merge + the delete); persist it so
            # the two snapshot reads and the full-outer join run ONCE
            # per version instead of per consumer (round-13 review)
            diff = (
                old.join(new, "k", "full_outer")
                .where(
                    F.col("s_old").isNull()
                    | F.col("s_new").isNull()
                    | (F.col("s_old") != F.col("s_new"))
                    | (F.col("p_old") != F.col("p_new"))
                )
                .persist()
            )
            try:
                upserts = diff.where(F.col("s_new").isNotNull()).select(
                    F.col("k").alias("o_orderkey"),
                    F.col("s_new").alias("status"),
                    F.col("p_new").alias("price"),
                )
                deleted = diff.where(F.col("s_new").isNull()).select(
                    F.col("k").alias("o_orderkey")
                )
                # skip empty applies: an event whose delta has no
                # upserts (pure delete) or no deletes would otherwise
                # publish an empty replica version (the .count() is on
                # the bounded change set, not the table)
                if upserts.limit(1).count():
                    replica.merge(upserts, update_cols=["status", "price"])
                if deleted.limit(1).count():
                    replica.delete_mor_keys(deleted)
            finally:
                diff.unpersist()

    q = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rep = replica.read()
    pri = primary.read()
    only_p = pri.join(rep, "o_orderkey", "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_only_primary")
    )
    only_r = rep.join(pri, "o_orderkey", "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_only_replica")
    )
    state = rep.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum(F.col("price").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("price_sum"),
    )
    return (
        state.crossJoin(F.broadcast(only_p))
        .crossJoin(F.broadcast(only_r))
        .select(
            "status", "n_rows", "price_sum", "n_only_primary", "n_only_replica"
        )
        .orderBy("status")
    )
