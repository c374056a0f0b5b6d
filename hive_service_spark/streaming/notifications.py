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

from hive_service_spark.operators.acid_snapshots import (
    _EVENT_LOG_ORACLE,
    _event_log_table,
    _SCRATCH as _ACID_SCRATCH,
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
    path = os.path.join(_ACID_SCRATCH, f"orders_events_stream_{os.getpid()}")
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
            spark.createDataFrame(
                [
                    (
                        v,
                        "CREATE_TABLE" if v == 0 else "COMMIT_TXN",
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
