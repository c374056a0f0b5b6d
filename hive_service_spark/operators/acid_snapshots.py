"""Snapshot-versioned copy-on-write DML — the storage analog of the
reference's ACID table lifecycle.

Reference surface (SURVEY.md §1.1, §3.2): Hive ACID tables give
MERGE/UPDATE/DELETE + snapshot isolation via delta files, a transaction
manager, and a compactor (hive-exec!ql/txn/compactor/{Initiator,Worker,
Cleaner}; UpdateDeleteSemanticAnalyzer compiles the DML to join
rewrites). Plain Spark has none of that — production uses Delta Lake /
Iceberg. This module implements the same PUBLIC design those projects
use (an ordered JSON commit log over immutable parquet snapshots,
copy-on-write at file granularity) with zero external dependencies, so
the ACID DML surface has a real versioned-storage analog here instead
of overwrite-rewrite demos.

Layout:

    <table>/_log/00000000.json        commit manifests, one per version:
                                      {version, op, buckets: {id: reldir}}
    <table>/data/v0-b3/part-*.parquet immutable bucket snapshots

Every row is hash-assigned to one of ``n_buckets`` buckets (the file-
granularity stand-in; a real deployment buckets by partition + file).
A DML commit rewrites ONLY the buckets containing affected rows —
untouched buckets are carried by reference into the next manifest,
exactly Delta's copy-on-write. Readers resolve a manifest (latest or
any historical version = time travel) and read only its bucket dirs;
writers never mutate a published file, so concurrent readers at any
version are consistent (single-writer model, like a lone Delta writer;
no distributed commit protocol is claimed).

At 100 TB: the affected-bucket scan is one shuffle-free filtered pass
(hash-prune on the key), the rewrite touches |affected| buckets of
~size/n_buckets each, and time-travel reads are manifest lookups — no
driver-side data movement anywhere.
"""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.registry import query

# r14: per-pid scratch namespace via scratch.pid_dir (tmpfs-backed,
# reaped on dead pids) — the module used to carry its own fixed
# repo-disk path with per-pid FILE names; the pid now lives in the
# namespace, so the file names drop their suffix
def _scratch() -> str:
    from hive_service_spark.scratch import pid_dir

    return pid_dir("acid")


class ConcurrentWriteConflict(RuntimeError):
    """A second writer published the version this commit was based on.

    Analog of the reference's write-write conflict abort
    (hive-exec!ql/lockmgr/DbTxnManager; SURVEY.md §1.1): the losing
    transaction must re-read the latest snapshot and retry its DML."""


class SnapshotTable:
    """A minimal snapshot-versioned parquet table with COW DML."""

    def __init__(self, spark: SparkSession, path: str, key_col: str, n_buckets: int = 8):
        self.spark = spark
        self.path = path
        self.key = key_col
        self.n_buckets = n_buckets

    # -- commit log ---------------------------------------------------------

    def _log_dir(self) -> str:
        return os.path.join(self.path, "_log")

    def _versions(self) -> list[int]:
        d = self._log_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f.split(".")[0]) for f in os.listdir(d) if f.endswith(".json")
        )

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._log_dir(), f"{version:08d}.json")) as fh:
            return json.load(fh)

    def _commit(
        self,
        op: str,
        buckets: dict[int, str],
        deletes: dict[int, list[str]] | None = None,
        base_version: int | None = None,
    ) -> int:
        """Publish version ``base_version + 1`` with OPTIMISTIC
        CONCURRENCY: the manifest is hard-linked into place with an
        exclusive create, so if another writer published the same
        version number first, THIS commit loses and raises
        ``ConcurrentWriteConflict`` (the analog of the reference's
        transaction manager rejecting a write-write conflict; Delta
        Lake's commit protocol is the same file-level race). There is
        no check-then-write window — the link either claims the
        version slot or fails."""
        vs = self._versions()
        latest = vs[-1] if vs else -1
        if base_version is None:
            base_version = latest
        if base_version != latest:
            raise ConcurrentWriteConflict(
                f"read snapshot v{base_version} but latest is v{latest}"
            )
        v = base_version + 1
        os.makedirs(self._log_dir(), exist_ok=True)
        manifest = {
            "version": v,
            "op": op,
            "buckets": {str(b): rel for b, rel in sorted(buckets.items())},
            "deletes": {
                str(b): sorted(rels)
                for b, rels in sorted((deletes or {}).items())
                if rels
            },
        }
        # per-writer temp name: pid alone is not unique enough — two
        # THREADS of one process racing the same slot would share a pid
        # tmp path and one's cleanup would unlink the other's file
        # mid-publish (found by the two-thread race test)
        import threading

        tmp = os.path.join(
            self._log_dir(),
            f".{v:08d}.json.{os.getpid()}-{threading.get_ident()}.tmp",
        )
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        final = os.path.join(self._log_dir(), f"{v:08d}.json")
        try:
            # atomic + exclusive publish: exactly one writer can claim v
            os.link(tmp, final)
        except FileExistsError:
            raise ConcurrentWriteConflict(
                f"version v{v} was published by a concurrent writer"
            ) from None
        finally:
            os.unlink(tmp)
        return v

    # -- physical io --------------------------------------------------------

    def _bucket_of(self, col: Column) -> Column:
        return F.pmod(F.hash(col), F.lit(self.n_buckets))

    def _writer_uid(self) -> str:
        """Writer-unique suffix for UNCOMMITTED data dirs: two racing
        writers targeting the same version must never share a physical
        path, or the loser's mode('overwrite') could clobber bucket
        files the winner's already-published manifest points at. The
        manifest records the actual (uid-suffixed) reldirs, so the
        published snapshot only ever references dirs its own writer
        wrote; a loser's orphan dirs are swept by ``vacuum`` (they
        appear in no manifest)."""
        import threading

        return f"{os.getpid()}-{threading.get_ident()}"

    def _write_buckets(self, df: DataFrame, version: int, bucket_ids) -> dict[int, str]:
        """Write df's rows (already restricted to bucket_ids) out as one
        immutable dir per bucket; returns {bucket: reldir}."""
        out: dict[int, str] = {}
        uid = self._writer_uid()
        tagged = df.withColumn("_b", self._bucket_of(F.col(self.key)))
        for b in bucket_ids:
            rel = f"data/v{version}-b{b}-{uid}"
            (
                tagged.where(F.col("_b") == b)
                .drop("_b")
                .write.mode("overwrite")
                .parquet(os.path.join(self.path, rel))
            )
            out[b] = rel
        return out

    def read(self, version: int | None = None) -> DataFrame:
        """Read a snapshot (latest, or time-travel to ``version``).

        Merge-on-read: if the manifest carries delete deltas (from
        ``delete_mor``), the deleted keys are subtracted with a
        BROADCAST anti-join — the delete set is the small change log,
        never the table, so at 100 TB this is a map-side filter over
        the base scan, exactly how the reference's ORC ACID reader
        applies delete_delta files per split."""
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        v = vs[-1] if version is None else version
        m = self._manifest(v)
        paths = [os.path.join(self.path, rel) for rel in m["buckets"].values()]
        df = self.spark.read.parquet(*paths)
        del_rels = [r for rels in m.get("deletes", {}).values() for r in rels]
        if del_rels:
            dk = self.spark.read.parquet(
                *[os.path.join(self.path, r) for r in del_rels]
            ).select(self.key).distinct()
            df = df.join(F.broadcast(dk), on=self.key, how="left_anti")
        return df

    def history(self) -> list[dict]:
        return [self._manifest(v) for v in self._versions()]

    # -- DML (single-writer copy-on-write) ----------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        key_col: str,
        n_buckets: int = 8,
    ) -> "SnapshotTable":
        shutil.rmtree(path, ignore_errors=True)
        t = cls(spark, path, key_col, n_buckets)
        buckets = t._write_buckets(df, 0, range(n_buckets))
        t._commit("create", buckets)
        return t

    def _affected_buckets(self, keys_df: DataFrame) -> list[int]:
        """Buckets containing any of the given keys — the COW prune.
        The key frame is the (small) change set, so this is a tiny
        distinct aggregate, not a scan of the table."""
        rows = (
            keys_df.select(
                self._bucket_of(F.col(self.key)).alias("_b")
            )
            .distinct()
            .collect()
        )
        return sorted(r["_b"] for r in rows)

    def _rewrite(self, op: str, bucket_ids: list[int], new_rows_fn) -> int:
        """Shared COW commit: rewrite ``bucket_ids`` via ``new_rows_fn``
        (current-bucket-rows -> new-bucket-rows), carry the rest.
        Pending delete deltas are APPLIED to the affected buckets
        before the transform (so a COW rewrite never resurrects
        MOR-deleted rows) and cleared for exactly those buckets; the
        untouched buckets keep their deltas."""
        vs = self._versions()
        base_v = vs[-1]
        cur = self._manifest(base_v)
        v = base_v + 1
        cur_del = {int(b): rels for b, rels in cur.get("deletes", {}).items()}
        carried = {
            int(b): rel
            for b, rel in cur["buckets"].items()
            if int(b) not in bucket_ids
        }
        carried_del = {
            b: rels for b, rels in cur_del.items() if b not in bucket_ids
        }
        if bucket_ids:
            affected_paths = [
                os.path.join(self.path, cur["buckets"][str(b)])
                for b in bucket_ids
            ]
            current = self.spark.read.parquet(*affected_paths)
            del_rels = [r for b in bucket_ids for r in cur_del.get(b, [])]
            if del_rels:
                dk = self.spark.read.parquet(
                    *[os.path.join(self.path, r) for r in del_rels]
                ).select(self.key).distinct()
                current = current.join(
                    F.broadcast(dk), on=self.key, how="left_anti"
                )
            rewritten = self._write_buckets(new_rows_fn(current), v, bucket_ids)
        else:
            rewritten = {}
        return self._commit(
            op, {**carried, **rewritten}, deletes=carried_del, base_version=base_v
        )

    def merge(self, source: DataFrame, update_cols: list[str]) -> int:
        """MERGE: match on the key; matched rows take ``update_cols``
        from source, unmatched source rows are inserted. COW: only
        buckets hashing a source key are rewritten."""
        src = source
        bucket_ids = self._affected_buckets(src)

        def apply(current: DataFrame) -> DataFrame:
            s = src.select(
                F.col(self.key).alias("_sk"),
                *[F.col(c).alias(f"_s_{c}") for c in update_cols],
            )
            # full-outer (matched update + unmatched insert in one
            # pass) cannot use a broadcast build side in Spark — both
            # sides shuffle on the key, but `current` is only the
            # affected buckets and the source is the small change set
            merged = current.join(
                s, current[self.key] == F.col("_sk"), "full_outer"
            )
            cols = []
            for c in current.columns:
                if c in update_cols:
                    cols.append(F.coalesce(f"_s_{c}", c).alias(c))
                elif c == self.key:
                    cols.append(F.coalesce(self.key, "_sk").alias(c))
                else:
                    cols.append(F.col(c))
            return merged.select(*cols)

        return self._rewrite("merge", bucket_ids, apply)

    def update(self, cond: Column, assignments: dict[str, Column]) -> int:
        """UPDATE ... SET ... WHERE cond (COW on buckets with matches)."""
        matched_keys = self.read().where(cond).select(self.key)
        bucket_ids = self._affected_buckets(matched_keys)

        def apply(current: DataFrame) -> DataFrame:
            return current.select(
                *[
                    F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
                    if c in assignments
                    else F.col(c)
                    for c in current.columns
                ]
            )

        return self._rewrite("update", bucket_ids, apply)

    def delete(self, cond: Column) -> int:
        """DELETE WHERE cond (COW on buckets with matches)."""
        matched_keys = self.read().where(cond).select(self.key)
        bucket_ids = self._affected_buckets(matched_keys)
        return self._rewrite(
            "delete", bucket_ids, lambda cur: cur.where(~cond)
        )

    # -- merge-on-read deletes + compactor (reference txn/compactor) --------

    def delete_mor(self, cond: Column) -> int:
        """DELETE WHERE cond, MERGE-ON-READ: writes only a per-bucket
        delete-delta (the matched KEYS, not rewritten data), the exact
        analog of the reference's ``delete_delta_x_y`` directories
        (hive-exec!ql/io/AcidUtils; SURVEY.md §1.1). Base buckets are
        untouched — the delete is O(|matched keys|) I/O regardless of
        table size — and every reader subtracts the deltas until the
        compactor folds them in. This is the write path a 100 TB
        table wants for frequent small deletes (GDPR erasure, bad-doc
        takedowns): the COW ``delete`` rewrites whole buckets."""
        return self._delete_mor(self.read().where(cond).select(self.key))

    def delete_mor_keys(self, keys_df: DataFrame) -> int:
        """DELETE by KEY FRAME, merge-on-read — the CDC-consumer form:
        a replication/apply job holds the deleted keys (from an
        upstream change set), not a predicate. Same delta write path
        as ``delete_mor``."""
        return self._delete_mor(keys_df.select(self.key))

    def _delete_mor(self, matched: DataFrame) -> int:
        vs = self._versions()
        base_v = vs[-1]
        cur = self._manifest(base_v)
        v = base_v + 1
        bucket_ids = self._affected_buckets(matched)
        deletes = {
            int(b): list(rels) for b, rels in cur.get("deletes", {}).items()
        }
        tagged = matched.withColumn("_b", self._bucket_of(F.col(self.key)))
        uid = self._writer_uid()
        for b in bucket_ids:
            rel = f"data/dv{v}-b{b}-{uid}"
            (
                tagged.where(F.col("_b") == b)
                .select(self.key)
                .write.mode("overwrite")
                .parquet(os.path.join(self.path, rel))
            )
            deletes.setdefault(b, []).append(rel)
        buckets = {int(b): rel for b, rel in cur["buckets"].items()}
        return self._commit(
            "delete.mor", buckets, deletes=deletes, base_version=base_v
        )

    def compact(self) -> int:
        """MAJOR compaction (reference ``ql/txn/compactor/Worker``):
        fold every pending delete delta into fresh base buckets and
        publish a delta-free manifest. Readers of older versions are
        unaffected (their manifests still reference the old dirs until
        ``vacuum``). One full rewrite of live data — schedule it like
        the reference does, off the write path."""
        vs = self._versions()
        base_v = vs[-1]
        snap = self.read()  # delete deltas applied
        buckets = self._write_buckets(snap, base_v + 1, range(self.n_buckets))
        return self._commit("compact", buckets, deletes={}, base_version=base_v)

    def maybe_compact(self, max_delete_deltas: int = 10) -> bool:
        """Compaction INITIATOR (reference ``ql/txn/compactor/
        Initiator``): trigger a major compaction when the pending
        delete-delta count crosses the threshold, else no-op. Returns
        whether a compaction ran."""
        cur = self._manifest(self._versions()[-1])
        n = sum(len(rels) for rels in cur.get("deletes", {}).values())
        if n >= max_delete_deltas:
            self.compact()
            return True
        return False

    def restore(self, version: int) -> int:
        """RESTORE — rollback-as-a-new-commit (Delta Lake's
        ``RESTORE TABLE … VERSION AS OF``; the recovery verb the
        reference's ACID surface lacks — Hive can only replay): the
        target version's manifest is republished VERBATIM as the new
        latest version. No data moves: the new manifest references the
        old base buckets and delete deltas, so the operation is
        O(manifest) regardless of table size; history stays intact
        (the bad versions remain time-travelable for audit) and the
        cleaner's retention rules apply unchanged. Goes through the
        same optimistic-concurrency commit as every writer — a racing
        writer invalidates the restore rather than interleaving with
        it."""
        latest = self._versions()[-1]
        m = self._manifest(version)
        buckets = {int(b): rel for b, rel in m["buckets"].items()}
        deletes = {
            int(b): list(rels) for b, rels in m.get("deletes", {}).items()
        }
        # pin the base version the rollback DECISION was made against:
        # a writer landing between this read and the commit must abort
        # the restore (found by the concurrent-writer restore test)
        return self._commit(
            "restore", buckets, deletes=deletes, base_version=latest
        )

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """CLEANER (reference ``ql/txn/compactor/Cleaner``): drop
        manifests older than the newest ``retain_last`` versions and
        delete every data dir no retained manifest references. After
        vacuum, time travel beyond the retention window raises (the
        files are gone), exactly like the reference cleaner removing
        obsolete base/delta dirs once no open txn can read them.
        Returns the removed relative dirs."""
        vs = self._versions()
        retained = vs[-retain_last:]
        keep: set[str] = set()
        for v in retained:
            m = self._manifest(v)
            keep.update(m["buckets"].values())
            for rels in m.get("deletes", {}).values():
                keep.update(rels)
        removed: list[str] = []
        data_dir = os.path.join(self.path, "data")
        for d in sorted(os.listdir(data_dir)):
            rel = f"data/{d}"
            if rel not in keep:
                shutil.rmtree(os.path.join(data_dir, d))
                removed.append(rel)
        for v in vs[: len(vs) - retain_last]:
            os.unlink(os.path.join(self._log_dir(), f"{v:08d}.json"))
        return removed


# ---------------------------------------------------------------------------
# registered query: full merge -> update -> delete -> time-travel lifecycle
# ---------------------------------------------------------------------------

_LIFECYCLE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderkey < 2000
),
merged AS (  -- v1: MERGE repriced 'P' rows + inserted sentinel row
  -- reprice in DECIMAL then cast: ROUND on a raw double product
  -- diverges between engines on half-cent boundaries
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'P'
              THEN CAST(ROUND(CAST(price AS DECIMAL(18,2))
                              * CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE)
              ELSE price END AS price
  FROM base
  UNION ALL
  SELECT 9999999, 'N', 42.0
),
updated AS (  -- v2: UPDATE status F -> D for price > 300000
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'F' AND price > 300000
              THEN 'D' ELSE o_orderstatus END AS o_orderstatus,
         price
  FROM merged
),
final AS (  -- v3: DELETE price < 50000
  SELECT * FROM updated WHERE price >= 50000
)
SELECT 'v0' AS snapshot, COUNT(*) AS n_rows,
       ROUND(SUM(price), 2) AS total_price FROM base
UNION ALL
SELECT 'v3' AS snapshot, COUNT(*) AS n_rows,
       ROUND(SUM(price), 2) AS total_price FROM final
ORDER BY snapshot
"""


@query("acid_merge_time_travel", oracle=_LIFECYCLE_ORACLE)
def acid_merge_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ACID-analog lifecycle on a snapshot-versioned COW table:
    create v0 -> MERGE (reprice + insert) v1 -> UPDATE v2 -> DELETE v3,
    then aggregate BOTH the time-traveled v0 read and the final v3 read.
    The oracle recomputes the same algebra purely in SQL from the base
    table, so the value hash proves the storage layer preserved exact
    row content across four snapshots. Per-process scratch path keeps
    concurrent pytest/driver runs isolated."""
    path = os.path.join(_scratch(), "orders_lc")
    base = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    t = SnapshotTable.create(spark, path, base, key_col="o_orderkey")

    # v1: MERGE — reprice every 'P' order, insert one new row
    changes = base.where(F.col("o_orderstatus") == "P").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(
            F.col("price").cast("decimal(18,2)")
            * F.lit("1.1").cast("decimal(3,1)"),
            2,
        )
        .cast("double")
        .alias("price"),
    )
    sentinel = spark.createDataFrame(
        [(9999999, "N", 42.0)], "o_orderkey long, o_orderstatus string, price double"
    )
    t.merge(changes.unionByName(sentinel), update_cols=["o_orderstatus", "price"])

    # v2: UPDATE
    t.update(
        (F.col("o_orderstatus") == "F") & (F.col("price") > 300000),
        {"o_orderstatus": F.lit("D")},
    )

    # v3: DELETE
    t.delete(F.col("price") < 50000)

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("price"), 2).alias("total_price"),
        ).select(F.lit(tag).alias("snapshot"), "n_rows", "total_price")

    return (
        agg(t.read(version=0), "v0")
        .unionByName(agg(t.read(), "v3"))
        .orderBy("snapshot")
    )


# ---------------------------------------------------------------------------
# registered query: MOR deletes -> COW-over-deltas -> compactor -> cleaner
# ---------------------------------------------------------------------------

_MOR_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderkey < 3000
),
mor AS (  -- v1+v2: two merge-on-read delete deltas
  SELECT * FROM base WHERE price >= 30000 AND status <> 'P'
),
upd AS (  -- v3: COW UPDATE on top of the pending deltas
  SELECT o_orderkey,
         CASE WHEN status = 'F' AND price > 250000
              THEN 'D' ELSE status END AS status,
         price
  FROM mor
)
SELECT 'mor' AS stage, 'ALL' AS status, COUNT(*) AS n_rows,
       ROUND(SUM(price), 2) AS total_price FROM mor
UNION ALL
SELECT 'post_compact' AS stage, status, COUNT(*) AS n_rows,
       ROUND(SUM(price), 2) AS total_price
FROM upd GROUP BY status
ORDER BY stage, status
"""


@query("acid_mor_compaction", oracle=_MOR_ORACLE)
def acid_mor_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read delete lifecycle with the compactor pipeline:
    create v0 -> delete_mor (price delta) v1 -> delete_mor (status
    delta) v2 -> COW UPDATE that must apply-and-clear the pending
    deltas on its buckets v3 -> major compaction (Worker) v4 ->
    vacuum to the latest version (Cleaner). The first output row
    aggregates the MERGE-ON-READ view at v2 (base files untouched,
    deltas subtracted at read); the post_compact rows re-aggregate
    after compaction+vacuum, so the value hash proves delta
    subtraction, COW-over-delta correctness, and compaction all
    preserve exact row content. Reference: hive-exec!ql/io/AcidUtils
    delete_delta dirs + ql/txn/compactor/{Initiator,Worker,Cleaner}
    (SURVEY.md §1.1)."""
    path = os.path.join(_scratch(), "orders_mor")
    base = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 3000).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    t = SnapshotTable.create(spark, path, base, key_col="o_orderkey")
    t.delete_mor(F.col("price") < 30000)       # v1: small-delete fast path
    t.delete_mor(F.col("status") == "P")       # v2: second pending delta

    mor_view = t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("price"), 2).alias("total_price"),
    ).select(
        F.lit("mor").alias("stage"), F.lit("ALL").alias("status"),
        "n_rows", "total_price",
    )
    mor_view = spark.createDataFrame(
        mor_view.collect(), mor_view.schema
    )  # pin the v2 view before later commits change "latest"

    # v3: COW update — must fold the pending deltas on its buckets
    t.update(
        (F.col("status") == "F") & (F.col("price") > 250000),
        {"status": F.lit("D")},
    )
    # Initiator with threshold 0 == forced major compaction -> v4 (the
    # update may already have folded every pending delta on its own
    # buckets, so a >=1 threshold could legitimately no-op here; the
    # threshold semantics are pytest-covered in test_acid_snapshots)
    t.maybe_compact(max_delete_deltas=0)
    t.vacuum(retain_last=1)                      # Cleaner drops old dirs

    final = (
        t.read()
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("price"), 2).alias("total_price"),
        )
        .select(F.lit("post_compact").alias("stage"), "status", "n_rows", "total_price")
    )
    return mor_view.unionByName(final).orderBy("stage", "status")


# ---------------------------------------------------------------------------
# registered query: CDC — classified change set between two snapshots
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderkey < 2500
),
v1 AS (  -- UPDATE: reprice open big orders in DECIMAL
  SELECT o_orderkey, status,
         CASE WHEN status = 'O' AND price > 200000
              THEN CAST(ROUND(CAST(price AS DECIMAL(18,2))
                              * CAST(1.05 AS DECIMAL(3,2)), 2) AS DOUBLE)
              ELSE price END AS price
  FROM base
),
v2 AS (  -- DELETE small orders
  SELECT * FROM v1 WHERE price >= 20000
),
v3 AS (  -- MERGE-insert sentinel rows
  SELECT * FROM v2
  UNION ALL
  SELECT * FROM (VALUES (9000001, 'N', 111.0), (9000002, 'N', 222.0))
              AS t(o_orderkey, status, price)
),
diff AS (
  SELECT CASE WHEN b.o_orderkey IS NULL THEN 'insert'
              WHEN f.o_orderkey IS NULL THEN 'delete'
              ELSE 'update' END AS change_type,
         COALESCE(f.price, b.price) AS price
  FROM base b FULL OUTER JOIN v3 f USING (o_orderkey)
  WHERE b.o_orderkey IS NULL OR f.o_orderkey IS NULL
     OR b.status <> f.status OR b.price <> f.price
)
SELECT change_type, COUNT(*) AS n_rows,
       ROUND(SUM(price), 2) AS price_sum
FROM diff GROUP BY change_type ORDER BY change_type
"""


@query("acid_cdc_changes", oracle=_CDC_ORACLE)
def acid_cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC read between snapshot versions — the incremental-consumption
    analog of the reference's ACID delta files (`hive-exec!ql/io/
    AcidUtils` exposes base+delta dirs per ValidTxnList so readers can
    consume only what changed; SURVEY.md §1.1). Without per-commit
    row-level change files, a snapshot store derives the change set by
    DIFFING two versions: UPDATE v1 → DELETE v2 → MERGE-insert v3, then
    full-outer join v0 vs v3 on the table key classifying each row as
    insert / update / delete. Scale: both sides bucket-hash on the SAME
    key the snapshot layout buckets by, so the diff join co-partitions
    with the storage layout; unchanged rows are filtered before the
    aggregate. Downstream incremental jobs (index refresh, MV
    maintenance, replication) consume exactly this classified stream."""
    path = os.path.join(_scratch(), "orders_cdc")
    base = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2500).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    t = SnapshotTable.create(spark, path, base, key_col="o_orderkey")
    t.update(
        (F.col("status") == "O") & (F.col("price") > 200000),
        {
            "price": F.round(
                F.col("price").cast("decimal(18,2)")
                * F.lit("1.05").cast("decimal(3,2)"),
                2,
            ).cast("double")
        },
    )
    t.delete(F.col("price") < 20000)
    t.merge(
        spark.createDataFrame(
            [(9000001, "N", 111.0), (9000002, "N", 222.0)],
            "o_orderkey long, status string, price double",
        ),
        update_cols=["status", "price"],
    )

    old = t.read(version=0).select(
        F.col("o_orderkey").alias("k_old"),
        F.col("status").alias("status_old"),
        F.col("price").alias("price_old"),
    )
    new = t.read().select(
        F.col("o_orderkey").alias("k_new"),
        F.col("status").alias("status_new"),
        F.col("price").alias("price_new"),
    )
    joined = old.join(new, F.col("k_old") == F.col("k_new"), "full_outer")
    changed = joined.where(
        F.col("k_old").isNull()
        | F.col("k_new").isNull()
        | (F.col("status_old") != F.col("status_new"))
        | (F.col("price_old") != F.col("price_new"))
    )
    classified = changed.select(
        F.when(F.col("k_old").isNull(), "insert")
        .when(F.col("k_new").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.coalesce(F.col("price_new"), F.col("price_old")).alias("price"),
    )
    return (
        classified.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("price"), 2).alias("price_sum"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# registered query: SHOW TRANSACTIONS / SHOW LOCKS analog (txn introspection)
# ---------------------------------------------------------------------------

_TXNS_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 4000
),
v2 AS (SELECT k FROM base WHERE k % 7 <> 0),
v3 AS (SELECT k FROM v2 WHERE k % 5 <> 0)
SELECT CAST(txn_id AS BIGINT) AS txn_id, op, state,
       has_pending_deltas, CAST(n_rows AS BIGINT) AS n_rows
FROM (
  SELECT 0 AS txn_id, 'create' AS op, 'COMMITTED' AS state,
         FALSE AS has_pending_deltas,
         (SELECT COUNT(*) FROM base) AS n_rows
  UNION ALL
  SELECT 1, 'update', 'COMMITTED', FALSE, (SELECT COUNT(*) FROM base)
  UNION ALL
  SELECT 2, 'delete', 'COMMITTED', FALSE, (SELECT COUNT(*) FROM v2)
  UNION ALL
  SELECT 3, 'delete.mor', 'COMMITTED', TRUE, (SELECT COUNT(*) FROM v3)
  UNION ALL
  SELECT 4, 'compact', 'COMMITTED', FALSE, (SELECT COUNT(*) FROM v3)
)
ORDER BY txn_id
"""


@query("acid_show_transactions", oracle=_TXNS_ORACLE)
def acid_show_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW TRANSACTIONS / SHOW COMPACTIONS analog — the reference's
    txn-manager introspection surface (hive-metastore
    ``show_txns``/``show_locks``/``show_compact``; SURVEY.md §3.3, the
    last metastore group without an analog). Reads ONLY the commit-log
    manifests of a snapshot table after a known DML sequence
    (create -> update -> COW delete -> MOR delete -> compaction) and
    emits one row per committed transaction: txn id (= snapshot
    version), operation, state, whether delete deltas are pending
    (SHOW COMPACTIONS' 'initiated' signal — exactly what maybe_compact
    keys on), and the row count visible at that snapshot. The oracle
    recomputes every row count from the base table with the same
    predicate algebra, so this is a full value check of the history,
    not a shape check. Locks: the commit protocol is optimistic (no
    lock table to list — ConcurrentWriteConflict at publish time), so
    the lock-manager analog is the claimed-version-slot view this
    query renders; at 100 TB the manifests are O(versions) JSON files,
    never a data scan."""
    path = os.path.join(_scratch(), "orders_txns")
    base = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 4000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    t = SnapshotTable.create(spark, path, base, key_col="k")
    t.update(F.col("k") % 3 == 0, {"status": F.lit("U")})
    t.delete(F.col("k") % 7 == 0)
    t.delete_mor(F.col("k") % 5 == 0)
    t.compact()

    out = None
    for m in t.history():
        v = m["version"]
        frame = (
            t.read(version=v)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
            .select(
                F.lit(v).cast("bigint").alias("txn_id"),
                F.lit(m["op"]).alias("op"),
                F.lit("COMMITTED").alias("state"),
                F.lit(bool(m.get("deletes"))).alias("has_pending_deltas"),
                "n_rows",
            )
        )
        out = frame if out is None else out.unionByName(frame)
    return out.orderBy("txn_id")


# ---------------------------------------------------------------------------
# registered query: CDC APPLY — replicate a table from its change set
# ---------------------------------------------------------------------------

_CDC_APPLY_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderkey < 2500
),
v1 AS (
  SELECT o_orderkey, status,
         CASE WHEN status = 'O' AND price > 200000
              THEN CAST(ROUND(CAST(price AS DECIMAL(18,2))
                              * CAST(1.05 AS DECIMAL(3,2)), 2) AS DOUBLE)
              ELSE price END AS price
  FROM base
),
v2 AS (SELECT * FROM v1 WHERE price >= 20000),
v3 AS (
  SELECT * FROM v2
  UNION ALL
  SELECT * FROM (VALUES (9000001, 'N', 111.0), (9000002, 'N', 222.0))
              AS t(o_orderkey, status, price)
)
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(SUM(CAST(price AS DECIMAL(18,4))), 2)::DOUBLE AS price_sum,
       CAST(0 AS BIGINT) AS n_only_primary,
       CAST(0 AS BIGINT) AS n_only_replica
FROM v3
GROUP BY status
ORDER BY status
"""


@query("acid_cdc_apply_replica", oracle=_CDC_APPLY_ORACLE)
def acid_cdc_apply_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the CDC loop: a REPLICA table is synchronized from the
    primary using ONLY the classified change set — upserts applied via
    MERGE, deletes via the key-frame merge-on-read delete
    (``delete_mor_keys``, the consumer API a replication job actually
    has: keys, not predicates). The primary runs UPDATE -> DELETE ->
    MERGE-insert; the change set is the v0-vs-latest diff (same
    co-partitioned full-outer join as acid_cdc_changes); the replica
    starts at v0 and applies the stream. Output: the replica's final
    per-status state (the oracle recomputes it independently) plus
    two anti-join counts against the primary that must both be ZERO —
    a replica that drifted by one row in either direction fails the
    value hash. At 100 TB this is the replication shape: the replica
    moves |changes| data, never |table|."""
    base = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2500).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    ppath = os.path.join(_scratch(), "orders_cdcsrc")
    rpath = os.path.join(_scratch(), "orders_cdcdst")
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

    old = primary.read(version=0).select(
        F.col("o_orderkey").alias("k"),
        F.col("status").alias("s_old"),
        F.col("price").alias("p_old"),
    )
    new = primary.read().select(
        F.col("o_orderkey").alias("k"),
        F.col("status").alias("s_new"),
        F.col("price").alias("p_new"),
    )
    diff = old.join(new, "k", "full_outer").where(
        F.col("s_old").isNull()
        | F.col("s_new").isNull()
        | (F.col("s_old") != F.col("s_new"))
        | (F.col("p_old") != F.col("p_new"))
    )
    upserts = diff.where(F.col("s_new").isNotNull()).select(
        F.col("k").alias("o_orderkey"),
        F.col("s_new").alias("status"),
        F.col("p_new").alias("price"),
    )
    deleted_keys = diff.where(F.col("s_new").isNull()).select(
        F.col("k").alias("o_orderkey")
    )

    replica = SnapshotTable.create(
        spark, rpath, primary.read(version=0), key_col="o_orderkey"
    )
    replica.merge(upserts, update_cols=["status", "price"])
    replica.delete_mor_keys(deleted_keys)

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


# ---------------------------------------------------------------------------
# registered query: NOTIFICATION LOG analog — poll change events from offset
# ---------------------------------------------------------------------------

_EVENT_LOG_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 4000
),
v2 AS (SELECT k FROM base WHERE k % 7 <> 0),
v3 AS (SELECT k FROM v2 WHERE k % 5 <> 0)
SELECT CAST(event_id AS BIGINT) AS event_id, event_type, op,
       has_delete_deltas, CAST(n_rows_visible AS BIGINT) AS n_rows_visible
FROM (
  SELECT 2 AS event_id, 'COMMIT_TXN' AS event_type, 'delete' AS op,
         FALSE AS has_delete_deltas, (SELECT COUNT(*) FROM v2) AS n_rows_visible
  UNION ALL
  SELECT 3, 'COMMIT_TXN', 'delete.mor', TRUE, (SELECT COUNT(*) FROM v3)
  UNION ALL
  SELECT 4, 'COMMIT_TXN', 'compact', FALSE, (SELECT COUNT(*) FROM v3)
)
ORDER BY event_id
"""


def _event_log_table(
    spark: SparkSession, sf_dir: str, path: str
) -> SnapshotTable:
    """Run the known DML sequence (create -> update -> COW delete ->
    MOR delete -> compact) that both notification-log consumers poll:
    the batch ``acid_event_log`` and the streaming
    ``stream_event_log_consume`` share this builder so their event
    streams are the same by construction."""
    base = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 4000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    t = SnapshotTable.create(spark, path, base, key_col="k")
    t.update(F.col("k") % 3 == 0, {"status": F.lit("U")})
    t.delete(F.col("k") % 7 == 0)
    t.delete_mor(F.col("k") % 5 == 0)
    t.compact()
    return t


@query("acid_event_log", oracle=_EVENT_LOG_ORACLE)
def acid_event_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metastore NOTIFICATION-LOG analog — the consumer-side polling
    contract of the reference's replication event stream
    (hive-metastore ``get_next_notification(last_event_id)`` /
    ``get_current_notificationEventId``; SURVEY.md §3.3, the last
    metastore API group without an analog). The commit log IS the
    event log: every published manifest is one totally-ordered event
    (event_id = snapshot version), so a replication consumer polls
    "events after N" exactly as Hive's NotificationLog consumers do.
    This query runs the known DML sequence (create -> update -> COW
    delete -> MOR delete -> compact), then serves the poll
    ``last_event_id = 1``: events 2..4 with Hive-style event types
    (v0 would be CREATE_TABLE; committed DML is COMMIT_TXN), the op
    payload, the pending-delta flag (what a downstream compactor or
    replica keys on), and the row count visible at that event's
    snapshot — the oracle recomputes every count from the same
    predicate algebra, so the event payloads are value-checked, not
    shape-checked. Scale: the event list is built from O(versions)
    manifest JSONs — a pure metadata pass, no data scan; only the
    per-event visible-count audit reads data, and a production
    consumer would skip it (documented, test-scale-only audit)."""
    path = os.path.join(_scratch(), "orders_events")
    t = _event_log_table(spark, sf_dir, path)

    last_event_id = 1  # the consumer's stored offset
    out = None
    for m in t.history():
        v = m["version"]
        if v <= last_event_id:
            continue
        # always a commit: v <= last_event_id (incl. v0 CREATE_TABLE)
        # was skipped above (round-13 review: dead v==0 branch)
        event_type = "COMMIT_TXN"
        frame = (
            t.read(version=v)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows_visible"))
            .select(
                F.lit(v).cast("bigint").alias("event_id"),
                F.lit(event_type).alias("event_type"),
                F.lit(m["op"]).alias("op"),
                F.lit(bool(m.get("deletes"))).alias("has_delete_deltas"),
                "n_rows_visible",
            )
        )
        out = frame if out is None else out.unionByName(frame)
    return out.orderBy("event_id")


# ---------------------------------------------------------------------------
# registered query: fat-finger damage -> RESTORE rollback, drift-proven
# ---------------------------------------------------------------------------

_RESTORE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderkey < 2500
),
damaged AS (  -- v1: bad DELETE, v2: bad UPDATE on the survivors
  SELECT o_orderkey,
         CASE WHEN status = 'O' THEN 'X' ELSE status END AS status,
         price
  FROM base WHERE price >= 100000
)
SELECT 'damaged_v2' AS stage, COUNT(*) AS n_rows,
       ROUND(SUM(price), 2) AS total_price,
       CAST(0 AS BIGINT) AS drift_rows
FROM damaged
UNION ALL
SELECT 'restored_v3', COUNT(*), ROUND(SUM(price), 2), CAST(0 AS BIGINT)
FROM base
ORDER BY stage
"""


@query("acid_restore_rollback", oracle=_RESTORE_ORACLE)
def acid_restore_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recovery drill every versioned store exists for: a bad
    DELETE (v1) followed by a bad UPDATE (v2) are rolled back by
    RESTORE to v0 — published as a NEW version (v3), never by
    rewriting history. The output aggregates the damaged v2 state AND
    the restored v3 state; the oracle recomputes both purely in SQL
    from the base table. drift_rows is the stronger claim: the Spark
    side computes |v3 ⊖ v0| + |v0 ⊖ v3| (exceptAll both ways — exact
    multiset difference) and must land on the oracle's literal 0, so
    the hash check proves the restore is BIT-IDENTICAL row content,
    not merely aggregate-equal. Restore itself is O(manifest) — no
    data is copied at any table size — and the damaged versions stay
    time-travelable for audit."""
    path = os.path.join(_scratch(), "orders_restore")
    base = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 2500)
        .select(
            "o_orderkey",
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
    )
    t = SnapshotTable.create(spark, path, base, key_col="o_orderkey")
    t.delete(F.col("price") < 100000)  # v1: the fat-finger delete
    t.update(F.col("status") == "O", {"status": F.lit("X")})  # v2
    damaged = t.read()
    t.restore(0)  # v3 = v0's manifest republished
    restored = t.read()
    v0 = t.read(version=0)
    drift = (
        restored.exceptAll(v0).count() + v0.exceptAll(restored).count()
    )

    def agg(df: DataFrame, tag: str, drift_rows: int) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("price"), 2).alias("total_price"),
        ).select(
            F.lit(tag).alias("stage"),
            "n_rows",
            "total_price",
            F.lit(drift_rows).cast("bigint").alias("drift_rows"),
        )

    return (
        agg(damaged, "damaged_v2", 0)
        .unionByName(agg(restored, "restored_v3", drift))
        .orderBy("stage")
    )
