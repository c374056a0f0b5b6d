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

_SCRATCH = "/root/repo/.scratch/acid"


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

    def _commit(self, op: str, buckets: dict[int, str]) -> int:
        vs = self._versions()
        v = (vs[-1] + 1) if vs else 0
        os.makedirs(self._log_dir(), exist_ok=True)
        manifest = {
            "version": v,
            "op": op,
            "buckets": {str(b): rel for b, rel in sorted(buckets.items())},
        }
        tmp = os.path.join(self._log_dir(), f".{v:08d}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        # atomic publish: a manifest is either fully visible or absent
        os.replace(tmp, os.path.join(self._log_dir(), f"{v:08d}.json"))
        return v

    # -- physical io --------------------------------------------------------

    def _bucket_of(self, col: Column) -> Column:
        return F.pmod(F.hash(col), F.lit(self.n_buckets))

    def _write_buckets(self, df: DataFrame, version: int, bucket_ids) -> dict[int, str]:
        """Write df's rows (already restricted to bucket_ids) out as one
        immutable dir per bucket; returns {bucket: reldir}."""
        out: dict[int, str] = {}
        tagged = df.withColumn("_b", self._bucket_of(F.col(self.key)))
        for b in bucket_ids:
            rel = f"data/v{version}-b{b}"
            (
                tagged.where(F.col("_b") == b)
                .drop("_b")
                .write.mode("overwrite")
                .parquet(os.path.join(self.path, rel))
            )
            out[b] = rel
        return out

    def read(self, version: int | None = None) -> DataFrame:
        """Read a snapshot (latest, or time-travel to ``version``)."""
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        v = vs[-1] if version is None else version
        m = self._manifest(v)
        paths = [os.path.join(self.path, rel) for rel in m["buckets"].values()]
        return self.spark.read.parquet(*paths)

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
        (current-bucket-rows -> new-bucket-rows), carry the rest."""
        vs = self._versions()
        cur = self._manifest(vs[-1])
        v = vs[-1] + 1
        carried = {
            int(b): rel
            for b, rel in cur["buckets"].items()
            if int(b) not in bucket_ids
        }
        if bucket_ids:
            affected_paths = [
                os.path.join(self.path, cur["buckets"][str(b)])
                for b in bucket_ids
            ]
            current = self.spark.read.parquet(*affected_paths)
            rewritten = self._write_buckets(new_rows_fn(current), v, bucket_ids)
        else:
            rewritten = {}
        return self._commit(op, {**carried, **rewritten})

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
    path = os.path.join(_SCRATCH, f"orders_lc_{os.getpid()}")
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
