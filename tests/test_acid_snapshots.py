"""Snapshot-versioned COW DML: merge -> update -> delete -> time travel.

Value-checks every version of the commit log, verifies copy-on-write
actually carries unaffected bucket files by reference, and checks
manifest atomicity basics. The registered query
``acid_merge_time_travel`` cross-checks the same algebra against
DuckDB; this test exercises the storage-layer guarantees the oracle
can't see (per-version content, file reuse, history).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from hive_service_spark.operators.acid_snapshots import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, "A" if i % 2 else "B", float(i * 100)) for i in range(1, 21)],
        "k long, status string, price double",
    )
    return SnapshotTable.create(
        spark, str(tmp_path / "t"), base, key_col="k", n_buckets=4
    )


def test_lifecycle_values(spark, table):
    # v1: MERGE — reprice k<=3, insert k=99
    src = spark.createDataFrame(
        [(1, "A", 111.0), (2, "B", 222.0), (3, "A", 333.0), (99, "Z", 999.0)],
        "k long, status string, price double",
    )
    assert table.merge(src, update_cols=["status", "price"]) == 1
    got = {r["k"]: (r["status"], r["price"]) for r in table.read().collect()}
    assert got[1] == ("A", 111.0) and got[2] == ("B", 222.0)
    assert got[99] == ("Z", 999.0) and len(got) == 21
    assert got[10] == ("B", 1000.0)  # untouched row intact

    # v2: UPDATE — status B -> C where price > 500
    assert table.update(
        (F.col("status") == "B") & (F.col("price") > 500),
        {"status": F.lit("C")},
    ) == 2
    got = {r["k"]: r["status"] for r in table.read().collect()}
    assert got[6] == "C" and got[4] == "B" and got[2] == "B"  # 222 < 500

    # v3: DELETE — price < 300
    assert table.delete(F.col("price") < 300) == 3
    ks = {r["k"] for r in table.read().collect()}
    assert 1 not in ks and 2 not in ks and 3 in ks and 99 in ks

    # time travel: every version still reads its exact snapshot
    assert table.read(version=0).count() == 20
    assert table.read(version=1).count() == 21
    v1 = {r["k"]: r["price"] for r in table.read(version=1).collect()}
    assert v1[1] == 111.0 and v1[10] == 1000.0
    assert table.read(version=3).count() == len(ks)

    ops = [m["op"] for m in table.history()]
    assert ops == ["create", "merge", "update", "delete"]


def test_copy_on_write_carries_unaffected_buckets(spark, table):
    # one-key merge touches exactly one bucket; the other bucket dirs
    # must be carried into the new manifest BY REFERENCE (same reldir)
    src = spark.createDataFrame([(1, "A", 1.0)], "k long, status string, price double")
    table.merge(src, update_cols=["status", "price"])
    m0, m1 = table.history()
    changed = [b for b in m1["buckets"] if m1["buckets"][b] != m0["buckets"][b]]
    carried = [b for b in m1["buckets"] if m1["buckets"][b] == m0["buckets"][b]]
    assert len(changed) == 1 and len(carried) == len(m0["buckets"]) - 1
    # published files are immutable: v0 dirs still exist and still read
    for rel in m0["buckets"].values():
        assert os.path.isdir(os.path.join(table.path, rel))
    assert table.read(version=0).count() == 20


def test_delete_everything_then_history(spark, table):
    table.delete(F.lit(True))
    assert table.read().count() == 0
    assert table.read(version=0).count() == 20
