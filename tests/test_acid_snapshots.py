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


def test_mor_delete_leaves_base_untouched(spark, table):
    m0 = table.history()[-1]
    table.delete_mor(F.col("price") < 500)  # k 1..4
    m1 = table.history()[-1]
    # base bucket dirs are identical — only delete deltas were added
    assert m1["buckets"] == m0["buckets"]
    assert sum(len(r) for r in m1["deletes"].values()) >= 1
    ks = {r["k"] for r in table.read().collect()}
    assert ks == set(range(5, 21))
    # time travel to v0 still sees everything
    assert table.read(version=0).count() == 20


def test_cow_update_applies_pending_deltas(spark, table):
    table.delete_mor(F.col("k") == 7)
    # COW update rewrites buckets; the delta for k=7's bucket must be
    # folded in (row stays gone), not resurrected from the base file
    table.update(F.lit(True), {"price": F.col("price") + 1.0})
    got = {r["k"]: r["price"] for r in table.read().collect()}
    assert 7 not in got and got[8] == 801.0 and len(got) == 19
    # update touched every bucket, so no deltas remain
    assert table.history()[-1]["deletes"] == {}


def test_compactor_worker_and_initiator(spark, table):
    table.delete_mor(F.col("k") <= 2)
    table.delete_mor(F.col("k") == 20)
    before = table.read()
    rows_before = sorted(map(tuple, before.collect()))
    # initiator: below threshold -> no-op; at threshold -> compacts
    n_deltas = sum(len(r) for r in table.history()[-1]["deletes"].values())
    assert n_deltas >= 2
    assert table.maybe_compact(max_delete_deltas=n_deltas + 1) is False
    assert table.history()[-1]["op"] == "delete.mor"
    assert table.maybe_compact(max_delete_deltas=n_deltas) is True
    m = table.history()[-1]
    assert m["op"] == "compact" and m["deletes"] == {}
    # compaction preserved exact content
    assert sorted(map(tuple, table.read().collect())) == rows_before


def test_vacuum_cleaner_retention(spark, table):
    import os
    table.delete_mor(F.col("k") <= 5)
    table.compact()
    rows = sorted(map(tuple, table.read().collect()))
    removed = table.vacuum(retain_last=1)
    assert removed  # old base + delta dirs actually deleted
    for rel in removed:
        assert not os.path.isdir(os.path.join(table.path, rel))
    # latest still reads exactly; vacuumed versions are gone
    assert sorted(map(tuple, table.read().collect())) == rows
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        table.read(version=0)


def test_concurrent_writer_conflict(spark, table):
    from hive_service_spark.operators.acid_snapshots import (
        ConcurrentWriteConflict, SnapshotTable,
    )
    # writer B publishes v1 while writer A is still based on v0
    b = SnapshotTable(spark, table.path, key_col="k", n_buckets=4)
    b.delete(F.col("k") == 1)
    with pytest.raises(ConcurrentWriteConflict):
        table._commit("delete", {}, base_version=0)
    # loser retries from the new snapshot and succeeds
    v = table.delete(F.col("k") == 2)
    assert v == 2 and {r["k"] for r in table.read().collect()} == set(range(3, 21))


def test_two_thread_commit_race_one_aborts(spark, table):
    """A REAL two-thread race on the commit CAS: both writers read the
    same base snapshot, both compute their COW rewrite, and a barrier
    releases them into _commit for the same version slot at once.
    Exactly one os.link claims the slot; the other must abort with
    ConcurrentWriteConflict and succeed on retry — the reference's
    write-write conflict semantics (DbTxnManager abort + client retry)."""
    import threading

    from hive_service_spark.operators.acid_snapshots import (
        ConcurrentWriteConflict,
        SnapshotTable,
    )

    barrier = threading.Barrier(2, timeout=60)
    orig_commit = SnapshotTable._commit

    def racing_commit(self, *args, **kwargs):
        barrier.wait()  # both threads have read base v0 and computed
        return orig_commit(self, *args, **kwargs)

    outcomes: dict[str, object] = {}

    def writer(tag: str, table_obj, dml):
        try:
            outcomes[tag] = dml(table_obj)
        except ConcurrentWriteConflict:
            outcomes[tag] = "conflict"

    b = SnapshotTable(spark, table.path, key_col="k", n_buckets=4)
    try:
        SnapshotTable._commit = racing_commit
        t1 = threading.Thread(
            target=writer,
            args=("upd", table, lambda t: t.update(F.col("k") == 3,
                                                   {"status": F.lit("X")})),
        )
        t2 = threading.Thread(
            target=writer, args=("del", b, lambda t: t.delete(F.col("k") == 4))
        )
        t1.start(); t2.start(); t1.join(60); t2.join(60)
    finally:
        SnapshotTable._commit = orig_commit

    vals = sorted(str(v) for v in outcomes.values())
    assert vals == ["1", "conflict"], outcomes  # exactly one claimed v1

    # the loser retries from the fresh snapshot and lands v2; both
    # effects are present exactly once in the final state
    if outcomes["upd"] == "conflict":
        assert table.update(F.col("k") == 3, {"status": F.lit("X")}) == 2
    else:
        assert b.delete(F.col("k") == 4) == 2
    final = {r["k"]: r["status"] for r in table.read().collect()}
    assert final[3] == "X" and 4 not in final


def test_same_bucket_race_never_corrupts_winner(spark, table):
    """Round-3 advice: the commit CAS protects the manifest slot, but
    if racing writers shared PHYSICAL data paths, the loser's
    mode('overwrite') could clobber a bucket dir the winner's
    already-published manifest references. Data dirs are now
    writer-unique (pid-tid suffix), so this test forces BOTH writers
    onto the SAME bucket and asserts the winner's published v1 is
    byte-intact even while the loser races, then that the loser's
    retry lands cleanly on v2."""
    import threading

    from hive_service_spark.operators.acid_snapshots import (
        ConcurrentWriteConflict,
        SnapshotTable,
    )

    # pick two distinct keys that hash into the SAME bucket (n_buckets=4)
    rows = (
        spark.range(1, 21)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.hash(F.col("id")), F.lit(4)).alias("b"),
        )
        .collect()
    )
    by_bucket: dict[int, list[int]] = {}
    for r in rows:
        by_bucket.setdefault(r["b"], []).append(r["k"])
    k1, k2 = next(ks[:2] for ks in by_bucket.values() if len(ks) >= 2)

    barrier = threading.Barrier(2, timeout=60)
    orig_commit = SnapshotTable._commit

    def racing_commit(self, *args, **kwargs):
        # both writers have fully WRITTEN their rewritten bucket dirs
        # before either commits — the window where a shared path would
        # have let the loser overwrite the winner's files
        barrier.wait()
        return orig_commit(self, *args, **kwargs)

    outcomes: dict[str, object] = {}

    def writer(tag, tbl, dml):
        try:
            outcomes[tag] = dml(tbl)
        except ConcurrentWriteConflict:
            outcomes[tag] = "conflict"

    b = SnapshotTable(spark, table.path, key_col="k", n_buckets=4)
    try:
        SnapshotTable._commit = racing_commit
        t1 = threading.Thread(
            target=writer,
            args=("upd", table,
                  lambda t: t.update(F.col("k") == k1, {"status": F.lit("X")})),
        )
        t2 = threading.Thread(
            target=writer, args=("del", b, lambda t: t.delete(F.col("k") == k2))
        )
        t1.start(); t2.start(); t1.join(120); t2.join(120)
    finally:
        SnapshotTable._commit = orig_commit

    assert sorted(str(v) for v in outcomes.values()) == ["1", "conflict"]

    # the winner's published v1 must be complete and correct — 20 rows
    # (update) or 19 (delete), with ONLY the winner's effect applied
    v1 = {r["k"]: r["status"] for r in table.read(version=1).collect()}
    if outcomes["upd"] == 1:
        assert len(v1) == 20 and v1[k1] == "X" and k2 in v1
    else:
        assert len(v1) == 19 and k2 not in v1 and v1[k1] != "X"

    # loser retries cleanly onto v2; both effects now present
    if outcomes["upd"] == "conflict":
        assert table.update(F.col("k") == k1, {"status": F.lit("X")}) == 2
    else:
        assert b.delete(F.col("k") == k2) == 2
    final = {r["k"]: r["status"] for r in table.read().collect()}
    assert final[k1] == "X" and k2 not in final

    # and every dir any retained manifest references actually exists
    for m in table.history():
        for rel in list(m["buckets"].values()) + [
            r for rels in m.get("deletes", {}).values() for r in rels
        ]:
            assert os.path.isdir(os.path.join(table.path, rel)), rel


def _process_commit(path, tag, barrier, q):
    """Child-process writer: races _commit for the v1 slot.

    Runs in a FRESH OS process (spawn) with no JVM — _commit is pure
    os/json, so this exercises exactly the cross-process atomicity the
    os.link CAS claims. spark=None is safe: _commit never touches it.
    """
    from hive_service_spark.operators.acid_snapshots import (
        ConcurrentWriteConflict,
        SnapshotTable,
    )

    t = SnapshotTable(None, path, key_col="k", n_buckets=4)
    barrier.wait(timeout=60)
    try:
        v = t._commit(f"proc-{tag}", {}, base_version=0)
        q.put((tag, v))
    except ConcurrentWriteConflict:
        q.put((tag, "conflict"))


def test_cross_process_commit_race_one_aborts(spark, table):
    """TWO OS PROCESSES racing one version slot — the boundary the
    os.link CAS exists for (hard links are atomic-exclusive across
    processes at the filesystem level, unlike any in-process lock).
    Both children read base v0, a cross-process barrier releases them
    into _commit together; exactly one claims v1, the other must see
    ConcurrentWriteConflict, and the winner's published manifest is
    intact (parseable, correct version, the WINNER's op)."""
    import json as _json
    import multiprocessing as mp
    import os as _os

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(2, timeout=60)
    q = ctx.Queue()
    ps = [
        ctx.Process(target=_process_commit, args=(table.path, tag, barrier, q))
        for tag in ("a", "b")
    ]
    for p in ps:
        p.start()
    results = dict(q.get(timeout=120) for _ in ps)
    for p in ps:
        p.join(60)
        assert p.exitcode == 0

    vals = sorted(str(v) for v in results.values())
    assert vals == ["1", "conflict"], results
    winner = next(tag for tag, v in results.items() if v == 1)

    # winner's manifest is byte-intact and attributed to the winner;
    # no stray tmp files survive either writer's cleanup
    log_dir = _os.path.join(table.path, "_log")
    with open(_os.path.join(log_dir, "00000001.json")) as fh:
        m = _json.load(fh)
    assert m["version"] == 1 and m["op"] == f"proc-{winner}"
    assert not [f for f in _os.listdir(log_dir) if f.endswith(".tmp")]

    # the parent's table object, based on stale v0, must also conflict,
    # then succeed after re-reading the latest snapshot
    import pytest as _pytest

    from hive_service_spark.operators.acid_snapshots import (
        ConcurrentWriteConflict,
    )

    with _pytest.raises(ConcurrentWriteConflict):
        table._commit("late", {}, base_version=0)
    assert table._commit("late", {}, base_version=1) == 2


def test_restore_rollback_and_continue(spark, table):
    """RESTORE republishes an old manifest as a new version: content
    must be bit-identical to the target version, the damaged versions
    stay time-travelable, and normal DML continues on top."""
    table.delete(F.col("k") <= 10)  # v1
    table.update(F.col("status") == "A", {"status": F.lit("Z")})  # v2
    v = table.restore(0)  # v3
    assert v == 3
    v0 = table.read(version=0)
    now = table.read()
    assert now.exceptAll(v0).count() == 0
    assert v0.exceptAll(now).count() == 0
    # history intact: the bad delete is still visible at v1
    assert table.read(version=1).count() == 10
    # restore of a restore and further DML both work
    assert table.restore(2) == 4
    assert table.read().where(F.col("status") == "Z").count() == 5
    table.delete(F.col("k") > 15)  # v5 on top of the restored state
    assert table.read().count() == 5  # k in 11..15 survive


def test_restore_loses_to_concurrent_writer(spark, table):
    """restore goes through the same optimistic commit as any writer:
    if another writer claims the next version slot first, the restore
    must abort, not interleave."""
    from hive_service_spark.operators.acid_snapshots import (
        ConcurrentWriteConflict,
        SnapshotTable,
    )

    table.delete(F.col("k") <= 5)  # v1
    orig = SnapshotTable._commit

    def racing_commit(self, op, buckets, deletes=None, base_version=None):
        # disarm FIRST: the racing writer's own delete commits through
        # SnapshotTable._commit too, and must not re-enter this hook
        SnapshotTable._commit = orig
        # a concurrent writer publishes v2 just before our restore does
        b = SnapshotTable(spark, self.path, key_col="k", n_buckets=4)
        b.delete(F.col("k") == 20)
        return orig(self, op, buckets, deletes=deletes, base_version=base_version)

    SnapshotTable._commit = racing_commit
    try:
        with pytest.raises(ConcurrentWriteConflict):
            table.restore(0)
    finally:
        SnapshotTable._commit = orig
