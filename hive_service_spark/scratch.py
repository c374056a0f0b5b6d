"""Per-process scratch-directory management.

Several query families stage data on local disk inside the query
(format round-trips, streaming checkpoints, foreachBatch sink targets,
snapshot stores). That state is mutable and owned by ONE run — sharing
a fixed path across concurrently-running processes (pytest alongside
the driver, two driver invocations) lets one process overwrite or
rmtree files the other is mid-read on. Every such path therefore lives
under a per-pid namespace from :func:`pid_dir`; namespaces left behind
by dead processes are reaped lazily.

This mirrors what the reference does with per-session scratchdirs
(hive.exec.scratchdir gets a session-id subdirectory); on a cluster the
analogous staging goes to per-application HDFS/S3 temp prefixes, which
Spark already namespaces by application id.
"""

from __future__ import annotations

import os
import shutil
import threading
from pathlib import Path

# r13 (guide §6 + session.py's spark.local.dir rationale): scratch
# staging prefers RAM-backed tmpfs when available — this host's shared
# disk shows multi-second I/O jitter that hit every scratch-writing
# query (the bucketed LSH index build, format round-trips, streaming
# checkpoints) with the same variance session.py measured for shuffle
# spill. Overridable via SPARK_GRAFT_SCRATCH_DIR; falls back to the
# repo-local directory when /dev/shm is absent. A real cluster stages
# this on per-application HDFS/S3 temp prefixes (module docstring).
#
# r14 (ADVICE + verdict what's-wrong #2):
# - the default is PER-UID (…-<uid>): the old world-shared path was
#   created 0755 by its first owner, so a second uid's makedirs failed;
# - tmpfs is RAM (typically capped at 50% of it) and now holds
#   full-table parquet staging — the free-space guard below routes
#   scratch back to the repo disk when /dev/shm has less headroom than
#   _TMPFS_MIN_FREE, instead of letting a corpus-sized CTAS fill RAM
#   and destabilize the box. Set SPARK_GRAFT_SCRATCH_DIR explicitly to
#   pin either location.
_TMPFS_MIN_FREE = 8 << 30  # bytes


def _default_root() -> str:
    if os.path.isdir("/dev/shm"):
        try:
            if shutil.disk_usage("/dev/shm").free >= _TMPFS_MIN_FREE:
                return f"/dev/shm/spark-graft-scratch-{os.getuid()}"
        except OSError:
            pass
    return "/root/repo/.scratch"


SCRATCH_ROOT = os.environ.get("SPARK_GRAFT_SCRATCH_DIR") or _default_root()

# prefixes of per-process namespaces this module manages (r14 adds
# acid-/mv-: the last two operator families carrying their own fixed
# repo-disk scratch constants moved onto this discipline)
_NS_PREFIXES = ("proc-", "src-", "wh-", "acid-", "mv-")

_reaped = False


def _reap_dead_namespaces() -> None:
    """Remove scratch namespaces whose owning process is gone."""
    global _reaped
    if _reaped:
        return
    _reaped = True
    root = Path(SCRATCH_ROOT)
    if not root.is_dir():
        return
    for d in root.iterdir():
        if not d.is_dir():
            continue
        for prefix in _NS_PREFIXES:
            if d.name.startswith(prefix):
                break
        else:
            continue
        try:
            pid = int(d.name.rsplit("-", 1)[1])
        except (ValueError, IndexError):
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # liveness probe, no signal delivered
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass  # alive under another uid — leave it


def pid_dir(kind: str = "proc") -> str:
    """Per-process scratch namespace ``.scratch/<kind>-<pid>``."""
    _reap_dead_namespaces()
    path = f"{SCRATCH_ROOT}/{kind}-{os.getpid()}"
    os.makedirs(path, exist_ok=True)
    return path


def warehouse_dir() -> str:
    """Per-process location for the ``hs_scratch`` managed database.

    r13: the warehouse used to be ONE shared fixed path — the only
    scratch surface outside the per-pid discipline this module exists
    for — so pytest running alongside a driver sweep could rmtree /
    CTAS the same managed-table directory mid-read and fail with
    LOCATION_ALREADY_EXISTS (the race source_queries' per-pid table
    names already worked around locally). Every
    ``CREATE DATABASE hs_scratch`` site now points here instead; each
    process's in-memory catalog maps the database to its own
    namespace, and dead namespaces reap like any other."""
    return pid_dir("wh")


def atomic_copy(src: str | os.PathLike, dst: str | os.PathLike) -> None:
    """Copy ``src`` to ``dst`` so a concurrent reader of ``dst`` never
    sees a torn file: copy to a per-pid temp name in the same directory
    then atomically rename over the target."""
    dst = Path(dst)
    # pid AND thread id: two threads of one process staging the same
    # target concurrently must not share the temp path, or one's
    # os.replace races the other's copy (round-3 advice — the same
    # collision acid_snapshots' manifest publish fixed)
    tmp = dst.with_name(
        f".{dst.name}.{os.getpid()}-{threading.get_ident()}.tmp"
    )
    shutil.copyfile(src, tmp)
    os.replace(tmp, dst)


def stage_text(content: str, name: str, kind: str = "proc") -> Path:
    """Materialize ``content`` as ``.scratch/<kind>-<pid>/<name>`` and
    return the path. The write goes through a pid+tid-unique temp name
    plus ``os.replace`` so a concurrent reader (e.g. a Spark task
    exec'ing a TRANSFORM script) never sees a torn file — the same
    discipline as :func:`atomic_copy`. The pid namespace keeps two
    driver processes staging the same script name from racing each
    other (round-5 advice: the TRANSFORM queries wrote fixed paths)."""
    dst = Path(pid_dir(kind)) / name
    tmp = dst.with_name(
        f".{dst.name}.{os.getpid()}-{threading.get_ident()}.tmp"
    )
    tmp.write_text(content)
    os.replace(tmp, dst)
    return dst


def stage_source(src: str | os.PathLike, stage_dir: str | os.PathLike) -> Path:
    """Stage ``src`` into ``stage_dir`` (the landing directory a file
    stream monitors), re-copying whenever the SOURCE changed. Staleness
    is judged against a recorded (size, mtime_ns) fingerprint of the
    source — not "dst older than src", which misses a regenerated
    source with identical size and a non-newer mtime (mtime-preserving
    copy). Shared by the events and documents stream stagers so the
    staleness rules can't drift between them. Returns the staged path."""
    src = Path(src)
    stage_dir = Path(stage_dir)
    stage_dir.mkdir(parents=True, exist_ok=True)
    dst = stage_dir / src.name
    meta = dst.with_name(f".{dst.name}.srcmeta")
    st = src.stat()
    fingerprint = f"{st.st_size}:{st.st_mtime_ns}"
    recorded = meta.read_text() if meta.exists() else None
    if not dst.exists() or recorded != fingerprint:
        atomic_copy(src, dst)
        tmp = meta.with_name(
            f"{meta.name}.{os.getpid()}-{threading.get_ident()}.tmp"
        )
        tmp.write_text(fingerprint)
        os.replace(tmp, meta)
    return dst
