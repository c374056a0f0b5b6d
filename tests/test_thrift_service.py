"""HiveServer2 protocol parity — the reference's front door, live.

The reference IS HiveServer2: its Thrift API (TCLIService, 25 ops —
SURVEY.md §3.1) is the service surface everything else sits behind.
Spark ships the same protocol as the Spark Thrift Server
(spark-hive-thriftserver), and this container's beeline is *Hive
2.3.10's own JDBC client* — the exact client the reference serves. So
this test is a true end-to-end protocol check: OpenSession →
ExecuteStatement → FetchResults over Thrift/TCP, results matching a
direct in-process computation.

Skipped (not failed) if beeline is missing or the port can't bind —
environment constraints, not engine defects.
"""

from __future__ import annotations

import re
import shutil
import socket
import subprocess

import pytest

from tests.conftest import SF_DIR

BEELINE = shutil.which("beeline") or "/opt/spark-4.1.2-bin-hadoop3/bin/beeline"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def thrift_port(spark):
    import os

    if not os.path.exists(BEELINE):
        pytest.skip("beeline not available")
    port = _free_port()
    spark.conf.set("hive.server2.thrift.port", str(port))
    try:
        server = (
            spark._jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
            .startWithContext(spark._jsparkSession.sqlContext())
        )
    except Exception as exc:  # pragma: no cover - env-specific
        pytest.skip(f"cannot start thrift server: {exc}")
    yield port
    server.stop()


def _beeline(port: int, sql: str) -> str:
    r = subprocess.run(
        [
            BEELINE,
            "-u",
            f"jdbc:hive2://localhost:{port}",
            "-e",
            sql,
            "--outputformat=csv2",
            "--silent=true",
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert r.returncode == 0, f"beeline failed: {r.stderr[-500:]}"
    return r.stdout


def test_execute_statement_scalar(thrift_port):
    out = _beeline(thrift_port, "SELECT 41 + 1 AS answer")
    assert "42" in out


def test_execute_statement_aggregate_matches_direct(spark, thrift_port):
    # JDBC sessions are isolated from our SparkSession's temp views
    # (singleSession=false, the HS2 default) — query the parquet file
    # directly, exactly as an external BI client would.
    sql = (
        "SELECT n_regionkey, COUNT(*) AS n FROM "
        f"parquet.`{SF_DIR}/nation.parquet` "
        "GROUP BY n_regionkey ORDER BY n_regionkey"
    )
    out = _beeline(thrift_port, sql)
    direct = {(r[0], r[1]) for r in spark.sql(sql).collect()}
    # beeline 2.3.10 renders a +---+ table regardless of --outputformat
    # position; accept both table and csv2 row shapes.
    served = set()
    for line in out.splitlines():
        m = re.match(r"^\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|\s*$", line)
        if not m:
            m = re.match(r"^(\d+),(\d+)$", line.strip())
        if m:
            served.add((int(m.group(1)), int(m.group(2))))
    assert served == direct, f"thrift results {served} != direct {direct}"
