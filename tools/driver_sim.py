"""Simulate the driver's verify: smoke entry() + oracle cross-check.

Deliberately uses a PLAIN SparkSession (driver-like defaults, none of
our session.py tuning) so we catch anything that only works under our
own config. Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        cells = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            cells.append(repr(v))
        out.append("|".join(cells))
    out.sort()
    return hashlib.sha256("\n".join(out).encode()).hexdigest()[:16]


def main():
    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    t0 = time.time()
    rows = e.entry(spark).collect()
    print(f"entry: {len(rows)} rows in {time.time()-t0:.1f}s schema_ok={len(rows[0]) == 10}")
    assert len(rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        sdf = fn(spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name}: rows-only n={len(srows)} ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        rel = con.execute(oracles[name])
        dcols = [c[0] for c in rel.description]
        drows = rel.fetchall()
        ok = (
            len(srows) == len(drows)
            and sorted(scols) == sorted(dcols)
            and canon(scols, srows) == canon(dcols, drows)
        )
        n_pass += ok
        n_fail += not ok
        status = "OK " if ok else "FAIL"
        print(f"  {name}: {status} n={len(srows)} ({time.time()-t0:.1f}s)")
        if not ok:
            print(f"    spark cols={sorted(scols)} n={len(srows)}")
            print(f"    duck  cols={sorted(dcols)} n={len(drows)}")
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_rowsonly}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
