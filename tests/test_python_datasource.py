"""Python Data Source API (sources/python_datasource.py): the
user-defined fixed-width reader — values are oracle-checked by
source_python_datasource; these pin the split parallelism and the
filter pushdown the scale story depends on."""

from __future__ import annotations

from hive_service_spark.registry import load_all
from tests.conftest import SF_DIR

_SPECS = load_all()


def test_status_filter_pushed_into_python_source(spark):
    """pushFilters accepted EqualTo(o_orderstatus,'F'): the post-scan
    Filter must retain only the isnotnull residual — the equality
    executes inside the Python reader (rows skipped at parse time),
    the Python-source analog of parquet PushedFilters."""
    df = _SPECS["source_python_datasource"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan fixedwidth" in plan, plan[:2000]
    filter_lines = [l for l in plan.splitlines() if "Filter " in l]
    assert all("= F" not in l for l in filter_lines), filter_lines


def test_one_partition_per_file(spark):
    """The reader enumerates one InputPartition per data file, so the
    4-file layout scans as 4 parallel tasks — a real InputFormat
    split, not a single-threaded Python loop."""
    df = _SPECS["source_python_datasource"].fn(spark, SF_DIR)
    # count the scan's partitions via the RDD of the raw read
    import hive_service_spark.sources.python_datasource as pds
    from hive_service_spark.scratch import pid_dir

    raw = (
        spark.read.format("fixedwidth")
        .option("path", f"{pid_dir('pyds')}/orders_fixedwidth")
        .load()
    )
    assert raw.rdd.getNumPartitions() == 4


def test_docstream_cache_invalidates_on_same_tick_rewrite(tmp_path):
    """The per-worker sorted-table cache must serve the NEW rows after
    the backing parquet is rewritten in place — even when the rewrite
    lands within one mtime tick (round-5 advice: a (path, float-mtime)
    key served stale slices on coarse-granularity filesystems). The
    key is (path, st_mtime_ns, st_size); pinning the mtime back to the
    original value makes size the only discriminator, the worst case."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_service_spark.sources.python_datasource import (
        _docstream_sorted_table,
    )

    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {"doc_id": [2, 1], "lang": ["en", "de"], "n_chars": [5, 6]}
        ),
        p,
    )
    st0 = p.stat()
    assert _docstream_sorted_table(str(p)).column("doc_id").to_pylist() == [
        1,
        2,
    ]
    # in-place rewrite, mtime pinned to the pre-rewrite value: the
    # same-tick scenario a float-mtime key cannot distinguish
    pq.write_table(
        pa.table(
            {
                "doc_id": [9, 3, 4],
                "lang": ["fr", "en", "de"],
                "n_chars": [1, 2, 3],
            }
        ),
        p,
    )
    os.utime(p, ns=(st0.st_atime_ns, st0.st_mtime_ns))
    assert p.stat().st_size != st0.st_size  # size is the discriminator
    assert _docstream_sorted_table(str(p)).column("doc_id").to_pylist() == [
        3,
        4,
        9,
    ]
