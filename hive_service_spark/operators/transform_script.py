"""TRANSFORM ... USING 'script' — the reference's ScriptOperator.

Hive pipes rows through an external process (ScriptOperator, 20,053 B —
SURVEY.md §2.1); Spark SQL supports the same `SELECT TRANSFORM`
syntax natively. No-serde mode uses HIVE'S default row format — fields
delimited by \\x01 (^A), rows by newline — NOT tabs (verified by
hex-dumping the child's stdin; a tab-splitting script sees one giant
field and dies). The script is materialized under the repo scratch dir
at query time so the query stays self-contained.

Scale notes: each task pipes its partition through one child process —
the same fan-out as Hive's script operator; prefer mapInPandas (Arrow)
for new code, TRANSFORM exists for HiveQL compatibility.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from hive_service_spark.catalog import register_views
from hive_service_spark.registry import query

_SCRIPT = r"""#!/usr/bin/env python3
import sys

SEP = "\x01"  # Hive default field delimiter in no-serde TRANSFORM
for line in sys.stdin:
    event_type, user_id = line.rstrip("\n").split(SEP)
    print(f"{event_type.upper()}{SEP}{int(user_id) * 2 + 1}")
"""

_TRANSFORM_ORACLE = """
SELECT event_type_u, COUNT(*) AS n, CAST(SUM(uid2) AS BIGINT) AS uid2_sum
FROM (
  SELECT upper(event_type) AS event_type_u, user_id * 2 + 1 AS uid2
  FROM events
)
GROUP BY event_type_u
ORDER BY event_type_u
"""


@query("transform_script_pipe", oracle=_TRANSFORM_ORACLE)
def transform_script_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT TRANSFORM(...) USING an external python script
    (integer-only arithmetic so the text round-trip is exact), then
    aggregate the script output. The oracle recomputes the script's
    transformation in SQL."""
    script_path = Path("/root/repo/.scratch/transform_upper.py")
    script_path.parent.mkdir(parents=True, exist_ok=True)
    script_path.write_text(_SCRIPT)
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT event_type_u, COUNT(*) AS n, CAST(SUM(uid2) AS BIGINT) AS uid2_sum
        FROM (
          SELECT TRANSFORM(event_type, user_id)
            USING 'python3 {script_path}'
            AS (event_type_u STRING, uid2 BIGINT)
          FROM events
        )
        GROUP BY event_type_u
        ORDER BY event_type_u
        """
    )
