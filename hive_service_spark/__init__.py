"""hive_service_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference (Apache Hive 2.3.10
HiveServer2 + ql engine; see SURVEY.md). Architecture:

- All relational operators are declared with the DataFrame / Spark SQL
  API and optimized by Catalyst + Tungsten (no custom executor).
- A thin HiveQL-compat function layer covers built-ins Spark lacks
  (see ``functions.hive_compat``).
- LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal plumbing) live under ``llm/`` and are designed
  shuffle-based for 100 TB scale (no driver-side collect loops).
"""

__version__ = "0.1.0"
