"""dawis_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mindshape-GmbH/dawis, re-expressed Spark-first.

The reference (see /root/reference, SURVEY.md) is a YAML-configured,
cron-scheduled SEO ETL/monitoring system: fetch -> stage -> enrich -> check
-> alert, with relational compute delegated to BigQuery. Here the same
semantics are declared as Spark DataFrame / SQL plans over day-partitioned
parquet tables, so Catalyst/Tungsten/AQE choose the physical strategy.

Layout:
  session     — SparkSession bootstrap tuned for local tests AND cluster scale
  catalog     — register parquet tables (testdata or warehouse) as views
  plans       — parameterized SQL runner, column mapping (nested renames)
  operators   — checks DSL, enrichment, dedup, similarity, windows, idempotent writes
  functions   — scalar/array helpers: urls, text, vectors, html (pandas UDFs)
  sources     — staging tables + connector harness (HTTP ingest stays OUT of the DAG)
  streaming   — alert queue, retry queue, watermark/processed-log semantics
  multimodal  — binary media columns: schema + mapInPandas plumbing (decode stubbed)
"""

__version__ = "0.1.0"

from dawis_spark.session import get_spark  # noqa: F401
