"""Sources: staging tables + the connector harness.

The reference's aggregation modules fetch from HTTP APIs inside the job
(S1-S8). Side-effecting I/O must stay OUT of Spark's lazy DAG (SURVEY
§7.5(1)): a retried/recomputed task would re-fetch. The harness fetches
eagerly (driver thread pool), lands rows via spark.createDataFrame with an
explicit schema, and the rest of the pipeline is pure.
"""
