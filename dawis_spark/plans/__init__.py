from dawis_spark.plans.sql_runner import run_query, resolve_parameters  # noqa: F401
from dawis_spark.plans.column_mapping import apply_column_mapping  # noqa: F401
