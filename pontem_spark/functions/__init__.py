"""Column-level function library (all JVM-side Column expressions, no UDFs)."""

from pontem_spark.functions import text, vector  # noqa: F401
