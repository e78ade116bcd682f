"""Oracle-checked query suite. Import via registry.all_queries()."""

from pontem_spark.queries.registry import all_queries, oracle_sqls, query_fns, register

__all__ = ["all_queries", "oracle_sqls", "query_fns", "register"]
