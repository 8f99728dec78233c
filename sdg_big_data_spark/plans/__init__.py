from .catalog import REGISTRY, QuerySpec, oracle_sql, queries

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
