from .catalog import oracle_sql, queries, register, tables

__all__ = ["oracle_sql", "queries", "register", "tables"]
