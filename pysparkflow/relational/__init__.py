from pysparkflow.relational.registry import ORACLE_SQL, QUERIES, load_table

__all__ = ["QUERIES", "ORACLE_SQL", "load_table"]
