from .tables import TABLES, load_table, load_tables, union_tables

__all__ = ["TABLES", "load_table", "load_tables", "union_tables"]
