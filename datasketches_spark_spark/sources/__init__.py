from .tables import TABLE_NAMES, load_tables, read_table, session_builder

__all__ = ["read_table", "load_tables", "session_builder", "TABLE_NAMES"]
