from .tables import (
    TABLE_NAMES,
    load_tables,
    read_csv,
    read_table,
    session_builder,
    write_summary,
)

__all__ = ["read_table", "read_csv", "load_tables", "session_builder",
           "write_summary", "TABLE_NAMES"]
