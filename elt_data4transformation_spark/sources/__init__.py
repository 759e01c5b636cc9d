from .tables import TABLES, load_tables, spread, table

__all__ = ["TABLES", "load_tables", "spread", "table"]
