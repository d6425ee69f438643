from .tables import TABLE_NAMES, load_table, load_tables, points_from_events, read_points_csv

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "points_from_events",
    "read_points_csv",
]
