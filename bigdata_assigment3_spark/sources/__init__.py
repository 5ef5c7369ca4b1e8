from .tables import TABLES, load_table, normalize_events_ts, register_views  # noqa: F401
