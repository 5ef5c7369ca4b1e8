from .tables import (  # noqa: F401
    TABLES,
    load_table,
    load_table_parallel,
    normalize_events_ts,
    register_views,
)
