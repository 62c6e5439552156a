from .layout import write_zordered, zorder_key
from .parquet import (
    TABLES,
    compact,
    load_table,
    load_tables,
    overwrite_partitions,
    register_views,
    write_bucketed,
    write_table,
)

__all__ = [
    "TABLES",
    "compact",
    "load_table",
    "load_tables",
    "overwrite_partitions",
    "register_views",
    "write_bucketed",
    "write_table",
    "write_zordered",
    "zorder_key",
]
