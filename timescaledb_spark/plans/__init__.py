from .inspect import (
    broadcast_join_count,
    cartesian_count,
    pushed_filters,
    read_schema_columns,
    scanned_paths,
    shuffle_count,
)

__all__ = [
    "broadcast_join_count",
    "cartesian_count",
    "pushed_filters",
    "read_schema_columns",
    "scanned_paths",
    "shuffle_count",
]
