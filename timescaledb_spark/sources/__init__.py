from .copy import copy_into, read_csv, read_json  # noqa: F401
from .testdata import load_stream, load_table, register_views  # noqa: F401
