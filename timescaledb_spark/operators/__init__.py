from .asof import asof_join  # noqa: F401
from .gapfill import interpolate, locf, time_bucket_gapfill  # noqa: F401
from .rangejoin import range_join  # noqa: F401
from .recursive import recursive_union  # noqa: F401
