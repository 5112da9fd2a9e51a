from .gapfill import interpolate, locf, time_bucket_gapfill  # noqa: F401
