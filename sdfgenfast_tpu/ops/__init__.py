from . import band, df, geometry, sign, sweep  # noqa: F401
