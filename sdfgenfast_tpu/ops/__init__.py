from . import band, dense, df, geometry, sign, sign_host, sweep, tiled, vdt  # noqa: F401
