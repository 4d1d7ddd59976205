from . import band, dense, df, geometry, jfa, sign, sign_host, sweep  # noqa: F401
