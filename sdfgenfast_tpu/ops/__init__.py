from . import band, df, geometry, jfa, sign, sign_host, sweep  # noqa: F401
