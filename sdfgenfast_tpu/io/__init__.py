from . import mesh_io, sdf_io  # noqa: F401
