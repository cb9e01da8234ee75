from . import colmap_io, h5io, images  # noqa: F401
