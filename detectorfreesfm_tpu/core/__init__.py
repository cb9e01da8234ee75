from . import geometry, epipolar, triangulation  # noqa: F401
