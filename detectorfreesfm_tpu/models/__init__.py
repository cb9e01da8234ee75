from . import backbone, loftr, position_encoding, transformer  # noqa: F401
