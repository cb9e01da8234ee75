from .mesh import (  # noqa: F401
    get_mesh,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_leading_axis,
)
