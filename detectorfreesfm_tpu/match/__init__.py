from .pairs import (  # noqa: F401
    exhaustive_pairs,
    read_pairs_txt,
    sequential_pairs,
    write_pairs_txt,
)
