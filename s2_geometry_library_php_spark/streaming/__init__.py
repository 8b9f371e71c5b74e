from .incremental_tiles import incremental_tile_stream  # noqa: F401
