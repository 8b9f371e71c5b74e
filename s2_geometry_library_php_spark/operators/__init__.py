from .spatial_join import build_covering_table, spatial_join  # noqa: F401
from .tiling import tile_aggregate, tile_rollup, tile_polygons  # noqa: F401
from .knn import knn_join  # noqa: F401
