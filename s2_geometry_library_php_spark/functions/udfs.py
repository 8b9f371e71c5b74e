"""Arrow-batched pandas UDFs wrapping the s2core numpy kernels.

These are the only JVM<->Python crossings in the engine; every kernel
is vectorized numpy over whole Arrow batches (no per-row Python, per
BASELINE.json input_hint).  uint64 cell ids are reinterpreted to int64
at the boundary (bit pattern, never value conversion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
)

from ..s2core import cellid as cid
from ..s2core import geom


@F.pandas_udf(LongType())
def s2_cell_id(lat: pd.Series, lng: pd.Series) -> pd.Series:
    """Leaf cell id from (lat, lng) degrees (S2CellId.php:99-106 chain)."""
    ids = cid.cell_id_from_latlng_degrees(
        lat.to_numpy(np.float64), lng.to_numpy(np.float64)
    )
    return pd.Series(cid.to_signed(ids))


@F.pandas_udf(StringType())
def s2_token_udf(cell_id: pd.Series) -> pd.Series:
    """UDF twin of the native-SQL token expression (API uniformity)."""
    ids = cid.from_signed(cell_id.to_numpy(np.int64))
    return pd.Series(cid.token_from_id(ids))


@F.pandas_udf(LongType())
def s2_id_from_token_udf(token: pd.Series) -> pd.Series:
    ids = cid.id_from_token(token.tolist())
    return pd.Series(cid.to_signed(ids))


@F.pandas_udf(DoubleType())
def s2_cell_center_lat(cell_id: pd.Series) -> pd.Series:
    ids = cid.from_signed(cell_id.to_numpy(np.int64))
    lat, _ = cid.cell_id_to_center_latlng(ids)
    return pd.Series(np.degrees(lat))


@F.pandas_udf(DoubleType())
def s2_cell_center_lng(cell_id: pd.Series) -> pd.Series:
    ids = cid.from_signed(cell_id.to_numpy(np.int64))
    _, lng = cid.cell_id_to_center_latlng(ids)
    return pd.Series(np.degrees(lng))


@F.pandas_udf(ArrayType(LongType()))
def s2_all_neighbors_udf(cell_id: pd.Series) -> pd.Series:
    """Same-level 8-ring (kNN ring expansion / union buffering)."""
    ids = cid.from_signed(cell_id.to_numpy(np.int64))
    if len(ids) == 0:
        return pd.Series([], dtype=object)
    ring = cid.to_signed(cid.all_neighbors(ids))
    return pd.Series([np.unique(row).tolist() for row in ring])


@F.pandas_udf(ArrayType(LongType()))
def s2_edge_neighbors_udf(cell_id: pd.Series) -> pd.Series:
    ids = cid.from_signed(cell_id.to_numpy(np.int64))
    if len(ids) == 0:
        return pd.Series([], dtype=object)
    ring = cid.to_signed(cid.edge_neighbors(ids))
    return pd.Series([row.tolist() for row in ring])


@F.pandas_udf(ArrayType(DoubleType()))
def s2_cell_vertices_udf(cell_id: pd.Series) -> pd.Series:
    """Tile polygon: [lat0,lng0,...,lat3,lng3] degrees, CCW
    (SW,SE,NE,NW; S2Cell.php:126-138) — the vector side of the
    raster<->vector tile materialization."""
    from ..s2core.cell import cell_vertices_latlng

    ids = cid.from_signed(cell_id.to_numpy(np.int64))
    if len(ids) == 0:
        return pd.Series([], dtype=object)
    verts = cell_vertices_latlng(ids)  # (n, 4, 2)
    flat = verts.reshape(len(ids), 8)
    return pd.Series([row.tolist() for row in flat])


@F.pandas_udf(DoubleType())
def s2_distance_rad(
    lat1: pd.Series, lng1: pd.Series, lat2: pd.Series, lng2: pd.Series
) -> pd.Series:
    """Exact sphere angle between two latlng-degree points — the
    stable atan2 form (S2Point.php:110-112), not haversine."""
    p1 = geom.latlng_to_xyz(
        np.radians(lat1.to_numpy(np.float64)), np.radians(lng1.to_numpy(np.float64))
    )
    p2 = geom.latlng_to_xyz(
        np.radians(lat2.to_numpy(np.float64)), np.radians(lng2.to_numpy(np.float64))
    )
    return pd.Series(geom.angle_between(p1, p2))


@F.pandas_udf(ArrayType(LongType()))
def s2_vertex_neighbors_udf(cell_id: pd.Series, level: pd.Series) -> pd.Series:
    """3-4 neighbors at ``level`` sharing the cell's closest vertex
    (S2CellId.php:601-639).  Scalar kernel per row — used on small
    cell tables (coverer seeding, neighborhood inspection), not on
    corpus-sized inputs."""
    ids = cid.from_signed(cell_id.to_numpy(np.int64))
    lv = level.to_numpy(np.int64)
    if len(ids) == 0:
        return pd.Series([], dtype=object)
    out = []
    for k in range(len(ids)):
        nbrs = cid.vertex_neighbors(int(ids[k]), int(lv[k]))
        out.append([int(cid.to_signed(np.asarray([n], np.uint64))[0]) for n in nbrs])
    return pd.Series(out)
