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


# --- region-predicate native columns (SURVEY §2.11 API surface) ---------------------
def s2_cap_contains_cols(lat, lon, axis_lat_deg, axis_lng_deg, angle_rad):
    """Native-SQL cap containment (S2Cap.php:225-228 chord test,
    closed semantics): ||p - axis||^2 <= 2*(1 - cos(angle)).  All
    trig stays inside whole-stage codegen — the column twin of
    Cap.contains_points."""
    import math

    ax = math.cos(math.radians(axis_lng_deg)) * math.cos(math.radians(axis_lat_deg))
    ay = math.sin(math.radians(axis_lng_deg)) * math.cos(math.radians(axis_lat_deg))
    az = math.sin(math.radians(axis_lat_deg))
    h = 1.0 - math.cos(angle_rad)
    lat_r, lon_r = F.radians(lat), F.radians(lon)
    px = F.cos(lon_r) * F.cos(lat_r)
    py = F.sin(lon_r) * F.cos(lat_r)
    pz = F.sin(lat_r)
    dx, dy, dz = px - F.lit(ax), py - F.lit(ay), pz - F.lit(az)
    return (dx * dx + dy * dy + dz * dz) <= F.lit(2.0 * h)


def s2_rect_contains_cols(lat, lon, lat_lo, lat_hi, lng_lo, lng_hi):
    """Native-SQL rect containment with the S1Interval conventions:
    degrees in, inverted (wrapping) lng intervals supported, lon=-180
    remapped to +180 (S2LatLngRect.php:320-336)."""
    lat_r = F.radians(lat)
    lon_n = F.radians(
        F.when(lon == F.lit(-180.0), F.lit(180.0)).otherwise(lon)
    )
    lat_ok = (lat_r >= F.lit(lat_lo)) & (lat_r <= F.lit(lat_hi))
    if lng_lo > lng_hi:  # inverted interval wraps the antimeridian
        lng_ok = (lon_n >= F.lit(lng_lo)) | (lon_n <= F.lit(lng_hi))
    else:
        lng_ok = (lon_n >= F.lit(lng_lo)) & (lon_n <= F.lit(lng_hi))
    return lat_ok & lng_ok


def make_loop_contains_udf(vertices_latlng_deg):
    """Factory: a pandas UDF `f(lat, lon) -> bool` bound to one loop
    (vertices broadcast in the closure) — the standalone surface of
    the refine kernel for users who want a WHERE-clause predicate
    instead of the covering join."""
    v = np.asarray(vertices_latlng_deg, dtype=np.float64)
    verts = geom.normalize(
        geom.latlng_to_xyz(np.radians(v[:, 0]), np.radians(v[:, 1]))
    )
    origin_inside = geom.loop_origin_inside(verts)

    from pyspark.sql.types import BooleanType

    @F.pandas_udf(BooleanType())
    def loop_contains(lat: pd.Series, lon: pd.Series) -> pd.Series:
        if len(lat) == 0:
            return pd.Series([], dtype=bool)
        pts = geom.latlng_to_xyz(
            np.radians(lat.to_numpy(np.float64)),
            np.radians(lon.to_numpy(np.float64)),
        )
        return pd.Series(geom.loop_contains_points(verts, origin_inside, pts))

    return loop_contains


def register_sql_functions(spark) -> None:
    """Register the §2.11 public API under SQL names so `spark.sql`
    users get the same surface as the DataFrame API.  Integer bit ops
    (s2_level/parent/range/token) additionally have pure-SQL text
    twins in functions.sql_bitops for hot paths — these registrations
    are the API-uniformity forms."""
    spark.udf.register("s2_cell_id", s2_cell_id)
    spark.udf.register("s2_token", s2_token_udf)
    spark.udf.register("s2_id_from_token", s2_id_from_token_udf)
    spark.udf.register("s2_cell_center_lat", s2_cell_center_lat)
    spark.udf.register("s2_cell_center_lng", s2_cell_center_lng)
    spark.udf.register("s2_edge_neighbors", s2_edge_neighbors_udf)
    spark.udf.register("s2_all_neighbors", s2_all_neighbors_udf)
    spark.udf.register("s2_vertex_neighbors", s2_vertex_neighbors_udf)
    spark.udf.register("s2_cell_vertices", s2_cell_vertices_udf)
    spark.udf.register("s2_distance", s2_distance_rad)
