"""Polyline proximity join: documents within distance D of a polyline.

The distributed realization of the reference's edge index probe
(S2EdgeIndex.php:85-147: cover data edges, probe by cell, refine with
exact crossing/distance): polylines are covered edge-by-edge
(s2core.edges.edge_covering), buffered by D via the restored
``S2CellUnion.expand`` (S2CellUnion.php:354-415), broadcast, and
probed with the same banded-prefix equi-join as the point-in-region
join; survivors are refined with the exact point-to-edge distance
kernel (S2EdgeUtil.php:271-309).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..s2core import cellid as cid
from ..s2core import geom
from ..s2core.coverer import expand_by_radius
from ..s2core.edges import polyline_covering
from .spatial_join import _parent_col, _sig, _lvl


def polyline_proximity_join(
    spark: SparkSession,
    docs: DataFrame,
    polylines: list[dict],
    max_distance_rad: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    leaf_col: str = "cell_id",
) -> DataFrame:
    """polylines: [{line_id, vertices: [[lat,lng] deg, ...]}, ...].
    Returns docs columns + line_id + dist_rad for docs within
    max_distance_rad of the polyline."""
    cov_rows = []
    verts_by_line: dict[int, np.ndarray] = {}
    for spec in polylines:
        lid = int(spec["line_id"])
        v = np.asarray(spec["vertices"], dtype=np.float64)
        verts_by_line[lid] = geom.normalize(
            geom.latlng_to_xyz(np.radians(v[:, 0]), np.radians(v[:, 1]))
        )
        cov = polyline_covering(v)
        cov = expand_by_radius(cov, max_distance_rad, 6)
        for c in cov:
            cov_rows.append((lid, _sig(c), _lvl(c)))
    cov_df = spark.createDataFrame(
        cov_rows, "line_id long, cov_cell long, cov_level int"
    )
    levels = sorted({r[2] for r in cov_rows})

    # Single-key banded-prefix join (see spatial_join: the cell id's
    # lsb encodes its level, so the level equality is implied).
    prefix_cols = F.array(
        *[_parent_col(F.col(leaf_col), lvl) for lvl in levels]
    )
    probe = docs.withColumn("_prefix", F.explode(prefix_cols))
    joined = probe.join(
        F.broadcast(cov_df.drop("cov_level")),
        F.col("_prefix") == F.col("cov_cell"),
        "inner",
    )

    @F.pandas_udf(BooleanType())
    def within(lat: pd.Series, lon: pd.Series, line_id: pd.Series) -> pd.Series:
        n = len(lat)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        pts = geom.latlng_to_xyz(
            np.radians(lat.to_numpy(np.float64)),
            np.radians(lon.to_numpy(np.float64)),
        )
        lid_arr = line_id.to_numpy(np.int64)
        for lid in np.unique(lid_arr):
            mask = lid_arr == lid
            verts = verts_by_line[int(lid)]
            best = np.full(mask.sum(), np.inf)
            for k in range(len(verts) - 1):
                d = geom.edge_distance_radians(
                    pts[mask], verts[k], verts[k + 1]
                )
                best = np.minimum(best, d)
            out[mask] = best <= max_distance_rad
        return pd.Series(out)

    # expanded coverings are normalized (disjoint), so each doc matches
    # at most one covering cell per line: no dedup shuffle needed
    out_cols = [*docs.columns, "line_id"]
    return joined.where(
        within(F.col(lat_col), F.col(lon_col), F.col("line_id"))
    ).select(*out_cols)


def polyline_project_join(
    spark: SparkSession,
    docs: DataFrame,
    polylines: list[dict],
    max_distance_rad: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    leaf_col: str = "cell_id",
) -> DataFrame:
    """Proximity join + projection: docs within ``max_distance_rad``
    of each polyline, annotated with the exact distance, the arc-length
    fraction of the projection, and the projected point
    (S2Polyline.project / interpolate semantics via
    s2core.edges.polyline_project)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    from ..s2core.edges import polyline_project

    verts_by_line = {
        int(s["line_id"]): geom.normalize(
            geom.latlng_to_xyz(
                np.radians(np.asarray(s["vertices"], dtype=np.float64)[:, 0]),
                np.radians(np.asarray(s["vertices"], dtype=np.float64)[:, 1]),
            )
        )
        for s in polylines
    }

    candidates = polyline_proximity_join(
        spark, docs, polylines, max_distance_rad,
        lat_col=lat_col, lon_col=lon_col, leaf_col=leaf_col,
    )

    proj_type = StructType(
        [
            StructField("dist_rad", DoubleType()),
            StructField("fraction", DoubleType()),
            StructField("proj_lat", DoubleType()),
            StructField("proj_lon", DoubleType()),
        ]
    )

    @F.pandas_udf(proj_type)
    def project(lat: pd.Series, lon: pd.Series, line_id: pd.Series) -> pd.DataFrame:
        n = len(lat)
        out = {
            "dist_rad": np.zeros(n), "fraction": np.zeros(n),
            "proj_lat": np.zeros(n), "proj_lon": np.zeros(n),
        }
        if n:
            pts = geom.latlng_to_xyz(
                np.radians(lat.to_numpy(np.float64)),
                np.radians(lon.to_numpy(np.float64)),
            )
            lid_arr = line_id.to_numpy(np.int64)
            for lid in np.unique(lid_arr):
                mask = lid_arr == lid
                cp, d, fr = polyline_project(pts[mask], verts_by_line[int(lid)])
                plat, plng = geom.xyz_to_latlng(cp)
                out["dist_rad"][mask] = d
                out["fraction"][mask] = fr
                out["proj_lat"][mask] = np.degrees(plat)
                out["proj_lon"][mask] = np.degrees(plng)
        return pd.DataFrame(out)

    proj = project(F.col(lat_col), F.col(lon_col), F.col("line_id"))
    return candidates.withColumn("_p", proj).select(
        *candidates.columns,
        F.col("_p.dist_rad").alias("dist_rad"),
        F.col("_p.fraction").alias("fraction"),
        F.col("_p.proj_lat").alias("proj_lat"),
        F.col("_p.proj_lon").alias("proj_lon"),
    )
