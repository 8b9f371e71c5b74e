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

    prefix_cols = F.array(
        *[
            F.struct(
                F.lit(lvl).alias("lvl"),
                _parent_col(F.col(leaf_col), lvl).alias("prefix"),
            )
            for lvl in levels
        ]
    )
    probe = docs.withColumn("_pfx", F.explode(prefix_cols)).select(
        "*",
        F.col("_pfx.lvl").alias("_lvl"),
        F.col("_pfx.prefix").alias("_prefix"),
    ).drop("_pfx")
    joined = probe.join(
        F.broadcast(cov_df),
        (F.col("_prefix") == F.col("cov_cell"))
        & (F.col("_lvl") == F.col("cov_level")),
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
