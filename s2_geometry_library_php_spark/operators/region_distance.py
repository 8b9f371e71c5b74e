"""k-nearest-regions: point -> S2LatLngRect distance as NATIVE SQL.

The reference's ``S2LatLngRect::getDistance(S2LatLng)``
(S2LatLngRect.php:222-243) dispatches on whether the point's
longitude falls inside the rect's lng interval (pure latitude clamp)
or outside (point-to-meridian-edge distance on the nearer boundary
meridian, chosen by which half of the lng-interval complement holds
the point).  Every branch is closed-form trigonometry, so the whole
operator compiles to one whole-stage-codegen expression over a
``probes x broadcast(regions)`` join — no Python in the hot path, no
shuffle of the probe side.  The numpy twin (``LatLngRect.
get_distance_latlng``, the faithful port) is the independent oracle.

Plan shape at 100 TB: the regions table is dimension-sized (bounds +
two precomputed scalars per region) and broadcast; probes stream
through the join + window top-k.  For k-nearest over a LARGE region
table, the same expression works after an S2-cell prejoin (cover each
rect, ring-expand probes) — the kNN operator's candidate machinery.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RECT_SCHEMA = (
    "region_id long, lat_lo double, lat_hi double, lng_lo double, "
    "lng_hi double, cc double"
)


def regions_rect_df(spark: SparkSession, region_specs: list[dict]) -> DataFrame:
    """(region_id, rect bound radians, complement-center) — one row
    per region, computed once driver-side from the exact kernels."""
    from ..s2core.region import region_from_params

    rows = []
    for spec in region_specs:
        reg = region_from_params(
            spec["kind"], spec["params"], spec.get("loop_offsets")
        )
        b = reg.get_rect_bound()
        rows.append(
            (
                int(spec["region_id"]),
                float(b.lat.lo),
                float(b.lat.hi),
                float(b.lng.lo),
                float(b.lng.hi),
                float(b.lng.complement_center()),
            )
        )
    return spark.createDataFrame(rows, RECT_SCHEMA)


def _angle_to(plat_r, plng_r, qlat_r, qlng_r):
    """Great-circle angle between two (radian) latlng column pairs —
    the stable atan2(|cross|, dot) form, native columns."""
    px = F.cos(plng_r) * F.cos(plat_r)
    py = F.sin(plng_r) * F.cos(plat_r)
    pz = F.sin(plat_r)
    qx = F.cos(qlng_r) * F.cos(qlat_r)
    qy = F.sin(qlng_r) * F.cos(qlat_r)
    qz = F.sin(qlat_r)
    cx = py * qz - pz * qy
    cy = pz * qx - px * qz
    cz = px * qy - py * qx
    return F.atan2(F.sqrt(cx * cx + cy * cy + cz * cz), px * qx + py * qy + pz * qz)


def rect_distance_col(lat_col, lon_col):
    """Point-to-rect min distance (radians) as a pure Column over a
    frame carrying the RECT_SCHEMA columns.  lat_col/lon_col are
    DEGREE columns; the -180 -> +180 remap mirrors S1Interval."""
    plat = F.radians(lat_col)
    plng = F.radians(
        F.when(lon_col == F.lit(-180.0), F.lit(180.0)).otherwise(lon_col)
    )
    lat_lo, lat_hi = F.col("lat_lo"), F.col("lat_hi")
    lng_lo, lng_hi, cc = F.col("lng_lo"), F.col("lng_hi"), F.col("cc")

    lng_inverted = lng_lo > lng_hi
    lng_contains = F.when(
        lng_inverted, (plng >= lng_lo) | (plng <= lng_hi)
    ).otherwise((plng >= lng_lo) & (plng <= lng_hi))
    lat_clamp = F.greatest(F.lit(0.0), plat - lat_hi, lat_lo - plat)

    # nearer boundary meridian: S1Interval(lng_hi, complement-center)
    # holds the point <=> the hi side (S2LatLngRect.php:231-238)
    hi_side_inverted = lng_hi > cc
    hi_side = F.when(hi_side_inverted, (plng >= lng_hi) | (plng <= cc)).otherwise(
        (plng >= lng_hi) & (plng <= cc)
    )
    a_lng = F.when(hi_side, lng_hi).otherwise(lng_lo)

    # point -> meridian-segment distance: the segment's great circle
    # is the full meridian; the perpendicular foot is at latitude
    # atan2(sin plat, cos plat * cos dlng) on the near half-meridian
    # (cos dlng >= 0).  Foot on the segment -> arc distance
    # asin(|cos plat * sin dlng|); otherwise nearer endpoint.
    dlng = plng - a_lng
    cosd = F.cos(dlng)
    lat_proj = F.atan2(F.sin(plat), F.cos(plat) * cosd)
    on_segment = (cosd >= 0) & (lat_proj >= lat_lo) & (lat_proj <= lat_hi)
    seg_dist = F.asin(
        F.least(F.lit(1.0), F.abs(F.cos(plat) * F.sin(dlng)))
    )
    end_dist = F.least(
        _angle_to(plat, plng, lat_lo, a_lng),
        _angle_to(plat, plng, lat_hi, a_lng),
    )
    meridian_dist = F.when(on_segment, seg_dist).otherwise(end_dist)
    return F.when(lng_contains, lat_clamp).otherwise(meridian_dist)


def knn_regions(
    spark: SparkSession,
    probes: DataFrame,
    region_specs: list[dict],
    k: int,
    probe_id: str = "probe_id",
) -> DataFrame:
    """k nearest regions per probe, by distance to each region's
    exact rect bound.  Output: (probe_id, region_id, rank, dist6);
    ranking key is the ROUNDED distance with region_id tiebreak
    (deterministic, engine-portable)."""
    rects = regions_rect_df(spark, region_specs)
    joined = probes.crossJoin(F.broadcast(rects))
    dist6 = F.round(rect_distance_col(F.col("lat"), F.col("lon")), 6)
    w = Window.partitionBy(probe_id).orderBy(
        F.col("dist6").asc(), F.col("region_id").asc()
    )
    return (
        joined.select(probe_id, "region_id", dist6.alias("dist6"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def knn_regions_numpy(
    region_specs: list[dict],
    probes: list[tuple],
    k: int,
) -> list[tuple]:
    """Independent oracle: the faithful-port kernel
    ``LatLngRect.get_distance_latlng`` per (probe, region), same
    rounded ranking.  probes: [(probe_id, lat_deg, lon_deg)]."""
    from ..s2core.region import region_from_params

    bounds = []
    for spec in region_specs:
        reg = region_from_params(
            spec["kind"], spec["params"], spec.get("loop_offsets")
        )
        bounds.append((int(spec["region_id"]), reg.get_rect_bound()))
    rows = []
    for pid, plat, plon in probes:
        plat_r = math.radians(plat)
        plng_r = math.radians(180.0 if plon == -180.0 else plon)
        dists = sorted(
            (round(b.get_distance_latlng(plat_r, plng_r), 6), rid)
            for rid, b in bounds
        )
        for r, (d, rid) in enumerate(dists[:k], start=1):
            rows.append((int(pid), rid, r, float(d)))
    return rows
