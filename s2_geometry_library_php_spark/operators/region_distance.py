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


BLOCK_SCHEMA = (
    "block_id int, blat double, blng double, bangle double, "
    "n_regions int, region_ids array<long>"
)


def region_cap_blocks(
    region_specs: list[dict], block_size: int
) -> list[tuple]:
    """Hilbert-ordered blocks of region cap bounds, each folded into
    ONE enclosing cap with ``Cap.add_cap`` (S2Cap.php:259-276) — the
    cap-union accumulation the multi-region kNN prune ranks against.
    Every block holds >= block_size regions (the tail merges into the
    last full block) so a block's outer radius upper-bounds the
    distance to at least block_size member regions."""
    from ..s2core import cellid as cid_mod
    from ..s2core import geom as geom_mod
    from ..s2core.cell import Cap
    from ..s2core.region import region_from_params

    caps = []
    for spec in region_specs:
        reg = region_from_params(
            spec["kind"], spec["params"], spec.get("loop_offsets")
        )
        caps.append((int(spec["region_id"]), reg.get_cap_bound()))
    # Hilbert locality: neighbors in key order are neighbors on the
    # sphere, so block caps stay tight.
    import numpy as np

    axes = np.vstack([c.axis for _, c in caps])
    keys = cid_mod.cell_id_from_point(axes[:, 0], axes[:, 1], axes[:, 2])
    order = np.argsort(keys.astype(np.uint64))
    rows = []
    n = len(caps)
    n_blocks = max(1, n // block_size)
    for bi in range(n_blocks):
        lo = bi * block_size
        hi = (bi + 1) * block_size if bi < n_blocks - 1 else n
        acc = Cap.empty()
        ids = []
        for j in order[lo:hi]:
            rid, cap = caps[int(j)]
            acc = acc.add_cap(cap)
            ids.append(rid)
        blat, blng = geom_mod.xyz_to_latlng(acc.axis)
        rows.append(
            (
                bi,
                float(blat),
                float(blng),
                float(acc.angle_radians()),
                len(ids),
                ids,
            )
        )
    return rows


def knn_regions(
    spark: SparkSession,
    probes: DataFrame,
    region_specs: list[dict],
    k: int,
    probe_id: str = "probe_id",
    prune_threshold: int = 1000,
    block_size: int = 32,
) -> DataFrame:
    """k nearest regions per probe, by distance to each region's
    exact rect bound.  Output: (probe_id, region_id, rank, dist6);
    ranking key is the ROUNDED distance with region_id tiebreak
    (deterministic, engine-portable).

    Plan shape: for a dimension-sized region set (<= prune_threshold)
    every probe ranks every region — a broadcast crossJoin is the
    right plan and stays.  Above the threshold a BLOCK-CAP PRUNE runs
    first: region cap bounds fold into Hilbert-ordered block caps
    (``Cap.add_cap`` accumulation), each probe scores blocks with one
    cheap great-circle angle, takes the tightest block's outer radius
    as a provable k-th-distance upper bound (every block holds >= k
    regions), and only regions in blocks whose LOWER bound beats it
    reach the exact rect-distance expression.  Both phases are
    broadcast joins; the only pre-top-k shuffle is the per-probe min
    aggregation, map-side-combined down to one row per probe — the
    plan survives 100x more probes or regions unchanged."""
    rects = regions_rect_df(spark, region_specs)
    if len(region_specs) <= max(prune_threshold, 2 * max(block_size, k)):
        joined = probes.crossJoin(F.broadcast(rects))
    else:
        blocks = spark.createDataFrame(
            region_cap_blocks(region_specs, max(block_size, k)),
            BLOCK_SCHEMA,
        )
        plat = F.radians(F.col("lat"))
        plng = F.radians(
            F.when(F.col("lon") == F.lit(-180.0), F.lit(180.0)).otherwise(
                F.col("lon")
            )
        )
        ang = _angle_to(plat, plng, F.col("blat"), F.col("blng"))
        blocks_geo = blocks.select("block_id", "blat", "blng", "bangle")
        # Pass 1: per-probe k-th-distance upper bound = min over blocks
        # of (angle to block axis + block radius) — every block carries
        # >= k regions, all within that bound.  groupBy keeps the
        # shuffle at ONE row per probe (map-side partial min), unlike a
        # window over the probe x block fan-out.
        kth = (
            probes.crossJoin(F.broadcast(blocks_geo))
            .groupBy(probe_id, "lat", "lon")
            .agg(F.min(ang + F.col("bangle")).alias("_kth_ub"))
        )
        # Pass 2: recompute each block's lower bound against the
        # per-probe threshold; only surviving blocks explode into
        # candidate regions for the exact rect distance.
        cand = (
            kth.crossJoin(F.broadcast(blocks))
            .where(
                F.greatest(F.lit(0.0), ang - F.col("bangle"))
                <= F.col("_kth_ub")
            )
            .select(
                probe_id,
                "lat",
                "lon",
                F.explode("region_ids").alias("region_id"),
            )
        )
        joined = cand.join(F.broadcast(rects), "region_id")
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
