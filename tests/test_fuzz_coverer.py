"""Hypothesis property tests for the RegionCoverer (S2RegionCoverer
semantics, S2RegionCoverer.php:189-233): the two guarantees every
downstream join relies on, fuzzed over random caps and rects —

  EXTERIOR covering is COMPLETE: every point of the region lies in
  some covering cell (the banded-prefix join's no-false-negative
  guarantee), and the covering respects max_cells/min/max_level.

  INTERIOR covering is SOUND: every interior cell is fully contained
  in the region (rows landing on an interior cell skip the exact
  refine kernel, so an unsound interior cell would emit false
  positives)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from s2_geometry_library_php_spark.s2core import cellid as cid
from s2_geometry_library_php_spark.s2core import geom
from s2_geometry_library_php_spark.s2core.cell import Cell
from s2_geometry_library_php_spark.s2core.coverer import RegionCoverer
from s2_geometry_library_php_spark.s2core.region import CapRegion, RectRegion

N_SAMPLE = 256


def _frame(n: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    u = np.cross(n, [0.0, 0.0, 1.0])
    if np.linalg.norm(u) < 1e-9:
        u = np.cross(n, [1.0, 0.0, 0.0])
    u /= np.linalg.norm(u)
    return u, np.cross(n, u)


def _sample_cap(lat, lng, angle, rng) -> np.ndarray:
    """Uniform points on the spherical cap (axis frame + uniform
    cos-theta in [cos angle, 1])."""
    n = np.asarray(
        geom.latlng_to_xyz(np.radians(lat), np.radians(lng)), dtype=np.float64
    ).reshape(3)
    u, v = _frame(n)
    ct = rng.uniform(np.cos(angle), 1.0, N_SAMPLE)
    stheta = np.sqrt(np.maximum(0.0, 1.0 - ct**2))
    phi = rng.uniform(0.0, 2 * np.pi, N_SAMPLE)
    pts = (
        np.outer(ct, n)
        + np.outer(stheta * np.cos(phi), u)
        + np.outer(stheta * np.sin(phi), v)
    )
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def _covering_contains_leaves(cov: list[int], leaves: np.ndarray) -> np.ndarray:
    hit = np.zeros(len(leaves), dtype=bool)
    for c in cov:
        u = c & 0xFFFFFFFFFFFFFFFF
        lsb = u & (-u & 0xFFFFFFFFFFFFFFFF)
        lo, hi = u - (lsb - 1), u + (lsb - 1)
        ul = leaves.astype(np.uint64)
        hit |= (ul >= np.uint64(lo)) & (ul <= np.uint64(hi))
    return hit


def _check_region(region, pts_inside: np.ndarray, max_cells: int, max_level: int):
    cov = RegionCoverer(max_cells=max_cells, max_level=max_level).get_covering(
        region
    )
    assert cov, "empty covering for a non-empty region"
    # max_cells can be exceeded only transiently per the reference
    # contract when a single candidate subdivides; after normalize the
    # result is <= max(max_cells, 6-face floor) except the documented
    # 4-children corner — allow the same slack the accuracy test uses.
    assert len(cov) <= max(max_cells, 6) + 3
    for c in cov:
        assert cid.level_of(np.array([c], dtype=np.uint64))[0] <= max_level
        assert region.may_intersect_cell(Cell(c))
    lat, lng = geom.xyz_to_latlng(pts_inside)
    leaves = cid.cell_id_from_latlng_degrees(np.degrees(lat), np.degrees(lng))
    hit = _covering_contains_leaves(cov, leaves)
    assert hit.all(), f"{(~hit).sum()} region points outside the covering"

    interior = RegionCoverer(
        max_cells=max_cells, max_level=max_level, max_candidates=2000
    ).get_interior_covering(region)
    for c in interior:
        assert region.contains_cell(Cell(c)), "unsound interior cell"


@settings(max_examples=25, deadline=None)
@given(
    lat=st.floats(-85, 85),
    lng=st.floats(-179.9, 179.9),
    angle=st.floats(1e-4, 0.5),
    max_cells=st.sampled_from([4, 8, 12]),
    max_level=st.sampled_from([12, 18, 30]),
    seed=st.integers(0, 2**31 - 1),
)
def test_cap_covering_complete_and_interior_sound(
    lat, lng, angle, max_cells, max_level, seed
):
    rng = np.random.default_rng(seed)
    region = CapRegion(lat, lng, angle)
    pts = _sample_cap(lat, lng, angle, rng)
    # guard against boundary-grazing float noise: keep points the
    # region itself agrees are inside
    pts = pts[region.contains_points(pts)]
    if len(pts):
        _check_region(region, pts, max_cells, max_level)


@settings(max_examples=25, deadline=None)
@given(
    lat_lo=st.floats(-85, 80),
    dlat=st.floats(0.01, 20),
    lng_lo=st.floats(-180, 180),
    dlng=st.floats(0.01, 40),
    max_cells=st.sampled_from([4, 8, 12]),
    seed=st.integers(0, 2**31 - 1),
)
def test_rect_covering_complete_incl_antimeridian(
    lat_lo, dlat, lng_lo, dlng, max_cells, seed
):
    rng = np.random.default_rng(seed)
    lat_hi = min(lat_lo + dlat, 85.0)
    lng_hi = lng_lo + dlng  # may exceed 180 -> wraps
    region = RectRegion(
        np.radians(lat_lo),
        np.radians(lat_hi),
        np.radians(((lng_lo + 180) % 360) - 180),
        np.radians(((lng_hi + 180) % 360) - 180),
    )
    lats = rng.uniform(lat_lo, lat_hi, N_SAMPLE)
    lngs = ((rng.uniform(lng_lo, lng_hi, N_SAMPLE) + 180) % 360) - 180
    pts = np.stack(
        geom.latlng_to_xyz(np.radians(lats), np.radians(lngs)), axis=-1
    )
    pts = pts[region.contains_points(pts)]
    if len(pts):
        _check_region(region, pts, max_cells, 30)
