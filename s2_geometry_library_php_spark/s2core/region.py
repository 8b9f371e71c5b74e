"""S2Region implementations consumed by the coverer and the spatial
join's region dimension (driver-side).

The S2Region contract (S2Region.php:3-29): ``get_cap_bound()``,
``get_rect_bound()``, ``contains_cell(cell)``, ``may_intersect_cell(cell)``
plus vectorized point containment for the refine kernel.

* CapRegion      — S2Cap (S2Cap.php)
* RectRegion     — S2LatLngRect (S2LatLngRect.php:320-452)
* LoopRegion     — S2Loop (S2Loop.php:3-25, contains S2Loop.php:601-631)
* PolygonRegion  — S2Polygon: loops with nesting depth; point inside iff
                   inside an odd number of loops (S2Polygon.php:3-41,
                   S2Polygon.php:318-337)
"""

from __future__ import annotations

import math

import numpy as np

from . import geom
from .cell import Cap, Cell, LatLngRect, R1Interval, S1Interval


class Region:
    """Interface (S2Region.php:3-29)."""

    kind = "region"

    def get_cap_bound(self) -> Cap:
        raise NotImplementedError

    def get_rect_bound(self) -> LatLngRect:
        raise NotImplementedError

    def contains_cell(self, cell: Cell) -> bool:
        raise NotImplementedError

    def may_intersect_cell(self, cell: Cell) -> bool:
        raise NotImplementedError

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized containment over (N,3) unit vectors."""
        raise NotImplementedError


class CapRegion(Region):
    kind = "cap"

    def __init__(self, axis_lat_deg: float, axis_lng_deg: float, angle_rad: float):
        axis = geom.latlng_to_xyz(
            np.radians(axis_lat_deg), np.radians(axis_lng_deg)
        )
        self.cap = Cap.from_axis_angle(np.asarray(axis, dtype=np.float64), angle_rad)

    def get_cap_bound(self) -> Cap:
        return self.cap

    def get_rect_bound(self) -> LatLngRect:
        return self.cap.get_rect_bound()

    def contains_cell(self, cell: Cell) -> bool:
        return self.cap.contains_cell(cell)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return self.cap.may_intersect_cell(cell)

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        return self.cap.contains_points(pts)


class RectRegion(Region):
    kind = "rect"

    def __init__(
        self, lat_lo: float, lat_hi: float, lng_lo: float, lng_hi: float
    ):
        """Radians; lng_lo > lng_hi represents an antimeridian-crossing
        rect (S1Interval inverted semantics, S1Interval.php:15-34)."""
        self.rect = LatLngRect(
            R1Interval(lat_lo, lat_hi), S1Interval(lng_lo, lng_hi)
        )

    def get_cap_bound(self) -> Cap:
        return self.rect.get_cap_bound()

    def get_rect_bound(self) -> LatLngRect:
        return self.rect

    def contains_cell(self, cell: Cell) -> bool:
        # Contains its rect bound => contains the cell
        # (S2LatLngRect.php:330-336 semantics).
        return self.rect.contains_rect(cell.get_rect_bound())

    def may_intersect_cell(self, cell: Cell) -> bool:
        return self.rect.intersects_rect(cell.get_rect_bound())

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        lat, lng = geom.xyz_to_latlng(np.atleast_2d(pts))
        out = (self.rect.lat.lo <= lat) & (lat <= self.rect.lat.hi)
        lo, hi = self.rect.lng.lo, self.rect.lng.hi
        lng = np.where(lng == -math.pi, math.pi, lng)
        if self.rect.lng.is_inverted():
            out &= (lng >= lo) | (lng <= hi)
        else:
            out &= (lng >= lo) & (lng <= hi)
        return out


class LoopRegion(Region):
    """Single CCW vertex chain; interior on the left (S2Loop.php:3-25)."""

    kind = "loop"

    def __init__(self, vertices_latlng_deg: np.ndarray):
        """vertices: (M, 2) [lat, lng] degrees, CCW."""
        v = np.asarray(vertices_latlng_deg, dtype=np.float64)
        self._init_from_xyz(
            geom.normalize(
                geom.latlng_to_xyz(np.radians(v[:, 0]), np.radians(v[:, 1]))
            )
        )

    @classmethod
    def from_xyz(cls, vertices_xyz: np.ndarray) -> "LoopRegion":
        """Build from exact unit vectors (polygon boolean-op output —
        a degree round-trip would perturb chained crossing points)."""
        self = cls.__new__(cls)
        self._init_from_xyz(np.asarray(vertices_xyz, dtype=np.float64))
        return self

    def _init_from_xyz(self, vertices_xyz: np.ndarray) -> None:
        self.vertices = vertices_xyz
        self.origin_inside = geom.loop_origin_inside(self.vertices)
        lat_lo, lat_hi, lng_lo, lng_hi = geom.chain_rect_bound(self.vertices)
        lat = R1Interval(lat_lo, lat_hi)
        lng = S1Interval(lng_lo, lng_hi)
        # initBound pole fix-ups (S2Loop.php:819-845): a loop may wrap
        # the sphere or contain a pole (a small CW loop contains both).
        poles = geom.loop_contains_points(
            self.vertices,
            self.origin_inside,
            np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]]),
        )
        if bool(poles[0]):
            lat = R1Interval(lat.lo, math.pi / 2)
            lng = S1Interval.full()
        if lng.is_full() and bool(poles[1]):
            lat = R1Interval(-math.pi / 2, lat.hi)
        self.bound = LatLngRect(lat, lng)
        # Precomputed edge arrays for the vectorized crossing tests.
        self._edge_d = np.roll(self.vertices, -1, axis=0)  # (M,3)
        self._edge_cd = np.cross(self.vertices, self._edge_d)  # (M,3)

    def get_cap_bound(self) -> Cap:
        return self.bound.get_cap_bound()

    def get_rect_bound(self) -> LatLngRect:
        return self.bound

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        return geom.loop_contains_points(
            self.vertices, self.origin_inside, np.atleast_2d(pts)
        )

    def _boundary_near_cell(self, cell: Cell) -> bool:
        """True if any loop vertex is in the cell or any loop edge
        crosses a cell edge.

        Vectorized: all (4 cell edges x M loop edges) crossing sign
        tests in one matrix pass; determinants inside the uncertainty
        band count as 'near' (conservative in both uses: blocks
        contains_cell, triggers may_intersect)."""
        if bool(np.any(cell.contains_points_xyz(self.vertices))):
            return True
        cv = np.asarray(cell.get_vertices())  # (4,3)
        cv_next = np.roll(cv, -1, axis=0)
        ab = np.cross(cv, cv_next)  # (4,3) cell-edge normals
        c_mat = self.vertices  # (M,3)
        d_mat = self._edge_d
        cd = self._edge_cd
        thr = geom.CCW_THRESHOLD
        det_c = ab @ c_mat.T  # (4,M): ccw-ish of loop C vs cell edge
        det_d = ab @ d_mat.T
        det_a = cd @ cv.T  # (M,4): cell vertex A vs loop edge
        det_b = cd @ cv_next.T
        acb = -np.sign(det_c)
        bda = np.sign(det_d)
        cbd = -np.sign(det_b.T)
        dac = np.sign(det_a.T)
        crossing = (acb == bda) & (cbd == acb) & (dac == acb) & (acb != 0)
        uncertain = (
            (np.abs(det_c) <= thr)
            | (np.abs(det_d) <= thr)
            | (np.abs(det_b.T) <= thr)
            | (np.abs(det_a.T) <= thr)
        )
        return bool(np.any(crossing | uncertain))

    def contains_cell(self, cell: Cell) -> bool:
        """Cell ⊆ loop iff all 4 cell vertices inside and the loop
        boundary stays clear of the cell (filter/refine exactness; the
        reference's version builds a cell loop and does loop-vs-loop,
        S2Loop.php:365-522 — same result for valid loops)."""
        if not self.bound.contains_rect(cell.get_rect_bound()):
            return False
        if self._boundary_near_cell(cell):
            return False
        return bool(np.all(self.contains_points(cell.get_vertices())))

    def may_intersect_cell(self, cell: Cell) -> bool:
        if not self.bound.intersects_rect(cell.get_rect_bound()):
            return False
        if self._boundary_near_cell(cell):
            return True
        return bool(np.any(self.contains_points(cell.get_vertices())))


class PolygonRegion(Region):
    """Loops with nesting depth; point inside iff inside an odd number
    of loops (S2Polygon.php:3-41, contains S2Polygon.php:318-337)."""

    kind = "polygon"

    def __init__(self, loops: list[LoopRegion]):
        self.loops = loops
        # combined rect bound = union over shells; conservative: union
        # over all loops (S2Polygon init computes union of loop bounds
        # at depth 0; holes are inside shells so the union is the same).
        bound = LatLngRect.empty()
        lat = R1Interval.empty()
        lngs: list[S1Interval] = []
        for lp in loops:
            lat = lat.union(lp.bound.lat)
            lngs.append(lp.bound.lng)
        lng = lngs[0] if lngs else S1Interval.empty()
        for other in lngs[1:]:
            # grow lng interval to include the other's endpoints
            if lng.contains_interval(other):
                continue
            lng = lng.add_point(other.lo)
            lng = lng.add_point(other.hi)
        self.bound = LatLngRect(lat, lng) if loops else bound

    def get_cap_bound(self) -> Cap:
        return self.bound.get_cap_bound()

    def get_rect_bound(self) -> LatLngRect:
        return self.bound

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        pts = np.atleast_2d(pts)
        inside = np.zeros(len(pts), dtype=bool)
        for lp in self.loops:
            inside ^= lp.contains_points(pts)
        return inside

    def contains_cell(self, cell: Cell) -> bool:
        if not self.bound.contains_rect(cell.get_rect_bound()):
            return False
        for lp in self.loops:
            if lp._boundary_near_cell(cell):
                return False
        return bool(np.all(self.contains_points(cell.get_vertices())))

    def may_intersect_cell(self, cell: Cell) -> bool:
        if not self.bound.intersects_rect(cell.get_rect_bound()):
            return False
        for lp in self.loops:
            if lp._boundary_near_cell(cell):
                return True
        return bool(np.any(self.contains_points(cell.get_vertices())))


def polygon_loop_depths(loops: list[LoopRegion]) -> list[int]:
    """Nesting depth per loop — the S2Polygon init-tree semantics
    (S2Polygon.php:100-143 insertLoop/initLoop preorder): depth k =
    number of other loops strictly containing loop k; even depth =
    shell, odd = hole.  For valid polygons (no crossing loops) the
    pairwise containment test is exactly the preorder tree depth."""
    from .edges import loop_contains_loop

    depths = []
    for i, lp in enumerate(loops):
        d = 0
        for j, other in enumerate(loops):
            if i != j and loop_contains_loop(other, lp):
                d += 1
        depths.append(d)
    return depths


def polygon_preorder(
    loops: list[LoopRegion],
) -> list[tuple[int, int, LoopRegion]]:
    """Loops sorted in preorder-traversal order of the nesting tree
    with their depths: (original_index, depth, loop) — children follow
    their parent, as S2Polygon.initLoop's sortValueLoops ordering
    produces (S2Polygon.php:906-955)."""
    depths = polygon_loop_depths(loops)
    from .edges import loop_contains_loop

    # parent of k = the deepest loop containing k
    parents = []
    for i, lp in enumerate(loops):
        parent, parent_depth = -1, -1
        for j, other in enumerate(loops):
            if i != j and loop_contains_loop(other, lp):
                if depths[j] > parent_depth:
                    parent, parent_depth = j, depths[j]
        parents.append(parent)
    order: list[int] = []

    def visit(k: int) -> None:
        order.append(k)
        for c in sorted(
            i for i, p in enumerate(parents) if p == k
        ):
            visit(c)

    for root in sorted(i for i, p in enumerate(parents) if p == -1):
        visit(root)
    return [(k, depths[k], loops[k]) for k in order]


def polygon_contains_or_crosses(p: PolygonRegion, b: LoopRegion) -> int:
    """Polygon-level containsOrCrosses dispatch (S2Polygon.php:952-968):
    +1 if loop B's region is contained by the polygon interior, -1 if
    any boundary crosses B, 0 otherwise — parity XOR of the loop-level
    contains_or_crosses over every polygon loop."""
    from .edges import contains_or_crosses

    inside = False
    for lp in p.loops:
        r = contains_or_crosses(lp, b)
        if r < 0:
            return -1
        if r > 0:
            inside = not inside
    return 1 if inside else 0


def polygon_contains_polygon(a: PolygonRegion, b: PolygonRegion) -> bool:
    """A contains B iff A contains every B shell and B excludes every
    A hole — containsAllShells(b) && b.excludesAllHoles(a), both via
    the parity-based polygon containsOrCrosses dispatch
    (S2Polygon.php:952-1010).  The parity form correctly accepts the
    'A hole nested inside a B hole' case (the hole lies in B's
    complement, so containsOrCrosses == 0) that a raw loop-vs-loop
    intersection test would reject."""
    b_depths = polygon_loop_depths(b.loops)
    for lp, d in zip(b.loops, b_depths):
        if d % 2 == 1:
            continue  # holes follow their shells
        if polygon_contains_or_crosses(a, lp) <= 0:
            return False
    a_depths = polygon_loop_depths(a.loops)
    for alp, d in zip(a.loops, a_depths):
        if d % 2 == 0:
            continue
        # A hole contained by B (or crossing B) carves interior out of
        # A that B still covers => not contained.
        if polygon_contains_or_crosses(b, alp) != 0:
            return False
    return True


def polygon_intersects_polygon(a: PolygonRegion, b: PolygonRegion) -> bool:
    """A and B share interior points (the S2Polygon.intersects
    dispatch, S2Polygon.php:318-413): true iff some boundary edges
    cross, or either polygon contains a vertex of the other (vertex
    membership decides full-nesting cases once crossings are ruled
    out — valid-polygon assumption, same as the reference)."""
    from .edges import contains_or_crosses

    # boundary-CROSSING test only (not interior-intersects: a loop
    # nested in another's interior must fall through to the parity
    # vertex tests, which correctly handle holes)
    for alp in a.loops:
        for blp in b.loops:
            if contains_or_crosses(alp, blp) < 0:
                return True
    for blp in b.loops:
        if bool(a.contains_points(blp.vertices[0:1])[0]):
            return True
    for alp in a.loops:
        if bool(b.contains_points(alp.vertices[0:1])[0]):
            return True
    return False


def region_from_params(
    kind: str,
    params: list[float],
    loop_offsets: list[int] | None = None,
    validate: bool = True,
) -> Region:
    """Build a region from the FIXTURES.md §2 table encoding.

    cap:  [axis_lat_deg, axis_lng_deg, angle_rad]
    rect: [lat_lo, lat_hi, lng_lo, lng_hi] radians
    loop: [lat0, lng0, lat1, lng1, ...] degrees CCW
    polygon: same + loop_offsets = start index of each loop in params
             (offsets count (lat, lng) pairs).

    User-supplied loop/polygon geometry is VALIDATED on ingest
    (S2Loop/S2Polygon isValid): a self-intersecting loop or a
    shared-edge/crossing polygon would otherwise silently yield
    parity garbage in every containment join downstream.  Pass
    ``validate=False`` for geometry already proven valid (e.g. the
    boolean-op assembly pipeline, whose loops are engine-constructed).
    """
    from .edges import loop_is_valid, polygon_is_valid

    if kind == "cap":
        return CapRegion(params[0], params[1], params[2])
    if kind == "rect":
        return RectRegion(params[0], params[1], params[2], params[3])
    if kind == "loop":
        pts = np.asarray(params, dtype=np.float64).reshape(-1, 2)
        loop = LoopRegion(pts)
        if validate:
            ok, why = loop_is_valid(loop.vertices)
            if not ok:
                raise ValueError(f"invalid loop: {why}")
        return loop
    if kind == "polygon":
        pts = np.asarray(params, dtype=np.float64).reshape(-1, 2)
        offsets = list(loop_offsets or [0]) + [len(pts)]
        loops = [
            LoopRegion(pts[offsets[k] : offsets[k + 1]])
            for k in range(len(offsets) - 1)
        ]
        if validate:
            ok, why = polygon_is_valid(loops)
            if not ok:
                raise ValueError(f"invalid polygon: {why}")
        return PolygonRegion(loops)
    raise ValueError(f"unknown region kind: {kind}")
