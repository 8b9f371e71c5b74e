"""Adversarial fuzz of the polygon boolean ops (VERDICT r3 #1).

The driver oracle for ``polygon_booleans`` is a set-algebra proxy, so
this suite is the real gate: for seeded random polygon pairs — plain
overlaps, shared vertices, collinear equator overlaps, hole-in-hole
nestings, near-degenerate slivers, identical polygons and exact
shared-edge adjacency — every boolean result is checked by POINT
SAMPLING PARITY against the inputs:

    p ∈ A∩B  ⟺  p∈A ∧ p∈B
    p ∈ A∪B  ⟺  p∈A ∨ p∈B
    p ∈ A\\B  ⟺  p∈A ∧ ¬p∈B

for every sample p farther than a margin from ALL five boundaries
(input and output boundaries are ambiguous under snap rounding by
construction; everything else must agree exactly).  Samples include
per-edge just-inside / just-outside probes at 5e-7 rad — well above
the margin, far below any polygon feature — which is exactly where
the round-2 clip deviations (hole parity, collinear overlap handling)
lived.  Reference semantics: S2Polygon.php:599-707,
S2PolygonBuilder.php:432-495.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2_geometry_library_php_spark.s2core import geom
from s2_geometry_library_php_spark.s2core.polygon_ops import (
    loop_signed_area,
    polygon_difference,
    polygon_intersection,
    polygon_union,
)
from s2_geometry_library_php_spark.s2core.region import (
    LoopRegion,
    PolygonRegion,
)

MARGIN = 1e-7  # rad: ambiguity band around any boundary
EDGE_OFF = 5e-7  # rad: just-inside/just-outside probe offset


def mk_loop(latlng) -> LoopRegion:
    """CCW-normalized loop from [(lat, lng)] degrees."""
    lp = LoopRegion(np.asarray(latlng, dtype=np.float64))
    if loop_signed_area(lp.vertices) < 0.0:
        lp = LoopRegion.from_xyz(lp.vertices[::-1].copy())
    return lp


def star_poly(rng, clat, clng, r_lo, r_hi, n) -> list[tuple[float, float]]:
    """Simple polygon around a center, degrees.  Star-convexity makes
    it simple in the lat/lng PLANE; on the sphere geodesic bulge can
    still cross two near-parallel edges (found by this very fuzz on
    an earlier draft), so candidates are rejected until the engine's
    own S2Loop.isValid accepts them — the boolean ops' documented
    contract is valid input loops."""
    from s2_geometry_library_php_spark.s2core.edges import loop_is_valid

    while True:
        angles = np.sort(rng.uniform(0.0, 2.0 * np.pi, n))
        if np.min(
            np.diff(np.concatenate([angles, [angles[0] + 2 * np.pi]]))
        ) < 0.15:
            continue
        radii = rng.uniform(r_lo, r_hi, n)
        cand = [
            (clat + r * math.sin(a), clng + r * math.cos(a))
            for a, r in zip(angles, radii)
        ]
        if loop_is_valid(mk_loop(cand).vertices)[0]:
            return cand


def _case_polygons(case: int) -> tuple[PolygonRegion, PolygonRegion]:
    rng = np.random.default_rng(1000 + case)
    fam = case % 6
    clat = float(rng.uniform(-55.0, 55.0))
    clng = float(rng.uniform(-170.0, 170.0))
    if fam == 0:  # plain random overlap / near-miss
        a = [star_poly(rng, clat, clng, 1.0, 6.0, int(rng.integers(5, 11)))]
        off = float(rng.uniform(0.0, 7.0))
        ang = float(rng.uniform(0.0, 2 * np.pi))
        b = [
            star_poly(
                rng,
                clat + off * math.sin(ang),
                clng + off * math.cos(ang),
                1.0,
                6.0,
                int(rng.integers(5, 11)),
            )
        ]
    elif fam == 1:  # B shares alternating vertices of A
        av = star_poly(rng, clat, clng, 2.0, 6.0, 8)
        a = [av]
        b = [av[::2]]  # inscribed quad reusing 4 exact vertices
    elif fam == 2:  # collinear overlap along the equator geodesic
        a0, a1 = sorted(rng.uniform(0.0, 20.0, 2))
        while a1 - a0 < 2.0:
            a0, a1 = sorted(rng.uniform(0.0, 20.0, 2))
        b0 = float(rng.uniform(a0 - 5.0, a1 - 1.0))
        b1 = b0 + float(rng.uniform(1.5, 8.0))
        h_a = float(rng.uniform(2.0, 8.0))
        h_b = float(rng.uniform(2.0, 8.0))
        a = [[(0.0, a0), (0.0, a1), (h_a, (a0 + a1) / 2)]]
        if case % 2 == 0:  # adjacency: interiors face each other
            b = [[(0.0, b1), (0.0, b0), (-h_b, (b0 + b1) / 2)]]
        else:  # same side: overlapping interiors share the segment
            b = [[(0.0, b0), (0.0, b1), (h_b, (b0 + b1) / 2)]]
    elif fam == 3:  # hole-in-hole nesting (depth 2) vs random poly
        s = float(rng.uniform(6.0, 10.0))
        a = [
            [(clat - s, clng - s), (clat - s, clng + s),
             (clat + s, clng + s), (clat + s, clng - s)],
            [(clat - s * 0.6, clng - s * 0.6), (clat - s * 0.6, clng + s * 0.6),
             (clat + s * 0.6, clng + s * 0.6), (clat + s * 0.6, clng - s * 0.6)],
            [(clat - s * 0.25, clng - s * 0.25), (clat - s * 0.25, clng + s * 0.25),
             (clat + s * 0.25, clng + s * 0.25), (clat + s * 0.25, clng - s * 0.25)],
        ]
        b = [
            star_poly(
                rng,
                clat + float(rng.uniform(-s, s)) * 0.7,
                clng + float(rng.uniform(-s, s)) * 0.7,
                s * 0.2,
                s * 0.5,
                int(rng.integers(4, 9)),
            )
        ]
    elif fam == 4:  # near-degenerate slivers: B = A shifted ~1e-4 deg
        av = star_poly(rng, clat, clng, 1.5, 5.0, int(rng.integers(5, 9)))
        d = float(rng.uniform(0.8e-4, 3e-4))
        ang = float(rng.uniform(0.0, 2 * np.pi))
        b = [
            [(la + d * math.sin(ang), ln + d * math.cos(ang)) for la, ln in av]
        ]
        a = [av]
    else:  # identical polygons / exact full-shared-edge adjacency
        if case % 2 == 0:
            av = star_poly(rng, clat, clng, 1.5, 5.0, int(rng.integers(4, 9)))
            a, b = [av], [list(av)]
        else:
            e0, e1 = 0.0, float(rng.uniform(4.0, 12.0))
            h = float(rng.uniform(3.0, 9.0))
            a = [[(0.0, e0), (0.0, e1), (h, e1), (h, e0)]]
            b = [[(0.0, e1), (0.0, e0), (-h, e0), (-h, e1)]]
    return (
        PolygonRegion([mk_loop(lv) for lv in a]),
        PolygonRegion([mk_loop(lv) for lv in b]),
    )


def _edges(region: PolygonRegion):
    for lp in region.loops:
        v = lp.vertices
        m = len(v)
        for k in range(m):
            yield v[k], v[(k + 1) % m]


def _min_edge_dist(region: PolygonRegion, pts: np.ndarray) -> np.ndarray:
    d = np.full(len(pts), np.inf)
    for v0, v1 in _edges(region):
        d = np.minimum(d, geom.edge_distance_radians(pts, v0, v1))
    return d


def _samples(a: PolygonRegion, b: PolygonRegion, rng) -> np.ndarray:
    pts = []
    # bbox-random points over the combined extent
    bounds = [r.get_rect_bound() for r in (a, b)]
    lat_lo = min(bb.lat.lo for bb in bounds) - 0.02
    lat_hi = max(bb.lat.hi for bb in bounds) + 0.02
    lats = rng.uniform(lat_lo, lat_hi, 64)
    # lng intervals may wrap; sample around each bound's center
    for bb in bounds:
        c = bb.lng.get_center()
        w = bb.lng.get_length() / 2 + 0.02
        lngs = rng.uniform(c - w, c + w, 32)
        pts.append(
            geom.latlng_to_xyz(
                np.radians(lats[:32] if bb is bounds[0] else lats[32:]),
                lngs,
            )
        )
    # per-edge just-inside / just-outside probes
    for reg in (a, b):
        for v0, v1 in _edges(reg):
            mid = v0 + v1
            mid = mid / np.linalg.norm(mid)
            nrm = np.cross(v0, v1)
            nn = np.linalg.norm(nrm)
            if nn == 0.0:
                continue
            nrm /= nn
            for s in (EDGE_OFF, -EDGE_OFF):
                p = mid + s * nrm
                pts.append((p / np.linalg.norm(p))[None, :])
    # perturbed vertices
    for reg in (a, b):
        for lp in reg.loops:
            jit = rng.normal(0.0, 2e-6, lp.vertices.shape)
            vv = lp.vertices + jit
            pts.append(vv / np.linalg.norm(vv, axis=1, keepdims=True))
    return np.vstack(pts)


def _polygon_area(poly: PolygonRegion) -> float:
    """Area under the polygon's XOR-parity semantics: |loop area|
    signed by nesting depth (even depth adds, holes subtract)."""
    from s2_geometry_library_php_spark.s2core.region import (
        polygon_loop_depths,
    )

    if not poly.loops:
        return 0.0
    depths = polygon_loop_depths(poly.loops)
    return sum(
        ((-1) ** d) * abs(loop_signed_area(lp.vertices))
        for lp, d in zip(poly.loops, depths)
    )


def test_polygon_boolean_area_identities():
    """Measure-level cross-check independent of point sampling: the
    inclusion-exclusion identities

        area(A) + area(B) == area(A ∪ B) + area(A ∩ B)
        area(A \\ B)       == area(A) - area(A ∩ B)

    over every fuzz family.  Boundary snap is 1e-10 chord and the
    intersection points are computed exactly, so the identities hold
    to ~1e-9 sr (measured worst 7.4e-10 across all 240 cases); the
    1e-8 gate leaves a 13x margin while still catching any dropped or
    doubled piece, which costs at least a sliver's area (~1e-7 sr for
    the thinnest family here)."""
    tol = 1e-8
    bad = []
    for case in range(240):
        a, b = _case_polygons(case)
        inter = polygon_intersection(a, b)
        union = polygon_union(a, b)
        diff = polygon_difference(a, b)
        aa, ab = _polygon_area(a), _polygon_area(b)
        ai, au, ad = (
            _polygon_area(inter),
            _polygon_area(union),
            _polygon_area(diff),
        )
        if abs(aa + ab - au - ai) > tol or abs(ad - (aa - ai)) > tol:
            bad.append((case, aa + ab - au - ai, ad - (aa - ai)))
    assert not bad, f"area identities violated: {bad[:5]}"


@pytest.mark.parametrize("case", range(240))
def test_polygon_boolean_point_parity(case):
    a, b = _case_polygons(case)
    inter = polygon_intersection(a, b)
    union = polygon_union(a, b)
    diff = polygon_difference(a, b)
    rng = np.random.default_rng(5000 + case)
    pts = _samples(a, b, rng)
    dmin = np.minimum(_min_edge_dist(a, pts), _min_edge_dist(b, pts))
    for res in (inter, union, diff):
        dmin = np.minimum(dmin, _min_edge_dist(res, pts))
    keep = dmin >= MARGIN
    pts = pts[keep]
    assert len(pts) > 20, f"case {case}: sampling degenerated"
    in_a = a.contains_points(pts)
    in_b = b.contains_points(pts)
    got_i = inter.contains_points(pts)
    got_u = union.contains_points(pts)
    got_d = diff.contains_points(pts)
    for name, got, want in (
        ("intersection", got_i, in_a & in_b),
        ("union", got_u, in_a | in_b),
        ("difference", got_d, in_a & ~in_b),
    ):
        bad = np.nonzero(got != want)[0]
        assert len(bad) == 0, (
            f"case {case} {name}: {len(bad)} parity failures, first at "
            f"{geom.xyz_to_latlng(pts[bad[0]][None, :])} "
            f"(inA={bool(in_a[bad[0]])}, inB={bool(in_b[bad[0]])}, "
            f"got={bool(got[bad[0]])})"
        )
