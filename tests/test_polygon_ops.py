"""Polygon boolean ops (intersection/union/difference) vs brute-force
point-sampled set algebra — the executable semantics of the
commented-out S2Polygon::initToIntersection/Union/Difference
(S2Polygon.php:599-707) + builder assembly (S2PolygonBuilder.php:432-495).
"""

import numpy as np

from s2_geometry_library_php_spark.s2core import geom
from s2_geometry_library_php_spark.s2core.polygon_ops import (
    loop_signed_area,
    polygon_difference,
    polygon_intersection,
    polygon_to_spec,
    polygon_union,
)
from s2_geometry_library_php_spark.s2core.region import region_from_params


def _quad(lat0, lat1, lng0, lng1):
    return region_from_params(
        "polygon", [lat0, lng0, lat0, lng1, lat1, lng1, lat1, lng0], [0]
    )


def _pts(n=20000, seed=7):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-50, 60, n)
    lng = rng.uniform(-50, 60, n)
    return geom.latlng_to_xyz(np.radians(lat), np.radians(lng))


CASES = [
    ("overlap", _quad(0.0, 30.0, 0.0, 30.0), _quad(15.0, 45.0, 15.0, 45.0)),
    ("nested", _quad(0.0, 30.0, 0.0, 30.0), _quad(5.0, 10.0, 5.0, 10.0)),
    ("disjoint", _quad(0.0, 30.0, 0.0, 30.0), _quad(-40.0, -20.0, -40.0, -20.0)),
    (
        "concave",
        region_from_params(
            "polygon",
            [10.0, 10.0, 10.0, 18.0, 13.0, 18.0, 13.0, 16.0, 11.5, 16.0,
             11.5, 14.0, 13.0, 14.0, 13.0, 12.0, 11.5, 12.0, 11.5, 10.0],
            [0],
        ),
        _quad(9.0, 12.5, 9.0, 20.0),
    ),
    (
        "shell_hole",
        region_from_params(
            "polygon",
            [0.0, 0.0, 0.0, 30.0, 30.0, 30.0, 30.0, 0.0,
             8.0, 8.0, 8.0, 22.0, 22.0, 22.0, 22.0, 8.0],
            [0, 4],
        ),
        _quad(5.0, 25.0, 5.0, 25.0),
    ),
]


def test_boolean_ops_match_pointwise_set_algebra():
    pts = _pts()
    for name, a, b in CASES:
        in_a = a.contains_points(pts)
        in_b = b.contains_points(pts)
        for op, fn, ref in (
            ("intersection", polygon_intersection, in_a & in_b),
            ("union", polygon_union, in_a | in_b),
            ("difference", polygon_difference, in_a & ~in_b),
        ):
            got = fn(a, b).contains_points(pts)
            assert np.array_equal(got, ref), (name, op)


def test_result_loops_are_normalized_ccw():
    for _name, a, b in CASES:
        for fn in (polygon_intersection, polygon_union, polygon_difference):
            for lp in fn(a, b).loops:
                assert loop_signed_area(lp.vertices) >= 0.0


def test_spec_round_trip_preserves_containment():
    pts = _pts(5000, seed=11)
    a, b = CASES[0][1], CASES[0][2]
    inter = polygon_intersection(a, b)
    spec = polygon_to_spec(101, inter)
    rebuilt = region_from_params(
        spec["kind"], spec["params"], spec["loop_offsets"]
    )
    # degree round-trip perturbs vertices by ~1e-15; only points within
    # that band of the boundary may flip, none in a random sample
    assert np.array_equal(
        rebuilt.contains_points(pts), inter.contains_points(pts)
    )


def test_tile_clipped_area_conservation(spark):
    """Fixed-level tiles partition the sphere, so per-tile clipped
    areas must sum to the region area — for every loop/polygon
    fixture, including the shell+hole and the two-disjoint-shells
    polygons (the equator-aligned shell shares edges with S2 cell
    boundaries, exercising collinear-overlap clipping)."""
    from s2_geometry_library_php_spark.operators.measures import (
        region_measures_numpy,
        tile_clipped_measures,
        tile_clipped_measures_numpy,
    )
    from s2_geometry_library_php_spark.sources import region_fixtures

    specs = {s["region_id"]: s for s in region_fixtures()}
    for rid, lvl in [(7, 6), (8, 7), (11, 6), (12, 6)]:
        kernel = dict(tile_clipped_measures_numpy(specs[rid], lvl))
        total = sum(kernel.values())
        full = next(
            r[1] for r in region_measures_numpy([specs[rid]]) if r[0] == rid
        )
        assert abs(total - full) / full < 1e-5, (rid, total, full)
    # Spark path row-matches the kernel twin for the shell+hole case
    got = {
        r.tile_token: r.area_sr
        for r in tile_clipped_measures(spark, specs[11], 6).collect()
    }
    want = dict(tile_clipped_measures_numpy(specs[11], 6))
    assert set(got) == set(want)
    for t in got:
        assert abs(got[t] - want[t]) <= 2e-9, (t, got[t], want[t])


def test_boolean_ops_shared_collinear_edges():
    """Exact collinear boundary overlaps (adjacent quads sharing a
    meridian edge; a quad nested flush against another's boundary)
    must resolve by interior side, not midpoint parity: the shared
    segment is kept once when the interiors overlap on the same side
    and dropped when they merely face each other (adjacency)."""
    pts = _pts(20000, seed=13)

    # adjacency: A and B share the lng=10 meridian segment,
    # interiors facing (antiparallel shared edges)
    a = _quad(0.0, 10.0, 0.0, 10.0)
    b = _quad(0.0, 10.0, 10.0, 20.0)
    in_a, in_b = a.contains_points(pts), b.contains_points(pts)
    assert np.array_equal(
        polygon_union(a, b).contains_points(pts), in_a | in_b
    )
    assert np.array_equal(
        polygon_difference(a, b).contains_points(pts), in_a & ~in_b
    )
    inter = polygon_intersection(a, b)
    assert not inter.loops or not inter.contains_points(pts).any()

    # flush nesting: B shares A's equator edge and sub-segments of
    # both meridian edges, interiors on the SAME side
    c = _quad(0.0, 5.0, 0.0, 10.0)
    in_c = c.contains_points(pts)
    assert np.array_equal(
        polygon_intersection(a, c).contains_points(pts), in_a & in_c
    )
    assert np.array_equal(
        polygon_union(a, c).contains_points(pts), in_a | in_c
    )
    assert np.array_equal(
        polygon_difference(a, c).contains_points(pts), in_a & ~in_c
    )


def test_boolean_ops_survive_vertex_jitter():
    """Snap-radius assembly (S2PolygonBuilder.php:661-663 vertex-merge
    index): 1e-12 xyz jitter applied independently per polygon —
    near-coincident 'shared' vertices no longer match exactly, so
    chaining must merge them within the snap radius.  Pointwise set
    algebra still holds on a random sample (no sample point lands in
    the 1e-12 boundary band)."""
    from s2_geometry_library_php_spark.s2core.region import (
        LoopRegion,
        PolygonRegion,
    )

    rng = np.random.default_rng(41)

    def jitter(poly):
        loops = []
        for lp in poly.loops:
            v = lp.vertices + rng.uniform(-1e-12, 1e-12, lp.vertices.shape)
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            loops.append(LoopRegion.from_xyz(v))
        return PolygonRegion(loops)

    pts = _pts(20000, seed=17)
    for name, a0, b0 in CASES:
        a, b = jitter(a0), jitter(b0)
        in_a, in_b = a.contains_points(pts), b.contains_points(pts)
        for op, fn, ref in (
            ("intersection", polygon_intersection, in_a & in_b),
            ("union", polygon_union, in_a | in_b),
            ("difference", polygon_difference, in_a & ~in_b),
        ):
            got = fn(a, b).contains_points(pts)
            assert np.array_equal(got, ref), (name, op)


def test_region_measures_non_normalized_loop_fixup(spark):
    """A valid but non-normalized loop (encloses MORE than half the
    sphere — the reversed small quad) fans to a negative raw sum; the
    native-SQL path must apply the reference's per-loop 'areaSum < 0
    -> += 4pi' fixup (S2Loop.php:258-319) and agree with the kernel
    twin: area = 4pi - small_quad_area."""
    import math

    from s2_geometry_library_php_spark.operators.measures import (
        region_measures,
        region_measures_numpy,
    )

    quad_ccw = [0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0, 0.0]
    inverted = []
    for k in range(len(quad_ccw) - 2, -2, -2):
        inverted.extend(quad_ccw[k : k + 2])
    specs = [
        {"region_id": 1, "kind": "loop", "params": quad_ccw},
        {"region_id": 2, "kind": "loop", "params": inverted},
    ]
    got = {
        r.region_id: (r.area_sr, r.centroid_lat, r.centroid_lon)
        for r in region_measures(spark, specs).collect()
    }
    want = {r[0]: (r[1], r[2], r[3]) for r in region_measures_numpy(specs)}
    for rid in (1, 2):
        assert abs(got[rid][0] - want[rid][0]) <= 2e-9, (rid, got, want)
    assert abs((got[1][0] + got[2][0]) - 4.0 * math.pi) < 1e-6
    assert got[2][0] > 2.0 * math.pi  # fixup applied, not negative


def test_polygon_intersection_with_hole_clips():
    """Round-1 regression: clipping a tile-sized quad against a
    shell+hole polygon across the HOLE boundary must produce loops
    (hole pieces reversed to interior-on-the-left)."""
    import numpy as np

    from s2_geometry_library_php_spark.s2core import geom
    from s2_geometry_library_php_spark.s2core.polygon_ops import (
        polygon_intersection,
    )
    from s2_geometry_library_php_spark.s2core.region import (
        region_from_params,
    )

    donut = region_from_params(
        "polygon",
        [30.0, 10.0, 30.0, 20.0, 40.0, 20.0, 40.0, 10.0,
         33.0, 13.0, 33.0, 17.0, 37.0, 17.0, 37.0, 13.0],
        [0, 4],
    )
    # quad straddling the hole's west edge, inside the shell
    quad = region_from_params(
        "polygon", [34.0, 12.0, 34.0, 14.0, 36.0, 14.0, 36.0, 12.0], [0]
    )
    clipped = polygon_intersection(donut, quad)
    assert clipped.loops
    area = sum(
        geom.loop_area_centroid(lp.vertices)[0] for lp in clipped.loops
    )
    # expected: the quad minus its overlap with the hole (flat approx)
    quad_area = geom.loop_area_centroid(quad.loops[0].vertices)[0]
    overlap = region_from_params(
        "polygon", [34.0, 13.0, 34.0, 14.0, 36.0, 14.0, 36.0, 13.0], [0]
    )
    overlap_area = geom.loop_area_centroid(overlap.loops[0].vertices)[0]
    # the overlap quad's lat edges are DIFFERENT geodesics than the
    # clipped arcs (a geodesic through (34,12)-(34,14) is not the one
    # through (34,13)-(34,14)), so equality holds only to the sliver
    # between them (~5e-10 sr here)
    assert abs(area - (quad_area - overlap_area)) / quad_area < 1e-5
    _ = np
