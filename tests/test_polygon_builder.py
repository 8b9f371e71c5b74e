"""General S2PolygonBuilder assembly (VERDICT r3 #6): undirected/XOR
edge-soup modes the boolean-op pipeline sidesteps
(S2PolygonBuilder.php:32-120 options, 432-495 assembly)."""

import numpy as np
import pytest

from s2_geometry_library_php_spark.s2core import geom
from s2_geometry_library_php_spark.s2core.polygon_builder import (
    PolygonBuilder,
    is_normalized,
)
from s2_geometry_library_php_spark.s2core.region import LoopRegion

# two abutting quads sharing the equator segment lng [0, 10]:
# A above (lat 0..8), B below (lat -8..0); union = one 8x10+8x10 band
QUAD_A = [(0.0, 0.0), (0.0, 10.0), (8.0, 10.0), (8.0, 0.0)]
QUAD_B = [(0.0, 10.0), (0.0, 0.0), (-8.0, 0.0), (-8.0, 10.0)]

INSIDE_A = (4.0, 5.0)
INSIDE_B = (-4.0, 5.0)
OUTSIDE = [(9.0, 5.0), (-9.0, 5.0), (4.0, 12.0), (-4.0, -2.0)]


def _loop_xyz(latlng):
    return LoopRegion(np.asarray(latlng, dtype=np.float64)).vertices


def _pt(lat, lng):
    return geom.latlng_to_xyz(np.radians([lat]), np.radians([lng]))


def _check_union_region(poly):
    assert bool(poly.contains_points(_pt(*INSIDE_A))[0])
    assert bool(poly.contains_points(_pt(*INSIDE_B))[0])
    for q in OUTSIDE:
        assert not bool(poly.contains_points(_pt(*q))[0]), q
    # the shared equator segment's midpoint neighborhood is interior
    assert bool(poly.contains_points(_pt(0.001, 5.0))[0])
    assert bool(poly.contains_points(_pt(-0.001, 5.0))[0])


def test_directed_xor_merges_shared_boundary():
    b = PolygonBuilder.directed_xor()
    b.add_loop(_loop_xyz(QUAD_A))
    b.add_loop(_loop_xyz(QUAD_B))
    poly, unused = b.assemble_polygon()
    assert unused == []
    assert len(poly.loops) == 1
    assert len(poly.loops[0].vertices) == 6  # shared edge XORed away
    _check_union_region(poly)


def test_undirected_xor_handles_arbitrary_edge_directions():
    rng = np.random.default_rng(3)
    b = PolygonBuilder.undirected_xor()
    for quad in (QUAD_A, QUAD_B):
        v = _loop_xyz(quad)
        m = len(v)
        for i in range(m):
            p, q = v[i], v[(i + 1) % m]
            if rng.random() < 0.5:
                p, q = q, p  # scramble directions: must not matter
            b.add_edge(p, q)
    poly, unused = b.assemble_polygon()
    assert unused == []
    assert len(poly.loops) == 1
    _check_union_region(poly)
    assert is_normalized(poly.loops[0].vertices)


def test_undirected_union_keeps_abutting_loops_separate():
    # the "Kansas City, KS / Kansas City, MO" mode: no XOR, so the
    # shared segment survives in both loops
    b = PolygonBuilder.undirected_union()
    b.add_loop(_loop_xyz(QUAD_A))
    b.add_loop(_loop_xyz(QUAD_B))
    loops, unused = b.assemble_loops()
    assert unused == []
    assert len(loops) == 2
    regions = [LoopRegion.from_xyz(v if is_normalized(v) else v[::-1].copy())
               for v in loops]
    got_a = sum(bool(r.contains_points(_pt(*INSIDE_A))[0]) for r in regions)
    got_b = sum(bool(r.contains_points(_pt(*INSIDE_B))[0]) for r in regions)
    assert got_a == 1 and got_b == 1


def test_dangling_edges_reported_unused():
    b = PolygonBuilder.directed_xor()
    b.add_loop(_loop_xyz(QUAD_A))
    b.add_edge(_pt(20.0, 20.0)[0], _pt(21.0, 21.0)[0])  # stray edge
    poly, unused = b.assemble_polygon()
    assert len(poly.loops) == 1
    assert len(unused) == 1
    _a = poly.loops[0]
    assert bool(_a.contains_points(_pt(*INSIDE_A))[0])


def test_merge_distance_cancels_jittered_shared_edges():
    rng = np.random.default_rng(9)
    b = PolygonBuilder.directed_xor(merge_distance=1e-9)
    b.add_loop(_loop_xyz(QUAD_A))
    vb = _loop_xyz(QUAD_B)
    vb = vb + rng.normal(0.0, 1e-12, vb.shape)  # breaks exact keys
    vb /= np.linalg.norm(vb, axis=1, keepdims=True)
    b.add_loop(vb)
    poly, unused = b.assemble_polygon()
    assert unused == []
    assert len(poly.loops) == 1
    _check_union_region(poly)


def test_validate_rejects_self_crossing_loop():
    bow = _loop_xyz([(0.0, 0.0), (5.0, 5.0), (0.0, 5.0), (5.0, 0.0)])
    b = PolygonBuilder(undirected=False, xor=False, validate=True)
    m = len(bow)
    for i in range(m):
        b.add_edge(bow[i], bow[(i + 1) % m])
    loops, unused = b.assemble_loops()
    assert loops == []
    assert len(unused) >= 4


def test_add_polygon_roundtrip_with_hole():
    # shell + hole polygon added and reassembled: XOR of the directed
    # convention (shells CCW, holes CW) must reproduce both loops
    from s2_geometry_library_php_spark.s2core.region import PolygonRegion

    shell = LoopRegion(np.array([(-10.0, -10.0), (-10.0, 10.0),
                                 (10.0, 10.0), (10.0, -10.0)]))
    hole = LoopRegion(np.array([(-3.0, -3.0), (-3.0, 3.0),
                                (3.0, 3.0), (3.0, -3.0)]))
    src = PolygonRegion([shell, hole])
    b = PolygonBuilder.directed_xor()
    b.add_polygon(src)
    poly, unused = b.assemble_polygon()
    assert unused == []
    assert len(poly.loops) == 2
    pts = np.vstack([
        _pt(0.0, 0.0),    # in hole -> outside
        _pt(6.0, 0.0),    # between hole and shell -> inside
        _pt(12.0, 0.0),   # outside shell
    ])
    got = poly.contains_points(pts).tolist()
    assert got == src.contains_points(pts).tolist() == [False, True, False]
