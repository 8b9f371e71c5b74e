"""Re-derived S2 invariants (SURVEY.md §5.2 item 2) — seeded,
deterministic property tests over the s2core kernels."""

import numpy as np
import pytest

from s2_geometry_library_php_spark.s2core import cellid as cid
from s2_geometry_library_php_spark.s2core import geom
from s2_geometry_library_php_spark.s2core.cell import Cell
from s2_geometry_library_php_spark.s2core.coverer import (
    RegionCoverer,
    denormalize,
    expand_cell_union,
    normalize_cell_union,
)
from s2_geometry_library_php_spark.s2core.region import (
    CapRegion,
    LoopRegion,
    PolygonRegion,
    RectRegion,
)

RNG = np.random.default_rng(42)
N = 10_000
LAT = RNG.uniform(-89.9, 89.9, N)
LNG = RNG.uniform(-179.9, 179.9, N)
IDS = cid.cell_id_from_latlng_degrees(LAT, LNG)


def test_encode_decode_identity():
    clat, clng = cid.cell_id_to_center_latlng(IDS)
    again = cid.cell_id_from_latlng_radians(clat, clng)
    assert np.array_equal(IDS, again)


def test_all_leaf_and_level():
    assert np.all(cid.is_leaf(IDS))
    assert np.all(cid.level_of(IDS) == 30)


def test_parent_contains_child_all_levels():
    for level in (0, 1, 5, 12, 20, 29):
        p = cid.parent(IDS, level)
        assert np.all(cid.level_of(p) == level)
        assert np.all(cid.range_min(p) <= IDS)
        assert np.all(IDS <= cid.range_max(p))


def test_parent_is_prefix_stable():
    # parent(parent(id, 12), 5) == parent(id, 5)
    p12 = cid.parent(IDS, 12)
    assert np.array_equal(cid.parent(p12, 5), cid.parent(IDS, 5))


def test_scalar_decode_matches_vectorized():
    face, i, j, orient = cid.cell_to_face_ij_orientation(IDS[:500])
    for k in range(500):
        f, ii, jj, oo = cid.decode_scalar(int(IDS[k]))
        assert (f, ii, jj, oo) == (
            int(face[k]),
            int(i[k]),
            int(j[k]),
            int(orient[k]),
        )


def test_face_boundary_and_pole_cases():
    # 6 face centers, 8 cube corners, poles, antimeridian
    special_lat = [0, 0, 90, 0, 0, -90, 45, -45, 90, -90, 0, 0]
    special_lng = [0, 90, 0, 180, -90, 0, 45, -135, 123, -45, 180, -180]
    ids = cid.cell_id_from_latlng_degrees(
        np.array(special_lat, dtype=float), np.array(special_lng, dtype=float)
    )
    assert np.all(cid.is_leaf(ids))
    clat, clng = cid.cell_id_to_center_latlng(ids)
    again = cid.cell_id_from_latlng_radians(clat, clng)
    assert np.array_equal(ids, again)


def test_token_roundtrip_random():
    toks = cid.token_from_id(IDS[:2000])
    back = cid.id_from_token(toks)
    assert np.array_equal(IDS[:2000], back)
    for t in toks[:100]:
        assert not t.endswith("0") and 1 <= len(t) <= 16


def test_edge_neighbors_are_symmetric():
    ids = cid.parent(IDS[:300], 10)
    nbrs = cid.edge_neighbors(ids)
    assert np.all(cid.level_of(nbrs.ravel()) == 10)
    # neighbor-of-neighbor contains the original
    for k in range(50):
        back = cid.edge_neighbors(nbrs[k])
        assert int(ids[k]) in {int(x) for x in back.ravel()}


def test_all_neighbors_contains_edge_neighbors():
    ids = cid.parent(IDS[:200], 8)
    ring8 = cid.all_neighbors(ids)
    ring4 = cid.edge_neighbors(ids)
    for k in range(len(ids)):
        assert {int(x) for x in ring4[k]} <= {int(x) for x in ring8[k]}
        assert int(ids[k]) not in {int(x) for x in ring8[k]}


def test_normalize_collapses_siblings_and_dedups():
    pid = int(cid.parent(IDS[:1], 7)[0])
    arr = np.asarray([pid], dtype=np.uint64)
    kids = []
    c = int(cid.child_begin(arr)[0])
    for _ in range(4):
        kids.append(c)
        c = int(cid.next_cell(np.asarray([c], dtype=np.uint64))[0])
    assert normalize_cell_union(kids) == [pid]
    # contained cells dropped; idempotent
    mixed = kids + [pid, int(cid.parent(np.asarray([pid], dtype=np.uint64), 3)[0])]
    out = normalize_cell_union(mixed)
    assert out == normalize_cell_union(out)
    assert len(out) == 1  # everything inside the level-3 ancestor


def test_denormalize_respects_min_level():
    pid = int(cid.parent(IDS[:1], 4)[0])
    out = denormalize([pid], 6, 1)
    arr = np.asarray(out, dtype=np.uint64)
    assert np.all(cid.level_of(arr) == 6)
    assert len(out) == 16


def test_range_partition_of_leaf_space():
    # children ranges tile the parent range exactly
    pid = int(cid.parent(IDS[:1], 9)[0])
    arr = np.asarray([pid], dtype=np.uint64)
    kids = []
    c = int(cid.child_begin(arr)[0])
    for _ in range(4):
        kids.append(c)
        c = int(cid.next_cell(np.asarray([c], dtype=np.uint64))[0])
    karr = np.asarray(kids, dtype=np.uint64)
    los, his = cid.range_min(karr), cid.range_max(karr)
    assert int(los[0]) == int(cid.range_min(arr)[0])
    assert int(his[-1]) == int(cid.range_max(arr)[0])
    for k in range(3):
        assert int(his[k]) + 2 == int(los[k + 1])


@pytest.mark.parametrize("max_cells", [4, 8, 20])
def test_cap_covering_superset_interior_subset(max_cells):
    cap = CapRegion(40.0, -100.0, 0.05)
    cov = RegionCoverer(max_cells=max_cells).get_covering(cap)
    assert len(cov) <= max(max_cells, 6)
    interior = RegionCoverer(max_cells=max_cells, max_level=14).get_interior_covering(cap)
    lat = RNG.uniform(35, 45, 4000)
    lng = RNG.uniform(-106, -94, 4000)
    pts = geom.latlng_to_xyz(np.radians(lat), np.radians(lng))
    inside = cap.contains_points(pts)
    leaf = cid.cell_id_from_latlng_degrees(lat, lng)

    def covered(cells):
        arr = np.asarray(cells, dtype=np.uint64)
        out = np.zeros(len(leaf), dtype=bool)
        for lo, hi in zip(cid.range_min(arr), cid.range_max(arr)):
            out |= (leaf >= lo) & (leaf <= hi)
        return out

    assert np.all(covered(cov)[inside])  # covering ⊇ region
    assert np.all(inside[covered(interior)])  # interior ⊆ region


def test_loop_parity_invariant_under_rotation():
    verts = np.array([[10.0, 10.0], [10.0, 20.0], [20.0, 20.0], [20.0, 15.0], [20.0, 10.0]])
    lat = RNG.uniform(5, 25, 2000)
    lng = RNG.uniform(5, 25, 2000)
    pts = geom.latlng_to_xyz(np.radians(lat), np.radians(lng))
    base = LoopRegion(verts).contains_points(pts)
    for shift in (1, 2, 3):
        rotated = LoopRegion(np.roll(verts, shift, axis=0))
        assert np.array_equal(base, rotated.contains_points(pts))


def test_loop_invert_complements():
    verts = np.array([[10.0, 10.0], [10.0, 20.0], [20.0, 20.0], [20.0, 10.0]])
    inverted = LoopRegion(verts[::-1])
    lat = RNG.uniform(-60, 60, 2000)
    lng = RNG.uniform(-170, 170, 2000)
    pts = geom.latlng_to_xyz(np.radians(lat), np.radians(lng))
    inside = LoopRegion(verts).contains_points(pts)
    outside = inverted.contains_points(pts)
    assert np.array_equal(inside, ~outside)


def test_polygon_hole_parity():
    shell = LoopRegion(np.array([[30.0, 10.0], [30.0, 20.0], [40.0, 20.0], [40.0, 10.0]]))
    hole = LoopRegion(np.array([[33.0, 13.0], [33.0, 17.0], [37.0, 17.0], [37.0, 13.0]]))
    poly = PolygonRegion([shell, hole])
    pts = geom.latlng_to_xyz(
        np.radians(np.array([35.0, 31.0, 45.0])),
        np.radians(np.array([15.0, 15.0, 15.0])),
    )
    inside = poly.contains_points(pts)
    assert list(inside) == [False, True, False]  # in hole, in ring, outside


def test_rect_antimeridian_wrap():
    r = RectRegion(np.radians(-10), np.radians(10), np.radians(170), np.radians(-170))
    pts = geom.latlng_to_xyz(
        np.radians(np.array([0.0, 0.0, 0.0])),
        np.radians(np.array([175.0, -175.0, 0.0])),
    )
    assert list(r.contains_points(pts)) == [True, True, False]


def test_expand_cell_union_buffers():
    base = int(cid.parent(IDS[:1], 10)[0])
    out = expand_cell_union([base], 10)
    arr = np.asarray(out, dtype=np.uint64)
    ring = {int(x) for x in cid.all_neighbors(np.asarray([base], dtype=np.uint64)).ravel()}

    def covered(cells, probe):
        a = np.asarray(cells, dtype=np.uint64)
        lo, hi = cid.range_min(a), cid.range_max(a)
        p = np.uint64(probe)
        return bool(np.any((lo <= p) & (p <= hi)))

    assert covered(out, base)
    for nbr in ring:
        assert covered(out, nbr)


def test_cell_exact_area_sums_to_sphere():
    # 6 faces * 4^2 level-2 cells cover the sphere: total area = 4*pi
    total = 0.0
    for face in range(6):
        f = Cell.from_face(face)
        for c1 in f.children():
            for c2 in c1.children():
                total += c2.exact_area()
    assert total == pytest.approx(4 * np.pi, rel=1e-9)


def test_robust_ccw_antisymmetry():
    pts = geom.latlng_to_xyz(np.radians(LAT[:300]), np.radians(LNG[:300]))
    for k in range(0, 297, 3):
        a, b, c = pts[k], pts[k + 1], pts[k + 2]
        s1 = geom.robust_ccw(a, b, c)
        assert geom.robust_ccw(c, b, a) == -s1
        assert geom.robust_ccw(b, c, a) == s1


def test_simple_covering_flood_fill():
    """Fixed-level flood fill (S2RegionCoverer.php:478-503): output
    must be exactly the set of level-L cells that may intersect the
    region, and must cover every interior sample point."""
    import numpy as np

    from s2_geometry_library_php_spark.s2core import cellid as cid
    from s2_geometry_library_php_spark.s2core import geom
    from s2_geometry_library_php_spark.s2core.cell import Cell
    from s2_geometry_library_php_spark.s2core.coverer import simple_covering
    from s2_geometry_library_php_spark.s2core.region import CapRegion

    level = 10
    cap = CapRegion(48.85, 2.35, 0.01)
    axis_leaf = int(
        cid.cell_id_from_latlng_degrees(
            np.array([48.85]), np.array([2.35])
        )[0]
    )
    start = int(cid.parent(np.array([axis_leaf], dtype=np.uint64), level)[0])
    cov = simple_covering(cap, start, level)
    cov_set = set(cov)
    # soundness: every cell may intersect; neighbors outside the set
    # must NOT intersect (the fill reached a fixpoint)
    for c in cov:
        assert cap.may_intersect_cell(Cell(c))
        for nb in cid.edge_neighbors(np.array([c], dtype=np.uint64))[0]:
            if int(nb) not in cov_set:
                assert not cap.may_intersect_cell(Cell(int(nb)))
    # completeness: the level-L cell of every interior sample is present
    rng = np.random.default_rng(11)
    lat = rng.uniform(48.3, 49.4, 4000)
    lng = rng.uniform(1.5, 3.2, 4000)
    pts = geom.latlng_to_xyz(np.radians(lat), np.radians(lng))
    inside = cap.contains_points(pts)
    leaves = cid.cell_id_from_latlng_degrees(lat[inside], lng[inside])
    parents = cid.parent(leaves, level)
    assert {int(p) for p in parents} <= cov_set


def test_cap_add_cap_invariants():
    """S2Cap::addCap (S2Cap.php:259-276): the grown cap contains both
    inputs (in either argument order), empty adopts the other side,
    and opposite-hemisphere caps saturate to full."""
    import numpy as np

    from s2_geometry_library_php_spark.s2core import geom
    from s2_geometry_library_php_spark.s2core.cell import Cap

    rng = np.random.default_rng(23)
    lat = rng.uniform(-80, 80, 40)
    lng = rng.uniform(-170, 170, 40)
    axes = geom.latlng_to_xyz(np.radians(lat), np.radians(lng))
    angles = rng.uniform(0.001, 0.6, 40)
    caps = [Cap.from_axis_angle(axes[i], float(angles[i])) for i in range(40)]

    def contains_with_ulp_slack(u, t):
        # ROUND_UP slack on the height does not always survive the
        # asin round-trip of angle_radians (same caveat as canonical
        # S2); allow 1e-14 rad on top of the exact test.
        if u.contains_cap(t):
            return True
        return u.angle_radians() + 1e-14 >= float(
            geom.angle_between(u.axis, t.axis)
        ) + t.angle_radians()

    for i in range(0, 40, 2):
        a, b = caps[i], caps[i + 1]
        for u in (a.add_cap(b), b.add_cap(a)):
            assert contains_with_ulp_slack(u, a), i
            assert contains_with_ulp_slack(u, b), i
    # empty adopts
    e = Cap.empty().add_cap(caps[0])
    assert abs(e.height - caps[0].height) < 1e-15
    assert np.allclose(e.axis, caps[0].axis)
    assert caps[0].add_cap(Cap.empty()).contains_cap(caps[0])
    # antipodal saturation
    n = Cap.from_axis_angle(np.array([0.0, 0.0, 1.0]), 0.5)
    s = Cap.from_axis_angle(np.array([0.0, 0.0, -1.0]), 0.5)
    assert n.add_cap(s).is_full()
    # rim points of b are inside the union cap
    a, b = caps[0], caps[1]
    u = a.add_cap(b)
    ortho = np.cross(b.axis, [0.0, 0.0, 1.0])
    ortho = ortho / np.linalg.norm(ortho)
    th = b.angle_radians()
    rim = b.axis * np.cos(th) + ortho * np.sin(th)
    assert u.contains_point(rim)


# --- rect distance (S2LatLngRect.getDistance) -----------------------------------
def test_rect_distance_point_invariants():
    import math

    from s2_geometry_library_php_spark.s2core.cell import (
        LatLngRect,
        R1Interval,
        S1Interval,
    )

    rects = [
        LatLngRect(
            R1Interval(math.radians(35.0), math.radians(45.0)),
            S1Interval(math.radians(-10.0), math.radians(10.0)),
        ),
        # antimeridian wrap
        LatLngRect(
            R1Interval(math.radians(-15.0), math.radians(15.0)),
            S1Interval(math.radians(170.0), math.radians(-170.0)),
        ),
        # full-lng polar band
        LatLngRect(
            R1Interval(math.radians(80.0), math.radians(90.0)),
            S1Interval.full(),
        ),
    ]
    rng = np.random.default_rng(5)
    lats = rng.uniform(-89.9, 89.9, 300)
    lngs = rng.uniform(-180.0, 180.0, 300)
    for rect in rects:
        for la, ln in zip(lats, lngs):
            d = rect.get_distance_latlng(math.radians(la), math.radians(ln))
            assert 0.0 <= d <= math.pi
            inside = rect.contains_latlng(math.radians(la), math.radians(ln))
            if inside:
                assert d == 0.0
            else:
                assert d > 0.0
            # d is a true lower bound: distance to sampled boundary
            # points can only be >= d (up to discretization)
            corner = geom.latlng_to_xyz(
                np.array([rect.lat.lo, rect.lat.lo, rect.lat.hi, rect.lat.hi]),
                np.array([rect.lng.lo, rect.lng.hi, rect.lng.lo, rect.lng.hi]),
            )
            p = geom.latlng_to_xyz(
                np.radians(np.array([la])), np.radians(np.array([ln]))
            )
            corner_d = float(geom.angle_between(p, corner).min())
            assert d <= corner_d + 1e-12


def test_rect_distance_rect_invariants():
    import math

    from s2_geometry_library_php_spark.s2core.cell import (
        LatLngRect,
        R1Interval,
        S1Interval,
    )

    def mk(lat_lo, lat_hi, lng_lo, lng_hi):
        return LatLngRect(
            R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
            S1Interval(math.radians(lng_lo), math.radians(lng_hi)),
        )

    a = mk(10, 20, 10, 20)
    b = mk(15, 25, 15, 25)  # overlaps a
    c = mk(40, 50, 10, 20)  # north of a, same lng
    d = mk(10, 20, 60, 70)  # east of a, same lat
    assert a.get_distance_rect(b) == 0.0
    assert abs(a.get_distance_rect(c) - math.radians(20.0)) < 1e-12
    # symmetry
    for x, y in [(a, c), (a, d), (c, d)]:
        assert abs(x.get_distance_rect(y) - y.get_distance_rect(x)) < 1e-12
    # consistency with point distance: rect-to-rect <= point-in-y to x
    rng = np.random.default_rng(9)
    for _ in range(50):
        la = math.radians(rng.uniform(10, 20))
        ln = math.radians(rng.uniform(60, 70))
        assert a.get_distance_rect(d) <= a.get_distance_latlng(la, ln) + 1e-12


def test_rect_distance_sql_matches_kernel(spark):
    """The native-SQL rect distance (region_distance.rect_distance_col)
    must agree with the faithful-port kernel on a dense probe grid x
    every fixture region bound (round-6)."""
    import math

    from pyspark.sql import functions as F

    from s2_geometry_library_php_spark.operators.region_distance import (
        rect_distance_col,
        regions_rect_df,
    )
    from s2_geometry_library_php_spark.s2core.region import (
        region_from_params,
    )
    from s2_geometry_library_php_spark.sources import region_fixtures

    rng = np.random.default_rng(11)
    pts = [
        (int(i), float(la), float(ln))
        for i, (la, ln) in enumerate(
            zip(
                rng.uniform(-89.9, 89.9, 200),
                rng.uniform(-180.0, 180.0, 200),
            )
        )
    ] + [(900, 0.0, -180.0), (901, 90.0, 0.0), (902, -90.0, 17.0)]
    probes = spark.createDataFrame(pts, "probe_id long, lat double, lon double")
    rects = regions_rect_df(spark, region_fixtures())
    got = {
        (r.probe_id, r.region_id): r.d6
        for r in probes.crossJoin(F.broadcast(rects))
        .select(
            "probe_id",
            "region_id",
            F.round(rect_distance_col(F.col("lat"), F.col("lon")), 6).alias("d6"),
        )
        .collect()
    }
    for spec in region_fixtures():
        reg = region_from_params(
            spec["kind"], spec["params"], spec.get("loop_offsets")
        )
        b = reg.get_rect_bound()
        for pid, la, ln in pts:
            plat = math.radians(la)
            plng = math.radians(180.0 if ln == -180.0 else ln)
            want = round(b.get_distance_latlng(plat, plng), 6)
            assert abs(got[(pid, spec["region_id"])] - want) <= 1e-6, (
                pid, spec["region_id"], got[(pid, spec["region_id"])], want
            )


# --- loop area / centroid + polygon nesting --------------------------------------
def test_loop_area_centroid_invariants():
    import math

    from s2_geometry_library_php_spark.s2core.region import (
        LoopRegion,
        region_from_params,
    )

    quad = region_from_params(
        "loop", [40.0, -75.0, 40.0, -70.0, 45.0, -75.0 + 5.0, 45.0, -75.0]
    )
    area, cen = geom.loop_area_centroid(quad.vertices)
    assert 0.0 < area < 2 * math.pi
    # loop + inverted loop partition the sphere
    inv = LoopRegion.from_xyz(quad.vertices[::-1])
    area_inv, cen_inv = geom.loop_area_centroid(inv.vertices)
    assert abs(area + area_inv - 4 * math.pi) < 1e-9
    # centroid of the complement is the negative (integral over the
    # sphere of position is zero)
    assert np.allclose(cen, -cen_inv, atol=1e-9)
    # centroid direction points into the loop
    cn = cen / np.linalg.norm(cen)
    assert bool(quad.contains_points(cn[None, :])[0])
    # area consistency with the flat approximation for a small loop
    tiny = region_from_params(
        "loop", [0.0, 0.0, 0.0, 0.1, 0.1, 0.1, 0.1, 0.0]
    )
    t_area, _ = geom.loop_area_centroid(tiny.vertices)
    flat = math.radians(0.1) * math.radians(0.1)
    assert abs(t_area - flat) / flat < 1e-3


def test_polygon_nesting_depths_and_contains():
    from s2_geometry_library_php_spark.s2core.region import (
        polygon_contains_polygon,
        polygon_loop_depths,
        polygon_preorder,
        region_from_params,
    )
    from s2_geometry_library_php_spark.sources import region_fixtures

    specs = {s["region_id"]: s for s in region_fixtures()}
    shell_hole = region_from_params(
        "polygon", specs[11]["params"], specs[11]["loop_offsets"]
    )
    assert polygon_loop_depths(shell_hole.loops) == [0, 1]
    pre = polygon_preorder(shell_hole.loops)
    assert [d for _, d, _ in pre] == [0, 1]  # child follows parent
    two_shells = region_from_params(
        "polygon", specs[12]["params"], specs[12]["loop_offsets"]
    )
    assert polygon_loop_depths(two_shells.loops) == [0, 0]

    # containment dispatch: big quad polygon contains the shell+hole
    big = region_from_params(
        "polygon", [20.0, 0.0, 20.0, 30.0, 50.0, 30.0, 50.0, 0.0], [0]
    )
    assert polygon_contains_polygon(big, shell_hole)
    assert not polygon_contains_polygon(shell_hole, big)
    # a polygon whose hole swallows B's shell does NOT contain B
    donut = region_from_params(
        "polygon",
        [20.0, 0.0, 20.0, 30.0, 50.0, 30.0, 50.0, 0.0,
         28.0, 8.0, 28.0, 22.0, 42.0, 22.0, 42.0, 8.0],
        [0, 4],
    )
    inner = region_from_params(
        "polygon", [32.0, 12.0, 32.0, 18.0, 38.0, 18.0, 38.0, 12.0], [0]
    )
    assert not polygon_contains_polygon(donut, inner)
    assert polygon_contains_polygon(big, inner)


def test_polygon_contains_polygon_hole_in_hole_parity():
    """A's hole nested inside B's hole is a LEGAL containment case:
    the hole lies in B's complement, so the parity-based
    containsOrCrosses dispatch returns 0 for it (excludesAllHoles,
    S2Polygon.php:999-1010) — a raw loop-vs-loop intersection test
    would wrongly reject it."""
    from s2_geometry_library_php_spark.s2core.region import (
        polygon_contains_polygon,
        region_from_params,
    )

    def donut(lo, hi, hlo, hhi):
        return region_from_params(
            "polygon",
            [lo, lo, lo, hi, hi, hi, hi, lo,
             hlo, hlo, hlo, hhi, hhi, hhi, hhi, hlo],
            [0, 4],
        )

    a = donut(0.0, 30.0, 10.0, 20.0)   # big shell, small hole
    b = donut(2.0, 28.0, 8.0, 22.0)    # nested shell, BIGGER hole
    # every point of B (annulus outside its big hole) is in A's
    # annulus: shell_B ⊆ shell_A and hole_A ⊆ hole_B
    assert polygon_contains_polygon(a, b)
    assert not polygon_contains_polygon(b, a)
    # swap hole sizes: A's hole now pokes into B's interior
    a2 = donut(0.0, 30.0, 8.0, 22.0)
    b2 = donut(2.0, 28.0, 10.0, 20.0)
    assert not polygon_contains_polygon(a2, b2)


def test_ingest_validation_rejects_bad_geometry():
    import pytest as _pytest

    from s2_geometry_library_php_spark.s2core.edges import (
        loop_is_valid,
        polygon_is_valid,
    )
    from s2_geometry_library_php_spark.s2core.region import (
        region_from_params,
    )
    from s2_geometry_library_php_spark.sources import region_fixtures

    # self-intersecting bowtie loop
    with _pytest.raises(ValueError, match="cross"):
        region_from_params(
            "loop", [0.0, 0.0, 10.0, 10.0, 0.0, 10.0, 10.0, 0.0]
        )
    # duplicate vertex
    with _pytest.raises(ValueError, match="[Dd]uplicate"):
        region_from_params(
            "loop", [0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 0.0, 10.0]
        )
    # degenerate
    with _pytest.raises(ValueError, match="degenerate"):
        region_from_params("loop", [0.0, 0.0, 0.0, 10.0])
    # polygon whose two loops share an edge
    with _pytest.raises(ValueError, match="share an edge"):
        region_from_params(
            "polygon",
            [0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0, 0.0,
             0.0, 0.0, 0.0, 10.0, -10.0, 10.0, -10.0, 0.0][::1],
            [0, 4],
        )
    # polygon with crossing loops
    with _pytest.raises(ValueError, match="cross"):
        region_from_params(
            "polygon",
            [0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0, 0.0,
             5.0, 5.0, 5.0, 15.0, 15.0, 15.0, 15.0, 5.0],
            [0, 4],
        )
    # every shipped fixture remains valid
    for spec in region_fixtures():
        region_from_params(
            spec["kind"], spec["params"], spec.get("loop_offsets")
        )
    # direct predicate surface
    ok, why = loop_is_valid(
        region_from_params(
            "loop", [40.0, -75.0, 40.0, -70.0, 45.0, -70.0, 45.0, -75.0]
        ).vertices
    )
    assert ok and why == ""
    shell_hole = region_from_params(
        "polygon",
        [30.0, 10.0, 30.0, 20.0, 40.0, 20.0, 40.0, 10.0,
         33.0, 13.0, 33.0, 17.0, 37.0, 17.0, 37.0, 13.0],
        [0, 4],
    )
    ok, why = polygon_is_valid(shell_hole.loops)
    assert ok and why == ""


def test_keyspace_wrap_and_child_position():
    import math

    # nextWrap cycles the 6 face cells back to the start
    faces = cid.parent(
        cid.cell_id_from_latlng_degrees(np.array([0.0]), np.array([0.0])), 0
    )
    c = faces
    seen = [int(c[0])]
    for _ in range(6):
        c = cid.next_wrap(c)
        seen.append(int(c[0]))
    assert seen[6] == seen[0]  # full cycle over the 6 faces
    assert len(set(seen[:6])) == 6
    # prevWrap inverts nextWrap everywhere (random leaf sample)
    rng = np.random.default_rng(3)
    leafs = cid.cell_id_from_latlng_degrees(
        rng.uniform(-89, 89, 64), rng.uniform(-179, 179, 64)
    )
    for lvl in (0, 5, 17, 30):
        cells = cid.parent(leafs, lvl)
        assert np.array_equal(cid.prev_wrap(cid.next_wrap(cells)), cells)
        assert np.array_equal(cid.next_wrap(cid.prev_wrap(cells)), cells)
    # childPosition reconstructs the id from parents
    ids = cid.parent(leafs, 20)
    for lvl in range(1, 21):
        pos = cid.child_position(ids, lvl)
        par = cid.parent(ids, lvl - 1)
        stepped = cid.child_begin(par)
        lsb20 = cid.lowest_on_bit(stepped)
        stepped = stepped + (lsb20 << np.uint64(1)) * pos.astype(np.uint64)
        assert np.array_equal(cid.parent(ids, lvl), stepped)
    _ = math


def test_turn_angle_antisymmetry_and_angle():
    rng = np.random.default_rng(17)
    pts = geom.normalize(rng.standard_normal((60, 3)))
    for i in range(0, 60, 3):
        a, b, c = pts[i], pts[i + 1], pts[i + 2]
        t1 = geom.turn_angle(a, b, c)
        t2 = geom.turn_angle(c, b, a)
        assert abs(t1 + t2) < 1e-12
        # |turn| = pi - interior angle
        interior = float(geom.vertex_angle(a, b, c))
        assert abs(abs(t1) - abs(np.pi - interior)) < 1e-9
    assert geom.approx_equals(pts[0], pts[0])
    assert geom.approx_equals(1.0, 1.0 + 1e-16)
    assert not geom.approx_equals(pts[0], -pts[0])


def test_rect_from_edge_covers_edge_interior():
    import math

    from s2_geometry_library_php_spark.s2core.cell import LatLngRect

    # east-west edge at lat 60: the geodesic bulges poleward, so the
    # midpoint latitude EXCEEDS both endpoint latitudes
    a = geom.latlng_to_xyz(np.radians(60.0), np.radians(-30.0))
    b = geom.latlng_to_xyz(np.radians(60.0), np.radians(30.0))
    r_pair = LatLngRect.from_point_pair(
        math.radians(60.0), math.radians(-30.0),
        math.radians(60.0), math.radians(30.0),
    )
    r_edge = LatLngRect.from_edge(a, b)
    mid = geom.normalize((a + b) / 2.0)
    mid_lat = float(geom.xyz_to_latlng(mid)[0])
    assert not r_pair.lat.contains(mid_lat)  # endpoint rect misses it
    assert r_edge.lat.contains(mid_lat)  # edge rect covers it
    assert r_edge.contains_rect(r_pair)
    # sampled edge points all inside the edge rect
    for t in np.linspace(0, 1, 33):
        p = geom.normalize((1 - t) * a + t * b)
        la, ln = geom.xyz_to_latlng(p)
        assert r_edge.contains_latlng(float(la), float(ln))
    # planar centroid normalizes to the surface centroid direction
    cen = geom.planar_centroid(a, b, geom.latlng_to_xyz(np.radians(65.0), np.radians(0.0)))
    assert np.linalg.norm(cen) > 0


def test_polygon_intersects_polygon_cases():
    from s2_geometry_library_php_spark.s2core.region import (
        polygon_intersects_polygon,
        region_from_params,
    )

    quad = lambda lat0, lng0, lat1, lng1: region_from_params(  # noqa: E731
        "polygon", [lat0, lng0, lat0, lng1, lat1, lng1, lat1, lng0], [0]
    )
    a = quad(0.0, 0.0, 20.0, 20.0)
    overlapping = quad(10.0, 10.0, 30.0, 30.0)
    nested = quad(5.0, 5.0, 15.0, 15.0)
    disjoint = quad(40.0, 40.0, 50.0, 50.0)
    assert polygon_intersects_polygon(a, overlapping)
    assert polygon_intersects_polygon(a, nested)
    assert polygon_intersects_polygon(nested, a)
    assert not polygon_intersects_polygon(a, disjoint)
    # polygon entirely inside a donut's HOLE does not intersect it
    donut = region_from_params(
        "polygon",
        [0.0, 0.0, 0.0, 30.0, 30.0, 30.0, 30.0, 0.0,
         8.0, 8.0, 8.0, 22.0, 22.0, 22.0, 22.0, 8.0],
        [0, 4],
    )
    in_hole = quad(12.0, 12.0, 18.0, 18.0)
    in_ring = quad(2.0, 2.0, 6.0, 6.0)
    assert not polygon_intersects_polygon(donut, in_hole)
    assert not polygon_intersects_polygon(in_hole, donut)
    assert polygon_intersects_polygon(donut, in_ring)
    assert polygon_intersects_polygon(in_ring, donut)


def test_cell_approx_area_tracks_exact():
    from s2_geometry_library_php_spark.s2core.cell import Cell

    rng = np.random.default_rng(6)
    leafs = cid.cell_id_from_latlng_degrees(
        rng.uniform(-85, 85, 40), rng.uniform(-179, 179, 40)
    )
    for lvl in (2, 5, 10, 20, 29):
        for c in cid.parent(leafs[:8], lvl):
            cell = Cell(int(c))
            exact = cell.exact_area()
            approx = cell.approx_area()
            assert abs(approx - exact) / exact < 0.03  # documented 3%
    # level<2 falls back to the average area
    face = Cell(int(cid.parent(leafs[:1], 0)[0]))
    assert face.approx_area() == face.average_area()


def test_cap_convenience_api_invariants():
    """VERDICT r3 #5: the last public S2Cap methods without twins —
    fromAxisArea (S2Cap.php:74-77), area (113-115), isValid
    (141-147), interiorIntersects (211-215), approxEquals (370-376)."""
    import math

    import numpy as np

    from s2_geometry_library_php_spark.s2core import geom
    from s2_geometry_library_php_spark.s2core.cell import Cap

    rng = np.random.default_rng(11)
    for _ in range(50):
        v = rng.normal(size=3)
        axis = v / np.linalg.norm(v)
        ang = float(rng.uniform(0.0, math.pi))
        c = Cap.from_axis_angle(axis, ang)
        # area <-> height round trip
        assert abs(c.area() - 2 * math.pi * c.height) < 1e-15
        rt = Cap.from_axis_area(axis, c.area())
        assert abs(rt.height - c.height) <= 1e-15
        assert c.is_valid()
        assert c.approx_equals(Cap(axis, c.height + 5e-15))
        assert not c.approx_equals(Cap(axis, c.height + 1e-9))
    # boundary cases
    assert Cap.empty().area() == 0.0
    assert abs(Cap.full().area() - 4 * math.pi) < 1e-15
    assert Cap.empty().is_valid() and Cap.full().is_valid()
    assert not Cap(np.array([1.0, 0.0, 0.0]), 2.5).is_valid()
    assert not Cap(np.array([1.0, 1.0, 0.0]), 0.5).is_valid()  # non-unit
    assert Cap.empty().approx_equals(Cap(np.array([0.0, 1.0, 0.0]), 5e-15))
    assert Cap.full().approx_equals(Cap(np.array([0.0, 1.0, 0.0]), 2 - 5e-15))

    # interiorIntersects: overlapping / tangent / disjoint / asymmetry
    x = np.array([1.0, 0.0, 0.0])
    mk = lambda lng_deg, ang: Cap.from_axis_angle(
        geom.latlng_to_xyz(np.array([0.0]), np.radians([lng_deg]))[0], ang
    )
    a = mk(0.0, 0.3)
    assert a.interior_intersects(mk(20.0, 0.3))  # clearly overlapping
    assert not a.interior_intersects(mk(90.0, 0.3))  # clearly disjoint
    # external tangency: interiors do not meet
    assert not a.interior_intersects(mk(math.degrees(0.6), 0.3))
    # asymmetry: a point cap has empty interior but lies inside a's
    point = Cap(x, 0.0)
    assert not point.interior_intersects(a)
    assert a.interior_intersects(point)
    # full cap's interior meets everything non-empty; nothing meets empty
    assert Cap.full().interior_intersects(a)
    assert not a.interior_intersects(Cap.empty())


def test_latlng_convenience_api():
    import math

    """Vectorized twins of the last S2LatLng public methods
    (S2LatLng.php:212-216 mul, :257-259 toStringDegrees, commented-Java
    isValid/normalized at :108-131, sub at :200-207)."""
    from s2_geometry_library_php_spark.s2core import earth as E

    lat = np.radians([10.0, -45.0, 89.0])
    lng = np.radians([20.0, 170.0, -179.0])

    # mul: component scaling, no validity guarantee (matches reference note)
    mlat, mlng = E.latlng_mul(lat, lng, 3.0)
    np.testing.assert_allclose(mlat, lat * 3.0, rtol=0, atol=0)
    np.testing.assert_allclose(mlng, lng * 3.0, rtol=0, atol=0)
    assert not E.latlng_is_valid(mlat, mlng).all()  # 89*3 deg is invalid

    # sub then normalized round-trips into the valid domain
    slat, slng = E.latlng_sub(mlat, mlng, lat, lng)
    np.testing.assert_allclose(slat, 2.0 * lat, atol=1e-15)
    nlat, nlng = E.latlng_normalized(mlat, mlng)
    assert E.latlng_is_valid(nlat, nlng).all()
    # IEEE remainder semantics: +pi maps to +pi, not -pi
    _, at_pi = E.latlng_normalized(np.array([0.0]), np.array([math.pi]))
    assert at_pi[0] == math.pi
    # already-valid points are unchanged
    vlat, vlng = E.latlng_normalized(lat, lng)
    np.testing.assert_allclose(vlat, lat, atol=1e-15)
    np.testing.assert_allclose(vlng, lng, atol=1e-15)

    # toStringDegrees: "(latDeg, lngDeg)" and the text round-trips
    s = E.latlng_to_string_degrees(lat, lng)
    assert s[0].startswith("(") and s[0].endswith(")")
    back = [tuple(float(t) for t in v.strip("()").split(", ")) for v in s]
    np.testing.assert_allclose([b[0] for b in back], np.degrees(lat), rtol=1e-16)
    np.testing.assert_allclose([b[1] for b in back], np.degrees(lng), rtol=1e-16)
