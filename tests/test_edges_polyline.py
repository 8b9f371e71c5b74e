"""Edge coverings, loop-vs-loop relations, polyline proximity join."""

import numpy as np
from pyspark.sql import functions as F

from s2_geometry_library_php_spark.s2core import cellid as cid
from s2_geometry_library_php_spark.s2core import edges, geom
from s2_geometry_library_php_spark.s2core.region import LoopRegion


def _covered(cells, leaf):
    for c in cells:
        lsb = c & (-c & 0xFFFFFFFFFFFFFFFF)
        if c - (lsb - 1) <= leaf <= c + (lsb - 1):
            return True
    return False


def test_edge_covering_covers_edge_samples():
    a = geom.latlng_to_xyz(np.radians(40.0), np.radians(-70.0))
    b = geom.latlng_to_xyz(np.radians(41.0), np.radians(-69.0))
    cov, level = edges.edge_covering(np.asarray(a), np.asarray(b))
    assert 1 <= len(cov) <= 4
    # sample points along the geodesic must fall in the covering
    for t in np.linspace(0, 1, 50):
        p = geom.normalize(np.asarray(a) * (1 - t) + np.asarray(b) * t)
        leaf = int(
            cid.cell_id_from_point(
                np.asarray(p[0]), np.asarray(p[1]), np.asarray(p[2])
            )
        )
        assert _covered(cov, leaf)


def test_edge_covering_long_edge_whole_sphere_fallback():
    a = geom.latlng_to_xyz(np.radians(0.0), np.radians(0.0))
    b = geom.latlng_to_xyz(np.radians(0.0), np.radians(120.0))
    cov, level = edges.edge_covering(np.asarray(a), np.asarray(b))
    assert level == 0 and len(cov) == 6


def test_polyline_covering_covers_vertices():
    verts = np.array([[48.85, 2.35], [49.0, 3.0], [49.5, 3.2], [50.0, 4.0]])
    cov = edges.polyline_covering(verts)
    pts = geom.latlng_to_xyz(np.radians(verts[:, 0]), np.radians(verts[:, 1]))
    for p in pts:
        leaf = int(
            cid.cell_id_from_point(
                np.asarray(p[0]), np.asarray(p[1]), np.asarray(p[2])
            )
        )
        assert _covered(cov, leaf)


def test_loop_relations():
    outer = LoopRegion(np.array([[0.0, 0.0], [0.0, 20.0], [20.0, 20.0], [20.0, 0.0]]))
    inner = LoopRegion(np.array([[5.0, 5.0], [5.0, 15.0], [15.0, 15.0], [15.0, 5.0]]))
    shifted = LoopRegion(
        np.array([[10.0, 10.0], [10.0, 30.0], [30.0, 30.0], [30.0, 10.0]])
    )
    apart = LoopRegion(
        np.array([[-50.0, -50.0], [-50.0, -40.0], [-40.0, -40.0], [-40.0, -50.0]])
    )
    assert edges.loop_contains_loop(outer, inner)
    assert not edges.loop_contains_loop(inner, outer)
    assert edges.loop_intersects_loop(outer, inner)
    assert edges.loop_intersects_loop(outer, shifted)
    assert not edges.loop_contains_loop(outer, shifted)
    assert not edges.loop_intersects_loop(outer, apart)
    assert edges.contains_or_crosses(outer, inner) == 1
    assert edges.contains_or_crosses(outer, shifted) == -1
    assert edges.contains_or_crosses(outer, apart) == 0


def test_polyline_proximity_join_matches_brute_force(spark, docs):
    from s2_geometry_library_php_spark.operators.polyline_join import (
        polyline_proximity_join,
    )

    polylines = [
        {"line_id": 1, "vertices": [[0.0, -30.0], [10.0, -20.0], [20.0, -20.0]]},
        {"line_id": 2, "vertices": [[-40.0, 100.0], [-35.0, 110.0]]},
    ]
    dist = 300e3 / 6371e3  # 300 km
    d = docs.select("doc_id", "lat", "lon", "cell_id")
    got = {
        (int(r.doc_id), int(r.line_id))
        for r in polyline_proximity_join(spark, d, polylines, dist).collect()
    }
    pdf = d.toPandas()
    pts = geom.latlng_to_xyz(
        np.radians(pdf.lat.to_numpy()), np.radians(pdf.lon.to_numpy())
    )
    expected = set()
    for spec in polylines:
        v = np.asarray(spec["vertices"], dtype=np.float64)
        verts = geom.normalize(
            geom.latlng_to_xyz(np.radians(v[:, 0]), np.radians(v[:, 1]))
        )
        best = np.full(len(pts), np.inf)
        for k in range(len(verts) - 1):
            best = np.minimum(
                best, geom.edge_distance_radians(pts, verts[k], verts[k + 1])
            )
        for doc in pdf.doc_id.to_numpy()[best <= dist]:
            expected.add((int(doc), spec["line_id"]))
    assert got == expected


def test_polyline_interpolate_project_roundtrip():
    import numpy as np

    from s2_geometry_library_php_spark.s2core import geom
    from s2_geometry_library_php_spark.s2core.edges import (
        polyline_interpolate,
        polyline_project,
    )

    v = np.asarray([[48.5, 1.8], [48.9, 2.4], [49.3, 3.0]])
    verts = geom.normalize(
        geom.latlng_to_xyz(np.radians(v[:, 0]), np.radians(v[:, 1]))
    )
    for f in (0.0, 0.1, 0.25, 0.5, 0.9, 1.0):
        p = polyline_interpolate(verts, f)
        _cp, d, fr = polyline_project(p[None], verts)
        assert d[0] < 1e-12
        assert abs(fr[0] - f) < 1e-9
    # projection distance == min per-edge distance; closest point
    # achieves it
    rng = np.random.default_rng(3)
    pts = geom.latlng_to_xyz(
        np.radians(rng.uniform(47, 50, 300)),
        np.radians(rng.uniform(0.5, 4.5, 300)),
    )
    cp, d, _fr = polyline_project(pts, verts)
    brute = np.minimum(
        geom.edge_distance_radians(pts, verts[0], verts[1]),
        geom.edge_distance_radians(pts, verts[1], verts[2]),
    )
    assert np.allclose(d, brute, atol=1e-15)
    assert np.allclose(geom.angle_between(pts, cp), d, atol=1e-9)


def test_robust_crossing_vec_matches_scalar():
    import numpy as np

    from s2_geometry_library_php_spark.s2core import geom

    rng = np.random.default_rng(23)
    pts = geom.normalize(rng.standard_normal((400, 3)))
    a, b, c, d = pts[:100], pts[100:200], pts[200:300], pts[300:400]
    vec = geom.robust_crossing_vec(a, b, c, d)
    for i in range(100):
        assert vec[i] == geom.robust_crossing(a[i], b[i], c[i], d[i])
    # shared-vertex rows (degenerate-adjacent) also agree
    vec2 = geom.robust_crossing_vec(a, b, b, c)
    for i in range(100):
        assert vec2[i] == geom.robust_crossing(a[i], b[i], b[i], c[i])


def test_polyline_region_crossing_join_counts(spark):
    """The covering-join crossing counts equal the brute-force kernel
    on a polyline that enters a quad loop through its west meridian
    edge and ends inside (odd parity => exactly one crossing)."""
    from s2_geometry_library_php_spark.operators.polyline_join import (
        polyline_region_crossing_join,
        polyline_region_crossings_numpy,
    )

    lines = [dict(line_id=1, vertices=[[42.0, -77.0], [42.0, -72.0]])]
    regions = [
        dict(
            region_id=7,
            kind="loop",
            params=[40.0, -75.0, 40.0, -70.0, 45.0, -70.0, 45.0, -75.0],
            loop_offsets=None,
        )
    ]
    got = {
        (r.line_id, r.region_id): r.n_crossings
        for r in polyline_region_crossing_join(
            spark, lines, regions, brute=False
        ).collect()
    }
    want = {
        (lid, rid): n
        for lid, rid, n in polyline_region_crossings_numpy(lines, regions)
    }
    assert got == want == {(1, 7): 1}

    # a line that passes fully through crosses twice
    through = [dict(line_id=2, vertices=[[42.0, -77.0], [42.0, -68.0]])]
    got2 = {
        (r.line_id, r.region_id): r.n_crossings
        for r in polyline_region_crossing_join(
            spark, through, regions, brute=False
        ).collect()
    }
    want2 = {
        (lid, rid): n
        for lid, rid, n in polyline_region_crossings_numpy(through, regions)
    }
    assert got2 == want2 == {(2, 7): 2}


def test_wedge_contains_or_intersects_cases():
    import numpy as np

    from s2_geometry_library_php_spark.s2core import geom
    from s2_geometry_library_php_spark.s2core.edges import (
        loop_normalize,
        wedge_contains_or_intersects,
    )

    def ll(lat, lng):
        return geom.latlng_to_xyz(np.radians(lat), np.radians(lng))

    b = ll(0.0, 0.0)  # shared wedge apex
    # A spans a wide wedge, B a narrow sub-wedge -> contains (+1)
    a0, a2 = ll(10.0, -10.0), ll(10.0, 10.0)
    b0, b2 = ll(10.0, -3.0), ll(10.0, 3.0)
    assert wedge_contains_or_intersects(a0, b, a2, b0, b2) == 1
    # disjoint wedges -> 0
    c0, c2 = ll(-10.0, 3.0), ll(-10.0, -3.0)
    assert wedge_contains_or_intersects(a0, b, a2, c0, c2) == 0
    # partial overlap -> -1
    d0, d2 = ll(10.0, 3.0), ll(-10.0, 0.0)
    assert wedge_contains_or_intersects(a0, b, a2, d0, d2) == -1

    # loop_normalize inverts an over-hemisphere loop
    big = np.asarray(
        geom.normalize(
            geom.latlng_to_xyz(
                np.radians(np.array([-60.0, -60.0, -60.0, -60.0])),
                np.radians(np.array([0.0, 90.0, 180.0, -90.0])),
            )
        )
    )  # CCW around the south pole viewed from inside => area > 2pi
    area_big, _ = geom.loop_area_centroid(big)
    if area_big > 2 * np.pi:
        norm = loop_normalize(big)
        area_n, _ = geom.loop_area_centroid(norm)
        assert area_n <= 2 * np.pi + 1e-9
    else:
        norm = loop_normalize(big[::-1])
        area_n, _ = geom.loop_area_centroid(norm)
        assert area_n <= 2 * np.pi + 1e-9


def test_polyline_self_crossing_join_no_broadcast(spark):
    """Both-sides-distributed crossing join: counts equal brute force,
    and the plan contains no BroadcastNestedLoopJoin/CartesianProduct
    (the whole point of the two-arm shuffled equi-join)."""
    from s2_geometry_library_php_spark.operators.polyline_join import (
        polyline_self_crossing_join,
        polyline_self_crossings_numpy,
    )

    lines = [
        dict(line_id=1, vertices=[[42.0, -77.0], [42.0, -72.0]]),
        dict(line_id=2, vertices=[[40.0, -74.5], [44.0, -74.5]]),
        dict(line_id=3, vertices=[[10.0, 10.0], [20.0, 20.0]]),
        # chain crossing line 1 twice
        dict(
            line_id=4,
            vertices=[[41.0, -76.0], [43.0, -75.0], [41.0, -74.0]],
        ),
    ]
    df = polyline_self_crossing_join(spark, lines, brute=False)
    got = {(r.line_a, r.line_b): r.n_crossings for r in df.collect()}
    want = {
        (a, b): n for a, b, n in polyline_self_crossings_numpy(lines)
    }
    assert got == want
    assert (1, 2) in got and got[(1, 4)] == 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cost_based_crossover_brute_matches_indexed(spark):
    """The reference builds its edge index only past the measured
    crossover (S2EdgeIndex.php:197-204: >100 data edges AND >30
    queries); below it, brute m*n robustCrossing wins.  Our
    distributed twin must (a) dispatch the same way and (b) return
    identical answers on both paths."""
    from s2_geometry_library_php_spark.operators.polyline_join import (
        polyline_region_crossing_join,
        polyline_self_crossing_join,
        use_edge_index,
    )

    # the reference thresholds, exactly
    assert not use_edge_index(100, 1000)
    assert not use_edge_index(1000, 30)
    assert use_edge_index(101, 31)

    lines = [
        dict(line_id=1, vertices=[[42.0, -77.0], [42.0, -72.0]]),
        dict(line_id=2, vertices=[[40.0, -74.5], [44.0, -74.5]]),
        dict(
            line_id=4,
            vertices=[[41.0, -76.0], [43.0, -75.0], [41.0, -74.0]],
        ),
    ]
    regions = [
        dict(
            region_id=7,
            kind="loop",
            params=[40.0, -75.0, 40.0, -70.0, 45.0, -70.0, 45.0, -75.0],
            loop_offsets=None,
        )
    ]

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    # region join: auto-dispatch (tiny => brute) == forced-index == forced-brute
    auto = polyline_region_crossing_join(spark, lines, regions)
    idx = polyline_region_crossing_join(spark, lines, regions, brute=False)
    brt = polyline_region_crossing_join(spark, lines, regions, brute=True)
    assert rows(auto) == rows(idx) == rows(brt)

    # self join: same three-way agreement
    auto_s = polyline_self_crossing_join(spark, lines)
    idx_s = polyline_self_crossing_join(spark, lines, brute=False)
    brt_s = polyline_self_crossing_join(spark, lines, brute=True)
    assert rows(auto_s) == rows(idx_s) == rows(brt_s)
    assert len(rows(auto_s)) > 0


def test_polyline_self_crossing_join_1k_lines(spark):
    """Scale fixture through the SHUFFLED raw-vs-ancestor path (1024
    lines, brute=False): (a) full equality against the operator's own
    brute arm (vectorized refine over all cross-line pairs), (b) exact
    equality against the independent numpy robust_crossing oracle on a
    64-line subsample, (c) still no Cartesian/BNLJ in the plan."""
    from s2_geometry_library_php_spark.operators.polyline_join import (
        polyline_self_crossing_join,
        polyline_self_crossings_numpy,
        synth_grid_lines,
    )

    lines = synth_grid_lines(1024)
    df = polyline_self_crossing_join(spark, lines, brute=False)
    got = {(r.line_a, r.line_b): r.n_crossings for r in df.collect()}
    assert len(got) > 500  # sparse but non-trivial crossing graph

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    brute = {
        (r.line_a, r.line_b): r.n_crossings
        for r in polyline_self_crossing_join(
            spark, lines, brute=True
        ).collect()
    }
    assert got == brute

    # independent kernel oracle on a deterministic subsample
    sub_ids = {lid for lid in range(1, 1025) if lid % 16 == 3}
    sub = [ln for ln in lines if ln["line_id"] in sub_ids]
    want = {
        (a, b): c for a, b, c in polyline_self_crossings_numpy(sub)
    }
    got_sub = {
        (a, b): c
        for (a, b), c in got.items()
        if a in sub_ids and b in sub_ids
    }
    assert got_sub == want
