"""Reference golden vectors — must match the reference's own executable
test values exactly (tests/SmokeTest.php:102-154)."""

import math

import numpy as np
import pytest

from s2_geometry_library_php_spark.s2core import cellid as cid
from s2_geometry_library_php_spark.s2core import earth

D2R = math.pi / 180.0


def test_latlng_radians_goldens():
    # SmokeTest.php:106-107,118-122
    assert 55.578201 * D2R == pytest.approx(0.9700225997852, abs=1e-13)
    assert 37.912176 * D2R == pytest.approx(0.66169229779557, abs=1e-13)
    assert 55.578324 * D2R == pytest.approx(0.97002474654019, abs=1e-13)
    assert 37.9109 * D2R == pytest.approx(0.66167002739432, abs=1e-13)


def test_great_circle_goldens():
    # SmokeTest.php:109-133.
    #
    # Tolerance note: the two bearing goldens are cancellation-
    # amplified (x = cos(lat1)sin(lat2) - sin(lat1)cos(lat2)cos(dlon)
    # is ~2e-6 from ~0.8-magnitude operands, so a 1-ulp difference in
    # any trig result shifts the bearing by ~5e-11).  IEEE-754 double
    # evaluation (CPython libm and numpy agree bit-for-bit here)
    # reproduces the distance and destination goldens to all 14
    # printed digits but the bearings only to ~11 digits; the recorded
    # values are consistent with x87 80-bit extended-precision
    # intermediates on the machine that generated SmokeTest.php.
    lat1, lng1 = 55.578201 * D2R, 37.912176 * D2R
    lat2, lng2 = 55.578324 * D2R, 37.9109 * D2R
    dist = float(earth.great_earth_distance(lat1, lng1, lat2, lng2))
    assert dist == pytest.approx(81.362381188294, abs=1e-11)

    bearing = float(earth.great_circle_bearing(lat1, lng1, lat2, lng2))
    assert bearing == pytest.approx(-1.4018857232359, abs=5e-11)

    to2_lat, to2_lng = earth.great_circle_destination(lat1, lng1, bearing, 40.0)
    assert float(to2_lat) == pytest.approx(0.97002365521829, abs=1e-13)
    assert float(to2_lng) == pytest.approx(0.66168134906715, abs=1e-13)

    bearing2 = float(
        earth.great_circle_bearing(float(to2_lat), float(to2_lng), lat2, lng2)
    )
    assert bearing2 == pytest.approx(-1.4018947548004, abs=5e-11)

    to3_lat, to3_lng = earth.great_circle_destination(
        float(to2_lat), float(to2_lng), bearing2, dist - 40.0
    )
    assert float(to3_lat) == pytest.approx(0.97002474654019, abs=1e-12)
    assert float(to3_lng) == pytest.approx(0.66167002739432, abs=1e-11)

    dist3 = float(
        earth.great_earth_distance(lat1, lng1, float(to3_lat), float(to3_lng))
    )
    assert dist3 == pytest.approx(81.362381188297, abs=1e-10)


def test_token_to_center_goldens():
    # SmokeTest.php:142-146 — the reference truncates a guid to 16 chars
    ids = cid.id_from_token(["700c7c5346a246ee", "414ab9b68fd00000"])
    lat, lng = cid.cell_id_to_center_latlng(ids)
    assert float(lat[0]) == pytest.approx(-0.023004811178492, abs=1e-14)
    assert float(lng[0]) == pytest.approx(-3.06557268979, abs=1e-11)
    assert float(lat[1]) == pytest.approx(0.97053474915648, abs=1e-13)
    assert float(lng[1]) == pytest.approx(0.66268771618818, abs=1e-13)


def test_point_to_cell_center_distance_golden():
    # SmokeTest.php:148-153
    ids = cid.id_from_token(["414ab9b68fd00000"])
    clat, clng = cid.cell_id_to_center_latlng(ids)
    dist = float(
        earth.great_earth_distance(
            55.605873 * D2R, 37.970864 * D2R, float(clat[0]), float(clng[0])
        )
    )
    assert dist == pytest.approx(212.99711509717, abs=1e-8)


def test_e6_fixed_point():
    # SmokeTest.php:149-151, S1Angle.php:152-172: degrees = e6 * 1e-6
    for lat_e6, lng_e6 in [
        (55608152, 37972176),
        (55607195, 37971367),
        (55605726, 37970664),
    ]:
        assert lat_e6 / 1e6 * D2R == (lat_e6 * 1e-6) * D2R
        # round-trip through e6
        assert round((lat_e6 / 1e6) * 1e6) == lat_e6
        assert round((lng_e6 / 1e6) * 1e6) == lng_e6


def test_location_hex_codec():
    # SmokeTest.php:49-60,103-104: e6 fixed-point hex roundtrip
    hex_loc = "0351272d,0242b406"
    lat_hex, lng_hex = hex_loc.split(",")
    lat = int(lat_hex, 16) / 1e6
    lng = int(lng_hex, 16) / 1e6
    enc = f"{int(lat * 1e6):08x},{int(lng * 1e6):08x}"
    assert enc == hex_loc


def test_token_codec_rules():
    # S2CellId.php:462-512
    assert cid.token_from_id(np.array([0], dtype=np.uint64)) == ["X"]
    assert cid.id_from_token(["X"])[0] == 0
    assert cid.id_from_token([""])[0] == 0
    assert cid.id_from_token(["0123456789abcdef0"])[0] == 0  # >16 chars
    # trailing-zero strip + pad roundtrip
    ids = cid.id_from_token(["414ab9b68fd00000"])
    assert cid.token_from_id(ids) == ["414ab9b68fd"]
    assert cid.id_from_token(["414ab9b68fd"])[0] == ids[0]
