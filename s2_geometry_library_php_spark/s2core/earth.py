"""Great-circle geodesy used by the reference's executable tests
(tests/SmokeTest.php:12-47): haversine distance, initial bearing,
destination point.  Earth radius 6,371,000 m (SmokeTest.php:5).

Vectorized numpy; same op order as the reference so the golden values
(SmokeTest.php:130-133) reproduce bit-for-bit in float64.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_METERS = 6371000.0  # SmokeTest.php:5
EARTH_RADIUS_S2LATLNG = 6367000.0  # S2LatLng.php:4 (unused by tests)


def haversin(a):
    """(1 - cos a) / 2 (SmokeTest.php:19-21)."""
    return (1.0 - np.cos(a)) / 2.0


def great_earth_distance(lat1, lng1, lat2, lng2):
    """Haversine distance in meters, radians in (SmokeTest.php:12-17)."""
    angle = haversin(lat1 - lat2) + np.cos(lat1) * np.cos(lat2) * haversin(
        lng1 - lng2
    )
    return 2.0 * EARTH_RADIUS_METERS * np.arcsin(np.sqrt(angle))


def great_circle_bearing(lat1, lng1, lat2, lng2):
    """Initial bearing in radians (SmokeTest.php:23-30)."""
    cos_latb = np.cos(lat2)
    dlon = lng2 - lng1
    y = np.sin(dlon) * cos_latb
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * cos_latb * np.cos(dlon)
    return np.arctan2(y, x)


def great_circle_destination(lat1, lng1, bearing, distance_m):
    """Destination point after travelling distance_m on the bearing
    (SmokeTest.php:32-47)."""
    cos_dist = np.cos(distance_m / EARTH_RADIUS_METERS)
    sin_dist = np.sin(distance_m / EARTH_RADIUS_METERS)
    sin_lat = np.sin(lat1)
    cos_lat = np.cos(lat1)
    lat = np.arcsin(sin_lat * cos_dist + cos_lat * sin_dist * np.cos(bearing))
    lng = lng1 + np.arctan2(
        np.sin(bearing) * sin_dist * cos_lat, cos_dist - sin_lat * np.sin(lat)
    )
    return lat, lng


# --- S2LatLng arithmetic / formatting conveniences -------------------------
#
# The engine keeps lat/lng as parallel numpy arrays rather than a scalar
# S2LatLng class, so these are the vectorized twins of the last public
# S2LatLng methods without counterparts (S2LatLng.php:212-216 mul,
# :257-259 toStringDegrees) plus the commented-Java isValid/normalized
# pair the port carries at S2LatLng.php:108-131.


def latlng_mul(lat_rad, lng_rad, m):
    """Scale a lat/lng by m (S2LatLng.php:212-216).  Like the reference,
    no validity guarantee on the result."""
    return np.asarray(lat_rad) * m, np.asarray(lng_rad) * m


def latlng_sub(lat1, lng1, lat2, lng2):
    """Component-wise difference (S2LatLng.php:200-207 commented Java
    `sub`).  No validity guarantee."""
    return np.asarray(lat1) - np.asarray(lat2), np.asarray(lng1) - np.asarray(lng2)


def latlng_is_valid(lat_rad, lng_rad):
    """|lat| <= pi/2 and |lng| <= pi (S2LatLng.php:108-110)."""
    return (np.abs(lat_rad) <= np.pi / 2.0) & (np.abs(lng_rad) <= np.pi)


def latlng_normalized(lat_rad, lng_rad):
    """Clip lat to [-pi/2, pi/2], reduce lng to [-pi, pi] via IEEE
    remainder (S2LatLng.php:117-131)."""
    lat = np.clip(np.asarray(lat_rad, dtype=np.float64), -np.pi / 2.0, np.pi / 2.0)
    # IEEE-754 remainder: x - 2pi*round(x/2pi) with round-half-even, so
    # +pi stays +pi (Java Math.IEEEremainder semantics, not fmod).
    x = np.asarray(lng_rad, dtype=np.float64)
    two_pi = 2.0 * np.pi
    lng = x - two_pi * np.round(x / two_pi)
    return lat, lng


def latlng_to_string_degrees(lat_rad, lng_rad):
    """"(latDeg, lngDeg)" per element (S2LatLng.php:257-259), via repr
    so the float64 text round-trips exactly like PHP's default echo of
    a double under precision>=17 serialization."""
    lat_deg = np.degrees(np.atleast_1d(np.asarray(lat_rad, dtype=np.float64)))
    lng_deg = np.degrees(np.atleast_1d(np.asarray(lng_rad, dtype=np.float64)))
    return np.array(
        ["(" + repr(float(a)) + ", " + repr(float(b)) + ")" for a, b in zip(lat_deg, lng_deg)],
        dtype=object,
    )
