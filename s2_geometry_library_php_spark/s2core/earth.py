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
