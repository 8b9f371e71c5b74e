"""S2-grid kernel smoothing (operators/tiling.smooth_tile_values):
exact mass conservation on the sphere, impulse response, numpy twin,
and cube-corner 7-neighbor handling."""

import numpy as np
from pyspark.sql import functions as F

from s2_geometry_library_php_spark.operators.tiling import (
    smooth_tile_values,
)
from s2_geometry_library_php_spark.s2core import cellid as cid


def _tiles(spark, rows):
    return spark.createDataFrame(rows, "tile_id long, doc_count long")


def _tile_at(lat, lon, level):
    ids = cid.cell_id_from_latlng_degrees(
        np.array([lat]), np.array([lon])
    )
    return int(cid.to_signed(cid.parent(ids, level))[0])


def _neighbors(tile_signed):
    ring = cid.all_neighbors(
        cid.from_signed(np.array([tile_signed], dtype=np.int64))
    )
    return sorted(set(int(x) for x in cid.to_signed(ring)[0]))


def test_impulse_spreads_to_ring_and_conserves_mass(spark):
    t0 = _tile_at(10.0, 20.0, 8)
    out = {
        r["tile_id"]: r["smoothed"]
        for r in smooth_tile_values(
            _tiles(spark, [(t0, 80)]), center_weight=0.5
        ).collect()
    }
    nbs = _neighbors(t0)
    assert set(out) == {t0} | set(nbs)
    assert out[t0] == 40.0
    for n in nbs:
        assert abs(out[n] - 40.0 / len(nbs)) < 1e-12
    assert abs(sum(out.values()) - 80.0) < 1e-9


def test_mass_conserved_on_random_field(spark):
    rng = np.random.default_rng(5)
    rows = []
    seen = set()
    for _ in range(60):
        t = _tile_at(
            float(rng.uniform(-85, 85)),
            float(rng.uniform(-180, 180)),
            6,
        )
        if t in seen:
            continue
        seen.add(t)
        rows.append((t, int(rng.integers(1, 1000))))
    total = sum(v for _, v in rows)
    out = smooth_tile_values(_tiles(spark, rows)).agg(
        F.sum("smoothed")
    ).first()[0]
    assert abs(out - total) < 1e-6


def test_matches_numpy_twin(spark):
    rows = [
        (_tile_at(0.0, 0.0, 7), 10),
        (_tile_at(0.02, 0.02, 7), 30),  # likely adjacent/nearby
        (_tile_at(45.0, 90.0, 7), 7),
    ]
    rows = list({t: v for t, v in rows}.items())
    got = {
        r["tile_id"]: r["smoothed"]
        for r in smooth_tile_values(
            _tiles(spark, rows), center_weight=0.6
        ).collect()
    }
    want: dict[int, float] = {}
    for t, v in rows:
        nbs = _neighbors(t)
        want[t] = want.get(t, 0.0) + v * 0.6
        for n in nbs:
            want[n] = want.get(n, 0.0) + v * 0.4 / len(nbs)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_cube_corner_tile_has_seven_neighbors(spark):
    # a level-2 cell at a cube vertex: (45, 45) is a corner of face 0
    corner = None
    for lat, lon in [(35.26438968, 45.0)]:  # asin(1/sqrt(3)) deg
        t = _tile_at(lat, lon, 2)
        if len(_neighbors(t)) == 7:
            corner = t
    if corner is None:
        # fall back: scan coarse cells for a 7-neighbor one
        import itertools

        for f in range(6):
            for lat, lon in itertools.product(
                (-35.264, 35.264), (-135.0, -45.0, 45.0, 135.0)
            ):
                t = _tile_at(lat, lon, 2)
                if len(_neighbors(t)) == 7:
                    corner = t
                    break
            if corner:
                break
    assert corner is not None, "no cube-corner cell found"
    out = smooth_tile_values(
        _tiles(spark, [(corner, 70)]), center_weight=0.3
    ).collect()
    vals = {r["tile_id"]: r["smoothed"] for r in out}
    assert abs(sum(vals.values()) - 70.0) < 1e-9  # 7-way split conserves
    assert abs(vals[corner] - 21.0) < 1e-12
    assert len(vals) == 8  # corner + 7 neighbors
