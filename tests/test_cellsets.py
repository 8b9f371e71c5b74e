"""Distributed cell-set algebra vs the driver-side kernel reference."""

import numpy as np
from pyspark.sql import functions as F

from s2_geometry_library_php_spark.operators.cellsets import (
    cells_contain_point,
    cells_intersection,
    cells_union,
    normalize_cells,
)
from s2_geometry_library_php_spark.s2core import cellid as cid
from s2_geometry_library_php_spark.s2core.coverer import (
    RegionCoverer,
    normalize_cell_union,
)
from s2_geometry_library_php_spark.s2core.region import CapRegion


def _sig(u):
    u &= 0xFFFFFFFFFFFFFFFF
    return u - (1 << 64) if u >= 1 << 63 else u


def _to_df(spark, cells):
    return spark.createDataFrame(
        [(int(_sig(c)),) for c in cells], "cell_id long"
    )


def _from_df(df):
    return sorted(
        int(r.cell_id) & 0xFFFFFFFFFFFFFFFF for r in df.collect()
    )


def test_normalize_cells_matches_kernel(spark):
    # children + their parent + a stray cell -> kernel-normalized set
    base = CapRegion(10.0, 20.0, 0.02)
    cov = RegionCoverer(max_cells=20).get_covering(base)
    # denormalize a few cells into children to force collapse work
    messy = []
    for c in cov:
        arr = np.asarray([c], dtype=np.uint64)
        if int(cid.level_of(arr)[0]) < 28:
            child = int(cid.child_begin(arr)[0])
            for _ in range(4):
                messy.append(child)
                child = int(
                    cid.next_cell(np.asarray([child], dtype=np.uint64))[0]
                )
        else:
            messy.append(c)
    expected = normalize_cell_union(messy)
    got = _from_df(normalize_cells(_to_df(spark, messy)))
    assert got == sorted(expected)


def test_cells_union_matches_kernel(spark):
    a = RegionCoverer(max_cells=12).get_covering(CapRegion(0.0, 0.0, 0.05))
    b = RegionCoverer(max_cells=12).get_covering(CapRegion(1.0, 1.0, 0.05))
    expected = normalize_cell_union(list(a) + list(b))
    got = _from_df(cells_union(_to_df(spark, a), _to_df(spark, b)))
    assert got == sorted(expected)


def test_cells_intersection_covers_overlap_only(spark):
    a = RegionCoverer(max_cells=16).get_covering(CapRegion(0.0, 0.0, 0.08))
    b = RegionCoverer(max_cells=16).get_covering(CapRegion(2.0, 2.0, 0.08))
    inter = _from_df(
        cells_intersection(_to_df(spark, a), _to_df(spark, b))
    )

    def covered(cells, leaf):
        for c in cells:
            lsb = c & (-c & 0xFFFFFFFFFFFFFFFF)
            if c - (lsb - 1) <= leaf <= c + (lsb - 1):
                return True
        return False

    rng = np.random.default_rng(3)
    lat = rng.uniform(-4, 6, 3000)
    lng = rng.uniform(-4, 6, 3000)
    leaves = cid.cell_id_from_latlng_degrees(lat, lng)
    for leaf in (int(x) for x in leaves[:500]):
        in_a = covered(a, leaf)
        in_b = covered(b, leaf)
        in_i = covered(inter, leaf)
        assert in_i == (in_a and in_b)


def test_cells_contain_point_semijoin(spark):
    cov = RegionCoverer(max_cells=8).get_covering(CapRegion(48.85, 2.35, 0.03))
    cells_df = _to_df(spark, cov)
    rng = np.random.default_rng(5)
    lat = rng.uniform(44, 54, 2000)
    lng = rng.uniform(-3, 8, 2000)
    leaves = cid.cell_id_from_latlng_degrees(lat, lng)
    leaf_df = spark.createDataFrame(
        [(i, int(cid.to_signed(leaves[i : i + 1])[0])) for i in range(len(leaves))],
        "idx long, leaf_id long",
    )
    got = {r.idx for r in cells_contain_point(cells_df, leaf_df).collect()}

    lo = cid.range_min(np.asarray(cov, dtype=np.uint64))
    hi = cid.range_max(np.asarray(cov, dtype=np.uint64))
    expected = set()
    for i, leaf in enumerate(leaves):
        if bool(np.any((lo <= leaf) & (leaf <= hi))):
            expected.add(i)
    assert got == expected


def test_cells_difference_matches_kernel(spark):
    from s2_geometry_library_php_spark.operators.cellsets import (
        cells_difference,
    )
    from s2_geometry_library_php_spark.operators.spatial_join import (
        cell_union_difference,
    )

    a = RegionCoverer(max_cells=16).get_covering(CapRegion(0.0, 0.0, 0.08))
    b = RegionCoverer(max_cells=16).get_covering(CapRegion(2.0, 2.0, 0.08))
    for x, y in ((a, b), (b, a)):
        expected = cell_union_difference(list(x), list(y))
        got = _from_df(cells_difference(_to_df(spark, x), _to_df(spark, y)))
        assert got == sorted(expected)
    # A \ A = empty; A \ disjoint = A (already normalized)
    assert _from_df(cells_difference(_to_df(spark, a), _to_df(spark, a))) == []
    far = RegionCoverer(max_cells=8).get_covering(CapRegion(60.0, 120.0, 0.02))
    assert _from_df(
        cells_difference(_to_df(spark, a), _to_df(spark, far))
    ) == sorted(normalize_cell_union(list(a)))
