"""Hypothesis fuzzing of the key-space codec and interval algebra —
shrinking property tests on top of the seeded-random suites
(SURVEY.md §5.2 invariant class)."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from s2_geometry_library_php_spark.s2core import cellid as cid

# a valid cell id: face (0..5), level (0..30), arbitrary Hilbert pos
valid_cell = st.builds(
    lambda face, level, pos: (
        (face << 61) | ((pos & ((1 << 61) - 1)) >> (2 * (30 - level) + 1) << (2 * (30 - level) + 1))
        | (1 << (2 * (30 - level)))
    ),
    st.integers(0, 5),
    st.integers(0, 30),
    st.integers(0, (1 << 61) - 1),
)


@settings(max_examples=300, deadline=None)
@given(valid_cell)
def test_token_roundtrip_fuzz(cell):
    arr = np.asarray([cell], dtype=np.uint64)
    tok = cid.token_from_id(arr)[0]
    assert 1 <= len(tok) <= 16
    back = cid.id_from_token([tok])[0]
    assert int(back) == cell


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=20))
def test_garbage_tokens_never_crash(tok):
    out = cid.id_from_token([tok])
    # invalid input maps to id 0 ('X'/none), never raises
    assert out.dtype == np.uint64


@settings(max_examples=300, deadline=None)
@given(valid_cell, st.integers(0, 30))
def test_parent_range_containment_fuzz(cell, plevel):
    arr = np.asarray([cell], dtype=np.uint64)
    level = int(cid.level_of(arr)[0])
    if plevel > level:
        return
    p = cid.parent(arr, plevel)
    assert int(cid.level_of(p)[0]) == plevel
    # the child's full range nests inside the parent's
    assert int(cid.range_min(p)[0]) <= int(cid.range_min(arr)[0])
    assert int(cid.range_max(arr)[0]) <= int(cid.range_max(p)[0])
    # wrap iteration is inverse everywhere
    assert int(cid.prev_wrap(cid.next_wrap(arr))[0]) == cell


@settings(max_examples=200, deadline=None)
@given(
    st.floats(-89.999, 89.999, allow_nan=False),
    st.floats(-180.0, 180.0, allow_nan=False),
)
def test_encode_decode_center_fuzz(lat, lon):
    leaf = cid.cell_id_from_latlng_degrees(
        np.asarray([lat]), np.asarray([lon])
    )
    assert bool(cid.is_leaf(leaf)[0])
    clat, clng = cid.cell_id_to_center_latlng(leaf)
    # leaf centers are within a leaf diagonal (~1.2e-9 rad) of the input
    p = np.radians([lat, lon])
    dlat = abs(float(clat[0]) - p[0])
    dlng = abs(float(clng[0]) - p[1])
    if dlng > math.pi:
        dlng = 2 * math.pi - dlng
    assert dlat < 1e-8
    assert dlng * max(math.cos(p[0]), 1e-9) < 1e-8


@settings(max_examples=200, deadline=None)
@given(
    st.floats(-math.pi, math.pi, allow_nan=False),
    st.floats(-math.pi, math.pi, allow_nan=False),
    st.floats(-math.pi, math.pi, allow_nan=False),
)
def test_s1interval_from_point_pair_fuzz(a, b, p):
    from s2_geometry_library_php_spark.s2core.cell import S1Interval

    iv = S1Interval.from_point_pair(a, b)
    if iv.is_empty():
        # Canonical float sharp edge (matches Java S2 fastContains /
        # isEmpty exactly): a 1-ulp wrapped interval like
        # (pi, -pi + ulp) has lo - hi ROUNDING to exactly 2*pi, which
        # is the canonical isEmpty() test — at double precision the
        # interval is indistinguishable from empty.  Only reachable
        # when the two points are within ~1 ulp of closing the full
        # circle; assert that and accept.
        assert min(abs(a - b), 2 * math.pi - abs(a - b)) < 1e-14
        return
    # both endpoints contained; length is the shorter arc
    assert iv.contains(a) and iv.contains(b)
    assert iv.get_length() <= math.pi + 1e-15
