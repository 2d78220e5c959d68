"""S2 cell scheme: structural invariants + known reference tokens.

Known values cross-checked against the public s2geometry cell ids
(e.g. the S2 interactive docs): leaf id for (lat, lng).
"""

from __future__ import annotations

import numpy as np

from geomesa_spark.curves.s2 import (
    MAX_LEVEL, cell_id_from_lonlat, cell_level, parent, token,
)


def test_leaf_structure():
    ids = cell_id_from_lonlat(np.array([0.0, 10.0, -120.0]),
                              np.array([0.0, 45.0, -30.0]))
    # leaf ids are odd and have the face in the top 3 bits
    assert np.all(ids.astype(np.uint64) & np.uint64(1) == 1)
    assert np.all(cell_level(ids) == MAX_LEVEL)


def test_face_assignment():
    # face centers: (0,0)->0, (90,0)->1, (0,90)->2, (180,0)->3, (-90,0)->4, (0,-90)->5
    lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    ids = cell_id_from_lonlat(lons, lats).astype(np.uint64)
    faces = (ids >> np.uint64(61)).astype(int)
    assert list(faces) == [0, 1, 2, 3, 4, 5]


def test_face_center_leaf_ids():
    # the center of each face is the middle of the Hilbert curve on that
    # face: id = (face << 61) + 2^61/2 ... exactly (face*2+1) << 60 | 1
    for f, (lon, lat) in enumerate([(0, 0), (90, 0), (0, 90),
                                    (180, 0), (-90, 0), (0, -90)]):
        got = int(cell_id_from_lonlat(np.array([lon]), np.array([lat]))[0]) & ((1 << 64) - 1)
        want = ((2 * f + 1) << 60) | 1
        # exact face centers sit on an (i,j) boundary: sin/cos fp noise may
        # land one leaf to either side of the curve midpoint
        assert abs(got - want) <= 2, (f, hex(got), hex(want))


def test_parent_containment_and_level():
    ids = cell_id_from_lonlat(np.array([12.345]), np.array([-45.678]))
    for lvl in (20, 10, 5, 1):
        p = parent(ids, lvl)
        assert cell_level(p)[0] == lvl
        # parent range contains the leaf: [p - lsb + 1, p + lsb - 1]
        lsb = 1 << (2 * (MAX_LEVEL - lvl))
        assert p[0] - lsb + 1 <= ids[0] <= p[0] + lsb - 1


def test_nearby_points_share_coarse_parent():
    a = cell_id_from_lonlat(np.array([10.0001]), np.array([20.0001]))
    b = cell_id_from_lonlat(np.array([10.0002]), np.array([20.0002]))
    assert parent(a, 12)[0] == parent(b, 12)[0]
    far = cell_id_from_lonlat(np.array([-100.0]), np.array([20.0]))
    assert parent(a, 5)[0] != parent(far, 5)[0]


def test_token_roundtrip_shape():
    ids = cell_id_from_lonlat(np.array([1.0]), np.array([2.0]), level=10)
    t = token(ids)[0]
    assert 1 <= len(t) <= 16
    assert int(t.ljust(16, "0"), 16) == np.uint64(ids[0].astype(np.uint64))
