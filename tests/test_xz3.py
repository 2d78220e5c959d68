"""XZ3 curve tests — cases from the reference XZ3SFCTest.scala."""

from __future__ import annotations

import numpy as np
import pytest

from geomesa_spark.curves.xz3 import XZ3SFC

sfc = XZ3SFC(12, "week")


def _matches(ranges, v):
    return any(lo <= v <= hi for (lo, hi, _c) in ranges)


CONTAINING = [
    (9.0, 9.0, 900.0, 13.0, 13.0, 1100.0),
    (-180.0, -90.0, 900.0, 180.0, 90.0, 1100.0),
    (0.0, 0.0, 900.0, 180.0, 90.0, 1100.0),
    (0.0, 0.0, 900.0, 20.0, 20.0, 1100.0),
]
OVERLAPPING = [
    (11.0, 11.0, 900.0, 13.0, 13.0, 1100.0),
    (9.0, 9.0, 900.0, 11.0, 11.0, 1100.0),
    (10.5, 10.5, 900.0, 11.5, 11.5, 1100.0),
    (11.0, 11.0, 900.0, 11.0, 11.0, 1100.0),
]
DISJOINT = [
    (-180.0, -90.0, 900.0, 8.0, 8.0, 1100.0),
    (0.0, 0.0, 900.0, 8.0, 8.0, 1100.0),
    (9.0, 9.0, 900.0, 9.5, 9.5, 1100.0),
    (20.0, 20.0, 900.0, 180.0, 90.0, 1100.0),
]


def test_index_polygons_and_query():
    poly = int(sfc.index(10, 10, 1000, 12, 12, 1000)[0])
    for bbox in CONTAINING + OVERLAPPING:
        xmin, ymin, zmin, xmax, ymax, zmax = bbox
        r = sfc.ranges([(xmin, ymin, zmin, xmax, ymax, zmax)], max_ranges=10000)
        assert _matches(r, poly), bbox
    for bbox in DISJOINT:
        xmin, ymin, zmin, xmax, ymax, zmax = bbox
        r = sfc.ranges([(xmin, ymin, zmin, xmax, ymax, zmax)], max_ranges=10000)
        assert not _matches(r, poly), bbox


def test_index_points_and_query():
    pt = int(sfc.index(11, 11, 1000, 11, 11, 1000)[0])
    for bbox in CONTAINING + OVERLAPPING:
        xmin, ymin, zmin, xmax, ymax, zmax = bbox
        r = sfc.ranges([(xmin, ymin, zmin, xmax, ymax, zmax)], max_ranges=10000)
        assert _matches(r, pt), bbox


def test_vectorized_matches_scalar():
    rng = np.random.RandomState(7)
    xmin = rng.uniform(-180, 170, 200)
    ymin = rng.uniform(-90, 80, 200)
    zmin = rng.uniform(0, 500000, 200)
    xmax = xmin + rng.uniform(0, 5, 200)
    ymax = ymin + rng.uniform(0, 5, 200)
    zmax = zmin + rng.uniform(0, 5000, 200)
    vec = sfc.index(xmin, ymin, zmin, xmax, ymax, zmax, lenient=True)
    for i in range(0, 200, 37):
        one = sfc.index(xmin[i], ymin[i], zmin[i], xmax[i], ymax[i], zmax[i],
                        lenient=True)
        assert int(one[0]) == int(vec[i])


def test_point_index_binned_roundtrip_week():
    millis = np.array([1_700_000_000_000, 1_700_600_000_000])
    bins, xz = sfc.index_binned(np.array([10.0, -50.0]), np.array([20.0, 60.0]), millis)
    assert bins[0] == (1_700_000_000 // 604_800)
    # point boxes always reach max resolution -> codes within the curve domain
    assert np.all(xz >= 0)
    assert np.all(xz <= (8 ** (sfc.g + 1) - 1) // 7)


def test_bounds_validation():
    with pytest.raises(ValueError):
        sfc.index(10, 10, 100, 9, 9, 100)  # unordered
    with pytest.raises(ValueError):
        sfc.index(-200, 0, 0, -190, 1, 1)  # out of bounds, strict
