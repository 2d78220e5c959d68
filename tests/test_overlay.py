"""General polygon-polygon intersection (geom/overlay.py). Pure numpy —
no Spark session needed."""

import numpy as np
import pytest

from geomesa_spark.geom import kernels as K
from geomesa_spark.geom.measures import ring_area
from geomesa_spark.geom.overlay import poly_poly_intersection
from geomesa_spark.geom.wkb import Polygon


def _rect(x0, y0, x1, y1):
    return Polygon(np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)],
                            dtype=float))


def _star(cx, cy, r_out, r_in, n=5, phase=0.0):
    """Non-convex star polygon (alternating radii)."""
    ang = phase + np.arange(2 * n) * np.pi / n
    rad = np.where(np.arange(2 * n) % 2 == 0, r_out, r_in)
    ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    return Polygon(np.vstack([ring, ring[:1]]))


def _pointwise_check(pa, pb, rings, n=120):
    """The strong check: on a dense grid, inside(A) AND inside(B) must
    equal inside(result), excluding points on/near any boundary."""
    xs0, ys0, xs1, ys1 = pa.envelope()
    xb0, yb0, xb1, yb1 = pb.envelope()
    gx = np.linspace(min(xs0, xb0) - 0.1, max(xs1, xb1) + 0.1, n)
    gy = np.linspace(min(ys0, yb0) - 0.1, max(ys1, yb1) + 0.1, n)
    # offset by an irrational sliver so grid lines don't ride boundaries
    gx = gx + (gx[1] - gx[0]) * 0.137
    gy = gy + (gy[1] - gy[0]) * 0.241
    res_polys = [Polygon(r) for r in rings]
    mism = 0
    for x in gx:
        la = K.pip_rings(np.full_like(gy, x), gy, pa.rings)
        lb = K.pip_rings(np.full_like(gy, x), gy, pb.rings)
        if res_polys:
            lr = np.max(np.stack([
                K.pip_rings(np.full_like(gy, x), gy, p.rings)
                for p in res_polys]), axis=0)
        else:
            lr = np.full_like(la, -1)
        ok = (la != 0) & (lb != 0) & (lr != 0)  # skip boundary-exact hits
        mism += int(np.sum((((la == 1) & (lb == 1)) != (lr == 1)) & ok))
    assert mism == 0


def test_star_rect_intersection_pointwise():
    star = _star(0.0, 0.0, 2.0, 0.8, n=5, phase=0.3)
    rect = _rect(-1.0, -1.0, 1.5, 1.2)
    rings = poly_poly_intersection(star, rect)
    assert rings, "star and overlapping rect must intersect"
    area = sum(ring_area(r) for r in rings)
    assert 0 < area < min(-ring_area(star.shell[::-1]), 2.5 * 2.2)
    _pointwise_check(star, rect, rings)


def test_u_shape_bar_two_components():
    # U-shape: two vertical arms joined at the bottom
    u = Polygon(np.array([
        (0, 0), (5, 0), (5, 4), (4, 4), (4, 1), (1, 1), (1, 4), (0, 4),
        (0, 0)], dtype=float))
    bar = _rect(-0.5, 2.0, 5.5, 3.0)  # crosses both arms above the base
    rings = poly_poly_intersection(u, bar)
    assert len(rings) == 2
    areas = sorted(ring_area(r) for r in rings)
    assert areas == pytest.approx([1.0, 1.0])
    _pointwise_check(u, bar, rings)


def test_nested_returns_inner():
    star = _star(0.0, 0.0, 3.0, 1.5, n=6)
    small = _rect(-0.4, -0.4, 0.4, 0.4)
    rings = poly_poly_intersection(star, small)
    assert len(rings) == 1
    assert ring_area(rings[0]) == pytest.approx(0.64)


def test_disjoint_and_touch_only():
    a = _rect(0, 0, 1, 1)
    assert poly_poly_intersection(a, _rect(5, 5, 6, 6)) == []
    # shared corner point only -> empty (area-0 intersection)
    assert poly_poly_intersection(a, _rect(1, 1, 2, 2)) == []


def test_collinear_overlap_raises():
    a = _rect(0, 0, 2, 2)
    b = _rect(1, 0, 3, 2)  # shares collinear boundary stretches on y=0, y=2
    with pytest.raises(NotImplementedError):
        poly_poly_intersection(a, b)


def test_random_star_pairs_pointwise():
    rng = np.random.default_rng(7)
    for trial in range(12):
        a = _star(0.0, 0.0, 1.0 + rng.uniform(0, 2), 0.3 + rng.uniform(0, 0.6),
                  n=int(rng.integers(3, 8)), phase=rng.uniform(0, 3.0))
        b = _star(rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5),
                  1.0 + rng.uniform(0, 2), 0.3 + rng.uniform(0, 0.6),
                  n=int(rng.integers(3, 8)), phase=rng.uniform(0, 3.0))
        try:
            rings = poly_poly_intersection(a, b)
        except NotImplementedError:
            continue  # degenerate tangency: declining is correct behavior
        for r in rings:
            assert ring_area(r) > 0
        _pointwise_check(a, b, rings)


def test_registry_st_intersection_nonconvex_roundtrip(spark):
    from pyspark.sql import functions as F

    from geomesa_spark.geom.wkb import wkt_write

    star = _star(0.0, 0.0, 2.0, 0.8, n=5, phase=0.3)
    rect = _rect(-1.0, -1.0, 1.5, 1.2)
    df = spark.createDataFrame([(wkt_write(star), wkt_write(rect))], "a string, b string")
    out = df.select(F.expr(
        "st_area(st_intersection(st_geomFromWKT(a), st_geomFromWKT(b)))").alias("ar"))
    got = out.collect()[0].ar
    want = sum(ring_area(r) for r in poly_poly_intersection(star, rect))
    assert got == pytest.approx(want, rel=1e-12)


# ---------------------------------------------------------------------------
# difference


def _pointwise_diff_check(pa, pb, polys, n=120):
    """inside(A) AND NOT inside(B) must equal inside(result), off-boundary."""
    xs0, ys0, xs1, ys1 = pa.envelope()
    xb0, yb0, xb1, yb1 = pb.envelope()
    gx = np.linspace(min(xs0, xb0) - 0.1, max(xs1, xb1) + 0.1, n)
    gy = np.linspace(min(ys0, yb0) - 0.1, max(ys1, yb1) + 0.1, n)
    gx = gx + (gx[1] - gx[0]) * 0.137
    gy = gy + (gy[1] - gy[0]) * 0.241
    mism = 0
    for x in gx:
        la = K.pip_rings(np.full_like(gy, x), gy, pa.rings)
        lb = K.pip_rings(np.full_like(gy, x), gy, pb.rings)
        if polys:
            lr = np.max(np.stack([K.pip_rings(np.full_like(gy, x), gy, p.rings)
                                  for p in polys]), axis=0)
        else:
            lr = np.full_like(la, -1)
        ok = (la != 0) & (lb != 0) & (lr != 0)
        mism += int(np.sum((((la == 1) & (lb == -1)) != (lr == 1)) & ok))
    assert mism == 0


def test_difference_hole_case():
    from geomesa_spark.geom.overlay import poly_poly_difference

    a = _rect(0, 0, 10, 10)
    b = _rect(3, 3, 5, 5)
    polys = poly_poly_difference(a, b)
    assert len(polys) == 1 and len(polys[0].holes) == 1
    assert ring_area(polys[0].shell) == pytest.approx(100.0)
    assert ring_area(polys[0].holes[0]) == pytest.approx(-4.0)
    _pointwise_diff_check(a, b, polys)


def test_difference_star_rect_pointwise():
    from geomesa_spark.geom.overlay import poly_poly_difference

    star = _star(0.0, 0.0, 2.0, 0.8, n=5, phase=0.3)
    rect = _rect(-1.0, -1.0, 1.5, 1.2)
    polys = poly_poly_difference(star, rect)
    assert polys
    _pointwise_diff_check(star, rect, polys)
    # A = (A∩B) + (A\B) exactly (same cut coordinates both ways)
    inter = sum(ring_area(r) for r in poly_poly_intersection(star, rect))
    diff = sum(ring_area(p.shell) + sum(ring_area(h) for h in p.holes)
               for p in polys)
    assert inter + diff == pytest.approx(-ring_area(star.shell[::-1]), rel=1e-12)


def test_difference_split_into_components():
    from geomesa_spark.geom.overlay import poly_poly_difference

    a = _rect(0, 0, 10, 2)
    b = _rect(4, -1, 6, 3)  # bar cutting A into two pieces
    polys = poly_poly_difference(a, b)
    assert len(polys) == 2
    assert sorted(ring_area(p.shell) for p in polys) == pytest.approx([8.0, 8.0])
    _pointwise_diff_check(a, b, polys)


def test_difference_disjoint_and_covered():
    from geomesa_spark.geom.overlay import poly_poly_difference

    a = _rect(0, 0, 1, 1)
    assert len(poly_poly_difference(a, _rect(5, 5, 6, 6))) == 1
    assert poly_poly_difference(a, _rect(-1, -1, 2, 2)) == []


def test_random_star_difference_pointwise():
    rng = np.random.default_rng(11)
    from geomesa_spark.geom.overlay import poly_poly_difference

    for trial in range(10):
        a = _star(0.0, 0.0, 1.0 + rng.uniform(0, 2), 0.3 + rng.uniform(0, 0.6),
                  n=int(rng.integers(3, 8)), phase=rng.uniform(0, 3.0))
        b = _star(rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5),
                  1.0 + rng.uniform(0, 2), 0.3 + rng.uniform(0, 0.6),
                  n=int(rng.integers(3, 8)), phase=rng.uniform(0, 3.0))
        try:
            polys = poly_poly_difference(a, b)
        except NotImplementedError:
            continue
        _pointwise_diff_check(a, b, polys)


def test_registry_st_difference_nonconvex(spark):
    from pyspark.sql import functions as F

    from geomesa_spark.geom.overlay import poly_poly_difference
    from geomesa_spark.geom.wkb import wkt_write

    a = _rect(0, 0, 10, 10)
    b = _rect(3, 3, 5, 5)
    df = spark.createDataFrame([(wkt_write(a), wkt_write(b))], "a string, b string")
    got = df.select(F.expr(
        "st_area(st_difference(st_geomFromWKT(a), st_geomFromWKT(b)))").alias("ar")
    ).collect()[0].ar
    assert got == pytest.approx(96.0)
