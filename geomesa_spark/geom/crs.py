"""Ellipsoidal projection math for ``st_transform`` beyond 3857/UTM.

Adds the polar and equal-area families the reference exposes through
GeoTools' CRS database (reference: geomesa-utils-parent geometry/
GeometryUtils + the SparkSQL st_transform UDF registered in
org/locationtech/geomesa/spark/jts/udf/GeometricCastFunctions.scala —
the reference delegates reprojection to GeoTools; here the container
has no CRS database, so the common EPSG codes are implemented directly
from the public formulas):

- Polar Stereographic (Snyder 1987 §21, EPSG Guidance Note 7-2 §3.2.4):
  variant A (UPS, EPSG:5041/5042 and 32661/32761; k0 = 0.994, false
  origin 2 000 000 m) and variant B (standard-parallel form, EPSG:3413
  NSIDC north / EPSG:3976 NSIDC south).
- Lambert Azimuthal Equal Area, oblique ellipsoidal (Snyder 1987 §24,
  EPSG §3.2.2): EPSG:3035 (ETRS-style grid over Europe; WGS84 ellipsoid
  here — the WGS84/GRS80 datum shift is zero to sub-mm and the
  ellipsoids differ only in the 1e-10 flattening term).

All functions are vectorized over an (n, 2) lon/lat (or E/N) array in
float64, matching the UTM Krueger implementation in
functions/registry.py.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0
_F = 1.0 / 298.257223563
_E = np.sqrt(_F * (2.0 - _F))
_E2 = _F * (2.0 - _F)

# sqrt((1+e)^(1+e) * (1-e)^(1-e)) — the polar-stereographic rho scale
_PS_K = np.sqrt((1.0 + _E) ** (1.0 + _E) * (1.0 - _E) ** (1.0 - _E))


def _wrap_lon(lon: np.ndarray) -> np.ndarray:
    """Wrap degrees into [-180, 180): the lon0 offset of an inverse
    projection can push atan2's wrapped output past the antimeridian
    (e.g. EPSG:3413's lon0=-45 maps true lon 170 to raw -190)."""
    return (np.asarray(lon) + 180.0) % 360.0 - 180.0


def _ps_t(phi: np.ndarray) -> np.ndarray:
    """Snyder 21-33/15-9: isometric-colatitude half-angle tangent."""
    sp = np.sin(phi)
    return (np.tan(np.pi / 4.0 - phi / 2.0)
            * ((1.0 + _E * sp) / (1.0 - _E * sp)) ** (_E / 2.0))


def _ps_k0(lat_ts: float) -> float:
    """Variant-B scale: k0 such that scale is true at lat_ts (north form,
    Snyder 21-32..21-35: k0 = m_c * PS_K / (2 t_c))."""
    phi = np.radians(abs(lat_ts))
    m = np.cos(phi) / np.sqrt(1.0 - _E2 * np.sin(phi) ** 2)
    t = float(_ps_t(np.array([phi]))[0])
    return float(m * _PS_K / (2.0 * t))


# chi -> phi conformal-latitude series (Snyder 3-5)
_CHI_C2 = _E2 / 2.0 + 5.0 * _E2 ** 2 / 24.0 + _E2 ** 3 / 12.0 + 13.0 * _E2 ** 4 / 360.0
_CHI_C4 = 7.0 * _E2 ** 2 / 48.0 + 29.0 * _E2 ** 3 / 240.0 + 811.0 * _E2 ** 4 / 11520.0
_CHI_C6 = 7.0 * _E2 ** 3 / 120.0 + 81.0 * _E2 ** 4 / 1120.0
_CHI_C8 = 4279.0 * _E2 ** 4 / 161280.0


def _phi_from_chi(chi: np.ndarray) -> np.ndarray:
    return (chi + _CHI_C2 * np.sin(2.0 * chi) + _CHI_C4 * np.sin(4.0 * chi)
            + _CHI_C6 * np.sin(6.0 * chi) + _CHI_C8 * np.sin(8.0 * chi))


def ps_forward(c: np.ndarray, south: bool, k0: float, lon0: float,
               fe: float, fn: float) -> np.ndarray:
    """(lon, lat) degrees -> polar-stereographic (E, N) meters."""
    lon = np.radians(c[:, 0])
    lat = np.radians(c[:, 1])
    lam = lon - np.radians(lon0)
    if south:
        t = _ps_t(-lat)
        rho = 2.0 * _A * k0 * t / _PS_K
        return np.column_stack([fe + rho * np.sin(lam),
                                fn + rho * np.cos(lam)])
    t = _ps_t(lat)
    rho = 2.0 * _A * k0 * t / _PS_K
    return np.column_stack([fe + rho * np.sin(lam),
                            fn - rho * np.cos(lam)])


def ps_inverse(c: np.ndarray, south: bool, k0: float, lon0: float,
               fe: float, fn: float) -> np.ndarray:
    """Polar-stereographic (E, N) meters -> (lon, lat) degrees."""
    x = c[:, 0] - fe
    y = c[:, 1] - fn
    rho = np.hypot(x, y)
    t = rho * _PS_K / (2.0 * _A * k0)
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)
    phi = _phi_from_chi(chi)
    if south:
        lam = np.arctan2(x, y)
        phi = -phi
    else:
        lam = np.arctan2(x, -y)
    # at the exact pole (rho == 0) longitude is indeterminate; pin to lon0
    lam = np.where(rho == 0.0, 0.0, lam)
    return np.column_stack([_wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)])


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal Area (oblique, ellipsoidal)

def _laea_q(phi: np.ndarray) -> np.ndarray:
    """Snyder 3-12: authalic-latitude auxiliary q."""
    sp = np.sin(phi)
    return (1.0 - _E2) * (sp / (1.0 - _E2 * sp * sp)
                          - (1.0 / (2.0 * _E))
                          * np.log((1.0 - _E * sp) / (1.0 + _E * sp)))


_QP = float(_laea_q(np.array([np.pi / 2.0]))[0])


def _laea_consts(lat0: float):
    phi0 = np.radians(lat0)
    q0 = float(_laea_q(np.array([phi0]))[0])
    beta0 = np.arcsin(q0 / _QP)
    rq = _A * np.sqrt(_QP / 2.0)
    m0 = np.cos(phi0) / np.sqrt(1.0 - _E2 * np.sin(phi0) ** 2)
    d = _A * m0 / (rq * np.cos(beta0))
    return beta0, rq, d


def laea_forward(c: np.ndarray, lat0: float, lon0: float,
                 fe: float, fn: float) -> np.ndarray:
    """(lon, lat) degrees -> LAEA (E, N) meters (Snyder 24-15..24-17)."""
    beta0, rq, d = _laea_consts(lat0)
    lam = np.radians(c[:, 0]) - np.radians(lon0)
    phi = np.radians(c[:, 1])
    beta = np.arcsin(np.clip(_laea_q(phi) / _QP, -1.0, 1.0))
    cb, sb = np.cos(beta), np.sin(beta)
    cb0, sb0 = np.cos(beta0), np.sin(beta0)
    b = rq * np.sqrt(2.0 / (1.0 + sb0 * sb + cb0 * cb * np.cos(lam)))
    e = fe + b * d * cb * np.sin(lam)
    n = fn + (b / d) * (cb0 * sb - sb0 * cb * np.cos(lam))
    return np.column_stack([e, n])


def laea_inverse(c: np.ndarray, lat0: float, lon0: float,
                 fe: float, fn: float, iters: int = 6) -> np.ndarray:
    """LAEA (E, N) meters -> (lon, lat) degrees (Snyder 24-29..24-34 +
    the phi iteration 3-16)."""
    beta0, rq, d = _laea_consts(lat0)
    x = c[:, 0] - fe
    y = c[:, 1] - fn
    cb0, sb0 = np.cos(beta0), np.sin(beta0)
    rho = np.hypot(x / d, d * y)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
    cc, sc = np.cos(ce), np.sin(ce)
    with np.errstate(invalid="ignore", divide="ignore"):
        q = _QP * (cc * sb0 + d * y * sc * cb0 / rho)
    q = np.where(rho == 0.0, _QP * sb0, q)
    lam = np.arctan2(x * sc, d * rho * cb0 * cc - d * d * y * sb0 * sc)
    lam = np.where(rho == 0.0, 0.0, lam)
    # iterate phi_{k+1} = phi_k + correction (Snyder 3-16)
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(iters):
        sp = np.sin(phi)
        one = 1.0 - _E2 * sp * sp
        phi = phi + (one * one / (2.0 * np.cos(phi))) * (
            q / (1.0 - _E2) - sp / one
            + (1.0 / (2.0 * _E)) * np.log((1.0 - _E * sp) / (1.0 + _E * sp)))
    return np.column_stack([_wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)])


# ---------------------------------------------------------------------------
# CRS registry (projection family + parameters per EPSG code)

PS_CRS = {
    # UPS (variant A): k0 = 0.994, false origin 2,000,000 m
    "5041": dict(south=False, k0=0.994, lon0=0.0, fe=2_000_000.0, fn=2_000_000.0),
    "5042": dict(south=True, k0=0.994, lon0=0.0, fe=2_000_000.0, fn=2_000_000.0),
    "32661": dict(south=False, k0=0.994, lon0=0.0, fe=2_000_000.0, fn=2_000_000.0),
    "32761": dict(south=True, k0=0.994, lon0=0.0, fe=2_000_000.0, fn=2_000_000.0),
    # NSIDC polar stereographic (variant B: scale true at lat_ts)
    "3413": dict(south=False, k0=_ps_k0(70.0), lon0=-45.0, fe=0.0, fn=0.0),
    "3976": dict(south=True, k0=_ps_k0(-71.0), lon0=0.0, fe=0.0, fn=0.0),
}

LAEA_CRS = {
    "3035": dict(lat0=52.0, lon0=10.0, fe=4_321_000.0, fn=3_210_000.0),
}
