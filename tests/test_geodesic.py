"""Ellipsoidal geodesic kernel (kernels/geodesic.py — the Karney/
GeographicLib model the reference reaches via PROJ, built here from
exact auxiliary-sphere relations + GL-20 quadrature, no series)."""

import math

import numpy as np
import pytest

from osgeo_gdal_spark.kernels import geodesic as GD


def test_total_area_closed_form():
    """The published WGS84 surface area (GeographicLib:
    510065621724088.44 m^2) from the closed form."""
    assert GD.ellipsoid_area() == pytest.approx(510065621724088.44, abs=1.0)


def test_published_arc_lengths():
    """Quarter meridian = 10001965.7293 m, quarter equator = a*pi/2
    (both published WGS84 constants)."""
    assert GD.line_length([0, 0], [0, 90]) == \
        pytest.approx(10001965.7293, abs=1e-3)
    assert GD.line_length([0, 90], [0, 0]) == \
        pytest.approx(6378137.0 * math.pi / 2, abs=1e-6)


def test_octant_exact():
    """Octant with a pole vertex closes to exactly total/8 — the
    Green-integral polar-cap term is exact."""
    a = GD.polygon_area([0, 90, 0], [0, 0, 90])
    assert a == GD.ellipsoid_area() / 8


def test_orientation_antisymmetry():
    lons, lats = [0, 40, 10], [5, 10, 50]
    assert GD.polygon_area(lons, lats) + \
        GD.polygon_area(lons[::-1], lats[::-1]) == pytest.approx(0.0, abs=1.0)


def test_spherical_limit_matches_lhuilier(monkeypatch):
    """f -> 0 limit: the full inverse-solve + Green machinery must
    reproduce the INDEPENDENT l'Huilier spherical excess to 1e-12 —
    the strongest end-to-end check available without GeographicLib
    in the container (the f-dependence itself is exact by
    construction: all integrands are derived closed forms)."""
    f0 = 1e-14
    monkeypatch.setattr(GD, "WGS84_F", f0)
    monkeypatch.setattr(GD, "WGS84_B", GD.WGS84_A * (1 - f0))
    monkeypatch.setattr(GD, "_E2", f0 * (2 - f0))
    monkeypatch.setattr(GD, "_EP2", GD._E2 / (1 - GD._E2))
    monkeypatch.setattr(GD, "_E", math.sqrt(GD._E2))
    lons, lats = [0, 40, 10], [5, 10, 50]
    a = GD.polygon_area(lons, lats)

    def unit(lon, lat):
        lo, la = math.radians(lon), math.radians(lat)
        return np.array([math.cos(la) * math.cos(lo),
                         math.cos(la) * math.sin(lo), math.sin(la)])

    v = [unit(lo, la) for lo, la in zip(lons, lats)]

    def ang(p, q):
        return 2 * math.asin(min(1.0, 0.5 * float(np.linalg.norm(p - q))))

    A, B, C = ang(v[1], v[2]), ang(v[0], v[2]), ang(v[0], v[1])
    s = 0.5 * (A + B + C)
    E = 4 * math.atan(math.sqrt(max(
        0.0, math.tan(s / 2) * math.tan((s - A) / 2)
        * math.tan((s - B) / 2) * math.tan((s - C) / 2))))
    sph = E * GD.WGS84_A ** 2
    assert abs(a - sph) / sph < 1e-12


def test_quadrature_convergence():
    """GL-20 is converged: doubling to GL-40 changes a mid-latitude
    quad's area by < 1e-9 relative (the quadrature, the only
    approximation in the kernel, is below double noise here)."""
    lons, lats = [10, 55, 60, 5], [20, 15, 60, 65]
    a20 = GD.polygon_area(lons, lats)
    nodes = np.polynomial.legendre.leggauss(40)
    old = (GD._GLX, GD._GLW)
    try:
        GD._GLX, GD._GLW = nodes
        a40 = GD.polygon_area(lons, lats)
    finally:
        GD._GLX, GD._GLW = old
    assert abs(a20 - a40) / abs(a40) < 1e-9


def test_same_latitude_edges():
    """The near-90-degree-azimuth family that defeats naive scans:
    same-latitude endpoints solve via the spherical seed + secant."""
    a = GD.polygon_area([0, 1, 1, 0], [50, 50, 51, 51])
    # ~ (71.7 km x 111.3 km) at lat 50
    assert 7.5e9 < a < 8.5e9
    # rotational symmetry of the ellipsoid: translating the quad in
    # longitude must not change its area (exact invariance)
    b = GD.polygon_area([117, 118, 118, 117], [50, 50, 51, 51])
    assert abs(a - b) / a < 1e-12
    # NOTE deliberately absent: subdividing the bottom edge at
    # (0.5, 50) changes the region — the geodesic between the
    # same-latitude corners arcs ~60 m ABOVE latitude 50, so the
    # two flatter sub-geodesics bound a genuinely smaller polygon
    # (measured: ~1.5e-5 relative) — not an error.
