"""Geodesy goldens from /root/reference/tests/unit_tests/tests_dggstools.py:41-90.

The reference uses pyproj (Karney); our Vincenty implementation agrees to
~1e-5 m on these cases, so tolerances are set accordingly (documented
deviation, see dggstools_spark/dggs/geodesy.py docstring)."""

import numpy as np
import pytest

from dggstools_spark.dggs import geodesy


def test_iberia_diagonal_golden():
    left, top, right, bottom = -9.64, 44.24, 3.53, 35.66
    res_x = 0.0333333
    width = (right - left) / res_x
    height = abs((top - bottom) / -0.033333)
    diag, res = geodesy.geodesic_size_estimate(left, top, right, bottom, width, height)
    assert diag == pytest.approx(1471245.1842697694, abs=0.01)
    assert res == pytest.approx(3120.012427237816, abs=1e-4)


def test_global_extent_golden():
    # pole-to-pole meridian arc
    left, top, right, bottom = -180, 90, 180, -90
    width = (right - left) / 0.0333333
    height = abs((top - bottom) / -0.033333)
    diag, res = geodesy.geodesic_size_estimate(left, top, right, bottom, width, height)
    assert diag == pytest.approx(20003931.458625447, abs=0.01)
    assert res == pytest.approx(1656.6676042015517, abs=1e-4)


def test_distance_symmetry_and_zero():
    d0 = geodesy.geodesic_distance([10.0], [45.0], [10.0], [45.0])
    assert d0[0] == 0.0
    d1 = geodesy.geodesic_distance([0.0], [0.0], [1.0], [0.0])
    # one degree of longitude at the equator ~ 111.32 km
    assert d1[0] == pytest.approx(111319.49, abs=1.0)


def test_polygon_area_hemisphere():
    # a "band" polygon covering a half of the sphere has ~half the area
    lons = [-180, -90, 0, 90, 180, 180, 90, 0, -90, -180]
    lats = [0, 0, 0, 0, 0, 90, 90, 90, 90, 90]
    # triangle-fan on a hemisphere boundary degenerates; use a large spherical
    # triangle instead: area of (0,0),(90,0),(0,90) = 1/8 of the sphere
    area = geodesy.geodesic_polygon_area([0, 90, 0], [0, 0, 90])
    sphere = 4 * np.pi * geodesy.AUTHALIC_RADIUS**2
    assert area == pytest.approx(sphere / 8, rel=1e-12)


def test_polygon_area_small_square():
    # 1-degree square at the equator: ~111.32 km x ~110.57 km = ~1.2309e10 m^2
    area = geodesy.geodesic_polygon_area([0, 1, 1, 0], [0, 0, 1, 1])
    assert area == pytest.approx(1.2309e10, rel=1e-3)


def test_antipodal_fallback():
    """Vincenty diverges near the antipode; the great-circle fallback keeps
    the error bounded (~0.2%) instead of a silent ~100 km shortfall."""
    import numpy as np

    from dggstools_spark.dggs.geodesy import geodesic_distance

    d = float(geodesic_distance(np.array([0.0]), np.array([0.0]),
                                np.array([180.0]), np.array([0.0]))[0])
    meridian = 20003931.458625447
    assert abs(d - meridian) / meridian < 0.005
    d2 = float(geodesic_distance(np.array([0.0]), np.array([0.0]),
                                 np.array([179.5]), np.array([0.5]))[0])
    assert abs(d2 - meridian) / meridian < 0.005
