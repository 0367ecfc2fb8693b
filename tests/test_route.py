"""Geodesic slerp sampling (batch 31): endpoint fidelity, step bound,
and the meridian closed form."""

import math

from dggstools_spark.dggs.geodesy import AUTHALIC_RADIUS
from dggstools_spark.operators.route import geodesic_samples


def _samples(spark, seg, step_m, max_n=64):
    df = spark.createDataFrame(
        [seg], "seg_id long, lon1 double, lat1 double,"
               " lon2 double, lat2 double")
    rows = geodesic_samples(df, step_m, max_n).collect()
    return sorted((r.i, r.lon, r.lat) for r in rows)


def _gc_m(a, b):
    (lo1, la1), (lo2, la2) = a, b
    u = (math.cos(math.radians(la1)) * math.cos(math.radians(lo1)),
         math.cos(math.radians(la1)) * math.sin(math.radians(lo1)),
         math.sin(math.radians(la1)))
    v = (math.cos(math.radians(la2)) * math.cos(math.radians(lo2)),
         math.cos(math.radians(la2)) * math.sin(math.radians(lo2)),
         math.sin(math.radians(la2)))
    d = max(-1.0, min(1.0, sum(x * y for x, y in zip(u, v))))
    return math.acos(d) * AUTHALIC_RADIUS


def test_meridian_route_closed_form(spark):
    # (0,0) -> (0,60): theta*R ~ 6672 km; step 1700 km -> n = 4,
    # samples at lat 0, 15, 30, 45, 60 on the lon=0 meridian
    pts = _samples(spark, (1, 0.0, 0.0, 0.0, 60.0), 1_700_000.0)
    assert len(pts) == 5
    for j, (i, lon, lat) in enumerate(pts):
        assert i == j and abs(lon) < 1e-9
        assert abs(lat - 15.0 * j) < 1e-9


def test_endpoints_exact_and_step_bound(spark):
    seg = (7, -73.98, 40.75, 2.35, 48.85)  # NYC -> Paris
    step = 1_000_000.0
    pts = _samples(spark, seg, step)
    assert abs(pts[0][1] - seg[1]) < 1e-9 and abs(pts[0][2] - seg[2]) < 1e-9
    assert abs(pts[-1][1] - seg[3]) < 1e-9 and abs(pts[-1][2] - seg[4]) < 1e-9
    total = _gc_m((seg[1], seg[2]), (seg[3], seg[4]))
    assert len(pts) == math.ceil(total / step) + 1
    for a, b in zip(pts, pts[1:]):
        d = _gc_m((a[1], a[2]), (b[1], b[2]))
        assert d <= step * 1.000001
    # equal arc spacing (slerp property)
    d01 = _gc_m((pts[0][1], pts[0][2]), (pts[1][1], pts[1][2]))
    assert abs(d - d01) < 1.0  # meters


def test_short_segment_single_step(spark):
    pts = _samples(spark, (3, 10.0, 10.0, 10.001, 10.0), 1_000_000.0)
    assert len(pts) == 2  # n_steps clamps to 1


def test_max_n_cap(spark):
    # near-antipodal long route with a tiny step: n clamps to max_n
    pts = _samples(spark, (4, 0.0, 0.0, 179.0, 0.0), 1_000.0, max_n=8)
    assert len(pts) == 9
