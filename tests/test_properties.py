"""Property-based tests (hypothesis) for the pure-Python kernels.

No Spark session per example — these hammer the numpy cell kernel and the
AUID codec with thousands of generated inputs per run, complementing the
fixed-fixture tests.  Invariants mirror the reference's contracts
(reference auids/common.py roundtrip + optimize semantics,
rhealpixdggs-style encode/decode consistency).
"""

import numpy as np
import pytest

pytest.importorskip("hypothesis")  # optional dep (pyproject test extra)
from hypothesis import given, settings, strategies as st  # noqa: E402

from dggstools_spark.dggs import auids, cells
from dggstools_spark.dggs.config import DEFAULT_CONFIG

N_SIDE = DEFAULT_CONFIG.n_side
DIGITS = [str(d) for d in range(N_SIDE * N_SIDE)]
FACES = list("NOPQRS")

cuid_st = st.text(alphabet=DIGITS, min_size=0, max_size=6).flatmap(
    lambda tail: st.sampled_from(FACES).map(lambda f: f + tail))
lon_st = st.floats(min_value=-179.999, max_value=179.999,
                   allow_nan=False, allow_infinity=False)
lat_st = st.floats(min_value=-89.999, max_value=89.999,
                   allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(st.lists(cuid_st, min_size=1, max_size=30), st.booleans())
def test_auid_roundtrip_and_canonicalization(cuids, optimize):
    """BP AUID encode/decode returns the sorted, deduped cuid set (after
    optional compaction); compress/b64 roundtrips byte-exactly."""
    base = sorted(set(cuids))
    work = auids.optimize_cuids(base, N_SIDE) if optimize else base
    bp = auids.generate_bp_auid_from_cuids(work)
    back = auids.generate_cuids_from_bp_auid(bp)
    assert back == sorted(set(work))
    comp_b64, hash_b64 = auids.generate_auid_hash_b64(work)
    assert auids.cuids_from_auid_b64(comp_b64) == sorted(set(work))
    assert hash_b64  # stable, urlsafe
    assert auids.decompress_id_bytes(auids.compress_id(bp)) == bp


@settings(max_examples=200, deadline=None)
@given(st.lists(cuid_st, min_size=1, max_size=30))
def test_optimize_idempotent_and_optimal(cuids):
    """Compaction is idempotent, produces an optimal set, and never covers
    area it didn't cover before: every input cuid keeps an ancestor-or-self
    in the output, and every output cuid is an ancestor-or-self of some
    input cuid (area can only be EXACTLY re-covered because collapse
    requires all n_side^2 pure-leaf siblings)."""
    opt = auids.optimize_cuids(cuids, N_SIDE)
    assert auids.is_optimal_cuids(opt, N_SIDE)
    assert auids.optimize_cuids(opt, N_SIDE) == sorted(set(opt))
    inp = sorted(set(cuids))
    assert all(any(c.startswith(o) for o in opt) for c in inp)
    assert all(any(c.startswith(o) for c in inp) or
               any(o.startswith(c) for c in inp) for o in opt)


@settings(max_examples=200, deadline=None)
@given(st.lists(lon_st, min_size=1, max_size=50),
       st.integers(min_value=0, max_value=6))
def test_encode_centroid_reencodes_to_same_cell(lons, res):
    """lon/lat -> cellid, then the cell's planar centroid re-encodes to the
    SAME cellid (centroid is interior), and the bbox contains it."""
    rng = np.random.default_rng(len(lons) * 31 + res)
    lon = np.array(lons)
    lat = rng.uniform(-89.9, 89.9, size=len(lon))
    cid = cells.lonlat_to_cellid(lon, lat, res)
    assert all(len(c) == res + 1 and c[0] in FACES for c in cid)
    cx, cy = cells.cellid_to_planar_centroid(list(cid))
    cid2 = cells.planar_to_cellid(np.asarray(cx), np.asarray(cy), res)
    assert list(cid) == list(cid2)
    # raster (left, top, right, bottom) convention, like the repo's
    # bounds_to_left_top_right_bottom
    l, t, r, b = cells.cellid_to_bbox(list(cid))
    assert np.all((np.asarray(l) <= np.asarray(cx)) & (np.asarray(cx) <= np.asarray(r)))
    assert np.all((np.asarray(b) <= np.asarray(cy)) & (np.asarray(cy) <= np.asarray(t)))


@settings(max_examples=200, deadline=None)
@given(st.lists(lon_st, min_size=1, max_size=50),
       st.integers(min_value=0, max_value=8))
def test_cellkey_pack_roundtrip(lons, res):
    """Packed int64 cell keys (the shuffle representation) decode to the
    identical cellid strings the string path produces."""
    rng = np.random.default_rng(len(lons) * 17 + res)
    lon = np.array(lons)
    lat = rng.uniform(-89.9, 89.9, size=len(lon))
    cid = cells.lonlat_to_cellid(lon, lat, res)
    key = cells.lonlat_to_cellkey(lon, lat, res)
    assert list(cells.cellkey_to_cellid(key, res)) == list(cid)


# --------------------------------------------------------------------------
# cap-face configs: every (north_square, south_square) in 0..3 x 0..3
# (VERDICT r4 item 7).  The upstream rhealpixdggs library is absent from
# this sandbox and the reference fixtures carry no polar point->cellid
# vectors (COVERAGE.md known limit), so the cap-rotation convention is
# pinned by INVARIANTS, generated across all 16 configs: fwd/inv
# projection roundtrip, pole placement on the N/S faces, equal-area face
# occupancy for an area-uniform sample, and encode->centroid->re-encode
# stability (cap cells included).
# --------------------------------------------------------------------------

from dggstools_spark.dggs import projection  # noqa: E402
from dggstools_spark.dggs.config import RHEALPixConfig  # noqa: E402

cap_st = st.integers(min_value=0, max_value=3)


@settings(max_examples=64, deadline=None)
@given(cap_st, cap_st, st.integers(min_value=0, max_value=2**32 - 1))
def test_cap_config_fwd_inv_roundtrip(ns, ss, seed):
    """forward(inverse) is the identity (<1e-6 deg) for every cap config,
    including points deep inside both polar caps."""
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180.0, 180.0, size=40)
    # half the sample forced into the caps (|lat| > ~41.9 deg transition)
    lat = np.concatenate([rng.uniform(-89.99, 89.99, size=20),
                          rng.uniform(60.0, 89.99, size=10),
                          rng.uniform(-89.99, -60.0, size=10)])
    x, y = projection.forward(lon, lat[: len(lon)], ns, ss)
    lon2, lat2 = projection.inverse(x, y, ns, ss)
    dlon = (np.asarray(lon2) - lon + 180.0) % 360.0 - 180.0
    # near the poles longitude is ill-conditioned: weight by cos(lat)
    assert np.all(np.abs(dlon * np.cos(np.radians(lat[: len(lon)]))) < 1e-6)
    assert np.all(np.abs(np.asarray(lat2) - lat[: len(lon)]) < 1e-6)


@settings(max_examples=32, deadline=None)
@given(cap_st, cap_st, st.integers(min_value=1, max_value=4))
def test_cap_config_pole_placement(ns, ss, res):
    """The poles land on the N/S faces under every cap config, and the
    pole cell's centroid decodes back to >=89.9/<=-89.9 deg latitude."""
    cfg = RHEALPixConfig(north_square=ns, south_square=ss)
    npole = cells.lonlat_to_cellid(np.array([0.0]), np.array([90.0]), res, cfg)
    spole = cells.lonlat_to_cellid(np.array([0.0]), np.array([-90.0]), res, cfg)
    assert npole[0][0] == "N" and spole[0][0] == "S"
    for cid, want in ((npole, 90.0), (spole, -90.0)):
        cx, cy = cells.cellid_to_planar_centroid(list(cid), cfg)
        _, lat = projection.inverse(np.asarray(cx), np.asarray(cy), ns, ss)
        # a res>=1 pole cell spans ~30/n_side^res deg; centroid sits within
        assert abs(float(lat[0]) - want) < 40.0 / cfg.n_side**res


@settings(max_examples=24, deadline=None)
@given(cap_st, cap_st, st.integers(min_value=0, max_value=2**32 - 1))
def test_cap_config_equal_area_faces(ns, ss, seed):
    """An area-uniform sample (lon uniform, sin(lat) uniform) occupies the
    six res-0 faces in near-equal shares under every cap config — the
    equal-area property the cap rotation must not break."""
    rng = np.random.default_rng(seed)
    n = 3000
    lon = rng.uniform(-180.0, 180.0, size=n)
    lat = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, size=n)))
    cfg = RHEALPixConfig(north_square=ns, south_square=ss)
    cid = cells.lonlat_to_cellid(lon, lat, 0, cfg)
    counts = {f: 0 for f in "NOPQRS"}
    for c in cid:
        counts[c[0]] += 1
    for f, c in counts.items():
        assert 0.10 < c / n < 0.24, (f, counts)


@settings(max_examples=48, deadline=None)
@given(cap_st, cap_st, st.integers(min_value=0, max_value=5),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_cap_config_centroid_reencode(ns, ss, res, seed):
    """encode -> planar centroid -> re-encode is the identity at every
    resolution under every cap config (cap-heavy sample)."""
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180.0, 180.0, size=30)
    lat = np.concatenate([rng.uniform(-89.9, 89.9, size=10),
                          rng.uniform(45.0, 89.9, size=10),
                          rng.uniform(-89.9, -45.0, size=10)])
    cfg = RHEALPixConfig(north_square=ns, south_square=ss)
    cid = cells.lonlat_to_cellid(lon, lat, res, cfg)
    cx, cy = cells.cellid_to_planar_centroid(list(cid), cfg)
    cid2 = cells.planar_to_cellid(np.asarray(cx), np.asarray(cy), res, cfg)
    assert list(cid) == list(cid2)
