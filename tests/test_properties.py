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
