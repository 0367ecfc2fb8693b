"""Round-6 batch 28: IDW interpolation + buffer cells."""

import numpy as np

from dggstools_spark.dggs.cells import HALF_SIDE
from dggstools_spark.operators.interp import WQ, idw_interp
from dggstools_spark.operators.spatial_join import buffer_cells


def test_idw_matches_integer_replica(spark):
    obs = [(10, 0.0, 0.0), (40, 3000.0, 4000.0), (100, 100000.0, 0.0),
           (7, 1.0, 0.0)]  # near-coincident with q1 -> clamped weight
    qs = [(1, 0.0, 0.0), (2, 50000.0, 50000.0), (3, 9.9e6, 9.9e6)]
    odf = spark.createDataFrame(obs, "v long, px double, py double")
    qdf = spark.createDataFrame(qs, "q_id long, qx double, qy double")
    d = 200_000.0
    out = {r.q_id: r for r in idw_interp(odf, qdf, d, 1).collect()}

    def rep(qx, qy):
        num = den = 0
        n = 0
        for v, px, py in obs:
            d2 = (px - qx) ** 2 + (py - qy) ** 2
            if d2 <= d * d:
                wq = round(WQ / max(d2, 1.0))
                num += wq * v
                den += wq
                n += 1
        return (n, num // den) if n else None

    for q_id, qx, qy in qs:
        exp = rep(qx, qy)
        if exp is None:
            assert q_id not in out
        else:
            assert (out[q_id].n_obs, out[q_id].est) == exp, q_id
    # q1 sits on obs(10) with obs(7) 1 m away: both clamp to max weight,
    # so the estimate is the straight mean of 10 and 7 -> 8
    assert out[1].est == 8


def test_buffer_cells_center_inclusion(spark):
    from dggstools_spark.dggs import cells as K

    s = float(HALF_SIDE)
    res = 3
    w = s / 27
    pts = [(0.3 * s, 0.1 * s), (0.3 * s + w / 4, 0.1 * s)]  # overlapping
    df = spark.createDataFrame(pts, "px double, py double")
    d = 2.2 * w
    out = {r.cellid: r.n_pts for r in
           buffer_cells(df, d, res).collect()}
    # brute force: all lattice centers within d of each point
    exp = {}
    for px, py in pts:
        ks = int(np.ceil(d / w)) + 1
        ci0 = int(np.floor((px + 2 * s) / w))
        ri0 = int(np.floor((1.5 * s - py) / w))
        for ci in range(ci0 - ks, ci0 + ks + 1):
            for ri in range(ri0 - ks, ri0 + ks + 1):
                cx = -2 * s + (ci + 0.5) * w
                cy = 1.5 * s - (ri + 0.5) * w
                if (cx - px) ** 2 + (cy - py) ** 2 <= d * d:
                    cid = K.planar_to_cellid(
                        np.array([cx]), np.array([cy]), res)[0]
                    exp[cid] = exp.get(cid, 0) + 1
    assert out == exp and len(out) > 10
    assert max(out.values()) == 2  # overlap zone counted twice


def test_buffer_cells_k_guard(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "px double, py double")
    try:
        buffer_cells(df, 1e7, 6)
        assert False
    except ValueError as e:
        assert "coarser res" in str(e)
