"""Batch 36 (round 6): space-time Gi + emerging-hotspot classification.

Four ISOLATED cells (pairwise queen distance ≥ 6, so every focal window
is just the cell itself and ratio_ppm reduces to the cell's share of
that day's total) with hand-designed trajectories that hit the
'new' / 'historical' / 'never' / 'intensifying' labels and the exact
per-day normalization.
"""

from pyspark.sql import functions as F

from dggstools_spark.operators.spacetime import emerging_hotspots, st_gi

A, B, C, D = "N00", "N20", "N60", "N80"  # (0,0) (0,6) (6,0) (6,6)

OBS = [
    # day 1: total 9           day 2: total 9      day 3: total 12
    (A, 1, 1), (B, 1, 6), (C, 1, 1), (D, 1, 1),
    (A, 2, 2), (B, 2, 2), (C, 2, 2), (D, 2, 3),
    (A, 3, 6), (B, 3, 1), (C, 3, 1), (D, 3, 4),
]


def _obs(spark):
    return spark.createDataFrame(
        OBS, "cellid string, day long, v long")


def test_st_gi_isolated_cells_share_of_day(spark):
    out = {(r.cellid, r.day): r for r in st_gi(_obs(spark), 2).collect()}
    assert all(r.n_window == 1 and r.focal_sum == r.v
               for r in out.values())
    # ratio = v * N_day * 1e6 div total_day
    assert out[(B, 1)].ratio_ppm == 6 * 4 * 10**6 // 9   # 2_666_666
    assert out[(A, 2)].ratio_ppm == 2 * 4 * 10**6 // 9   # 888_888
    assert out[(D, 3)].ratio_ppm == 4 * 4 * 10**6 // 12  # 1_333_333
    # corner cell is flagged on-seam; all four touch a face edge here
    assert out[(A, 1)].on_seam == 1


def test_st_gi_uniform_surface_is_exactly_1e6(spark):
    rows = [(c, 1, 5) for c in (A, B, C, D)]
    obs = spark.createDataFrame(rows, "cellid string, day long, v long")
    for r in st_gi(obs, 2).collect():
        assert r.ratio_ppm == 1_000_000


def test_emerging_hotspot_categories(spark):
    out = {r.cellid: r
           for r in emerging_hotspots(_obs(spark), 2, 10).collect()}
    assert out[A].category == "new"           # first hot day is the last
    assert out[B].category == "historical"    # hot on day 1 only
    assert out[C].category == "never"
    assert out[D].category == "intensifying"  # hot d2+d3, S > 0
    assert (out[D].hot_days, out[A].hot_days, out[B].hot_days,
            out[C].hot_days) == (2, 1, 1, 0)
    assert out[A].s == 3 and out[B].s == -3
    # rank: hot_days desc, then S desc, then cellid
    order = [r.cellid for r in sorted(out.values(),
                                      key=lambda r: r.rank)]
    assert order == [D, A, B, C]


def test_emerging_hotspot_min_days_filter(spark):
    rows = OBS + [("N44", 3, 9)]  # one-day cell must be excluded
    obs = spark.createDataFrame(rows, "cellid string, day long, v long")
    out = {r.cellid for r in emerging_hotspots(obs, 2, 10).collect()}
    assert "N44" not in out and out == {A, B, C, D}
