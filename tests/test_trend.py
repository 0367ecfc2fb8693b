"""Integer OLS trend / emerging hotspots (round 6, batch 23)."""

from dggstools_spark.operators.trend import trend_topk


def test_slope_matches_closed_form(spark):
    # key 'up': y = 2t + 1 exactly -> slope 2.0 -> slope_ppm 2_000_000;
    # key 'down': y = 10 - 3t -> slope_ppm -3_000_000;
    # key 'flat': constant -> 0; key 'single': one bucket -> excluded.
    rows = ([("up", t, 2 * t + 1) for t in range(5)]
            + [("down", t, 10 - 3 * t) for t in range(3)]
            + [("flat", t, 7) for t in range(4)]
            + [("single", 2, 99)])
    df = spark.createDataFrame(rows, "k string, t long, y long")
    out = {r.k: r for r in trend_topk(df, "k", "t", "y", 10).collect()}
    assert set(out) == {"up", "down", "flat"}
    assert out["up"].slope_ppm == 2_000_000
    assert out["down"].slope_ppm == -3_000_000
    assert out["flat"].slope_ppm == 0
    assert out["up"].rank == 1
    # duplicate (k, t) rows sum into one bucket before the regression
    rows2 = [("a", 0, 1), ("a", 0, 1), ("a", 1, 4)]
    df2 = spark.createDataFrame(rows2, "k string, t long, y long")
    r = trend_topk(df2, "k", "t", "y", 5).collect()[0]
    assert (r.n_buckets, r.total, r.slope_ppm) == (2, 6, 2_000_000)
