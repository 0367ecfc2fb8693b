"""Hotspots + native session-window streaming (round 5, batch 17)."""

from pyspark.sql import functions as F

from dggstools_spark.operators.spatial_stats import hotspots

PPM = 1_000_000


def _cells(spark, rows):
    return spark.createDataFrame(rows, "cellid string, v long")


def test_hotspots_ranks_local_concentration(spark):
    # face N 3x3 at res 1: one hot corner (d0=90), rest 1 -> total 98
    rows = [(f"N{d}", 90 if d == 0 else 1) for d in range(9)]
    out = hotspots(_cells(spark, rows), 1, k=3).orderBy("rank").collect()
    assert out[0].cellid == "N0"
    # N0 window {0,1,3,4}: focal_sum 93, ratio = 93*9*1e6 div (4*98)
    assert out[0].focal_sum == 93
    assert out[0].ratio_ppm == (93 * 9 * PPM) // (4 * 98)
    assert [r.rank for r in out] == [1, 2, 3]


def test_hotspots_uniform_field_flat(spark):
    rows = [(f"N{d}", 5) for d in range(9)]
    out = hotspots(_cells(spark, rows), 1, k=9).collect()
    # uniform field: every window mean equals the global mean exactly
    assert all(r.ratio_ppm == PPM for r in out)


def test_session_stream_gap_semantics(spark, tmp_path):
    import os

    from dggstools_spark.streaming.ingest import session_stream

    # two bursts 10 min apart, events 60 s apart inside a burst
    rows = [(i, "u1", 1700000000 + i * 60) for i in range(3)]
    rows += [(i + 10, "u1", 1700000600 + i * 60) for i in range(2)]
    rows += [(99, "u2", 1700000000)]
    df = spark.createDataFrame(
        [(d, u, t) for d, u, t in rows],
        "doc_id long, source string, ts long"
    ).select("doc_id", "source",
             F.timestamp_seconds("ts").alias("event_time"))
    src = os.path.join(str(tmp_path), "src")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    df.write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id bigint, source string, event_time timestamp").parquet(src)
    q = (session_stream(stream, "source")
         .writeStream.format("memory").queryName("t17_sessions")
         .outputMode("complete").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = [(r.source, r["win"]["start"].timestamp(), r.n_events)
           for r in spark.table("t17_sessions").collect()]
    got = sorted(out)
    # u1: two sessions (3 events, then 2 events 10 min later); u2: one
    assert got == [("u1", 1700000000.0, 3), ("u1", 1700000600.0, 2),
                   ("u2", 1700000000.0, 1)]


# ----------------------------------------------------------- local_moran

def test_local_moran_quadrants(spark):
    from dggstools_spark.operators.spatial_stats import local_moran

    # one high cell (d0=90) in a low field: HL outlier with negative lisa;
    # its neighbors are low cells next to the spike -> LH, negative too
    rows = [(f"N{d}", 90 if d == 0 else 1) for d in range(9)]
    df = spark.createDataFrame(rows, "cellid string, v long")
    out = {r.cellid: r for r in local_moran(df, 1, k=9).collect()}
    # mean floor = 98 // 9 = 10; d(N0) = 80, others -9
    assert out["N0"].d == 80
    assert out["N0"].quadrant == "HL" and out["N0"].lisa < 0
    assert out["N1"].quadrant == "LH" and out["N1"].lisa < 0
    # far corner N8: neighbors all low -> LL cluster, positive lisa
    assert out["N8"].quadrant == "LL" and out["N8"].lisa > 0
    # the spike dominates |lisa| ranking
    assert out["N0"].rank == 1
