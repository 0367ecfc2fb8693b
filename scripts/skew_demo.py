"""Measured skew demo (VERDICT r1 item 8 / TODO_r2 item 4): ONE res-4 tile
holds ~95% of all docs.  Three mechanisms, each timed naive vs handled:

A. WRITE: partitionBy(tile) parquet write — naive repartition(tile)
   funnels the hot tile through one task; salted_repartition splits it.
B. JOIN: sort-merge join docs x per-tile stats on the hot key — AQE
   skew-join splitting ON vs OFF.
C. RANK top-k: naive window vs manual salting — expected result: naive
   WINS, because Catalyst's WindowGroupLimit already inserts a partial
   group-limit before the shuffle (documented in operators/skew.py).

Run standalone (never concurrently with bench): python scripts/skew_demo.py
Numbers land in SCALE.md's "Skew" section.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SKEW_DEMO_DOCS", "20000000"))
OUT = "/tmp/dggs_skew_demo_out"


def timed(tag, fn, reps=int(os.environ.get("SKEW_DEMO_REPS", "2"))):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"  {tag}: {dt:.2f}s", flush=True)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from dggstools_spark.operators.skew import (salted_repartition,
                                                salted_topk_per_key,
                                                topk_per_key)
    from dggstools_spark.session import get_spark

    spark = get_spark("skew-demo")
    spark.sparkContext.setLogLevel("ERROR")

    df = (spark.range(N_DOCS, numPartitions=128)
          .select(F.col("id").alias("doc_id"),
                  F.when(F.pmod("id", F.lit(20)) < 19, F.lit(7777))
                  .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(1000)))
                  .alias("tile"),
                  F.pmod(F.col("id") * 40503, F.lit(1 << 20)).alias("score")))
    df = df.localCheckpoint(eager=True)  # measure the operator, not the synth

    # --- A. skewed partitionBy write -------------------------------------
    def write_naive():
        shutil.rmtree(OUT, ignore_errors=True)
        df.repartition(F.col("tile")).write.partitionBy("tile").parquet(OUT)

    def write_salted():
        shutil.rmtree(OUT, ignore_errors=True)
        salted_repartition(df, ["tile"], n_salt=32, salt_src="doc_id") \
            .write.partitionBy("tile").parquet(OUT)

    print("A. write", flush=True)
    write_salted()  # warm-up
    a_naive = timed("naive repartition(tile)", write_naive)
    a_salted = timed("salted_repartition n=32", write_salted)

    # --- B. skewed sort-merge join: AQE skew split on/off ----------------
    stats = df.groupBy("tile").agg(F.count("*").alias("n_tile")) \
        .localCheckpoint(eager=True)

    def join_job():
        j = df.join(stats.hint("merge"), "tile") \
            .select(F.sum(F.col("score") + F.col("n_tile")).alias("s"))
        j.write.format("noop").mode("overwrite").save()

    print("B. join", flush=True)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    b_off = timed("SMJ, AQE skewJoin OFF", join_job)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    b_on = timed("SMJ, AQE skewJoin ON", join_job)

    # --- C. rank top-k: WindowGroupLimit already handles it --------------
    order = [F.col("score").desc(), F.col("doc_id")]

    print("C. rank", flush=True)
    c_naive = timed("naive window top-100",
                    lambda: topk_per_key(df, ["tile"], order, 100)
                    .write.format("noop").mode("overwrite").save())
    c_salted = timed("salted top-100",
                     lambda: salted_topk_per_key(df, ["tile"], order, 100,
                                                 salt_src="doc_id")
                     .write.format("noop").mode("overwrite").save())

    print(f"RESULT docs={N_DOCS}"
          f" write_naive={a_naive:.2f}s write_salted={a_salted:.2f}s"
          f" join_aqe_off={b_off:.2f}s join_aqe_on={b_on:.2f}s"
          f" rank_naive={c_naive:.2f}s rank_salted={c_salted:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
