"""Per-query noop-sink timing harness (guide §1.4) — r7 optimization
evidence.  NOT the driver bench: bench.py is frozen for measurement; this
file exists so before/after numbers for individual queries can be
measured without editing it.

Usage: python bench_extra.py <query> [query ...]   (env as bench.py)

Prints one line per query: name, per-run seconds, min.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    names = sys.argv[1:]

    from bench import read_steal_jiffies, wait_for_quiet

    from dggstools_spark.session import get_spark
    from dggstools_spark.queries import QUERIES

    spark = get_spark("bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py: one Arrow UDF round trip
    from dggstools_spark.functions.encode import cellid_from_lonlat_udf
    from dggstools_spark.sources.synth import interleaved_docs
    warm = interleaved_docs(spark, 10000)
    warm.withColumn("c", cellid_from_lonlat_udf(4)("lon", "lat")).count()

    host_cpus = os.cpu_count() or 32
    out = {}
    wait_for_quiet()
    for name in names:
        runs, steals = [], []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            s0, t0 = read_steal_jiffies(), time.time()
            QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = time.time() - t0
            runs.append(round(dt, 3))
            steals.append(round(
                (read_steal_jiffies() - s0) / (dt * host_cpus * 100) * 100,
                1))
        out[name] = {"runs": runs, "min": min(runs), "steal_pct": steals}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
