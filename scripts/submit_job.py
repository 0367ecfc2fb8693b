"""spark-submit entry point (north rule: deployed via spark-submit
--py-files on a multi-executor cluster).

ALWAYS build the dependency zip at deploy time (dist/ is gitignored so a
stale checked-in zip can never diverge from the package source):

    python scripts/make_pyfiles_zip.py            # -> dist/dggstools_spark.zip
    spark-submit --py-files dist/dggstools_spark.zip \\
        scripts/submit_job.py --input <docs_parquet> --output <cells_root> \\
        --res 8 --tile-res 4

The job: read interleaved docs -> Arrow pandas-UDF cell encode -> tile
assignment -> checkpointed, lineage-tracked write partitioned by tile batch
(resumable: re-submitting after a failure skips completed batches)."""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--res", type=int, default=8)
    ap.add_argument("--tile-res", type=int, default=4)
    ap.add_argument("--batch-prefix-len", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    # on a cluster spark-submit supplies master/executors; locally fall back
    spark = SparkSession.builder.appName("dggs-tile-assignment").getOrCreate()

    from dggstools_spark.functions.encode import cellid_from_lonlat_udf
    from dggstools_spark.plans import lineage
    from dggstools_spark.sources import synth

    docs = spark.read.parquet(args.input)
    if "lon" not in docs.columns or "lat" not in docs.columns:
        # testdata documents carry no coordinates; derive the deterministic
        # skewed lon/lat from the key (same rule as every driver query)
        docs = synth.with_lonlat(docs, "doc_id")
    enc = cellid_from_lonlat_udf(args.res)
    assigned = (
        docs.withColumn("cellid", enc("lon", "lat"))
        .withColumn("tile", F.substring("cellid", 1, args.tile_res + 1))
        .withColumn("batch", F.substring("cellid", 1, args.batch_prefix_len))
    )
    results = lineage.run_batches(assigned, args.output, "batch", ["doc_id", "cellid"])
    done = sum(1 for v in results.values() if v)
    skipped = len(results) - done
    print(f"batches written: {done}, skipped (already complete): {skipped}")


if __name__ == "__main__":
    main()
