"""Dedup-pipeline capstone semantics (round 5, batch 20)."""

import os

from dggstools_spark.queries19 import q_dedup_pipeline


def test_dedup_pipeline_stage_accounting(spark, tmp_path):
    # 0/1: exact duplicates (keep 0).  2/3: near-dups (same long text, one
    # token differs) — cluster keeps the higher-quality (longer) member 3.
    # 4: unique.  5: exact-dup of 2 (dropped at stage 1, so the near-dup
    # stage sees only 2 and 3).
    base = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (0, "same exact text"),
        (1, "same exact text"),
        (2, base + " ending1"),
        (3, base + " ending2 extra extra extra extra extra"),
        (4, "completely different words here"),
        (5, base + " ending1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    r = q_dedup_pipeline(spark, str(tmp_path)).collect()[0]
    assert r.n_docs == 6
    assert r.n_exact_dropped == 2          # ids 1 and 5
    assert r.n_clusters == 1               # {2, 3}
    assert r.n_near_dropped == 1           # id 2 (3 is longer => higher q20)
    assert r.n_kept == 3                   # {0, 3, 4}
    # commutative set hash: sum of per-id 56-bit md5-prefix ints (order-
    # insensitive — the numpy replica sums in a different order on purpose)
    import hashlib
    exp = sum(int(hashlib.md5(str(i).encode()).hexdigest()[:14], 16)
              for i in (4, 0, 3))
    assert r.kept_hash == str(exp)
