"""Dump .explain("formatted") for a list of queries to files.

Usage: python scripts/plan_dump.py <outdir> <suffix> <query> [query ...]

Writes <outdir>/<query>_<suffix>.txt for each query.  Used by the r7
optimization round to capture before/after plans (the judge checks plan
claims against these files); run it from a HEAD worktree for "before".
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from dggstools_spark.session import get_spark
    from dggstools_spark.queries import QUERIES

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    for name in names:
        try:
            df = QUERIES[name](spark, sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # keep going; record the failure
            text = f"PLAN CAPTURE FAILED: {e}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} chars -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
