"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8 between
N and 4N executors; sandbox proxy: local[8] vs local[32] on identical input).

Runs `python bench.py --flagship-only` in fresh JVMs at both parallelism
levels and writes the throughput + efficiency table to BENCH.md.

Usage: python scripts/scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_docs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_DOCS"] = str(n_docs)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--flagship-only"],
        capture_output=True, text=True, env=env, timeout=1800, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    r8 = run(8, n_docs)
    r32 = run(32, n_docs)
    t8, t32 = r8["flagship_sec"], r32["flagship_sec"]
    eff = (t8 / t32) / 4.0
    report = f"""# BENCH — flagship scaling evidence

Flagship spatial-join + tile-assignment job (bench.py `flagship`):
parquet scan of the interleaved doc table -> Arrow pandas-UDF rHEALPix
encode (res 8) -> tile prefix (res 4) -> two-level per-tile aggregation.
Identical input ({n_docs:,} docs, /tmp/dggs_bench_docs.parquet), fresh JVM
per measurement, steady-state (best of two runs per JVM).

| parallelism | wall sec | docs/sec |
|---|---|---|
| local[8]  (N)  | {t8:.3f} | {r8['value']:,.0f} |
| local[32] (4N) | {t32:.3f} | {r32['value']:,.0f} |

**Scaling efficiency (N -> 4N) = (T_N / T_4N) / 4 = ({t8:.3f} / {t32:.3f}) / 4 =
{eff:.3f}** (target >= 0.8 per BASELINE.json north rule; this is the sandbox
proxy for the two-cluster-size criterion — no real cluster available).

Cold (first-run) flagship seconds, for reference: local[8] {r8['flagship_cold_sec']},
local[32] {r32['flagship_cold_sec']}.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
