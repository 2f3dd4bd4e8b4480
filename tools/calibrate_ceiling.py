"""Measure this machine's pure-compute scaling ceiling under the SAME
core-pinning methodology as tools/bench_scaling.py.

Runs a pure-JVM, shuffle-free, embarrassingly-parallel Spark job (sha2
chain over range()) pinned with taskset to N and 4N cores, in separate
JVMs, and reports speedup / ceiling = speedup / (4N/N). Any efficiency
the ER job loses BELOW this ceiling is attributable to the code; the
gap between the ceiling and 1.0 is the host's (shared/throttled VM).

Usage: python tools/calibrate_ceiling.py [lo] [hi] [rows_m]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(cores: int, rows_m: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from pseudopeople_spark.session import get_spark

    spark = get_spark(f"calib_{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    n = rows_m * 1_000_000
    df = spark.range(n, numPartitions=cores * 8)
    col = F.sha2(F.col("id").cast("string"), 256)
    for _ in range(4):  # chain to make it compute-heavy per row
        col = F.sha2(col, 256)
    expr = F.sum(F.crc32(col))
    df.agg(expr).collect()  # warm codegen/JIT
    t0 = time.time()
    df.agg(expr).collect()
    print(json.dumps({"cores": cores, "wall": round(time.time() - t0, 2)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rows_m = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    def leg(cores: int) -> float:
        out = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable, __file__,
             "--worker", str(cores), str(rows_m)],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)["wall"]

    # alternate legs, take min per level (same pollution logic as the
    # scaling bench: min over repeats of identical work estimates the
    # uncontended wall)
    walls = {lo: [], hi: []}
    for _ in range(3):
        for c in (lo, hi):
            walls[c].append(leg(c))
            sys.stderr.write(f"[calib] cores={c} walls={walls[c]}\n")
    t_lo, t_hi = min(walls[lo]), min(walls[hi])
    speedup = t_lo / t_hi
    ceiling = speedup / (hi / lo)
    result = {
        "lo": lo, "hi": hi, "t_lo": t_lo, "t_hi": t_hi,
        "speedup": round(speedup, 3), "ceiling": round(ceiling, 3),
        "walls": {str(k): v for k, v in walls.items()},
        "pinned": True,
    }
    print(json.dumps(result))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "CEILING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
