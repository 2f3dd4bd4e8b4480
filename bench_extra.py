"""Extra measurement harness for the optimization rounds (bench.py is
FROZEN for the driver's measurement; this file holds the guide §1
instrumentation: per-query count() timing exactly as bench.py does it,
noop-sink isolation, explain("formatted") capture, and scan partition
counts).

Usage:
  python bench_extra.py [--sf DIR] [--queries a,b,c] [--plans OUTDIR]
                        [--noop] [--repeat N]

Prints one line per query:  name  count_sec  [noop_sec]  rows
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from pseudopeople_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--plans", default=None, help="dir to write <query>.txt explain output")
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink write (all columns)")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    spark = get_spark("bench_extra", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    names = args.queries.split(",") if args.queries else list(qs)
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        walls, rows = [], -1
        for _ in range(args.repeat):
            t0 = time.time()
            df = fn(spark, args.sf)
            rows = df.count()
            walls.append(time.time() - t0)
        line = f"{name:28s} count={min(walls):7.3f}s"
        if args.repeat > 1:
            line += f" (all: {', '.join(f'{w:.3f}' for w in walls)})"
        if args.noop:
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            line += f" noop={time.time() - t0:7.3f}s"
        line += f" rows={rows}"
        print(line, flush=True)
        if args.plans:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            cnt_plan = df.groupBy().count()._jdf.queryExecution().executedPlan().toString()
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write("=== explain(formatted) ===\n")
                f.write(plan)
                f.write("\n=== count() executedPlan (what bench.py times) ===\n")
                f.write(cnt_plan)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
