"""Round-6 measurement probe for the census-noising plan (guide §1):
waits for a quiet host, then times cold + N warm materializations of
the exact plan bench.py::bench_noising times, with optional breakdown
variants (JVM-only chain, un-noised checksum). Loadavg printed with
every wall so polluted samples are visible.

Usage: python tools/noise_probe.py [n_rows] [warm_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pseudopeople_spark.session import get_spark  # noqa: E402


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_quiet(quiet: float = 2.5, timeout_s: int = 600) -> None:
    t0 = time.time()
    while loadavg() >= quiet and time.time() - t0 < timeout_s:
        time.sleep(10)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    warm_n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from pseudopeople_spark import config, datasets as D, noise, synth

    spark = get_spark("noise_probe", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("FATAL")
    pop = synth.simulants(spark, n_rows, seed=1)
    census = synth.census_records(pop, 2020).localCheckpoint()
    cfg = config.get_config()
    noised = noise.noise_dataset(census, D.DECENNIAL_CENSUS, cfg, seed=2)

    import pseudopeople_spark.noise as N

    orig = N.apply_token_noise_all_columns
    N.apply_token_noise_all_columns = lambda df, plans, key_col, seed=0, u01=None: df
    jvm_only = noise.noise_dataset(census, D.DECENNIAL_CENSUS, cfg, seed=2)
    N.apply_token_noise_all_columns = orig

    def mat(df):
        return df.agg(F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))).collect()

    wait_quiet()
    spark.sparkContext.setJobDescription("noise_probe: cold")
    t0 = time.time()
    mat(noised)
    print(f"cold {time.time() - t0:7.2f}  load={loadavg():.1f}", flush=True)
    walls = []
    for i in range(warm_n):
        wait_quiet()
        spark.sparkContext.setJobDescription(f"noise_probe: warm {i}")
        t0 = time.time()
        mat(noised)
        w = time.time() - t0
        walls.append(w)
        print(f"warm {w:7.2f}  load={loadavg():.1f}", flush=True)
    print(f"warm_min {min(walls):.2f}", flush=True)

    mat(jvm_only)
    walls = []
    for i in range(max(3, warm_n - 2)):
        wait_quiet()
        spark.sparkContext.setJobDescription(f"noise_probe: jvm_only {i}")
        t0 = time.time()
        mat(jvm_only)
        w = time.time() - t0
        walls.append(w)
        print(f"jvm_only {w:7.2f}  load={loadavg():.1f}", flush=True)
    print(f"jvm_only_min {min(walls):.2f}", flush=True)


if __name__ == "__main__":
    main()
