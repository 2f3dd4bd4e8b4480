"""Scaling-efficiency evidence for the north rule: the same ER job at
two parallelism levels (local[8] = N, local[32] = 4N) on the SAME
deterministic input, reporting candidate-pairs-scored/sec at both and
the scaling efficiency

    eff = throughput(4N) / (4 * throughput(N)) = T_8 / (4 * T_32).

The timed region is resolve() proper (blocking -> pairs -> scoring ->
clustering); the noised input is materialized before the clock starts,
so the measurement isolates the pipeline whose shuffles/UDFs must
scale. Each parallelism level runs in its own subprocess (one JVM per
SparkContext).

Usage: python tools/bench_scaling.py [n_simulants] -> writes
BENCH/SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(cores: int, n: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F  # noqa: F401

    from pseudopeople_spark import config, datasets as D, noise, synth
    from pseudopeople_spark.linkage.pipeline import ResolveConfig, normalize_records, resolve
    from pseudopeople_spark.session import get_spark

    spark = get_spark(f"scaling_{cores}", master=f"local[{cores}]")
    pop = synth.simulants(spark, n, seed=42)
    cfg = config.get_config()
    census = noise.noise_dataset(synth.census_records(pop, 2020), D.DECENNIAL_CENSUS, cfg, seed=7)
    w2 = noise.noise_dataset(synth.w2_records(pop, 2020), D.TAXES_W2_AND_1099, cfg, seed=8)
    ssa = noise.noise_dataset(synth.ssa_records(pop), D.SOCIAL_SECURITY, cfg, seed=9)
    nc = normalize_records(census, "census", "MM/dd/yyyy", ref_year=2020)
    nw = normalize_records(
        w2, "w2", "MM/dd/yyyy",
        column_map={"zipcode": "mailing_address_zipcode", "city": "mailing_address_city",
                    "state": "mailing_address_state"},
        ref_year=2020,
    )
    ns = normalize_records(ssa, "ssa", "yyyyMMdd", dob_fallback="event_date")
    records = nc.unionByName(nw).unionByName(ns).localCheckpoint()  # noising paid OUTSIDE the clock
    n_records = records.count()

    t0 = time.time()
    res = resolve(spark, records, ResolveConfig())
    n_pairs = res["pairs"].count()
    n_clusters = res["assignments"].select("cluster_id").distinct().count()
    wall = time.time() - t0
    print(json.dumps({
        "cores": cores,
        "n_simulants": n,
        "n_records": n_records,
        "n_pairs": n_pairs,
        "n_clusters": n_clusters,
        "resolve_sec": round(wall, 2),
        "pairs_per_sec": round(n_pairs / wall, 1),
        "stage_seconds": res["stage_seconds"],
    }))
    spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cores), str(n)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    t8, t32 = results[8]["resolve_sec"], results[32]["resolve_sec"]
    eff = t8 / (4.0 * t32)
    summary = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "n_simulants": n,
        "runs": results,
    }
    print(json.dumps(summary))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALING.md"), "w") as f:
        f.write(
            "# Scaling evidence — same ER job at N and 4N parallelism\n\n"
            "The north rule's two-cluster-size criterion cannot use a real cluster in this\n"
            "sandbox; per the driver's instruction it is evidenced by running the SAME job\n"
            "(identical deterministic input, seed 42) at `local[8]` and `local[32]` and\n"
            "comparing candidate-pairs-scored/sec. The timed region is `resolve()` proper\n"
            "(blocking → pair gen → scoring → clustering); the noised input is materialized\n"
            "before the clock starts.\n\n"
            f"Input: {n:,} simulants → {results[8]['n_records']:,} records; "
            f"{results[8]['n_pairs']:,} candidate pairs; {results[8]['n_clusters']:,} clusters.\n\n"
            "| parallelism | resolve wall (s) | pairs/sec |\n|---|---|---|\n"
            f"| local[8] (N) | {t8} | {results[8]['pairs_per_sec']:,} |\n"
            f"| local[32] (4N) | {t32} | {results[32]['pairs_per_sec']:,} |\n\n"
            f"**Scaling efficiency (N→4N): {eff:.3f}** (target ≥ 0.8)\n\n"
            f"Per-stage seconds at local[8]: `{results[8]['stage_seconds']}`\n\n"
            f"Per-stage seconds at local[32]: `{results[32]['stage_seconds']}`\n\n"
            "Outputs are identical at both levels (CRN randomness is keyed by record ids,\n"
            "never partition ids — see tests/test_e2e.py partition-invariance tests).\n"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
