"""A/B the scoring stage's JVM-side UDF short-circuit (_py_gated).

Round-3 scaling legs showed scoring at local[8] regress 443s -> 1322s
after the gate landed (063a66e) while the JVM-only stages (pairs) were
within noise of round 2 — this tool isolates score_pairs on an
identical materialized pair-fields frame and times both plan shapes
(PP_SCORING_JVM_GATE=1 vs =0) under the same taskset pinning the
scaling bench uses, alternating variants to control for host drift.

Usage:
  python tools/ab_scoring_gate.py --build [n] [mod]   # materialize wide frame once
  python tools/ab_scoring_gate.py --leg <gate:0|1> <cores>
  python tools/ab_scoring_gate.py [cores] [reps]      # orchestrate A/B
Prints one JSON line per leg and a summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
INPUT_DIR = os.environ.get("SCALING_INPUT_DIR", "/tmp/pp_scaling_input")
WIDE = "/tmp/pp_ab_wide"


def build(n: int, mod: int) -> None:
    from pyspark.sql import functions as F

    from pseudopeople_spark.linkage import blocking, pairs as pairgen, scoring
    from pseudopeople_spark.linkage.pipeline import CANONICAL_FIELDS, ResolveConfig, candidate_blocks
    from pseudopeople_spark.session import get_spark

    cfg = ResolveConfig()
    spark = get_spark("ab_build", master="local[16]", shuffle_partitions=64)
    records = spark.read.parquet(os.path.join(INPUT_DIR, f"records_{n}")).localCheckpoint()
    blocks = candidate_blocks(records, cfg)
    p = pairgen.pairs_from_blocks(blocks, max_block_size=cfg.max_block_size, dedup=False)
    snb = blocking.sorted_neighborhood_pairs(
        records, ["last_name", "first_name", "dob"], window_size=cfg.snb_window
    ).select("id_l", "id_r")
    p = p.unionByName(snb).repartition(64, "id_l").dropDuplicates(["id_l", "id_r"])
    # deterministic ~1/mod subsample so an A/B leg is minutes, not 20+
    p = p.where(F.pmod(F.xxhash64("id_l", "id_r"), F.lit(mod)) == 0)
    wide = scoring.attach_pair_fields(p, records, CANONICAL_FIELDS)
    wide.write.mode("overwrite").parquet(WIDE)
    n_pairs = spark.read.parquet(WIDE).count()
    print(json.dumps({"built": WIDE, "pairs": n_pairs}))


def leg(gate: str, cores: int) -> None:
    os.environ["PP_SCORING_JVM_GATE"] = gate
    # score_pairs defaults to the mapInArrow plan, which never touches
    # _py_gated — force the UDF plan so the gate toggle actually selects
    # between the two plan shapes this tool exists to compare.
    os.environ["PP_SCORING_IMPL"] = "udf"
    from pseudopeople_spark.linkage import scoring
    from pseudopeople_spark.session import get_spark

    spark = get_spark(
        f"ab_gate{gate}", master=f"local[{cores}]", shuffle_partitions=4 * cores
    )
    wide = spark.read.parquet(WIDE)
    n_pairs = wide.count()  # warm the scan cache / JIT the reader first
    t0 = time.time()
    scored = scoring.score_pairs(wide).select("id_l", "id_r", "score")
    scored.write.mode("overwrite").format("noop").save()
    wall = round(time.time() - t0, 2)
    print(json.dumps({"gate": gate, "cores": cores, "pairs": n_pairs,
                      "scoring_sec": wall,
                      "pairs_per_sec": round(n_pairs / wall, 1)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--build":
        build(int(sys.argv[2]) if len(sys.argv) > 2 else 300_000,
              int(sys.argv[3]) if len(sys.argv) > 3 else 5)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        leg(sys.argv[2], int(sys.argv[3]))
        return
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    results: "dict[str, list[float]]" = {"0": [], "1": []}
    for _ in range(reps):
        for gate in ("1", "0"):
            out = subprocess.run(
                ["taskset", "-c", f"0-{cores - 1}", sys.executable, __file__,
                 "--leg", gate, str(cores)],
                capture_output=True, text=True, cwd=REPO,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                sys.stderr.write(out.stdout[-1500:] + "\n" + out.stderr[-3000:])
                raise RuntimeError(f"leg gate={gate} failed")
            run = json.loads(lines[-1])
            sys.stderr.write(f"[ab] {run}\n")
            results[gate].append(run["scoring_sec"])
    summary = {
        "cores": cores,
        "gated_min_sec": min(results["1"]),
        "plain_min_sec": min(results["0"]),
        "gated_all": results["1"],
        "plain_all": results["0"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
