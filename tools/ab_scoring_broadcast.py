"""Back-to-back A/B of the scoring join strategy (broadcast records vs
sort-merge) on the cached scaling input — immune to day-scale host-speed
drift that poisons cross-day comparisons.

Builds the candidate-pair set once (checkpointed), optionally samples it
down, then alternates B/A/B/A timing ONLY the scoring stage (join +
similarity UDFs + tiered match), materialized via an aggregate that
forces every similarity column.

Usage: python tools/ab_scoring_broadcast.py [cores] [n_simulants] [pair_frac]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25

    from pyspark.sql import functions as F

    from pseudopeople_spark import linkage
    from pseudopeople_spark.checkpoint import _capped_local_checkpoint
    from pseudopeople_spark.linkage import blocking, pairs as pairgen, scoring
    from pseudopeople_spark.linkage.pipeline import CANONICAL_FIELDS, ResolveConfig, candidate_blocks
    from pseudopeople_spark.session import get_spark

    spark = get_spark(f"ab_{cores}", master=f"local[{cores}]", shuffle_partitions=4 * cores)
    input_dir = os.environ.get("SCALING_INPUT_DIR", "/tmp/pp_scaling_input")
    records = spark.read.parquet(os.path.join(input_dir, f"records_{n}")).localCheckpoint()
    print("records:", records.count(), file=sys.stderr)

    cfg = ResolveConfig()
    blocks = _capped_local_checkpoint(candidate_blocks(records, cfg))
    p = pairgen.pairs_from_blocks(blocks, max_block_size=cfg.max_block_size, dedup=False)
    snb = blocking.sorted_neighborhood_pairs(
        records, ["last_name", "first_name", "dob"], window_size=cfg.snb_window
    ).select("id_l", "id_r")
    cand = p.unionByName(snb).repartition("id_l").dropDuplicates(["id_l", "id_r"])
    if frac < 1.0:
        # deterministic hash-sample of pairs
        cand = cand.where((F.xxhash64("id_l", "id_r") % 100) < int(frac * 100))
    cand = _capped_local_checkpoint(cand)
    n_pairs = cand.count()
    print("pairs:", n_pairs, file=sys.stderr)

    def run(bcast: bool) -> float:
        wf = scoring.attach_pair_fields(cand, records, CANONICAL_FIELDS, broadcast_records=bcast)
        out = scoring.score_pairs(wf)
        out = scoring.tiered_match(out, cfg.threshold, same_dataset_distinct=cfg.unique_within_dataset)
        t0 = time.time()
        out.agg(
            F.sum("score"),
            F.sum(F.col("is_match").cast("int")),
            F.sum("sim_first_name"),
        ).collect()
        return round(time.time() - t0, 2)

    walls = {"broadcast": [], "sortmerge": []}
    for rep in range(2):
        for name, b in (("broadcast", True), ("sortmerge", False)):
            w = run(b)
            walls[name].append(w)
            print(f"rep{rep} {name}: {w}s  load={open('/proc/loadavg').read().split()[0]}",
                  file=sys.stderr)
    print(json.dumps({
        "cores": cores, "n_pairs": n_pairs,
        "broadcast_walls": walls["broadcast"], "sortmerge_walls": walls["sortmerge"],
        "broadcast_min": min(walls["broadcast"]), "sortmerge_min": min(walls["sortmerge"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
