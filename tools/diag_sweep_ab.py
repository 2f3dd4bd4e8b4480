"""A/B of the oversized-block sweep ordering (round-6, verdict #1):
blocking recall of the ACTUAL candidate set (caps applied) with the
record-id-ordered sweep (round-5 shape, `_sweep` dropped) vs the
dob-ordered sweep, on the SAME cached scaling input — so the delta is
the ordering change alone, not noise-draw differences.

Usage: python tools/diag_sweep_ab.py [n_simulants]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from pseudopeople_spark.linkage import blocking, pairs as pairgen  # noqa: E402
from pseudopeople_spark.linkage.pipeline import ResolveConfig  # noqa: E402
from pseudopeople_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    base = os.environ.get("SCALING_INPUT_DIR", "/tmp/pp_scaling_input")
    spark = get_spark("diag_sweep_ab", master="local[16]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    records = spark.read.parquet(os.path.join(base, f"records_{n}")).localCheckpoint()
    truth = spark.read.parquet(os.path.join(base, f"truth_{n}"))

    lab = truth.select("record_id", F.col("simulant_id").alias("label"))
    true_pairs = (
        lab.select(F.col("record_id").alias("id_l"), F.col("label").alias("l"))
        .join(lab.select(F.col("record_id").alias("id_r"), F.col("label").alias("r")),
              F.col("l") == F.col("r"))
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .localCheckpoint()
    )
    total = true_pairs.count()
    print(f"true pairs: {total}", flush=True)

    cfg = ResolveConfig()
    blocks = blocking.all_block_keys(records).localCheckpoint()
    snb = blocking.sorted_neighborhood_pairs(
        records, ["last_name", "first_name", "dob"], window_size=cfg.snb_window
    ).select("id_l", "id_r")

    for label, blk in (("record-id sweep (r5)", blocks.drop("_sweep")),
                       ("dob-ordered sweep (r6)", blocks)):
        t0 = time.time()
        cand = pairgen.pairs_from_blocks(blk, max_block_size=cfg.max_block_size, dedup=False)
        cand = cand.unionByName(snb).dropDuplicates(["id_l", "id_r"]).localCheckpoint()
        n_cand = cand.count()
        found = true_pairs.join(cand, ["id_l", "id_r"], "left_semi").count()
        print(
            f"{label}: recall={found / total:.5f} ({found}/{total}) "
            f"candidates={n_cand} wall={time.time() - t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
