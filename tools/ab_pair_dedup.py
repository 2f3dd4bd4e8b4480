"""A/B the pair-dedup strategies at pinned cores over the cached
scaling input. The profiler shows dedup (repartition(id_l) +
dropDuplicates) costs 200s at 8 cores while pair GENERATION costs 45s
— attribute and fix.

Variants:
  a. current: repartition("id_l").dropDuplicates([id_l, id_r])
  b. plain dropDuplicates (map-side partial agg, exchange on both keys)
  c. long-surrogate ids: hash ids to int64 up front, dedup ints,
     (collision-checked), exchange volume ~16B/row instead of ~2
     strings/row

Usage: taskset -c 8-15 python tools/ab_pair_dedup.py 8 300000 [a,b,c]
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
    variants = (sys.argv[3].split(",") if len(sys.argv) > 3 else ["a", "b", "c"])

    from pyspark.sql import functions as F

    from pseudopeople_spark.linkage import blocking, pairs as pairgen
    from pseudopeople_spark.linkage.pipeline import ResolveConfig, candidate_blocks
    from pseudopeople_spark.session import get_spark

    spark = get_spark(f"ab_dedup_{cores}", master=f"local[{cores}]", shuffle_partitions=4 * cores)
    input_dir = os.environ.get("SCALING_INPUT_DIR", "/tmp/pp_scaling_input")
    records = spark.read.parquet(os.path.join(input_dir, f"records_{n}")).localCheckpoint()
    rcfg = ResolveConfig()
    from pseudopeople_spark.checkpoint import _capped_local_checkpoint

    blocks = _capped_local_checkpoint(candidate_blocks(records, rcfg))
    blocks.count()

    def union_pairs(b, recs):
        p = pairgen.pairs_from_blocks(b, max_block_size=rcfg.max_block_size, dedup=False)
        snb = blocking.sorted_neighborhood_pairs(
            recs, ["last_name", "first_name", "dob"], window_size=rcfg.snb_window
        ).select("id_l", "id_r")
        return p.unionByName(snb)

    t: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        return out

    t["pre_dedup_rows"] = timed("pre_dedup_count_wall", lambda: union_pairs(blocks, records).count())

    if "a" in variants:
        timed("a_repart_idl_dropdup", lambda: union_pairs(blocks, records)
              .repartition("id_l").dropDuplicates(["id_l", "id_r"]).count())
    if "b" in variants:
        timed("b_plain_dropdup", lambda: union_pairs(blocks, records)
              .dropDuplicates(["id_l", "id_r"]).count())
    if "c" in variants:
        def run_c():
            rid_map = records.select("record_id", F.xxhash64("record_id").alias("rid"))
            b2 = blocks.join(F.broadcast(rid_map), blocks.record_id == rid_map.record_id) \
                       .select("block_key", F.col("rid").alias("record_id"))
            r2 = records.withColumn("record_id", F.xxhash64("record_id"))
            return union_pairs(b2, r2).repartition("id_l").dropDuplicates(["id_l", "id_r"]).count()
        timed("c_long_ids_repart_dropdup", run_c)

    print(json.dumps({"cores": cores, "parts": t}))
    spark.stop()


if __name__ == "__main__":
    main()
