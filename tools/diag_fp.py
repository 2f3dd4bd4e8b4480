"""False-positive diagnosis at scale — WHERE does precision go at
300k simulants?

Pairwise F1 on candidate pairs (metrics.pairwise_f1_on_candidates) is
0.981 at 300k vs 0.992 at 20k, and precision (0.970) is the limiter.
Two mechanisms can produce an FP candidate pair (labels differ,
clusters agree):

  direct      the pair itself passed the tiered-match cascade — a
              scoring/decision error; attributable to one tier.
  transitive  the pair was never matched, but a chain of other edges
              put the two records in one cluster — amplification: one
              bad edge between clusters of sizes k and m manufactures
              up to k*m FP pairs.

This tool runs resolve() on the bench_scaling input (reusing its
materialized parquet when present), splits the FP set into those two
classes, re-scores the direct-FP pairs with full sims + per-tier
flags, and prints the tier histogram plus a sample of offending rows.

Usage: python tools/diag_fp.py [n_simulants=300000] [master=local[32]]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    master = sys.argv[2] if len(sys.argv) > 2 else "local[32]"

    from tools.bench_scaling import _input_path, _truth_path, prepare
    from pseudopeople_spark.session import get_spark
    from pseudopeople_spark.linkage import pipeline, scoring

    if not os.path.exists(os.path.join(_input_path(n), "_SUCCESS")):
        prepare(n)

    spark = get_spark("diag_fp", master=master, shuffle_partitions=64)
    records = spark.read.parquet(_input_path(n)).localCheckpoint()
    truth = spark.read.parquet(_truth_path(n))

    t0 = time.time()
    out = pipeline.resolve(spark, records, truth=truth)
    print(f"resolve wall {time.time() - t0:.1f}s  metrics={out['metrics']}")

    cand = out["pairs"]                      # rid space
    truth_rid = out["truth_rid"]
    asg = out["assignments"]                 # original id space
    asg_rid = (
        asg.withColumnRenamed("record_id", "orig_id")
        .join(out["id_mapping"].withColumnRenamed("record_id", "orig_id"), "orig_id")
        .select(F.col("rid").alias("record_id"), "cluster_id")
    )
    lab = truth_rid.select(F.col("record_id"), F.col("simulant_id").alias("label"))
    both = lab.join(asg_rid, "record_id")
    l = both.select(F.col("record_id").alias("id_l"), F.col("label").alias("label_l"), F.col("cluster_id").alias("cl_l"))
    r = both.select(F.col("record_id").alias("id_r"), F.col("label").alias("label_r"), F.col("cluster_id").alias("cl_r"))
    fp = (
        cand.join(l, "id_l").join(r, "id_r")
        .where((F.col("label_l") != F.col("label_r")) & (F.col("cl_l") == F.col("cl_r")))
        .select("id_l", "id_r", "label_l", "label_r", "cl_l")
        .localCheckpoint()
    )
    n_fp = fp.count()

    # direct vs transitive: out['scored'] is match-rows-only, rid space
    matched = out["scored"].select("id_l", "id_r")
    direct = fp.join(matched, ["id_l", "id_r"], "left_semi").localCheckpoint()
    n_direct = direct.count()
    print(f"FP pairs: {n_fp}  direct-edge FPs: {n_direct}  transitive: {n_fp - n_direct}")

    # amplification: FP pairs per merged cluster
    per_cluster = fp.groupBy("cl_l").count().orderBy(F.desc("count"))
    print("top merged clusters by FP-pair count:")
    for row in per_cluster.limit(10).collect():
        print("   ", row.asDict())
    stats = per_cluster.agg(
        F.count("*").alias("clusters_with_fp"),
        F.expr("percentile_approx(count, 0.5)").alias("p50"),
        F.max("count").alias("max"),
    ).first()
    print("FP cluster stats:", stats.asDict())

    # re-score the direct FPs with full sims and attribute tiers
    attach = [c for c in pipeline.CANONICAL_FIELDS if c != "state"] + ["base_rid"]
    pairs_fp = direct.select("id_l", "id_r")
    scored_fp = scoring.score_pairs(scoring.attach_pair_fields(pairs_fp, out["records"], attach))
    flags = scoring.tier_flags(scored_fp)
    hist = (
        flags.select(*[F.sum(F.col(c).cast("long")).alias(c) for c in flags.columns if c.startswith("tier")])
        .first()
    )
    print("direct-FP tier histogram:", hist.asDict())

    # sample rows per tier for eyeballing
    for tier in [c for c in flags.columns if c.startswith("tier")]:
        sample = flags.where(F.col(tier)).select(
            "id_l", "id_r", "l_dataset", "r_dataset",
            "l_first_name", "r_first_name", "l_last_name", "r_last_name",
            "l_dob", "r_dob", "l_ssn_digits", "r_ssn_digits",
            "sim_first_name", "sim_last_name", "sim_dob", "sim_middle", "sim_sex",
            "sim_zipcode", "score",
        ).limit(4).collect()
        if sample:
            print(f"--- sample direct FPs admitted by {tier}:")
            for row in sample:
                print("   ", {k: v for k, v in row.asDict().items()})

    spark.stop()


if __name__ == "__main__":
    main()
