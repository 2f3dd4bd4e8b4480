"""Cluster entry point for spark-submit (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

    spark-submit --master <cluster> \
        --py-files pseudopeople_spark.zip \
        jobs/resolve_job.py \
        --input  <dir-or-iceberg-table of span docs per dataset> \
        --output <dir for cluster assignments + stage checkpoints> \
        --seed 42

In this sandbox the same script runs under local[*]; on a cluster the
master/executors come from spark-submit and nothing in the pipeline
changes (no partition-id-dependent logic anywhere — see crn.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="dir with <dataset>.parquet span-doc tables; default: synthesize")
    ap.add_argument("--output", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--simulants", type=int, default=10_000, help="population size when synthesizing")
    ap.add_argument("--threshold", type=float, default=0.92)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pseudopeople_spark import config, datasets as D, noise, synth
    from pseudopeople_spark.linkage.pipeline import ResolveConfig, normalize_records, resolve
    from pseudopeople_spark.spans import decode_records, encode_records

    spark = SparkSession.builder.appName("pseudopeople_spark_resolve").getOrCreate()

    if args.input:
        # read pre-encoded interleaved span documents per dataset
        def load(name, fields):
            docs = spark.read.parquet(f"{args.input}/{name}")
            return decode_records(docs, fields).withColumnRenamed("doc_id", "record_id")

        census = load("decennial_census", D.DECENNIAL_CENSUS.column_names)
        w2 = load("taxes_w2_and_1099", D.TAXES_W2_AND_1099.column_names)
        ssa = load("social_security", D.SOCIAL_SECURITY.column_names)
        truth = None
    else:
        pop = synth.simulants(spark, args.simulants, seed=args.seed)
        cfg = config.get_config()
        census = noise.noise_dataset(synth.census_records(pop, 2020), D.DECENNIAL_CENSUS, cfg, seed=args.seed + 1)
        w2 = noise.noise_dataset(synth.w2_records(pop, 2020), D.TAXES_W2_AND_1099, cfg, seed=args.seed + 2)
        ssa = noise.noise_dataset(synth.ssa_records(pop), D.SOCIAL_SECURITY, cfg, seed=args.seed + 3)
        truth = (
            census.select("record_id", "simulant_id")
            .unionByName(w2.select("record_id", "simulant_id"))
            .unionByName(ssa.select("record_id", "simulant_id"))
        )

    nc = normalize_records(census, "census", "MM/dd/yyyy", ref_year=2020)
    nw = normalize_records(
        w2, "w2", "MM/dd/yyyy",
        column_map={"zipcode": "mailing_address_zipcode", "city": "mailing_address_city",
                    "state": "mailing_address_state"},
        ref_year=2020,
    )
    ns = normalize_records(ssa, "ssa", "yyyyMMdd", dob_fallback="event_date", period_col="event_type")
    records = nc.unionByName(nw).unionByName(ns)

    res = resolve(
        spark, records,
        ResolveConfig(threshold=args.threshold, checkpoint_dir=f"{args.output}/stages"),
        truth=truth,
    )
    res["assignments"].write.mode("overwrite").parquet(f"{args.output}/assignments")
    if "metrics" in res:
        print(json.dumps(res["metrics"]))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
