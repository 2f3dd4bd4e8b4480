#!/usr/bin/env bash
# spark-submit packaging path (SURVEY.md §7 M6): zip the package, ship
# it with --py-files, run the resolve job. Works identically against a
# real cluster master (yarn/k8s/standalone) — pass MASTER=...
set -euo pipefail
cd "$(dirname "$0")/.."
MASTER="${MASTER:-local[32]}"
OUT="${1:-/tmp/pseudopeople_spark_out}"

rm -f /tmp/pseudopeople_spark.zip
zip -qr /tmp/pseudopeople_spark.zip pseudopeople_spark

spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files /tmp/pseudopeople_spark.zip \
  jobs/resolve_job.py --output "$OUT" --simulants "${SIMULANTS:-5000}"
