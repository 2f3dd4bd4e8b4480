#!/bin/bash
# Round-5 task #1: the 1M-simulant scaling measurement campaign.
# Runs unattended; logs to /tmp/campaign_1m.log.
set -x
cd /root/repo
N=1000000

echo "=== campaign start $(date) ==="
# 1. deterministic noised input + truth deck
if [ ! -f "/tmp/pp_scaling_input/records_${N}/_SUCCESS" ]; then
  python tools/bench_scaling.py --prepare ${N} || exit 1
fi
echo "=== input prepared $(date) ==="

# 2. materialize records_int + candidate pairs (kernel-probe inputs)
if [ ! -f "/tmp/pp_scaling_input/pairs_${N}/_SUCCESS" ]; then
  python tools/profile_scoring.py --prepare ${N} || exit 1
fi
echo "=== scoring inputs prepared $(date) ==="

# 3. workload-matched kernel ceiling at THIS input size
#    (preserve the 300k artifact first; skip if already measured)
cp -n BENCH/KERNEL_CEILING.json BENCH/KERNEL_CEILING_300000.json
if [ ! -f "BENCH/KERNEL_CEILING_${N}.json" ]; then
  python tools/mp_scaling_probe.py ${N} 2,8 2 --write || exit 1
  cp BENCH/KERNEL_CEILING.json BENCH/KERNEL_CEILING_${N}.json
else
  cp BENCH/KERNEL_CEILING_${N}.json BENCH/KERNEL_CEILING.json
fi
echo "=== kernel ceiling done $(date) ==="

# 4. the pinned N/4N Spark legs (writes BENCH/SCALING_1000000.{md,json})
python tools/bench_scaling.py ${N} 2 8 3
echo "=== campaign done $(date) rc=$? ==="
