#!/bin/bash
# Round-5: refresh the 300k scaling row with the CURRENT engine (the
# round-4 row predates the fnd/nys blocking passes, which grew the
# candidate set 42.4M -> ~48M pairs). Same methodology as the 1M run.
set -x
cd /root/repo
N=300000

echo "=== 300k refresh start $(date) ==="
# regenerate the scoring-stage inputs under the new blocking
rm -rf /tmp/pp_scaling_input/pairs_${N} /tmp/pp_scaling_input/records_int_${N}
python tools/profile_scoring.py --prepare ${N} || exit 1
echo "=== scoring inputs prepared $(date) ==="

# preserve the round-4 kernel artifact, then re-probe on the new pairs
cp -n BENCH/KERNEL_CEILING_300000.json BENCH/KERNEL_CEILING_300000_r4.json
python tools/mp_scaling_probe.py ${N} 2,8 2 --write || exit 1
cp BENCH/KERNEL_CEILING.json BENCH/KERNEL_CEILING_${N}.json
echo "=== kernel ceiling done $(date) ==="

python tools/bench_scaling.py ${N} 2 8 3
echo "=== 300k refresh done $(date) rc=$? ==="
