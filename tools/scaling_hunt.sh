#!/bin/bash
# Probe-gated scaling-evidence hunter: the sandbox host's first-touch
# page-fault / memory bandwidth drifts on an hours scale (see CLAUDE.md
# HOST PATHOLOGY 2/2b); 2v8 efficiency tracks it (0.81 at ~2.8 GB/s,
# 0.60-0.70 at 1.1-2.4).  Two gates before spending a ~25-min --scaling
# run:
#   1. cheap first-touch probe (>= MIN_GBPS) + loadavg quiet;
#   2. DIRECT capacity check: one 8-cpu headline measurement must clear
#      MIN_HI_TPS turns/s — the hi level is host-capacity-capped, so if
#      today's cap is below ~4*0.8*lo_tps the full run cannot reach 0.8
#      no matter how quiet the probe looks (measured: cap 800k -> 0.64).
#
# Usage: tools/scaling_hunt.sh [n_attempts] [min_gbps] [min_hi_tps]
# Output: /tmp/scaling_hunt_<i>.json + .probe + .hicheck per attempt.
set -u
N=${1:-6}
MIN_GBPS=${2:-2.5}
MIN_HI_TPS=${3:-950000}
cd "$(dirname "$0")/.."
for i in $(seq 1 "$N"); do
    gbps=$(NUMPY_MADVISE_HUGEPAGE=0 python -c "
import numpy as np, time
a = np.empty(2_000_000_000, dtype=np.uint8)
t0 = time.perf_counter(); a[::4096] = 1; t1 = time.perf_counter()
print(f'{2.0/(t1-t0):.2f}')")
    load=$(cut -d' ' -f1 /proc/loadavg)
    echo "attempt $i probe: ${gbps} GB/s load ${load}" | tee "/tmp/scaling_hunt_${i}.probe"
    ok=$(python -c "print(1 if float('$gbps') >= float('$MIN_GBPS') and float('$load') < 1.5 else 0)")
    if [ "$ok" != "1" ]; then
        echo "attempt $i skipped (bad probe), sleeping 10 min"
        sleep 600
        continue
    fi
    # direct hi-level capacity check (~2 min): one 8-cpu headline run
    BENCH_1X_CORPUS=1 BENCH_SKIP_QUERIES=1 RAY_GRAFT_CPUS=8 \
        GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python bench.py > "/tmp/scaling_hunt_${i}.hicheck" 2>/dev/null
    hi_tps=$(python -c "
import json; print(json.load(open('/tmp/scaling_hunt_${i}.hicheck'))['turns_per_sec'])" 2>/dev/null || echo 0)
    echo "attempt $i hi-check: ${hi_tps} turns/s (need >= ${MIN_HI_TPS})"
    ok=$(python -c "print(1 if float('$hi_tps') >= float('$MIN_HI_TPS') else 0)")
    if [ "$ok" != "1" ]; then
        echo "attempt $i skipped (hi level host-capped), sleeping 10 min"
        sleep 600
        continue
    fi
    BENCH_CPU_LO=2 BENCH_CPU_HI=8 GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python bench.py --scaling > "/tmp/scaling_hunt_${i}.json" \
        2> "/tmp/scaling_hunt_${i}.err"
    eff=$(python -c "
import json; print(json.load(open('/tmp/scaling_hunt_${i}.json'))['scaling_efficiency'])" 2>/dev/null || echo "ERR")
    echo "attempt $i efficiency: $eff"
done
echo HUNT_DONE
