#!/bin/bash
# Probe-gated scaling-evidence hunter: the sandbox host's first-touch
# page-fault bandwidth drifts 1.1-2.4+ GB/s on an hours scale (see
# CLAUDE.md HOST PATHOLOGY 2); 2v8 efficiency tracks it (0.81 at
# ~2.8 GB/s, 0.60 at ~1.1).  This loop probes before each attempt and
# only spends a ~25-min --scaling run when the window looks good.
#
# Usage: tools/scaling_hunt.sh [n_attempts] [min_gbps]
# Output: /tmp/scaling_hunt_<i>.json + .probe per attempt.
set -u
N=${1:-6}
MIN_GBPS=${2:-1.8}
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
    if [ "$ok" = "1" ]; then
        BENCH_CPU_LO=2 BENCH_CPU_HI=8 GRAFT_SF_DIR=/root/testdata/sf0.1 \
            python bench.py --scaling > "/tmp/scaling_hunt_${i}.json" \
            2> "/tmp/scaling_hunt_${i}.err"
        eff=$(python -c "
import json; print(json.load(open('/tmp/scaling_hunt_${i}.json'))['scaling_efficiency'])" 2>/dev/null || echo "ERR")
        echo "attempt $i efficiency: $eff"
    else
        echo "attempt $i skipped (bad window), sleeping 10 min"
        sleep 600
    fi
done
echo HUNT_DONE
