#!/bin/bash
# Round-5 post-generalization chip queue (third arming). Waits for the
# relaunched generalization loop (/tmp/genloop2.pid) to release the chip,
# then captures the round-final perf evidence at committed HEAD:
#   1. check_kernels (exactness at production shapes — the standing gate)
#   2. driver bench at the default batch 4 (the scoreboard line)
#   3. batch-8 A/B (round-4 measured +1.6%; re-check now that the pipeline
#      is ~13% faster — if it wins by >5% the default is worth revisiting)
#   4. fresh fused-graph trace for the 50-fps floor decomposition
set -x
GENPID="$(cat /tmp/genloop2.pid 2>/dev/null)"
if [ -n "$GENPID" ]; then
  while kill -0 "$GENPID" 2>/dev/null; do sleep 60; done
fi
echo "=== chip free at $(date -u) ==="
cd /root/repo
timeout 1800 python tools/check_kernels.py
echo "=== bench batch 4 (default) ==="
timeout 3600 python bench.py
echo "=== bench batch 8 A/B ==="
HFR_BENCH_BATCH=8 timeout 3600 python bench.py
echo "=== fresh trace ==="
timeout 1800 python tools/capture_trace.py
echo "=== knn tile sweep incl. 512-wide query tiles (never swept) ==="
timeout 1800 python tools/microbench_knn.py --tiles
echo "=== postgen queue2 done at $(date -u) ==="
