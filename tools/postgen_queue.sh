#!/bin/bash
# Round-5 post-generalization chip queue. The tunneled v5e admits ONE
# process at a time (CLAUDE.md); this waits for the generalization run to
# release the chip, then runs the queued on-chip work in priority order:
#   1. tools/check_kernels.py  — fresh gate after the rpn.py image-gather
#      change (CLAUDE.md on-chip gate).
#   2. bench.py                — e2e fps with the per-batch 2-D image
#      gather (expected ~5-6 ms/batch off the round-4 112.3 ms).
#   3. tools/microbench_knn.py --tiles — legacy-mode candidate-tile sweep
#      (finer tiles -> better bbox-skip granularity on the same-set shape).
#   4. tools/capture_trace.py  — fresh fused-graph trace to re-measure the
#      image-shape copy/while lines the gather rewrite targeted.
set -x
GENPID="$(cat /tmp/genrun.pid 2>/dev/null)"
if [ -n "$GENPID" ]; then
  while kill -0 "$GENPID" 2>/dev/null; do sleep 60; done
fi
echo "=== chip free at $(date -u) ==="
cd /root/repo
timeout 1800 python tools/check_kernels.py
echo "=== bench ==="
timeout 3600 python bench.py
echo "=== wrap-gather A/B ==="
timeout 1200 python tools/microbench_wrapgather.py
echo "=== knn tile sweep (legacy) ==="
timeout 2400 python tools/microbench_knn.py --tiles
echo "=== fresh trace ==="
timeout 1800 python tools/capture_trace.py
echo "=== postgen queue done at $(date -u) ==="
