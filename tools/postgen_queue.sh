#!/bin/bash
# Round-5 post-generalization chip queue (second arming). The tunneled v5e
# admits ONE process at a time (CLAUDE.md); this waits for the generalization
# LOOP (tools/genrun_loop.sh, /tmp/genloop.pid) to release the chip, then
# runs the on-chip gate for the working tree's uncommitted kernel changes:
#   - ops/pallas_knn.py sorted-tile defaults 1024/128 -> 512/256 (round-5
#     sweep: 9.91/6.72/6.01 ms vs 12.14/8.14/6.45 at the three prod shapes)
#   - ops/cropping.py wrap-fill one-hot MXU gather (2.22 vs 3.72 ms A/B)
# Order: exactness first (check_kernels), then the driver bench, then a
# fresh trace for the ledger.
set -x
GENPID="$(cat /tmp/genloop.pid 2>/dev/null)"
if [ -n "$GENPID" ]; then
  while kill -0 "$GENPID" 2>/dev/null; do sleep 60; done
fi
echo "=== chip free at $(date -u) ==="
cd /root/repo
timeout 1800 python tools/check_kernels.py
echo "=== bench (new knn tiles + one-hot wrap gather) ==="
timeout 3600 python bench.py
echo "=== fresh trace ==="
timeout 1800 python tools/capture_trace.py
echo "=== postgen queue done at $(date -u) ==="
