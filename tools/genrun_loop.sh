#!/bin/bash
# Crash-resume driver for the >=10k-step generalization run (round-5 OOM
# post-mortem: the first 10k run leaked ~13 MB/step host RSS and was
# OOM-killed right after RPN step 10000, losing the whole downstream sweep).
#
# Every leg of tools/run_generalization.py is now resumable (trainer
# checkpoint resume, curve-CSV skip, handoff markers, per-step AP ledgers),
# and the trainer self-restarts at HFR_MAX_HOST_RSS_MB via exit 75 — so this
# loop turns any OOM into a bounded slowdown instead of a lost run.
#
# Runs from the /root/genrun snapshot so repo edits cannot crash the run
# (lazy-import post-mortem, CLAUDE.md).
set -u
cd /root/genrun
export HFR_MAX_HOST_RSS_MB=${HFR_MAX_HOST_RSS_MB:-60000}
LOG=/root/repo/outputs/gen/run.log
for attempt in $(seq 1 25); do
  echo "=== gen attempt $attempt at $(date -u) ===" >> "$LOG"
  python tools/run_generalization.py \
      --dataset_dir /root/genrun/tests/fixtures/kitti \
      --output_root /root/repo/outputs/gen \
      --rpn_iterations 10000 --rcnn_iterations 10000 \
      --checkpoint_interval 2000 --eval_batch_size 4 \
      >> "$LOG" 2>&1
  rc=$?
  echo "=== attempt $attempt exit rc=$rc at $(date -u) ===" >> "$LOG"
  if [ "$rc" -eq 0 ]; then
    echo "=== gen run COMPLETE at $(date -u) ===" >> "$LOG"
    exit 0
  fi
  sleep 10
done
echo "=== gen run gave up after 25 attempts ===" >> "$LOG"
exit 1
