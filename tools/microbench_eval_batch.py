"""Measure the batched evaluator's wall-clock win on the real chip.

Runs the SAME RPN checkpoint through RpnEvaluator at eval_batch_size 1 and
N (default 4) into throwaway output roots and reports per-sample wall-clock
(file IO included, compile excluded via a throwaway first epoch). The
tunneled chip pays ~33 ms RTT + dispatch per eval call — batching divides
that fixed cost by N (runtime/evaluator.py TPU batching addition).

Usage (on chip, after a training run has left checkpoints):
    python tools/microbench_eval_batch.py \
        --output_root outputs/gen10k --config rpn_multiclass \
        --dataset_dir tests/fixtures/kitti --split val --batch 4
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_root", default="outputs/gen10k")
    ap.add_argument("--config", default="rpn_multiclass")
    ap.add_argument("--dataset_dir", default="tests/fixtures/kitti")
    ap.add_argument("--split", default="val")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=3,
                    help="timed eval sweeps per batch size (median)")
    args = ap.parse_args()

    import numpy as np

    from heterofusionrcnn_tpu.experiments import common
    from heterofusionrcnn_tpu.runtime.checkpoint import CheckpointManager
    from heterofusionrcnn_tpu.runtime.evaluator import RpnEvaluator

    cfg = common.resolve_config(args.config, args.dataset_dir)
    cfg.dataset_config.aug_list = []
    cfg.model_config.path_drop_probabilities = [1.0, 1.0]

    name = cfg.model_config.checkpoint_name
    mgr = CheckpointManager(os.path.join(args.output_root, name, "checkpoints"))
    step = mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoints under {args.output_root}/{name}")
    restored = mgr.restore_raw(step)
    variables = {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }
    mgr.close()
    print(f"checkpoint step {step}", flush=True)

    results = {}
    for bs in (1, args.batch):
        ds = common.build_dataset(cfg, "val", args.split)
        model, _ = common.build_model(cfg, ds, "val")
        times = []
        for rep in range(args.epochs + 1):
            root = tempfile.mkdtemp(prefix=f"evalbench_bs{bs}_")
            ev = RpnEvaluator(model, ds, cfg, root, eval_batch_size=bs)
            t0 = time.time()
            s = ev.run_checkpoint_once(variables, step)
            dt = time.time() - t0
            shutil.rmtree(root, ignore_errors=True)
            if rep == 0:
                print(f"bs={bs}: compile sweep {dt:.1f}s "
                      f"(recall@0.5={s['recall_50']:.3f})", flush=True)
                continue  # compile epoch, untimed
            times.append(dt)
        med = float(np.median(times))
        n = ds.num_samples
        results[bs] = med
        print(f"bs={bs}: median epoch {med:.2f}s over {n} samples "
              f"({med / n * 1000:.0f} ms/sample), reps {['%.2f' % t for t in times]}",
              flush=True)

    speedup = results[1] / results[args.batch]
    print(f"SPEEDUP batch-{args.batch} vs batch-1: {speedup:.2f}x")


if __name__ == "__main__":
    main()
