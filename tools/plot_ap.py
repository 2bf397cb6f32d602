"""AP-vs-checkpoint plotting + top-k checkpoints (parity with
scripts/offline_eval/plot_ap.py).

Scans <predictions>/kitti_native_eval/<thresh>/<step>/ dirs that have been
evaluated (ap_summary.txt written by run_eval_sweep), parses AP values,
prints the top-5 checkpoints per metric, and writes an AP-vs-step plot.

    python tools/plot_ap.py --predictions_dir outputs/rcnn_multiclass/predictions \
        --metric car_detection_3d
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import json
import re


def parse_summaries(predictions_dir: str):
    """Collect {step: {metric: (e, m, h)}} from ap_summary.json files."""
    results = {}
    pattern = os.path.join(
        predictions_dir, "kitti_native_eval", "*", "*", "ap_summary.json"
    )
    for path in glob.glob(pattern):
        step = int(os.path.basename(os.path.dirname(path)))
        with open(path) as f:
            results[step] = {k: tuple(v) for k, v in json.load(f).items()}
    return dict(sorted(results.items()))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--predictions_dir", required=True)
    parser.add_argument("--metric", default="car_detection_3d")
    parser.add_argument("--difficulty", type=int, default=1,
                        help="0 easy / 1 moderate / 2 hard")
    parser.add_argument("--top_k", type=int, default=5)
    parser.add_argument("--plot_out", default=None)
    args = parser.parse_args()

    results = parse_summaries(args.predictions_dir)
    if not results:
        raise SystemExit(f"no ap_summary.json found under {args.predictions_dir}")

    series = [
        (step, metrics[args.metric][args.difficulty])
        for step, metrics in results.items()
        if args.metric in metrics
    ]
    print(f"{args.metric} (difficulty {args.difficulty}):")
    for step, ap in series:
        print(f"  step {step}: {ap:.2f}")

    ranked = sorted(series, key=lambda kv: -kv[1])[: args.top_k]
    print(f"top {args.top_k}:")
    for step, ap in ranked:
        print(f"  step {step}: {ap:.2f}")

    if args.plot_out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps, aps = zip(*series)
        plt.figure(figsize=(8, 4))
        plt.plot(steps, aps, marker="o")
        plt.xlabel("step")
        plt.ylabel(f"{args.metric} AP")
        plt.grid(True, alpha=0.3)
        plt.tight_layout()
        plt.savefig(args.plot_out, dpi=120)
        print(f"wrote {args.plot_out}")


if __name__ == "__main__":
    main()
