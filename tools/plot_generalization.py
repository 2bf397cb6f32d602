"""Plot the generalization curves written by tools/run_generalization.py.

Reads <gen_dir>/rpn_recall_curve.csv (step, recall@0.5, recall@0.7, seg_acc,
val split) and <gen_dir>/rcnn_ap_curve.csv (step, car/ped/cyc 3D-moderate
AP, val split) and writes a two-panel PNG next to them — the committed
visual evidence for the >=10k-step training-curve requirement (reference
workflow equivalent: scripts/offline_eval/plot_ap.py over all_eval.sh
checkpoint sweeps).

    python tools/plot_generalization.py [--gen_dir outputs/gen/generalization]
"""

from __future__ import annotations

import argparse
import csv
import os


def _rows(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        rows = [r for r in csv.reader(f)][1:]
    return [[float(x) for x in r] for r in rows if r]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gen_dir", default="outputs/gen/generalization")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    recall = _rows(os.path.join(args.gen_dir, "rpn_recall_curve.csv"))
    ap = _rows(os.path.join(args.gen_dir, "rcnn_ap_curve.csv"))
    if not recall and not ap:
        raise SystemExit(f"no curve CSVs under {args.gen_dir}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))

    ax = axes[0]
    if recall:
        steps = [r[0] for r in recall]
        ax.plot(steps, [r[1] for r in recall], "o-", label="recall@0.5")
        ax.plot(steps, [r[2] for r in recall], "s-", label="recall@0.7")
        ax.plot(steps, [r[3] for r in recall], "^--", label="seg acc")
    ax.set_xlabel("RPN training step")
    ax.set_ylabel("val-split recall / accuracy")
    ax.set_title("RPN proposal recall vs step (val split)")
    ax.set_ylim(0, 1.02)
    ax.grid(alpha=0.3)
    ax.legend()

    ax = axes[1]
    if ap:
        steps = [r[0] for r in ap]
        ax.plot(steps, [r[1] for r in ap], "o-", label="car 3D mod")
        ax.plot(steps, [r[2] for r in ap], "s-", label="pedestrian 3D mod")
        ax.plot(steps, [r[3] for r in ap], "^-", label="cyclist 3D mod")
    ax.set_xlabel("RCNN training step")
    ax.set_ylabel("val-split AP (moderate)")
    ax.set_title("RCNN 3D AP vs step (val split)")
    ax.grid(alpha=0.3)
    ax.legend()

    fig.tight_layout()
    out = args.out or os.path.join(args.gen_dir, "curves.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
