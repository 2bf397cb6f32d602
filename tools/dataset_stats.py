"""Dataset statistics (parity with demos/dataset/data_histograms.py and
demos/dataset/data_mean.py; car_clustering.py lives in
tools/gen_label_clusters.py).

Two subcommands:
  histograms — per-class GT histograms (centroid x/y/z, l/w/h, orientation,
               points per frame) saved as one PNG per class + a JSON with
               the raw summary stats.
  mean       — dataset RGB channel means (the constant baked into
               img extractors' preprocess_image).

    python tools/dataset_stats.py histograms --dataset_dir \
        tests/fixtures/kitti --data_split trainval --out_dir /tmp/stats
    python tools/dataset_stats.py mean --dataset_dir tests/fixtures/kitti
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np

from heterofusionrcnn_tpu.configs import DatasetConfig
from heterofusionrcnn_tpu.datasets.kitti import labels as label_io
from heterofusionrcnn_tpu.datasets.kitti import pointcloud as pc_lib
from heterofusionrcnn_tpu.datasets.kitti.dataset import KittiDataset


def cmd_histograms(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cfg = DatasetConfig(dataset_dir=args.dataset_dir)
    ds = KittiDataset(cfg, args.data_split)
    os.makedirs(args.out_dir, exist_ok=True)

    classes = args.classes.split(",") if args.classes else ds.classes
    per_class = {c: {k: [] for k in
                     ("x", "y", "z", "l", "w", "h", "ry")} for c in classes}
    pts_per_frame = []

    for name in sorted({s.name for s in ds.sample_list}):
        objs = label_io.read_labels(ds.label_dir, int(name))
        for c in classes:
            sel = [o for o in label_io.filter_labels(objs, [c])]
            d = per_class[c]
            for o in sel:
                d["x"].append(o.t[0]); d["y"].append(o.t[1])
                d["z"].append(o.t[2])
                d["l"].append(o.l); d["w"].append(o.w); d["h"].append(o.h)
                d["ry"].append(o.ry)
        pc = pc_lib.get_lidar_point_cloud(
            int(name), ds.calib_dir, ds.velo_dir
        )
        pts_per_frame.append(len(pc))

    summary = {"num_samples": ds.num_samples,
               "points_per_frame": {
                   "mean": float(np.mean(pts_per_frame)),
                   "min": int(np.min(pts_per_frame)),
                   "max": int(np.max(pts_per_frame))}}
    bins = {"x": 51, "y": 51, "z": 51, "l": 21, "w": 21, "h": 21, "ry": 65}
    for c in classes:
        d = {k: np.asarray(v) for k, v in per_class[c].items()}
        n = len(d["x"])
        summary[c] = {"count": n}
        if n == 0:
            continue
        summary[c].update(
            {k: {"mean": float(v.mean()), "std": float(v.std())}
             for k, v in d.items()}
        )
        fig, axes = plt.subplots(2, 4, figsize=(16, 7))
        for ax, (k, v) in zip(axes.ravel(), d.items()):
            ax.hist(v, bins=bins[k])
            ax.set_title(f"{c} {k} (n={n})")
        axes.ravel()[-1].hist(pts_per_frame, bins=21)
        axes.ravel()[-1].set_title("points / frame")
        fig.tight_layout()
        out = os.path.join(args.out_dir, f"hist_{c.lower()}.png")
        fig.savefig(out, dpi=110)
        plt.close(fig)
        print("wrote", out)

    with open(os.path.join(args.out_dir, "stats.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


def cmd_mean(args):
    import cv2

    cfg = DatasetConfig(dataset_dir=args.dataset_dir)
    ds = KittiDataset(cfg, args.data_split)
    total = np.zeros(3)
    for name in sorted({s.name for s in ds.sample_list}):
        bgr = cv2.imread(ds.get_rgb_image_path(name))
        total += np.mean(bgr[..., ::-1].reshape(-1, 3), axis=0)
    mean = total / ds.num_samples
    print("RGB means: [{:.4f}, {:.4f}, {:.4f}]".format(*mean))
    print("(img extractors use the full-KITTI constants, "
          "img_vgg_pyr.KITTI_RGB_MEANS)")


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    h = sub.add_parser("histograms")
    h.add_argument("--dataset_dir", required=True)
    h.add_argument("--data_split", default="trainval")
    h.add_argument("--out_dir", required=True)
    h.add_argument("--classes", default=None,
                   help="comma list; default: dataset classes")
    h.set_defaults(fn=cmd_histograms)
    m = sub.add_parser("mean")
    m.add_argument("--dataset_dir", required=True)
    m.add_argument("--data_split", default="train")
    m.set_defaults(fn=cmd_mean)
    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
