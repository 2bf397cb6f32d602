"""Pre-compute per-point segmentation/regression labels (parity with
scripts/preprocessing/gen_label_segs.py + hf/core/label_seg_preprocessor.py).

Workflow-parity note: the cache is write-only IN THE REFERENCE TOO — its
reader chain (kitti_dataset.get_label_seg :259 -> kitti_utils.get_label_seg
:58 -> label_seg_utils.get_label_seg :52) has zero callers anywhere in the
reference tree, and the reference's actual RPN pipeline generates labels
online per batch (kitti_dataset.py:390 generate_rpn_training_labels), exactly
as this repo's dataset does (datasets/kitti/dataset.py:237). This tool mirrors
the offline preprocessing script for workflow parity. Cached npys hold rows
[cls, x, y, z, l, w, h, ry] per point of the full (unsampled) frustum cloud;
a process pool replaces the reference's os.fork worker loop.

    python tools/gen_label_segs.py --dataset_dir /data/Kitti/object \
        --data_split train --out_dir /data/label_segs --workers 8
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import multiprocessing as mp

import numpy as np


def _process_sample(job):
    dataset_dir, out_dir, name, classes, expand = job
    from heterofusionrcnn_tpu.datasets.kitti import labels as label_io
    from heterofusionrcnn_tpu.datasets.kitti import pointcloud as pc_lib
    from heterofusionrcnn_tpu.utils.np_box_ops import points_in_box

    base = os.path.join(dataset_dir, "training")
    out_path = os.path.join(out_dir, name + ".npy")
    if os.path.exists(out_path):
        return name, 0

    import cv2

    img = cv2.imread(os.path.join(base, "image_2", name + ".png"))
    h, w = img.shape[:2]
    pc = pc_lib.get_lidar_point_cloud(
        int(name), os.path.join(base, "calib"), os.path.join(base, "velodyne"),
        im_size=[w, h],
    )
    pts = pc[:, :3]

    objs = label_io.filter_labels(
        label_io.read_labels(os.path.join(base, "label_2"), int(name)), classes
    )
    cls_label = np.zeros(len(pts), np.float32)
    reg_label = np.zeros((len(pts), 7), np.float32)
    for obj in objs:
        box = label_io.object_label_to_box_3d(obj)
        fg = points_in_box(pts, box)
        cls_label[fg] = label_io.class_str_to_index(obj.type, classes)
        reg_label[fg] = box
        expanded = box.copy()
        expanded[3:6] += expand * 2
        expanded[1] += expand
        ring = np.logical_xor(fg, points_in_box(pts, expanded))
        cls_label[ring] = -1

    np.save(out_path, np.hstack([cls_label[:, None], reg_label]))
    return name, int((cls_label > 0).sum())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_dir", required=True)
    parser.add_argument("--data_split", default="train")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--classes", nargs="*",
                        default=["Car", "Pedestrian", "Cyclist"])
    parser.add_argument("--expand_gt_size", type=float, default=0.2)
    parser.add_argument("--workers", type=int, default=os.cpu_count())
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.dataset_dir, args.data_split + ".txt")) as f:
        names = [line.strip() for line in f if line.strip()]

    jobs = [
        (args.dataset_dir, args.out_dir, n, tuple(args.classes),
         args.expand_gt_size)
        for n in names
    ]
    with mp.Pool(args.workers) as pool:
        for name, fg in pool.imap_unordered(_process_sample, jobs):
            print(f"{name}: {fg} fg points")


if __name__ == "__main__":
    main()
