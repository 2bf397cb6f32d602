"""KITTI-format writer golden tests (row layout must match the native
evaluator's expectations and the reference's output format)."""

import os

import numpy as np
import pytest

from heterofusionrcnn_tpu.configs import DatasetConfig
from heterofusionrcnn_tpu.datasets.kitti.dataset import KittiDataset
from heterofusionrcnn_tpu.runtime.kitti_writer import (
    project_box_to_image_space,
    save_predictions_in_kitti_format,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "kitti")


def test_project_box_roundtrip_with_gt():
    """A GT box projects to an image box overlapping its labeled 2D bbox."""
    from heterofusionrcnn_tpu.datasets.kitti import calib as calib_io
    from heterofusionrcnn_tpu.datasets.kitti import labels as label_io

    calib = calib_io.read_calibration(os.path.join(FIXTURE, "training", "calib"), 0)
    objs = label_io.filter_labels(
        label_io.read_labels(os.path.join(FIXTURE, "training", "label_2"), 0),
        ["Pedestrian"],
    )
    obj = objs[0]
    box = label_io.object_label_to_box_3d(obj)
    img_box = project_box_to_image_space(box, calib.p2, (1242, 375))
    assert img_box is not None
    # Overlaps the labeled 2D box substantially.
    gt2d = np.array([obj.x1, obj.y1, obj.x2, obj.y2])
    ix = min(img_box[2], gt2d[2]) - max(img_box[0], gt2d[0])
    iy = min(img_box[3], gt2d[3]) - max(img_box[1], gt2d[1])
    assert ix > 0 and iy > 0


def test_save_predictions_kitti_format(tmp_path):
    cfg = DatasetConfig(dataset_dir=FIXTURE, data_split="train")
    ds = KittiDataset(cfg, "val")

    # Fabricate final predictions for one sample from its GT.
    from heterofusionrcnn_tpu.datasets.kitti import labels as label_io

    name = ds.sample_list[0].name
    objs = label_io.filter_labels(
        label_io.read_labels(ds.label_dir, int(name)), ds.classes
    )
    rows = []
    for obj in objs:
        box = label_io.object_label_to_box_3d(obj)
        cls0 = label_io.class_str_to_index(obj.type, ds.classes) - 1
        rows.append(list(box) + [0.9, cls0])

    pred_dir = tmp_path / "predictions"
    final_dir = pred_dir / "final_predictions_and_scores" / "train" / "7"
    final_dir.mkdir(parents=True)
    np.savetxt(final_dir / (name + ".txt"), np.asarray(rows), fmt="%.5f")

    kitti_dir = save_predictions_in_kitti_format(ds, str(pred_dir), 0.1, 7)
    out_file = os.path.join(kitti_dir, name + ".txt")
    assert os.path.exists(out_file)

    lines = [l.split() for l in open(out_file) if l.strip()]
    assert len(lines) >= 1
    for parts in lines:
        assert len(parts) == 16
        assert parts[0] in ds.classes
        # trunc/occl sentinel, alpha sentinel
        assert parts[1] == "-1" and parts[2] == "-1"
        assert float(parts[3]) == -10
        x1, y1, x2, y2 = map(float, parts[4:8])
        assert x2 > x1 and y2 > y1
        h, w, l = map(float, parts[8:11])
        assert h > 0 and w > 0 and l > 0
        score = float(parts[15])
        assert 0 <= score <= 1

    # Other samples get empty files (no predictions).
    others = [
        f for f in os.listdir(kitti_dir) if f != name + ".txt"
    ]
    assert others
    assert os.path.getsize(os.path.join(kitti_dir, others[0])) == 0


def test_kitti_writer_feeds_native_eval(tmp_path):
    """Writer output scores near-max AP against GT via the native evaluator
    (detections are the GT itself)."""
    from heterofusionrcnn_tpu.datasets.kitti import labels as label_io
    from heterofusionrcnn_tpu.runtime.native_eval import run_kitti_native_eval

    cfg = DatasetConfig(dataset_dir=FIXTURE, data_split="train")
    ds = KittiDataset(cfg, "val")

    pred_dir = tmp_path / "predictions"
    final_dir = pred_dir / "final_predictions_and_scores" / "train" / "1"
    final_dir.mkdir(parents=True)
    for s in ds.sample_list:
        objs = label_io.filter_labels(
            label_io.read_labels(ds.label_dir, int(s.name)), ds.classes
        )
        rows = []
        for obj in objs:
            box = label_io.object_label_to_box_3d(obj)
            cls0 = label_io.class_str_to_index(obj.type, ds.classes) - 1
            rows.append(list(box) + [0.95, cls0])
        np.savetxt(final_dir / (s.name + ".txt"), np.asarray(rows), fmt="%.5f")

    kitti_dir = save_predictions_in_kitti_format(ds, str(pred_dir), 0.1, 1)
    aps = run_kitti_native_eval(ds.label_dir, kitti_dir, str(tmp_path / "out"))
    # Perfect-detection structural max on the 7-sample train split: the
    # moderate car AP should be well above zero and equal across metrics.
    assert aps["car_detection_3d"][2] > 20.0
    np.testing.assert_allclose(
        aps["car_detection_3d"], aps["car_detection_bev"], atol=1e-3
    )
