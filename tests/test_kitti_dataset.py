"""KITTI data layer tests against the vendored mini-KITTI fixture."""

import os

import numpy as np
import pytest

from heterofusionrcnn_tpu.configs import DatasetConfig
from heterofusionrcnn_tpu.datasets.kitti import calib as calib_io
from heterofusionrcnn_tpu.datasets.kitti import labels as label_io
from heterofusionrcnn_tpu.datasets.kitti import pointcloud as pc_lib
from heterofusionrcnn_tpu.datasets.kitti.dataset import (
    KEY_IMAGE_INPUT,
    KEY_LABEL_BOXES_3D,
    KEY_LABEL_NUM_BOXES,
    KEY_LABEL_REG,
    KEY_LABEL_SEG,
    KEY_POINT_CLOUD,
    KEY_STEREO_CALIB_P2,
    KittiDataset,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "kitti")


def make_config(**kw):
    cfg = DatasetConfig(dataset_dir=FIXTURE, data_split="train")
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_calib_reader():
    calib = calib_io.read_calibration(os.path.join(FIXTURE, "training", "calib"), 0)
    assert calib.p2.shape == (3, 4)
    assert calib.r0_rect.shape == (3, 3)
    assert calib.tr_velodyne_to_cam.shape == (3, 4)
    # KITTI P2 focal length is ~700.
    assert 500 < calib.p2[0, 0] < 1000


def test_label_reader_and_filter():
    labels = label_io.read_labels(os.path.join(FIXTURE, "training", "label_2"), 0)
    assert len(labels) > 0
    cars = label_io.filter_labels(labels, ["Car"])
    ped = label_io.filter_labels(labels, ["Pedestrian"])
    assert all(o.type == "Car" for o in cars)
    assert all(o.type == "Pedestrian" for o in ped)
    box = label_io.object_label_to_box_3d(labels[0])
    assert box.shape == (7,)
    assert box[5] > 0  # h positive


def test_lidar_frustum_filter():
    pc = pc_lib.get_lidar_point_cloud(
        0,
        os.path.join(FIXTURE, "training", "calib"),
        os.path.join(FIXTURE, "training", "velodyne"),
        im_size=[1242, 375],
    )
    assert pc.shape[1] == 4
    assert (pc[:, 2] > 0).all()  # all in front of camera
    # Project back: all inside the image.
    calib = calib_io.read_calibration(os.path.join(FIXTURE, "training", "calib"), 0)
    uv = calib_io.project_to_image(pc[:, :3], calib.p2)
    assert (uv[:, 0] > 0).all() and (uv[:, 0] < 1242).all()
    assert (uv[:, 1] > 0).all() and (uv[:, 1] < 375).all()


def test_depth_stratified_sampling():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 80, (50000, 3)).astype(np.float32)
    # Realistic depth falloff: ~90% of lidar returns are near (< 40m).
    pts[:, 2] = rng.uniform(0, 80, 50000) * np.where(
        rng.uniform(size=50000) < 0.9, 0.5, 1.0
    )
    inten = rng.uniform(0, 1, 50000).astype(np.float32)
    sampled, si = pc_lib.depth_stratified_sample(pts, inten, 16384, rng)
    assert sampled.shape == (16384, 3) and si.shape == (16384, 1)
    # All far points (z >= 40) must be kept.
    n_far = (pts[:, 2] >= 40).sum()
    assert (sampled[:, 2] >= 40).sum() == n_far

    # Upsampling path.
    small = pts[:100]
    s2, _ = pc_lib.depth_stratified_sample(small, inten[:100], 300, rng)
    assert s2.shape == (300, 3)


def test_dataset_rpn_batch():
    ds = KittiDataset(make_config(), train_val_test="train")
    ds.seed(0)
    assert ds.num_samples > 0
    batch, names = ds.next_batch(2, shuffle=True, model="rpn", pc_sample_pts=2048)
    assert batch[KEY_POINT_CLOUD].shape == (2, 2048, 4)
    assert batch[KEY_IMAGE_INPUT].shape == (2, 360, 1200, 3)
    assert batch[KEY_LABEL_SEG].shape == (2, 2048)
    assert batch[KEY_LABEL_REG].shape == (2, 2048, 7)
    assert batch[KEY_LABEL_BOXES_3D].shape == (2, 32, 7)
    assert batch[KEY_STEREO_CALIB_P2].shape == (2, 3, 4)
    assert len(names) == 2
    # Intensity shifted to [-0.5, 0.5].
    assert batch[KEY_POINT_CLOUD][..., 3].min() >= -0.5 - 1e-6
    assert batch[KEY_POINT_CLOUD][..., 3].max() <= 0.5 + 1e-6
    # Seg labels: 0 bg, -1 ignore, or 1..3 class.
    segs = batch[KEY_LABEL_SEG]
    assert set(np.unique(segs)).issubset({-1.0, 0.0, 1.0, 2.0, 3.0})
    # Some foreground should exist in KITTI frames with labels.
    assert (segs > 0).sum() > 0
    # Foreground points carry their GT box as regression target.
    fg = segs > 0
    assert (np.abs(batch[KEY_LABEL_REG][fg]).sum(axis=1) > 0).all()
    # Real per-GT classes ride along, padded like the boxes (the evaluator
    # feeds them to compute_recall_iou — reference evaluator.py:299).
    cls = batch["label_classes"]
    assert cls.shape == (2, 32)
    counts = batch["label_num_boxes"]
    for i in range(2):
        m = int(counts[i])
        assert (cls[i, :m] >= 1).all()  # 1-based fg class ids
        assert (cls[i, m:] == 0).all()


def test_dataset_deterministic_with_seed():
    ds1 = KittiDataset(make_config(), train_val_test="train")
    ds1.seed(123)
    b1, n1 = ds1.next_batch(2, shuffle=True, model="rpn", pc_sample_pts=512)
    ds2 = KittiDataset(make_config(), train_val_test="train")
    ds2.seed(123)
    b2, n2 = ds2.next_batch(2, shuffle=True, model="rpn", pc_sample_pts=512)
    assert n1 == n2
    np.testing.assert_allclose(b1[KEY_POINT_CLOUD], b2[KEY_POINT_CLOUD])


def test_dataset_sharding_partitions():
    ds = KittiDataset(make_config(), train_val_test="val")
    all_names = [s.name for s in ds.sample_list]
    shard_names = []
    for i in range(2):
        dsi = KittiDataset(make_config(data_split="val"), train_val_test="val")
        dsi.shard(i, 2)
        shard_names.extend(s.name for s in dsi.sample_list)
    assert sorted(shard_names) == sorted(
        s.name
        for s in KittiDataset(make_config(data_split="val"), "val").sample_list
    )


def test_augmented_sample_list_combinatorics():
    cfg = make_config(aug_list=["flipping", "pca_jitter"])
    ds = KittiDataset(cfg, train_val_test="train")
    base = KittiDataset(make_config(), train_val_test="train")
    # Subsets: {}, {flip}, {jitter}, {flip, jitter} -> 4x samples.
    assert ds.num_samples == 4 * base.num_samples


def test_flip_augmentation_consistency():
    """Flipped batches keep label/point consistency: fg counts are similar."""
    cfg = make_config(aug_list=["flipping"])
    ds = KittiDataset(cfg, train_val_test="train")
    ds.seed(0)
    # Find a flipped sample index.
    idx = next(
        i for i, s in enumerate(ds.sample_list) if "flipping" in s.augs
    )
    dicts = ds.load_rpn_samples([idx], pc_sample_pts=2048)
    assert len(dicts) == 1
    segs = dicts[0][KEY_LABEL_SEG]
    assert (segs > 0).sum() > 0


def test_clusters_mean_sizes():
    ds = KittiDataset(make_config(), train_val_test="train")
    assert len(ds.clusters) == 3
    car = np.asarray(ds.clusters[0]).reshape(-1, 3)
    # KITTI car mean size ~ [3.9, 1.6, 1.5].
    assert 3.0 < car[0, 0] < 5.0
    assert 1.2 < car[0, 1] < 2.2
    assert 1.2 < car[0, 2] < 2.2
