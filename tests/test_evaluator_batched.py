"""Batched-evaluator equivalence: `eval_batch_size > 1` must produce the
same output files and per-sample ledgers as batch-1 evaluation (the TPU
batching addition in runtime/evaluator.py; the reference evaluates one
sample per session.run, evaluator.py:218-312).
"""

import glob
import os

import numpy as np
import pytest

import jax

from heterofusionrcnn_tpu.configs.presets import rcnn_unittest, rpn_unittest
from heterofusionrcnn_tpu.datasets.kitti.dataset import KittiDataset
from heterofusionrcnn_tpu.models.rcnn import RcnnModel
from heterofusionrcnn_tpu.models.rpn import RpnModel
from heterofusionrcnn_tpu.runtime.evaluator import (
    RcnnEvaluator,
    RpnEvaluator,
    _iter_eval_batches,
)


def _clusters(ds):
    return tuple(tuple(np.asarray(c).reshape(3).tolist()) for c in ds.clusters)


def _read_rows(path):
    return np.loadtxt(path, ndmin=2)


def _compare_file_trees(dir_a, dir_b, pattern, loader, atol):
    files_a = sorted(glob.glob(os.path.join(dir_a, pattern)))
    files_b = sorted(glob.glob(os.path.join(dir_b, pattern)))
    assert [os.path.basename(f) for f in files_a] == [
        os.path.basename(f) for f in files_b
    ]
    assert files_a, f"no outputs matched {pattern} under {dir_a}"
    for fa, fb in zip(files_a, files_b):
        a, b = loader(fa), loader(fb)
        assert a.shape == b.shape, os.path.basename(fa)
        np.testing.assert_allclose(a, b, atol=atol, err_msg=os.path.basename(fa))


@pytest.fixture(scope="module")
def rpn_eval_pair(tmp_path_factory):
    """Run the SAME untrained RPN checkpoint through batch-1 and batch-3
    evaluators into two output roots."""
    cfg = rpn_unittest()
    cfg.dataset_config.data_split = "val"
    ic = cfg.model_config.input_config
    ds1 = KittiDataset(cfg.dataset_config, "val")
    clusters = _clusters(ds1)
    model = RpnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=clusters,
        mode="val", save_rpn_feature=True,
    )

    batch, _ = ds1.next_batch(
        1, shuffle=False, model="rpn", pc_sample_pts=ic.pc_sample_pts,
        img_w=ic.img_dims_w, img_h=ic.img_dims_h,
    )
    variables = jax.device_get(
        jax.jit(lambda rngs, *a: model.init(rngs, *a, training=False))(
            {"params": jax.random.PRNGKey(7)},
            batch["point_cloud"], batch["image_input"],
            batch["stereo_calib_p2"], batch["label_seg"],
            batch["label_reg"], batch["label_boxes_3d"],
        )
    )

    roots = {}
    summaries = {}
    for bs in (1, 3):
        root = str(tmp_path_factory.mktemp(f"rpn_eval_bs{bs}"))
        ds = KittiDataset(cfg.dataset_config, "val")
        ev = RpnEvaluator(
            model, ds, cfg, root, save_rpn_feature=True, eval_batch_size=bs
        )
        summaries[bs] = ev.run_checkpoint_once(variables, 100)
        roots[bs] = os.path.join(root, cfg.model_config.checkpoint_name)
    return cfg, roots, summaries


def test_rpn_batched_eval_same_files(rpn_eval_pair):
    _, roots, _ = rpn_eval_pair
    a = os.path.join(roots[1], "predictions")
    b = os.path.join(roots[3], "predictions")
    # Proposals are written %.3f — compare at that precision; IoU tables and
    # feature npys full-precision but CPU math may differ in the last ulp
    # between the two compiled batch shapes.
    _compare_file_trees(
        a, b, "proposals_and_scores/val/100/*.txt", _read_rows, atol=2e-3
    )
    _compare_file_trees(
        a, b, "proposals_iou/val/100/*.txt", _read_rows, atol=1e-4
    )
    _compare_file_trees(
        a, b, "rpn_feature/val/100/*.npy", np.load, atol=1e-4
    )


def test_rpn_batched_eval_same_ledgers(rpn_eval_pair):
    _, roots, summaries = rpn_eval_pair
    for name in ("rpn_avg_losses.csv", "rpn_avg_seg_acc.csv",
                 "rpn_total_recall.csv"):
        a = np.loadtxt(
            os.path.join(roots[1], "predictions", name), delimiter=",", ndmin=2
        )
        b = np.loadtxt(
            os.path.join(roots[3], "predictions", name), delimiter=",", ndmin=2
        )
        np.testing.assert_allclose(a, b, atol=1e-4, err_msg=name)
    for key in ("avg_seg_acc", "recall_50", "recall_70", "avg_num_proposals",
                "avg_iou2d", "avg_iou3d", "avg_angle_res"):
        np.testing.assert_allclose(
            summaries[1][key], summaries[3][key], atol=1e-4, err_msg=key
        )


def _write_synthetic_handoff(ds, out_dir, n_prop=24, n_pts=512, n_fts=72):
    """Fabricate RPN handoff files (proposals / IoU tables / feature npys)
    in the exact formats the RCNN loader reads (rcnn_sampling.py:39-53)."""
    rng = np.random.default_rng(3)
    prop_dir = os.path.join(out_dir, "proposals")
    iou_dir = os.path.join(out_dir, "ious")
    feat_dir = os.path.join(out_dir, "feats")
    for d in (prop_dir, iou_dir, feat_dir):
        os.makedirs(d, exist_ok=True)
    from heterofusionrcnn_tpu.datasets.kitti import labels as label_io

    for sample in ds.sample_list:
        objs = label_io.filter_labels(
            label_io.read_labels(ds.label_dir, int(sample.name)), ds.classes
        )
        if not objs:
            continue
        gt = np.stack([label_io.object_label_to_box_3d(o) for o in objs])
        centers = gt[rng.integers(0, len(gt), n_prop)][:, :3]
        props = np.concatenate(
            [
                centers + rng.normal(0, 0.5, (n_prop, 3)),
                np.abs(rng.normal([3.9, 1.6, 1.5], 0.3, (n_prop, 3))),
                rng.uniform(-np.pi, np.pi, (n_prop, 1)),
            ],
            axis=1,
        )
        scores = rng.random((n_prop, 1))
        np.savetxt(
            os.path.join(prop_dir, sample.name + ".txt"),
            np.hstack([props, scores]), fmt="%.3f",
        )
        from heterofusionrcnn_tpu.utils.np_box_ops import box_3d_iou_pair

        iou = np.array(
            [[box_3d_iou_pair(p, g)[0] for g in gt] for p in props],
            np.float32,
        )
        np.savetxt(os.path.join(iou_dir, sample.name + ".txt"), iou)
        feats = np.hstack(
            [
                rng.normal(0, 10, (n_pts, 3)),          # pts
                rng.random((n_pts, 1)),                  # intensity
                (rng.random((n_pts, 1)) > 0.5).astype(np.float32),  # fg
                rng.normal(0, 1, (n_pts, n_fts)),        # features
            ]
        ).astype(np.float32)
        np.save(os.path.join(feat_dir, sample.name + ".npy"), feats)
    return prop_dir, iou_dir, feat_dir


@pytest.fixture(scope="module")
def rcnn_eval_pair(tmp_path_factory):
    cfg = rcnn_unittest()
    cfg.dataset_config.data_split = "val"
    handoff_root = str(tmp_path_factory.mktemp("handoff"))
    seed_ds = KittiDataset(cfg.dataset_config, "val")
    prop_dir, iou_dir, feat_dir = _write_synthetic_handoff(seed_ds, handoff_root)

    clusters = _clusters(seed_ds)
    model = RcnnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=clusters,
        mode="val",
    )

    def make_ds():
        ds = KittiDataset(cfg.dataset_config, "val")
        ds.proposal_dir = prop_dir
        ds.proposal_iou_dir = iou_dir
        ds.rpn_feature_dir = feat_dir
        return ds

    ic = cfg.model_config.input_config
    ds0 = make_ds()
    batch, _, _ = next(
        _iter_eval_batches(
            ds0, 1, "rcnn", lambda n: False,
            img_w=ic.img_dims_w, img_h=ic.img_dims_h, num_rois=16,
        )
    )
    variables = jax.device_get(
        jax.jit(lambda rngs, *a: model.init(rngs, *a, training=False))(
            {"params": jax.random.PRNGKey(11)},
            batch["rpn_roi"], batch["rpn_iou"], batch["rpn_gt"],
            batch["rpn_pts"], batch["rpn_intensity"], batch["rpn_fg_mask"],
            batch["rpn_fts"], batch["image_input"], batch["stereo_calib_p2"],
        )
    )

    roots = {}
    summaries = {}
    for bs in (1, 2):
        root = str(tmp_path_factory.mktemp(f"rcnn_eval_bs{bs}"))
        ev = RcnnEvaluator(model, make_ds(), cfg, root, eval_batch_size=bs)
        summaries[bs] = ev.run_checkpoint_once(variables, 200, num_rois=16)
        roots[bs] = os.path.join(root, cfg.model_config.checkpoint_name)
    return cfg, roots, summaries


def test_rcnn_batched_eval_same_files(rcnn_eval_pair):
    _, roots, _ = rcnn_eval_pair
    a = os.path.join(roots[1], "predictions")
    b = os.path.join(roots[2], "predictions")
    _compare_file_trees(
        a, b, "final_predictions_and_scores/val/200/*.txt", _read_rows,
        atol=2e-5,
    )
    # KITTI-format conversion of identical finals must match too.
    def _kitti_rows(p):
        if os.path.getsize(p) == 0:
            return np.zeros((0, 15))
        return np.atleast_2d(np.genfromtxt(p, usecols=range(1, 16)))

    _compare_file_trees(
        a, b, "kitti_native_eval/0.1/200/data/*.txt", _kitti_rows, atol=1e-2
    )


def test_rcnn_batched_eval_same_ledgers(rcnn_eval_pair):
    _, roots, summaries = rcnn_eval_pair
    for name in ("rcnn_avg_losses.csv", "rcnn_avg_cls_acc.csv"):
        a = np.loadtxt(
            os.path.join(roots[1], "predictions", name), delimiter=",", ndmin=2
        )
        b = np.loadtxt(
            os.path.join(roots[2], "predictions", name), delimiter=",", ndmin=2
        )
        np.testing.assert_allclose(a, b, atol=1e-4, err_msg=name)
    np.testing.assert_allclose(
        summaries[1]["avg_cls_acc"], summaries[2]["avg_cls_acc"], atol=1e-4
    )


def test_iter_eval_batches_padding_and_skip(tmp_path):
    """The batch iterator pads the last chunk by repetition, marks pads
    invalid, and pre-skips done samples."""
    cfg = rpn_unittest()
    cfg.dataset_config.data_split = "val"
    ic = cfg.model_config.input_config
    ds = KittiDataset(cfg.dataset_config, "val")
    seen, valids = [], []
    for batch, names, valid in _iter_eval_batches(
        ds, 4, "rpn", lambda n: n == ds.sample_list[0].name,
        pc_sample_pts=ic.pc_sample_pts, img_w=ic.img_dims_w,
        img_h=ic.img_dims_h,
    ):
        assert len(names) == 4 and batch["point_cloud"].shape[0] == 4
        seen.extend(np.asarray(names)[valid].tolist())
        valids.append(valid.copy())
    all_names = [s.name for s in ds.sample_list]
    # Every non-skipped sample exactly once, in order.
    assert seen == [n for n in all_names[1:]]
    # Padded slots replicate the last valid sample.
    flat_valid = np.concatenate(valids)
    assert flat_valid.sum() == len(seen)
