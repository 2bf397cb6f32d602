"""Shared experiment wiring: config resolution, dataset/model construction,
train-step factories for both stages (the builders layer of the reference,
hf/builders/*)."""

from __future__ import annotations

import os

import jax
import numpy as np
import optax

from heterofusionrcnn_tpu.configs import config as config_lib
from heterofusionrcnn_tpu.configs import presets
from heterofusionrcnn_tpu.datasets.kitti.dataset import KittiDataset
from heterofusionrcnn_tpu.models.rcnn import RcnnModel, rcnn_loss
from heterofusionrcnn_tpu.models.rpn import RpnModel, rpn_loss
from heterofusionrcnn_tpu.runtime.train_state import make_rpn_train_step

PRESETS = {
    "rpn_multiclass": presets.rpn_multiclass,
    "rcnn_multiclass": presets.rcnn_multiclass,
    "rpn_unittest": presets.rpn_unittest,
    "rcnn_unittest": presets.rcnn_unittest,
}


def resolve_config(name_or_path: str, dataset_dir: str | None = None):
    """A preset name, or a JSON config file path (the analog of the
    reference's pipeline .config files)."""
    if name_or_path in PRESETS:
        cfg = PRESETS[name_or_path]()
    elif os.path.exists(name_or_path):
        cfg = config_lib.load_config(name_or_path)
        # checkpoint_name must match the config file name
        # (config_builder_util.py:73-76).
        base = os.path.splitext(os.path.basename(name_or_path))[0]
        if cfg.model_config.checkpoint_name != base:
            raise ValueError(
                f"checkpoint_name '{cfg.model_config.checkpoint_name}' must "
                f"equal the config file name '{base}'"
            )
    else:
        raise ValueError(f"unknown config {name_or_path}")
    if dataset_dir:
        cfg.dataset_config.dataset_dir = dataset_dir
    return cfg


def build_dataset(cfg, train_val_test: str, data_split: str | None = None):
    dcfg = cfg.dataset_config
    if data_split:
        dcfg.data_split = data_split
    return KittiDataset(dcfg, train_val_test)


def cluster_sizes_tuple(dataset):
    return tuple(
        tuple(np.asarray(c).reshape(-1, 3)[0].tolist()) for c in dataset.clusters
    )


def build_model(cfg, dataset, mode: str, save_rpn_feature: bool = False):
    clusters = cluster_sizes_tuple(dataset)
    mc = cfg.model_config
    if mc.model_name == "rpn_model":
        model = RpnModel(
            config=mc,
            num_classes=dataset.num_classes,
            cluster_sizes=clusters,
            mode=mode,
            save_rpn_feature=save_rpn_feature,
        )
        return model, lambda preds: rpn_loss(preds, mc)
    mb = cfg.dataset_config.mini_batch_config
    model = RcnnModel(
        config=mc,
        num_classes=dataset.num_classes,
        cluster_sizes=clusters,
        mode=mode,
        cls_neg_iou_hi=mb.cls_iou_3d_thresholds.neg_iou_hi,
        cls_pos_iou_lo=mb.cls_iou_3d_thresholds.pos_iou_lo,
        reg_pos_iou_lo=mb.reg_iou_3d_thresholds.pos_iou_lo,
        bev_z_max=float(dataset.bev_extents[1, 1]),
    )
    return model, lambda preds: rcnn_loss(preds, mc)


RPN_BATCH_KEYS = (
    "point_cloud", "image_input", "stereo_calib_p2",
    "label_seg", "label_reg", "label_boxes_3d",
)
RCNN_BATCH_KEYS = (
    "rpn_roi", "rpn_iou", "rpn_gt", "rpn_pts", "rpn_intensity",
    "rpn_fg_mask", "rpn_fts", "image_input", "stereo_calib_p2",
)


def make_rcnn_train_step(loss_fn):
    """Jitted RCNN train step (twin of make_rpn_train_step with the RCNN
    argument order)."""

    @jax.jit
    def step_fn(state, batch, rng):
        drop, path, nxt = jax.random.split(rng, 3)

        def compute(params):
            preds, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                *[batch[k] for k in RCNN_BATCH_KEYS],
                rngs={"dropout": drop, "path_drop": path},
                mutable=["batch_stats"],
            )
            loss_dict, total = loss_fn(preds)
            return total, (loss_dict, updates["batch_stats"])

        (total, (loss_dict, stats)), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=stats,
            opt_state=opt_state,
        )
        metrics = dict(loss_dict)
        metrics["total_loss"] = total
        return new_state, metrics, nxt

    return step_fn


def make_batch_fn(cfg, dataset, model_kind: str, batch_size: int, num_rois=None):
    ic = cfg.model_config.input_config

    def next_batch():
        if model_kind == "rpn":
            batch, _ = dataset.next_batch(
                batch_size, shuffle=True, model="rpn",
                pc_sample_pts=ic.pc_sample_pts,
                img_w=ic.img_dims_w, img_h=ic.img_dims_h,
            )
            return {k: batch[k] for k in RPN_BATCH_KEYS}
        batch, _ = dataset.next_batch(
            batch_size, shuffle=True, model="rcnn",
            img_w=ic.img_dims_w, img_h=ic.img_dims_h, num_rois=num_rois,
        )
        return {k: batch[k] for k in RCNN_BATCH_KEYS}

    return next_batch
