"""Fused two-stage inference CLI (parity with hf/experiments/run_inference.py
plus the freeze-graph splice, scripts/freeze_graph/
combine_and_freeze_graph_fuse.py): RPN test-mode outputs feed the RCNN
directly in one process — no file handoff.

    python -m heterofusionrcnn_tpu.experiments.run_inference \
        --rpn_config rpn_multiclass --rcnn_config rcnn_multiclass \
        --rpn_checkpoint outputs/rpn_multiclass/checkpoints \
        --rcnn_checkpoint outputs/rcnn_multiclass/checkpoints \
        --data_split val --output_root outputs
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from heterofusionrcnn_tpu.experiments import common
from heterofusionrcnn_tpu.runtime.checkpoint import CheckpointManager


def build_fused_inference(rpn_cfg, rcnn_cfg, dataset):
    """A single jitted function running RPN proposals -> RCNN refinement."""
    rpn_model, _ = common.build_model(rpn_cfg, dataset, "test", save_rpn_feature=True)
    rcnn_model, _ = common.build_model(rcnn_cfg, dataset, "test")

    def fused(rpn_vars, rcnn_vars, pc, img, p2):
        rpn_out = rpn_model.apply(rpn_vars, pc, img, p2, training=False)
        proposals = rpn_out["proposals"]  # (B, post, 7)
        B, n = proposals.shape[:2]
        fts = jax.numpy.concatenate(
            [rpn_out["rpn_fts"], rpn_out["rpn_img_fts"]], axis=-1
        )
        zeros_iou = jax.numpy.zeros((B, n))
        zeros_gt = jax.numpy.zeros((B, n, 8))
        shared_map = (
            rpn_out["img_feature_map"]
            if rcnn_cfg.model_config.rcnn_config.rcnn_use_rpn_img_feature_map
            else None
        )
        rcnn_out = rcnn_model.apply(
            rcnn_vars,
            proposals,
            zeros_iou,
            zeros_gt,
            rpn_out["rpn_pts"],
            rpn_out["rpn_intensity"][..., 0],
            rpn_out["foreground_mask"].astype(jax.numpy.float32),
            fts,
            img,
            p2,
            training=False,
            img_feature_map=shared_map,
        )
        return {
            "proposals": proposals,
            "proposal_scores": rpn_out["proposal_scores"],
            "final_boxes": rcnn_out["final_boxes"],
            "final_scores": rcnn_out["final_scores"],
            "final_classes": rcnn_out["final_classes"],
            "final_valid": rcnn_out["final_valid"],
            "num_final": rcnn_out["num_boxes_before_padding"],
        }

    return jax.jit(fused), rpn_model, rcnn_model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rpn_config", default="rpn_multiclass")
    parser.add_argument("--rcnn_config", default="rcnn_multiclass")
    parser.add_argument("--rpn_checkpoint", required=True)
    parser.add_argument("--rcnn_checkpoint", required=True)
    parser.add_argument("--data_split", default="val")
    parser.add_argument("--dataset_dir", default=None)
    parser.add_argument("--output_root", default="outputs")
    parser.add_argument("--shared_img_feature", type=int, default=None,
                        choices=(0, 1),
                        help="override rcnn_use_rpn_img_feature_map: 1 = the "
                             "RCNN crops stage-1's image feature map (one "
                             "VGG pass per frame), 0 = reference-style "
                             "recompute (rcnn_model.py:124-202)")
    parser.add_argument("--img_downsample", type=int, default=None,
                        help="override the image-extractor downsample factor")
    parser.add_argument("--kitti_eval", action="store_true",
                        help="convert predictions to KITTI format and run "
                             "the native C++ evaluator (prints AP)")
    args = parser.parse_args()

    rpn_cfg = common.resolve_config(args.rpn_config, args.dataset_dir)
    rcnn_cfg = common.resolve_config(args.rcnn_config, args.dataset_dir)
    rpn_cfg.dataset_config.aug_list = []
    rcnn_cfg.model_config.path_drop_probabilities = [1.0, 1.0]
    rpn_cfg.model_config.path_drop_probabilities = [1.0, 1.0]
    if args.shared_img_feature is not None:
        rcnn_cfg.model_config.rcnn_config.rcnn_use_rpn_img_feature_map = bool(
            args.shared_img_feature
        )
    if args.img_downsample is not None:
        for c in (rpn_cfg, rcnn_cfg):
            c.model_config.layers_config.img_vgg_pyr.downsample = (
                args.img_downsample
            )

    dataset = common.build_dataset(rpn_cfg, "test", args.data_split)
    fused, rpn_model, rcnn_model = build_fused_inference(
        rpn_cfg, rcnn_cfg, dataset
    )

    def load_vars(ckpt_dir):
        mgr = CheckpointManager(ckpt_dir)
        step = mgr.latest_step()
        restored = mgr.restore_raw(step)
        mgr.close()
        return (
            {"params": restored["params"], "batch_stats": restored["batch_stats"]},
            step,
        )

    rpn_vars, rpn_step = load_vars(args.rpn_checkpoint)
    rcnn_vars, rcnn_step = load_vars(args.rcnn_checkpoint)

    out_dir = os.path.join(
        args.output_root,
        rcnn_cfg.model_config.checkpoint_name,
        "predictions",
        "final_predictions_and_scores",
        args.data_split,
        f"{rpn_step}_{rcnn_step}_fused",
    )
    os.makedirs(out_dir, exist_ok=True)

    ic = rpn_cfg.model_config.input_config
    times = []
    dataset._index_in_epoch = 0
    epoch0 = dataset.epochs_completed
    while dataset.epochs_completed == epoch0:
        batch, names = dataset.next_batch(
            1, shuffle=False, model="rpn",
            pc_sample_pts=ic.pc_sample_pts,
            img_w=ic.img_dims_w, img_h=ic.img_dims_h,
        )
        t0 = time.time()
        out = jax.device_get(
            fused(
                rpn_vars, rcnn_vars,
                batch["point_cloud"], batch["image_input"],
                batch["stereo_calib_p2"],
            )
        )
        times.append(time.time() - t0)

        n = int(out["num_final"][0])
        rows = np.column_stack(
            [
                out["final_boxes"][0][:n],
                out["final_scores"][0][:n],
                out["final_classes"][0][:n],
            ]
        )
        np.savetxt(os.path.join(out_dir, names[0] + ".txt"), rows, fmt="%.5f")

    print(
        f"inference done: {len(times)} samples, "
        f"mean {np.mean(times) * 1000:.1f} ms, median "
        f"{np.median(times) * 1000:.1f} ms -> {out_dir}"
    )

    if args.kitti_eval:
        from heterofusionrcnn_tpu.runtime.kitti_writer import (
            save_predictions_in_kitti_format,
        )
        from heterofusionrcnn_tpu.runtime.native_eval import (
            run_kitti_native_eval,
        )

        predictions_root = os.path.join(
            args.output_root,
            rcnn_cfg.model_config.checkpoint_name,
            "predictions",
        )
        step_tag = f"{rpn_step}_{rcnn_step}_fused"
        kitti_dir = save_predictions_in_kitti_format(
            dataset, predictions_root, 0.1, step_tag
        )
        aps = run_kitti_native_eval(dataset.label_dir, kitti_dir)
        for key in sorted(aps):
            e, m, h = aps[key]
            print(f"AP {key}: {e:.2f} {m:.2f} {h:.2f}")


if __name__ == "__main__":
    main()
