"""One-command two-stage pipeline (the README workflow end-to-end):
RPN training -> RPN eval (handoff files) -> RCNN training (warm start) ->
RCNN eval (+ KITTI AP).

    python tools/run_full_pipeline.py --rpn_config rpn_multiclass \
        --rcnn_config rcnn_multiclass --dataset_dir /data/Kitti/object \
        --output_root outputs

The stages remain separately resumable (each has its own checkpoints), this
just sequences them — the reference required four manual commands
(README.md:92-119).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np

from heterofusionrcnn_tpu.experiments import common
from heterofusionrcnn_tpu.models.rcnn import RcnnModel
from heterofusionrcnn_tpu.models.rpn import RpnModel
from heterofusionrcnn_tpu.runtime.checkpoint import CheckpointManager
from heterofusionrcnn_tpu.runtime.evaluator import RcnnEvaluator, RpnEvaluator
from heterofusionrcnn_tpu.runtime.train_state import make_rpn_train_step
from heterofusionrcnn_tpu.runtime.trainer import train


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rpn_config", default="rpn_multiclass")
    parser.add_argument("--rcnn_config", default="rcnn_multiclass")
    parser.add_argument("--dataset_dir", default=None)
    parser.add_argument("--output_root", default="outputs")
    parser.add_argument("--train_split", default="train")
    parser.add_argument("--eval_split", default="val")
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--rpn_iterations", type=int, default=None)
    parser.add_argument("--rcnn_iterations", type=int, default=None)
    parser.add_argument("--num_rois", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    # ---------------- stage 1: RPN training ---------------- #
    rpn_cfg = common.resolve_config(args.rpn_config, args.dataset_dir)
    if args.rpn_iterations:
        rpn_cfg.train_config.max_iterations = args.rpn_iterations
    ds = common.build_dataset(rpn_cfg, "train", args.train_split)
    ds.seed(args.seed)
    model, loss_fn = common.build_model(rpn_cfg, ds, "train")
    next_batch = common.make_batch_fn(
        rpn_cfg, ds, "rpn", rpn_cfg.train_config.batch_size
    )
    state = train(
        model=model, loss_fn=loss_fn, make_train_step=make_rpn_train_step,
        init_batch=next_batch(), next_batch=next_batch,
        pipeline_cfg=rpn_cfg, output_root=args.output_root,
        num_devices=args.num_devices, seed=args.seed,
    )
    rpn_step = int(state.step)
    print(f"[pipeline] RPN trained to step {rpn_step}")

    # ---------------- stage 1b: RPN eval for handoff ---------------- #
    eval_cfg = common.resolve_config(args.rpn_config, args.dataset_dir)
    eval_cfg.dataset_config.aug_list = []
    eval_cfg.model_config.path_drop_probabilities = [1.0, 1.0]
    rpn = eval_cfg.model_config.rpn_config
    rpn.rpn_test_pre_nms_size = rpn.rpn_train_pre_nms_size
    rpn.rpn_test_post_nms_size = rpn.rpn_train_post_nms_size
    rpn.rpn_test_nms_iou_thresh = rpn.rpn_train_nms_iou_thresh

    for split in dict.fromkeys([args.train_split, args.eval_split]):
        eds = common.build_dataset(eval_cfg, "val", split)
        vmodel, _ = common.build_model(
            eval_cfg, eds, "val", save_rpn_feature=True
        )
        evaluator = RpnEvaluator(
            vmodel, eds, eval_cfg, args.output_root, save_rpn_feature=True
        )
        variables = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        summary = evaluator.run_checkpoint_once(variables, rpn_step)
        print(f"[pipeline] RPN eval on {split}: recall@0.5="
              f"{summary['recall_50']:.3f} recall@0.7={summary['recall_70']:.3f}")
    pred_base = os.path.join(
        args.output_root, eval_cfg.model_config.checkpoint_name, "predictions"
    )

    # ---------------- stage 2: RCNN training ---------------- #
    rcnn_cfg = common.resolve_config(args.rcnn_config, args.dataset_dir)
    if args.rcnn_iterations:
        rcnn_cfg.train_config.max_iterations = args.rcnn_iterations
    rds = common.build_dataset(rcnn_cfg, "train", args.train_split)
    rds.seed(args.seed + 1)
    rds.proposal_dir = os.path.join(
        pred_base, "proposals_and_scores", args.train_split, str(rpn_step)
    )
    rds.proposal_iou_dir = os.path.join(
        pred_base, "proposals_iou", args.train_split, str(rpn_step)
    )
    rds.rpn_feature_dir = os.path.join(
        pred_base, "rpn_feature", args.train_split, str(rpn_step)
    )
    rmodel, rloss_fn = common.build_model(rcnn_cfg, rds, "train")
    rnext = common.make_batch_fn(
        rcnn_cfg, rds, "rcnn", rcnn_cfg.train_config.batch_size,
        num_rois=rcnn_cfg.dataset_config.mini_batch_config.roi_per_sample,
    )
    rstate = train(
        model=rmodel, loss_fn=rloss_fn,
        make_train_step=common.make_rcnn_train_step,
        init_batch=rnext(), next_batch=rnext,
        pipeline_cfg=rcnn_cfg, output_root=args.output_root,
        num_devices=args.num_devices, seed=args.seed + 1,
        init_params_from=jax.device_get(state.params),
    )
    rcnn_step = int(rstate.step)
    print(f"[pipeline] RCNN trained to step {rcnn_step}")

    # ---------------- stage 2b: RCNN eval + AP ---------------- #
    vds = common.build_dataset(rcnn_cfg, "val", args.eval_split)
    vds.proposal_dir = os.path.join(
        pred_base, "proposals_and_scores", args.eval_split, str(rpn_step)
    )
    vds.proposal_iou_dir = os.path.join(
        pred_base, "proposals_iou", args.eval_split, str(rpn_step)
    )
    vds.rpn_feature_dir = os.path.join(
        pred_base, "rpn_feature", args.eval_split, str(rpn_step)
    )
    rvmodel, _ = common.build_model(rcnn_cfg, vds, "val")
    revaluator = RcnnEvaluator(rvmodel, vds, rcnn_cfg, args.output_root)
    rvariables = {
        "params": jax.device_get(rstate.params),
        "batch_stats": jax.device_get(rstate.batch_stats),
    }
    summary = revaluator.run_checkpoint_once(
        rvariables, rcnn_step, num_rois=args.num_rois
    )
    print(f"[pipeline] done; AP: {summary.get('ap', {})}")


if __name__ == "__main__":
    main()
