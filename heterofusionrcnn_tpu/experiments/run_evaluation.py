"""Evaluation CLI (parity with hf/experiments/run_evaluation.py).

    python -m heterofusionrcnn_tpu.experiments.run_evaluation \
        --pipeline_config rpn_multiclass --data_split val \
        --save_rpn_feature --for_rcnn_train --output_root outputs

--save_rpn_feature writes the rpn_feature npy handoff files;
--for_rcnn_train switches the RPN NMS to the train sizes (512 proposals) so
the saved proposals feed RCNN training (reference run_evaluation.py:149-162).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from heterofusionrcnn_tpu.experiments import common
from heterofusionrcnn_tpu.runtime.checkpoint import CheckpointManager
from heterofusionrcnn_tpu.runtime.evaluator import (
    RcnnEvaluator,
    RpnEvaluator,
    repeated_checkpoint_run,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pipeline_config", required=True)
    parser.add_argument("--data_split", default="val")
    parser.add_argument("--dataset_dir", default=None)
    parser.add_argument("--output_root", default="outputs")
    parser.add_argument("--ckpt_indices", type=int, nargs="*", default=[-1],
                        help="checkpoint steps to evaluate; -1 = latest")
    parser.add_argument("--save_rpn_feature", action="store_true")
    parser.add_argument("--for_rcnn_train", action="store_true")
    parser.add_argument("--evaluate_repeatedly", action="store_true")
    parser.add_argument("--proposal_dir", default=None,
                        help="RCNN only: dir of saved RPN proposals")
    parser.add_argument("--proposal_iou_dir", default=None)
    parser.add_argument("--rpn_feature_dir", default=None)
    parser.add_argument("--num_rois", type=int, default=100)
    parser.add_argument("--eval_batch_size", type=int, default=1,
                        help="samples per eval dispatch (static shape; >1 "
                             "amortizes per-dispatch latency, outputs are "
                             "identical to batch-1)")
    args = parser.parse_args()

    cfg = common.resolve_config(args.pipeline_config, args.dataset_dir)
    # Eval runs without augmentation or path drop (run_evaluation.py:30-67).
    cfg.dataset_config.aug_list = []
    cfg.model_config.path_drop_probabilities = [1.0, 1.0]

    mode = "val" if cfg.dataset_config.has_labels else "test"
    dataset = common.build_dataset(cfg, mode, args.data_split)

    if args.for_rcnn_train:
        # Evaluate with training NMS sizes so RCNN sees 512 proposals.
        rpn = cfg.model_config.rpn_config
        rpn.rpn_test_pre_nms_size = rpn.rpn_train_pre_nms_size
        rpn.rpn_test_post_nms_size = rpn.rpn_train_post_nms_size
        rpn.rpn_test_nms_iou_thresh = rpn.rpn_train_nms_iou_thresh

    model_kind = "rpn" if cfg.model_config.model_name == "rpn_model" else "rcnn"
    model, _ = common.build_model(
        cfg, dataset, mode, save_rpn_feature=args.save_rpn_feature
    )

    if model_kind == "rcnn":
        dataset.proposal_dir = args.proposal_dir
        dataset.proposal_iou_dir = args.proposal_iou_dir
        dataset.rpn_feature_dir = args.rpn_feature_dir
        evaluator = RcnnEvaluator(
            model, dataset, cfg, args.output_root,
            eval_batch_size=args.eval_batch_size,
        )
        csv_name = "rcnn_eval.csv"
    else:
        evaluator = RpnEvaluator(
            model, dataset, cfg, args.output_root,
            save_rpn_feature=args.save_rpn_feature,
            eval_batch_size=args.eval_batch_size,
        )
        csv_name = "rpn_total_recall.csv"

    name = cfg.model_config.checkpoint_name
    ckpt_dir = f"{args.output_root}/{name}/checkpoints"
    mgr = CheckpointManager(ckpt_dir)

    def make_variables(step):
        restored = mgr.restore_raw(step)
        return {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }

    if args.evaluate_repeatedly:
        repeated_checkpoint_run(evaluator, mgr, make_variables, csv_name)
    else:
        steps = args.ckpt_indices
        if steps == [-1]:
            steps = [mgr.latest_step()]
        for step in steps:
            if step is None:
                raise SystemExit("no checkpoints found")
            variables = make_variables(step)
            if model_kind == "rcnn":
                summary = evaluator.run_checkpoint_once(
                    variables, step, num_rois=args.num_rois
                )
            else:
                summary = evaluator.run_checkpoint_once(variables, step)
            print({k: v for k, v in summary.items()})
    mgr.close()


if __name__ == "__main__":
    main()
