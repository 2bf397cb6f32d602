"""Checkpoint AP sweep (parity with the reference's all_eval.sh + plot_ap
workflow): evaluate every checkpoint of an RCNN run, write ap_summary.json
per step, then report the best checkpoints.

    python tools/run_eval_sweep.py --pipeline_config rcnn_multiclass \
        --output_root outputs --proposal_dir ... --proposal_iou_dir ... \
        --rpn_feature_dir ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from heterofusionrcnn_tpu.experiments import common
from heterofusionrcnn_tpu.runtime.checkpoint import CheckpointManager
from heterofusionrcnn_tpu.runtime.evaluator import RcnnEvaluator, evaluated_steps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pipeline_config", required=True)
    parser.add_argument("--data_split", default="val")
    parser.add_argument("--dataset_dir", default=None)
    parser.add_argument("--output_root", default="outputs")
    parser.add_argument("--proposal_dir", required=True)
    parser.add_argument("--proposal_iou_dir", required=True)
    parser.add_argument("--rpn_feature_dir", required=True)
    parser.add_argument("--num_rois", type=int, default=100)
    args = parser.parse_args()

    cfg = common.resolve_config(args.pipeline_config, args.dataset_dir)
    cfg.dataset_config.aug_list = []
    cfg.model_config.path_drop_probabilities = [1.0, 1.0]

    dataset = common.build_dataset(cfg, "val", args.data_split)
    dataset.proposal_dir = args.proposal_dir
    dataset.proposal_iou_dir = args.proposal_iou_dir
    dataset.rpn_feature_dir = args.rpn_feature_dir

    model, _ = common.build_model(cfg, dataset, "val")
    evaluator = RcnnEvaluator(model, dataset, cfg, args.output_root)

    name = cfg.model_config.checkpoint_name
    mgr = CheckpointManager(f"{args.output_root}/{name}/checkpoints")
    done = evaluated_steps(evaluator.logs_dir, "rcnn_eval.csv")
    best = []
    for step in mgr.all_steps():
        if step in done:
            continue
        restored = mgr.restore_raw(step)
        variables = {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
        summary = evaluator.run_checkpoint_once(
            variables, step, num_rois=args.num_rois
        )
        ap = summary.get("ap", {}).get("car_detection_3d", (0, 0, 0))[1]
        best.append((step, ap))
        print(f"step {step}: car 3D AP moderate = {ap:.2f}")
    mgr.close()

    best.sort(key=lambda kv: -kv[1])
    print("top checkpoints (car 3D AP moderate):")
    for step, ap in best[:5]:
        print(f"  step {step}: {ap:.2f}")


if __name__ == "__main__":
    main()
