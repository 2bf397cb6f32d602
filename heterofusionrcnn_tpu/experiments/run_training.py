"""Training CLI (parity with hf/experiments/run_training.py).

    python -m heterofusionrcnn_tpu.experiments.run_training \
        --pipeline_config rpn_multiclass --data_split train \
        --dataset_dir /path/to/Kitti/object --output_root outputs

The reference's `mpi_run_training.sh` multi-GPU launch maps to
`--num_devices N` on a single host (mesh data parallelism) or
`jax.distributed.initialize` for multi-host (set JAX_COORDINATOR_ADDRESS
etc. in the environment; all hosts run the same command).
"""

from __future__ import annotations

import argparse

from heterofusionrcnn_tpu.experiments import common
from heterofusionrcnn_tpu.runtime.train_state import make_rpn_train_step
from heterofusionrcnn_tpu.runtime.trainer import train


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pipeline_config", required=True,
                        help="preset name or JSON config path")
    parser.add_argument("--data_split", default=None)
    parser.add_argument("--dataset_dir", default=None)
    parser.add_argument("--output_root", default="outputs")
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--max_iterations", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile_steps", default=None,
                        help="START:STOP step range captured with "
                             "jax.profiler into <logs>/profile")
    parser.add_argument("--warm_start_from", default=None,
                        help="checkpoint dir for partial weight transfer "
                             "(e.g. RPN -> RCNN)")
    args = parser.parse_args()

    cfg = common.resolve_config(args.pipeline_config, args.dataset_dir)
    if args.max_iterations:
        cfg.train_config.max_iterations = args.max_iterations

    dataset = common.build_dataset(cfg, "train", args.data_split)
    dataset.seed(args.seed)
    model, loss_fn = common.build_model(cfg, dataset, "train")

    model_kind = "rpn" if cfg.model_config.model_name == "rpn_model" else "rcnn"
    num_rois = cfg.dataset_config.mini_batch_config.roi_per_sample
    next_batch = common.make_batch_fn(
        cfg, dataset, model_kind, cfg.train_config.batch_size, num_rois
    )

    init_params_from = None
    if args.warm_start_from:
        import jax

        from heterofusionrcnn_tpu.runtime.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.warm_start_from)
        init_params_from = mgr.restore_raw()["params"]
        mgr.close()

    step_factory = (
        make_rpn_train_step if model_kind == "rpn" else common.make_rcnn_train_step
    )

    profile_steps = None
    if args.profile_steps:
        a, b = args.profile_steps.split(":")
        profile_steps = (int(a), int(b))

    train(
        model=model,
        loss_fn=loss_fn,
        make_train_step=step_factory,
        init_batch=next_batch(),
        next_batch=next_batch,
        pipeline_cfg=cfg,
        output_root=args.output_root,
        num_devices=args.num_devices,
        seed=args.seed,
        init_params_from=init_params_from,
        profile_steps=profile_steps,
    )


if __name__ == "__main__":
    main()
