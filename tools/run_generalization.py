"""Generalization evidence: train on a split, evaluate EVERY checkpoint on a
DISJOINT val split, and emit recall / AP curves vs training step.

The round-2 full-scale proof trained and evaluated on the same `trainval`
split (an overfit demo). This tool produces the val-split curves the
reference workflow would show (reference: evaluator.py:649-724 recall CSVs +
all_eval.sh checkpoint sweep):

    python tools/run_generalization.py --output_root outputs/gen \
        --rpn_iterations 3000 --rcnn_iterations 3000 --checkpoint_interval 300

Artifacts (under <output_root>/generalization/):
  rpn_recall_curve.csv   step, recall@0.5, recall@0.7, seg_acc   (val split)
  rcnn_ap_curve.csv      step, car/ped/cyc 3D-moderate AP        (val split)
  summary.json           final train-vs-val numbers + the gap
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import csv
import json

import jax

from heterofusionrcnn_tpu.experiments import common
from heterofusionrcnn_tpu.runtime.checkpoint import CheckpointManager
from heterofusionrcnn_tpu.runtime.evaluator import RcnnEvaluator, RpnEvaluator
from heterofusionrcnn_tpu.runtime.train_state import make_rpn_train_step
from heterofusionrcnn_tpu.runtime.trainer import train


def _write_csv(path, header, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def _read_csv_rows(path):
    """Data rows of an existing curve CSV (empty list if absent) — the
    crash-resume ledger for the checkpoint sweeps."""
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [row for row in csv.reader(f)][1:]


def _val_mode_cfg(name, dataset_dir, train_nms=False):
    cfg = common.resolve_config(name, dataset_dir)
    cfg.dataset_config.aug_list = []
    cfg.model_config.path_drop_probabilities = [1.0, 1.0]
    if train_nms:
        # Handoff proposals use the train-time NMS sizes so the RCNN sees the
        # same candidate distribution it trains on (run_full_pipeline.py).
        rpn = cfg.model_config.rpn_config
        rpn.rpn_test_pre_nms_size = rpn.rpn_train_pre_nms_size
        rpn.rpn_test_post_nms_size = rpn.rpn_train_post_nms_size
        rpn.rpn_test_nms_iou_thresh = rpn.rpn_train_nms_iou_thresh
    return cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rpn_config", default="rpn_multiclass")
    parser.add_argument("--rcnn_config", default="rcnn_multiclass")
    parser.add_argument("--dataset_dir", default=None)
    parser.add_argument("--output_root", default="outputs/gen")
    parser.add_argument("--train_split", default="train")
    parser.add_argument("--eval_split", default="val")
    parser.add_argument("--rpn_iterations", type=int, default=3000)
    parser.add_argument("--rcnn_iterations", type=int, default=3000)
    parser.add_argument("--checkpoint_interval", type=int, default=300)
    parser.add_argument("--num_rois", type=int, default=100)
    parser.add_argument("--img_downsample", type=int, default=1,
                        help="image-extractor downsample factor (the half-res "
                             "A/B arm trains AND evaluates at this factor)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval_batch_size", type=int, default=1,
                        help="samples per eval dispatch (outputs identical "
                             "to batch-1; amortizes tunnel latency)")
    parser.add_argument("--resume_from_handoff", action="store_true",
                        help="skip RPN training / recall sweep / handoff and "
                             "run only the RCNN stages, reusing the latest "
                             "RPN checkpoint and the existing handoff files "
                             "under <output_root>/handoff")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu); needed because "
                             "the axon TPU plugin overrides JAX_PLATFORMS")
    args = parser.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    def _apply_ds(cfg):
        cfg.model_config.layers_config.img_vgg_pyr.downsample = args.img_downsample
        return cfg

    gen_dir = os.path.join(args.output_root, "generalization")
    os.makedirs(gen_dir, exist_ok=True)

    rpn_cfg = _apply_ds(common.resolve_config(args.rpn_config, args.dataset_dir))
    rpn_cfg.train_config.max_iterations = args.rpn_iterations
    rpn_cfg.train_config.checkpoint_interval = args.checkpoint_interval
    name = rpn_cfg.model_config.checkpoint_name
    handoff_root = os.path.join(args.output_root, "handoff")

    if args.resume_from_handoff:
        # Stages 1/1b/1c already ran: reuse the latest RPN checkpoint (for
        # the RCNN warm start), the committed recall curve, and the handoff
        # files on disk.
        mgr = CheckpointManager(
            os.path.join(args.output_root, name, "checkpoints")
        )
        rpn_step = mgr.latest_step()
        restored = mgr.restore_raw(rpn_step)
        final_vars = {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
        mgr.close()
        curve = []
        curve_path = os.path.join(gen_dir, "rpn_recall_curve.csv")
        if os.path.exists(curve_path):
            with open(curve_path) as f:
                curve = [row for row in csv.reader(f)][1:]
        print(f"[gen] resume: RPN step {rpn_step}, handoff at {handoff_root}",
              flush=True)
    else:
        # ------------- stage 1: RPN training on the train split ---------- #
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
            seed=args.seed,
        )
        rpn_step = int(state.step)
        del state
        print(f"[gen] RPN trained to step {rpn_step}", flush=True)

        # ------------- stage 1b: recall curve on the VAL split ----------- #
        eval_cfg = _apply_ds(_val_mode_cfg(args.rpn_config, args.dataset_dir))
        eds = common.build_dataset(eval_cfg, "val", args.eval_split)
        vmodel, _ = common.build_model(eval_cfg, eds, "val")
        evaluator = RpnEvaluator(
            vmodel, eds, eval_cfg, args.output_root,
            eval_batch_size=args.eval_batch_size,
        )
        mgr = CheckpointManager(
            os.path.join(args.output_root, name, "checkpoints")
        )
        # Crash-resume (round-5 OOM lesson): steps already in the CSV are
        # skipped, and the CSV is rewritten after every checkpoint so a kill
        # mid-sweep loses at most one checkpoint's eval.
        curve_path = os.path.join(gen_dir, "rpn_recall_curve.csv")
        curve = _read_csv_rows(curve_path)
        done_steps = {int(float(r[0])) for r in curve}
        for step in mgr.all_steps():
            if step in done_steps:
                continue
            restored = mgr.restore_raw(step)
            variables = {
                "params": restored["params"],
                "batch_stats": restored["batch_stats"],
            }
            s = evaluator.run_checkpoint_once(variables, step)
            curve.append(
                [step, round(s["recall_50"], 4), round(s["recall_70"], 4),
                 round(s.get("avg_seg_acc", 0.0), 4)]
            )
            curve.sort(key=lambda r: int(float(r[0])))
            print(f"[gen] RPN step {step}: val recall@0.5={s['recall_50']:.3f} "
                  f"@0.7={s['recall_70']:.3f}", flush=True)
            _write_csv(
                curve_path,
                ["step", "recall_50", "recall_70", "seg_acc"], curve,
            )

        # ------------- stage 1c: handoff from the final RPN -------------- #
        hand_cfg = _apply_ds(
            _val_mode_cfg(args.rpn_config, args.dataset_dir, train_nms=True)
        )
        final_vars = {
            "params": mgr.restore_raw(rpn_step)["params"],
            "batch_stats": mgr.restore_raw(rpn_step)["batch_stats"],
        }
        mgr.close()
        # Handoff gets its own root: the recall sweep above already wrote
        # this step's proposal files under args.output_root, and the
        # evaluator's sample-level resume would otherwise skip every sample
        # (leaving the rpn_feature npys the RCNN stage needs unwritten).
        for split in dict.fromkeys([args.train_split, args.eval_split]):
            # Crash-resume: a finished split leaves a marker; the evaluator's
            # own sample-level resume handles a split killed halfway.
            marker = os.path.join(
                handoff_root, f".done_{split}_{rpn_step}"
            )
            if os.path.exists(marker):
                print(f"[gen] handoff {split}: done (marker)", flush=True)
                continue
            hds = common.build_dataset(hand_cfg, "val", split)
            hmodel, _ = common.build_model(
                hand_cfg, hds, "val", save_rpn_feature=True
            )
            hev = RpnEvaluator(
                hmodel, hds, hand_cfg, handoff_root, save_rpn_feature=True,
                eval_batch_size=args.eval_batch_size,
            )
            s = hev.run_checkpoint_once(final_vars, rpn_step)
            with open(marker, "w") as f:
                f.write("done\n")
            print(f"[gen] handoff {split}: recall@0.5={s['recall_50']:.3f}",
                  flush=True)
    pred_base = os.path.join(handoff_root, name, "predictions")

    def handoff_dirs(split):
        return {
            "proposal_dir": os.path.join(
                pred_base, "proposals_and_scores", split, str(rpn_step)),
            "proposal_iou_dir": os.path.join(
                pred_base, "proposals_iou", split, str(rpn_step)),
            "rpn_feature_dir": os.path.join(
                pred_base, "rpn_feature", split, str(rpn_step)),
        }

    # ---------------- stage 2: RCNN training on the train split ---------- #
    rcnn_cfg = _apply_ds(common.resolve_config(args.rcnn_config, args.dataset_dir))
    rcnn_cfg.train_config.max_iterations = args.rcnn_iterations
    rcnn_cfg.train_config.checkpoint_interval = args.checkpoint_interval
    rds = common.build_dataset(rcnn_cfg, "train", args.train_split)
    rds.seed(args.seed + 1)
    for attr, path in handoff_dirs(args.train_split).items():
        setattr(rds, attr, path)
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
        seed=args.seed + 1, init_params_from=jax.device_get(final_vars["params"]),
    )
    rcnn_step = int(rstate.step)
    del rstate
    print(f"[gen] RCNN trained to step {rcnn_step}", flush=True)

    # -------------- stage 2b: AP curve on the VAL split ------------------ #
    rv_cfg = _apply_ds(_val_mode_cfg(args.rcnn_config, args.dataset_dir))

    def eval_split_ckpts(split, steps, curve_path=None):
        vds = common.build_dataset(rv_cfg, "val", split)
        for attr, path in handoff_dirs(split).items():
            setattr(vds, attr, path)
        rvmodel, _ = common.build_model(rv_cfg, vds, "val")
        rev = RcnnEvaluator(
            rvmodel, vds, rv_cfg, args.output_root,
            eval_batch_size=args.eval_batch_size,
        )
        out = []
        for step in steps:
            # Crash-resume: every evaluated step leaves a full-AP JSON
            # ledger; on relaunch it is loaded instead of re-evaluated.
            ap_ledger = os.path.join(
                gen_dir, f"ap_{split}_{step}.json"
            )
            if os.path.exists(ap_ledger):
                with open(ap_ledger) as f:
                    ap = {k: tuple(v) for k, v in json.load(f).items()}
            else:
                restored = rmgr.restore_raw(step)
                variables = {
                    "params": restored["params"],
                    "batch_stats": restored["batch_stats"],
                }
                s = rev.run_checkpoint_once(
                    variables, step, num_rois=args.num_rois
                )
                ap = s.get("ap", {})
                with open(ap_ledger, "w") as f:
                    json.dump({k: list(v) for k, v in ap.items()}, f)
            row = [step] + [
                round(ap.get(k, (0, 0, 0))[1], 2)
                for k in ("car_detection_3d", "pedestrian_detection_3d",
                          "cyclist_detection_3d")
            ]
            out.append((row, ap))
            print(f"[gen] RCNN step {step} [{split}]: car3D-mod={row[1]} "
                  f"ped3D-mod={row[2]} cyc3D-mod={row[3]}", flush=True)
            if curve_path:
                # Rewrite the curve after EVERY checkpoint so a crash or a
                # wall-clock kill cannot lose the whole sweep (round-5
                # lesson: the 10k run's artifacts died with the process).
                _write_csv(
                    curve_path,
                    ["step", "car_3d_moderate", "ped_3d_moderate",
                     "cyc_3d_moderate"],
                    [r for r, _ in out],
                )
        return out

    rname = rcnn_cfg.model_config.checkpoint_name
    rmgr = CheckpointManager(os.path.join(args.output_root, rname, "checkpoints"))
    val_curve = eval_split_ckpts(
        args.eval_split, list(rmgr.all_steps()),
        curve_path=os.path.join(gen_dir, "rcnn_ap_curve.csv"),
    )

    # Final-step train-split AP: quantifies the train-vs-val gap.
    train_final = eval_split_ckpts(args.train_split, [rcnn_step])
    rmgr.close()

    summary = {
        "train_split": args.train_split,
        "eval_split": args.eval_split,
        "rpn_steps": rpn_step,
        "rcnn_steps": rcnn_step,
        "val_recall_curve": curve,
        "val_ap_final": val_curve[-1][1] if val_curve else {},
        "train_ap_final": train_final[0][1] if train_final else {},
    }
    with open(os.path.join(gen_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=lambda o: list(o))
    print(f"[gen] wrote {gen_dir}/summary.json", flush=True)


if __name__ == "__main__":
    main()
