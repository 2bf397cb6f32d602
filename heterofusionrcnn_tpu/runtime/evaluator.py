"""Checkpoint evaluator (parity with hf/core/evaluator.py).

Runs a val/test epoch for one checkpoint:
  RPN:  saves proposals_and_scores/<split>/<step>/<sample>.txt (rows box+score,
        %.3f), rpn_feature/<...>.npy ([pts, intensity, fg_mask, pc_fts,
        img_fts]), proposals_iou/<...>.txt ((n, m_gt) 3D-IoU table), and
        aggregates seg-accuracy / recall@{0.5,0.7} CSVs.
  RCNN: saves final_predictions_and_scores/<split>/<step>/<sample>.txt (rows
        x y z l w h ry score cls, %.5f) and converts them to KITTI-format
        txts for the offline AP evaluator.

Also implements the checkpoint-watching loops (run_latest_checkpoints /
repeated_checkpoint_run) with the skip-evaluated ledger.

TPU addition: `eval_batch_size > 1` runs several samples per dispatch
(static shapes, last batch padded by repetition) — outputs and per-sample
loss/metric ledgers are identical to batch-1 (losses are vmapped
per-sample), but the per-dispatch latency is amortized, which dominates
eval wall-clock on a tunneled device. The reference evaluates strictly one
sample per session.run (evaluator.py:218-312).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Optional

import jax
import numpy as np

from heterofusionrcnn_tpu.runtime.kitti_writer import save_predictions_in_kitti_format
from heterofusionrcnn_tpu.utils.metrics import compute_recall_iou


def _append_csv(path, header, row):
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(header)
        w.writerow(row)


def _append_ledger_row(path, values, fmt):
    """Append one row in the reference's np.savetxt CSV format
    (evaluator.py:683-726 — '%d, %.5f, ...', no header)."""
    with open(path, "ba") as fp:
        np.savetxt(fp, np.reshape(np.asarray(values, np.float64), (1, -1)), fmt=fmt)


def _iter_eval_batches(ds, batch_size, model, skip_name, **load_kwargs):
    """Deterministic epoch sweep over `ds.sample_list` in index order,
    collated to a STATIC batch size (TPU addition; the reference evaluates
    strictly one sample per session.run, evaluator.py:218-312 — batching
    amortizes the per-dispatch latency, which dominates eval wall-clock on
    a tunneled device).

    Samples for which `skip_name(name)` is True are skipped before loading
    (the reference's skip-existing resume, evaluator.py:218-231). The final
    partial batch is padded by repeating its last sample; padded rows are
    marked False in the yielded `valid` mask and must not be written or
    counted by the caller.

    Yields (batch_dict, names, valid) with len(names) == batch_size.
    """
    buf = []
    idx = 0
    n = ds.num_samples
    while True:
        while idx < n and len(buf) < batch_size:
            want = []
            while idx < n and len(buf) + len(want) < batch_size:
                if not skip_name(ds.sample_list[idx].name):
                    want.append(idx)
                idx += 1
            if want:
                # load_samples may return fewer dicts than asked (label-less
                # samples are skipped by the loaders) — just keep filling.
                buf.extend(ds.load_samples(np.asarray(want), model=model, **load_kwargs))
        if not buf:
            return
        take = buf[:batch_size]
        buf = buf[batch_size:]
        n_valid = len(take)
        while len(take) < batch_size:
            take.append(take[-1])
        batch, names = ds.collate_batch(take)
        valid = np.zeros(batch_size, bool)
        valid[:n_valid] = True
        yield batch, names, valid


def _time_stats(times):
    """min/max/mean/median inference-time stats (reference
    evaluator_utils.print_inference_time_statistics :222-238)."""
    if not times:
        return {"min": 0.0, "max": 0.0, "mean": 0.0, "median": 0.0}
    a = np.asarray(times)
    return {
        "min": float(np.min(a)),
        "max": float(np.max(a)),
        "mean": float(np.mean(a)),
        "median": float(np.median(a)),
    }


# Training-target keys produced by the models in val mode: consumed by the
# in-jit loss and stripped from the host transfer (they are large one-hots).
_RPN_LOSS_KEYS = ("seg_gt_one_hot", "cls_preds", "cls_gts", "reg_preds", "reg_gts")
_RCNN_LOSS_KEYS = (
    "cls_logits", "cls_gt_one_hot", "pos_neg_cls_mask", "pos_reg_mask",
    "mb_cls_preds", "mb_cls_gts", "mb_reg_preds", "mb_reg_gts",
)


class RpnEvaluator:
    """Stage-1 evaluator: proposal generation + metrics + RCNN handoff files."""

    def __init__(
        self,
        model,
        dataset,
        pipeline_cfg,
        output_root: str,
        save_rpn_feature: bool = False,
        eval_batch_size: int = 1,
    ):
        self.model = model
        self.dataset = dataset
        self.cfg = pipeline_cfg
        self.save_rpn_feature = save_rpn_feature
        self.eval_batch_size = max(int(eval_batch_size), 1)
        name = pipeline_cfg.model_config.checkpoint_name
        self.predictions_dir = os.path.join(output_root, name, "predictions")
        self.logs_dir = os.path.join(output_root, name, "logs")
        os.makedirs(self.predictions_dir, exist_ok=True)
        os.makedirs(self.logs_dir, exist_ok=True)

        self._has_labels = getattr(dataset, "has_labels", True)
        # Val mode carries the loss targets: evaluate the loss in-jit and
        # strip the (large) target tensors from the host transfer — the
        # reference evaluates losses at eval time and appends per-checkpoint
        # ledgers (evaluator.py:623-797).
        self._with_loss = self._has_labels and getattr(model, "mode", "") == "val"
        if self._with_loss:
            import jax.numpy as jnp

            from heterofusionrcnn_tpu.models.rpn import rpn_loss

            def apply_and_loss(variables, pc, img, p2, seg, reg, boxes):
                preds = model.apply(
                    variables, pc, img, p2, seg, reg, boxes, training=False
                )
                # Per-SAMPLE losses (vmap of the batch loss at B=1): keeps
                # the ledger semantics of the reference's one-sample-per-run
                # eval (evaluator.py:683-726) under any eval batch size.
                loss_in = {k: preds[k] for k in (
                    "foreground_mask", "seg_softmax", "seg_gt_one_hot",
                    "cls_preds", "cls_gts", "reg_preds", "reg_gts",
                )}
                loss_dict, total = jax.vmap(
                    lambda p: rpn_loss(
                        jax.tree.map(lambda x: x[None], p),
                        pipeline_cfg.model_config,
                    )
                )(loss_in)
                loss_dict = dict(loss_dict, rpn_total_loss=total)  # (B,) each
                keep = {
                    k: v for k, v in preds.items() if k not in _RPN_LOSS_KEYS
                }
                # Per-sample seg accuracy (same formula as the model's
                # batch-mean metric, rpn.py — equal at B=1).
                keep["seg_accuracy"] = jnp.mean(
                    (preds["seg_preds"] == seg.astype(jnp.int32)).astype(
                        jnp.float32
                    ),
                    axis=1,
                )
                return keep, loss_dict

            self._apply = jax.jit(apply_and_loss)
        elif self._has_labels:
            self._apply = jax.jit(
                lambda variables, pc, img, p2, seg, reg, boxes: (
                    model.apply(
                        variables, pc, img, p2, seg, reg, boxes, training=False
                    ),
                    None,
                )
            )
        else:
            # Test split: no GT — proposals only (reference test-mode eval).
            self._apply = jax.jit(
                lambda variables, pc, img, p2, seg, reg, boxes: (
                    model.apply(variables, pc, img, p2, training=False),
                    None,
                )
            )

    def run_checkpoint_once(self, variables, global_step) -> dict:
        ds = self.dataset
        ic = self.cfg.model_config.input_config
        split = ds.data_split
        base = self.predictions_dir

        prop_dir = os.path.join(base, "proposals_and_scores", split, str(global_step))
        os.makedirs(prop_dir, exist_ok=True)
        iou_dir = os.path.join(base, "proposals_iou", split, str(global_step))
        os.makedirs(iou_dir, exist_ok=True)
        if self.save_rpn_feature:
            feat_dir = os.path.join(base, "rpn_feature", split, str(global_step))
            os.makedirs(feat_dir, exist_ok=True)

        stats = {
            "seg_acc": [],
            "recall_50": 0,
            "recall_70": 0,
            "num_gt": 0,
            "num_proposals": [],
            "iou2d": [],
            "iou3d": [],
            "angle_res": 0.0,
        }
        losses = {}
        infer_times = []

        def _done(name):
            # Crude resumability (evaluator.py:218-231): skip samples whose
            # output already exists from an interrupted run.
            return os.path.exists(os.path.join(prop_dir, name + ".txt"))

        for batch, names, valid in _iter_eval_batches(
            ds,
            self.eval_batch_size,
            "rpn",
            _done,
            pc_sample_pts=ic.pc_sample_pts,
            img_w=ic.img_dims_w,
            img_h=ic.img_dims_h,
        ):
            t0 = time.time()
            preds, loss_dict = self._apply(
                variables,
                batch["point_cloud"],
                batch["image_input"],
                batch["stereo_calib_p2"],
                batch["label_seg"],
                batch["label_reg"],
                batch["label_boxes_3d"],
            )
            preds = jax.device_get(preds)
            per_sample_time = (time.time() - t0) / len(valid)
            loss_host = (
                jax.device_get(loss_dict) if loss_dict is not None else None
            )

            for b in np.flatnonzero(valid):
                infer_times.append(per_sample_time)
                if loss_host is not None:
                    for k, v in loss_host.items():
                        losses.setdefault(k, []).append(
                            float(np.asarray(v)[b])
                        )

                name = names[b]
                n_valid = int(preds["num_proposals_before_padding"][b])
                proposals = preds["proposals"][b][:n_valid]
                scores = preds["proposal_scores"][b][:n_valid]
                np.savetxt(
                    os.path.join(prop_dir, name + ".txt"),
                    np.hstack([proposals, scores[:, None]]),
                    fmt="%.3f",
                )

                if self._has_labels:
                    m = int(batch["label_num_boxes"][b])
                    label_boxes = batch["label_boxes_3d"][b][:m]
                    label_cls = batch["label_classes"][b][:m]
                    iou3d_table = preds["proposal_iou3d"][b][:n_valid, :m]
                    iou2d_table = preds["proposal_iou2d"][b][:n_valid, :m]
                    np.savetxt(os.path.join(iou_dir, name + ".txt"), iou3d_table)

                    r50, r70, iou2ds, iou3ds, iou3ds_gt_boxes, _, _ = (
                        compute_recall_iou(
                            proposals, label_boxes, label_cls, iou2d_table,
                            iou3d_table,
                        )
                    )
                    stats["recall_50"] += r50
                    stats["recall_70"] += r70
                    stats["num_gt"] += m
                    stats["iou2d"].extend(iou2ds.tolist())
                    stats["iou3d"].extend(iou3ds.tolist())
                    # Angle residual vs the best-IoU GT (reference
                    # evaluator.py:1047-1049).
                    if n_valid > 0:
                        stats["angle_res"] += float(
                            np.sum(np.abs(proposals[:, 6] - iou3ds_gt_boxes[:, 6]))
                        )
                if "seg_accuracy" in preds:
                    acc = np.asarray(preds["seg_accuracy"])
                    stats["seg_acc"].append(
                        float(acc[b]) if acc.ndim else float(acc)
                    )
                stats["num_proposals"].append(n_valid)

                if self.save_rpn_feature:
                    arr = np.hstack(
                        [
                            preds["rpn_pts"][b],
                            preds["rpn_intensity"][b].reshape(-1, 1),
                            preds["foreground_mask"][b].reshape(-1, 1).astype(np.float32),
                            preds["rpn_fts"][b],
                            preds["rpn_img_fts"][b],
                        ]
                    )
                    np.save(os.path.join(feat_dir, name + ".npy"), arr)

        tstats = _time_stats(infer_times)
        num_proposals_total = max(int(np.sum(stats["num_proposals"])), 1)
        summary = {
            "global_step": int(global_step),
            "avg_seg_acc": float(np.mean(stats["seg_acc"])) if stats["seg_acc"] else 0.0,
            "recall_50": stats["recall_50"] / max(stats["num_gt"], 1),
            "recall_70": stats["recall_70"] / max(stats["num_gt"], 1),
            "avg_num_proposals": float(np.mean(stats["num_proposals"])),
            "avg_iou2d": float(np.mean(stats["iou2d"])) if stats["iou2d"] else 0.0,
            "avg_iou3d": float(np.mean(stats["iou3d"])) if stats["iou3d"] else 0.0,
            "avg_angle_res": stats["angle_res"] / num_proposals_total,
            "avg_inference_time": tstats["mean"],
            "inference_time_stats": tstats,
        }
        print(
            "Inference time: Min: {min:.5f} Max: {max:.5f} Mean: {mean:.5f} "
            "Median: {median:.5f}".format(**tstats)
        )
        _append_csv(
            os.path.join(self.logs_dir, "rpn_total_recall.csv"),
            [k for k in summary if k != "inference_time_stats"],
            [v for k, v in summary.items() if k != "inference_time_stats"],
        )

        # Reference-format per-checkpoint ledgers at the predictions base dir
        # (evaluator.py:683-726): rpn_avg_losses.csv, rpn_avg_seg_acc.csv,
        # rpn_total_recall.csv.
        if losses:
            n_samp = max(len(losses["rpn_total_loss"]), 1)
            avg = {k: sum(v) / n_samp for k, v in losses.items()}
            summary["avg_losses"] = avg
            _append_ledger_row(
                os.path.join(self.predictions_dir, "rpn_avg_losses.csv"),
                [global_step, avg["rpn_seg_loss"], avg["rpn_bin_cls_loss"],
                 avg["rpn_reg_loss"], avg["rpn_total_loss"]],
                "%d, %.5f, %.5f, %.5f, %5f",
            )
            print(
                "Step {}: Average RPN Losses: segmentation {:.3f}, bin_cls "
                "{:.3f}, regression {:.3f}, total {:.3f}".format(
                    global_step, avg["rpn_seg_loss"], avg["rpn_bin_cls_loss"],
                    avg["rpn_reg_loss"], avg["rpn_total_loss"],
                )
            )
        if stats["seg_acc"]:
            _append_ledger_row(
                os.path.join(self.predictions_dir, "rpn_avg_seg_acc.csv"),
                [global_step, summary["avg_seg_acc"]],
                "%d, %.5f",
            )
        if self._has_labels:
            _append_ledger_row(
                os.path.join(self.predictions_dir, "rpn_total_recall.csv"),
                [global_step, summary["recall_50"], summary["recall_70"],
                 summary["avg_num_proposals"], summary["avg_iou2d"],
                 summary["avg_iou3d"], summary["avg_angle_res"]],
                "%d, %.5f, %.5f, %.5f, %.5f, %.5f, %.5f",
            )
        return summary


class RcnnEvaluator:
    """Stage-2 evaluator: final predictions + KITTI-format conversion."""

    def __init__(
        self, model, dataset, pipeline_cfg, output_root: str,
        eval_batch_size: int = 1,
    ):
        self.model = model
        self.dataset = dataset
        self.cfg = pipeline_cfg
        self.eval_batch_size = max(int(eval_batch_size), 1)
        name = pipeline_cfg.model_config.checkpoint_name
        self.predictions_dir = os.path.join(output_root, name, "predictions")
        self.logs_dir = os.path.join(output_root, name, "logs")
        os.makedirs(self.predictions_dir, exist_ok=True)
        os.makedirs(self.logs_dir, exist_ok=True)

        self._with_loss = getattr(dataset, "has_labels", True) and (
            getattr(model, "mode", "") == "val"
        )
        if self._with_loss:
            import jax.numpy as jnp

            from heterofusionrcnn_tpu.models.rcnn import rcnn_loss

            def apply_and_loss(variables, *args):
                preds = model.apply(variables, *args, training=False)
                # The RCNN flattens batch x rois to one leading axis
                # (rcnn.py N = B * n, batch-major); reshape the loss inputs
                # back to (B, n, ...) and vmap for per-SAMPLE losses —
                # ledger semantics identical to batch-1 eval at any batch.
                b, n = args[0].shape[:2]  # rpn_roi (B, n, 7)
                loss_in = {k: preds[k] for k in (
                    "cls_logits", "cls_gt_one_hot", "pos_neg_cls_mask",
                    "pos_reg_mask", "mb_cls_preds", "mb_cls_gts",
                    "mb_reg_preds", "mb_reg_gts",
                )}
                loss_in = jax.tree.map(
                    lambda x: x.reshape((b, n) + x.shape[1:]), loss_in
                )
                loss_dict, total = jax.vmap(
                    lambda p: rcnn_loss(p, pipeline_cfg.model_config)
                )(loss_in)
                loss_dict = dict(loss_dict, rcnn_total_loss=total)  # (B,)
                keep = {
                    k: v for k, v in preds.items() if k not in _RCNN_LOSS_KEYS
                }
                # Per-sample cls accuracy (same formula as the model's
                # batch metric, rcnn.py — equal at B=1; cls_gt is recovered
                # exactly from its one-hot since cls_gt in [0, K]).
                cls_pred = jnp.argmax(loss_in["cls_logits"], -1)
                cls_gt = jnp.argmax(loss_in["cls_gt_one_hot"], -1)
                m = loss_in["pos_neg_cls_mask"].astype(jnp.float32)
                keep["cls_accuracy"] = jnp.sum(
                    (cls_pred == cls_gt) * m, axis=1
                ) / jnp.maximum(jnp.sum(m, axis=1), 1)
                return keep, loss_dict

            self._apply = jax.jit(apply_and_loss)
        else:
            self._apply = jax.jit(
                lambda variables, *args: (
                    model.apply(variables, *args, training=False),
                    None,
                )
            )

    def run_checkpoint_once(
        self, variables, global_step, num_rois: int = 100
    ) -> dict:
        ds = self.dataset
        ic = self.cfg.model_config.input_config
        split = ds.data_split
        final_dir = os.path.join(
            self.predictions_dir,
            "final_predictions_and_scores",
            split,
            str(global_step),
        )
        os.makedirs(final_dir, exist_ok=True)

        infer_times = []
        cls_accs = []
        losses = {}

        def _done(name):
            return os.path.exists(os.path.join(final_dir, name + ".txt"))

        for batch, names, valid in _iter_eval_batches(
            ds,
            self.eval_batch_size,
            "rcnn",
            _done,
            img_w=ic.img_dims_w,
            img_h=ic.img_dims_h,
            num_rois=num_rois,
        ):
            t0 = time.time()
            preds, loss_dict = self._apply(
                variables,
                batch["rpn_roi"],
                batch["rpn_iou"],
                batch["rpn_gt"],
                batch["rpn_pts"],
                batch["rpn_intensity"],
                batch["rpn_fg_mask"],
                batch["rpn_fts"],
                batch["image_input"],
                batch["stereo_calib_p2"],
            )
            preds = jax.device_get(preds)
            per_sample_time = (time.time() - t0) / len(valid)
            loss_host = (
                jax.device_get(loss_dict) if loss_dict is not None else None
            )

            for b in np.flatnonzero(valid):
                infer_times.append(per_sample_time)
                if loss_host is not None:
                    for k, v in loss_host.items():
                        losses.setdefault(k, []).append(
                            float(np.asarray(v)[b])
                        )
                if "cls_accuracy" in preds:
                    acc = np.asarray(preds["cls_accuracy"])
                    cls_accs.append(float(acc[b]) if acc.ndim else float(acc))

                name = names[b]
                n_valid = int(preds["num_boxes_before_padding"][b])
                boxes = preds["final_boxes"][b][:n_valid]
                scores = preds["final_scores"][b][:n_valid]
                types = preds["final_classes"][b][:n_valid]

                # Dedup (NMS padding may duplicate boxes — reference
                # save_rcnn_predicted_boxes_3d_and_scores :1104-1108).
                boxes, uniq = np.unique(boxes, axis=0, return_index=True)
                scores = scores[uniq]
                types = types[uniq]
                order = np.argsort(-scores)
                rows = np.column_stack([boxes, scores, types])[order]
                np.savetxt(os.path.join(final_dir, name + ".txt"), rows, fmt="%.5f")

        kitti_dir = save_predictions_in_kitti_format(
            ds,
            self.predictions_dir,
            self.cfg.eval_config.kitti_score_threshold,
            global_step,
        )
        tstats = _time_stats(infer_times)
        summary = {
            "global_step": int(global_step),
            "avg_cls_acc": float(np.mean(cls_accs)) if cls_accs else 0.0,
            "avg_inference_time": tstats["mean"],
            "inference_time_stats": tstats,
            "kitti_predictions_dir": kitti_dir,
        }
        print(
            "Inference time: Min: {min:.5f} Max: {max:.5f} Mean: {mean:.5f} "
            "Median: {median:.5f}".format(**tstats)
        )

        # Reference-format per-checkpoint ledgers (evaluator.py:766-797):
        # rcnn_avg_losses.csv + rcnn_avg_cls_acc.csv at the predictions dir.
        if losses:
            n_samp = max(len(losses["rcnn_total_loss"]), 1)
            avg = {k: sum(v) / n_samp for k, v in losses.items()}
            summary["avg_losses"] = avg
            _append_ledger_row(
                os.path.join(self.predictions_dir, "rcnn_avg_losses.csv"),
                [global_step, avg["rcnn_cls_loss"], avg["rcnn_bin_cls_loss"],
                 avg["rcnn_reg_loss"], avg["rcnn_total_loss"]],
                "%d, %.5f, %.5f, %.5f, %.5f",
            )
            print(
                "Step {}: Average RCNN Losses: cls {:.5f}, bin_cls {:.5f}, "
                "reg {:.5f}, total {:.5f}".format(
                    global_step, avg["rcnn_cls_loss"], avg["rcnn_bin_cls_loss"],
                    avg["rcnn_reg_loss"], avg["rcnn_total_loss"],
                )
            )
        if cls_accs:
            _append_ledger_row(
                os.path.join(self.predictions_dir, "rcnn_avg_cls_acc.csv"),
                [global_step, summary["avg_cls_acc"]],
                "%d, %.5f",
            )

        # Offline AP via the native C++ evaluator (reference
        # run_kitti_native_eval, evaluator.py:1152-1192).
        if ds.has_labels:
            import json

            from heterofusionrcnn_tpu.runtime.native_eval import (
                run_kitti_native_eval,
            )

            aps = run_kitti_native_eval(
                ds.label_dir, kitti_dir, os.path.dirname(kitti_dir)
            )
            with open(
                os.path.join(os.path.dirname(kitti_dir), "ap_summary.json"), "w"
            ) as f:
                json.dump({k: list(v) for k, v in aps.items()}, f, indent=2)
            summary["ap"] = aps

            # Second pass with the relaxed 0.5/0.25 BEV+3D thresholds — the
            # reference runs both scripts per checkpoint
            # (evaluator.py:1180-1192, run_kitti_native_script_with_05_iou).
            low_dir = os.path.join(os.path.dirname(kitti_dir), "results_05_iou")
            aps_05 = run_kitti_native_eval(
                ds.label_dir, kitti_dir, low_dir, low_iou=True
            )
            with open(os.path.join(low_dir, "ap_summary.json"), "w") as f:
                json.dump({k: list(v) for k, v in aps_05.items()}, f, indent=2)
            summary["ap_05_iou"] = aps_05
        _append_csv(
            os.path.join(self.logs_dir, "rcnn_eval.csv"),
            ["global_step", "avg_cls_acc", "avg_inference_time"],
            [
                summary["global_step"],
                summary["avg_cls_acc"],
                summary["avg_inference_time"],
            ],
        )
        return summary


def evaluated_steps(logs_dir: str, csv_name: str):
    """Steps already present in the metrics ledger (the reference's
    skip_evaluated_checkpoints behavior, evaluator.py:835-872)."""
    path = os.path.join(logs_dir, csv_name)
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        rows = list(csv.reader(f))
    return {int(float(r[0])) for r in rows[1:] if r}


def repeated_checkpoint_run(
    evaluator,
    ckpt_manager,
    make_variables,
    csv_name: str,
    interval_secs: float = 30.0,
    max_wait_secs: float = 3600.0,
    stop_at_step: Optional[int] = None,
):
    """Watch the checkpoint dir, evaluating each new step once
    (evaluator.py:435-502)."""
    waited = 0.0
    while True:
        done = evaluated_steps(evaluator.logs_dir, csv_name)
        todo = [s for s in ckpt_manager.all_steps() if s not in done]
        for step in todo:
            variables = make_variables(step)
            evaluator.run_checkpoint_once(variables, step)
        if todo:
            waited = 0.0
        if stop_at_step is not None and stop_at_step in (
            evaluated_steps(evaluator.logs_dir, csv_name)
        ):
            return
        waited += interval_secs
        if waited > max_wait_secs:
            return
        time.sleep(interval_secs)
