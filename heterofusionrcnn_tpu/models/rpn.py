"""Stage-1 RPN model (parity with hf/core/models/rpn_model.py).

Pure-functional flax module replacing the reference's placeholder/feed_dict
graph. One module, three modes ('train' | 'val' | 'test' — reference
rpn_model.py:60-93):
  - train: heads + GT encodings only (NMS skipped, reference :586-589);
  - val:   + decode -> per-class gather -> top-k -> oriented NMS -> IoU
           metrics vs GT;
  - test:  predicted-FG masking, proposals from the predicted segmentation.

Everything is static-shape: the decode runs over all P points, pre-NMS top-k
and post-NMS sizes are fixed with -1-padded indices, matching the reference's
fixed_num_proposal_nms=True configuration. With
rpn_fixed_num_proposal_nms=False the reference instead resamples exactly
NUM_FG_POINT foreground points before the bin head in val/test
(rpn_model.py:495-511, model_util.foreground_masking) and lets NMS emit a
variable keep count (unique + -1 padding); here that resample is a static
top-k-by-seg-score over the mask with wrap-fill (`foreground_resample_indices`)
— deterministic where the reference shuffles in a host py_func, same selected
SET whenever the mask has <= NUM_FG_POINT points.

Inputs (from KittiDataset batches):
  pc_input (B, P, 4), img_input (B, H, W, 3), calib_p2 (B, 3, 4),
  label_segs (B, P), label_regs (B, P, 7), label_boxes (B, m, 7).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from heterofusionrcnn_tpu.configs.config import ModelConfig
from heterofusionrcnn_tpu.core import bin_codec
from heterofusionrcnn_tpu.core.losses import (
    weighted_focal,
    weighted_smooth_l1,
    weighted_softmax_ce,
)
from heterofusionrcnn_tpu.core.projection import rect_to_image
from heterofusionrcnn_tpu.core.rotated_iou import box_3d_iou
from heterofusionrcnn_tpu.models.extractors.img_vgg_pyr import (
    ImgVgg,
    ImgVggPyr,
    preprocess_image,
)
from heterofusionrcnn_tpu.models.extractors.layers import DenseBN
from heterofusionrcnn_tpu.models.extractors.pointcnn import PointCNN
from heterofusionrcnn_tpu.models.extractors.pointnet import PointNet
from heterofusionrcnn_tpu.ops.nms import oriented_nms_boxes_3d


def create_path_drop_masks(p_img, p_pc, random_values):
    """Global path-drop coin flips (reference rpn_model.py:1130-1195):
    keep each branch with its probability; if both die, a third flip
    revives exactly one."""
    img = jnp.where(random_values[0] < p_img, 1.0, 0.0)
    pc = jnp.where(random_values[1] < p_pc, 1.0, 0.0)
    both_dead = (img + pc) < 0.5
    img_second = jnp.where(random_values[2] > 0.5, 1.0, 0.0)
    pc_second = jnp.where(random_values[2] <= 0.5, 1.0, 0.0)
    final_img = jnp.where(both_dead, img_second, img)
    final_pc = jnp.where(both_dead, pc_second, pc)
    return final_img, final_pc


# Fixed foreground-resample size of the non-fixed-NMS path (reference
# rpn_model.py:88 NUM_FG_POINT).
NUM_FG_POINT = 2048


def foreground_resample_indices(mask, scores, npoint):
    """Static-shape twin of model_util.point_cloud_masking (:11-40): pick
    `npoint` indices from each row's True positions.

    The reference selects a RANDOM subset (np.random.choice in a py_func)
    and pads short rows by resampling with replacement; random host
    callbacks don't exist under jit, so this picks the TOP-`npoint` by
    `scores` among masked points (any fixed tie-break is as valid as a
    random one — the downstream bin head sees a fixed-size set of
    foreground points either way) and wrap-fills short rows by repeating
    the selected points in order. An all-False row selects index 0
    `npoint` times, exactly like the reference's zero-initialized indices.

    Args:
      mask: (B, P) bool foreground mask.
      scores: (B, P) float selection preference (seg scores).
      npoint: static output count.
    Returns:
      (B, npoint) int32 indices into P.
    """
    key = jnp.where(mask, scores.astype(jnp.float32), -jnp.inf)
    _, idx = jax.lax.top_k(key, npoint)  # masked-out filler ranks last
    idx = idx.astype(jnp.int32)
    count = jnp.sum(mask, axis=1, keepdims=True).astype(jnp.int32)  # (B, 1)
    j = jnp.arange(npoint, dtype=jnp.int32)[None, :]
    wrap = jnp.where(count > 0, j % jnp.maximum(count, 1), 0)
    wrapped = jnp.take_along_axis(idx, wrap, axis=1)
    return jnp.where(j < count, idx, wrapped)


def _take_class(x, cls):
    """Select the class channel: x (B, P, K, ...) by cls (B, P) -> (B, P, ...).

    One-hot contraction instead of take_along_axis — scalar gathers on minor
    dimensions are slow on TPU, while a K-way select is a few vector ops.
    """
    k = x.shape[2]
    onehot = jax.nn.one_hot(cls, k, dtype=x.dtype)  # (B, P, K)
    oh = onehot
    while oh.ndim < x.ndim:
        oh = oh[..., None]
    return jnp.sum(x * oh, axis=2)


def _take_bin(x, bins):
    """Select the chosen bin: x (..., C) by bins (...) -> (...).

    One-hot contraction (C <= 12 here) — avoids minor-dim gathers on TPU.
    """
    c = x.shape[-1]
    onehot = jax.nn.one_hot(bins, c, dtype=x.dtype)
    return jnp.sum(x * onehot, axis=-1)


class RpnModel(nn.Module):
    """Stage-1 proposal network."""

    config: ModelConfig
    num_classes: int
    cluster_sizes: Tuple[Tuple[float, float, float], ...]  # (K, 3) static
    mode: str = "train"  # 'train' | 'val' | 'test'
    save_rpn_feature: bool = False

    # ------------------------------------------------------------------ #

    @property
    def bin_params(self):
        rpn = self.config.rpn_config
        S = np.asarray(rpn.rpn_xz_search_range, np.float32)
        DELTA = np.asarray(rpn.rpn_xz_bin_len, np.float32)
        num_bin_x = int(2 * S[0] / DELTA[0])
        R = rpn.rpn_theta_search_range * np.pi
        num_bin_theta = rpn.rpn_theta_bin_num
        delta_theta = 2 * R / num_bin_theta
        return S, DELTA, num_bin_x, num_bin_x, R, delta_theta, num_bin_theta

    @nn.compact
    def __call__(
        self,
        pc_input,
        img_input,
        calib_p2,
        label_segs=None,
        label_regs=None,
        label_boxes=None,
        training: Optional[bool] = None,
    ):
        cfg = self.config
        rpn_cfg = cfg.rpn_config
        training = self.mode == "train" if training is None else training
        B, P = pc_input.shape[:2]
        K = self.num_classes
        S, DELTA, NUM_BIN_X, NUM_BIN_Z, R, DELTA_THETA, NUM_BIN_THETA = (
            self.bin_params
        )
        cluster_sizes = jnp.asarray(self.cluster_sizes, jnp.float32).reshape(-1, 3)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        # ---------------- feature extraction ---------------- #
        pc_pts = pc_input[..., :3]
        pc_intensity = pc_input[..., 3:4]

        if cfg.layers_config.pc_extractor_type == "pointcnn":
            pc_extractor = PointCNN(
                cfg.layers_config.pc_pointcnn, dtype=dtype, name="pc_pointcnn"
            )
        else:
            pc_extractor = PointNet(cfg.layers_config.pc_pointnet, name="pc_pointnet")
        pc_fts_in = pc_intensity if rpn_cfg.rpn_use_intensity_feature else None
        pc_pts_out, pc_fts = pc_extractor(pc_pts, pc_fts_in, training)

        img_cls = (
            ImgVgg if cfg.layers_config.img_extractor_type == "vgg" else ImgVggPyr
        )
        img_extractor = img_cls(
            cfg.layers_config.img_vgg_pyr, dtype=dtype, name="img_vgg_pyr"
        )
        img_fts = img_extractor(preprocess_image(img_input), training)

        # Per-point image features: project points, gather pixels
        # (reference :227-235). Clip to the image for safety (the frustum
        # filter guarantees in-bounds at load time).
        proj = rect_to_image(pc_pts_out, calib_p2)
        # Feature-map dims (== image dims / config downsample); projected
        # pixel coords scale by the same factor.
        H, W = img_fts.shape[1], img_fts.shape[2]
        ds = cfg.layers_config.img_vgg_pyr.downsample
        if ds > 1:
            proj = proj / ds
        u = jnp.clip(proj[..., 0].astype(jnp.int32), 0, W - 1)
        v = jnp.clip(proj[..., 1].astype(jnp.int32), 0, H - 1)
        # Per-batch 2-D gather. The earlier flat row gather made XLA
        # relayout the whole 105 MB map channels-first first (a 3.5 ms
        # chunked while loop in the round-5 fused-graph trace); gathering
        # from the NHWC map per batch element skips the relayout — 2.8 vs
        # 6.2 ms at production shape (tools/microbench_imggather.py, v5e).
        proj_img_fts = jax.vmap(lambda im, vv, uu: im[vv, uu])(
            img_fts, v, u
        )  # (B, P, C1)

        # ---------------- segmentation head ---------------- #
        seg_logits = DenseBN(
            K + 1, use_bn=False, activation=None, dtype=dtype, name="seg_logits"
        )(pc_fts, training).astype(jnp.float32)
        seg_softmax = jax.nn.softmax(seg_logits, axis=-1)
        seg_preds = jnp.argmax(seg_softmax, axis=-1).astype(jnp.int32)  # (B,P)
        seg_fg_preds = jnp.argmax(seg_softmax[..., 1:], axis=-1).astype(jnp.int32)
        seg_scores = jnp.max(seg_softmax[..., 1:], axis=-1)  # (B,P)

        # Foreground mask (reference :490-511): GT in train/val, preds in test.
        if self.mode in ("train", "val"):
            foreground_mask = label_segs > 0
        else:
            foreground_mask = seg_preds > 0

        # GT tensors feeding the bin-head encodings; rebound to the
        # resampled views below (the seg loss/accuracy keep the full-res
        # label_segs — the reference's seg head also trains over all P,
        # rpn_model.py:1040-1060).
        enc_label_segs, enc_label_regs = label_segs, label_regs

        # Non-fixed-NMS path (reference :496-511): in val/test resample
        # exactly NUM_FG_POINT foreground points (and everything the bin
        # head consumes) before fusion; NMS then sees all of them (no
        # pre-NMS top-k cut — :645-668) and emits a variable keep count.
        if (
            self.mode in ("val", "test")
            and not rpn_cfg.rpn_fixed_num_proposal_nms
        ):
            F = min(NUM_FG_POINT, P)
            fg_idx = foreground_resample_indices(
                foreground_mask, seg_scores, F
            )  # (B, F)

            def _take_rows(a):
                if a is None:
                    return None
                idx = fg_idx[..., None] if a.ndim == 3 else fg_idx
                return jnp.take_along_axis(a, idx, axis=1)

            pc_pts_out = _take_rows(pc_pts_out)
            pc_fts = _take_rows(pc_fts)
            proj_img_fts = _take_rows(proj_img_fts)
            pc_intensity = _take_rows(pc_intensity)
            seg_fg_preds = _take_rows(seg_fg_preds)
            seg_scores = _take_rows(seg_scores)
            foreground_mask = _take_rows(foreground_mask)
            enc_label_segs = _take_rows(enc_label_segs)
            enc_label_regs = _take_rows(enc_label_regs)
            P = F

        # ---------------- fusion (+ path drop) ---------------- #
        proposal_fts = pc_fts
        proposal_img_fts = proj_img_fts
        fusion_mean_div = 2.0
        p_img, p_pc = cfg.path_drop_probabilities
        if training and not (p_img == p_pc == 1.0):
            rng = self.make_rng("path_drop")
            random_values = jax.random.uniform(rng, (3,))
            img_mask, pc_mask = create_path_drop_masks(p_img, p_pc, random_values)
            proposal_fts = proposal_fts * pc_mask
            proposal_img_fts = proposal_img_fts * img_mask
            fusion_mean_div = img_mask + pc_mask

        if rpn_cfg.rpn_fusion_method == "mean":
            fused = (proposal_fts + proposal_img_fts) / fusion_mean_div
        elif rpn_cfg.rpn_fusion_method == "concat":
            fused = jnp.concatenate([proposal_fts, proposal_img_fts], axis=-1)
        else:
            raise ValueError(rpn_cfg.rpn_fusion_method)

        # ---------------- bin-based proposal head ---------------- #
        x = fused
        for i, fc in enumerate(cfg.layers_config.rpn_fc_layers):
            x = DenseBN(fc.C, dtype=dtype, name=f"fc{i}")(x, training)
            x = nn.Dropout(fc.dropout_rate, deterministic=not training)(x)
        out_dim = (NUM_BIN_X * 2 + NUM_BIN_Z * 2 + NUM_BIN_THETA * 2 + 4) * K
        fc_output = DenseBN(
            out_dim, use_bn=False, activation=None, dtype=dtype, name="fc_output"
        )(x, training).astype(jnp.float32)

        # Parse (reference _parse_rpn_output :870-943).
        out = fc_output.reshape(B, P, K, -1)
        o = 0
        bin_x_logits = out[..., o : o + NUM_BIN_X]; o += NUM_BIN_X
        res_x_norms = out[..., o : o + NUM_BIN_X]; o += NUM_BIN_X
        bin_z_logits = out[..., o : o + NUM_BIN_Z]; o += NUM_BIN_Z
        res_z_norms = out[..., o : o + NUM_BIN_Z]; o += NUM_BIN_Z
        bin_theta_logits = out[..., o : o + NUM_BIN_THETA]; o += NUM_BIN_THETA
        res_theta_norms = out[..., o : o + NUM_BIN_THETA]; o += NUM_BIN_THETA
        res_y = out[..., o]; o += 1
        res_size_norm = out[..., o : o + 3]

        predictions = {
            "seg_softmax": seg_softmax,
            "seg_preds": seg_preds,
            "foreground_mask": foreground_mask,
        }

        # ---------------- eval path: decode + NMS ---------------- #
        if self.mode in ("val", "test"):
            bin_x = jnp.argmax(bin_x_logits, axis=-1).astype(jnp.int32)
            bin_z = jnp.argmax(bin_z_logits, axis=-1).astype(jnp.int32)
            bin_theta = jnp.argmax(bin_theta_logits, axis=-1).astype(jnp.int32)
            res_x = _take_bin(res_x_norms.reshape(B, P * K, -1),
                              bin_x.reshape(B, P * K)).reshape(B, P, K)
            res_z = _take_bin(res_z_norms.reshape(B, P * K, -1),
                              bin_z.reshape(B, P * K)).reshape(B, P, K)
            res_t = _take_bin(res_theta_norms.reshape(B, P * K, -1),
                              bin_theta.reshape(B, P * K)).reshape(B, P, K)

            mean_sizes = jnp.broadcast_to(cluster_sizes, (B, P, K, 3))
            proposals_all = bin_codec.decode(
                pc_pts_out, 0.0,
                bin_x, res_x, bin_z, res_z, bin_theta, res_t,
                res_y, res_size_norm, mean_sizes,
                jnp.asarray(S), jnp.asarray(DELTA), R, DELTA_THETA,
            )  # (B, P, K, 7)
            proposals = _take_class(proposals_all, seg_fg_preds)  # (B, P, 7)
            confidences = seg_scores

            pre = rpn_cfg.rpn_train_pre_nms_size if self.mode == "val" else (
                rpn_cfg.rpn_test_pre_nms_size
            )
            post = rpn_cfg.rpn_train_post_nms_size if self.mode == "val" else (
                rpn_cfg.rpn_test_post_nms_size
            )
            thresh = (
                rpn_cfg.rpn_train_nms_iou_thresh
                if self.mode == "val"
                else rpn_cfg.rpn_test_nms_iou_thresh
            )
            pre = min(pre, P)
            if not rpn_cfg.rpn_fixed_num_proposal_nms:
                # Non-fixed path: no pre-NMS cut — every (resampled) point's
                # proposal goes to NMS (reference :645-668 else-branch); the
                # top_k below then just score-sorts all P of them.
                pre = P

            top_conf, top_idx = jax.lax.top_k(confidences, pre)  # (B, pre)
            top_proposals = jnp.take_along_axis(
                proposals, top_idx[..., None], axis=1
            )  # (B, pre, 7)

            def nms_one(boxes, scores):
                keep_idx, keep_valid = oriented_nms_boxes_3d(
                    boxes, scores, thresh, post
                )
                safe = jnp.maximum(keep_idx, 0)
                return boxes[safe], scores[safe] * keep_valid, keep_valid

            post_boxes, post_scores, post_valid = jax.vmap(nms_one)(
                top_proposals, top_conf
            )
            predictions["proposals"] = post_boxes  # (B, post, 7)
            predictions["proposal_scores"] = post_scores
            predictions["proposal_valid"] = post_valid
            predictions["num_proposals_before_padding"] = post_valid.sum(-1)

            if self.mode == "val" and label_boxes is not None:
                iou3ds, iou2ds = jax.vmap(box_3d_iou)(post_boxes, label_boxes)
                predictions["proposal_iou3d"] = iou3ds  # (B, post, m)
                predictions["proposal_iou2d"] = iou2ds

        # ---------------- GT encodings for the loss ---------------- #
        if self.mode in ("train", "val") and label_segs is not None:
            label_cls = label_segs.astype(jnp.int32)  # -1 ignore, 0 bg, 1..K
            segs_gt_one_hot = jax.nn.one_hot(label_cls, K + 1)
            # The bin-head targets follow the (possibly FG-resampled) points;
            # the seg targets above always stay full-res.
            enc_label_cls = enc_label_segs.astype(jnp.int32)

            # Mean size per point for its GT class; background row = mean of
            # class means (reference _gather_cls_mean_sizes :370-399).
            bg_row = jnp.mean(cluster_sizes, axis=0, keepdims=True)
            size_table = jnp.concatenate([bg_row, cluster_sizes], axis=0)
            mean_sizes_pt = size_table[jnp.clip(enc_label_cls, 0, K)]  # (B, P, 3)

            enc = bin_codec.encode_rpn(
                pc_pts_out, enc_label_regs, mean_sizes_pt,
                jnp.asarray(S), jnp.asarray(DELTA), R, DELTA_THETA, K,
            )
            (bin_x_gt, res_x_gt, bin_z_gt, res_z_gt,
             bin_theta_gt, res_theta_gt, res_y_gt, res_size_gt) = enc

            cls0 = jnp.clip(enc_label_cls - 1, 0, K - 1)  # 0-based FG class
            bin_x_gt = _take_class(bin_x_gt[..., None], cls0).squeeze(-1)
            res_x_gt = _take_class(res_x_gt[..., None], cls0).squeeze(-1)
            bin_z_gt = _take_class(bin_z_gt[..., None], cls0).squeeze(-1)
            res_z_gt = _take_class(res_z_gt[..., None], cls0).squeeze(-1)

            # Gather predicted channels at the GT class / GT bin
            # (reference _gather_cls_preds / _gather_cls_residuals).
            bin_x_logits_c = _take_class(bin_x_logits, cls0)  # (B,P,NBX)
            bin_z_logits_c = _take_class(bin_z_logits, cls0)
            bin_theta_logits_c = _take_class(bin_theta_logits, cls0)
            res_y_c = _take_class(res_y[..., None], cls0).squeeze(-1)
            res_size_c = _take_class(res_size_norm, cls0)  # (B,P,3)
            res_x_c = _take_bin(_take_class(res_x_norms, cls0), bin_x_gt)
            res_z_c = _take_bin(_take_class(res_z_norms, cls0), bin_z_gt)
            res_theta_c = _take_bin(
                _take_class(res_theta_norms, cls0), bin_theta_gt
            )

            predictions.update(
                seg_gt_one_hot=segs_gt_one_hot,
                cls_preds=(
                    bin_x_logits_c, bin_z_logits_c, bin_theta_logits_c
                ),
                cls_gts=(
                    jax.nn.one_hot(bin_x_gt, NUM_BIN_X),
                    jax.nn.one_hot(bin_z_gt, NUM_BIN_Z),
                    jax.nn.one_hot(bin_theta_gt, NUM_BIN_THETA),
                ),
                reg_preds=(res_x_c, res_z_c, res_theta_c, res_y_c, res_size_c),
                reg_gts=(res_x_gt, res_z_gt, res_theta_gt, res_y_gt, res_size_gt),
            )

            # Seg accuracy metric (reference :720-730).
            predictions["seg_accuracy"] = jnp.mean(
                (seg_preds == label_cls).astype(jnp.float32)
            )

        if self.save_rpn_feature:
            predictions["rpn_pts"] = pc_pts_out
            predictions["rpn_fts"] = pc_fts
            predictions["rpn_intensity"] = pc_intensity
            predictions["rpn_img_fts"] = proj_img_fts
            predictions["seg_logits"] = seg_logits
            # Full-res image feature map for the shared-VGG fused mode: a
            # fused TPU graph need not recompute image features in stage 2
            # the way the reference's separate jobs do (rcnn_model.py:124).
            predictions["img_feature_map"] = img_fts

        return predictions


def rpn_loss(predictions, config: ModelConfig):
    """RPN loss (reference rpn_model.py:1040-1128): focal seg loss normalized
    by total points + per-class bin CE + smooth-L1 residuals, the latter two
    normalized by the foreground count with a zero-guard.

    Returns:
      (loss_dict, total_loss).
    """
    lw = config.loss_config
    fg_mask = predictions["foreground_mask"]
    seg_softmax = predictions["seg_softmax"]
    seg_gt = predictions["seg_gt_one_hot"]

    # Seg-loss normalizer from the SEG arrays' own shape: in the non-fixed
    # FG-resample path the bin-head tensors (and fg_mask) live on the
    # resampled points while segmentation stays full-res.
    num_total = seg_softmax.shape[0] * seg_softmax.shape[1]

    # Ignore-label points (-1) contribute a zero one-hot row, hence no loss —
    # matching tf.one_hot's behavior for negative labels.
    seg_loss = (
        jnp.sum(weighted_focal(seg_softmax, seg_gt, weight=lw.seg_loss_weight))
        / num_total
    )

    fg = fg_mask.astype(jnp.float32)
    num_fg = jnp.sum(fg)
    safe_fg = jnp.maximum(num_fg, 1.0)

    cls_loss = 0.0
    for logits, gt in zip(predictions["cls_preds"], predictions["cls_gts"]):
        cls_loss += jnp.sum(
            weighted_softmax_ce(logits, gt, weight=lw.cls_loss_weight) * fg
        )
    cls_loss = jnp.where(num_fg > 0, cls_loss / safe_fg, 0.0)

    reg_loss = 0.0
    for pred, gt in zip(predictions["reg_preds"], predictions["reg_gts"]):
        if pred.ndim == 2:  # scalar residuals -> add feature axis
            pred, gt = pred[..., None], gt[..., None]
        reg_loss += jnp.sum(
            weighted_smooth_l1(pred, gt, weight=lw.reg_loss_weight) * fg
        )
    reg_loss = jnp.where(num_fg > 0, reg_loss / safe_fg, 0.0)

    total = seg_loss + cls_loss + reg_loss
    return (
        {
            "rpn_seg_loss": seg_loss,
            "rpn_bin_cls_loss": cls_loss,
            "rpn_reg_loss": reg_loss,
        },
        total,
    )
