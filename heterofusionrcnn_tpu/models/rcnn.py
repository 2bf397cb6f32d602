"""Stage-2 RCNN model (parity with hf/core/models/rcnn_model.py).

Consumes the RPN stage's outputs (proposals + per-point features, via the
file handoff in training or directly in fused inference): point RoI pooling
with `pc_crop_and_sample`, image RoI crop-and-resize, canonical transform,
local spatial feature MLP, a second PointCNN encoder over each RoI's points,
classification + bin-based box refinement relative to each proposal, and at
eval a per-batch oriented NMS over the refined boxes.

Static shapes: B proposals per sample is fixed (`n`), RoI crops are fixed
`resize` points, NMS emits `rcnn_nms_size` -1-padded indices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from heterofusionrcnn_tpu.configs.config import ModelConfig
from heterofusionrcnn_tpu.core import bin_codec
from heterofusionrcnn_tpu.core.geometry import (
    box_3d_to_corners,
    canonical_transform,
    expand_box_3d,
)
from heterofusionrcnn_tpu.core.losses import weighted_smooth_l1, weighted_softmax_ce
from heterofusionrcnn_tpu.core.projection import (
    boxes_2d_to_yxyx,
    project_boxes_to_image_space,
)
from heterofusionrcnn_tpu.models.extractors.img_vgg_pyr import (
    ImgVgg,
    ImgVggPyr,
    preprocess_image,
)
from heterofusionrcnn_tpu.models.extractors.layers import DenseBN
from heterofusionrcnn_tpu.models.extractors.pointcnn import PointCNN
from heterofusionrcnn_tpu.models.rpn import _take_bin, create_path_drop_masks
from heterofusionrcnn_tpu.ops.cropping import pc_crop_and_sample
from heterofusionrcnn_tpu.ops.image_crop import crop_and_resize
from heterofusionrcnn_tpu.ops.nms import oriented_nms_boxes_3d


def _take_class_n(x, cls):
    """Select class channel: x (N, K, ...) by cls (N,) -> (N, ...).

    One-hot contraction (K = 3) — minor-dim gathers are slow on TPU."""
    k = x.shape[1]
    oh = jax.nn.one_hot(cls, k, dtype=x.dtype)  # (N, K)
    while oh.ndim < x.ndim:
        oh = oh[..., None]
    return jnp.sum(x * oh, axis=1)


class RcnnModel(nn.Module):
    """Stage-2 box refinement network."""

    config: ModelConfig
    num_classes: int
    cluster_sizes: Tuple[Tuple[float, float, float], ...]
    mode: str = "train"  # 'train' | 'val' | 'test'
    # Mini-batch IoU thresholds (dataset mini_batch_config,
    # hf/configs/*.config cls/reg_iou_3d_thresholds).
    cls_neg_iou_hi: float = 0.45
    cls_pos_iou_lo: float = 0.60
    reg_pos_iou_lo: float = 0.55
    # Distance normalizer = BEV z-extent max from the dataset's area_extents
    # (reference rcnn_model.py:83,514 self._bev_extents[1, 1]); builders set
    # this from the dataset config.
    bev_z_max: float = 70.0

    @property
    def bin_params(self):
        rc = self.config.rcnn_config
        S = np.asarray(rc.rcnn_xz_search_range, np.float32)
        DELTA = np.asarray(rc.rcnn_xz_bin_len, np.float32)
        num_bin_x = int(2 * S[0] / DELTA[0])
        R = rc.rcnn_theta_search_range * np.pi
        num_bin_theta = rc.rcnn_theta_bin_num
        delta_theta = 2 * R / num_bin_theta
        return S, DELTA, num_bin_x, num_bin_x, R, delta_theta, num_bin_theta

    @nn.compact
    def __call__(
        self,
        proposals,          # (B, n, 7)
        proposals_iou,      # (B, n)
        proposals_gt,       # (B, n, 8) box_3d + class (zeros in test)
        rpn_pts,            # (B, P, 3)
        rpn_intensity,      # (B, P)
        rpn_fg_mask,        # (B, P)
        rpn_fts,            # (B, P, C)
        img_input,          # (B, H, W, 3)
        calib_p2,           # (B, 3, 4)
        training: Optional[bool] = None,
        img_feature_map=None,  # (B, H, W, C1) stage-1 map (shared-VGG mode)
    ):
        cfg = self.config
        rc = cfg.rcnn_config
        training = self.mode == "train" if training is None else training
        B, n = proposals.shape[:2]
        P = rpn_pts.shape[1]
        K = self.num_classes
        S, DELTA, NUM_BIN_X, NUM_BIN_Z, R, DELTA_THETA, NUM_BIN_THETA = (
            self.bin_params
        )
        cluster_sizes = jnp.asarray(self.cluster_sizes, jnp.float32).reshape(-1, 3)
        N = B * n
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        # Two-stage decoupling: no gradients into stage-1 features (the
        # reference's crop op has its gradient registration disabled,
        # cropping/tf_cropping.py:36-52).
        rpn_fts = jax.lax.stop_gradient(rpn_fts)

        if img_feature_map is not None:
            # Shared-VGG fused mode (rcnn_config.rcnn_use_rpn_img_feature_map):
            # reuse stage-1's full-res map instead of recomputing it. The
            # reference recomputes only because its stages are separate jobs
            # (rcnn_model.py:124-202); a fused TPU graph shares one VGG pass.
            img_fts = jax.lax.stop_gradient(img_feature_map)
        else:
            img_cls = (
                ImgVgg
                if cfg.layers_config.img_extractor_type == "vgg"
                else ImgVggPyr
            )
            img_extractor = img_cls(
                cfg.layers_config.img_vgg_pyr, dtype=dtype, name="img_vgg_pyr"
            )
            img_fts = img_extractor(preprocess_image(img_input), training)

        # ---------------- RoI pooling ---------------- #
        box_ind = jnp.repeat(jnp.arange(B, dtype=jnp.int32), n)  # (N,)

        _, boxes2d_norm = project_boxes_to_image_space(
            proposals, calib_p2, img_input.shape[2], img_input.shape[1]
        )  # (B, n, 4) xyxy normalized
        boxes_yxyx = boxes_2d_to_yxyx(boxes2d_norm.reshape(N, 4))
        img_rois = crop_and_resize(
            img_fts, boxes_yxyx, box_ind, rc.rcnn_proposal_roi_img_crop_size
        )  # (N, r1, r1, C1)

        flat_proposals = proposals.reshape(N, 7)
        expanded = expand_box_3d(flat_proposals, rc.rcnn_pooling_context_length)
        crop_pts, crop_fts, crop_int, crop_mask, _, non_empty_box_mask = (
            pc_crop_and_sample(
                rpn_pts,
                rpn_fts,
                rpn_intensity[..., None],
                rpn_fg_mask,
                box_3d_to_corners(expanded),
                box_ind,
                rc.rcnn_proposal_roi_crop_size,
            )
        )  # (N, Rc, 3), (N, Rc, C), (N, Rc, 1), (N, Rc), _, (N,)

        # ---------------- local spatial features ---------------- #
        crop_pts_ct = canonical_transform(crop_pts, flat_proposals)
        crop_distance = (
            jnp.sqrt(jnp.sum(jnp.square(crop_pts), axis=-1)) / self.bev_z_max
            - 0.5
        )

        if rc.rcnn_use_intensity_feature:
            local_input = jnp.concatenate(
                [crop_pts_ct, crop_int, crop_mask[..., None],
                 crop_distance[..., None]],
                axis=-1,
            )
        else:
            local_input = jnp.concatenate(
                [crop_pts_ct, crop_mask[..., None], crop_distance[..., None]],
                axis=-1,
            )

        x = local_input
        for i, fc in enumerate(cfg.layers_config.rcnn_mlp_layers):
            x = DenseBN(fc.C, dtype=dtype, name=f"mlp{i}")(x, training)
            x = nn.Dropout(fc.dropout_rate, deterministic=not training)(x)

        # ---------------- second-stage point encoder ---------------- #
        merged = jnp.concatenate([crop_fts, x], axis=-1)  # (N, Rc, C+Cm)
        pc_extractor = PointCNN(
            cfg.layers_config.rcnn_pc_pointcnn, dtype=dtype, name="pc_pointcnn"
        )
        _, pc_rois = pc_extractor(crop_pts_ct, merged, training)  # (N, r, C')

        # ---------------- fusion (+ path drop) ---------------- #
        p_img, p_pc = cfg.path_drop_probabilities
        if training and not (p_img == p_pc == 1.0):
            rng = self.make_rng("path_drop")
            rv = jax.random.uniform(rng, (3,))
            img_mask, pc_mask = create_path_drop_masks(p_img, p_pc, rv)
            pc_rois = pc_rois * pc_mask
            img_rois = img_rois * img_mask

        if rc.rcnn_fusion_method == "mean_concat":
            fuse = jnp.concatenate(
                [jnp.mean(pc_rois, axis=1), jnp.mean(img_rois, axis=(1, 2))],
                axis=-1,
            )
        elif rc.rcnn_fusion_method == "flat_concat":
            fuse = jnp.concatenate(
                [pc_rois.reshape(N, -1), img_rois.reshape(N, -1)], axis=-1
            )
        else:
            raise ValueError(rc.rcnn_fusion_method)

        # ---------------- classification branch ---------------- #
        x = fuse
        for i, fc in enumerate(cfg.layers_config.rcnn_fc_layers):
            x = DenseBN(fc.C, dtype=dtype, name=f"cls_fc{i}")(x, training)
            x = nn.Dropout(fc.dropout_rate, deterministic=not training)(x)
        cls_logits = DenseBN(
            K + 1, use_bn=False, activation=None, dtype=dtype, name="cls_logits"
        )(x, training).astype(jnp.float32)  # (N, K+1)
        cls_softmax = jax.nn.softmax(cls_logits, axis=-1)
        cls_fg_preds = jnp.argmax(cls_softmax[:, 1:], axis=-1).astype(jnp.int32)
        cls_scores = jnp.max(cls_softmax[:, 1:], axis=-1)

        # ---------------- refinement branch ---------------- #
        x = fuse
        for i, fc in enumerate(cfg.layers_config.rcnn_fc_layers):
            x = DenseBN(fc.C, dtype=dtype, name=f"reg_fc{i}")(x, training)
            x = nn.Dropout(fc.dropout_rate, deterministic=not training)(x)
        out_dim = (NUM_BIN_X * 2 + NUM_BIN_Z * 2 + NUM_BIN_THETA * 2 + 4) * K
        reg_output = DenseBN(
            out_dim, use_bn=False, activation=None, dtype=dtype, name="reg_output"
        )(x, training).astype(jnp.float32)

        out = reg_output.reshape(N, K, -1)
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
            "cls_softmax": cls_softmax.reshape(B, n, K + 1),
            "non_empty_box_mask": non_empty_box_mask.reshape(B, n),
        }

        # ---------------- eval: decode + NMS ---------------- #
        if self.mode in ("val", "test"):
            bin_x = jnp.argmax(bin_x_logits, axis=-1).astype(jnp.int32)  # (N,K)
            bin_z = jnp.argmax(bin_z_logits, axis=-1).astype(jnp.int32)
            bin_theta = jnp.argmax(bin_theta_logits, axis=-1).astype(jnp.int32)
            res_x = jnp.take_along_axis(res_x_norms, bin_x[..., None], -1).squeeze(-1)
            res_z = jnp.take_along_axis(res_z_norms, bin_z[..., None], -1).squeeze(-1)
            res_t = jnp.take_along_axis(
                res_theta_norms, bin_theta[..., None], -1
            ).squeeze(-1)

            mean_sizes = jnp.broadcast_to(cluster_sizes, (N, K, 3))
            reg_boxes = bin_codec.decode(
                flat_proposals[:, :3],
                flat_proposals[:, 6],
                bin_x, res_x, bin_z, res_z, bin_theta, res_t,
                res_y, res_size_norm, mean_sizes,
                jnp.asarray(S), jnp.asarray(DELTA), R, DELTA_THETA,
            )  # (N, K, 7)
            reg_boxes = _take_class_n(reg_boxes, cls_fg_preds)  # (N, 7)

            batch_boxes = reg_boxes.reshape(B, n, 7)
            batch_scores = cls_scores.reshape(B, n)
            batch_nonempty = non_empty_box_mask.reshape(B, n)

            def nms_one(boxes, scores, ok):
                keep_idx, keep_valid = oriented_nms_boxes_3d(
                    boxes, scores, rc.rcnn_nms_iou_thresh, rc.rcnn_nms_size,
                    valid_mask=ok,
                )
                return keep_idx, keep_valid

            nms_idx, nms_valid = jax.vmap(nms_one)(
                batch_boxes, batch_scores, batch_nonempty
            )
            predictions["boxes"] = batch_boxes
            predictions["nms_indices"] = nms_idx  # (B, nms_size)
            predictions["nms_valid"] = nms_valid
            predictions["num_boxes_before_padding"] = nms_valid.sum(-1)

            # Final per-box class + score (reference
            # _batch_prediction_to_final_prediction :955-993), batched.
            safe = jnp.maximum(nms_idx, 0)
            final_boxes = jnp.take_along_axis(
                batch_boxes, safe[..., None], axis=1
            )  # (B, nms, 7)
            final_softmax = jnp.take_along_axis(
                cls_softmax.reshape(B, n, K + 1), safe[..., None], axis=1
            )
            not_bkg = final_softmax[..., 1:]
            final_types = jnp.argmax(not_bkg, axis=-1).astype(jnp.int32)
            final_scores = jnp.take_along_axis(
                not_bkg, final_types[..., None], axis=-1
            ).squeeze(-1)
            predictions["final_boxes"] = final_boxes
            predictions["final_classes"] = final_types  # 0-based fg class
            predictions["final_scores"] = final_scores * nms_valid
            predictions["final_valid"] = nms_valid

        # ---------------- targets for the loss ---------------- #
        if self.mode in ("train", "val"):
            flat_iou = proposals_iou.reshape(N)
            gt_box = proposals_gt.reshape(N, 8)[:, :7]
            gt_cls = proposals_gt.reshape(N, 8)[:, 7].astype(jnp.int32)

            # Classification targets (reference :783-806).
            neg_cls_mask = flat_iou < self.cls_neg_iou_hi
            pos_cls_mask = flat_iou > self.cls_pos_iou_lo
            pos_neg_cls_mask = (neg_cls_mask | pos_cls_mask) & non_empty_box_mask
            cls_gt = jnp.where(neg_cls_mask, 0, gt_cls)
            cls_gt_one_hot = jax.nn.one_hot(cls_gt, K + 1)

            # Regression targets (reference :807-871).
            pos_reg_mask = (flat_iou > self.reg_pos_iou_lo) & non_empty_box_mask

            bg_row = jnp.mean(cluster_sizes, axis=0, keepdims=True)
            size_table = jnp.concatenate([bg_row, cluster_sizes], axis=0)
            mean_sizes_roi = size_table[jnp.clip(gt_cls, 0, K)]  # (N, 3)

            enc = bin_codec.encode_rcnn(
                flat_proposals[:, :3], flat_proposals[:, 6], gt_box,
                mean_sizes_roi,
                jnp.asarray(S), jnp.asarray(DELTA), R, DELTA_THETA, K,
            )
            (bin_x_gt, res_x_gt, bin_z_gt, res_z_gt,
             bin_theta_gt, res_theta_gt, res_y_gt, res_size_gt) = enc

            cls0 = jnp.clip(gt_cls - 1, 0, K - 1)
            bin_x_gt = _take_class_n(bin_x_gt[..., None], cls0).squeeze(-1)
            res_x_gt = _take_class_n(res_x_gt[..., None], cls0).squeeze(-1)
            bin_z_gt = _take_class_n(bin_z_gt[..., None], cls0).squeeze(-1)
            res_z_gt = _take_class_n(res_z_gt[..., None], cls0).squeeze(-1)

            bin_x_logits_c = _take_class_n(bin_x_logits, cls0)
            bin_z_logits_c = _take_class_n(bin_z_logits, cls0)
            bin_theta_logits_c = _take_class_n(bin_theta_logits, cls0)
            res_y_c = _take_class_n(res_y[..., None], cls0).squeeze(-1)
            res_size_c = _take_class_n(res_size_norm, cls0)
            res_x_c = _take_bin(_take_class_n(res_x_norms, cls0), bin_x_gt)
            res_z_c = _take_bin(_take_class_n(res_z_norms, cls0), bin_z_gt)
            res_theta_c = _take_bin(
                _take_class_n(res_theta_norms, cls0), bin_theta_gt
            )

            predictions.update(
                cls_logits=cls_logits,
                cls_gt_one_hot=cls_gt_one_hot,
                pos_neg_cls_mask=pos_neg_cls_mask,
                pos_reg_mask=pos_reg_mask,
                mb_cls_preds=(
                    bin_x_logits_c, bin_z_logits_c, bin_theta_logits_c
                ),
                mb_cls_gts=(
                    jax.nn.one_hot(bin_x_gt, NUM_BIN_X),
                    jax.nn.one_hot(bin_z_gt, NUM_BIN_Z),
                    jax.nn.one_hot(bin_theta_gt, NUM_BIN_THETA),
                ),
                mb_reg_preds=(res_x_c, res_z_c, res_theta_c, res_y_c, res_size_c),
                mb_reg_gts=(res_x_gt, res_z_gt, res_theta_gt, res_y_gt, res_size_gt),
            )
            predictions["cls_accuracy"] = jnp.sum(
                (jnp.argmax(cls_logits, -1) == cls_gt) * pos_neg_cls_mask
            ) / jnp.maximum(jnp.sum(pos_neg_cls_mask), 1)

        return predictions


def rcnn_loss(predictions, config: ModelConfig):
    """RCNN loss (reference rcnn_model.py:1148-1262): softmax cls on the
    pos|neg mask / box count + per-class bin CE + smooth-L1 residuals on the
    pos mask / pos count, each with a zero-guard."""
    lw = config.loss_config

    cls_mask = predictions["pos_neg_cls_mask"].astype(jnp.float32)
    num_cls = jnp.sum(cls_mask)
    cls_loss = jnp.sum(
        weighted_softmax_ce(
            predictions["cls_logits"], predictions["cls_gt_one_hot"],
            weight=lw.cls_loss_weight,
        )
        * cls_mask
    )
    cls_loss = jnp.where(num_cls > 0, cls_loss / jnp.maximum(num_cls, 1.0), 0.0)

    pos_mask = predictions["pos_reg_mask"].astype(jnp.float32)
    num_pos = jnp.sum(pos_mask)

    bin_loss = 0.0
    for logits, gt in zip(predictions["mb_cls_preds"], predictions["mb_cls_gts"]):
        bin_loss += jnp.sum(
            weighted_softmax_ce(logits, gt, weight=lw.cls_loss_weight) * pos_mask
        )
    bin_loss = jnp.where(num_pos > 0, bin_loss / jnp.maximum(num_pos, 1.0), 0.0)

    reg_loss = 0.0
    for pred, gt in zip(predictions["mb_reg_preds"], predictions["mb_reg_gts"]):
        if pred.ndim == 1:
            pred, gt = pred[:, None], gt[:, None]
        reg_loss += jnp.sum(
            weighted_smooth_l1(pred, gt, weight=lw.reg_loss_weight) * pos_mask
        )
    reg_loss = jnp.where(num_pos > 0, reg_loss / jnp.maximum(num_pos, 1.0), 0.0)

    total = cls_loss + bin_loss + reg_loss
    return (
        {
            "rcnn_cls_loss": cls_loss,
            "rcnn_bin_cls_loss": bin_loss,
            "rcnn_reg_loss": reg_loss,
        },
        total,
    )
