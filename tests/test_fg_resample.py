"""Non-fixed-NMS foreground resample path (reference rpn_model.py:495-511 +
model_util.point_cloud_masking/foreground_masking, NUM_FG_POINT=2048):
numpy-oracle semantics of the static resample, and the RpnModel honoring
rpn_fixed_num_proposal_nms=False in val/test mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.models.rpn import (
    NUM_FG_POINT,
    foreground_resample_indices,
)


def _oracle(mask, scores, npoint):
    """Numpy mirror of the resample rule: masked indices ordered by
    (-score, index), wrap-filled; empty rows select index 0."""
    out = np.zeros((mask.shape[0], npoint), np.int32)
    for b in range(mask.shape[0]):
        pos = np.flatnonzero(mask[b])
        if pos.size == 0:
            continue
        order = pos[np.lexsort((pos, -scores[b, pos]))][:npoint]
        reps = int(np.ceil(npoint / order.size))
        out[b] = np.tile(order, reps)[:npoint]
    return out


def test_resample_indices_oracle():
    rng = np.random.default_rng(0)
    P, F = 257, 64
    scores = rng.random((4, P)).astype(np.float32)
    mask = np.zeros((4, P), bool)
    mask[0, rng.choice(P, 150, replace=False)] = True   # count > npoint
    mask[1, rng.choice(P, 20, replace=False)] = True    # wrap-fill
    mask[2, 5] = True                                   # single point
    # row 3: empty mask
    got = np.asarray(foreground_resample_indices(jnp.asarray(mask), jnp.asarray(scores), F))
    want = _oracle(mask, scores, F)
    np.testing.assert_array_equal(got, want)
    assert (got[3] == 0).all()


def test_resample_indices_tie_break_lowest_index():
    scores = np.zeros((1, 16), np.float32)  # all ties
    mask = np.zeros((1, 16), bool)
    mask[0, [3, 7, 11]] = True
    got = np.asarray(
        foreground_resample_indices(jnp.asarray(mask), jnp.asarray(scores), 8)
    )
    np.testing.assert_array_equal(got[0], [3, 7, 11, 3, 7, 11, 3, 7])


def test_num_fg_point_constant():
    assert NUM_FG_POINT == 2048  # reference rpn_model.py:88


@pytest.mark.integration
def test_rpn_model_non_fixed_nms_val_forward():
    """RpnModel with rpn_fixed_num_proposal_nms=False: the bin head runs on
    the resampled set, NMS emits unique keeps, the loss stays finite and its
    seg part matches the fixed-path seg loss (full-res seg targets)."""
    from heterofusionrcnn_tpu.configs.presets import rpn_unittest
    from heterofusionrcnn_tpu.datasets.kitti.dataset import KittiDataset
    from heterofusionrcnn_tpu.models.rpn import RpnModel, rpn_loss

    cfg = rpn_unittest()
    cfg.model_config.rpn_config.rpn_fixed_num_proposal_nms = False
    ic = cfg.model_config.input_config
    ds = KittiDataset(cfg.dataset_config, "val")
    ds.seed(0)
    clusters = tuple(tuple(np.asarray(c).reshape(3).tolist()) for c in ds.clusters)
    batch, _ = ds.next_batch(
        1, shuffle=False, model="rpn", pc_sample_pts=ic.pc_sample_pts,
        img_w=ic.img_dims_w, img_h=ic.img_dims_h,
    )
    model = RpnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=clusters, mode="val"
    )
    variables = jax.jit(lambda r, *a: model.init(r, *a, training=False))(
        {"params": jax.random.PRNGKey(0)},
        batch["point_cloud"], batch["image_input"], batch["stereo_calib_p2"],
        batch["label_seg"], batch["label_reg"], batch["label_boxes_3d"],
    )
    preds = jax.jit(lambda v, *a: model.apply(v, *a, training=False))(
        variables,
        batch["point_cloud"], batch["image_input"], batch["stereo_calib_p2"],
        batch["label_seg"], batch["label_reg"], batch["label_boxes_3d"],
    )
    preds = jax.device_get(preds)

    P = batch["point_cloud"].shape[1]
    F = min(NUM_FG_POINT, P)
    post = cfg.model_config.rpn_config.rpn_train_post_nms_size
    # Bin-head tensors live on the resampled set.
    assert preds["foreground_mask"].shape == (1, F)
    for t in preds["cls_preds"]:
        assert t.shape[1] == F
    # Seg targets stay full-res.
    assert preds["seg_softmax"].shape[1] == P
    assert preds["seg_gt_one_hot"].shape[1] == P
    # NMS output: fixed container, variable count, keeps sorted by score.
    # (Keep INDICES are unique — the tf.unique semantics of the reference's
    # non-fixed sb_nms_fn — but wrap-filled resample duplicates can yield
    # equal box VALUES at distinct indices, exactly as in the reference.)
    assert preds["proposals"].shape == (1, post, 7)
    n_valid = int(preds["num_proposals_before_padding"][0])
    assert 1 <= n_valid <= post
    kept_scores = preds["proposal_scores"][0][:n_valid]
    assert (np.diff(kept_scores) <= 1e-6).all()

    loss_dict, total = rpn_loss(preds, cfg.model_config)
    assert np.isfinite(float(total))

    # The seg loss must equal the FIXED-path seg loss (same full-res inputs).
    cfg2 = rpn_unittest()
    model2 = RpnModel(
        config=cfg2.model_config, num_classes=3, cluster_sizes=clusters, mode="val"
    )
    preds2 = jax.jit(lambda v, *a: model2.apply(v, *a, training=False))(
        variables,
        batch["point_cloud"], batch["image_input"], batch["stereo_calib_p2"],
        batch["label_seg"], batch["label_reg"], batch["label_boxes_3d"],
    )
    loss_dict2, _ = rpn_loss(jax.device_get(preds2), cfg2.model_config)
    np.testing.assert_allclose(
        float(loss_dict["rpn_seg_loss"]), float(loss_dict2["rpn_seg_loss"]),
        rtol=1e-5,
    )
