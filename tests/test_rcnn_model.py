"""RCNN model tests with synthetic stage-1 outputs."""

import functools

import numpy as np
import pytest

pytestmark = pytest.mark.integration

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.configs.presets import rcnn_unittest
from heterofusionrcnn_tpu.models.rcnn import RcnnModel, rcnn_loss

CLUSTERS = ((3.9, 1.6, 1.56), (0.8, 0.66, 1.74), (1.76, 0.6, 1.73))


def synthetic_inputs(rng, B=1, n=16, P=2048, C=72, h=120, w=384):
    """Stage-1 style outputs: points near proposals so crops are non-empty."""
    proposals = np.zeros((B, n, 7), np.float32)
    proposals[..., 0] = rng.uniform(-10, 10, (B, n))
    proposals[..., 1] = rng.uniform(0.5, 2, (B, n))
    proposals[..., 2] = rng.uniform(10, 40, (B, n))
    proposals[..., 3:6] = np.abs(rng.normal([3.8, 1.6, 1.5], 0.3, (B, n, 3)))
    proposals[..., 6] = rng.uniform(-np.pi, np.pi, (B, n))

    # Points: clusters inside each proposal + background.
    pts = []
    for b in range(B):
        local = []
        per = P // (n + 1)
        for i in range(n):
            center = proposals[b, i, :3]
            local.append(center + rng.normal(0, 0.5, (per, 3)))
        local.append(rng.uniform([-40, -1, 0], [40, 3, 70], (P - per * n, 3)))
        pts.append(np.concatenate(local))
    rpn_pts = np.asarray(pts, np.float32)

    iou = rng.uniform(0, 1, (B, n)).astype(np.float32)
    gt = proposals.copy()
    gt[..., 0] += rng.normal(0, 0.2, (B, n))
    gt_cls = rng.integers(1, 4, (B, n)).astype(np.float32)
    proposals_gt = np.concatenate([gt, gt_cls[..., None]], axis=-1)

    p2 = np.tile(
        np.array(
            [[700.0, 0, w / 2, 40], [0, 700.0, h / 2, 2], [0, 0, 1, 0]], np.float32
        ),
        (B, 1, 1),
    )
    return {
        "proposals": jnp.asarray(proposals),
        "proposals_iou": jnp.asarray(iou),
        "proposals_gt": jnp.asarray(proposals_gt.astype(np.float32)),
        "rpn_pts": jnp.asarray(rpn_pts),
        "rpn_intensity": jnp.asarray(
            rng.uniform(-0.5, 0.5, (B, P)).astype(np.float32)
        ),
        "rpn_fg_mask": jnp.asarray(
            (rng.uniform(size=(B, P)) > 0.5).astype(np.float32)
        ),
        "rpn_fts": jnp.asarray(rng.normal(size=(B, P, C)).astype(np.float32)),
        "img_input": jnp.asarray(
            rng.uniform(0, 255, (B, h, w, 3)).astype(np.float32)
        ),
        "stereo_calib_p2": jnp.asarray(p2),
    }


@functools.lru_cache(maxsize=1)
def _model_and_vars():
    cfg = rcnn_unittest()
    rng = np.random.default_rng(0)
    inputs = synthetic_inputs(rng)
    model = RcnnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=CLUSTERS, mode="train"
    )
    variables = model.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "path_drop": jax.random.PRNGKey(2),
        },
        *inputs.values(),
        training=False,
    )
    return cfg, model, variables, inputs


def test_rcnn_train_forward_and_loss():
    cfg, model, variables, inputs = _model_and_vars()
    preds = model.apply(variables, *inputs.values(), training=False)
    assert preds["cls_softmax"].shape == (1, 16, 4)
    assert preds["non_empty_box_mask"].shape == (1, 16)
    # With clustered points, most crops should be non-empty.
    assert int(preds["non_empty_box_mask"].sum()) >= 12

    loss_dict, total = rcnn_loss(preds, cfg.model_config)
    assert np.isfinite(float(total))
    for v in loss_dict.values():
        assert np.isfinite(float(v))


def test_rcnn_gradients_flow():
    cfg, model, variables, inputs = _model_and_vars()

    def loss_fn(params):
        preds = model.apply(
            {**variables, "params": params}, *inputs.values(), training=False
        )
        _, total = rcnn_loss(preds, cfg.model_config)
        return total

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_rcnn_val_forward_final_boxes():
    cfg, model, variables, inputs = _model_and_vars()
    val_model = RcnnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=CLUSTERS, mode="val"
    )
    preds = val_model.apply(variables, *inputs.values(), training=False)
    nms_size = cfg.model_config.rcnn_config.rcnn_nms_size
    assert preds["boxes"].shape == (1, 16, 7)
    assert preds["nms_indices"].shape == (1, nms_size)
    assert preds["final_boxes"].shape == (1, nms_size, 7)
    assert preds["final_scores"].shape == (1, nms_size)
    n_valid = int(preds["num_boxes_before_padding"][0])
    assert 1 <= n_valid <= nms_size
    scores = np.asarray(preds["final_scores"][0][:n_valid])
    assert (scores > 0).all() and (scores <= 1).all()
    classes = np.asarray(preds["final_classes"][0][:n_valid])
    assert classes.min() >= 0 and classes.max() <= 2


def test_rcnn_test_mode_without_labels():
    cfg, model, variables, inputs = _model_and_vars()
    test_model = RcnnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=CLUSTERS, mode="test"
    )
    zeros_iou = jnp.zeros_like(inputs["proposals_iou"])
    zeros_gt = jnp.zeros_like(inputs["proposals_gt"])
    preds = test_model.apply(
        variables,
        inputs["proposals"],
        zeros_iou,
        zeros_gt,
        inputs["rpn_pts"],
        inputs["rpn_intensity"],
        inputs["rpn_fg_mask"],
        inputs["rpn_fts"],
        inputs["img_input"],
        inputs["stereo_calib_p2"],
        training=False,
    )
    assert "final_boxes" in preds
    assert "cls_logits" not in preds


def test_rcnn_shared_img_feature_map_equivalence():
    """Shared-VGG fused mode: passing stage-1's full-res image feature map
    produces EXACTLY the output of running the RCNN's own extractor when the
    image weights are identical (rcnn_use_rpn_img_feature_map contract)."""
    cfg, model, variables, inputs = _model_and_vars()
    test_model = RcnnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=CLUSTERS,
        mode="test",
    )
    own = test_model.apply(variables, *inputs.values(), training=False)

    # Compute the map with the SAME weights the model's internal extractor
    # uses, then feed it through the shared-map path.
    from heterofusionrcnn_tpu.models.extractors.img_vgg_pyr import (
        ImgVggPyr, preprocess_image,
    )

    vgg = ImgVggPyr(cfg.model_config.layers_config.img_vgg_pyr, name="img_vgg_pyr")
    vgg_vars = {
        "params": variables["params"]["img_vgg_pyr"],
        "batch_stats": variables["batch_stats"]["img_vgg_pyr"],
    }
    fmap = vgg.apply(vgg_vars, preprocess_image(inputs["img_input"]), False)

    shared = test_model.apply(
        variables, *inputs.values(), training=False, img_feature_map=fmap
    )
    np.testing.assert_allclose(
        np.asarray(shared["final_boxes"]), np.asarray(own["final_boxes"]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(shared["final_scores"]), np.asarray(own["final_scores"]),
        rtol=1e-6, atol=1e-6,
    )
