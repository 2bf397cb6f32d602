"""Data-parallel RCNN step over the 8-device mesh + real-model StableHLO
export round-trip (the freeze path on the actual two-stage models)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.configs.presets import rcnn_unittest
from heterofusionrcnn_tpu.experiments.common import make_rcnn_train_step
from heterofusionrcnn_tpu.models.rcnn import RcnnModel, rcnn_loss
from heterofusionrcnn_tpu.parallel.mesh import (
    make_data_mesh,
    replicate_state,
    shard_batch,
)
from heterofusionrcnn_tpu.runtime.optimizer import build_optimizer
from heterofusionrcnn_tpu.runtime.train_state import TrainState
from tests.test_rcnn_model import CLUSTERS, synthetic_inputs


def _batchify(inputs, key_map):
    return {k: inputs[v] for k, v in key_map.items()}


def test_rcnn_data_parallel_8dev():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = rcnn_unittest()
    rng = np.random.default_rng(0)
    inputs = synthetic_inputs(rng, B=8, n=16, P=1024, C=72, h=48, w=96)
    batch = {
        "rpn_roi": inputs["proposals"],
        "rpn_iou": inputs["proposals_iou"],
        "rpn_gt": inputs["proposals_gt"],
        "rpn_pts": inputs["rpn_pts"],
        "rpn_intensity": inputs["rpn_intensity"],
        "rpn_fg_mask": inputs["rpn_fg_mask"],
        "rpn_fts": inputs["rpn_fts"],
        "image_input": inputs["img_input"],
        "stereo_calib_p2": inputs["stereo_calib_p2"],
    }

    model = RcnnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=CLUSTERS,
        mode="train",
    )
    init_fn = jax.jit(lambda r, *a: model.init(r, *a, training=False))
    variables = init_fn(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "path_drop": jax.random.PRNGKey(2),
        },
        *[v[:1] for v in batch.values()],
    )
    tx = build_optimizer(cfg.train_config.optimizer, world_size=8)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    step_fn = make_rcnn_train_step(
        lambda p: rcnn_loss(p, cfg.model_config)
    )

    mesh = make_data_mesh(8)
    state = replicate_state(state, mesh)
    sharded = shard_batch(batch, mesh)
    new_state, metrics, _ = step_fn(state, sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(new_state.step) == 1


def _build_fused_unittest():
    """REAL fused RPN->RCNN inference at unittest scale: returns
    (fused_fn, rpn_vars, rcnn_vars, make_inputs). Shared by the export
    round-trip and the sharded-inference tests."""
    from heterofusionrcnn_tpu.configs.presets import rpn_unittest
    from heterofusionrcnn_tpu.models.rpn import RpnModel

    rpn_cfg = rpn_unittest()
    rcnn_cfg = rcnn_unittest()
    rpn_model = RpnModel(
        config=rpn_cfg.model_config, num_classes=3, cluster_sizes=CLUSTERS,
        mode="test", save_rpn_feature=True,
    )
    rcnn_model = RcnnModel(
        config=rcnn_cfg.model_config, num_classes=3, cluster_sizes=CLUSTERS,
        mode="test",
    )

    ic = rpn_cfg.model_config.input_config
    P, H, W = ic.pc_sample_pts, ic.img_dims_h, ic.img_dims_w
    n_prop = rpn_cfg.model_config.rpn_config.rpn_test_post_nms_size

    def make_inputs(seed, batch=1):
        rng = np.random.default_rng(seed)
        pc = rng.uniform(-20, 20, (batch, P, 4)).astype(np.float32)
        pc[..., 2] = np.abs(pc[..., 2]) + 1.0
        img = rng.uniform(0, 255, (batch, H, W, 3)).astype(np.float32)
        p2 = np.tile(
            np.array(
                [[[200.0, 0, W / 2, 10], [0, 200.0, H / 2, 1], [0, 0, 1, 0]]],
                np.float32,
            ),
            (batch, 1, 1),
        )
        return pc, img, p2

    pc0, img0, p20 = make_inputs(0)
    rpn_vars = jax.jit(
        lambda r, *a: rpn_model.init(r, *a, training=False)
    )({"params": jax.random.PRNGKey(0)}, pc0, img0, p20)

    fts_dim = 64 + 8  # pc fc + vgg_conv1 (unittest preset)
    rcnn_vars = jax.jit(
        lambda r, *a: rcnn_model.init(r, *a, training=False)
    )(
        {"params": jax.random.PRNGKey(1)},
        np.zeros((1, n_prop, 7), np.float32),
        np.zeros((1, n_prop), np.float32),
        np.zeros((1, n_prop, 8), np.float32),
        pc0[..., :3], pc0[..., 3],
        np.ones((1, P), np.float32),
        np.zeros((1, P, fts_dim), np.float32),
        img0, p20,
    )

    def fused(rpn_v, rcnn_v, pc, img, p2):
        rpn_out = rpn_model.apply(rpn_v, pc, img, p2, training=False)
        proposals = rpn_out["proposals"]
        B, n = proposals.shape[:2]
        fts = jnp.concatenate(
            [rpn_out["rpn_fts"], rpn_out["rpn_img_fts"]], axis=-1
        )
        out = rcnn_model.apply(
            rcnn_v, proposals, jnp.zeros((B, n)), jnp.zeros((B, n, 8)),
            rpn_out["rpn_pts"], rpn_out["rpn_intensity"][..., 0],
            rpn_out["foreground_mask"].astype(jnp.float32), fts, img, p2,
            training=False,
        )
        return {
            "final_boxes": out["final_boxes"],
            "final_scores": out["final_scores"],
        }

    return fused, rpn_vars, rcnn_vars, make_inputs


def test_real_model_export_roundtrip(tmp_path):
    """Freeze the REAL fused RPN->RCNN inference (unittest scale) to StableHLO
    and call the artifact with inputs DIFFERENT from the trace examples —
    proving (pc, img, p2) flow through the exported signature rather than
    being baked in (combine_and_freeze_graph_fuse.py parity)."""
    from heterofusionrcnn_tpu.runtime.export import (
        export_fused_inference,
        load_exported,
    )

    fused, rpn_vars, rcnn_vars, make_inputs = _build_fused_unittest()
    pc0, img0, p20 = make_inputs(0)

    path = str(tmp_path / "fused.stablehlo")
    n = export_fused_inference(fused, rpn_vars, rcnn_vars, pc0, img0, p20, path)
    assert n > 0

    # Fresh inputs, never seen at trace time.
    pc1, img1, p21 = make_inputs(7)
    loaded = load_exported(path)
    got = loaded(pc1, img1, p21)
    want = fused(rpn_vars, rcnn_vars, pc1, img1, p21)
    # Tolerances: exported StableHLO and the live trace may fuse differently;
    # box coords are in meters, so 1e-3 abs is ~1 mm.
    np.testing.assert_allclose(
        np.asarray(got["final_boxes"]), np.asarray(want["final_boxes"]),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["final_scores"]), np.asarray(want["final_scores"]),
        rtol=1e-4, atol=1e-5,
    )
    # And the outputs genuinely depend on the inputs (nothing baked in).
    got0 = loaded(pc0, img0, p20)
    assert not np.allclose(
        np.asarray(got0["final_boxes"]), np.asarray(got["final_boxes"])
    )


def test_fused_inference_batch_sharded_8dev():
    """Multi-chip SERVING path: the fused RPN->RCNN inference jitted with the
    batch axis sharded over an 8-device mesh must produce the same
    predictions as the single-device run on the same batch. Per-sample
    compute is independent (NMS/top-k are per-frame), so data-parallel
    sharding is a pure partition — this is the TPU-native capability the
    reference lacks (its eval was always single-process, SURVEY.md §2.3)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    from heterofusionrcnn_tpu.parallel.mesh import batch_sharding, replicated

    fused, rpn_vars, rcnn_vars, make_inputs = _build_fused_unittest()
    pc, img, p2 = make_inputs(3, batch=8)

    want = jax.jit(fused)(rpn_vars, rcnn_vars, pc, img, p2)

    mesh = make_data_mesh(8)
    rep, shard = replicated(mesh), batch_sharding(mesh)
    sharded_fused = jax.jit(
        fused,
        in_shardings=(rep, rep, shard, shard, shard),
        out_shardings=shard,
    )
    got = sharded_fused(
        jax.device_put(rpn_vars, rep),
        jax.device_put(rcnn_vars, rep),
        jax.device_put(pc, shard),
        jax.device_put(img, shard),
        jax.device_put(p2, shard),
    )

    # Each device holds exactly one frame of every output.
    assert len(got["final_boxes"].sharding.device_set) == 8
    # SPMD partitioning changes fusion/reassociation order: same-keep-set,
    # sub-mm box deltas (measured max 6e-4 m, scores 1.2e-4 rel). Same
    # tolerance rationale as the export round-trip above.
    np.testing.assert_allclose(
        np.asarray(got["final_boxes"]), np.asarray(want["final_boxes"]),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["final_scores"]), np.asarray(want["final_scores"]),
        rtol=1e-3, atol=1e-4,
    )
    # Keep-sets are identical: padding zeros line up exactly.
    np.testing.assert_array_equal(
        np.asarray(got["final_scores"]) == 0,
        np.asarray(want["final_scores"]) == 0,
    )
