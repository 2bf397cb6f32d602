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


def test_real_model_export_roundtrip(tmp_path):
    """Freeze the unittest-scale RCNN test-mode forward to StableHLO and
    reproduce live outputs (combine_and_freeze parity check at small scale)."""
    from heterofusionrcnn_tpu.runtime.export import export_fused_inference, load_exported

    cfg = rcnn_unittest()
    rng = np.random.default_rng(1)
    inputs = synthetic_inputs(rng, B=1, n=8, P=512, C=72, h=48, w=96)
    model = RcnnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=CLUSTERS,
        mode="test",
    )
    init_fn = jax.jit(lambda r, *a: model.init(r, *a, training=False))
    variables = init_fn({"params": jax.random.PRNGKey(0)}, *inputs.values())

    def fused(rpn_vars, rcnn_vars, pc, img, p2):
        # Reuse the export signature: here "pc" carries the RoI inputs packed
        # upstream; for this test we close over them instead.
        return model.apply(rcnn_vars, *inputs.values(), training=False)

    path = str(tmp_path / "rcnn.stablehlo")
    n = export_fused_inference(
        fused, {}, variables,
        np.zeros((1,), np.float32), np.zeros((1,), np.float32),
        np.zeros((1,), np.float32), path,
    )
    assert n > 0

    loaded = load_exported(path)
    got = loaded(
        np.zeros((1,), np.float32), np.zeros((1,), np.float32),
        np.zeros((1,), np.float32),
    )
    want = model.apply(variables, *inputs.values(), training=False)
    np.testing.assert_allclose(
        np.asarray(got["final_boxes"]), np.asarray(want["final_boxes"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["final_scores"]), np.asarray(want["final_scores"]),
        atol=1e-5,
    )
