"""Benchmark: end-to-end two-stage (RPN -> RCNN) inference frames/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Baseline target (BASELINE.json): >= 50 frames/sec/chip end-to-end RPN+RCNN
on TPU v5e. Measures the fused single-process path (run_inference's splice):
full-scale PointCNN+VGG RPN on 16384 points -> bin decode -> top-k ->
oriented NMS -> 100 proposals/frame -> RCNN RoI pooling (512-pt crops +
image crops) -> second-stage PointCNN -> refinement -> final NMS.

Timing: pipelined throughput with a single trailing sync per measurement
block — on the tunneled axon platform block_until_ready() is unreliable and
each device->host sync costs a ~30ms round trip.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 50.0
BATCH = 4
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _CLUSTER_SIZES, _random_rpn_batch
    from heterofusionrcnn_tpu.configs.presets import rcnn_multiclass, rpn_multiclass
    from heterofusionrcnn_tpu.models.rcnn import RcnnModel
    from heterofusionrcnn_tpu.models.rpn import RpnModel

    rpn_cfg = rpn_multiclass()
    rcnn_cfg = rcnn_multiclass()

    rpn_model = RpnModel(
        config=rpn_cfg.model_config,
        num_classes=3,
        cluster_sizes=_CLUSTER_SIZES,
        mode="test",
        save_rpn_feature=True,
    )
    rcnn_model = RcnnModel(
        config=rcnn_cfg.model_config,
        num_classes=3,
        cluster_sizes=_CLUSTER_SIZES,
        mode="test",
    )

    rng = np.random.default_rng(0)
    batch = _random_rpn_batch(rpn_cfg, BATCH, rng)
    n_prop = rpn_cfg.model_config.rpn_config.rpn_test_post_nms_size

    rpn_init = jax.jit(
        lambda r, pc, img, p2: rpn_model.init(r, pc, img, p2, training=False)
    )
    rpn_vars = rpn_init(
        {"params": jax.random.PRNGKey(0)},
        batch["point_cloud"][:1],
        batch["image_input"][:1],
        batch["stereo_calib_p2"][:1],
    )

    p = rpn_cfg.model_config.input_config.pc_sample_pts
    fts_dim = 256 + 32  # pc fc output + vgg_conv1 filters
    dummy = {
        "proposals": np.zeros((1, n_prop, 7), np.float32),
        "iou": np.zeros((1, n_prop), np.float32),
        "gt": np.zeros((1, n_prop, 8), np.float32),
        "pts": batch["point_cloud"][:1, :, :3],
        "intensity": batch["point_cloud"][:1, :, 3],
        "fg": np.ones((1, p), np.float32),
        "fts": np.zeros((1, p, fts_dim), np.float32),
    }
    rcnn_init = jax.jit(lambda r, *a: rcnn_model.init(r, *a, training=False))
    rcnn_vars = rcnn_init(
        {"params": jax.random.PRNGKey(1)},
        dummy["proposals"], dummy["iou"], dummy["gt"], dummy["pts"],
        dummy["intensity"], dummy["fg"], dummy["fts"],
        batch["image_input"][:1], batch["stereo_calib_p2"][:1],
    )

    @jax.jit
    def fused(rpn_v, rcnn_v, pc, img, p2):
        rpn_out = rpn_model.apply(rpn_v, pc, img, p2, training=False)
        proposals = rpn_out["proposals"]
        B, n = proposals.shape[:2]
        fts = jnp.concatenate(
            [rpn_out["rpn_fts"], rpn_out["rpn_img_fts"]], axis=-1
        )
        rcnn_out = rcnn_model.apply(
            rcnn_v,
            proposals,
            jnp.zeros((B, n)),
            jnp.zeros((B, n, 8)),
            rpn_out["rpn_pts"],
            rpn_out["rpn_intensity"][..., 0],
            rpn_out["foreground_mask"].astype(jnp.float32),
            fts,
            img,
            p2,
            training=False,
        )
        return {
            "final_boxes": rcnn_out["final_boxes"],
            "final_scores": rcnn_out["final_scores"],
            "num_final": rcnn_out["num_boxes_before_padding"],
        }

    args = (
        rpn_vars,
        rcnn_vars,
        batch["point_cloud"],
        batch["image_input"],
        batch["stereo_calib_p2"],
    )

    def sync(out):
        return float(jax.numpy.ravel(out["final_scores"])[0])

    for _ in range(WARMUP):
        out = fused(*args)
    sync(out)

    t0 = time.perf_counter()
    outs = [fused(*args) for _ in range(ITERS)]
    for out in outs:
        sync(out)
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "two_stage_e2e_inference_fps",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
