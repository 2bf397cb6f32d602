"""Benchmark: end-to-end inference frames/sec/chip on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Baseline target (BASELINE.json): >= 50 frames/sec/chip end-to-end RPN+RCNN
on TPU v5e. Currently measures the RPN stage end-to-end (full-scale PointCNN
+ VGG-pyramid forward, bin decode, per-class gather, top-9000 pre-NMS,
oriented BEV NMS to 100 boxes — the complete test-mode proposal path);
the RCNN stage is appended to the measured path once built.
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

    from __graft_entry__ import _CLUSTER_SIZES, _random_rpn_batch
    from heterofusionrcnn_tpu.configs.presets import rpn_multiclass
    from heterofusionrcnn_tpu.models.rpn import RpnModel

    cfg = rpn_multiclass()
    model = RpnModel(
        config=cfg.model_config,
        num_classes=3,
        cluster_sizes=_CLUSTER_SIZES,
        mode="test",
    )

    rng = np.random.default_rng(0)
    batch = _random_rpn_batch(cfg, BATCH, rng)

    init_fn = jax.jit(
        lambda rngs, pc, img, p2: model.init(rngs, pc, img, p2, training=False)
    )
    variables = init_fn(
        {"params": jax.random.PRNGKey(0)},
        batch["point_cloud"][:1],
        batch["image_input"][:1],
        batch["stereo_calib_p2"][:1],
    )

    @jax.jit
    def infer(params, batch_stats, pc, img, p2):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            pc, img, p2, training=False,
        )

    args = (
        variables["params"],
        variables["batch_stats"],
        batch["point_cloud"],
        batch["image_input"],
        batch["stereo_calib_p2"],
    )

    def sync(out):
        # NOTE: on the tunneled axon TPU platform block_until_ready() is
        # unreliable (returns before compute completes); force a device->host
        # transfer of one scalar instead.
        return float(jax.numpy.ravel(out["proposal_scores"])[0])

    for _ in range(WARMUP):
        out = infer(*args)
    sync(out)

    # Throughput: queue all iterations, sync once at the end (per-iteration
    # syncs would serialize a ~30ms tunnel round-trip into every step).
    t0 = time.perf_counter()
    outs = [infer(*args) for _ in range(ITERS)]
    for out in outs:
        sync(out)
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "rpn_e2e_inference_fps",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
