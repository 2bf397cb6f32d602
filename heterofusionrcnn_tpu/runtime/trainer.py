"""Training loop (parity with hf/core/trainer.py).

Replaces the session/feed_dict loop with a jitted train step over a data
mesh. Keeps the reference's external behaviors: output tree
<output_root>/<checkpoint_name>/{checkpoints,logs,predictions}, config
snapshot at start, resume-from-latest, checkpoint every
`checkpoint_interval`, per-`summary_interval` metric logging, iteration
budget divided by world size, LR scaled by world size.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from heterofusionrcnn_tpu.configs.config import PipelineConfig, save_config
from heterofusionrcnn_tpu.parallel.mesh import (
    make_data_mesh,
    replicate_state,
    shard_batch,
)
from heterofusionrcnn_tpu.runtime.checkpoint import CheckpointManager
from heterofusionrcnn_tpu.runtime.optimizer import build_optimizer
from heterofusionrcnn_tpu.runtime.train_state import TrainState


class MetricsLogger:
    """Scalar logging: TensorBoard (via torch.utils.tensorboard) when
    available, always a JSONL file (the reference's three channels were
    TB summaries + CSVs + stdout, SURVEY.md §5).

    The train.proto summary toggles map 1:1 (reference trainer.py:58-60 +
    summary_utils.summaries_to_keep :88): `histograms` gates per-parameter
    histogram summaries, `img_images`/`pc_images` gate input image / BEV
    point-cloud image summaries."""

    def __init__(
        self,
        log_dir: str,
        histograms: bool = True,
        img_images: bool = False,
        pc_images: bool = False,
    ):
        os.makedirs(log_dir, exist_ok=True)
        self.histograms = histograms
        self.img_images = img_images
        self.pc_images = pc_images
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        self._hist_fn = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, step: int, metrics: dict) -> None:
        record = {"step": int(step)}
        for k, v in metrics.items():
            record[k] = float(v)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in record.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def log_image(self, step: int, name: str, image) -> None:
        """Feature-map / prediction image summaries (the reference's
        summary_img_images / summary_pc_images toggles, summary_utils.py).

        Args:
          image: (H, W) or (H, W, C) array, any float range (normalized here).
        """
        import numpy as np

        arr = np.asarray(image, dtype=np.float32)
        lo, hi = arr.min(), arr.max()
        arr = (arr - lo) / (hi - lo + 1e-8)
        if self._tb is not None:
            fmt = "HW" if arr.ndim == 2 else "HWC"
            self._tb.add_image(name, arr, step, dataformats=fmt)

    def log_param_histograms(self, step: int, params) -> None:
        """Per-parameter histogram summaries (train.proto summary_histograms).

        Histograms are computed ON DEVICE (64 bins) and only the bucket
        counts/edges cross to the host — a full device_get of the params
        every summary interval would saturate slow transports."""
        if not (self.histograms and self._tb is not None):
            return
        import jax
        import jax.numpy as jnp

        if self._hist_fn is None:

            def one(x):
                x = x.astype(jnp.float32).ravel()
                lo = jnp.min(x)
                hi = jnp.max(x)
                span = jnp.maximum(hi - lo, 1e-12)
                idx = jnp.clip(
                    ((x - lo) / span * 64).astype(jnp.int32), 0, 63
                )
                counts = jnp.zeros((64,), jnp.int32).at[idx].add(1)
                edges = lo + span * (jnp.arange(1, 65, dtype=jnp.float32) / 64)
                # One row per param: [min, max, sum, sum_sq, edges(64),
                # counts(64)] — packed so the WHOLE histogram summary
                # crosses to the host as ONE (P, 132) array. A per-leaf
                # device_get costs one transport round trip per tensor
                # (~33 ms each on tunneled devices — measured 4-6x training
                # slowdown with a few hundred params).
                return jnp.concatenate(
                    [
                        jnp.stack([lo, hi, jnp.sum(x), jnp.sum(x * x)]),
                        edges,
                        counts.astype(jnp.float32),
                    ]
                )

            def packed(tree):
                rows = [one(v) for v in jax.tree_util.tree_leaves(tree)]
                return jnp.stack(rows)

            self._hist_fn = jax.jit(packed)

        import numpy as np

        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        stats = np.asarray(jax.device_get(self._hist_fn(params)))
        for (kp, v), row in zip(flat, stats):
            name = jax.tree_util.keystr(kp).strip("[]'").replace("']['", "/")
            self._tb.add_histogram_raw(
                tag=name,
                min=float(row[0]),
                max=float(row[1]),
                num=int(np.prod(v.shape)),
                sum=float(row[2]),
                sum_squares=float(row[3]),
                bucket_limits=row[4:68].tolist(),
                bucket_counts=row[68:132].astype(np.int64).tolist(),
                global_step=step,
            )

    def log_input_summaries(self, step: int, batch: dict) -> None:
        """Input image / BEV point-cloud summaries (train.proto
        summary_img_images / summary_pc_images)."""
        import numpy as np

        if self.img_images and "image_input" in batch:
            self.log_image(step, "input/image", np.asarray(batch["image_input"])[0])
        if self.pc_images and "point_cloud" in batch:
            pc = np.asarray(batch["point_cloud"])[0]
            bev, _, _ = np.histogram2d(
                pc[:, 0], pc[:, 2], bins=(200, 176),
                range=[[-40, 40], [0, 70]],
            )
            self.log_image(step, "input/pc_bev", np.log1p(bev))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def device_memory_mb() -> float:
    """Peak device memory in MB (the reference logged the GPU memory
    watermark each step via tf.contrib.memory_stats.MaxBytesInUse,
    trainer.py:99). Returns 0.0 where the backend exposes no stats (CPU)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return 0.0
        peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
        return float(peak) / 1e6
    except Exception:
        return 0.0


def _host_rss_mb() -> float:
    """Host resident-set size in MB, read from /proc/self/statm (no psutil
    dependency). Returns 0.0 on non-Linux hosts."""
    try:
        with open("/proc/self/statm") as f:
            rss_pages = int(f.read().split()[1])
        return rss_pages * (os.sysconf("SC_PAGE_SIZE") / 1e6)
    except Exception:
        return 0.0


def setup_output_dirs(output_root: str, checkpoint_name: str):
    """<root>/<name>/{checkpoints,logs,predictions}
    (config_builder_util.py:78-92)."""
    base = os.path.join(output_root, checkpoint_name)
    paths = {
        "base": base,
        "checkpoints": os.path.join(base, "checkpoints"),
        "logs": os.path.join(base, "logs"),
        "predictions": os.path.join(base, "predictions"),
    }
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    return paths


def train(
    model,
    loss_fn: Callable,
    make_train_step: Callable,
    init_batch: dict,
    next_batch: Callable[[], dict],
    pipeline_cfg: PipelineConfig,
    output_root: str,
    num_devices: Optional[int] = None,
    seed: int = 0,
    init_params_from=None,
    init_rngs: Optional[dict] = None,
    log_every_steps: Optional[int] = None,
    prefetch: int = 2,
    profile_steps: Optional[tuple] = None,
):
    """Generic two-stage trainer.

    Args:
      model: flax module with .init/.apply.
      loss_fn: predictions -> (loss_dict, total).
      make_train_step: loss_fn -> jitted step(state, batch, rng).
      init_batch: one host batch used for parameter init shapes.
      next_batch: callable yielding successive host batches.
      pipeline_cfg: full pipeline config (train_config drives the loop).
      output_root: outputs root directory.
      num_devices: data-parallel world size (defaults to all).
      init_params_from: optional params pytree for warm start
        (RPN->RCNN transfer via checkpoint.restore_matching).
      profile_steps: optional (start, stop) step range captured with
        jax.profiler into <logs>/profile — the per-op replacement for the
        reference's per-step wall-clock + MaxBytesInUse logging
        (trainer.py:99); open the xplane trace in TensorBoard/XProf.
    Returns:
      final TrainState.
    """
    tc = pipeline_cfg.train_config
    name = pipeline_cfg.model_config.checkpoint_name
    paths = setup_output_dirs(output_root, name)
    save_config(pipeline_cfg, os.path.join(paths["base"], name + "_config.json"))

    mesh = make_data_mesh(num_devices)
    world = mesh.devices.size

    rngs = init_rngs or {
        "params": jax.random.PRNGKey(seed),
        "dropout": jax.random.PRNGKey(seed + 1),
        "path_drop": jax.random.PRNGKey(seed + 2),
    }
    # jit the init: eager init dispatches op-by-op (catastrophically slow
    # over remote TPU transports).
    init_fn = jax.jit(
        lambda rngs, *args: model.init(rngs, *args, training=False)
    )
    variables = init_fn(rngs, *init_batch.values())
    params = variables["params"]
    if init_params_from is not None:
        from heterofusionrcnn_tpu.runtime.checkpoint import restore_matching

        params = restore_matching(params, init_params_from)

    tx = build_optimizer(
        tc.optimizer, world_size=world, grad_clip_norm=tc.grad_clip_norm
    )
    state = TrainState.create(
        model.apply, params, variables.get("batch_stats", {}), tx
    )

    ckpt = CheckpointManager(paths["checkpoints"], tc.max_checkpoints_to_keep)
    if not tc.overwrite_checkpoints and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"Resumed from step {int(state.step)}")

    state = replicate_state(state, mesh)
    train_step = make_train_step(loss_fn)
    logger = MetricsLogger(
        paths["logs"],
        histograms=tc.summary_histograms,
        img_images=tc.summary_img_images,
        pc_images=tc.summary_pc_images,
    )
    log_every = log_every_steps or tc.summary_interval

    # Iteration budget divided by world size (trainer.py:146-152).
    max_iters = tc.max_iterations // world
    rng = jax.random.PRNGKey(seed + 100)

    # Overlap host-side batch prep AND the host->device upload with device
    # steps (the reference loaded feed_dicts synchronously — its known
    # input bottleneck, SURVEY.md §3.1; on slow transports the upload
    # otherwise serializes with compute).
    def prep(b):
        return b, shard_batch(b, mesh)

    if prefetch > 0:
        from heterofusionrcnn_tpu.datasets.prefetch import BatchPrefetcher

        prefetcher = BatchPrefetcher(
            next_batch, capacity=prefetch, transform=prep
        )
        get_batch = prefetcher.next
    else:
        prefetcher = None
        get_batch = lambda: prep(next_batch())  # noqa: E731

    # Host-side step counter: int(state.step) every iteration would force
    # a device sync per step (one transport RTT each).
    step = int(state.step)
    t_last = time.time()
    profiling = False

    def _stop_profile(st):
        # block_until_ready is a no-op on some remote transports (CLAUDE.md)
        # — force completion with a scalar device->host transfer instead.
        float(jax.tree_util.tree_leaves(st.params)[0].ravel()[0])
        jax.profiler.stop_trace()

    while step < max_iters:
        if profile_steps is not None:
            if step == profile_steps[0] and not profiling:
                jax.profiler.start_trace(os.path.join(paths["logs"], "profile"))
                profiling = True
            elif step >= profile_steps[1] and profiling:
                _stop_profile(state)
                profiling = False
        host_batch, batch = get_batch()
        state, metrics, rng = train_step(state, batch, rng)
        step += 1

        if step % log_every == 0:
            dt = time.time() - t_last
            t_last = time.time()
            # One packed transfer — per-scalar float() pays one transport
            # round trip per metric on tunneled devices.
            names = sorted(metrics)
            vals = np.asarray(
                jax.device_get(jnp.stack([metrics[k] for k in names]))
            )
            host_metrics = dict(zip(names, map(float, vals)))
            host_metrics["steps_per_sec"] = log_every / max(dt, 1e-9)
            host_metrics["device_mem_mb"] = device_memory_mb()
            # Host RSS: the round-5 10k-step run was OOM-killed at ~130 GB
            # anon (13 MB/step growth) — keep the curve in every ledger so
            # a leak is visible long before the kernel's kill.
            rss_mb = _host_rss_mb()
            host_metrics["host_rss_mb"] = rss_mb
            logger.log(step, host_metrics)
            logger.log_param_histograms(step, state.params)
            logger.log_input_summaries(step, host_batch)
            print(
                f"step {step}/{max_iters} "
                + " ".join(f"{k}={v:.4f}" for k, v in host_metrics.items())
            )
            # Graceful restart point: when HFR_MAX_HOST_RSS_MB is set and the
            # process outgrows it (the round-5 leak), checkpoint NOW and exit
            # 75 (EX_TEMPFAIL) so an outer loop can relaunch — resume picks up
            # at this exact step instead of losing up to checkpoint_interval
            # steps to the kernel's OOM kill.
            max_rss = float(os.environ.get("HFR_MAX_HOST_RSS_MB", "0") or 0)
            if max_rss and rss_mb > max_rss:
                ckpt.save(step, jax.device_get(state))
                if prefetcher is not None:
                    prefetcher.close()
                logger.close()
                ckpt.close()
                print(
                    f"host RSS {rss_mb:.0f} MB > {max_rss:.0f} MB limit — "
                    f"checkpointed at step {step}, exiting 75 for relaunch",
                    flush=True,
                )
                raise SystemExit(75)

        if step % tc.checkpoint_interval == 0 or step == max_iters:
            ckpt.save(step, jax.device_get(state))

    # Trace capture can outlive the loop when the stop step lands on or
    # beyond max_iterations — flush it before shutdown or it is lost.
    if profiling:
        _stop_profile(state)

    if step % tc.checkpoint_interval != 0:
        ckpt.save(step, jax.device_get(state))
    if prefetcher is not None:
        prefetcher.close()
    logger.close()
    ckpt.close()
    return state
