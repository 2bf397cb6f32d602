"""Benchmark: end-to-end two-stage (RPN -> RCNN) inference frames/sec/chip.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
plus a diagnostic JSON line on STDERR with stage-split timings and
per-block throughput so perf movement is attributable across rounds
(stderr so metric-line parsers see exactly one stdout line).

Baseline target (BASELINE.json): >= 50 frames/sec/chip end-to-end RPN+RCNN
on TPU v5e. Measures the fused single-process path (run_inference's splice):
full-scale PointCNN+VGG RPN on 16384 points -> bin decode -> top-k ->
oriented NMS -> 100 proposals/frame -> RCNN RoI pooling (512-pt crops +
image crops) -> second-stage PointCNN -> refinement -> final NMS.

Methodology notes (tunneled axon TPU):
  - Inputs are device_put ONCE — the tunnel moves ~40 MB/s, so feeding the
    20 MB image batch from host every call measures the tunnel, not the
    chip. (Production hosts feed over PCIe; input pipelining is measured
    separately in the trainer's prefetch path.)
  - block_until_ready() is a no-op on axon; syncing transfers one on-device
    scalar slice per call instead.
  - Throughput is measured over REPEAT blocks of ITERS calls each with ONE
    trailing sync per block (the stream is in-order; syncing every call
    would add a ~33 ms RTT each). Reported number is the median block
    (back-to-back runs stay within ~±10%; the warmup block also absorbs
    persistent-cache compiles).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 50.0
BATCH = int(os.environ.get("HFR_BENCH_BATCH", "4"))
ITERS = 15
REPEAT = 3


def _pipelined_ms(fn, args, sync, iters):
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    # One trailing sync: the device stream is in-order and every blocking
    # device->host scalar read costs a ~33 ms tunnel RTT.
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters * 1000.0


def build_stages(batch_size=BATCH, dtype=None):
    """Build the fused two-stage inference path at production scale.

    Returns a dict with the jitted stage fns (`rpn_stage`, `rcnn_stage`,
    `fused`), their variables and device-resident inputs — shared between
    bench.py and tools/flops_ledger.py so the ledger attributes exactly the
    graph the benchmark measures.
    """
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _CLUSTER_SIZES, _random_rpn_batch
    from heterofusionrcnn_tpu.configs.presets import rcnn_multiclass, rpn_multiclass
    from heterofusionrcnn_tpu.models.rcnn import RcnnModel
    from heterofusionrcnn_tpu.models.rpn import RpnModel

    rpn_cfg = rpn_multiclass()
    rcnn_cfg = rcnn_multiclass()
    # Inference compute dtype (A/B knob): HFR_COMPUTE_DTYPE=float32 to
    # disable the bf16 default. Params stay f32; logits/geometry are f32.
    if dtype is None:
        dtype = os.environ.get("HFR_COMPUTE_DTYPE", "bfloat16")
    rpn_cfg.model_config.compute_dtype = dtype
    rcnn_cfg.model_config.compute_dtype = dtype

    # Image-resolution A/B knob: HFR_IMG_DOWNSAMPLE=2 runs the VGG at
    # half-res (conv cost on v5e scales with pixels — STATUS.md).
    img_ds = int(os.environ.get("HFR_IMG_DOWNSAMPLE", "1"))
    rpn_cfg.model_config.layers_config.img_vgg_pyr.downsample = img_ds
    rcnn_cfg.model_config.layers_config.img_vgg_pyr.downsample = img_ds

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
    batch = _random_rpn_batch(rpn_cfg, batch_size, rng)
    pc = jax.device_put(batch["point_cloud"])
    img = jax.device_put(batch["image_input"])
    p2 = jax.device_put(batch["stereo_calib_p2"])
    n_prop = rpn_cfg.model_config.rpn_config.rpn_test_post_nms_size

    rpn_init = jax.jit(
        lambda r, a, b, c: rpn_model.init(r, a, b, c, training=False)
    )
    rpn_vars = rpn_init({"params": jax.random.PRNGKey(0)}, pc[:1], img[:1], p2[:1])

    p = rpn_cfg.model_config.input_config.pc_sample_pts
    fts_dim = 256 + 32  # pc fc output + vgg_conv1 filters
    dummy = {
        "proposals": np.zeros((1, n_prop, 7), np.float32),
        "iou": np.zeros((1, n_prop), np.float32),
        "gt": np.zeros((1, n_prop, 8), np.float32),
        "fg": np.ones((1, p), np.float32),
        "fts": np.zeros((1, p, fts_dim), np.float32),
    }
    rcnn_init = jax.jit(lambda r, *a: rcnn_model.init(r, *a, training=False))
    rcnn_vars = rcnn_init(
        {"params": jax.random.PRNGKey(1)},
        dummy["proposals"], dummy["iou"], dummy["gt"], pc[:1, :, :3],
        pc[:1, :, 3], dummy["fg"], dummy["fts"], img[:1], p2[:1],
    )

    @jax.jit
    def rpn_stage(rpn_v, pc_, img_, p2_):
        return rpn_model.apply(rpn_v, pc_, img_, p2_, training=False)

    # Shared-VGG fused mode (one image-extractor pass per frame): the default
    # for the fused benchmark; HFR_SHARED_VGG=0 to A/B the reference-style
    # recompute-in-both-stages behavior.
    shared_vgg = os.environ.get("HFR_SHARED_VGG", "1") == "1"
    rcnn_cfg.model_config.rcnn_config.rcnn_use_rpn_img_feature_map = shared_vgg

    @jax.jit
    def rcnn_stage(rcnn_v, rpn_out, img_, p2_):
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
            img_,
            p2_,
            training=False,
            img_feature_map=rpn_out["img_feature_map"] if shared_vgg else None,
        )
        return {
            "final_boxes": rcnn_out["final_boxes"],
            "final_scores": rcnn_out["final_scores"],
            "num_final": rcnn_out["num_boxes_before_padding"],
        }

    @jax.jit
    def fused(rpn_v, rcnn_v, pc_, img_, p2_):
        return rcnn_stage(rcnn_v, rpn_stage(rpn_v, pc_, img_, p2_), img_, p2_)

    return {
        "rpn_cfg": rpn_cfg,
        "rcnn_cfg": rcnn_cfg,
        "rpn_model": rpn_model,
        "rcnn_model": rcnn_model,
        "rpn_vars": rpn_vars,
        "rcnn_vars": rcnn_vars,
        "rpn_stage": rpn_stage,
        "rcnn_stage": rcnn_stage,
        "fused": fused,
        "pc": pc,
        "img": img,
        "p2": p2,
        "batch_size": batch_size,
    }


def main():
    import jax  # noqa: F401

    if os.environ.get("HFR_BENCH_FAIL_INJECT"):
        # Test hook (tests/test_bench_fallback.py): simulate a kernel that
        # fails at trace/lowering time so the safe-mode emission path is
        # exercised without a real broken kernel.
        raise RuntimeError("injected failure (HFR_BENCH_FAIL_INJECT)")

    st = build_stages(BATCH)
    fused = st["fused"]
    rpn_stage, rcnn_stage = st["rpn_stage"], st["rcnn_stage"]
    rpn_vars, rcnn_vars = st["rpn_vars"], st["rcnn_vars"]
    pc, img, p2 = st["pc"], st["img"], st["p2"]

    args = (rpn_vars, rcnn_vars, pc, img, p2)

    def sync(out):
        return float(out["final_scores"].ravel()[0])

    def sync_rpn(out):
        return float(out["proposals"].ravel()[0])

    # Warmup block: compiles + cache warm.
    out = None
    for _ in range(3):
        out = fused(*args)
    sync(out)

    block_fps = []
    for _ in range(REPEAT):
        ms = _pipelined_ms(fused, args, sync, ITERS)
        block_fps.append(BATCH / ms * 1000.0)
    fps = float(np.median(block_fps))

    print(
        json.dumps(
            {
                "metric": "two_stage_e2e_inference_fps",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        ),
        flush=True,
    )

    # ---------------- stage-split diagnostics ---------------- #
    rpn_args = (rpn_vars, pc, img, p2)
    for _ in range(2):
        rpn_out = rpn_stage(*rpn_args)
    sync_rpn(rpn_out)
    rpn_ms = _pipelined_ms(rpn_stage, rpn_args, sync_rpn, ITERS)

    rcnn_args = (rcnn_vars, rpn_out, img, p2)
    for _ in range(2):
        rc_out = rcnn_stage(*rcnn_args)
    sync(rc_out)
    rcnn_ms = _pipelined_ms(rcnn_stage, rcnn_args, sync, ITERS)

    # Roofline attribution of the measured graph (VERDICT r2 #1): XLA
    # cost-model FLOPs/bytes of the exact compiled fused fn vs v5e peaks
    # (197 TFLOP/s bf16, 819 GB/s HBM). The full per-stage table lives in
    # tools/flops_ledger.py; this line keeps the headline attributable.
    roofline = {}
    try:
        ca = fused.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        gflop = float(ca.get("flops", 0.0)) / 1e9
        gb = float(ca.get("bytes accessed", 0.0)) / 1e9
        ms = BATCH / fps * 1000.0
        roofline = {
            "gflop_per_batch": round(gflop, 1),
            "hbm_gb_per_batch": round(gb, 2),
            "mfu": round(gflop / 1e3 / (197.0 * ms / 1e3), 4),
            "hbm_bw_frac": round(gb / (819.0 * ms / 1e3), 3),
        }
    except Exception as exc:  # cost_analysis availability varies by backend
        roofline = {"error": str(exc)[:120]}

    print(
        json.dumps(
            {
                "diagnostic": {
                    "batch": BATCH,
                    "block_fps": [round(f, 2) for f in block_fps],
                    "fused_ms_per_batch": round(BATCH / fps * 1000.0, 1),
                    "rpn_ms_per_batch": round(rpn_ms, 1),
                    "rcnn_ms_per_batch": round(rcnn_ms, 1),
                    "roofline": roofline,
                }
            }
        ),
        file=sys.stderr,
        flush=True,
    )


def _safe_mode_retry(exc: BaseException) -> None:
    """One broken kernel must never zero out a round's scoreboard.

    If the default (Pallas-dispatching) path fails anywhere — trace, Mosaic
    lowering, or execution — re-run this script once in safe mode
    (HFR_FORCE_XLA_OPS=1 + HFR_NO_FUSED_XCONV=1: every op pinned to its XLA
    twin, see ops/dispatch.py) and forward its metric line with an "error"
    field recording the primary failure. If safe mode also fails, emit a
    value-0 metric line with both errors rather than a bare traceback.
    """
    import subprocess

    primary = f"{type(exc).__name__}: {exc}"[:400]
    print(f"[bench] default path failed, retrying in safe mode: {primary}",
          file=sys.stderr, flush=True)
    env = dict(os.environ)
    env["HFR_FORCE_XLA_OPS"] = "1"
    env["HFR_NO_FUSED_XCONV"] = "1"
    env["HFR_BENCH_SAFE_MODE"] = "1"
    # Belt-and-braces: the A/B kernel knobs must not survive into safe mode
    # (pallas_ok() already pins them, but an env-only gate would not be).
    env["HFR_PALLAS_CONV"] = "0"
    env["HFR_PALLAS_CROP"] = "0"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
    except subprocess.TimeoutExpired as texc:
        # A hung safe-mode run must still leave a metric line on the
        # scoreboard rather than an uncaught traceback.
        print(json.dumps({
            "metric": "two_stage_e2e_inference_fps",
            "value": 0.0,
            "unit": "frames/sec/chip",
            "vs_baseline": 0.0,
            "error": primary,
            "safe_mode_error": f"safe-mode retry timed out: {texc}"[:400],
        }), flush=True)
        return
    sys.stderr.write(proc.stderr)
    line = None
    for cand in proc.stdout.splitlines():
        try:
            rec = json.loads(cand)
        except json.JSONDecodeError:
            continue
        if isinstance(rec, dict) and "metric" in rec:
            line = rec
            break
    if proc.returncode == 0 and line is not None:
        line["error"] = primary
        line["safe_mode"] = True
    else:
        line = {
            "metric": "two_stage_e2e_inference_fps",
            "value": 0.0,
            "unit": "frames/sec/chip",
            "vs_baseline": 0.0,
            "error": primary,
            "safe_mode_error": proc.stderr.strip()[-400:] or f"rc={proc.returncode}",
        }
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    if os.environ.get("HFR_BENCH_SAFE_MODE") == "1":
        main()  # already the fallback — let real failures surface
    else:
        try:
            main()
        except (KeyboardInterrupt, SystemExit):
            raise  # a Ctrl-C must not trigger an hour-long safe-mode re-run
        except BaseException as exc:  # noqa: BLE001 — scoreboard guard
            _safe_mode_retry(exc)
