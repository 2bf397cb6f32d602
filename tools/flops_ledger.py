"""FLOPs / MFU roofline ledger for the fused two-stage inference path.

For each benchmark stage (the exact jitted fns bench.py measures, via
bench.build_stages) this reports:
  - GFLOP        : XLA cost-model flops of the compiled HLO
  - GB           : XLA cost-model bytes accessed (HBM traffic estimate)
  - ms           : measured wall clock (pipelined, tunnel-sync method)
  - TFLOP/s, MFU : achieved compute rate vs the chip's bf16 peak
  - GB/s, %BW    : achieved bandwidth vs the chip's HBM peak
  - bound        : which roofline wall is closer (compute vs memory),
                   i.e. max(flops/peak_flops, bytes/peak_bw) picks the wall

Answers VERDICT.md round-2 finding #1: where the fps gap lives and how much
headroom each stage has. The reference has no such accounting; its closest
analog is the kernel-microbenchmark habit (grouping/test/*.cu).

Usage:
  python tools/flops_ledger.py [--batch 4] [--iters 10] [--json out.json]

Peak numbers are for TPU v5e (1 chip): 197 TFLOP/s bf16, 819 GB/s HBM.
On other platforms the MFU column is still computed against v5e peaks, so
only run the ledger on the real chip for meaningful percentages.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BPS = 819e9


def cost_of(jitted, *args):
    """XLA cost-model (flops, bytes accessed) of a compiled jitted fn."""
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def timeit(fn, args, iters, warmup=3, sync=None):
    """Pipelined wall-clock ms/call (one trailing sync — axon tunnel)."""
    import jax

    if sync is None:
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            return float(leaf.ravel()[0])

    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def ledger_row(name, flops, bytes_, ms):
    tflops = flops / (ms * 1e-3) / 1e12 if ms > 0 else 0.0
    mfu = tflops * 1e12 / V5E_PEAK_BF16_FLOPS
    gbps = bytes_ / (ms * 1e-3) / 1e9 if ms > 0 else 0.0
    bw_frac = gbps * 1e9 / V5E_PEAK_HBM_BPS
    # Roofline: the wall with the larger minimum-time claim binds.
    t_compute = flops / V5E_PEAK_BF16_FLOPS
    t_memory = bytes_ / V5E_PEAK_HBM_BPS
    bound = "compute" if t_compute >= t_memory else "memory"
    floor_ms = max(t_compute, t_memory) * 1e3
    return {
        "stage": name,
        "gflop": flops / 1e9,
        "gb": bytes_ / 1e9,
        "ms": ms,
        "tflops": tflops,
        "mfu": mfu,
        "gbps": gbps,
        "bw_frac": bw_frac,
        "bound": bound,
        "roofline_floor_ms": floor_ms,
        "headroom_x": ms / floor_ms if floor_ms > 0 else float("inf"),
    }


def print_table(rows, batch):
    hdr = (
        f"{'stage':26s} {'GFLOP':>8s} {'GB':>7s} {'ms':>8s} {'TFLOP/s':>8s} "
        f"{'MFU%':>6s} {'GB/s':>7s} {'BW%':>6s} {'bound':>8s} "
        f"{'floor_ms':>8s} {'headroom':>8s}"
    )
    print(f"\n--- roofline ledger (batch {batch}, v5e peaks) ---")
    print(hdr)
    for r in rows:
        print(
            f"{r['stage']:26s} {r['gflop']:8.1f} {r['gb']:7.2f} "
            f"{r['ms']:8.2f} {r['tflops']:8.2f} {100 * r['mfu']:6.1f} "
            f"{r['gbps']:7.0f} {100 * r['bw_frac']:6.1f} {r['bound']:>8s} "
            f"{r['roofline_floor_ms']:8.2f} {r['headroom_x']:7.1f}x"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--json", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_stages

    st = build_stages(args.batch)
    B = args.batch
    rows = []

    # ---- the three bench-visible stages ---- #
    fused_args = (st["rpn_vars"], st["rcnn_vars"], st["pc"], st["img"], st["p2"])
    f_flops, f_bytes = cost_of(st["fused"], *fused_args)
    f_ms = timeit(
        st["fused"], fused_args, args.iters,
        sync=lambda o: float(o["final_scores"].ravel()[0]),
    )
    rows.append(ledger_row("fused_two_stage", f_flops, f_bytes, f_ms))

    rpn_args = (st["rpn_vars"], st["pc"], st["img"], st["p2"])
    r_flops, r_bytes = cost_of(st["rpn_stage"], *rpn_args)
    r_ms = timeit(
        st["rpn_stage"], rpn_args, args.iters,
        sync=lambda o: float(o["proposals"].ravel()[0]),
    )
    rows.append(ledger_row("rpn_stage", r_flops, r_bytes, r_ms))

    rpn_out = st["rpn_stage"](*rpn_args)
    rc_args = (st["rcnn_vars"], rpn_out, st["img"], st["p2"])
    c_flops, c_bytes = cost_of(st["rcnn_stage"], *rc_args)
    c_ms = timeit(
        st["rcnn_stage"], rc_args, args.iters,
        sync=lambda o: float(o["final_scores"].ravel()[0]),
    )
    rows.append(ledger_row("rcnn_stage", c_flops, c_bytes, c_ms))

    # ---- extractor sub-stages (attribute the big stage budgets) ---- #
    from heterofusionrcnn_tpu.models.extractors.img_vgg_pyr import (
        ImgVgg, ImgVggPyr, preprocess_image,
    )
    from heterofusionrcnn_tpu.models.extractors.pointcnn import PointCNN

    dtype_name = os.environ.get("HFR_COMPUTE_DTYPE", "bfloat16")
    mod_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None
    lc = st["rpn_cfg"].model_config.layers_config
    pts = st["pc"][..., :3]

    pcnn = PointCNN(lc.pc_pointcnn, dtype=mod_dtype, name="pc")
    pcnn_vars = jax.jit(lambda r, a: pcnn.init(r, a, None, False))(
        jax.random.PRNGKey(0), pts[:1]
    )
    f = jax.jit(lambda v, a: pcnn.apply(v, a, None, False)[1])
    fl, by = cost_of(f, pcnn_vars, pts)
    ms = timeit(f, (pcnn_vars, pts), args.iters)
    rows.append(ledger_row("rpn_pointcnn", fl, by, ms))

    img_cls = ImgVgg if lc.img_extractor_type == "vgg" else ImgVggPyr
    vgg = img_cls(lc.img_vgg_pyr, dtype=mod_dtype, name="img")
    vgg_vars = jax.jit(lambda r, a: vgg.init(r, a, False))(
        jax.random.PRNGKey(0), preprocess_image(st["img"][:1])
    )
    f = jax.jit(lambda v, a: vgg.apply(v, preprocess_image(a), False))
    fl, by = cost_of(f, vgg_vars, st["img"])
    ms = timeit(f, (vgg_vars, st["img"]), args.iters)
    rows.append(ledger_row("img_vgg_pyr", fl, by, ms))

    s2 = PointCNN(
        st["rcnn_cfg"].model_config.layers_config.rcnn_pc_pointcnn,
        dtype=mod_dtype, name="s2",
    )
    n_prop = st["rpn_cfg"].model_config.rpn_config.rpn_test_post_nms_size
    Rc = st["rcnn_cfg"].model_config.rcnn_config.rcnn_proposal_roi_crop_size
    N = B * n_prop
    rng = np.random.default_rng(1)
    crop_pts = jnp.asarray(rng.standard_normal((N, Rc, 3)).astype(np.float32))
    merged = jnp.asarray(
        rng.standard_normal((N, Rc, 288 + 256)).astype(np.float32)
    )
    s2_vars = jax.jit(lambda r, a, ft: s2.init(r, a, ft, False))(
        jax.random.PRNGKey(2), crop_pts[:8], merged[:8]
    )
    f = jax.jit(lambda v, a, ft: s2.apply(v, a, ft, False)[1])
    fl, by = cost_of(f, s2_vars, crop_pts, merged)
    ms = timeit(f, (s2_vars, crop_pts, merged), args.iters)
    rows.append(ledger_row("rcnn_stage2_pointcnn", fl, by, ms))

    print_table(rows, B)
    fps = B / f_ms * 1000.0
    print(
        f"\nfused: {fps:.1f} fps (target 50);"
        f" roofline floor {rows[0]['roofline_floor_ms']:.1f} ms/batch ="
        f" {B / rows[0]['roofline_floor_ms'] * 1000:.0f} fps"
        f" -> the 50 fps target {'IS' if B / rows[0]['roofline_floor_ms'] * 1000 >= 50 else 'IS NOT'}"
        " inside the hardware roofline at this graph shape"
    )
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"batch": B, "rows": rows}, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
