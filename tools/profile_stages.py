"""Stage-bisection profiler for the fused two-stage inference path.

The axon tunnel defeats jax.profiler xplane parsing (see CLAUDE.md), so this
times jitted sub-graphs of the pipeline in one process with pipelined
throughput timing (queue ITERS calls, one trailing sync — block_until_ready
is a no-op on axon and each sync costs ~33 ms RTT).

Usage:  python tools/profile_stages.py [--iters 20] [--only rpn,rcnn,...]
Prints one line per stage: name, ms/call (trimmed mean), and the batch size.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4


def timeit(fn, args, iters, warmup=3, sync=None):
    """Pipelined wall-clock of a jitted fn. Returns ms per call."""
    import jax

    if sync is None:
        # Slice ON DEVICE then pull one scalar — np.asarray(leaf) would drag
        # the whole output through the ~40 MB/s axon tunnel.
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            return float(leaf.ravel()[0])

    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)

    t0 = time.perf_counter()
    # Keep only the newest output reference: dispatch stays pipelined, but
    # earlier outputs become garbage and their HBM is freed — holding all
    # iters outputs OOMs on GB-sized intermediates.
    for _ in range(iters):
        out = fn(*args)
    # Sync ONLY the last output: the stream is in-order and each blocking
    # scalar read costs a full ~33 ms tunnel RTT (syncing all outputs adds
    # +33 ms/call of measurement bias).
    sync(out)
    dt = time.perf_counter() - t0
    return dt / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--batch", type=int, default=BATCH)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _CLUSTER_SIZES, _random_rpn_batch
    from heterofusionrcnn_tpu.configs.presets import rcnn_multiclass, rpn_multiclass
    from heterofusionrcnn_tpu.models.rcnn import RcnnModel
    from heterofusionrcnn_tpu.models.rpn import RpnModel

    B = args.batch
    rpn_cfg = rpn_multiclass()
    rcnn_cfg = rcnn_multiclass()
    # Match bench.py's dtype knob (bf16 default).
    dtype_name = os.environ.get("HFR_COMPUTE_DTYPE", "bfloat16")
    rpn_cfg.model_config.compute_dtype = dtype_name
    rcnn_cfg.model_config.compute_dtype = dtype_name
    act_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    batch = _random_rpn_batch(rpn_cfg, B, rng)
    pc = jnp.asarray(batch["point_cloud"])
    img = jnp.asarray(batch["image_input"])
    p2 = jnp.asarray(batch["stereo_calib_p2"])

    results = {}

    def run(name, fn, fargs, **kw):
        if only and name not in only:
            return
        ms = timeit(fn, fargs, args.iters, **kw)
        results[name] = ms
        print(f"{name:34s} {ms:9.2f} ms  (batch {B})", flush=True)

    # ---------------- isolated ops ---------------- #
    from heterofusionrcnn_tpu.ops.grouping import knn_point
    from heterofusionrcnn_tpu.ops.sampling import farthest_point_sample

    pts = pc[..., :3]
    sub4096 = pts[:, :4096]
    run("knn_16384x16384_k8", jax.jit(lambda a: knn_point(8, a, a)[1]), (pts,))
    run(
        "knn_4096q_x16384_k8",
        jax.jit(lambda a, q: knn_point(8, a, q)[1]),
        (pts, sub4096),
    )
    run(
        "knn_16384q_x4096_k8",
        jax.jit(lambda a, q: knn_point(8, a, q)[1]),
        (sub4096, pts),
    )
    run("fps_16384_to_4096", jax.jit(lambda a: farthest_point_sample(a, 4096)), (pts,))
    run("fps_16384_to_1024", jax.jit(lambda a: farthest_point_sample(a, 1024)), (pts,))

    # ---------------- RPN pieces ---------------- #
    rpn_model = RpnModel(
        config=rpn_cfg.model_config, num_classes=3,
        cluster_sizes=_CLUSTER_SIZES, mode="test", save_rpn_feature=True,
    )
    rpn_init = jax.jit(
        lambda r, a, b_, c: rpn_model.init(r, a, b_, c, training=False)
    )
    rpn_vars = rpn_init({"params": jax.random.PRNGKey(0)}, pc[:1], img[:1], p2[:1])

    run(
        "rpn_full_test_mode",
        jax.jit(lambda v, a, b_, c: rpn_model.apply(v, a, b_, c, training=False)),
        (rpn_vars, pc, img, p2),
        sync=lambda o: float(o["proposals"].ravel()[0]),
    )

    # Extractors in isolation (same params as the full model).
    from heterofusionrcnn_tpu.models.extractors.img_vgg_pyr import (
        ImgVgg, ImgVggPyr, preprocess_image,
    )
    from heterofusionrcnn_tpu.models.extractors.pointcnn import PointCNN

    lc = rpn_cfg.model_config.layers_config
    mod_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None
    pcnn = PointCNN(lc.pc_pointcnn, dtype=mod_dtype, name="pc")
    pcnn_vars = jax.jit(lambda r, a: pcnn.init(r, a, None, False))(
        jax.random.PRNGKey(0), pts[:1]
    )
    run(
        "rpn_pointcnn_extractor",
        jax.jit(lambda v, a: pcnn.apply(v, a, None, False)[1]),
        (pcnn_vars, pts),
    )

    img_cls = ImgVgg if lc.img_extractor_type == "vgg" else ImgVggPyr
    vgg = img_cls(lc.img_vgg_pyr, dtype=mod_dtype, name="img")
    vgg_vars = jax.jit(lambda r, a: vgg.init(r, a, False))(
        jax.random.PRNGKey(0), preprocess_image(img[:1])
    )
    run(
        "rpn_img_extractor",
        jax.jit(lambda v, a: vgg.apply(v, preprocess_image(a), False)),
        (vgg_vars, img),
    )

    # Proposal post-processing block: decode happens inside the model; time
    # top_k + NMS on synthetic clustered boxes instead.
    from heterofusionrcnn_tpu.ops.nms import oriented_nms_boxes_3d

    rpc = rpn_cfg.model_config.rpn_config
    P = pts.shape[1]
    conf = jnp.asarray(rng.uniform(0, 1, (B, P)).astype(np.float32))
    boxes_all = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-40, 40, (B, P, 2)),
                rng.uniform(0, 70, (B, P, 1)),
                rng.uniform(1.4, 4.0, (B, P, 3)),
                rng.uniform(-3.14, 3.14, (B, P, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
    )

    @jax.jit
    def topk_nms(bx, cf):
        tc, ti = jax.lax.top_k(cf, rpc.rpn_test_pre_nms_size)
        tb = jnp.take_along_axis(bx, ti[..., None], axis=1)

        def one(b_, s):
            ki, kv = oriented_nms_boxes_3d(
                b_, s, rpc.rpn_test_nms_iou_thresh, rpc.rpn_test_post_nms_size
            )
            return ki, kv

        return jax.vmap(one)(tb, tc)

    run("rpn_topk9000_nms100", topk_nms, (boxes_all, conf))

    # ---------------- RCNN pieces ---------------- #
    n_prop = rpc.rpn_test_post_nms_size
    fts_dim = 256 + 32
    rcnn_model = RcnnModel(
        config=rcnn_cfg.model_config, num_classes=3,
        cluster_sizes=_CLUSTER_SIZES, mode="test",
    )
    proposals = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-30, 30, (B, n_prop, 2)),
                rng.uniform(5, 60, (B, n_prop, 1)),
                rng.uniform(1.4, 4.0, (B, n_prop, 3)),
                rng.uniform(-3.14, 3.14, (B, n_prop, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    rpn_fts = jnp.asarray(rng.standard_normal((B, P, fts_dim)).astype(np.float32))
    fg = jnp.ones((B, P), jnp.float32)
    inten = pc[..., 3]
    zeros_iou = jnp.zeros((B, n_prop))
    zeros_gt = jnp.zeros((B, n_prop, 8))

    rcnn_init = jax.jit(lambda r, *a: rcnn_model.init(r, *a, training=False))
    rcnn_vars = rcnn_init(
        jax.random.PRNGKey(1),
        proposals[:1], zeros_iou[:1], zeros_gt[:1], pts[:1], inten[:1],
        fg[:1], rpn_fts[:1], img[:1], p2[:1],
    )

    run(
        "rcnn_full_test_mode",
        jax.jit(
            lambda v, *a: rcnn_model.apply(v, *a, training=False)
        ),
        (rcnn_vars, proposals, zeros_iou, zeros_gt, pts, inten, fg, rpn_fts,
         img, p2),
        sync=lambda o: float(o["final_scores"].ravel()[0]),
    )

    # RoI crop alone.
    from heterofusionrcnn_tpu.core.geometry import box_3d_to_corners, expand_box_3d
    from heterofusionrcnn_tpu.ops.cropping import pc_crop_and_sample

    rc = rcnn_cfg.model_config.rcnn_config
    box_ind = jnp.repeat(jnp.arange(B, dtype=jnp.int32), n_prop)

    @jax.jit
    def crop_only(props, pt, ft, it, fm):
        flat = props.reshape(B * n_prop, 7)
        corners = box_3d_to_corners(expand_box_3d(flat, rc.rcnn_pooling_context_length))
        return pc_crop_and_sample(
            pt, ft, it[..., None], fm, corners, box_ind,
            rc.rcnn_proposal_roi_crop_size,
        )[0]

    run("rcnn_pc_crop", crop_only, (proposals, pts, rpn_fts, inten, fg))

    # Stage-2 PointCNN alone.
    s2 = PointCNN(rcnn_cfg.model_config.layers_config.rcnn_pc_pointcnn,
                  dtype=mod_dtype, name="s2")
    N = B * n_prop
    Rc = rc.rcnn_proposal_roi_crop_size
    crop_pts = jnp.asarray(rng.standard_normal((N, Rc, 3)).astype(np.float32))
    merged = jnp.asarray(
        rng.standard_normal((N, Rc, fts_dim + 256)).astype(np.float32),
        dtype=act_dtype,
    )
    s2_vars = jax.jit(lambda r, a, f: s2.init(r, a, f, False))(
        jax.random.PRNGKey(2), crop_pts[:8], merged[:8]
    )
    run(
        "rcnn_stage2_pointcnn",
        jax.jit(lambda v, a, f: s2.apply(v, a, f, False)[1]),
        (s2_vars, crop_pts, merged),
    )

    # ---------------- stage-2 internals ---------------- #
    from heterofusionrcnn_tpu.models.extractors.pointcnn import XConv
    from heterofusionrcnn_tpu.ops.grouping import group_point

    run(
        "s2_knn_400x512x512_k4",
        jax.jit(lambda a: knn_point(4, a, a)[1]),
        (crop_pts,),
    )
    run(
        "s2_fps_400_512_to_128",
        jax.jit(lambda a: farthest_point_sample(a, 128)),
        (crop_pts,),
    )
    idx4 = jnp.zeros((N, Rc, 4), jnp.int32)
    run(
        "s2_group_point_544ch",
        jax.jit(lambda f, i: group_point(f, i)),
        (merged, idx4),
    )
    xc1 = XConv(K=4, D=1, C=512, C_pts_fts=128, depth_multiplier=4,
                dtype=mod_dtype, name="xc1")
    xc1_vars = jax.jit(
        lambda r, p_, f_, q_: xc1.init(r, p_, f_, q_, False)
    )(jax.random.PRNGKey(3), crop_pts[:8], merged[:8], crop_pts[:8])
    run(
        "s2_xconv1_full",
        jax.jit(lambda v, p_, f_, q_: xc1.apply(v, p_, f_, q_, False)),
        (xc1_vars, crop_pts, merged, crop_pts),
    )

    # XConv-internal bisection at the stage-2 xconv1 shapes: which of
    # f_delta MLP / X-net / X-apply+separable owns the non-gather time.
    import flax.linen as nn

    from heterofusionrcnn_tpu.models.extractors.layers import (
        ConvOverK, DenseBN, DepthwiseConvOverK, SeparableConvOverK,
    )

    nn_local = jnp.asarray(
        rng.standard_normal((N, Rc, 4, 3)).astype(np.float32), dtype=act_dtype
    )
    nn_in = jnp.asarray(
        rng.standard_normal((N, Rc, 4, 672)).astype(np.float32),
        dtype=act_dtype,
    )
    x_kk = jnp.asarray(
        rng.standard_normal((N, Rc, 4, 4)).astype(np.float32), dtype=act_dtype
    )

    class FDelta(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = DenseBN(128, dtype=mod_dtype, name="a")(x, False)
            return DenseBN(128, dtype=mod_dtype, name="b")(x, False)

    class XNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            b_, p_ = x.shape[:2]
            x0 = ConvOverK(16, dtype=mod_dtype, name="X_0")(x, False)
            x0 = x0.reshape(b_, p_, 4, 4)
            x1 = DepthwiseConvOverK(4, dtype=mod_dtype, name="X_1")(x0, False)
            x1 = x1.reshape(b_, p_, 4, 4)
            x2 = DepthwiseConvOverK(4, activation=None, dtype=mod_dtype,
                                    name="X_2")(x1, False)
            return x2.reshape(b_, p_, 4, 4)

    class XApplySep(nn.Module):
        @nn.compact
        def __call__(self, x2, fin):
            fts_x = jnp.einsum("bpkj,bpjc->bpkc", x2, fin)
            return SeparableConvOverK(512, 1, dtype=mod_dtype,
                                      name="conv")(fts_x, False)

    for nm, mod, fargs in [
        ("s2_fdelta_mlp", FDelta(), (nn_local,)),
        ("s2_xnet", XNet(), (nn_local,)),
        ("s2_xapply_sep", XApplySep(), (x_kk, nn_in)),
    ]:
        vs = jax.jit(lambda r, *a, m=mod: m.init(r, *a))(
            jax.random.PRNGKey(7), *(a[:8] for a in fargs)
        )
        run(nm, jax.jit(lambda v, *a, m=mod: m.apply(v, *a)), (vs, *fargs))

    # ---------------- RPN internals ---------------- #
    rpn_xc1 = XConv(K=8, D=1, C=256, C_pts_fts=128, depth_multiplier=4,
                    dtype=mod_dtype, name="rxc1")
    rpn_xc1_vars = jax.jit(
        lambda r, p_, q_: rpn_xc1.init(r, p_, None, q_, False)
    )(jax.random.PRNGKey(4), pts[:1], pts[:1])
    run(
        "rpn_xconv1_full_16384",
        jax.jit(lambda v, p_, q_: rpn_xc1.apply(v, p_, None, q_, False)),
        (rpn_xc1_vars, pts, pts),
    )

    # Bin head: fused fts -> fc stack -> 228-wide output -> parse/decode.
    from heterofusionrcnn_tpu.core import bin_codec

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, training=False):
            x = DenseBN(512, name="fc0")(x, training)
            x = DenseBN(512, name="fc1")(x, training)
            return DenseBN(228, use_bn=False, activation=None, name="out")(
                x, training
            )

    head = Head()
    fused_fts = jnp.asarray(
        rng.standard_normal((B, P, 288)).astype(np.float32)
    )
    head_vars = jax.jit(lambda r, a: head.init(r, a))(
        jax.random.PRNGKey(5), fused_fts[:1]
    )
    run(
        "rpn_bin_head_fc",
        jax.jit(lambda v, a: head.apply(v, a)),
        (head_vars, fused_fts),
    )

    S = np.asarray([3.0, 1.5, 1.5], np.float32)  # per-class (K,)
    DELTA = np.asarray([0.5, 0.25, 0.25], np.float32)

    @jax.jit
    def parse_decode(out_flat, pts_):
        K = 3
        out = out_flat.reshape(B, P, K, -1)
        o = 0
        NBX = NBZ = NBT = 12
        bx_l = out[..., o:o + NBX]; o += NBX
        rx = out[..., o:o + NBX]; o += NBX
        bz_l = out[..., o:o + NBZ]; o += NBZ
        rz = out[..., o:o + NBZ]; o += NBZ
        bt_l = out[..., o:o + NBT]; o += NBT
        rt = out[..., o:o + NBT]; o += NBT
        ry = out[..., o]; o += 1
        rs = out[..., o:o + 3]
        bx = jnp.argmax(bx_l, -1).astype(jnp.int32)
        bz = jnp.argmax(bz_l, -1).astype(jnp.int32)
        bt = jnp.argmax(bt_l, -1).astype(jnp.int32)
        tb = lambda x, b: jnp.sum(
            x * jax.nn.one_hot(b, x.shape[-1], dtype=x.dtype), -1
        )
        mean_sizes = jnp.ones((B, P, K, 3))
        return bin_codec.decode(
            pts_, 0.0, bx, tb(rx, bx), bz, tb(rz, bz), bt, tb(rt, bt),
            ry, rs, mean_sizes, jnp.asarray(S), jnp.asarray(DELTA),
            float(np.pi), 2 * np.pi / 12,
        )

    head_out = jnp.asarray(
        rng.standard_normal((B, P, 228)).astype(np.float32)
    )
    run("rpn_parse_decode", parse_decode, (head_out, pts))

    print("\n--- summary (ms/call, batch %d) ---" % B)
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k:34s} {v:9.2f}")


if __name__ == "__main__":
    main()
