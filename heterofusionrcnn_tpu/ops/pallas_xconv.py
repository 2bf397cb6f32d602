"""Pallas TPU kernel: fully-fused XConv (lift -> X-transform -> separable
conv) for inference.

The XLA path (models/extractors/pointcnn.py XConv) materializes every
intermediate in HBM: f_delta (B,P,K,Cf), the concat input (B,P,K,Cin), the
X-transformed features fts_x (B,P,K,Cin), and the depthwise expansion — at
stage-2 layer-1 scale that is ~6 GB of traffic per batch-4 call, and the
roofline ledger (tools/flops_ledger.py) shows every stage of the network is
HBM-bound. This kernel keeps the whole post-gather chain in VMEM: each grid
cell takes a tile of query points with pre-gathered neighbor data and writes
only the (T, C_out) result.

Formulation notes (vs the reference xconv, pointcnn.py:16-153):
  - Neighbor-feature delivery has two modes. Small source sets (N <= ~1k,
    the RCNN stage-2 layers) gather IN-KERNEL: the raw (N, Cp) block lives
    in VMEM and each neighbor slot is a (T, N) one-hot MXU contraction —
    no (B, K, P, Cp) HBM round-trip. Large-N layers pre-gather outside
    (XLA flat-row gather) in a transposed (B, K, P, C) layout so per-k
    slices are contiguous VMEM blocks.
  - The two lift MLPs run as block-diagonal matmuls over all K neighbors at
    once: xin (T, K*3) @ blockdiag(W1) -> (T, K*Cf) -> @ blockdiag(W2).
  - The K x K depthwise "convs" of the X-network are precomposed into dense
    (K*K, K*K) matrices M[(k,c),(c',j)] = w[k,c,j] * delta(c,c') so the
    whole X-net is three small matmuls.
  - The separable conv uses the composed depthwise*pointwise weight (same
    algebra as layers.SeparableConvOverK), split into the f_delta columns
    and the prev-feature columns so no lane-dim concat is needed in-kernel.
  - Inference BatchNorm is folded to per-channel affines (scale/shift after
    the activation), matching DenseBN's Dense -> ELU -> BN order.

Inference-only: the XLA module path remains the source of truth for
training (and its gradients); the dispatcher in XConv uses this kernel only
with training=False on TPU. Equivalence is oracle-tested in interpret mode
(tests/test_pallas_xconv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _affine_params(scale, bias, mean, var, eps=1e-3):
    """Fold inference BN into y = x * s + b (applied after the activation)."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def _block_diag(w, k):
    """(k, a, b) per-neighbor weights -> (k*a, k*b) block-diagonal matrix."""
    a, b = w.shape[1], w.shape[2]
    eye = jnp.eye(k, dtype=w.dtype)
    # out[(k1,a),(k2,b)] = w[k1,a,b] * delta(k1,k2)
    return jnp.einsum("kab,kq->kaqb", w, eye).reshape(k * a, k * b)


def _depthwise_matrix(w):
    """X-net depthwise (k, c, j) -> dense (k*k, k*k) with
    M[(k,c),(c',j)] = w[k,c,j] * delta(c,c') (k == c == j == K here)."""
    k = w.shape[0]
    eye = jnp.eye(k, dtype=w.dtype)
    return jnp.einsum("kcj,cd->kcdj", w, eye).reshape(k * k, k * k)



def _elu(x):
    # jax.nn.elu lowers via expm1, which Pallas TPU cannot lower; exp(x)-1
    # for x <= 0 is within f32 roundoff of it at these magnitudes.
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _xconv_kernel(
    xin_ref,      # (1, T, K*3) local coords, k-major, f32
    fts_ref,      # (1, K, T, Cp) pre-gathered prev features (or dummy);
                  # in-kernel-gather mode: (1, N, Cp) raw source features
    *rest,        # [idx_ref (1, T, K) when n_src] + weight refs + out_ref
    k_n: int,
    cf: int,
    cp: int,
    d_out: int,
    tile: int,
    with_x: bool,
    n_src: int,
):
    if n_src:
        idx_ref, rest = rest[0], rest[1:]
    (
        w1_ref, s1_ref, b1_ref,      # blockdiag lift-1 (K*3, K*Cf), affines
        w2_ref, s2_ref, b2_ref,      # lift-2 (Cf, Cf), shared across k
        wx0_ref, sx0_ref, bx0_ref,   # X_0 (K*3, K*K)
        mx1_ref, sx1_ref, bx1_ref,   # X_1 dense (K*K, K*K)
        mx2_ref, sx2_ref, bx2_ref,   # X_2 dense (no activation)
        wcf_ref,      # (K, Cf, D) composed conv, f_delta columns
        wcp_ref,      # (K, Cp, D) composed conv, prev-feature columns
        sc_ref, bc_ref,              # output affine (D)
        out_ref,      # (1, T, D)
    ) = rest
    cd = w1_ref.dtype
    f32 = jnp.float32
    xin = xin_ref[0]  # (T, 3K)

    # ---- in-kernel neighbor gather (one-hot contraction in VMEM) ---- #
    # The XLA-level gather writes (B, K, P, Cp) to HBM only for this kernel
    # to re-read it (stage-2 L1: ~0.9 GB each way per batch). Here the raw
    # (N, Cp) feature block stays in VMEM and each neighbor slot j becomes
    # one (T, N) @ (N, Cp) MXU matmul — exact (rows are 1.0 x one value;
    # f32 accumulation passes bf16 inputs through unchanged).
    fts_g = None
    if n_src and cp:
        src = fts_ref[0]  # (N, Cp) compute dtype
        idx = idx_ref[0]  # (T, K) int32
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, n_src), 1)
        fts_g = []
        for j in range(k_n):
            oh = (idx[:, j:j + 1] == iota).astype(cd)  # (T, N)
            fts_g.append(
                jnp.dot(oh, src, preferred_element_type=f32)  # (T, Cp) f32
            )

    def fts_j(j):
        return fts_g[j] if n_src else fts_ref[0, j].astype(f32)

    # ---- lift MLPs ---- #
    # Lift-1 runs block-diagonal over all K neighbors at once (w1 is only
    # 3 x Cf so the K x zero-padding is free); lift-2 runs per-k with the
    # shared (Cf, Cf) kernel — a blockdiag form here would waste K x the
    # FLOPs, which measured as the kernel's dominant cost.
    h = jnp.dot(xin.astype(cd), w1_ref[...], preferred_element_type=f32)
    h = _elu(h) * s1_ref[...] + b1_ref[...]  # (T, K*Cf)
    # Lift-2 as one batched dot over a leading-K stack (broadcast weight):
    # leading-dim stacking/slicing is layout-free.
    hs = jnp.stack(
        [h[:, k * cf:(k + 1) * cf] for k in range(k_n)], axis=0
    ).astype(cd)  # (K, T, Cf)
    w2b = jnp.broadcast_to(w2_ref[...][None], (k_n, cf, cf))
    f2all = jax.lax.dot_general(
        hs, w2b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # (K, T, Cf) f32
    f2all = _elu(f2all) * s2_ref[...] + b2_ref[...]
    f2s = [f2all[k] for k in range(k_n)]

    # ---- X-network ---- #
    if with_x:
        x0 = jnp.dot(xin.astype(cd), wx0_ref[...], preferred_element_type=f32)
        x0 = _elu(x0) * sx0_ref[...] + bx0_ref[...]
        x1 = jnp.dot(x0.astype(cd), mx1_ref[...], preferred_element_type=f32)
        x1 = _elu(x1) * sx1_ref[...] + bx1_ref[...]
        x2 = jnp.dot(x1.astype(cd), mx2_ref[...], preferred_element_type=f32)
        x2 = x2 * sx2_ref[...] + bx2_ref[...]  # (T, K*K) f32, row-major (k, j)

    # ---- X-apply + composed separable conv ---- #
    # out[t, d] = sum_k ( sum_j X[t,k,j] * in_j[t, :] ) @ wc[k]
    # with in_j = [f2_j | fts_j]; the two column groups accumulate through
    # their own weight slices so no lane concat is needed. The K per-slot
    # matmuls run as ONE batched dot_general over a leading-K stack
    # (sublane-dim stacking is layout-free, unlike lane concat) — fewer MXU
    # issues than 2K accumulating dots.
    fx_fs, fx_ps = [], []
    for k in range(k_n):
        if with_x:
            fx_f = jnp.zeros((tile, cf), f32)
            fx_p = jnp.zeros((tile, cp), f32) if cp else None
            for j in range(k_n):
                xkj = x2[:, k * k_n + j][:, None]  # (T, 1)
                fx_f = fx_f + xkj * f2s[j]
                if cp:
                    fx_p = fx_p + xkj * fts_j(j)
        else:
            fx_f = f2s[k]
            fx_p = fts_j(k) if cp else None
        fx_fs.append(fx_f)
        fx_ps.append(fx_p)

    def batched(stacks, w_ref_):
        return jax.lax.dot_general(
            jnp.stack(stacks, axis=0).astype(cd),  # (K, T, C)
            w_ref_[...],                           # (K, C, D)
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )  # (K, T, D)

    acc = jnp.sum(batched(fx_fs, wcf_ref), axis=0)
    if cp:
        acc = acc + jnp.sum(batched(fx_ps, wcp_ref), axis=0)

    out = _elu(acc) * sc_ref[...] + bc_ref[...]
    out_ref[0] = out.astype(out_ref.dtype)


def supported_tile(p: int) -> int:
    """Query-tile size: divide P into <=512-point tiles (P is a power-of-two
    multiple of 8 in every config)."""
    for t in (512, 256, 128, 64, 32, 16, 8):
        if p % t == 0:
            return t
    return 0


def fused_vmem_bytes(
    k: int, cf: int, cp: int, d_out: int, t: int, n_src: int = 0,
    elem: int = 2,
) -> int:
    """Rough VMEM footprint of one grid cell at tile size t (weights +
    double-buffered blocks + f32 intermediates). n_src > 0 = in-kernel
    gather mode: the feature block is the raw (N, Cp) source instead of the
    pre-gathered (K, T, Cp), plus the one-hot scratch and the gathered f32
    neighborhood list. `elem` = compute-dtype bytes (2 bf16 / 4 f32) for the
    weight and feature blocks — an f32 run that sizes tiles with the bf16
    estimate busts the 16 MB scoped-VMEM limit at RPN shapes."""
    bf2 = elem
    w = (
        (3 * k) * (k * cf) * bf2          # w1 blockdiag
        + cf * cf * bf2                   # w2 (shared across k)
        + 3 * (k * k) ** 2 * bf2          # X matrices
        + k * cf * d_out * bf2            # wcf
        + k * max(cp, 1) * d_out * bf2    # wcp
    )
    # Batched-tail stacks: (K, T, Cf)+(K, T, Cp) inputs and (K, T, D)
    # batched-dot output, all f32.
    tail = k * t * (cf + cp + d_out) * 4
    if n_src:
        blocks = 2 * (
            t * 3 * k * 4                 # xin
            + n_src * max(cp, 1) * bf2    # raw feature block
            + t * 128 * 4                 # idx (K lanes pad to 128)
        )
        inter = (
            t * (k * cf + k * k + 2 * d_out + cf + cp) * 4
            + t * n_src * bf2             # one-hot scratch
            + k * t * max(cp, 1) * 4      # gathered f32 neighborhoods
        )
    else:
        blocks = 2 * (t * 3 * k * 4 + k * t * max(cp, 1) * bf2)
        inter = t * (k * cf + k * k + 2 * d_out + cf + cp) * 4
    return w + blocks + inter + tail


VMEM_BUDGET = 10 * 1024 * 1024


def pick_tile(
    p: int, k: int, cf: int, cp: int, d_out: int, n_src: int = 0,
    elem: int = 2,
) -> int:
    """Largest query tile whose grid cell fits the VMEM budget; 0 if none
    (the deep narrow layers whose weight blocks alone exceed VMEM — those
    stay on the XLA path where they are compute-light)."""
    t = supported_tile(p)
    while t >= 8:
        if fused_vmem_bytes(k, cf, cp, d_out, t, n_src, elem) <= VMEM_BUDGET:
            return t
        if t % 2 or p % (t // 2):
            return 0
        t //= 2
    return 0


def fused_xconv(
    nn_local,     # (B, P, K, 3) f32 local coords (nn_pts - qrs)
    nn_fts_t,     # (B, K, P, Cp) pre-gathered prev features or None
    params,       # dict, see below
    *,
    fts_src=None,  # (B, N, Cp) raw prev features (in-kernel gather mode)
    nn_idx=None,   # (B, P, K) int32 neighbor indices (required with fts_src)
    compute_dtype=jnp.bfloat16,
    with_x_transformation: bool = True,
    out_dtype=None,
    interpret: bool = False,
):
    """Fused XConv forward (inference). `params` carries raw module weights:

      w1 (3, Cf), w2 (Cf, Cf)            lift Dense kernels
      bn1, bn2                           (scale, bias, mean, var) tuples
      wx0 (K*3, K*K), bnx0               X_0 dense kernel + BN
      wx1, wx2 (K, K, K), bnx1, bnx2     X_1/X_2 depthwise + BN
      wd (K, Cin, dm), wp (Cin*dm, D)    separable depthwise + pointwise
      bnc                                output BN

    Neighbor features come in ONE of two ways: pre-gathered `nn_fts_t`
    (B, K, P, Cp), or raw `fts_src` (B, N, Cp) + `nn_idx` — then the gather
    happens inside the kernel as a one-hot MXU contraction over the
    VMEM-resident source block, skipping the (B, K, P, Cp) HBM round-trip.

    Returns (B, P, D) in out_dtype (default compute_dtype).
    """
    b, p, k_n, _ = nn_local.shape
    cf = params["w1"].shape[1]
    if fts_src is not None:
        assert nn_fts_t is None and nn_idx is not None
        cp = fts_src.shape[-1]
        n_src = fts_src.shape[1]
    else:
        cp = 0 if nn_fts_t is None else nn_fts_t.shape[-1]
        n_src = 0
    cin = cf + cp
    dm = params["wd"].shape[2]
    d_out = params["wp"].shape[1]
    tile = pick_tile(
        p, k_n, cf, cp, d_out, n_src, jnp.dtype(compute_dtype).itemsize
    )
    if tile == 0:
        raise ValueError(f"unsupported P={p} (no tile fits VMEM)")
    cd = compute_dtype
    out_dtype = out_dtype or cd

    # ---- fold weights (f32, tiny; const-folded under jit) ---- #
    s1, b1 = _affine_params(*params["bn1"])
    s2, b2 = _affine_params(*params["bn2"])
    sc, bc = _affine_params(*params["bnc"])
    w1_bd = _block_diag(
        jnp.broadcast_to(params["w1"][None], (k_n, 3, cf)), k_n
    ).astype(cd)
    w2_k = params["w2"].astype(cd)
    s1_t = jnp.tile(s1, k_n)
    b1_t = jnp.tile(b1, k_n)

    kk = k_n * k_n
    if with_x_transformation:
        sx0, bx0 = _affine_params(*params["bnx0"])
        sx1, bx1 = _affine_params(*params["bnx1"])
        sx2, bx2 = _affine_params(*params["bnx2"])
        wx0 = params["wx0"].astype(cd)
        mx1 = _depthwise_matrix(params["wx1"]).astype(cd)
        mx2 = _depthwise_matrix(params["wx2"]).astype(cd)
    else:
        wx0 = jnp.zeros((k_n * 3, kk), cd)
        mx1 = mx2 = jnp.zeros((kk, kk), cd)
        sx0 = bx0 = sx1 = bx1 = sx2 = bx2 = jnp.zeros((kk,), jnp.float32)

    # Composed separable-conv weight (same algebra as SeparableConvOverK):
    # wc[k, c, d] = sum_m wd[k, c, m] * wp[c*dm + m, d], split by column
    # group (f_delta first, prev features after — the concat order).
    wc = jnp.einsum(
        "kcm,cmd->kcd", params["wd"], params["wp"].reshape(cin, dm, d_out)
    )
    wcf = wc[:, :cf].astype(cd)
    wcp = (
        wc[:, cf:].astype(cd)
        if cp
        else jnp.zeros((k_n, 1, d_out), cd)
    )

    # xin: (B, P, K*3) k-major flattened local coords (ConvOverK layout).
    xin = nn_local.reshape(b, p, k_n * 3).astype(jnp.float32)
    if n_src:
        fts_in = fts_src.astype(cd)
        fts_spec = pl.BlockSpec((1, n_src, cp), lambda i, j: (i, 0, 0))
        idx_args = [nn_idx.astype(jnp.int32)]
        idx_specs = [pl.BlockSpec((1, tile, k_n), lambda i, j: (i, j, 0))]
    else:
        fts_in = nn_fts_t if cp else jnp.zeros((b, k_n, p, 1), cd)
        fts_spec = pl.BlockSpec(
            (1, k_n, tile, max(cp, 1)), lambda i, j: (i, 0, j, 0)
        )
        idx_args = []
        idx_specs = []

    grid = (b, p // tile)
    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    kernel = functools.partial(
        _xconv_kernel,
        k_n=k_n,
        cf=cf,
        cp=cp,
        d_out=d_out,
        tile=tile,
        with_x=with_x_transformation,
        n_src=n_src,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, k_n * 3), lambda i, j: (i, j, 0)),
            fts_spec,
            *idx_specs,
            full(w1_bd.shape), full(s1_t.shape), full(b1_t.shape),
            full(w2_k.shape), full(s2.shape), full(b2.shape),
            full(wx0.shape), full(sx0.shape), full(bx0.shape),
            full(mx1.shape), full(sx1.shape), full(bx1.shape),
            full(mx2.shape), full(sx2.shape), full(bx2.shape),
            full(wcf.shape), full(wcp.shape),
            full(sc.shape), full(bc.shape),
        ],
        out_specs=pl.BlockSpec((1, tile, d_out), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, p, d_out), out_dtype),
        # Mosaic's stack accounting charges every batched-dot stack copy at
        # once (measured 21.4 MB at the RPN xconv_1 shape vs the 16 MB
        # default window); v5e has 128 MB of physical VMEM — raise the cap
        # like pallas_knn/pallas_conv do instead of shrinking the tile.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        xin, fts_in, *idx_args,
        w1_bd, s1_t, b1_t, w2_k, s2, b2,
        wx0, sx0, bx0, mx1, sx1, bx1, mx2, sx2, bx2,
        wcf, wcp, sc, bc,
    )
    return out
