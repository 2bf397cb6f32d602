"""PointCNN feature extractor (parity with hf/core/feature_extractors/
pointcnn.py): XConv encoder pyramid + XDConv decoder back to all points.

The xconv block (reference :16-153, Algorithm 1 of the PointCNN paper):
  1) gather K nearest neighbors of each query point, local coords P' = P - p
  2) lift: F_delta = MLP(P')
  3) concat with gathered previous features
  4) learn the X-transformation (K x K) from P'
  5) F_X = X @ F_*
  6) separable "conv" over the K axis -> per-query feature

TPU notes: KNN runs on matmul-expanded distance tiles (MXU) chunked to bound
memory; FPS is the sequential scan in ops.sampling; every (1, K) conv is a
dense contraction. Static shapes throughout — P comes from the config.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.configs.config import PointCNNConfig
from heterofusionrcnn_tpu.models.extractors.layers import (
    ConvOverK,
    DenseBN,
    DepthwiseConvOverK,
    SeparableConvOverK,
)
from heterofusionrcnn_tpu.ops.grouping import (
    group_point,
    knn_point,
    sort_neighbor_indices,
)
from heterofusionrcnn_tpu.ops.dispatch import pallas_ok
from heterofusionrcnn_tpu.ops.pallas_xconv import fused_xconv, pick_tile
from heterofusionrcnn_tpu.ops.sampling import (
    farthest_point_sample,
    gather_point,
    inverse_density_sampling,
)


# Narrow prev-features (<=5 channels) at flat-row-gather scale (N > 1024)
# ride the coords gather as one packed row (see XConv.__call__). Module
# switch so tests can A/B the packed path against the separate-gather
# oracle (and as a kill switch — the paths are value-identical).
_PACK_NARROW_FTS = True


def _fused_xconv_mode(
    training: bool, p: int, k: int, cf: int, cp: int, d_out: int,
    elem: int = 2,
) -> str:
    """'' = XLA module path; 'tpu' / 'interpret' = fused Pallas kernel.

    The fused kernel is inference-only (the XLA path keeps autodiff for
    training) and dispatches on TPU when the layer's weights + blocks fit
    the VMEM budget; HFR_FUSED_XCONV_INTERPRET=1 forces interpret mode
    off-TPU for equivalence tests; HFR_NO_FUSED_XCONV=1 disables it
    everywhere (A/B knob)."""
    if training or os.environ.get("HFR_NO_FUSED_XCONV"):
        return ""
    if pick_tile(p, k, cf, cp, d_out, elem=elem) == 0:
        return ""
    if pallas_ok():
        return "tpu"
    if os.environ.get("HFR_FUSED_XCONV_INTERPRET") == "1":
        return "interpret"
    return ""


class XConv(nn.Module):
    """One xconv block (reference pointcnn.py:16-153)."""

    K: int
    D: int
    C: int
    C_pts_fts: int
    depth_multiplier: int
    with_X_transformation: bool = True
    with_global: bool = False
    sorting_method: str = ""
    dtype: object = None

    @nn.compact
    def __call__(self, pts, fts, qrs, training: bool, nn_idx=None):
        """
        Args:
          pts: (B, N, 3) source points.
          fts: (B, N, C_prev) source features or None.
          qrs: (B, P, 3) query points.
          nn_idx: optional precomputed (B, P, K*D) KNN indices (the encoder
            caches repeated (pts, qrs) pairs — e.g. the first xconv and the
            final xdconv query the same 16384-point set).
        Returns:
          (B, P, C) or (B, P, C + C//4) with the global branch.
        """
        k_total = self.K * self.D
        if nn_idx is not None:
            idx = nn_idx
        else:
            _, idx = knn_point(k_total, pts, qrs)  # ascending by distance
        if self.D > 1:
            idx = idx[:, :, :: self.D]  # dilation (reference :74-75)
        if self.sorting_method:
            idx = sort_neighbor_indices(pts, idx, self.sorting_method)

        # Narrow prev-features (the RPN's 1-channel intensity at layer 1)
        # ride the coords gather: a standalone (B, P, K, 1) flat-row gather
        # lowers to a latency-bound scalar gather (3.67 ms/iter in the
        # round-5 fused-graph trace vs 0.95 ms for the 3-wide coords);
        # packing [pts, fts] into one 4-wide gather returns the identical
        # rows for ~the coords gather's cost. Only for the flat-row regime
        # (N > 1024 — below that group_point dispatches to the one-hot
        # contraction, and the fused kernel's in-kernel gather takes over).
        pack_fts = (
            _PACK_NARROW_FTS
            and fts is not None
            and fts.shape[-1] <= 5
            and pts.shape[1] > 1024
            # The ride through pts.dtype must be value-exact (f32 coords
            # carrying f32/bf16 features round-trip; the reverse would not).
            and jnp.promote_types(pts.dtype, fts.dtype) == pts.dtype
        )
        if pack_fts:
            packed = group_point(
                jnp.concatenate([pts, fts.astype(pts.dtype)], axis=-1), idx
            )  # (B, P, K, 3 + Cp)
            nn_pts = packed[..., :3]
            nn_fts_packed = packed[..., 3:].astype(fts.dtype)
        else:
            nn_pts = group_point(pts, idx)  # (B, P, K, 3)
            nn_fts_packed = None
        nn_pts_local = nn_pts - qrs[:, :, None, :]

        mode = _fused_xconv_mode(
            training,
            qrs.shape[1],
            self.K,
            self.C_pts_fts,
            0 if fts is None else fts.shape[-1],
            self.C,
            elem=jnp.dtype(self.dtype or jnp.float32).itemsize,
        )
        if mode:
            return self._fused(
                pts, fts, qrs, idx, nn_pts_local, mode, training,
                nn_fts_packed=nn_fts_packed,
            )

        # 2) lift points into feature space.
        f_delta = DenseBN(self.C_pts_fts, dtype=self.dtype, name="nn_fts_from_pts_0")(
            nn_pts_local, training
        )
        f_delta = DenseBN(self.C_pts_fts, dtype=self.dtype, name="nn_fts_from_pts")(
            f_delta, training
        )

        if fts is None:
            nn_fts_input = f_delta
        else:
            nn_fts_prev = (
                nn_fts_packed
                if nn_fts_packed is not None
                else group_point(fts, idx)
            )
            nn_fts_input = jnp.concatenate([f_delta, nn_fts_prev], axis=-1)

        if self.with_X_transformation:
            # 4) learn X (K x K) from local coords (reference :108-128).
            b, p = nn_pts_local.shape[:2]
            x0 = ConvOverK(self.K * self.K, dtype=self.dtype, name="X_0")(
                nn_pts_local, training
            )
            x0 = x0.reshape(b, p, self.K, self.K)
            x1 = DepthwiseConvOverK(self.K, dtype=self.dtype, name="X_1")(x0, training)
            x1 = x1.reshape(b, p, self.K, self.K)
            x2 = DepthwiseConvOverK(
                self.K, activation=None, dtype=self.dtype, name="X_2"
            )(x1, training)
            x2 = x2.reshape(b, p, self.K, self.K)
            # 5) weight/permute features.
            fts_x = jnp.einsum("bpkj,bpjc->bpkc", x2, nn_fts_input)
        else:
            fts_x = nn_fts_input

        # 6) separable conv over the K axis.
        out = SeparableConvOverK(
            self.C, self.depth_multiplier, dtype=self.dtype, name="fts_conv"
        )(fts_x, training)  # (B, P, C)

        if self.with_global:
            g = DenseBN(self.C // 4, dtype=self.dtype, name="fts_global_0")(qrs, training)
            g = DenseBN(self.C // 4, dtype=self.dtype, name="fts_global")(g, training)
            return jnp.concatenate([g, out], axis=-1)
        return out

    def _fused(self, pts, fts, qrs, idx, nn_pts_local, mode, training,
               nn_fts_packed=None):
        """Inference path through the fused Pallas XConv kernel
        (ops/pallas_xconv.py): the lift -> X-transform -> separable-conv
        chain runs in VMEM instead of materializing (B, P, K, C)
        intermediates in HBM.

        The parameterized sublayers are invoked on 1-point dummies first so
        the flax param tree is IDENTICAL to the XLA path (checkpoints and
        reference-weight injection keep working); the kernel then reads the
        created params/batch_stats directly."""
        cd = self.dtype or jnp.float32

        # Dummy calls create (or look up) params without real compute; XLA
        # dead-code-eliminates them under jit.
        dummy_local = nn_pts_local[:1, :1]  # (1, 1, K, 3)
        d = DenseBN(self.C_pts_fts, dtype=self.dtype, name="nn_fts_from_pts_0")(
            dummy_local, training
        )
        DenseBN(self.C_pts_fts, dtype=self.dtype, name="nn_fts_from_pts")(
            d, training
        )
        if self.with_X_transformation:
            x0 = ConvOverK(self.K * self.K, dtype=self.dtype, name="X_0")(
                dummy_local, training
            ).reshape(1, 1, self.K, self.K)
            x1 = DepthwiseConvOverK(self.K, dtype=self.dtype, name="X_1")(
                x0, training
            ).reshape(1, 1, self.K, self.K)
            DepthwiseConvOverK(
                self.K, activation=None, dtype=self.dtype, name="X_2"
            )(x1, training)
        cin = self.C_pts_fts + (0 if fts is None else fts.shape[-1])
        SeparableConvOverK(
            self.C, self.depth_multiplier, dtype=self.dtype, name="fts_conv"
        )(jnp.zeros((1, 1, self.K, cin), cd), training)

        pv = self.variables["params"]
        bs = self.variables["batch_stats"]

        def bn(name, sub="BatchNorm_0"):
            return (
                pv[name][sub]["scale"],
                pv[name][sub]["bias"],
                bs[name][sub]["mean"],
                bs[name][sub]["var"],
            )

        def bn_nested(name, inner):
            return (
                pv[name][inner]["BatchNorm_0"]["scale"],
                pv[name][inner]["BatchNorm_0"]["bias"],
                bs[name][inner]["BatchNorm_0"]["mean"],
                bs[name][inner]["BatchNorm_0"]["var"],
            )

        params = {
            "w1": pv["nn_fts_from_pts_0"]["Dense_0"]["kernel"],
            "bn1": bn("nn_fts_from_pts_0"),
            "w2": pv["nn_fts_from_pts"]["Dense_0"]["kernel"],
            "bn2": bn("nn_fts_from_pts"),
            "wd": pv["fts_conv"]["depthwise"],
            "wp": pv["fts_conv"]["Dense_0"]["kernel"],
            "bnc": bn("fts_conv"),
        }
        if self.with_X_transformation:
            params.update(
                wx0=pv["X_0"]["DenseBN_0"]["Dense_0"]["kernel"],
                bnx0=bn_nested("X_0", "DenseBN_0"),
                wx1=pv["X_1"]["depthwise"],
                bnx1=bn("X_1"),
                wx2=pv["X_2"]["depthwise"],
                bnx2=bn("X_2"),
            )

        # Neighbor-feature delivery: for small source sets the gather moves
        # INTO the kernel (one-hot contraction over the VMEM-resident
        # (N, Cp) block) — at stage-2 L1 scale the XLA-level gather writes
        # ~0.9 GB to HBM only for the kernel to read it straight back, and
        # the measured XLA alternatives are all slower (one-hot 4.6 ms,
        # flat-row 21.8 ms, take_along_axis 25.9 ms per call on v5e;
        # tools/microbench_gather.py). Large-N layers keep the XLA flat-row
        # gather: a (T, 16384) one-hot per tile would waste MXU time and
        # the (N, Cp) block would not fit VMEM.
        in_kernel_gather = (
            fts is not None
            and fts.shape[1] <= 1024
            and pick_tile(
                qrs.shape[1],
                self.K,
                self.C_pts_fts,
                fts.shape[-1],
                self.C,
                n_src=fts.shape[1],
                elem=jnp.dtype(cd).itemsize,
            )
            > 0
        )
        if in_kernel_gather:
            fused_kwargs = dict(fts_src=fts.astype(cd), nn_idx=idx)
            nn_fts_t = None
        elif nn_fts_packed is not None:
            # Narrow fts already gathered alongside the coords (one packed
            # 4-wide flat-row gather in __call__); the kernel wants the
            # transposed (B, K, P, Cp) layout — transposing the 1-channel
            # slice is far cheaper than a second scalar gather.
            fused_kwargs = {}
            nn_fts_t = jnp.swapaxes(nn_fts_packed, 1, 2)
        else:
            fused_kwargs = {}
            nn_fts_t = (
                None
                if fts is None
                else group_point(fts, jnp.swapaxes(idx, 1, 2))  # (B,K,P,Cp)
            )
        out = fused_xconv(
            nn_pts_local,
            None if nn_fts_t is None else nn_fts_t.astype(cd),
            params,
            compute_dtype=cd,
            with_x_transformation=self.with_X_transformation,
            interpret=(mode == "interpret"),
            **fused_kwargs,
        )

        if self.with_global:
            g = DenseBN(self.C // 4, dtype=self.dtype, name="fts_global_0")(
                qrs, training
            )
            g = DenseBN(self.C // 4, dtype=self.dtype, name="fts_global")(
                g, training
            )
            return jnp.concatenate([g, out], axis=-1)
        return out


class PointCNN(nn.Module):
    """Config-driven XConv encoder + XDConv decoder (reference :189-388).

    __call__(points (B, N, 3), features (B, N, Cf) | None) ->
        (points (B, P_out, 3), features (B, P_out, C_out)).
    For the RPN config the decoder returns to all N input points.
    """

    config: PointCNNConfig
    dtype: object = None

    @nn.compact
    def __call__(self, points, features, training: bool):
        cfg = self.config
        xconvs = cfg.xconv_layers
        xdconvs = cfg.xdconv_layers

        layer_pts = [points]
        layer_fts = [features]

        # Trace-level KNN cache: identical (pts, qrs, k) triples (by tracer
        # identity) recur between the encoder's first layer and the decoder's
        # final layers — the 16384x16384 query is the single most expensive
        # op in the network, so never compute it twice.
        #
        # Subset derivation: when layer 1 ran same-set KNN over `pts` and a
        # later layer queries a SUBSET of `pts` (qrs = gather_point(pts,
        # sidx)) against the same candidates, its k-NN rows are exactly the
        # cached same-set rows at sidx — a (B, P, k) gather instead of a
        # fresh (P, N) scan (the RPN encoder's 4096q x 16384 KNN, ~5 ms of
        # the fused budget). Exact: same candidate set, same tie rule.
        knn_cache = {}
        subset_of = {}  # id(qrs) -> (id(pts), sidx) when qrs = pts[sidx]

        def cached_knn(pts, qrs, k):
            key = (id(pts), id(qrs), k)
            if key not in knn_cache:
                parent = subset_of.get(id(qrs))
                same = (
                    knn_cache.get((id(pts), id(pts), k))
                    if parent is not None and parent[0] == id(pts)
                    else None
                )
                if same is not None:
                    sidx = parent[1]
                    knn_cache[key] = jnp.take_along_axis(
                        same, sidx[:, :, None].astype(jnp.int32), axis=1
                    )
                else:
                    _, idx = knn_point(k, pts, qrs)
                    knn_cache[key] = idx
            return knn_cache[key]

        for layer_idx, lp in enumerate(xconvs):
            tag = f"xconv_{layer_idx + 1}"
            p_target = lp.P
            pts = layer_pts[-1]
            fts = layer_fts[-1]

            if p_target == -1 or (layer_idx > 0 and p_target == xconvs[layer_idx - 1].P):
                qrs = pts
            elif cfg.sampling == "fps":
                fps_idx = farthest_point_sample(pts, p_target)
                qrs = gather_point(pts, fps_idx)
                subset_of[id(qrs)] = (id(pts), fps_idx)
            elif cfg.sampling == "ids":
                ids_idx = inverse_density_sampling(
                    self.make_rng("sampling"), pts, lp.K, p_target
                )
                qrs = gather_point(pts, ids_idx)
                subset_of[id(qrs)] = (id(pts), ids_idx)
            elif cfg.sampling == "random":
                qrs = pts[:, :p_target]
                subset_of[id(qrs)] = (
                    id(pts),
                    jnp.broadcast_to(
                        jnp.arange(p_target, dtype=jnp.int32)[None],
                        (pts.shape[0], p_target),
                    ),
                )
            else:
                raise ValueError(f"unknown sampling {cfg.sampling}")
            layer_pts.append(qrs)

            # C_pts_fts / depth multiplier schedule (reference :250-258).
            if layer_idx == 0:
                c_pts_fts = lp.C // 2 if fts is None else lp.C // 4
                depth_multiplier = 4
            else:
                c_prev = xconvs[layer_idx - 1].C
                c_pts_fts = c_prev // 4
                depth_multiplier = math.ceil(lp.C / c_prev)

            with_global = cfg.with_global and layer_idx == len(xconvs) - 1
            nn_idx = cached_knn(pts, qrs, lp.K * lp.D)
            out = XConv(
                K=lp.K,
                D=lp.D,
                C=lp.C,
                C_pts_fts=c_pts_fts,
                depth_multiplier=depth_multiplier,
                with_X_transformation=cfg.with_X_transformation,
                with_global=with_global,
                sorting_method=cfg.sorting_method,
                dtype=self.dtype,
                name=tag,
            )(pts, fts, qrs, training, nn_idx=nn_idx)
            layer_fts.append(out)

        for layer_idx, lp in enumerate(xdconvs):
            tag = f"xdconv_{layer_idx + 1}"
            pts = layer_pts[lp.pts_layer_idx + 1]
            fts = (
                layer_fts[lp.pts_layer_idx + 1]
                if layer_idx == 0
                else layer_fts[-1]
            )
            qrs = layer_pts[lp.qrs_layer_idx + 1]
            fts_qrs = layer_fts[lp.qrs_layer_idx + 1]
            c = xconvs[lp.qrs_layer_idx].C
            c_prev = xconvs[lp.pts_layer_idx].C
            c_pts_fts = c_prev // 4

            nn_idx = cached_knn(pts, qrs, lp.K * lp.D)
            out = XConv(
                K=lp.K,
                D=lp.D,
                C=c,
                C_pts_fts=c_pts_fts,
                depth_multiplier=1,
                with_X_transformation=cfg.with_X_transformation,
                with_global=False,
                sorting_method=cfg.sorting_method,
                dtype=self.dtype,
                name=tag,
            )(pts, fts, qrs, training, nn_idx=nn_idx)
            fused = jnp.concatenate([out, fts_qrs], axis=-1)
            fused = DenseBN(c, dtype=self.dtype, name=tag + "_fuse")(fused, training)
            layer_pts.append(qrs)
            layer_fts.append(fused)

        output_fts = layer_fts[-1]
        for i, fc in enumerate(cfg.fc_layers):
            output_fts = DenseBN(fc.C, dtype=self.dtype, name=f"fc{i}")(
                output_fts, training
            )
            output_fts = nn.Dropout(fc.dropout_rate, deterministic=not training)(
                output_fts
            )

        return layer_pts[-1], output_fts
