"""PointNet++ feature extractor (parity with hf/core/feature_extractors/
pointnet.py + pointnet_util.py): set-abstraction (SA) pyramid + feature-
propagation (FP) decoder.

SA module (reference pointnet_util.py:104-220): FPS downsample -> ball query
(or KNN) grouping -> local coords -> shared MLP -> max-pool over neighbors.
FP module (:289-330): inverse-distance three-NN interpolation of coarse
features + skip concat + shared MLP.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from heterofusionrcnn_tpu.configs.config import PointNetConfig
from heterofusionrcnn_tpu.models.extractors.layers import DenseBN
from heterofusionrcnn_tpu.ops.grouping import group_point, knn_point, query_ball_point
from heterofusionrcnn_tpu.ops.interpolate import three_interpolate, three_nn
from heterofusionrcnn_tpu.ops.sampling import farthest_point_sample, gather_point


class SharedMLP(nn.Module):
    """Per-point/per-neighbor MLP: stack of Dense -> ReLU -> BN
    (tf_util.conv2d with (1,1) kernels)."""

    features: Sequence[int]

    @nn.compact
    def __call__(self, x, training: bool):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=False, name=f"mlp{i}")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3, name=f"bn{i}"
            )(x)
        return x


class SAModule(nn.Module):
    """Set abstraction (reference pointnet_sa_module :104-220)."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_knn: bool = False

    @nn.compact
    def __call__(self, xyz, features, training: bool):
        """
        Args:
          xyz: (B, N, 3); features: (B, N, C) or None.
        Returns:
          new_xyz (B, npoint, 3), new_features (B, npoint, mlp[-1]).
        """
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_point(xyz, fps_idx)

        if self.use_knn:
            _, idx = knn_point(self.nsample, xyz, new_xyz)
        else:
            idx, _ = query_ball_point(self.radius, self.nsample, xyz, new_xyz)

        grouped_xyz = group_point(xyz, idx) - new_xyz[:, :, None, :]
        if features is not None:
            grouped_fts = group_point(features, idx)
            grouped = jnp.concatenate([grouped_xyz, grouped_fts], axis=-1)
        else:
            grouped = grouped_xyz

        out = SharedMLP(self.mlp, name="mlp")(grouped, training)
        return new_xyz, jnp.max(out, axis=2)


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (reference
    pointnet_sa_module_msg :223-286): several (radius, nsample, mlp) branches
    over the same FPS centers, concatenated."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz, features, training: bool):
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_point(xyz, fps_idx)

        outs = []
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            idx, _ = query_ball_point(radius, nsample, xyz, new_xyz)
            grouped_xyz = group_point(xyz, idx) - new_xyz[:, :, None, :]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, group_point(features, idx)], axis=-1
                )
            else:
                grouped = grouped_xyz
            out = SharedMLP(tuple(mlp), name=f"mlp{i}")(grouped, training)
            outs.append(jnp.max(out, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FPModule(nn.Module):
    """Feature propagation (reference pointnet_fp_module :289-330)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1, xyz2, features1, features2, training: bool):
        """Propagate features2 at xyz2 (coarse) onto xyz1 (dense).

        Args:
          xyz1: (B, N1, 3); xyz2: (B, N2, 3), N1 > N2.
          features1: (B, N1, C1) skip features or None.
          features2: (B, N2, C2) coarse features.
        Returns:
          (B, N1, mlp[-1]).
        """
        dist, idx = three_nn(xyz1, xyz2)
        dist = jnp.maximum(dist, 1e-10)
        inv = 1.0 / dist
        weight = inv / jnp.sum(inv, axis=-1, keepdims=True)
        interpolated = three_interpolate(features2, idx, weight)

        if features1 is not None:
            interpolated = jnp.concatenate([interpolated, features1], axis=-1)
        return SharedMLP(self.mlp, name="mlp")(interpolated, training)


class PointNet(nn.Module):
    """Mirrored SA/FP stack (reference pointnet.py:22-153, mirrored mode).

    __call__(points (B, N, 3), features (B, N, Cf) | None) ->
        (points (B, N, 3), per-point features (B, N, C_out)).
    """

    config: PointNetConfig

    @nn.compact
    def __call__(self, points, features, training: bool):
        cfg = self.config
        xyzs = [points]
        ftss = [features]

        for i, sa in enumerate(cfg.sa_modules):
            if sa.use_msg:
                xyz, fts = SAModuleMSG(
                    npoint=sa.npoint,
                    radii=tuple(sa.radii),
                    nsamples=tuple(sa.nsamples),
                    mlps=tuple(tuple(m) for m in sa.mlps),
                    name=f"sa{i}",
                )(xyzs[-1], ftss[-1], training)
            else:
                xyz, fts = SAModule(
                    npoint=sa.npoint,
                    radius=sa.radius,
                    nsample=sa.nsample,
                    mlp=tuple(sa.mlp),
                    use_knn=sa.use_knn,
                    name=f"sa{i}",
                )(xyzs[-1], ftss[-1], training)
            xyzs.append(xyz)
            ftss.append(fts)

        # Mirrored FP decoder: coarse -> dense.
        fts = ftss[-1]
        n_levels = len(cfg.sa_modules)
        for i, fp in enumerate(cfg.fp_modules):
            level = n_levels - 1 - i  # propagate onto this level's points
            fts = FPModule(mlp=tuple(fp.mlp), name=f"fp{i}")(
                xyzs[level], xyzs[level + 1], ftss[level], fts, training
            )

        out = fts
        for i, fc in enumerate(cfg.fc_layers):
            out = DenseBN(fc.C, name=f"fc{i}")(out, training)
            out = nn.Dropout(fc.dropout_rate, deterministic=not training)(out)

        out_level = n_levels - len(cfg.fp_modules)
        return xyzs[out_level], out
