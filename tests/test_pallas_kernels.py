"""Pallas kernel correctness vs the XLA formulations (runs interpreted on
CPU; on TPU the same tests exercise the compiled kernels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.ops.grouping import knn_point, pairwise_sqdist
from heterofusionrcnn_tpu.ops.pallas_fps import farthest_point_sample_pallas
from heterofusionrcnn_tpu.ops.pallas_knn import knn_pallas
from tests import oracles


def test_pallas_knn_matches_xla():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-40, 40, (2, 2048, 3)).astype(np.float32))
    q = xyz[:, :256]
    d1, i1 = knn_pallas(8, xyz, q)
    # Reference: brute-force numpy (avoids XLA's cancellation-prone |a|2+|b|2
    # distance form).
    for b in range(2):
        full = np.sum(
            (np.asarray(q)[b][:, None] - np.asarray(xyz)[b][None]) ** 2, axis=-1
        )
        order = np.argsort(full, axis=1, kind="stable")[:, :8]
        np.testing.assert_array_equal(np.asarray(i1)[b], order)
        np.testing.assert_allclose(
            np.asarray(d1)[b],
            np.take_along_axis(full, order, 1),
            rtol=1e-4, atol=1e-3,
        )


def test_pallas_knn_ascending_and_k_variants():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.uniform(-5, 5, (1, 2048, 3)).astype(np.float32))
    q = xyz[:, :256]
    for k in (1, 4, 16):
        d, i = knn_pallas(k, xyz, q)
        assert d.shape == (1, 256, k)
        dn = np.asarray(d)
        assert (np.diff(dn, axis=-1) >= -1e-6).all()
        # First neighbor of a query that IS a source point: itself, dist 0.
        np.testing.assert_array_equal(np.asarray(i)[0, :, 0], np.arange(256))


def test_pallas_fps_matches_oracle():
    rng = np.random.default_rng(2)
    xyz = jnp.asarray(rng.uniform(-10, 10, (2, 256, 3)).astype(np.float32))
    idx = np.asarray(farthest_point_sample_pallas(xyz, 32))
    for b in range(2):
        want = oracles.fps_np(np.asarray(xyz)[b], 32)
        np.testing.assert_array_equal(idx[b], want)


def test_pallas_fps_folded_matches_oracle():
    """The small-batch sublane fold (chunk-major rows + rotation combine)
    must select bit-identical indices. Off-TPU the dispatcher picks F=1, so
    drive the kernel directly at F=2 in interpret mode."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from heterofusionrcnn_tpu.ops.pallas_fps import _fps_kernel

    rng = np.random.default_rng(4)
    b, n, f, npoint = 4, 256, 2, 64
    n_f = n // f
    xyz = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)).astype(np.float32))
    kernel = functools.partial(
        _fps_kernel, npoint=npoint, n_f=n_f, bt=b, f=f
    )

    def fold(v):
        return v.reshape(1, b, f, n_f).swapaxes(1, 2).reshape(f * b, n_f)

    cs = pl.BlockSpec((f * b, n_f), lambda i: (i, 0))
    out = pl.pallas_call(
        kernel,
        interpret=True,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        in_specs=[cs, cs, cs],
        out_specs=pl.BlockSpec((b, npoint), lambda i: (i, 0)),
        scratch_shapes=[pltpu.VMEM((f * b, n_f), jnp.float32)],
    )(*(fold(xyz[..., i]) for i in range(3)))
    for bb in range(b):
        want = oracles.fps_np(np.asarray(xyz)[bb], npoint)
        np.testing.assert_array_equal(np.asarray(out)[bb], want)


def test_dispatch_cpu_fallback():
    """On CPU, knn_point/farthest_point_sample use the XLA path (shapes that
    would hit Pallas on TPU)."""
    from heterofusionrcnn_tpu.ops.sampling import farthest_point_sample

    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.uniform(-5, 5, (1, 2048, 3)).astype(np.float32))
    idx = farthest_point_sample(xyz, 16)
    assert idx.shape == (1, 16)
    d, i = knn_point(4, xyz, xyz[:, :256])
    assert i.shape == (1, 256, 4)


@pytest.mark.parametrize("fold_mode", ["legacy", "counted"])
@pytest.mark.parametrize("same_set", [False, True])
def test_sorted_knn_fold_modes_exact(fold_mode, same_set):
    """Both fold formulations of the sorted tile-skipping kernel are exact
    against the stable-argsort oracle (incl. duplicate-point ties, which the
    counted mode's <= gate must keep). Small tiles so interpret mode on CPU
    stays fast; on TPU the production shapes run in tools/check_kernels.py."""
    from heterofusionrcnn_tpu.ops import pallas_knn as pk

    saved = (pk._FOLD_MODE, pk._SORTED_TILE_N, pk._SORTED_TILE_Q,
             pk._SORTED_MIN_N)
    try:
        pk._FOLD_MODE = fold_mode
        pk._SORTED_TILE_N = 128
        pk._SORTED_TILE_Q = 128
        pk._SORTED_MIN_N = 256
        rng = np.random.default_rng(7)
        b, n, p, k = 2, 512, 128, 8
        xyz = rng.uniform(-20, 20, (b, n, 3)).astype(np.float32)
        # Force exact-distance ties: duplicate a block of points.
        xyz[:, 300:332] = xyz[:, 100:132]
        xyz = jnp.asarray(xyz)
        q = xyz if same_set else xyz[:, 5 : 5 + p]
        d, i = pk._knn_pallas_sorted(
            k, xyz, q, same_set=same_set, interpret=True
        )
        for bb in range(b):
            full = np.sum(
                (np.asarray(q)[bb][:, None] - np.asarray(xyz)[bb][None]) ** 2,
                axis=-1,
            )
            order = np.argsort(full, axis=1, kind="stable")[:, :k]
            np.testing.assert_array_equal(np.asarray(i)[bb], order)
            np.testing.assert_allclose(
                np.asarray(d)[bb],
                np.take_along_axis(full, order, 1),
                rtol=1e-4, atol=1e-3,
            )
    finally:
        (pk._FOLD_MODE, pk._SORTED_TILE_N, pk._SORTED_TILE_Q,
         pk._SORTED_MIN_N) = saved
