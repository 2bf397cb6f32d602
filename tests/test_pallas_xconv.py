"""Oracle tests for the fused XConv Pallas kernel (interpret mode on CPU).

The reference oracle below replicates the module XLA path's math exactly
(lift DenseBN x2 -> concat -> X-net -> einsum -> factored depthwise+pointwise
separable conv -> ELU -> BN), in f32. The kernel must match within
reassociation tolerance; the module-level dispatch equivalence is covered in
test_extractors.py.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.ops.pallas_xconv import fused_xconv


def _bn(x, scale, bias, mean, var, eps=1e-3):
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def _elu(x):
    return np.where(x > 0, x, np.expm1(x))


def _make_params(rng, k, cf, cin, dm, d_out):
    def bn_params(c):
        return (
            rng.uniform(0.5, 1.5, c).astype(np.float32),
            rng.standard_normal(c).astype(np.float32) * 0.1,
            rng.standard_normal(c).astype(np.float32) * 0.1,
            rng.uniform(0.5, 2.0, c).astype(np.float32),
        )

    return {
        "w1": rng.standard_normal((3, cf)).astype(np.float32) * 0.5,
        "bn1": bn_params(cf),
        "w2": rng.standard_normal((cf, cf)).astype(np.float32) * 0.3,
        "bn2": bn_params(cf),
        "wx0": rng.standard_normal((k * 3, k * k)).astype(np.float32) * 0.4,
        "bnx0": bn_params(k * k),
        "wx1": rng.standard_normal((k, k, k)).astype(np.float32) * 0.4,
        "bnx1": bn_params(k * k),
        "wx2": rng.standard_normal((k, k, k)).astype(np.float32) * 0.4,
        "bnx2": bn_params(k * k),
        "wd": rng.standard_normal((k, cin, dm)).astype(np.float32) * 0.3,
        "wp": rng.standard_normal((cin * dm, d_out)).astype(np.float32) * 0.2,
        "bnc": bn_params(d_out),
    }


def _oracle(nn_local, nn_fts, params, with_x=True):
    """Module-path math in numpy f32 (factored separable conv)."""
    b, p, k, _ = nn_local.shape
    cf = params["w1"].shape[1]

    h = _elu(nn_local @ params["w1"])
    f1 = _bn(h, *params["bn1"])
    f2 = _bn(_elu(f1 @ params["w2"]), *params["bn2"])  # (B,P,K,Cf)

    fin = f2 if nn_fts is None else np.concatenate([f2, nn_fts], axis=-1)

    if with_x:
        xin = nn_local.reshape(b, p, k * 3)
        x0 = _bn(_elu(xin @ params["wx0"]), *params["bnx0"]).reshape(
            b, p, k, k
        )
        x1 = np.einsum("bpkc,kcj->bpcj", x0, params["wx1"]).reshape(
            b, p, k * k
        )
        x1 = _bn(_elu(x1), *params["bnx1"]).reshape(b, p, k, k)
        x2 = np.einsum("bpkc,kcj->bpcj", x1, params["wx2"]).reshape(
            b, p, k * k
        )
        x2 = _bn(x2, *params["bnx2"]).reshape(b, p, k, k)
        fts_x = np.einsum("bpkj,bpjc->bpkc", x2, fin)
    else:
        fts_x = fin

    cin = fts_x.shape[-1]
    dm = params["wd"].shape[2]
    mid = np.einsum("bpkc,kcm->bpcm", fts_x, params["wd"]).reshape(
        b, p, cin * dm
    )
    out = mid @ params["wp"]
    return _bn(_elu(out), *params["bnc"])


@pytest.mark.parametrize("with_prev_fts", [True, False])
@pytest.mark.parametrize("with_x", [True, False])
def test_fused_xconv_matches_oracle(with_prev_fts, with_x):
    rng = np.random.default_rng(0)
    B, P, K, Cf, Cp, dm, D = 2, 16, 4, 8, 6, 2, 16
    cin = Cf + (Cp if with_prev_fts else 0)
    params = _make_params(rng, K, Cf, cin, dm, D)

    nn_local = rng.standard_normal((B, P, K, 3)).astype(np.float32)
    nn_fts = (
        rng.standard_normal((B, P, K, Cp)).astype(np.float32)
        if with_prev_fts
        else None
    )

    want = _oracle(nn_local, nn_fts, params, with_x=with_x)

    jp = {
        kk: (
            tuple(jnp.asarray(v) for v in vv)
            if isinstance(vv, tuple)
            else jnp.asarray(vv)
        )
        for kk, vv in params.items()
    }
    got = fused_xconv(
        jnp.asarray(nn_local),
        None
        if nn_fts is None
        else jnp.asarray(np.transpose(nn_fts, (0, 2, 1, 3))),
        jp,
        compute_dtype=jnp.float32,
        with_x_transformation=with_x,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("with_x", [True, False])
def test_fused_xconv_in_kernel_gather(with_x):
    """fts_src + nn_idx (in-kernel one-hot gather) must equal the
    pre-gathered path and the oracle."""
    rng = np.random.default_rng(3)
    B, N, P, K, Cf, Cp, dm, D = 2, 48, 16, 4, 8, 6, 2, 16
    params = _make_params(rng, K, Cf, Cf + Cp, dm, D)
    nn_local = rng.standard_normal((B, P, K, 3)).astype(np.float32)
    fts_src = rng.standard_normal((B, N, Cp)).astype(np.float32)
    idx = rng.integers(0, N, (B, P, K)).astype(np.int32)
    nn_fts = np.take_along_axis(
        fts_src[:, :, None, :], idx.reshape(B, P * K)[..., None, None], axis=1
    ).reshape(B, P, K, Cp)

    want = _oracle(nn_local, nn_fts, params, with_x=with_x)

    jp = {
        kk: (
            tuple(jnp.asarray(v) for v in vv)
            if isinstance(vv, tuple)
            else jnp.asarray(vv)
        )
        for kk, vv in params.items()
    }
    got = fused_xconv(
        jnp.asarray(nn_local),
        None,
        jp,
        fts_src=jnp.asarray(fts_src),
        nn_idx=jnp.asarray(idx),
        compute_dtype=jnp.float32,
        with_x_transformation=with_x,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=2e-4, atol=2e-4
    )
    # ... and bit-identical feature delivery vs the pre-gathered path.
    got_pre = fused_xconv(
        jnp.asarray(nn_local),
        jnp.asarray(np.transpose(nn_fts, (0, 2, 1, 3))),
        jp,
        compute_dtype=jnp.float32,
        with_x_transformation=with_x,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(got_pre), rtol=1e-6, atol=1e-6
    )


def test_fused_xconv_larger_tile():
    """P > tile: exercises the grid (two tiles per batch element)."""
    rng = np.random.default_rng(1)
    B, P, K, Cf, Cp, dm, D = 1, 1024, 8, 16, 12, 1, 32
    params = _make_params(rng, K, Cf, Cf + Cp, dm, D)
    nn_local = rng.standard_normal((B, P, K, 3)).astype(np.float32) * 0.5
    nn_fts = rng.standard_normal((B, P, K, Cp)).astype(np.float32)
    want = _oracle(nn_local, nn_fts, params)
    jp = {
        kk: (
            tuple(jnp.asarray(v) for v in vv)
            if isinstance(vv, tuple)
            else jnp.asarray(vv)
        )
        for kk, vv in params.items()
    }
    got = fused_xconv(
        jnp.asarray(nn_local),
        jnp.asarray(np.transpose(nn_fts, (0, 2, 1, 3))),
        jp,
        compute_dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_xconv_module_fused_dispatch_equivalence(monkeypatch):
    """The full XConv module through the fused kernel (interpret mode)
    matches its own XLA path with the same variables, and creates an
    IDENTICAL param tree."""
    from heterofusionrcnn_tpu.models.extractors.pointcnn import XConv

    rng = np.random.default_rng(2)
    B, N, P, K = 2, 64, 32, 8
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    fts = jnp.asarray(rng.standard_normal((B, N, 12)).astype(np.float32))
    qrs = pts[:, :P]

    mod = XConv(K=K, D=1, C=32, C_pts_fts=16, depth_multiplier=2, name="xc")

    monkeypatch.delenv("HFR_FUSED_XCONV_INTERPRET", raising=False)
    v_xla = mod.init(jax.random.PRNGKey(0), pts, fts, qrs, False)
    want = mod.apply(v_xla, pts, fts, qrs, False)

    monkeypatch.setenv("HFR_FUSED_XCONV_INTERPRET", "1")
    v_fused = mod.init(jax.random.PRNGKey(0), pts, fts, qrs, False)
    assert jax.tree_util.tree_structure(v_xla) == jax.tree_util.tree_structure(
        v_fused
    )
    got = mod.apply(v_xla, pts, fts, qrs, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )

    # with_global variant (last encoder layer shape)
    mod_g = XConv(
        K=K, D=1, C=32, C_pts_fts=16, depth_multiplier=2,
        with_global=True, name="xg",
    )
    monkeypatch.delenv("HFR_FUSED_XCONV_INTERPRET", raising=False)
    v2 = mod_g.init(jax.random.PRNGKey(1), pts, fts, qrs, False)
    want2 = mod_g.apply(v2, pts, fts, qrs, False)
    monkeypatch.setenv("HFR_FUSED_XCONV_INTERPRET", "1")
    got2 = mod_g.apply(v2, pts, fts, qrs, False)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want2), rtol=2e-4, atol=2e-4
    )
