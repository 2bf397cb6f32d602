"""Numerical gradient checks for the differentiable point ops (the
reference's compute_gradient_error tests, grouping/tf_grouping_op_test.py and
interpolate/tf_interpolate_op_test.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.ops.grouping import group_point
from heterofusionrcnn_tpu.ops.interpolate import three_interpolate
from heterofusionrcnn_tpu.ops.sampling import gather_point


def _num_grad(f, x, eps=1e-3):
    """Central-difference gradient of scalar f at x."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        xp = x.copy(); xp[idx] += eps
        xm = x.copy(); xm[idx] -= eps
        g[idx] = (f(xp) - f(xm)) / (2 * eps)
        it.iternext()
    return g


def test_group_point_gradient():
    rng = np.random.default_rng(0)
    fts = rng.normal(size=(1, 10, 3)).astype(np.float32)
    idx = jnp.asarray(rng.integers(0, 10, (1, 4, 2)).astype(np.int32))
    w = rng.normal(size=(1, 4, 2, 3)).astype(np.float32)

    def loss_np(x):
        return float(
            jnp.sum(group_point(jnp.asarray(x, jnp.float32), idx) * w)
        )

    def loss_jnp(x):
        return jnp.sum(group_point(x, idx) * w)

    analytic = np.asarray(jax.grad(loss_jnp)(jnp.asarray(fts)))
    numeric = _num_grad(loss_np, fts)
    np.testing.assert_allclose(analytic, numeric, atol=1e-2)


def test_gather_point_gradient():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(1, 8, 3)).astype(np.float32)
    idx = jnp.asarray(rng.integers(0, 8, (1, 5)).astype(np.int32))
    w = rng.normal(size=(1, 5, 3)).astype(np.float32)

    def loss_jnp(x):
        return jnp.sum(gather_point(x, idx) * w)

    analytic = np.asarray(jax.grad(loss_jnp)(jnp.asarray(pts)))
    numeric = _num_grad(
        lambda x: float(loss_jnp(jnp.asarray(x, jnp.float32))), pts
    )
    np.testing.assert_allclose(analytic, numeric, atol=1e-2)
    # Scatter-add semantics: duplicated indices accumulate.
    counts = np.bincount(np.asarray(idx)[0], minlength=8)
    touched = np.abs(analytic[0]).sum(axis=1) > 0
    assert (touched == (counts > 0)).all()


def test_three_interpolate_gradient():
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(1, 6, 2)).astype(np.float32)
    idx = jnp.asarray(rng.integers(0, 6, (1, 5, 3)).astype(np.int32))
    weight = jnp.asarray(
        rng.dirichlet(np.ones(3), size=(1, 5)).astype(np.float32)
    )
    w = rng.normal(size=(1, 5, 2)).astype(np.float32)

    def loss_jnp(x):
        return jnp.sum(three_interpolate(x, idx, weight) * w)

    analytic = np.asarray(jax.grad(loss_jnp)(jnp.asarray(feats)))
    numeric = _num_grad(
        lambda x: float(loss_jnp(jnp.asarray(x, jnp.float32))), feats
    )
    np.testing.assert_allclose(analytic, numeric, atol=1e-2)
