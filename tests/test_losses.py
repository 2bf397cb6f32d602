"""Loss function tests (formulas match hf/core/losses.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.core import losses


def test_smooth_l1_values():
    pred = jnp.asarray([[0.5, 2.0], [0.0, 0.0]])
    tgt = jnp.zeros((2, 2))
    got = np.asarray(losses.weighted_smooth_l1(pred, tgt))
    # 0.5*0.25 + (2-0.5) = 0.125 + 1.5
    np.testing.assert_allclose(got, [1.625, 0.0], atol=1e-6)


def test_softmax_ce_matches_manual():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 8)
    onehot = np.eye(4, dtype=np.float32)[labels]
    got = np.asarray(losses.weighted_softmax_ce(jnp.asarray(logits), jnp.asarray(onehot)))
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    want = -np.log(p[np.arange(8), labels])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_focal_downweights_easy():
    probs = jnp.asarray([[0.99, 0.01], [0.6, 0.4]])
    onehot = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    got = np.asarray(losses.weighted_focal(probs, onehot))
    # Reference formula: alpha * t^2 * (1-p)^gamma * (-log p).
    want0 = 0.25 * (0.01 ** 2) * (-np.log(0.99))
    want1 = 0.25 * (0.4 ** 2) * (-np.log(0.6))
    np.testing.assert_allclose(got, [want0, want1], rtol=1e-4)
    assert got[0] < got[1]


def test_focal_weight_scalar():
    probs = jnp.asarray([[0.5, 0.5]])
    onehot = jnp.asarray([[1.0, 0.0]])
    a = np.asarray(losses.weighted_focal(probs, onehot, weight=100.0))
    b = np.asarray(losses.weighted_focal(probs, onehot, weight=1.0))
    np.testing.assert_allclose(a, 100 * b, rtol=1e-6)


def test_one_hot_smooth():
    out = np.asarray(losses.one_hot_smooth(jnp.asarray([1]), 4, epsilon=0.3))
    np.testing.assert_allclose(out[0, 1], 0.7, atol=1e-6)
    np.testing.assert_allclose(out[0, 0], 0.1, atol=1e-6)
    np.testing.assert_allclose(out.sum(), 1.0, atol=1e-6)


def test_losses_differentiable():
    def f(logits):
        probs = jax.nn.softmax(logits)
        onehot = jnp.asarray([[0.0, 1.0]])
        return jnp.sum(losses.weighted_focal(probs, onehot))

    g = jax.grad(f)(jnp.asarray([[0.3, -0.2]]))
    assert np.isfinite(np.asarray(g)).all()
