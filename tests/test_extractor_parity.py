"""Extractor-level numerical A/B against the ACTUAL reference model code.

Runs the reference's pure-TF model internals — `pointfly.knn_indices_general`
(pointfly.py:185-216), `pf.dense/conv2d/separable_conv2d/depthwise_conv2d`
(pointfly.py:371-497), and one full `xconv` block (feature_extractors/
pointcnn.py:16-153) — in a tf.compat.v1 graph session on CPU, extracts the
initialized weights, injects the SAME weights into our flax modules, and
compares forward outputs. This is the cheapest insurance on the AP target:
an extractor-math bug would otherwise only surface as mysteriously low AP.

Notes on fidelity:
  - The reference's `unique=True` KNN dedup path calls `np.fill`, which does
    not exist in any numpy release (pointfly.py:154) — it crashes at
    sess.run under TF2/numpy>=1.x, so we A/B with unique=False and use
    well-separated random points (no duplicates, no distance ties).
  - TF1-only APIs are shimmed: tf.layers -> tf.compat.v1.layers,
    tf.contrib.layers.separable_conv2d (the depthwise-only form) ->
    tf.nn.depthwise_conv2d with the same variable naming, l2 regularizers ->
    None (regularizers never change the forward value).
"""

import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"

tf = pytest.importorskip("tensorflow")
if not os.path.isdir(os.path.join(REF_ROOT, "hf")):  # pragma: no cover
    pytest.skip("reference checkout unavailable", allow_module_level=True)

if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

# ---- TF1 / dependency shims so the reference modules import & run ---- #

if "transforms3d" not in sys.modules:  # only used by augmentation helpers
    t3d = types.ModuleType("transforms3d")
    t3d.euler = types.ModuleType("transforms3d.euler")
    t3d.euler.euler2mat = lambda *a, **k: np.eye(3)
    sys.modules["transforms3d"] = t3d
    sys.modules["transforms3d.euler"] = t3d.euler

v1 = tf.compat.v1


def _shim_dense(
    input, units, activation=None, kernel_initializer=None,
    kernel_regularizer=None, reuse=None, name=None, use_bias=True,
):
    """tf.layers.dense (TF1): y = activation(x @ kernel [+ bias])."""
    in_dim = int(input.shape[-1])
    with v1.variable_scope(name, reuse=reuse):
        k = v1.get_variable(
            "kernel", shape=(in_dim, units), initializer=kernel_initializer
        )
        y = tf.tensordot(input, k, axes=1)
        if use_bias:
            b = v1.get_variable(
                "bias", shape=(units,), initializer=tf.zeros_initializer()
            )
            y = y + b
    return activation(y) if activation is not None else y


def _shim_conv2d(
    input, filters, kernel_size, strides=(1, 1), padding="valid",
    activation=None, kernel_initializer=None, kernel_regularizer=None,
    reuse=None, name=None, use_bias=True,
):
    """tf.layers.conv2d (TF1) via tf.nn.conv2d (NHWC, HWIO kernel)."""
    kh, kw = kernel_size
    c = int(input.shape[-1])
    with v1.variable_scope(name, reuse=reuse):
        k = v1.get_variable(
            "kernel", shape=(kh, kw, c, filters), initializer=kernel_initializer
        )
        y = tf.nn.conv2d(
            input, k, strides=[1, *strides, 1], padding=padding.upper()
        )
        if use_bias:
            b = v1.get_variable(
                "bias", shape=(filters,), initializer=tf.zeros_initializer()
            )
            y = tf.nn.bias_add(y, b)
    return activation(y) if activation is not None else y


def _shim_separable_conv2d(
    input, filters, kernel_size, strides=(1, 1), padding="valid",
    activation=None, depth_multiplier=1, depthwise_initializer=None,
    pointwise_initializer=None, depthwise_regularizer=None,
    pointwise_regularizer=None, reuse=None, name=None, use_bias=True,
):
    """tf.layers.separable_conv2d (TF1) via tf.nn.separable_conv2d."""
    kh, kw = kernel_size
    c = int(input.shape[-1])
    with v1.variable_scope(name, reuse=reuse):
        dw = v1.get_variable(
            "depthwise_kernel",
            shape=(kh, kw, c, depth_multiplier),
            initializer=depthwise_initializer,
        )
        pw = v1.get_variable(
            "pointwise_kernel",
            shape=(1, 1, c * depth_multiplier, filters),
            initializer=pointwise_initializer,
        )
        y = tf.nn.separable_conv2d(
            input, dw, pw, strides=[1, *strides, 1], padding=padding.upper()
        )
        if use_bias:
            b = v1.get_variable(
                "bias", shape=(filters,), initializer=tf.zeros_initializer()
            )
            y = tf.nn.bias_add(y, b)
    return activation(y) if activation is not None else y


def _shim_batch_normalization(
    input, momentum=0.99, training=False, beta_regularizer=None,
    gamma_regularizer=None, reuse=None, name=None, epsilon=1e-3,
):
    """tf.layers.batch_normalization (TF1), inference form (moving stats):
    the A/B runs eval mode only."""
    c = int(input.shape[-1])
    with v1.variable_scope(name, reuse=reuse):
        gamma = v1.get_variable(
            "gamma", shape=(c,), initializer=tf.ones_initializer()
        )
        beta = v1.get_variable(
            "beta", shape=(c,), initializer=tf.zeros_initializer()
        )
        mean = v1.get_variable(
            "moving_mean", shape=(c,), initializer=tf.zeros_initializer(),
            trainable=False,
        )
        var = v1.get_variable(
            "moving_variance", shape=(c,), initializer=tf.ones_initializer(),
            trainable=False,
        )
    return tf.nn.batch_normalization(input, mean, var, beta, gamma, epsilon)


_layers_shim = types.ModuleType("tf.layers")
_layers_shim.dense = _shim_dense
_layers_shim.conv2d = _shim_conv2d
_layers_shim.separable_conv2d = _shim_separable_conv2d
_layers_shim.batch_normalization = _shim_batch_normalization
tf.layers = _layers_shim

if not hasattr(tf, "glorot_normal_initializer"):
    tf.glorot_normal_initializer = v1.glorot_normal_initializer
if not hasattr(tf, "py_func"):
    tf.py_func = v1.py_func
if not hasattr(tf, "variable_scope"):
    tf.variable_scope = v1.variable_scope

# keep_dims -> keepdims (removed in TF2 reduce ops).
for _red in ("reduce_sum", "reduce_min", "reduce_max", "reduce_mean"):
    _orig = getattr(tf, _red)

    def _wrap(*a, __orig=_orig, **k):
        if "keep_dims" in k:
            k["keepdims"] = k.pop("keep_dims")
        return __orig(*a, **k)

    setattr(tf, _red, _wrap)


def _contrib_separable_conv2d(
    inputs,
    num_outputs,
    kernel_size,
    padding="SAME",
    activation_fn=tf.nn.relu,
    depth_multiplier=1,
    weights_initializer=None,
    weights_regularizer=None,
    biases_initializer=None,
    biases_regularizer=None,
    reuse=None,
    scope=None,
):
    """tf.contrib.layers.separable_conv2d with num_outputs=None: depthwise
    conv only (the form pf.depthwise_conv2d uses, pointfly.py:417-447)."""
    assert num_outputs is None, "shim only covers the depthwise-only form"
    kh, kw = kernel_size
    c = int(inputs.shape[-1])
    with v1.variable_scope(scope, reuse=reuse):
        w = v1.get_variable(
            "depthwise_weights",
            shape=(kh, kw, c, depth_multiplier),
            initializer=weights_initializer,
        )
        out = tf.nn.depthwise_conv2d(
            inputs, w, strides=[1, 1, 1, 1], padding=padding.upper()
            if padding in ("VALID", "SAME", "valid", "same")
            else padding,
        )
        if biases_initializer is not None:
            b = v1.get_variable(
                "biases",
                shape=(c * depth_multiplier,),
                initializer=biases_initializer,
            )
            out = tf.nn.bias_add(out, b)
        if activation_fn is not None:
            out = activation_fn(out)
    return out


if not hasattr(tf, "contrib"):
    contrib = types.ModuleType("tf.contrib")
    contrib.layers = types.ModuleType("tf.contrib.layers")
    contrib.layers.l2_regularizer = lambda scale: None
    contrib.layers.separable_conv2d = _contrib_separable_conv2d
    tf.contrib = contrib
else:  # pragma: no cover
    tf.contrib.layers.separable_conv2d = _contrib_separable_conv2d

from hf.core import pointfly as pf  # noqa: E402
from hf.core.feature_extractors import pointcnn as ref_pointcnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from heterofusionrcnn_tpu.models.extractors.layers import (  # noqa: E402
    ConvOverK,
    DenseBN,
    DepthwiseConvOverK,
    SeparableConvOverK,
)
from heterofusionrcnn_tpu.models.extractors.pointcnn import XConv  # noqa: E402
from heterofusionrcnn_tpu.ops.grouping import knn_point  # noqa: E402


def _run_graph(build_fn, feeds=None):
    """Build a TF1-style graph, init vars, return (outputs, {var: value})."""
    g = tf.Graph()
    with g.as_default():
        outs = build_fn()
        init = v1.global_variables_initializer()
        var_list = v1.global_variables()
        with v1.Session(graph=g) as sess:
            sess.run(init)
            var_vals = {var.op.name: sess.run(var) for var in var_list}
            res = sess.run(outs, feed_dict=feeds or {})
    return res, var_vals


def test_knn_indices_general_matches_reference():
    """Our knn_point == pointfly.knn_indices_general (distances + indices)."""
    rng = np.random.default_rng(0)
    # Well-separated points: jittered grid, so no ties in the top-k order.
    base = np.stack(
        np.meshgrid(np.arange(8), np.arange(8), indexing="ij"), -1
    ).reshape(-1, 2)
    pts = np.concatenate(
        [base + rng.uniform(0.05, 0.45, base.shape), rng.uniform(0, 0.4, (64, 1))],
        -1,
    ).astype(np.float32)
    pts = np.stack([pts, pts[::-1]])  # (2, 64, 3)
    qrs = pts[:, ::3]  # (2, 22, 3)
    k = 5

    def build():
        d, idx = pf.knn_indices_general(
            tf.constant(qrs), tf.constant(pts), k, True, unique=False
        )
        return d, idx

    (ref_d, ref_idx), _ = _run_graph(build)

    my_d2, my_idx = knn_point(k, jnp.asarray(pts), jnp.asarray(qrs))
    np.testing.assert_array_equal(np.asarray(my_idx), ref_idx[..., 1])
    # Reference returns NEGATED squared distances un-negated: -(-D) = D.
    np.testing.assert_allclose(np.asarray(my_d2), ref_d, rtol=1e-4, atol=1e-5)


def _inject(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    assert node[path[-1]].shape == value.shape, (
        path,
        node[path[-1]].shape,
        value.shape,
    )
    node[path[-1]] = jnp.asarray(value)


def _bn_paths(ref_vars, scope):
    return {
        "scale": ref_vars[f"{scope}/gamma"],
        "bias": ref_vars[f"{scope}/beta"],
        "mean": ref_vars[f"{scope}/moving_mean"],
        "var": ref_vars[f"{scope}/moving_variance"],
    }


def _apply_densebn_weights(params, stats, name, ref_vars, scope):
    """Map pf.dense weights (kernel + BN) into a DenseBN submodule."""
    _inject(params, (name, "Dense_0", "kernel"), ref_vars[f"{scope}/kernel"])
    bn = _bn_paths(ref_vars, f"{scope}_bn")
    _inject(params, (name, "BatchNorm_0", "scale"), bn["scale"])
    _inject(params, (name, "BatchNorm_0", "bias"), bn["bias"])
    _inject(stats, (name, "BatchNorm_0", "mean"), bn["mean"])
    _inject(stats, (name, "BatchNorm_0", "var"), bn["var"])


def test_pf_dense_matches_reference():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 10, 4, 3)).astype(np.float32)

    def build():
        return pf.dense(tf.constant(x), 16, "d0", tf.constant(False))

    ref_out, ref_vars = _run_graph(build)

    mod = DenseBN(16, name="d0")
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    _inject(params, ("Dense_0", "kernel"), ref_vars["d0/kernel"])
    bn = _bn_paths(ref_vars, "d0_bn")
    _inject(params, ("BatchNorm_0", "scale"), bn["scale"])
    _inject(params, ("BatchNorm_0", "bias"), bn["bias"])
    _inject(stats, ("BatchNorm_0", "mean"), bn["mean"])
    _inject(stats, ("BatchNorm_0", "var"), bn["var"])
    out = mod.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-5, atol=1e-5)


def test_pf_conv2d_over_k_matches_reference():
    """pf.conv2d kernel (1, K) VALID == our ConvOverK dense contraction."""
    rng = np.random.default_rng(2)
    K = 4
    x = rng.standard_normal((2, 10, K, 3)).astype(np.float32)

    def build():
        return pf.conv2d(tf.constant(x), 16, "c0", tf.constant(False), (1, K))

    ref_out, ref_vars = _run_graph(build)  # (2, 10, 1, 16)

    mod = ConvOverK(16, name="c0")
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    kern = ref_vars["c0/kernel"].reshape(K * 3, 16)  # HWIO (1,K,3,16) -> (k*c, o)
    _inject(params, ("DenseBN_0", "Dense_0", "kernel"), kern)
    bn = _bn_paths(ref_vars, "c0_bn")
    _inject(params, ("DenseBN_0", "BatchNorm_0", "scale"), bn["scale"])
    _inject(params, ("DenseBN_0", "BatchNorm_0", "bias"), bn["bias"])
    _inject(stats, ("DenseBN_0", "BatchNorm_0", "mean"), bn["mean"])
    _inject(stats, ("DenseBN_0", "BatchNorm_0", "var"), bn["var"])
    out = mod.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.squeeze(2), rtol=1e-5, atol=1e-5
    )


def test_pf_separable_conv2d_matches_reference():
    rng = np.random.default_rng(3)
    K, C, dm, Cout = 4, 6, 3, 16
    x = rng.standard_normal((2, 10, K, C)).astype(np.float32)

    def build():
        return pf.separable_conv2d(
            tf.constant(x), Cout, "s0", tf.constant(False), (1, K),
            depth_multiplier=dm,
        )

    ref_out, ref_vars = _run_graph(build)  # (2, 10, 1, Cout)

    mod = SeparableConvOverK(Cout, dm, name="s0")
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    # depthwise kernel HWIO (1, K, C, dm) -> ours (K, C, dm)
    _inject(params, ("depthwise",), ref_vars["s0/depthwise_kernel"][0])
    # pointwise (1, 1, C*dm, Cout) -> Dense kernel (C*dm, Cout); both flatten
    # the depthwise output channel-major (c, j).
    _inject(
        params, ("Dense_0", "kernel"), ref_vars["s0/pointwise_kernel"][0, 0]
    )
    bn = _bn_paths(ref_vars, "s0_bn")
    _inject(params, ("BatchNorm_0", "scale"), bn["scale"])
    _inject(params, ("BatchNorm_0", "bias"), bn["bias"])
    _inject(stats, ("BatchNorm_0", "mean"), bn["mean"])
    _inject(stats, ("BatchNorm_0", "var"), bn["var"])
    out = mod.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.squeeze(2), rtol=1e-5, atol=1e-5
    )


def test_pf_depthwise_conv2d_matches_reference():
    rng = np.random.default_rng(4)
    K = 4
    x = rng.standard_normal((2, 10, K, K)).astype(np.float32)

    def build():
        return pf.depthwise_conv2d(
            tf.constant(x), K, "dw0", tf.constant(False), (1, K)
        )

    ref_out, ref_vars = _run_graph(build)  # (2, 10, 1, K*K)

    mod = DepthwiseConvOverK(K, name="dw0")
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    _inject(params, ("depthwise",), ref_vars["dw0/depthwise_weights"][0])
    bn = _bn_paths(ref_vars, "dw0_bn")
    _inject(params, ("BatchNorm_0", "scale"), bn["scale"])
    _inject(params, ("BatchNorm_0", "bias"), bn["bias"])
    _inject(stats, ("BatchNorm_0", "mean"), bn["mean"])
    _inject(stats, ("BatchNorm_0", "var"), bn["var"])
    out = mod.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.squeeze(2), rtol=1e-5, atol=1e-5
    )


def test_full_xconv_block_matches_reference():
    """One complete xconv (KNN -> lift -> X-transform -> separable conv ->
    global branch) with identical weights, eval mode."""
    rng = np.random.default_rng(5)
    B, N, P, K, C, C_pts_fts, dm = 2, 48, 12, 4, 16, 8, 2
    base = np.stack(
        np.meshgrid(np.arange(8), np.arange(6), indexing="ij"), -1
    ).reshape(-1, 2)
    pts1 = np.concatenate(
        [base + rng.uniform(0.05, 0.45, base.shape), rng.uniform(0, 0.4, (48, 1))],
        -1,
    )
    pts = np.stack([pts1, pts1[::-1]]).astype(np.float32)  # (B, N, 3)
    fts = rng.standard_normal((B, N, 6)).astype(np.float32)
    qrs = pts[:, ::4][:, :P]  # (B, P, 3)

    def build():
        return ref_pointcnn.xconv(
            tf.constant(pts), tf.constant(fts), tf.constant(qrs), "xc_",
            B, K, 1, P, C, C_pts_fts, tf.constant(False),
            with_X_transformation=True, depth_multiplier=dm,
            sorting_method=None, with_global=True,
        )

    ref_out, ref_vars = _run_graph(build)  # (B, P, C + C//4)

    mod = XConv(
        K=K, D=1, C=C, C_pts_fts=C_pts_fts, depth_multiplier=dm,
        with_X_transformation=True, with_global=True, name="xc",
    )
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(fts),
        jnp.asarray(qrs), False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    _apply_densebn_weights(params, stats, "nn_fts_from_pts_0", ref_vars,
                           "xc_nn_fts_from_pts_0")
    _apply_densebn_weights(params, stats, "nn_fts_from_pts", ref_vars,
                           "xc_nn_fts_from_pts")
    _apply_densebn_weights(params, stats, "fts_global_0", ref_vars,
                           "xc_fts_global_0")
    _apply_densebn_weights(params, stats, "fts_global", ref_vars,
                           "xc_fts_global")

    # X_0: pf.conv2d (1,K,3,K*K) -> ConvOverK dense (K*3, K*K).
    _inject(params, ("X_0", "DenseBN_0", "Dense_0", "kernel"),
            ref_vars["xc_X_0/kernel"].reshape(K * 3, K * K))
    bn = _bn_paths(ref_vars, "xc_X_0_bn")
    _inject(params, ("X_0", "DenseBN_0", "BatchNorm_0", "scale"), bn["scale"])
    _inject(params, ("X_0", "DenseBN_0", "BatchNorm_0", "bias"), bn["bias"])
    _inject(stats, ("X_0", "DenseBN_0", "BatchNorm_0", "mean"), bn["mean"])
    _inject(stats, ("X_0", "DenseBN_0", "BatchNorm_0", "var"), bn["var"])

    for xname in ("X_1", "X_2"):
        _inject(params, (xname, "depthwise"),
                ref_vars[f"xc_{xname}/depthwise_weights"][0])
        bn = _bn_paths(ref_vars, f"xc_{xname}_bn")
        _inject(params, (xname, "BatchNorm_0", "scale"), bn["scale"])
        _inject(params, (xname, "BatchNorm_0", "bias"), bn["bias"])
        _inject(stats, (xname, "BatchNorm_0", "mean"), bn["mean"])
        _inject(stats, (xname, "BatchNorm_0", "var"), bn["var"])

    _inject(params, ("fts_conv", "depthwise"),
            ref_vars["xc_fts_conv/depthwise_kernel"][0])
    _inject(params, ("fts_conv", "Dense_0", "kernel"),
            ref_vars["xc_fts_conv/pointwise_kernel"][0, 0])
    bn = _bn_paths(ref_vars, "xc_fts_conv_bn")
    _inject(params, ("fts_conv", "BatchNorm_0", "scale"), bn["scale"])
    _inject(params, ("fts_conv", "BatchNorm_0", "bias"), bn["bias"])
    _inject(stats, ("fts_conv", "BatchNorm_0", "mean"), bn["mean"])
    _inject(stats, ("fts_conv", "BatchNorm_0", "var"), bn["var"])

    out = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts), jnp.asarray(fts), jnp.asarray(qrs), False,
    )
    assert out.shape == ref_out.shape == (B, P, C + C // 4)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-4)
