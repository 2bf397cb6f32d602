"""Bin-based box codec round-trip and reference-semantic tests."""

import numpy as np

import jax.numpy as jnp

from heterofusionrcnn_tpu.core import bin_codec

# rpn_multiclass.config values.
S = np.array([3.0, 1.5, 1.5], np.float32)
DELTA = np.array([0.5, 0.25, 0.25], np.float32)
R = np.pi  # rpn_theta_search_range: 1.0 (fraction of pi)
NUM_BIN_THETA = 12
DELTA_THETA = 2 * R / NUM_BIN_THETA
K = 3
MEAN_SIZES = np.array(
    [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.57, 1.73]], np.float32
)


def test_rpn_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    n = 64
    ref = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    cls = rng.integers(0, K, n)
    # Boxes near their reference points, within the per-class search range.
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = ref[:, 0] + rng.uniform(-0.9, 0.9, n) * S[cls] * 0.9
    boxes[:, 1] = ref[:, 1] + rng.uniform(-1, 1, n)
    boxes[:, 2] = ref[:, 2] + rng.uniform(-0.9, 0.9, n) * S[cls] * 0.9
    boxes[:, 3:6] = MEAN_SIZES[cls] * rng.uniform(0.8, 1.2, (n, 3))
    boxes[:, 6] = rng.uniform(-R * 0.99, R * 0.99, n)

    mean_per_pt = MEAN_SIZES[cls]
    enc = bin_codec.encode_rpn(
        jnp.asarray(ref), jnp.asarray(boxes), jnp.asarray(mean_per_pt),
        jnp.asarray(S), jnp.asarray(DELTA), R, DELTA_THETA, K,
    )
    bin_x, res_x, bin_z, res_z, bin_t, res_t, res_y, res_size = enc
    # Select the true-class channel for x/z (encode emits all K channels).
    sel = jnp.arange(n)
    bx = bin_x[sel, cls]
    rx = res_x[sel, cls]
    bz = bin_z[sel, cls]
    rz = res_z[sel, cls]

    dec = bin_codec.decode(
        jnp.asarray(ref), 0.0,
        bx[:, None], rx[:, None], bz[:, None], rz[:, None],
        bin_t[:, None], res_t[:, None], res_y[:, None],
        res_size[:, None, :],
        jnp.asarray(mean_per_pt)[:, None, :],
        jnp.asarray(S[cls])[:, None], jnp.asarray(DELTA[cls])[:, None],
        R, DELTA_THETA,
    )
    got = np.asarray(dec)[:, 0, :]
    np.testing.assert_allclose(got[:, :6], boxes[:, :6], atol=1e-3)
    # theta wraps within [-R, R); compare modulo 2R.
    dt = np.mod(got[:, 6] - boxes[:, 6] + R, 2 * R) - R
    np.testing.assert_allclose(dt, 0, atol=1e-3)


def test_rpn_bins_in_range():
    rng = np.random.default_rng(1)
    n = 32
    ref = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = ref[:, 0] + rng.uniform(-10, 10, n)  # deliberately out of range
    boxes[:, 2] = ref[:, 2] + rng.uniform(-10, 10, n)
    boxes[:, 3:6] = 1.0
    boxes[:, 6] = rng.uniform(-4, 4, n)
    enc = bin_codec.encode_rpn(
        jnp.asarray(ref), jnp.asarray(boxes), jnp.ones((n, 3), jnp.float32),
        jnp.asarray(S), jnp.asarray(DELTA), R, DELTA_THETA, K,
    )
    bin_x, _, bin_z, _, bin_t, _, _, _ = [np.asarray(e) for e in enc]
    num_bins = (2 * S / DELTA).astype(int)  # [12, 12, 12]
    for k in range(K):
        assert bin_x[:, k].min() >= 0 and bin_x[:, k].max() < num_bins[k]
        assert bin_z[:, k].min() >= 0 and bin_z[:, k].max() < num_bins[k]
    assert bin_t.min() >= 0 and bin_t.max() < NUM_BIN_THETA


def test_rcnn_encode_decode_roundtrip():
    rng = np.random.default_rng(2)
    n = 48
    R_rcnn = 0.25 * np.pi
    DT_rcnn = 2 * R_rcnn / 12
    ref = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    ref_theta = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    cls = rng.integers(0, K, n)
    S_r = np.array([1.5, 0.75, 0.75], np.float32)
    D_r = np.array([0.5, 0.25, 0.25], np.float32)

    # GT near the proposal: offset within range in the proposal frame, heading
    # within +-R of the proposal heading.
    boxes = np.zeros((n, 7), np.float32)
    off = rng.uniform(-0.9, 0.9, (n, 2)) * S_r[cls][:, None] * 0.9
    c, s = np.cos(ref_theta), np.sin(ref_theta)
    # World offset = frame offset rotated out: inverse of _rotate_into_frame.
    boxes[:, 0] = ref[:, 0] + off[:, 0] * c + off[:, 1] * s
    boxes[:, 2] = ref[:, 2] - off[:, 0] * s + off[:, 1] * c
    boxes[:, 1] = ref[:, 1] + rng.uniform(-0.5, 0.5, n)
    boxes[:, 3:6] = MEAN_SIZES[cls] * rng.uniform(0.9, 1.1, (n, 3))
    boxes[:, 6] = ref_theta + rng.uniform(-0.9, 0.9, n) * R_rcnn

    mean_per_pt = MEAN_SIZES[cls]
    enc = bin_codec.encode_rcnn(
        jnp.asarray(ref), jnp.asarray(ref_theta), jnp.asarray(boxes),
        jnp.asarray(mean_per_pt),
        jnp.asarray(S_r[cls])[:, None] if False else jnp.asarray(S_r),
        jnp.asarray(D_r), R_rcnn, DT_rcnn, K,
    )
    bin_x, res_x, bin_z, res_z, bin_t, res_t, res_y, res_size = enc
    sel = jnp.arange(n)
    dec = bin_codec.decode(
        jnp.asarray(ref), jnp.asarray(ref_theta),
        bin_x[sel, cls][:, None], res_x[sel, cls][:, None],
        bin_z[sel, cls][:, None], res_z[sel, cls][:, None],
        bin_t[:, None], res_t[:, None], res_y[:, None],
        res_size[:, None, :],
        jnp.asarray(mean_per_pt)[:, None, :],
        jnp.asarray(S_r[cls])[:, None], jnp.asarray(D_r[cls])[:, None],
        R_rcnn, DT_rcnn,
    )
    got = np.asarray(dec)[:, 0, :]
    np.testing.assert_allclose(got[:, :6], boxes[:, :6], atol=2e-3)
    # Heading recovered modulo pi (the codec flips backwards boxes).
    dt = np.mod(got[:, 6] - boxes[:, 6] + np.pi / 2, np.pi) - np.pi / 2
    np.testing.assert_allclose(dt, 0, atol=2e-3)


def test_decode_batch_rank3():
    """RPN rank-3 (B, P, K) decode shape contract."""
    b, p = 2, 16
    rng = np.random.default_rng(3)
    ref = jnp.asarray(rng.uniform(-5, 5, (b, p, 3)).astype(np.float32))
    bins = jnp.asarray(rng.integers(0, 12, (b, p, K)).astype(np.int32))
    res = jnp.zeros((b, p, K), jnp.float32)
    res_size = jnp.zeros((b, p, K, 3), jnp.float32)
    mean = jnp.asarray(np.broadcast_to(MEAN_SIZES, (b, p, K, 3)).copy())
    out = bin_codec.decode(
        ref, 0.0, bins, res, bins, res, bins, res, res, res_size, mean,
        jnp.asarray(S), jnp.asarray(DELTA), R, DELTA_THETA,
    )
    assert out.shape == (b, p, K, 7)
