"""Rotated BEV IoU / 3D IoU tests vs convex-clipping numpy oracle."""

import numpy as np

import jax.numpy as jnp

from heterofusionrcnn_tpu.core import geometry, rotated_iou
from tests import oracles


def _random_bev(rng, n):
    cx = rng.uniform(-20, 20, n)
    cz = rng.uniform(0, 50, n)
    l = rng.uniform(1.0, 6.0, n)
    w = rng.uniform(1.0, 3.0, n)
    ry = rng.uniform(-np.pi, np.pi, n)
    return np.stack(
        [cx - l / 2, cz - w / 2, cx + l / 2, cz + w / 2, ry], axis=1
    ).astype(np.float32)


def test_identical_boxes_full_overlap():
    b = jnp.asarray([[0.0, 0.0, 4.0, 2.0, 0.7]])
    iou = np.asarray(rotated_iou.bev_iou(b, b))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-4)


def test_axis_aligned_analytic():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0, 0.0]])
    iou = np.asarray(rotated_iou.bev_iou(a, b))
    np.testing.assert_allclose(iou, [[1.0 / 7.0]], atol=1e-5)


def test_disjoint():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.3]])
    b = jnp.asarray([[10.0, 10.0, 12.0, 12.0, -0.4]])
    iou = np.asarray(rotated_iou.bev_iou(a, b))
    np.testing.assert_allclose(iou, [[0.0]], atol=1e-7)


def test_rotated_45_inside():
    # A unit square rotated 45 deg inside a big square: overlap = small area.
    big = jnp.asarray([[-2.0, -2.0, 2.0, 2.0, 0.0]])
    small = jnp.asarray([[-0.5, -0.5, 0.5, 0.5, np.pi / 4]])
    ov = np.asarray(
        rotated_iou.bev_overlap(big[:, None, :], small[None, :, :])
    )
    np.testing.assert_allclose(ov, [[1.0]], atol=1e-5)


def test_pairwise_vs_oracle():
    rng = np.random.default_rng(7)
    a = _random_bev(rng, 24)
    b = _random_bev(rng, 18)
    # Push some boxes near each other to get nonzero overlaps.
    b[:12, [0, 2]] = a[:12, [0, 2]] + rng.uniform(-1, 1, (12, 2)) * 0.5
    b[:12, [1, 3]] = a[:12, [1, 3]] + rng.uniform(-1, 1, (12, 2)) * 0.5
    got = np.asarray(rotated_iou.bev_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.array(
        [[oracles.bev_iou_np(x, y) for y in b] for x in a], np.float32
    )
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_box3d_iou_height_overlap():
    # Same BEV footprint, y-ranges overlap by half.
    a = jnp.asarray([[0.0, 0.0, 5.0, 4.0, 2.0, 2.0, 0.0]])
    bb = jnp.asarray([[0.0, 1.0, 5.0, 4.0, 2.0, 2.0, 0.0]])
    iou3d, iou2d = rotated_iou.box_3d_iou(a, bb)
    np.testing.assert_allclose(np.asarray(iou2d), [[1.0]], atol=1e-4)
    # Height overlap 1 of 2 each: inter = 8*1, union = 16+16-8 = 24.
    np.testing.assert_allclose(np.asarray(iou3d), [[8.0 / 24.0]], atol=1e-4)


def test_box3d_iou_vs_bev_consistency():
    rng = np.random.default_rng(8)
    n = 10
    boxes = np.stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(0, 2, n),
            rng.uniform(10, 30, n),
            rng.uniform(2, 5, n),
            rng.uniform(1, 2.5, n),
            rng.uniform(1, 2, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=1,
    ).astype(np.float32)
    iou3d, iou2d = rotated_iou.box_3d_iou(jnp.asarray(boxes), jnp.asarray(boxes))
    np.testing.assert_allclose(np.diag(np.asarray(iou3d)), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.diag(np.asarray(iou2d)), 1.0, atol=1e-3)


def test_overlap_symmetry():
    rng = np.random.default_rng(9)
    a = _random_bev(rng, 8)
    b = a.copy()
    b[:, [0, 2]] += 0.5
    ab = np.asarray(rotated_iou.bev_iou(jnp.asarray(a), jnp.asarray(b)))
    ba = np.asarray(rotated_iou.bev_iou(jnp.asarray(b), jnp.asarray(a)))
    np.testing.assert_allclose(ab, ba.T, atol=1e-4)
