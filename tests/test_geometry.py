"""Geometry core tests vs numpy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from heterofusionrcnn_tpu.core import geometry
from tests import oracles


def _random_boxes(rng, n):
    boxes = np.stack(
        [
            rng.uniform(-40, 40, n),
            rng.uniform(-2, 3, n),
            rng.uniform(0, 70, n),
            rng.uniform(1.5, 5.0, n),
            rng.uniform(1.0, 2.5, n),
            rng.uniform(1.0, 2.5, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=1,
    ).astype(np.float32)
    return boxes


def test_box_3d_to_corners_matches_oracle():
    rng = np.random.default_rng(0)
    boxes = _random_boxes(rng, 32)
    got = np.asarray(geometry.box_3d_to_corners(jnp.asarray(boxes)))
    want = np.stack([oracles.box_3d_corners_np(b) for b in boxes])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_corners_batch_dims():
    rng = np.random.default_rng(1)
    boxes = _random_boxes(rng, 12).reshape(3, 4, 7)
    got = geometry.box_3d_to_corners(jnp.asarray(boxes))
    assert got.shape == (3, 4, 8, 3)
    flat = geometry.box_3d_to_corners(jnp.asarray(boxes.reshape(-1, 7)))
    np.testing.assert_allclose(
        np.asarray(got).reshape(-1, 8, 3), np.asarray(flat), atol=1e-6
    )


def test_bev_corners_match_3d_projection():
    """BEV corners must equal the x/z projection of the bottom 3D corners."""
    rng = np.random.default_rng(2)
    boxes = _random_boxes(rng, 16)
    c3d = np.asarray(geometry.box_3d_to_corners(jnp.asarray(boxes)))
    bev = geometry.boxes_3d_to_bev(jnp.asarray(boxes))
    c2d = np.asarray(geometry.bev_box_corners(bev))
    # Bottom corners P1..P4 project onto the BEV rectangle corners; ordering
    # differs (P1=(+l,+w) vs BEV corner0=(x1,z1)=(-l,-w)), so compare as sets.
    proj = c3d[:, :4][:, :, [0, 2]]
    for a, b in zip(proj, c2d):
        a_sorted = a[np.lexsort(a.T)]
        b_sorted = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a_sorted, b_sorted, atol=1e-4)


def test_points_in_box():
    rng = np.random.default_rng(3)
    boxes = _random_boxes(rng, 8)
    pts = rng.uniform(-45, 75, (256, 3)).astype(np.float32)
    # Also include points guaranteed inside.
    for b in boxes:
        corners = geometry.box_3d_to_corners(jnp.asarray(b))
        got = np.asarray(
            geometry.points_in_box_3d(jnp.asarray(pts), corners)
        )
        want = oracles.points_in_box_np(pts, b)
        # Allow disagreement only within eps of the boundary.
        disagree = got != want
        if disagree.any():
            inside_np = oracles.points_in_box_np(pts[disagree], b * (1 + 1e-5))
            assert disagree.sum() < 3, "too many boundary disagreements"


def test_points_in_box_hits_interior():
    rng = np.random.default_rng(4)
    boxes = _random_boxes(rng, 4)
    for b in boxes:
        x, y, z, l, w, h, ry = b
        # Sample points in the canonical frame, transform out.
        local = rng.uniform(-0.49, 0.49, (64, 3)).astype(np.float32) * np.array(
            [l, h, w], np.float32
        )
        local[:, 1] = -(local[:, 1] * 0.5 + 0.25 * h + h * 0.25)  # within (-h, 0)
        pts = np.asarray(
            geometry.canonical_untransform(
                jnp.asarray(local[None]), jnp.asarray(b[None])
            )
        )[0]
        corners = geometry.box_3d_to_corners(jnp.asarray(b))
        got = np.asarray(geometry.points_in_box_3d(jnp.asarray(pts), corners))
        assert got.all()


def test_canonical_transform_roundtrip():
    rng = np.random.default_rng(5)
    boxes = jnp.asarray(_random_boxes(rng, 6))
    pts = jnp.asarray(rng.uniform(-10, 10, (6, 32, 3)).astype(np.float32))
    ct = geometry.canonical_transform(pts, boxes)
    back = geometry.canonical_untransform(ct, boxes)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_canonical_transform_aligns_heading():
    """A box's own +x corner direction maps to +x in canonical frame."""
    box = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 2.0, 1.5, 0.7]])
    corners = geometry.box_3d_to_corners(box)  # (1, 8, 3)
    ct = geometry.canonical_transform(corners, box)
    ct = np.asarray(ct)[0]
    # P1 = (+l/2, 0, +w/2) in local frame.
    np.testing.assert_allclose(ct[0], [2.0, 0.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(ct[5], [2.0, -1.5, -1.0], atol=1e-5)


def test_expand_box_grows_symmetrically():
    box = jnp.asarray([[0.0, 1.0, 5.0, 4.0, 2.0, 1.5, 0.3]])
    ex = np.asarray(geometry.expand_box_3d(box, 1.0))[0]
    np.testing.assert_allclose(ex, [0, 2.0, 5, 6.0, 4.0, 3.5, 0.3], atol=1e-6)
