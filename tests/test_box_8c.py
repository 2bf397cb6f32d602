"""Facet codec + unordered 8c variants (reference box_8c_encoder.py:187-536,
label_seg_utils.label_point_cloud_v2 :153-228)."""

import numpy as np

from heterofusionrcnn_tpu.core.box_8c import (
    align_boxes_8c,
    box_8co_to_facet,
    label_point_cloud_v2,
    np_box_3d_to_box_8c,
    point_inside_facet,
)
from heterofusionrcnn_tpu.utils.np_box_ops import box_3d_to_corners, points_in_box


def random_boxes(rng, m):
    return np.column_stack(
        [
            rng.uniform(-20, 20, m),
            rng.uniform(-1, 2, m),
            rng.uniform(5, 60, m),
            rng.uniform(1.5, 4.5, m),
            rng.uniform(1.0, 2.0, m),
            rng.uniform(1.2, 2.0, m),
            rng.uniform(-np.pi, np.pi, m),
        ]
    ).astype(np.float32)


def oracle_inside(points, box):
    """Independent membership oracle: canonical-frame interval test."""
    x, y, z, l, w, h, ry = box
    c, s = np.cos(ry), np.sin(ry)
    dx = points[:, 0] - x
    dz = points[:, 2] - z
    lx = dx * c - dz * s
    lz = dx * s + dz * c
    dy = points[:, 1] - y
    return (
        (np.abs(lx) <= l / 2) & (np.abs(lz) <= w / 2) & (dy <= 0) & (dy >= -h)
    )


def test_facet_membership_matches_interval_test():
    rng = np.random.default_rng(0)
    boxes = random_boxes(rng, 16)
    pts = np.column_stack(
        [
            rng.uniform(-25, 25, 4096),
            rng.uniform(-3, 3, 4096),
            rng.uniform(0, 65, 4096),
        ]
    ).astype(np.float32)
    facets = box_8co_to_facet(box_3d_to_corners(boxes))
    got = point_inside_facet(pts, facets)  # (N, M)
    for m in range(boxes.shape[0]):
        want = oracle_inside(pts.astype(np.float64), boxes[m].astype(np.float64))
        # Exclude points within 1mm of the boundary (float tie zone).
        interior = oracle_inside(pts, np.concatenate(
            [boxes[m][:3], boxes[m][3:6] - 2e-3, boxes[m][6:]]))
        exterior = ~oracle_inside(pts, np.concatenate(
            [boxes[m][:3] - [0, -1e-3, 0], boxes[m][3:6] + 2e-3, boxes[m][6:]]))
        decisive = interior | exterior
        assert (got[decisive, m] == want[decisive]).all()
        # Also agree with the production interval test away from boundaries.
        iv = points_in_box(pts, boxes[m])
        assert (got[decisive, m] == iv[decisive]).all()


def test_label_point_cloud_v2_first_box_wins():
    rng = np.random.default_rng(1)
    boxes = np.array(
        [
            [0, 0, 10, 4, 2, 1.5, 0.3],
            [0.5, 0, 10, 4, 2, 1.5, 0.3],  # overlaps box 0
            [10, 0, 30, 4, 2, 1.5, -1.0],
        ],
        np.float32,
    )
    klasses = np.array([2, 1, 3], np.float32)
    pts = np.concatenate(
        [
            np.array([[0.0, -0.5, 10.0]]),   # inside boxes 0 and 1
            np.array([[10.0, -0.5, 30.0]]),  # inside box 2 only
            np.array([[5.0, -0.5, 20.0]]),   # background
            rng.uniform(-1, 1, (64, 3)) * [2, 0.7, 1] + [0, -0.7, 10],
        ]
    ).astype(np.float32)
    seg = label_point_cloud_v2(pts, boxes, klasses)
    assert seg.shape == (pts.shape[0], 8)
    assert seg[0, 0] == 2.0  # first box wins the overlap
    np.testing.assert_allclose(seg[0, 1:8], boxes[0], rtol=1e-6)
    assert seg[1, 0] == 3.0
    np.testing.assert_allclose(seg[1, 1:8], boxes[2], rtol=1e-6)
    assert seg[2, 0] == 0.0 and (seg[2, 1:] == 0).all()
    # No box -> all background.
    empty = label_point_cloud_v2(pts, np.zeros((0, 7)), np.zeros((0,)))
    assert (empty == 0).all()


def test_unordered_8c_ortho_cases_match_ordered_corners():
    """At multiples of 90 deg the ortho-rotated unordered corners span the
    same corner set as the ordered codec."""
    for ry in (0.0, np.pi / 2, -np.pi / 2, np.pi):
        box = np.array([3.0, 1.0, 20.0, 4.0, 1.8, 1.6, ry])
        got = np_box_3d_to_box_8c(box).T  # (8, 3)
        want = box_3d_to_corners(box).astype(np.float64)  # (8, 3)

        def lexsorted(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        np.testing.assert_allclose(
            lexsorted(np.round(got, 5)), lexsorted(np.round(want, 5)),
            atol=1e-4,
        )


def test_unordered_8c_general_ry_properties():
    box = np.array([3.0, 1.0, 20.0, 4.0, 1.8, 1.6, 0.6])
    c = np_box_3d_to_box_8c(box)
    # Centroid preserved (bottom-face center), y extent = h.
    np.testing.assert_allclose(c[0].mean(), 3.0, atol=1e-6)
    np.testing.assert_allclose(c[2].mean(), 20.0, atol=1e-6)
    np.testing.assert_allclose(c[1].max(), 1.0, atol=1e-6)
    np.testing.assert_allclose(c[1].min(), 1.0 - 1.6, atol=1e-6)


def test_align_boxes_8c():
    rng = np.random.default_rng(2)
    boxes = random_boxes(rng, 4)
    # Axis-aligned boxes (ry = 0): alignment of jittered corners recovers
    # the axis extremes; already-aligned boxes are a fixed point.
    boxes[:, 6] = 0.0
    corners = box_3d_to_corners(boxes)  # (N, 8, 3)
    c38 = np.swapaxes(corners, 1, 2)  # (N, 3, 8)
    jitter = rng.normal(0, 0.01, c38.shape)
    aligned = align_boxes_8c(c38 + jitter)
    assert aligned.shape == c38.shape
    # Aligned output is itself stable.
    np.testing.assert_allclose(align_boxes_8c(aligned), aligned)
    # Each axis has exactly the min/max of the jittered corners.
    np.testing.assert_allclose(
        aligned[:, 0].max(1), (c38 + jitter)[:, 0].max(1)
    )
    np.testing.assert_allclose(
        aligned[:, 2].min(1), (c38 + jitter)[:, 2].min(1)
    )
