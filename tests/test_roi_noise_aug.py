"""Vectorized RoI-noise augmentation: batched pair IoU exactness vs the
scalar polygon clip, and distribution-equivalence of the vectorized
`aug_roi_by_noise` vs the reference-shaped retry loop
(hf/datasets/kitti/kitti_dataset.py:687-774)."""

import time
from types import SimpleNamespace

import numpy as np
import pytest

from heterofusionrcnn_tpu.datasets.kitti.rcnn_sampling import (
    aug_roi_by_noise,
    aug_roi_by_noise_loop,
    random_aug_box3d,
    random_aug_boxes3d,
)
from heterofusionrcnn_tpu.utils.np_box_ops import (
    box_3d_iou_pair,
    box_3d_iou_pairs,
)


def _random_boxes(rng, n, spread=2.0):
    return np.concatenate(
        [
            rng.normal(0, spread, (n, 3)),
            np.abs(rng.normal([3.9, 1.6, 1.5], 0.4, (n, 3))) + 0.2,
            rng.uniform(-np.pi, np.pi, (n, 1)),
        ],
        axis=1,
    ).astype(np.float32)


def test_box_3d_iou_pairs_matches_scalar():
    rng = np.random.default_rng(0)
    a = _random_boxes(rng, 600)
    # Mix: nearby (overlapping), identical, and far-apart (disjoint) pairs.
    b = a.copy()
    b[:200, :3] += rng.normal(0, 1.0, (200, 3)).astype(np.float32)
    b[:200, 6:] += rng.normal(0, 0.4, (200, 1)).astype(np.float32)
    b[200:400] = _random_boxes(rng, 200)
    b[400:500, 0] += 100.0  # disjoint
    # rows 500:600 identical -> IoU 1
    iou3d_v, iou2d_v = box_3d_iou_pairs(a, b)
    for i in range(len(a)):
        i3, i2 = box_3d_iou_pair(a[i], b[i])
        np.testing.assert_allclose(iou3d_v[i], i3, atol=1e-5, err_msg=str(i))
        np.testing.assert_allclose(iou2d_v[i], i2, atol=1e-5, err_msg=str(i))
    np.testing.assert_allclose(iou2d_v[500:], 1.0, atol=1e-5)


def test_box_3d_iou_pairs_axis_aligned_oracle():
    # Axis-aligned boxes have a closed-form intersection.
    a = np.array([[0, 0, 0, 4, 2, 2, 0.0]], np.float32)
    b = np.array([[1, 0.5, 0.5, 4, 2, 2, 0.0]], np.float32)
    inter_bev = (4 - 1) * (2 - 0.5)
    iou2d = inter_bev / (8 + 8 - inter_bev)
    inter_h = 2 - 0.5
    inter3d = inter_bev * inter_h
    iou3d = inter3d / (16 + 16 - inter3d)
    i3, i2 = box_3d_iou_pairs(a, b)
    np.testing.assert_allclose(i2[0], iou2d, atol=1e-6)
    np.testing.assert_allclose(i3[0], iou3d, atol=1e-6)


def _fake_ds(seed, method):
    return SimpleNamespace(
        _rng=np.random.default_rng(seed),
        reg_pos_iou_range=[0.55, 1.0],
        cls_pos_iou_range=[0.6, 1.0],
        config=SimpleNamespace(aug_roi_method=method),
    )


@pytest.mark.parametrize("method", ["single", "multiple", "normal"])
def test_random_aug_boxes3d_distribution(method):
    """Batched jitter draws follow the same per-field law as the scalar
    random_aug_box3d (moments over many draws)."""
    rng_a = np.random.default_rng(1)
    rng_b = np.random.default_rng(2)
    base = _random_boxes(np.random.default_rng(3), 1)[0]
    n_draws = 20000
    batched = random_aug_boxes3d(rng_a, base[None], method, n_draws)[0]
    scalar = np.stack(
        [random_aug_box3d(rng_b, base, method) for _ in range(n_draws)]
    )
    # Compare per-dimension mean/std of the jittered boxes.
    np.testing.assert_allclose(
        batched.mean(0), scalar.mean(0), atol=0.02, rtol=0.02
    )
    np.testing.assert_allclose(
        batched.std(0), scalar.std(0), atol=0.02, rtol=0.05
    )


@pytest.mark.parametrize("method", ["single", "multiple"])
def test_aug_roi_by_noise_distribution_equivalence(method):
    """The vectorized first-success selection matches the retry loop in
    distribution: selected-IoU moments and the pass fraction agree."""
    rng = np.random.default_rng(5)
    n = 1200
    gt = _random_boxes(rng, n, spread=5.0).astype(np.float64)
    # RoIs = jittered GTs, the real fg-sampling situation.
    roi = gt.copy()
    roi[:, :3] += rng.normal(0, 0.25, (n, 3))
    roi[:, 3:6] *= 1 + rng.normal(0, 0.08, (n, 3))
    roi[:, 6] += rng.normal(0, 0.1, n)

    ds_v = _fake_ds(11, method)
    ds_l = _fake_ds(22, method)
    out_v, iou_v = aug_roi_by_noise(ds_v, roi, gt, aug_times=10)
    out_l, iou_l = aug_roi_by_noise_loop(ds_l, roi, gt, aug_times=10)
    thresh = 0.55

    assert out_v.shape == roi.shape and iou_v.shape == (n,)
    frac_v = float(np.mean(iou_v >= thresh))
    frac_l = float(np.mean(iou_l >= thresh))
    assert abs(frac_v - frac_l) < 0.05, (frac_v, frac_l)
    np.testing.assert_allclose(iou_v.mean(), iou_l.mean(), atol=0.03)
    np.testing.assert_allclose(iou_v.std(), iou_l.std(), atol=0.03)
    # Selected boxes stay near their source RoIs in both.
    np.testing.assert_allclose(
        np.abs(out_v[:, :3] - roi[:, :3]).mean(),
        np.abs(out_l[:, :3] - roi[:, :3]).mean(),
        atol=0.05,
    )


def test_aug_roi_by_noise_first_success_semantics():
    """With a certain-pass setup every RoI keeps a candidate with IoU >=
    thresh; with an impossible threshold the LAST candidate is kept (the
    loop exits with its final draw)."""
    rng = np.random.default_rng(9)
    gt = _random_boxes(rng, 64, spread=4.0).astype(np.float64)

    ds = _fake_ds(1, "single")
    ds.reg_pos_iou_range = [0.0, 1.0]  # always passes -> first candidate
    ds.cls_pos_iou_range = [0.0, 1.0]
    out, iou = aug_roi_by_noise(ds, gt.copy(), gt, aug_times=10)
    assert (iou >= 0.0).all() and out.shape == gt.shape

    ds2 = _fake_ds(1, "single")
    ds2.reg_pos_iou_range = [1.1, 1.0]  # impossible threshold
    ds2.cls_pos_iou_range = [1.1, 1.0]
    out2, iou2 = aug_roi_by_noise(ds2, gt.copy(), gt, aug_times=10)
    assert (iou2 < 1.1).all()
    # Deterministic twin of the pick: re-running with the same seed must
    # reproduce (bulk draws are a pure function of the RNG state).
    ds3 = _fake_ds(1, "single")
    ds3.reg_pos_iou_range = [1.1, 1.0]
    ds3.cls_pos_iou_range = [1.1, 1.0]
    out3, iou3 = aug_roi_by_noise(ds3, gt.copy(), gt, aug_times=10)
    np.testing.assert_allclose(out2, out3)
    np.testing.assert_allclose(iou2, iou3)


def test_aug_roi_by_noise_empty():
    ds = _fake_ds(0, "single")
    out, iou = aug_roi_by_noise(ds, np.zeros((0, 7)), np.zeros((0, 7)))
    assert out.shape == (0, 7) and iou.shape == (0,)


def test_vectorized_speedup_host_prep():
    """The vectorized path must be well under the loop's host-prep time at
    the production mini-batch shape (64 fg RoIs x 10 retries)."""
    rng = np.random.default_rng(7)
    gt = _random_boxes(rng, 64, spread=5.0).astype(np.float64)
    roi = gt.copy()
    roi[:, :3] += rng.normal(0, 0.3, (64, 3))

    def timed(fn, seed):
        ds = _fake_ds(seed, "multiple")
        t0 = time.perf_counter()
        for _ in range(5):
            fn(ds, roi, gt, aug_times=10)
        return (time.perf_counter() - t0) / 5

    t_vec = timed(aug_roi_by_noise, 3)
    t_loop = timed(aug_roi_by_noise_loop, 3)
    # Not a benchmark assert on absolute time — just that vectorization
    # didn't regress below the loop (typically ~10-30x faster).
    assert t_vec < t_loop, (t_vec, t_loop)
