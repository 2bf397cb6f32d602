"""Tests for prefetcher, 2D box ops, IDS sampling, neighbor sorting, and the
native data loader."""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.core import box_2d
from heterofusionrcnn_tpu.datasets.prefetch import BatchPrefetcher
from heterofusionrcnn_tpu.ops.grouping import knn_point, sort_neighbor_indices
from heterofusionrcnn_tpu.ops.sampling import inverse_density_sampling

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "kitti")


def test_box_2d_iou():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0], [10.0, 10.0, 11.0, 11.0]])
    got = np.asarray(box_2d.iou(a, b))
    np.testing.assert_allclose(got, [[1.0 / 7.0, 0.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(box_2d.area(b)), [4.0, 1.0])


def test_box_2d_clip_scale():
    b = jnp.asarray([[-5.0, -5.0, 50.0, 50.0]])
    clipped = np.asarray(box_2d.clip_to_window(b, (0, 0, 10, 10)))
    np.testing.assert_allclose(clipped, [[0, 0, 10, 10]])
    scaled = np.asarray(box_2d.scale(b, 2.0, 0.5))
    np.testing.assert_allclose(scaled, [[-10, -2.5, 100, 25]])


def test_prefetcher_orders_and_overlaps():
    calls = []

    def next_batch():
        calls.append(len(calls))
        time.sleep(0.01)
        return {"i": np.asarray([len(calls)])}

    pf = BatchPrefetcher(next_batch, capacity=2)
    vals = [int(pf.next()["i"][0]) for _ in range(5)]
    pf.close()
    assert vals == sorted(vals)
    assert len(vals) == 5


def test_prefetcher_propagates_errors():
    def bad_batch():
        raise RuntimeError("boom")

    pf = BatchPrefetcher(bad_batch)
    with pytest.raises(RuntimeError):
        pf.next()
    pf.close()


def test_inverse_density_sampling_prefers_sparse():
    rng = np.random.default_rng(0)
    # Dense cluster + sparse outliers: IDS should overselect outliers.
    dense = rng.normal(0, 0.1, (900, 3))
    sparse = rng.uniform(-50, 50, (100, 3))
    pts = jnp.asarray(np.concatenate([dense, sparse])[None].astype(np.float32))
    idx = np.asarray(
        inverse_density_sampling(jax.random.PRNGKey(0), pts, 8, 100)
    )[0]
    assert len(np.unique(idx)) == 100  # without replacement
    frac_sparse = (idx >= 900).mean()
    assert frac_sparse > 0.5  # sparse points are 10% of input but >50% sampled


def test_sort_neighbor_indices_l2():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    _, idx = knn_point(8, pts, pts[:, :16])
    sorted_idx = sort_neighbor_indices(pts, idx, "l2")
    assert sorted_idx.shape == idx.shape
    # Same neighbor sets, different order.
    for p in range(16):
        assert set(np.asarray(sorted_idx)[0, p].tolist()) == set(
            np.asarray(idx)[0, p].tolist()
        )
    # Distances from neighborhood centroid must be descending.
    nn = np.asarray(pts)[0][np.asarray(sorted_idx)[0]]  # (16, 8, 3)
    center = nn.mean(axis=1, keepdims=True)
    dists = np.linalg.norm(nn - center, axis=-1)
    assert (np.diff(dists, axis=1) <= 1e-5).all()


def test_sort_neighbor_indices_cxyz():
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
    _, idx = knn_point(4, pts, pts[:, :8])
    out = sort_neighbor_indices(pts, idx, "cxyz")
    assert out.shape == idx.shape
    with pytest.raises(ValueError):
        sort_neighbor_indices(pts, idx, "cxxz")


def test_native_loader_matches_numpy():
    from heterofusionrcnn_tpu.datasets.kitti import calib as calib_io
    from heterofusionrcnn_tpu.datasets.kitti import native_loader

    calib_dir = os.path.join(FIXTURE, "training", "calib")
    velo = os.path.join(FIXTURE, "training", "velodyne", "000000.bin")
    calib = calib_io.read_calibration(calib_dir, 0)
    native = native_loader.load_and_filter_native(velo, calib, [1242, 375])
    if native is None:
        pytest.skip("native loader not built")

    # numpy reference
    xyzi = calib_io.read_lidar(os.path.dirname(velo), 0)
    pts = calib_io.lidar_to_cam_frame(xyzi[:, :3], calib)
    front = pts[:, 2] > 0
    pts, inten = pts[front], xyzi[front, 3]
    uv = calib_io.project_to_image(pts, calib.p2)
    keep = (uv[:, 0] > 0) & (uv[:, 0] < 1242) & (uv[:, 1] > 0) & (uv[:, 1] < 375)
    want = np.hstack([pts[keep], inten[keep][:, None]]).astype(np.float32)
    assert native.shape == want.shape
    np.testing.assert_allclose(native, want, atol=1e-4)


def test_area_filter_with_plane():
    from heterofusionrcnn_tpu.datasets.kitti.pointcloud import get_area_filter

    extents = np.array([[-40, 40], [-5, 3], [0, 70]], float)
    pts = np.array(
        [
            [0.0, 1.5, 10.0],   # near ground (y=1.65 plane-ish)
            [0.0, -4.0, 10.0],  # 5.5m above ground -> removed by offset 2
            [100.0, 1.5, 10.0], # outside x extents
            [0.0, 1.5, 80.0],   # outside z extents
        ]
    )
    plane = np.array([0.0, -1.0, 0.0, 1.65])  # y = 1.65 road plane
    mask = get_area_filter(pts, extents, plane, offset_dist=2.0)
    # dot = -y + 1.65 - 2 < 0  <=>  y > -0.35
    assert mask.tolist() == [True, False, False, False]


def test_indices_to_dense_vector():
    from heterofusionrcnn_tpu.utils.np_box_ops import indices_to_dense_vector

    v = indices_to_dense_vector([1, 3], 5)
    np.testing.assert_allclose(v, [0, 1, 0, 1, 0])
