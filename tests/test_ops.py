"""Point-op suite tests vs numpy oracles (FPS, ball query, KNN, group,
interpolate, crop-and-sample, NMS)."""

import numpy as np

import jax.numpy as jnp

from heterofusionrcnn_tpu.core import geometry
from heterofusionrcnn_tpu.ops import cropping, grouping, interpolate, nms, sampling
from tests import oracles


def test_fps_matches_oracle():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-10, 10, (2, 128, 3)).astype(np.float32)
    got = np.asarray(sampling.farthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(2):
        want = oracles.fps_np(xyz[b], 16)
        np.testing.assert_array_equal(got[b], want)


def test_fps_spreads_points():
    # FPS of a line of points picks the endpoints early.
    xyz = np.zeros((1, 100, 3), np.float32)
    xyz[0, :, 0] = np.arange(100)
    idx = np.asarray(sampling.farthest_point_sample(jnp.asarray(xyz), 3))[0]
    assert idx[0] == 0 and idx[1] == 99 and idx[2] in (49, 50)


def test_gather_point():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(2, 32, 3)).astype(np.float32)
    idx = rng.integers(0, 32, (2, 8)).astype(np.int32)
    got = np.asarray(sampling.gather_point(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], pts[b][idx[b]])


def test_prob_sample():
    probs = np.array([[0.1, 0.2, 0.3, 0.4]], np.float32)
    cdf = np.cumsum(probs, axis=1)
    u = np.array([[0.05, 0.15, 0.45, 0.95]], np.float32)
    got = np.asarray(sampling.prob_sample(jnp.asarray(cdf), jnp.asarray(u)))
    np.testing.assert_array_equal(got, [[0, 1, 2, 3]])


def test_ball_query_matches_oracle():
    rng = np.random.default_rng(2)
    xyz = rng.uniform(-2, 2, (2, 64, 3)).astype(np.float32)
    new_xyz = xyz[:, :16]
    idx, cnt = grouping.query_ball_point(0.8, 8, jnp.asarray(xyz), jnp.asarray(new_xyz))
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for b in range(2):
        widx, wcnt = oracles.ball_query_np(0.8, 8, xyz[b], new_xyz[b])
        np.testing.assert_array_equal(cnt[b], wcnt)
        np.testing.assert_array_equal(idx[b], widx)


def test_ball_query_chunked_equals_unchunked():
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-2, 2, (1, 64, 3)).astype(np.float32)
    q = rng.uniform(-2, 2, (1, 32, 3)).astype(np.float32)
    i1, c1 = grouping.query_ball_point(0.7, 4, jnp.asarray(xyz), jnp.asarray(q), chunk_size=8)
    i2, c2 = grouping.query_ball_point(0.7, 4, jnp.asarray(xyz), jnp.asarray(q), chunk_size=1024)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_knn_point():
    rng = np.random.default_rng(4)
    xyz = rng.uniform(-2, 2, (1, 50, 3)).astype(np.float32)
    q = rng.uniform(-2, 2, (1, 10, 3)).astype(np.float32)
    d, idx = grouping.knn_point(5, jnp.asarray(xyz), jnp.asarray(q))
    d, idx = np.asarray(d), np.asarray(idx)
    full = np.sum((q[0][:, None] - xyz[0][None]) ** 2, axis=-1)
    want_idx = np.argsort(full, axis=1, kind="stable")[:, :5]
    np.testing.assert_allclose(np.sort(d[0], axis=1), np.sort(np.take_along_axis(full, want_idx, 1), axis=1), atol=1e-5)
    # distances ascending
    assert (np.diff(d[0], axis=1) >= -1e-6).all()


def test_knn_subset_derivation_identity():
    """PointCNN's subset derivation relies on: the same-set kNN rows of a
    point set, gathered at a subset's indices, equal a fresh kNN of those
    subset queries against the same candidates — including the tie rule.
    Duplicated points stress the (equal distance -> lowest index) ties."""
    rng = np.random.default_rng(11)
    base = rng.uniform(-2, 2, (2, 48, 3)).astype(np.float32)
    xyz = np.concatenate([base, base[:, :16]], axis=1)  # 64 pts, 16 dups
    sidx = np.stack(
        [rng.permutation(64)[:20].astype(np.int32) for _ in range(2)]
    )
    k = 6
    _, same = grouping.knn_point(k, jnp.asarray(xyz), jnp.asarray(xyz))
    sub = sampling.gather_point(jnp.asarray(xyz), jnp.asarray(sidx))
    _, fresh = grouping.knn_point(k, jnp.asarray(xyz), sub)
    derived = jnp.take_along_axis(
        same, jnp.asarray(sidx)[:, :, None].astype(jnp.int32), axis=1
    )
    np.testing.assert_array_equal(np.asarray(derived), np.asarray(fresh))


def test_group_point():
    rng = np.random.default_rng(5)
    fts = rng.normal(size=(2, 40, 6)).astype(np.float32)
    idx = rng.integers(0, 40, (2, 5, 3)).astype(np.int32)
    got = np.asarray(grouping.group_point(jnp.asarray(fts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], fts[b][idx[b]])


def test_three_nn_and_interpolate():
    rng = np.random.default_rng(6)
    unknown = rng.uniform(-2, 2, (1, 20, 3)).astype(np.float32)
    known = rng.uniform(-2, 2, (1, 8, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 8, 4)).astype(np.float32)

    d, idx = interpolate.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d, idx = np.asarray(d), np.asarray(idx)
    full = np.sum((unknown[0][:, None] - known[0][None]) ** 2, axis=-1)
    want = np.sort(full, axis=1)[:, :3]
    np.testing.assert_allclose(d[0], want, atol=1e-5)

    out = interpolate.three_interpolate_inverse_distance(
        jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(feats)
    )
    # numpy oracle
    dd = np.maximum(full, 1e-10)
    order = np.argsort(dd, axis=1)[:, :3]
    d3 = np.take_along_axis(dd, order, 1)
    w = (1.0 / d3) / np.sum(1.0 / d3, axis=1, keepdims=True)
    want_feats = np.einsum("nk,nkc->nc", w, feats[0][order])
    np.testing.assert_allclose(np.asarray(out)[0], want_feats, atol=1e-4)


def test_interpolate_exact_at_known_points():
    known = jnp.asarray(np.random.default_rng(7).uniform(-1, 1, (1, 10, 3)).astype(np.float32))
    feats = jnp.asarray(np.random.default_rng(8).normal(size=(1, 10, 4)).astype(np.float32))
    out = interpolate.three_interpolate_inverse_distance(known, known, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-4)


def test_crop_and_sample():
    rng = np.random.default_rng(9)
    b, n, c, resize = 2, 200, 5, 16
    pts = rng.uniform(-10, 10, (b, n, 3)).astype(np.float32)
    fts = rng.normal(size=(b, n, c)).astype(np.float32)
    inten = rng.normal(size=(b, n, 1)).astype(np.float32)
    mask = (rng.uniform(size=(b, n)) > 0.5).astype(np.float32)

    boxes = np.array(
        [
            [0.0, 2.0, 0.0, 8.0, 6.0, 4.0, 0.4],   # big box, catches points
            [50.0, 0.0, 50.0, 1.0, 1.0, 1.0, 0.0],  # empty box
            [2.0, 1.0, -2.0, 6.0, 6.0, 5.0, -0.8],
        ],
        np.float32,
    )
    box_ind = np.array([0, 0, 1], np.int32)
    corners = geometry.box_3d_to_corners(jnp.asarray(boxes))

    crop_pts, crop_fts, crop_int, crop_mask, crop_ind, nonempty = (
        cropping.pc_crop_and_sample(
            jnp.asarray(pts), jnp.asarray(fts), jnp.asarray(inten),
            jnp.asarray(mask), corners, jnp.asarray(box_ind), resize,
        )
    )
    nonempty = np.asarray(nonempty)
    crop_ind = np.asarray(crop_ind)
    assert nonempty[0] and not nonempty[1]

    for k, (box, bi) in enumerate(zip(boxes, box_ind)):
        inside = oracles.points_in_box_np(pts[bi], box)
        members = np.flatnonzero(inside)
        if len(members) == 0:
            assert not nonempty[k]
            continue
        first = members[: min(len(members), resize)]
        cnt = len(first)
        want = [first[j % cnt] for j in range(resize)]
        np.testing.assert_array_equal(crop_ind[k], want)
        np.testing.assert_allclose(np.asarray(crop_pts)[k], pts[bi][want], atol=1e-6)
        np.testing.assert_allclose(np.asarray(crop_fts)[k], fts[bi][want], atol=1e-6)
        np.testing.assert_allclose(np.asarray(crop_mask)[k], mask[bi][want], atol=1e-6)


def test_oriented_nms_vs_oracle():
    rng = np.random.default_rng(10)
    n = 40
    cx = rng.uniform(-5, 5, n)
    cz = rng.uniform(0, 10, n)
    l = rng.uniform(2, 5, n)
    w = rng.uniform(1, 3, n)
    ry = rng.uniform(-np.pi, np.pi, n)
    bev = np.stack([cx - l / 2, cz - w / 2, cx + l / 2, cz + w / 2, ry], 1).astype(np.float32)
    scores = rng.uniform(size=n).astype(np.float32)

    keep_idx, keep_valid = nms.oriented_nms(jnp.asarray(bev), jnp.asarray(scores), 0.3, 20)
    got = list(np.asarray(keep_idx)[np.asarray(keep_valid)])
    want = oracles.nms_np(bev, scores, 0.3, 20)
    assert got == want


def test_oriented_nms_identical_boxes():
    bev = np.tile(np.array([[0, 0, 4, 2, 0.5]], np.float32), (5, 1))
    scores = np.array([0.1, 0.9, 0.5, 0.3, 0.2], np.float32)
    keep_idx, keep_valid = nms.oriented_nms(jnp.asarray(bev), jnp.asarray(scores), 0.5, 5)
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got, [1])


def test_oriented_nms_respects_valid_mask():
    bev = np.array([[0, 0, 4, 2, 0.0], [10, 10, 14, 12, 0.0]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    keep_idx, keep_valid = nms.oriented_nms(
        jnp.asarray(bev), jnp.asarray(scores), 0.5, 2,
        valid_mask=jnp.asarray([False, True]),
    )
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got, [1])
