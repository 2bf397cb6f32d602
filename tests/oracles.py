"""Pure-numpy reference oracles for op tests.

Independent re-derivations of the op semantics (NOT ports of the CUDA code):
convex polygon clipping for rotated IoU, sequential FPS, linear-scan ball
query, brute-force point-in-box. The jnp ops are validated against these.
"""

from __future__ import annotations

import numpy as np


def box_3d_corners_np(box):
    """box_3d -> 8 corners, same order as the jnp implementation."""
    x, y, z, l, w, h, ry = box
    xs = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * l / 2.0
    zs = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * w / 2.0
    ys = np.array([0, 0, 0, 0, -1, -1, -1, -1]) * h
    c, s = np.cos(ry), np.sin(ry)
    xr = xs * c + zs * s
    zr = -xs * s + zs * c
    return np.stack([xr + x, ys + y, zr + z], axis=1)


def bev_corners_np(bev_box):
    """BEV 5-tuple -> 4 oriented corners (reference rotation convention)."""
    x1, z1, x2, z2, ry = bev_box
    cx, cz = (x1 + x2) / 2.0, (z1 + z2) / 2.0
    xs = np.array([x1, x2, x2, x1]) - cx
    zs = np.array([z1, z1, z2, z2]) - cz
    c, s = np.cos(ry), np.sin(ry)
    return np.stack([xs * c + zs * s + cx, -xs * s + zs * c + cz], axis=1)


def _clip_polygon(subject, cx, cz, nx, nz):
    """Clip polygon by half-plane nx*(x-cx)+nz*(z-cz) <= 0 (Sutherland-Hodgman)."""
    out = []
    n = len(subject)
    for i in range(n):
        cur = subject[i]
        nxt = subject[(i + 1) % n]
        d_cur = nx * (cur[0] - cx) + nz * (cur[1] - cz)
        d_nxt = nx * (nxt[0] - cx) + nz * (nxt[1] - cz)
        if d_cur <= 0:
            out.append(cur)
        if (d_cur < 0 < d_nxt) or (d_nxt < 0 < d_cur):
            t = d_cur / (d_cur - d_nxt)
            out.append(cur + t * (nxt - cur))
    return out


def polygon_area(poly):
    if len(poly) < 3:
        return 0.0
    pts = np.asarray(poly)
    x, z = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(z, -1)) - np.dot(z, np.roll(x, -1)))


def rotated_rect_intersection_area(bev_a, bev_b):
    """Exact rotated-rectangle intersection via convex clipping."""
    poly = [p for p in bev_corners_np(bev_a)]
    clip = bev_corners_np(bev_b)
    for i in range(4):
        p0, p1 = clip[i], clip[(i + 1) % 4]
        edge = p1 - p0
        # Interior of a convex CCW polygon is left of each edge; handle either
        # winding by orienting the normal toward the centroid.
        nx, nz = edge[1], -edge[0]
        centroid = clip.mean(axis=0)
        if nx * (centroid[0] - p0[0]) + nz * (centroid[1] - p0[1]) > 0:
            nx, nz = -nx, -nz
        poly = _clip_polygon([np.asarray(p, float) for p in poly], p0[0], p0[1], nx, nz)
        if not poly:
            return 0.0
    return polygon_area(poly)


def bev_iou_np(bev_a, bev_b):
    inter = rotated_rect_intersection_area(bev_a, bev_b)
    sa = (bev_a[2] - bev_a[0]) * (bev_a[3] - bev_a[1])
    sb = (bev_b[2] - bev_b[0]) * (bev_b[3] - bev_b[1])
    return inter / max(sa + sb - inter, 1e-8)


def fps_np(xyz, npoint):
    """Sequential farthest point sampling starting at index 0."""
    n = xyz.shape[0]
    dists = np.full(n, np.inf)
    idx = np.zeros(npoint, np.int32)
    last = 0
    for i in range(npoint):
        idx[i] = last
        d = np.sum((xyz - xyz[last]) ** 2, axis=1)
        dists = np.minimum(dists, d)
        last = int(np.argmax(dists))
    return idx


def ball_query_np(radius, nsample, xyz, new_xyz):
    """Linear scan, first-found order, pad with first hit."""
    p = new_xyz.shape[0]
    idx = np.zeros((p, nsample), np.int32)
    cnt = np.zeros(p, np.int32)
    r2 = radius * radius
    for j in range(p):
        found = [i for i in range(xyz.shape[0]) if np.sum((xyz[i] - new_xyz[j]) ** 2) < r2]
        c = min(len(found), nsample)
        cnt[j] = c
        if c > 0:
            row = found[:c] + [found[0]] * (nsample - c)
            idx[j] = row
    return idx, cnt


def points_in_box_np(points, box):
    """Brute-force membership via canonical transform."""
    x, y, z, l, w, h, ry = box
    d = points - np.array([x, y, z])
    c, s = np.cos(-ry), np.sin(-ry)
    # Inverse of the corner rotation: row-vec @ R(-ry).
    px = d[:, 0] * c + d[:, 2] * s
    pz = -d[:, 0] * s + d[:, 2] * c
    py = d[:, 1]
    return (
        (np.abs(px) <= l / 2.0)
        & (np.abs(pz) <= w / 2.0)
        & (py <= 0)
        & (py >= -h)
    )


def nms_np(bev_boxes, scores, thresh, max_keep):
    """Greedy oriented NMS oracle."""
    order = list(np.argsort(-scores, kind="stable"))
    keep = []
    while order and len(keep) < max_keep:
        i = order.pop(0)
        keep.append(i)
        order = [
            j for j in order if bev_iou_np(bev_boxes[i], bev_boxes[j]) <= thresh
        ]
    return keep
