"""On-TPU exactness + timing harness for the Pallas kernels.

CPU tests can't exercise the compiled kernels (they dispatch to jnp
references off-TPU), so this script is the TPU-side regression: it checks
the Pallas KNN (both the brute and the Morton-sorted tile-skipping variant)
bit-exactly against jax.lax.top_k semantics, and the batched FPS kernel
against the XLA fori_loop formulation, on KITTI-like clustered clouds.

Usage: python tools/check_kernels.py [--time]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kitti_like_cloud(rng, b, n):
    """Clustered frustum-ish cloud: ground plane + a few object clusters."""
    ground = np.stack(
        [
            rng.uniform(-40, 40, (b, n // 2)),
            rng.uniform(-1.8, -1.5, (b, n // 2)),
            rng.uniform(0, 70, (b, n // 2)),
        ],
        axis=-1,
    )
    clusters = []
    remaining = n - n // 2
    per = remaining // 8
    for _ in range(7):
        c = np.stack(
            [
                rng.uniform(-35, 35, (b, 1, 1)),
                rng.uniform(-1.5, 0.5, (b, 1, 1)),
                rng.uniform(3, 65, (b, 1, 1)),
            ],
            axis=-1,
        )
        pts = c + rng.normal(0, 0.8, (b, 1, per, 3))
        clusters.append(pts.reshape(b, per, 3))
    rest = n - n // 2 - 7 * per
    clusters.append(
        np.stack(
            [
                rng.uniform(-40, 40, (b, rest)),
                rng.uniform(-2, 2, (b, rest)),
                rng.uniform(0, 70, (b, rest)),
            ],
            axis=-1,
        )
    )
    out = np.concatenate([ground] + clusters, axis=1).astype(np.float32)
    perm = rng.permutation(n)
    return out[:, perm]


def pipelined_ms(fn, args, iters=10, warmup=2):
    def sync(o):
        leaf = o[0] if isinstance(o, tuple) else o
        return float(leaf.ravel()[0])

    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    # Sync ONLY the last output: the axon device stream is in-order, and
    # each blocking device->host scalar read costs a full ~33 ms tunnel RTT
    # — syncing every output adds +33 ms/call of pure measurement bias.
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true")
    ap.add_argument(
        "--quarantined", action="store_true",
        help="also check the quarantined negative-result kernels "
             "(crop_gather — off by default in production, HFR_PALLAS_CROP=1)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from heterofusionrcnn_tpu.ops.pallas_fps import farthest_point_sample_pallas
    from heterofusionrcnn_tpu.ops.pallas_knn import (
        _knn_reference_jnp,
        knn_pallas,
    )

    rng = np.random.default_rng(0)
    failures = 0

    # ---------------- KNN exactness ---------------- #
    cases = [
        ("16384x16384 k8 (sorted)", 2, 16384, 16384, 8, True),
        ("4096q of 16384 k8 (sorted)", 2, 16384, 4096, 8, False),
        ("16384q of 4096 k8 (sorted)", 2, 4096, 16384, 8, False),
        ("512x512 k4 roi (brute)", 64, 512, 512, 4, True),
        ("512q of 128 k12 (brute)", 16, 128, 512, 12, False),
    ]
    for name, b, n, p, k, same in cases:
        pts = jnp.asarray(kitti_like_cloud(rng, b, n))
        if same:
            qrs = pts
        else:
            qrs = jnp.asarray(kitti_like_cloud(rng, b, p))
        d, i = jax.jit(lambda a, q: knn_pallas(k, a, q))(pts, qrs)
        dr, ir = jax.jit(lambda a, q: _knn_reference_jnp(k, a, q))(pts, qrs)
        d, i, dr, ir = map(np.asarray, (d, i, dr, ir))
        idx_ok = (i == ir).all()
        # distances: identical selection -> identical values (both compute
        # (a-b)^2 directly... reference uses the same formula).
        d_ok = np.allclose(d, dr, rtol=1e-5, atol=1e-5)
        status = "OK" if (idx_ok and d_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
            nbad = int((i != ir).sum())
            print(f"KNN {name}: {status} (idx mismatches: {nbad}/{i.size}, "
                  f"max d err {np.abs(d - dr).max():.2e})")
        else:
            print(f"KNN {name}: OK")

    # Degenerate: duplicate points (tie-break by index).
    pts = jnp.asarray(
        np.tile(kitti_like_cloud(rng, 1, 2048), (1, 8, 1)).astype(np.float32)
    )
    d, i = jax.jit(lambda a: knn_pallas(8, a, a))(pts)
    dr, ir = jax.jit(lambda a: _knn_reference_jnp(8, a, a))(pts)
    if (np.asarray(i) == np.asarray(ir)).all():
        print("KNN duplicates tie-break: OK")
    else:
        failures += 1
        nbad = int((np.asarray(i) != np.asarray(ir)).sum())
        print(f"KNN duplicates tie-break: FAIL ({nbad}/{i.size})")

    # ---------------- group_point one-hot exactness ---------------- #
    # TPU dispatches small-N gathers to one-hot contractions; both dtypes
    # must reproduce take_along_axis bitwise (f32 via Precision.HIGHEST).
    from heterofusionrcnn_tpu.ops.grouping import group_point

    for name, dtype in (("f32", np.float32), ("bf16", jnp.bfloat16)):
        pts2 = jnp.asarray(
            rng.standard_normal((400, 512, 7)).astype(np.float32)
        ).astype(dtype)
        gidx = jnp.asarray(rng.integers(0, 512, (400, 512, 4)), jnp.int32)
        got = jax.jit(group_point)(pts2, gidx)
        want = jnp.take_along_axis(
            pts2, gidx.reshape(400, -1)[..., None], axis=1
        ).reshape(400, 512, 4, 7)
        if bool(jnp.all(got == want)):
            print(f"group_point one-hot {name}: OK")
        else:
            failures += 1
            nbad = int(jnp.sum(got != want))
            print(f"group_point one-hot {name}: FAIL ({nbad}/{got.size})")

    # ---------------- crop_gather exactness (QUARANTINED) ---------------- #
    # Documented negative result: slower than the XLA flat-row gather on
    # chip, dispatches only under HFR_PALLAS_CROP=1 (ops/cropping.py). The
    # default matrix covers exactly the kernels that can dispatch in
    # production; run with --quarantined (or HFR_PALLAS_CROP=1) before
    # enabling the knob. Shapes: the exact dispatch ops/cropping.py makes —
    # B=4, N=16384, C=544 stage-1 features, 400 boxes x 512 rows.
    from heterofusionrcnn_tpu.ops.pallas_crop import crop_gather, crop_gather_fits

    crop_cases = []
    if args.quarantined or os.environ.get("HFR_PALLAS_CROP") == "1":
        crop_cases = [
            ("4x16384x544 bf16 400x512 (prod)", 4, 16384, 544, 400, 512, jnp.bfloat16),
            ("2x4096x256 f32 64x128", 2, 4096, 256, 64, 128, np.float32),
        ]
    for name, b, n, c, nb, r, dtype in crop_cases:
        assert crop_gather_fits(n, c, r, jnp.dtype(dtype).itemsize, nb), name
        src = jnp.asarray(
            rng.standard_normal((b, n, c)).astype(np.float32)
        ).astype(dtype)
        gidx = jnp.asarray(rng.integers(0, n, (nb, r)), jnp.int32)
        bind = jnp.asarray(np.repeat(np.arange(b), nb // b), jnp.int32)
        got = jax.jit(crop_gather)(src, gidx, bind)
        want = src[bind[:, None], gidx]
        if bool(jnp.all(got == want)):
            print(f"crop_gather {name}: OK")
        else:
            failures += 1
            nbad = int(jnp.sum(got != want))
            print(f"crop_gather {name}: FAIL ({nbad}/{got.size})")

    # ---------------- FPS exactness ---------------- #
    def fps_xla(xyz, npoint):
        def one_batch(pts):
            def body(s, state):
                dists, last_idx, out = state
                last = pts[last_idx]
                dd = jnp.sum(jnp.square(pts - last[None, :]), axis=-1)
                dists = jnp.minimum(dists, dd)
                nxt = jnp.argmax(dists).astype(jnp.int32)
                out = out.at[s].set(last_idx)
                return dists, nxt, out

            init = (
                jnp.full((xyz.shape[1],), jnp.inf, jnp.float32),
                jnp.int32(0),
                jnp.zeros((npoint,), jnp.int32),
            )
            return jax.lax.fori_loop(0, npoint, body, init)[2]

        return jax.vmap(one_batch)(xyz)

    for name, b, n, npoint in [
        ("4x16384->4096", 4, 16384, 4096),
        ("400x512->128", 400, 512, 128),
    ]:
        pts = jnp.asarray(kitti_like_cloud(rng, b, n))
        got = jax.jit(
            lambda a: farthest_point_sample_pallas(a, npoint)
        )(pts)
        want = jax.jit(lambda a: fps_xla(a, npoint))(pts)
        # Rare (<0.1%) divergences are f32 near-ties: two candidates whose
        # max-min distances differ below f32 epsilon order differently under
        # the kernel's vs XLA's rounding, and the sequential chain then
        # diverges. Verified case-by-case (rel diff ~1e-8) — both answers
        # are valid FPS selections at f32.
        nbad = int((np.asarray(got) != np.asarray(want)).sum())
        if nbad <= got.size * 1e-3:
            tag = "OK" if nbad == 0 else f"OK ({nbad}/{got.size} f32 ties)"
            print(f"FPS {name}: {tag}")
        else:
            failures += 1
            print(f"FPS {name}: FAIL ({nbad}/{got.size})")

    # ---------------- timings ---------------- #
    if args.time:
        print("\n--- timings (ms) ---")
        pts = jnp.asarray(kitti_like_cloud(rng, 4, 16384))
        sub = pts[:, :4096]
        roi = jnp.asarray(kitti_like_cloud(rng, 400, 512))
        timing_cases = [
            ("knn 4x16384^2 k8", jax.jit(lambda a: knn_pallas(8, a, a)), (pts,)),
            ("knn 4x4096q/16384 k8",
             jax.jit(lambda a, q: knn_pallas(8, a, q)), (pts, sub)),
            ("knn 4x16384q/4096 k8",
             jax.jit(lambda a, q: knn_pallas(8, a, q)), (sub, pts)),
            ("knn 400x512^2 k4 (roi)",
             jax.jit(lambda a: knn_pallas(4, a, a)), (roi,)),
            ("fps 4x16384->4096",
             jax.jit(lambda a: farthest_point_sample_pallas(a, 4096)), (pts,)),
            ("fps 400x512->128",
             jax.jit(lambda a: farthest_point_sample_pallas(a, 128)), (roi,)),
        ]
        if crop_cases:
            timing_cases.append(
                ("crop 4x16384x544->400x512",
                 jax.jit(crop_gather),
                 (jnp.asarray(
                      rng.standard_normal((4, 16384, 544)).astype(np.float32)
                  ).astype(jnp.bfloat16),
                  jnp.asarray(rng.integers(0, 16384, (400, 512)), jnp.int32),
                  jnp.asarray(np.repeat(np.arange(4), 100), jnp.int32))))
        for name, fn, fa in timing_cases:
            print(f"{name:28s} {pipelined_ms(fn, fa):9.2f}")

    if failures:
        print(f"\n{failures} FAILURES")
        sys.exit(1)
    print("\nall kernel checks passed")


if __name__ == "__main__":
    main()
