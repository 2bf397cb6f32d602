"""On-chip A/B of the sorted-KNN fold formulations (pallas_knn._FOLD_MODE).

Measures the three RPN-critical shapes per fold mode:
  legacy  — k unrolled extract-min rounds per folding tile
  counted — rounds predicated on the per-tile improving-candidate count
  none    — distance passes only (INVALID results; isolates the fold cost)

and checks counted/legacy exactness against jax.lax.top_k semantics at every
shape (the CLAUDE.md on-chip gate for kernel changes; production-shape cases
also live in tools/check_kernels.py).

Usage: python tools/microbench_knn.py [--tiles]
  --tiles   also sweep (tile_n, tile_q) for the winning mode
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_kernels import kitti_like_cloud, pipelined_ms  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiles", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from heterofusionrcnn_tpu.ops import pallas_knn as pk

    rng = np.random.default_rng(0)
    pts16k = jnp.asarray(kitti_like_cloud(rng, 4, 16384))
    sub4k = pts16k[:, :4096]

    shapes = [
        ("16384q/16384 same", pts16k, pts16k, True),
        ("16384q/4096", sub4k, pts16k, False),   # decoder xdconv(1->0)
        ("4096q/16384", pts16k, sub4k, False),
    ]

    def run(mode, tile_n, tile_q, cand, qrs, same):
        pk._FOLD_MODE = mode
        pk._SORTED_TILE_N = tile_n
        pk._SORTED_TILE_Q = tile_q
        pk._SORTED_MIN_N = 2048
        fn = jax.jit(
            lambda a, q, s=same: pk._knn_pallas_sorted(8, a, q, same_set=s)
        )
        ms = pipelined_ms(fn, (cand, qrs), iters=8, warmup=2)
        return ms, fn

    print(f"{'case':20s} {'mode':8s} {'tile_n':>6s} {'tile_q':>6s} {'ms':>8s}")
    results = {}
    for name, cand, qrs, same in shapes:
        for mode in ("legacy", "counted", "none"):
            try:
                ms, _ = run(mode, 1024, 128, cand, qrs, same)
            except Exception as e:  # noqa: BLE001
                print(f"{name:20s} {mode:8s}   FAIL {e}")
                continue
            results[(name, mode)] = ms
            print(f"{name:20s} {mode:8s} {1024:6d} {128:6d} {ms:8.2f}",
                  flush=True)

    # Exactness on chip for both valid modes at every shape.
    for name, cand, qrs, same in shapes:
        dr, ir = jax.jit(
            lambda a, q: pk._knn_reference_jnp(8, a, q)
        )(cand, qrs)
        for mode in ("legacy", "counted"):
            pk._FOLD_MODE = mode
            pk._SORTED_TILE_N = 1024
            pk._SORTED_TILE_Q = 128
            d, i = jax.jit(
                lambda a, q, s=same: pk._knn_pallas_sorted(8, a, q, same_set=s)
            )(cand, qrs)
            ok = bool((np.asarray(i) == np.asarray(ir)).all())
            print(f"exact {name:20s} {mode:8s}: {'OK' if ok else 'FAIL'}",
                  flush=True)

    if args.tiles:
        # Sweep the WINNING mode (legacy, per the round-5 on-chip A/B —
        # counted lost at every shape). Finer candidate tiles buy skip
        # granularity on the same-set shape at the cost of more bbox tests.
        print("\ntile sweep (legacy):")
        for tile_n in (256, 512, 1024, 2048):
            for tile_q in (128, 256, 512):
                for name, cand, qrs, same in shapes:
                    if cand.shape[1] % tile_n or qrs.shape[1] % tile_q:
                        continue
                    try:
                        ms, _ = run("legacy", tile_n, tile_q, cand, qrs, same)
                    except Exception as e:  # noqa: BLE001
                        print(f"{name:20s} legacy   {tile_n:6d} {tile_q:6d}"
                              f"   FAIL {e}")
                        continue
                    print(f"{name:20s} legacy   {tile_n:6d} {tile_q:6d} "
                          f"{ms:8.2f}", flush=True)


if __name__ == "__main__":
    main()
