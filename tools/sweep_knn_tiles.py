"""Sweep sorted-KNN tile sizes on the real chip.

Monkey-patches pallas_knn._SORTED_TILE_N/_SORTED_TILE_Q and times the three
RPN-critical shapes on KITTI-like clouds. Run after any kernel fold change —
the optimum moves with the per-tile fixed costs.

Usage: python tools/sweep_knn_tiles.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_kernels import kitti_like_cloud, pipelined_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from heterofusionrcnn_tpu.ops import pallas_knn as pk

    rng = np.random.default_rng(0)
    pts16k = jnp.asarray(kitti_like_cloud(rng, 4, 16384))
    sub4k = pts16k[:, :4096]

    shapes = [
        ("16384q/16384", pts16k, pts16k),
        ("4096q/16384", pts16k, sub4k),
        ("16384q/4096", sub4k, pts16k),
    ]

    print(f"{'case':14s} {'tile_n':>7s} {'tile_q':>7s} {'ms':>8s}")
    for tile_n in (512, 1024, 2048):
        for tile_q in (128, 256):
            pk._SORTED_TILE_N = tile_n
            pk._SORTED_TILE_Q = tile_q
            pk._SORTED_MIN_N = 2048
            for name, cand, qrs in shapes:
                if cand.shape[1] % tile_n or qrs.shape[1] % tile_q:
                    continue
                same = cand is qrs
                fn = jax.jit(
                    lambda a, q, k=8, s=same: pk._knn_pallas_sorted(k, a, q, s)
                )
                try:
                    ms = pipelined_ms(fn, (cand, qrs), iters=8, warmup=2)
                except Exception as e:  # noqa: BLE001
                    print(f"{name:14s} {tile_n:7d} {tile_q:7d}    FAIL {e}")
                    continue
                print(f"{name:14s} {tile_n:7d} {tile_q:7d} {ms:8.2f}",
                      flush=True)


if __name__ == "__main__":
    main()
