"""On-chip phase split of pc_crop_and_sample at the fused-inference shape.

The round-4 profile charges "crop" 8.9 ms but the op has three phases:
  A. membership — pts[box_ind] + points_in_box_3d       (Nb, N) bools
  B. first-k    — _first_k_true: top_k(-key, R) over N  (Nb, R) indices
  C. gathers    — flat-row feature/coord/mask gathers

This tool times the full op and each phase prefix, plus alternative
first-k formulations (full sort; chunked local sort + offset combine), to
find where the milliseconds actually are before optimizing.

Usage: python tools/microbench_crop_split.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.microbench_crop import pipelined_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from heterofusionrcnn_tpu.core.geometry import points_in_box_3d
    from heterofusionrcnn_tpu.ops.cropping import pc_crop_and_sample
    from heterofusionrcnn_tpu.ops.grouping import _first_k_true

    b, n, c, nb, r = 4, 16384, 544, 400, 512
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-40, 40, (b, n, 3)).astype(np.float32))
    fts = jnp.asarray(
        rng.standard_normal((b, n, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    inten = jnp.asarray(rng.standard_normal((b, n, 1)).astype(np.float32))
    mask = jnp.asarray((rng.random((b, n)) < 0.3).astype(np.float32))
    # Box corners around random centers; ~axis-aligned 4x2x2 boxes.
    centers = rng.uniform(-30, 30, (nb, 3)).astype(np.float32)
    dx, dy, dz = 2.0, 1.0, 1.0
    signs = np.array(
        [
            [sx, sy, sz]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ],
        dtype=np.float32,
    )
    # box_8co corner order: the geometry helper only needs a parallelepiped
    # frame (corners 0,1,3,4 span the edges) — use the package's canonical
    # ordering via the first 8 sign combos arranged as the codec does.
    corners = centers[:, None, :] + signs[None] * np.array([dx, dy, dz])
    corners = jnp.asarray(corners)
    bind = jnp.asarray(np.repeat(np.arange(b), nb // b), jnp.int32)

    full = jax.jit(lambda *a: pc_crop_and_sample(*a, resize=r)[1])
    t_full = pipelined_ms(full, (pts, fts, inten, mask, corners, bind))
    print(f"full pc_crop_and_sample: {t_full:.2f} ms", flush=True)

    @jax.jit
    def phase_a(pts_, corners_, bind_):
        ppb = pts_[bind_]
        return jax.vmap(points_in_box_3d)(ppb, corners_).astype(jnp.float32)

    t_a = pipelined_ms(phase_a, (pts, corners, bind))
    print(f"A membership: {t_a:.2f} ms", flush=True)

    inside = jnp.asarray(rng.random((nb, n)) < 0.03)  # ~490 members/box

    @jax.jit
    def phase_b_topk(inside_):
        idx, cnt = _first_k_true(inside_, r)
        return idx.astype(jnp.float32) + cnt[:, None].astype(jnp.float32)

    t_b = pipelined_ms(phase_b_topk, (inside,))
    print(f"B first-k (top_k): {t_b:.2f} ms", flush=True)

    @jax.jit
    def phase_b_sort(inside_):
        key = jnp.where(
            inside_, jnp.arange(n, dtype=jnp.int32), jnp.int32(n)
        )
        return jnp.sort(key, axis=-1)[:, :r].astype(jnp.float32)

    t_bs = pipelined_ms(phase_b_sort, (inside,))
    print(f"B first-k (full sort): {t_bs:.2f} ms", flush=True)

    @jax.jit
    def phase_b_chunked(inside_):
        # Chunk N into columns of r: local sort (r-wide) + exclusive chunk
        # offsets + per-slot chunk lookup via small one-hot contraction.
        ch = n // r  # 32 chunks
        key = jnp.where(
            inside_, jnp.arange(n, dtype=jnp.int32), jnp.int32(n)
        ).reshape(nb, ch, r)
        local = jnp.sort(key, axis=-1)  # (Nb, ch, r)
        cnts = jnp.sum(inside_.reshape(nb, ch, r), axis=-1)  # (Nb, ch)
        offs = jnp.cumsum(cnts, axis=-1) - cnts  # exclusive (Nb, ch)
        slot = jnp.arange(r, dtype=jnp.int32)[None, :]  # (1, r)
        # chunk of output slot j: last chunk with offs <= j.
        le = (offs[:, None, :] <= slot[:, :, None]).astype(jnp.int32)
        cj = jnp.sum(le, axis=-1) - 1  # (Nb, r)
        jloc = slot - jnp.take_along_axis(offs, cj, axis=-1)
        flat = local.reshape(nb, ch * r)
        out = jnp.take_along_axis(flat, cj * r + jloc, axis=-1)
        return out.astype(jnp.float32)

    t_bc = pipelined_ms(phase_b_chunked, (inside,))
    print(f"B first-k (chunked sort): {t_bc:.2f} ms", flush=True)

    # Correctness cross-check of the alternatives vs the top_k formulation.
    idx_ref, cnt_ref = jax.jit(lambda m: _first_k_true(m, r))(inside)
    key = jnp.where(inside, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    srt = jnp.sort(key, axis=-1)[:, :r]
    chk = phase_b_chunked(inside).astype(jnp.int32)
    ok_sort = bool(jnp.all(jnp.where(srt >= n, n, srt) == jnp.where(
        jnp.arange(r)[None] < cnt_ref[:, None], idx_ref, n)))
    ok_chunk = bool(jnp.all(chk == srt))
    print(f"sort==topk(valid slots): {ok_sort}; chunked==sort: {ok_chunk}",
          flush=True)

    @jax.jit
    def phase_c(fts_, idx_, bind_):
        rows = (bind_[:, None] * n + idx_).reshape(-1)
        return fts_.reshape(b * n, c)[rows].reshape(nb, r, c)

    idxs = jnp.asarray(
        np.sort(rng.integers(0, n, (nb, r)), axis=1), jnp.int32
    )
    t_c = pipelined_ms(phase_c, (fts, idxs, bind))
    print(f"C feature gather (bf16): {t_c:.2f} ms", flush=True)
    print(
        f"\nsplit: A {t_a:.2f} + B {t_b:.2f} + C {t_c:.2f} "
        f"= {t_a + t_b + t_c:.2f} vs full {t_full:.2f} ms"
    )


if __name__ == "__main__":
    main()
