"""Oracle tests for the Pallas RoI row-gather kernel (ops/pallas_crop.py).

Interpret mode here checks semantics only; Mosaic lowering + exactness on
the real chip is covered by tools/check_kernels.py (mandatory before any
dispatch-site change — CLAUDE.md on-chip gate). The kernel is a documented
negative result: ops/cropping.py dispatches to it only under
HFR_PALLAS_CROP=1, the default production path is the XLA flat-row gather.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from heterofusionrcnn_tpu.ops.pallas_crop import (
    _ROW_GROUP,
    crop_gather,
    crop_gather_fits,
)


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_crop_gather_matches_numpy(dtype):
    rng = np.random.RandomState(0)
    b, n, c, nb, r = 2, 256, 160, 8, 32
    src = rng.randn(b, n, c).astype(dtype)
    idx = rng.randint(0, n, (nb, r)).astype(np.int32)
    box_ind = np.repeat(np.arange(b), nb // b).astype(np.int32)
    out = np.asarray(
        crop_gather(jnp.asarray(src), jnp.asarray(idx), jnp.asarray(box_ind),
                    interpret=True)
    )
    ref = np.asarray(src)[box_ind[:, None], idx]
    np.testing.assert_array_equal(out, ref)


def test_crop_gather_duplicate_and_boundary_rows():
    # Wrap-fill produces duplicate indices; rows 0 and N-1 exercise block
    # edges.
    rng = np.random.RandomState(1)
    b, n, c, nb, r = 1, 64, 128, 2, 16
    src = rng.randn(b, n, c).astype(np.float32)
    idx = np.zeros((nb, r), np.int32)
    idx[0] = [0, 63, 0, 63] * 4
    idx[1] = 7
    box_ind = np.zeros(nb, np.int32)
    out = np.asarray(
        crop_gather(jnp.asarray(src), jnp.asarray(idx), jnp.asarray(box_ind),
                    interpret=True)
    )
    np.testing.assert_array_equal(out, src[box_ind[:, None], idx])


def test_crop_gather_fits_gate():
    # Inference scale fits under the VMEM plan; an absurd width does not.
    assert crop_gather_fits(16384, 544, 512, 2, nb=400)
    assert not crop_gather_fits(16384, 4096, 512, 4, nb=400)
    assert not crop_gather_fits(64, 64, _ROW_GROUP + 1, 2, nb=8)  # misalign
    # f32 at production scale busts the double-buffered VMEM plan: the gate
    # must refuse (the round-3 crash was a gate that passed un-lowerable /
    # un-fittable shapes through to Mosaic).
    assert not crop_gather_fits(16384, 544, 512, 4, nb=400)
    assert not crop_gather_fits(16380, 544, 512, 2, nb=400)  # n % 8 != 0
    # SMEM budget: the prefetched idx table must fit scalar memory.
    assert not crop_gather_fits(16384, 544, 512, 2, nb=4000)
    # dynamic_gather bitwidth legality: 2-byte dtype with odd C skips the
    # i32 lane-pair packing, 1-byte dtypes never pack — both must refuse.
    assert not crop_gather_fits(16384, 543, 512, 2, nb=400)
    assert not crop_gather_fits(16384, 544, 512, 1, nb=400)
    # nb is required: the SMEM check cannot be silently skipped.
    with pytest.raises(ValueError):
        crop_gather_fits(16384, 544, 512, 2, nb=0)


def test_default_dispatch_is_xla_gather(monkeypatch):
    # The Pallas kernel is a negative result (slower than the XLA gather on
    # chip) — pc_crop_and_sample must NOT route through it unless
    # HFR_PALLAS_CROP=1 is set explicitly.
    import heterofusionrcnn_tpu.ops.cropping as cropping

    monkeypatch.delenv("HFR_PALLAS_CROP", raising=False)
    calls = []
    monkeypatch.setattr(
        cropping, "crop_gather", lambda *a, **k: calls.append(1)
    )
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    fts = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    inten = jnp.asarray(rng.randn(2, 64, 1).astype(np.float32))
    mask = jnp.ones((2, 64), np.float32)
    from heterofusionrcnn_tpu.core.geometry import box_3d_to_corners

    center = pts[:, :4].reshape(8, 3)
    boxes_3d = jnp.concatenate(
        [center, jnp.full((8, 3), 18.0), jnp.zeros((8, 1))], axis=-1
    )
    corners = box_3d_to_corners(boxes_3d)
    box_ind = jnp.asarray(np.repeat(np.arange(2), 4), jnp.int32)
    out = cropping.pc_crop_and_sample(
        pts, fts, inten, mask, corners, box_ind, 16
    )
    assert not calls  # XLA path taken
    assert out[1].shape == (8, 16, 8)
