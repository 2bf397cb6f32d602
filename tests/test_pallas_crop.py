"""Oracle tests for the Pallas RoI row-gather kernel (ops/pallas_crop.py).

Interpret mode on CPU; the TPU dispatch in ops/cropping.py is shape-gated by
crop_gather_fits and semantically identical to the flat-row XLA gather.
"""

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
    assert crop_gather_fits(16384, 544, 512, 2)
    assert not crop_gather_fits(16384, 4096, 512, 4)
    assert not crop_gather_fits(64, 64, _ROW_GROUP + 1, 2)  # group misalign
