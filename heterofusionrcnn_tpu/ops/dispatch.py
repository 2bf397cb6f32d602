"""Central gate for TPU Pallas kernel dispatch.

Every op that can route to a hand-written Pallas kernel (FPS, KNN, NMS,
fused XConv, crop gather) asks `pallas_ok()` instead of testing the backend
directly. This gives the framework ONE kill-switch — `HFR_FORCE_XLA_OPS=1`
— that pins every op to its XLA formulation. The switch exists so a broken
or regressed kernel can never zero out the benchmark again (round-3
post-mortem: a crop kernel that failed Mosaic lowering took down the whole
fused graph; bench.py now retries itself under this flag and still reports
the XLA-path number).

Both paths of every dispatch are semantically identical by contract
(CLAUDE.md) and oracle-tested; this module only decides which one runs.
"""

from __future__ import annotations

import os

import jax


def pallas_ok() -> bool:
    """True when TPU Pallas kernels may be dispatched.

    False off-TPU, and false everywhere under HFR_FORCE_XLA_OPS=1 (the
    bench/serving safe mode — all ops fall back to their XLA twins).
    """
    return (
        jax.default_backend() == "tpu"
        and os.environ.get("HFR_FORCE_XLA_OPS") != "1"
    )
