"""Model export / deployment (the freeze-graph equivalent).

The reference stitches the two stage graphs into one frozen GraphDef
(scripts/freeze_graph/combine_and_freeze_graph_fuse.py). The TPU-native
equivalent is `jax.export`: the fused RPN->RCNN inference function is traced
once with both checkpoints' weights closed over as constants, serialized to a
portable StableHLO artifact, and reloadable without any model code.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def export_fused_inference(
    fused_fn: Callable,
    rpn_vars,
    rcnn_vars,
    example_pc: np.ndarray,
    example_img: np.ndarray,
    example_p2: np.ndarray,
    out_path: str,
):
    """Serialize the fused two-stage inference to a StableHLO artifact.

    Args:
      fused_fn: (rpn_vars, rcnn_vars, pc, img, p2) -> outputs dict
        (from experiments.run_inference.build_fused_inference).
      rpn_vars / rcnn_vars: restored variables; baked in as constants
        (the "freeze" step).
      example_*: arrays defining the input signature.
      out_path: output file (.stablehlo).
    Returns:
      The serialized bytes length.
    """
    from jax import export as jax_export

    def frozen(pc, img, p2):
        return fused_fn(rpn_vars, rcnn_vars, pc, img, p2)

    exported = jax_export.export(jax.jit(frozen))(
        jax.ShapeDtypeStruct(example_pc.shape, example_pc.dtype),
        jax.ShapeDtypeStruct(example_img.shape, example_img.dtype),
        jax.ShapeDtypeStruct(example_p2.shape, example_p2.dtype),
    )
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str):
    """Load a serialized artifact; returns a callable (pc, img, p2) -> outputs."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return lambda *args: exported.call(*args)
