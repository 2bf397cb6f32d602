"""HeteroFusionRCNN-TPU: a TPU-native (JAX/XLA/Pallas/pjit) LiDAR+camera 3D
object detection framework with the capabilities of zhaotudou/HeteroFusionRCNN.

Two-stage PointRCNN-style detector for KITTI:
  - Stage 1 (RPN): per-point foreground segmentation + bin-based 3D proposal
    regression over the full point cloud, with per-point image features fused.
  - Stage 2 (RCNN): point RoI pooling in proposal boxes + image RoI crop,
    canonical transform, second point encoder, classification + refinement.

Everything is pure-functional JAX: models are flax modules, the train step is a
single jitted function data-parallel over a `jax.sharding.Mesh`, and the five
CUDA op libraries of the reference (sampling/grouping/interpolate/cropping/
bev_iou) are static-shape XLA/Pallas kernels in `heterofusionrcnn_tpu.ops`.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: repeated CLI invocations (train -> eval ->
# train) reuse compiled executables instead of paying 10-60s compiles each.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "hfr_jax_cache"),
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
