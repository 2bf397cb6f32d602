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
# Env vars are NOT enough here: the axon environment's sitecustomize.py
# imports jax at interpreter startup (before any user code), so jax's config
# has already read the (unset) env by the time this package is imported —
# jax.config.update works regardless of import order. The axon IFRT plugin
# routes compiles through its own fingerprint-keyed sidechannel that reads
# the same jax cache dir (axon/register/ifrt.py _install_compile_cache_hooks),
# so this enables warm compiles on the tunneled TPU too.
if not _os.environ.get("HFR_NO_COMPILE_CACHE"):
    import jax as _jax

    if _jax.config.jax_compilation_cache_dir is None:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.expanduser("~"), ".cache", "hfr_jax_cache"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
