"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (the capability the reference lacked entirely — SURVEY.md §4).

Must run before jax is imported anywhere in the test process.
"""

import os

# Force CPU even when the ambient env selects a TPU platform (e.g. axon):
# unit tests must be hermetic, fast, and run with f32 matmuls.
os.environ["JAX_PLATFORMS"] = os.environ.get("HFR_TEST_PLATFORM", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin force-appends itself to jax_platforms at import time,
# overriding the env var — override it back.
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
