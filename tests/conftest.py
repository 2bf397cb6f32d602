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

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--integration",
        action="store_true",
        default=False,
        help="run the slow end-to-end integration tier (full model "
        "train/eval loops, ~15-20 min extra)",
    )


def pytest_collection_modifyitems(config, items):
    """The default run is the fast tier (<10 min): tests marked
    `integration` are skipped unless --integration (or an explicit -m
    selection) is given."""
    if config.getoption("--integration") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="integration tier: pass --integration")
    for item in items:
        if "integration" in item.keywords:
            item.add_marker(skip)
