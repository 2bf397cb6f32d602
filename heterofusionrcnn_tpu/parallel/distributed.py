"""Multi-host initialization (the reference's MPI launch equivalent,
mpi_run_training.sh:16-19 -> jax.distributed).

All hosts run the same command; coordination comes from the environment
(JAX's standard cluster detection, or explicit coordinator args). After
initialize(), `jax.devices()` spans every host's chips and the data mesh in
parallel.mesh covers them; the input pipeline must be sharded with
`KittiDataset.shard(process_index, process_count)`.
"""

from __future__ import annotations

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize multi-host JAX; no-op on a single process.

    Returns a dict with process_index / process_count / device counts for
    logging and input sharding.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def shard_dataset_for_host(dataset) -> None:
    """Deterministic per-host input sharding (replaces the reference's
    independent per-rank random shuffles)."""
    dataset.shard(jax.process_index(), jax.process_count())
