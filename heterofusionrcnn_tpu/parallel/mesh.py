"""Device mesh + data-parallel sharding utilities.

TPU-native replacement for the reference's Horovod data parallelism
(SURVEY.md §2.3): a 1-axis `Mesh(('data',))` with replicated parameters and
batch-sharded inputs. Gradients are reduced by XLA's SPMD partitioner (psum
over ICI) — no explicit collectives in model code. Multi-host runs extend the
same mesh over all processes via `jax.distributed.initialize` (DCN between
hosts), with the input pipeline index-sharded per host
(KittiDataset.shard).

The reference's knobs map as:
  hvd.size()                  -> jax.device_count()
  hvd.DistributedOptimizer    -> (nothing: psum comes from sharding)
  BroadcastGlobalVariables(0) -> params initialized from one PRNG key and
                                 replicated by NamedSharding
  lr * hvd.size()             -> lr * num_devices (optimizer builder)
  iterations / hvd.size()     -> iterations / num_devices (train loop)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """A 1D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_state(state, mesh: Mesh):
    """Replicate a train state (params/opt state) across the mesh — the
    analog of Horovod's rank-0 broadcast."""
    return jax.device_put(state, replicated(mesh))
