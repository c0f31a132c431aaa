"""Multi-host initialization and sharded-run helpers.

The reference is strictly single-process (SURVEY.md §5.8); scaling here
follows the standard JAX multi-controller recipe:

  * every host runs the same program and calls `initialize()` first
  * the global mesh spans all hosts' devices; query batches are sharded
    along the data axis with jax.make_array_from_process_local_data
  * the cluster-GP store and dense grid are replicated (tens of MB)
  * host-side tree replay runs identically on every host (same inputs ->
    same native-index state), so no cross-host tree synchronisation is
    needed; per-frame scalar stats all-reduce over ICI/DCN implicitly
    through sharded reductions

Testable without a cluster via XLA_FLAGS=--xla_force_host_platform_device_count=N
(see tests/test_parallel.py); real pod-slice runs only need initialize().
"""
from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_query_array(mesh, local_queries):
    """Assemble a globally-sharded query batch from per-process shards."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.make_array_from_process_local_data(sharding, local_queries)


def global_data_mesh(axis: str = "d"):
    """One-axis mesh over ALL processes' devices (call after initialize)."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def replicate(mesh, tree):
    """Replicate a host pytree (e.g. the ClusterStore + grid) across every
    process's devices. All processes must pass identical values — true by
    construction here: the host tree replay is deterministic, so every
    controller materialises the same store (module docstring)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        tree)


def local_rows(global_array):
    """This process's rows of a data-sharded global array, in order."""
    import numpy as np

    shards = sorted(global_array.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])
