"""Multi-host initialization and host-sharded data utilities.

The reference is strictly single-process (SURVEY.md §2.3); BASELINE.json's
north star requires N>=2-host serving. On TPU pods the runtime contract is:
every host runs the same program, ``jax.distributed.initialize`` wires the
processes, ``jax.devices()`` exposes the global device set, and SPMD programs
compiled with a global mesh execute collectives over ICI (intra-slice) /
DCN (inter-slice) automatically. No NCCL/MPI analog exists or is needed.

On a single host (this dev environment) everything degrades to no-ops; the
multi-host code path is exercised on the simulated multi-device CPU mesh
(tests/, __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Wire up multi-host JAX. No-op when single-process (or already wired).

    On Cloud TPU pods all arguments are auto-detected from the metadata
    server; on other fabrics pass them explicitly.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return  # single host, nothing to wire
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def host_local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host is responsible for feeding."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_array_from_host_data(mesh, spec, host_data: np.ndarray):
    """Assemble a globally-sharded jax.Array from this host's local shard.

    ``host_data`` is the slice of the global array owned by this host (per
    ``host_local_batch_slice`` along the sharded dim). Single-host: plain
    device_put.
    """
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(host_data, sharding)
    global_shape = (host_data.shape[0] * jax.process_count(),) + host_data.shape[1:]
    return jax.make_array_from_process_local_data(sharding, host_data, global_shape)


def is_primary() -> bool:
    return jax.process_index() == 0


def sync_hosts(name: str = "barrier") -> None:
    """Cross-host barrier (no-op single-host): every process blocks until all
    processes reach the same named point."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
