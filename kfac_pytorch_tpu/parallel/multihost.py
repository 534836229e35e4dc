"""Multi-host initialization and per-process data utilities.

The reference launches multi-node runs with mpirun/ssh + hostfiles
(/root/reference/launch_horovod.sh, launch_torch.sh, configs/cluster*).
On TPU pods every host runs the same program and jax.distributed wires the
mesh; these helpers cover that path:

  * ``init_multihost()`` — call once at program start on each host (no-op
    for single-host); afterwards jax.devices() spans the pod and the same
    Mesh/shard_map code runs unchanged over ICI+DCN.
  * ``local_batch_slice`` — which rows of a global batch this process
    feeds (each host feeds only its addressable shard).
  * ``is_primary`` — rank-0 guard for logging/checkpointing (the
    reference's rank-0-only verbosity, examples/utils.py:11-18).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running on multiple hosts.

    With no arguments, relies on the TPU environment's auto-detection
    (standard on Cloud TPU pods). Safe to skip entirely on a single host.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of the global batch rows this process should feed.

    Data is sharded over the leading axis of the whole pod; each process
    device_puts only its addressable slice (jax.make_array_from_process_
    local_data handles assembly).
    """
    n_proc = jax.process_count()
    per = global_batch // n_proc
    return jax.process_index() * per, per


def make_global_batch(mesh, batch, axis: str = "data"):
    """Assemble a pod-global batch-sharded array from per-process data.

    ``batch`` holds this process's local rows; returns global jax.Arrays
    sharded over the mesh axis. Works single-host too (degenerates to
    device_put with the batch sharding).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree_util.tree_map(put, batch)
