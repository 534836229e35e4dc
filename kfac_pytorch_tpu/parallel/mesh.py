"""Device-mesh utilities: the TPU-native replacement for the reference's
communication backend (/root/reference/kfac/backend.py — Horovod /
torch.distributed process groups and allreduce/broadcast).

On TPU there is no backend object: a ``jax.sharding.Mesh`` plus sharding
annotations *is* the communication layer — GSPMD inserts psum/all-gather
collectives over ICI/DCN. The reference's tiny collective surface
(allreduce-average, broadcast-from-owner, async handles; backend.py:51-164)
maps to:

  allreduce(avg)       -> batch sharded over the 'data' axis; XLA inserts the
                          gradient psum automatically (or lax.pmean in
                          shard_map)
  broadcast from owner -> layer-block sharded compute + all_gather
  async handle overlap -> XLA async collectives (latency hiding is the
                          scheduler's job, not manual streams)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices=None,
) -> Mesh:
    """Create a 1-D (default) or n-D mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devs = np.array(devices)
    if len(axis_names) > 1:
        # exact factorization: trailing axes take the largest divisor near
        # the n-th root, the first axis absorbs the remainder (always
        # multiplies back to len(devices) — no reshape failures on
        # non-perfect-power counts)
        n = len(devs)
        trailing = []
        rem = n
        for _ in range(len(axis_names) - 1):
            axes_left = len(axis_names) - len(trailing)
            d = max(1, int(round(rem ** (1.0 / axes_left))))
            d = min(d, rem)
            while rem % d:
                d -= 1
            trailing.append(d)
            rem //= d
        shape = [rem] + trailing
        assert int(np.prod(shape)) == n, (shape, n)
        devs = devs.reshape(shape)
    return Mesh(devs, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Place a host batch on the mesh with the leading dim sharded."""
    sh = batch_sharded(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
