"""Mesh construction + collective helpers.

``mpi_average``/``mpi_sum`` mirror the reference's MPI helpers
(``util/mpi.py:5-38``) as in-``shard_map`` collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_map(f, *, mesh, in_specs, out_specs, **kwargs):
    """Version-portable ``shard_map``: jax>=0.9 exposes ``jax.shard_map``
    with ``check_vma``; older releases have ``jax.experimental.shard_map``
    with ``check_rep``. Replication checking is disabled either way (our
    bodies use explicit collectives)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False, **kwargs,
        )
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False, **kwargs,
    )


def make_mesh(n_devices: int | None = None, axis: str = "env") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "env"):
    """Shard the leading (batch) axis of every leaf over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def mpi_average(x, axis_name: str = "env"):
    """Mean-reduce across the mesh axis (reference ``mpi_average``,
    ``util/mpi.py:5-20``). Must be called inside ``shard_map``/``pmap``."""
    return jax.lax.pmean(x, axis_name)


def mpi_sum(x, axis_name: str = "env"):
    """Sum-reduce across the mesh axis (reference ``mpi_sum``,
    ``util/mpi.py:28``)."""
    return jax.lax.psum(x, axis_name)
