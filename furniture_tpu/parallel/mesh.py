"""Mesh construction + collective helpers.

``mpi_average``/``mpi_sum`` mirror the reference's MPI helpers
(``util/mpi.py:5-38``) as in-``shard_map`` collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
