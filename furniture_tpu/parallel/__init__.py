"""Device-mesh parallelism utilities.

The reference scales with OS processes + MPI allreduce
(``util/subproc_vec_env.py:51``, ``util/mpi.py:5-38``, ``mpirun -np 32``).
Here the same roles are played by a ``jax.sharding.Mesh``: environment
data-parallelism is a sharded batch axis, planner parallelism is a sharded
sample axis, and gradient/statistic reductions are XLA collectives
(``psum``/``pmean``) riding ICI.
"""

from .mesh import make_mesh, shard_batch, mpi_average, mpi_sum  # noqa: F401
