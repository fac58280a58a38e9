"""On-device planning/trajectory optimization.

The capability layer the reference lacks (its RL ``method`` package is
absent from the repo, ``run.py:1-18``): sampling-based MPC over the batched
environment. Rollouts are ``vmap(step)`` over the sample axis; on a mesh the
sample axis is sharded and elite statistics reduce over ICI.
"""

from .mppi import MPPIConfig, make_mppi, make_sharded_mppi, assembly_cost  # noqa: F401
from .cem import CEMConfig, make_cem  # noqa: F401
from .ilqr import ILQRConfig, make_ilqr, flatten_env_dynamics  # noqa: F401
