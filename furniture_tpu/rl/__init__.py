"""RL training stack (BC / PPO / SAC / GAIL), TPU-native.

The reference delegates all training to an external ``method`` package
(``run.py:1-18``) with MPI data-parallelism (``util/mpi.py``,
``util/pytorch.py:139-227``, ``mpirun -np 32`` per ``README.md:104-121``).
Here the algorithms are in-repo, each training iteration is one jitted XLA
program over vmapped env lanes, and the MPI allreduce becomes a ``pmean``
inside ``shard_map`` over the device mesh.

Entry point: ``tools/train_rl.py`` (the ``run.py`` analogue).
"""

from .bc import BCConfig, BCState, demos_to_dataset, make_bc
from .eval import make_evaluate, ppo_act, sac_act
from .gail import DiscState, GAILConfig, make_gail
from .networks import flatten_obs, obs_dim
from .ppo import PPOConfig, PPOState, make_ppo
from .sac import SACConfig, SACState, make_sac

__all__ = [
    "BCConfig",
    "BCState",
    "DiscState",
    "GAILConfig",
    "PPOConfig",
    "PPOState",
    "SACConfig",
    "SACState",
    "demos_to_dataset",
    "flatten_obs",
    "make_bc",
    "make_evaluate",
    "make_gail",
    "make_ppo",
    "make_sac",
    "obs_dim",
    "ppo_act",
    "sac_act",
]
