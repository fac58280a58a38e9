"""furniture_tpu — a TPU-native IKEA furniture assembly benchmark engine.

A from-scratch rebuild of the clvrai/furniture benchmark
(IKEA Furniture Assembly Environment) as a fully batched JAX/XLA physics +
planning engine: the entire environment state is a pytree of arrays, the
furniture model is a compiled static description, and
``step: (state, action) -> state`` is a pure jitted function, ``vmap``-batched
over thousands of environments per chip and ``shard_map``-sharded over a
device mesh.

Public API (mirrors the reference's ``make_env``/gym surface,
``furniture/env/base.py:28``):

    import furniture_tpu as ft
    env = ft.make_env("FurnitureCursorEnv", furniture_name="table_lack_0825")
    ob = env.reset()
    ob, rew, done, info = env.step(env.action_space.sample())
"""

__version__ = "0.1.0"

from .config import EnvConfig, default_config  # noqa: F401
from .models import (  # noqa: F401
    agent_names,
    background_names,
    furniture_name2id,
    furniture_names,
)


def make_env(name: str, **kwargs):
    """Create a host-facing environment by registry name.

    Mirrors ``make_env`` in the reference (``env/base.py:28``).
    """
    from .api import make_env as _make_env

    return _make_env(name, **kwargs)


def make_vec_env(name: str, num_envs: int, **kwargs):
    """Batched env-of-arrays; replaces SubprocVecEnv
    (``util/subproc_vec_env.py:51``) with vmap."""
    from .api import make_vec_env as _make_vec_env

    return _make_vec_env(name, num_envs, **kwargs)
