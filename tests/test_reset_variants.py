"""Preassembled resets + init-state pools (reference ``--preassembled`` /
``set_subtask`` and ``--load_init_states``, ``env/furniture.py:127-130,
1433-1434, 1492-1566``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furniture_tpu.config import EnvConfig
from furniture_tpu.envs.cursor import CursorEnv
from furniture_tpu.utils.init_pool import snapshot, stack_pool


def test_preassembled_reset_connects_prefix():
    env = CursorEnv(EnvConfig(preassembled=(0,)))
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    m = env.model
    assert int(s.num_connected) == 1
    # the recipe's first site pair is marked connected and its weld active
    s1 = int(np.asarray(m.recipe_site1)[0])
    s2 = int(np.asarray(m.recipe_site2)[0])
    assert bool(np.asarray(s.conn_connected)[s1])
    assert bool(np.asarray(s.conn_connected)[s2])
    assert np.asarray(s.weld_active).sum() == 1
    # the two parts share a rigid group
    p1 = int(np.asarray(m.conn_part)[s1])
    p2 = int(np.asarray(m.conn_part)[s2])
    group = np.asarray(s.group)
    assert group[p1] == group[p2]
    # the snapped sites coincide (leg site moved onto the table site)
    cpos, _ = env.ops.conn_world(s.parts)
    d = float(jnp.linalg.norm(cpos[s1] - cpos[s2]))
    assert d < 1e-3, f"preassembled conn sites {d} m apart"
    # nothing left the floor bound and the state is finite
    assert np.isfinite(np.asarray(s.parts.pos)).all()


def test_preassembled_success_count():
    env = CursorEnv(EnvConfig(num_connects=1, preassembled=(0, 1)))
    # success needs num_connects MORE connects beyond the preassembled ones
    # (env/furniture.py:1479)
    assert env.success_num_connects == 3
    s = jax.jit(env.reset)(jax.random.PRNGKey(1))
    assert int(s.num_connected) == 2
    # subtask points at a still-open weld
    sub = np.asarray(s.subtask)
    group = np.asarray(s.group)
    assert sub[0] >= 0 and group[sub[0]] != group[sub[1]]


def test_init_state_pool_sampling():
    env = CursorEnv(EnvConfig())
    base = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # two recognizable pool entries: all parts shifted to distinct x bands
    snaps = []
    for dx in (5.0, 9.0):
        st = base._replace(
            parts=base.parts._replace(pos=base.parts.pos + jnp.array([dx, 0, 0]))
        )
        snaps.append(snapshot(st))
    env.set_init_state_pool(stack_pool(snaps))

    reset = jax.jit(env.reset)
    xs = []
    for i in range(20):
        s = reset(jax.random.PRNGKey(100 + i))
        xs.append(float(np.asarray(s.parts.pos)[:, 0].mean()))
    from_pool = sum(1 for x in xs if x > 2.0)
    # reference uses the pool with probability 0.8 (env/furniture.py:1433):
    # expect most-but-not-all resets from the pool
    assert 10 <= from_pool <= 20, f"{from_pool}/20 resets from pool"
    if from_pool < 20:
        assert any(x < 2.0 for x in xs)  # fresh placements still occur
