"""All-furniture runtime smoke test.

The reference's one real integration test resets EVERY furniture model in a
live env and asserts no crash (``furniture/tests/test_furniture_init.py:16-58``).
Compiling all 64 models (``test_compiler.py``) is necessary but not
sufficient: padded lane capacities, conn-site tables, placement sampling and
settle behavior only execute at reset/step time. Here every furniture is
reset and stepped in a live CursorEnv (coarse sim config to bound CPU cost)
and a subset additionally runs through the arm env.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furniture_tpu.config import EnvConfig, SimConfig
from furniture_tpu.models import furniture_names

# coarse-but-real physics: fewer solver iterations and a larger timestep
# keep the 64-model sweep tractable on the CPU test host while still
# executing the full contact/settle/connect machinery per model
_COARSE = SimConfig(timestep=0.01, solver_iters=6)

_ARM_SUBSET = [
    "table_lack_0825",
    "swivel_chair_0700",
    "chair_agne_0007",
    "bench_bjursta_0210",
    "desk_mikael_1064",
    "shelf_ivar_0678",
]


def _assert_live_state(env, state, name):
    parts = state.parts
    assert np.isfinite(np.asarray(parts.pos)).all(), f"{name}: pos not finite"
    assert np.isfinite(np.asarray(parts.quat)).all(), f"{name}: quat not finite"
    assert np.isfinite(np.asarray(parts.lin_vel)).all(), f"{name}: vel not finite"
    # quats stay normalized through settle + steps
    qn = np.linalg.norm(np.asarray(parts.quat), axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3, err_msg=name)
    # parts rest on/above the floor after settle: geom bottoms may dip by
    # at most a few slop-lengths of penetration
    zmin = np.asarray(parts.pos)[:, 2].min()
    max_halfdim = float(np.asarray(env.model.geom_size).max())
    assert zmin > -max_halfdim - 0.02, (
        f"{name}: part center sank below the floor (z={zmin:.3f})"
    )


@pytest.mark.parametrize("name", furniture_names)
def test_cursor_reset_and_step_every_furniture(name):
    from furniture_tpu.envs.cursor import CursorEnv

    env = CursorEnv(EnvConfig(furniture_name=name, sim=_COARSE))
    state = jax.jit(env.reset)(jax.random.PRNGKey(3))
    _assert_live_state(env, state, name)

    step = jax.jit(env.step)
    action = jnp.zeros(env.dof).at[0].set(0.5).at[2].set(0.2)
    for _ in range(3):
        state, obs, rew, done, info = step(state, action)
    _assert_live_state(env, state, name)
    assert np.isfinite(float(rew))
    for k, v in obs.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), f"{name}: obs[{k}]"


@pytest.mark.parametrize("name", _ARM_SUBSET)
def test_arm_reset_and_step_subset(name):
    from furniture_tpu.envs.arm import ArmEnv

    env = ArmEnv(
        EnvConfig(
            agent_type="Sawyer",
            control_type="impedance",
            furniture_name=name,
            sim=_COARSE,
        )
    )
    state = jax.jit(env.reset)(jax.random.PRNGKey(4))
    _assert_live_state(env, state, name)
    assert np.isfinite(np.asarray(state.qpos)).all()

    step = jax.jit(env.step)
    action = jnp.zeros(env.dof).at[-2].set(-1.0)
    for _ in range(3):
        state, obs, rew, done, info = step(state, action)
    _assert_live_state(env, state, name)
    assert np.isfinite(np.asarray(state.qpos)).all(), f"{name}: qpos"
    assert np.isfinite(float(rew))
