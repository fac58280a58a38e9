"""Dense-reward env and scripted demo generator tests.

The generator progression test is the analogue of the reference's demo
generation smoke run (``furniture_sawyer_gen.py:347-731``): the scripted
policy must reach the grasp phases and actually pick the leg up.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furniture_tpu.config import EnvConfig, SimConfig
from furniture_tpu.envs.sawyer_dense import (
    FurnitureSawyerDenseRewardEnv,
    MOVE_EEF_ABOVE_LEG,
    N_PHASES,
)
from furniture_tpu.envs.sawyer_gen import (
    ALIGN_CONN,
    FurnitureSawyerGenEnv,
    GenPolicyState,
    MOVE_WAYPOINTS,
    _move_xy,
    _move_z,
    _shortest_arc,
    _up_correction,
)
from furniture_tpu import transforms as T


@pytest.fixture(scope="module")
def dense_env():
    return FurnitureSawyerDenseRewardEnv(
        EnvConfig(agent_type="Sawyer", control_type="ik")
    )


def test_dense_reset_subtask_tables(dense_env):
    env = dense_env
    assert env.n_subtasks == 4  # table_lack recipe has 4 attachments
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # subtask 0 has no grip_init -> starts at move_eef_above_leg
    # (furniture_sawyer_dense.py:205-220)
    assert int(s.phase_i) == MOVE_EEF_ABOVE_LEG
    assert int(s.subtask_step) == 0
    assert np.isfinite(np.asarray(s.init_table_site_pos)).all()


def test_dense_step_reward_finite(dense_env):
    env = dense_env
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    total = 0.0
    for i in range(3):
        s, obs, rew, done, info = step(s, jnp.zeros(env.dof))
        total += float(rew)
        assert np.isfinite(float(rew))
        assert 0 <= int(info["phase_i"]) < N_PHASES * env.n_subtasks
    assert not bool(done)


def test_dense_phase_ob():
    env = FurnitureSawyerDenseRewardEnv(
        EnvConfig(
            agent_type="Sawyer",
            control_type="ik",
        ).replace(dense=EnvConfig().dense.__class__(phase_ob=True))
    )
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    obs = env.observe(s)
    assert obs["phase_ob"].shape == (N_PHASES,)
    assert float(obs["phase_ob"].sum()) == 1.0


def test_gen_primitives():
    d, reached = _move_xy(jnp.zeros(2), jnp.array([0.5, 0.0]), 0.01)
    assert bool(d[0] == 1.0) and not bool(reached)  # saturated to sign
    d, reached = _move_xy(jnp.zeros(2), jnp.array([0.005, 0.0]), 0.01)
    assert bool(reached)
    # shortest arc x->y is +90° about z
    w = _shortest_arc(jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(
        np.asarray(w), [0.0, 0.0, np.pi / 2], atol=1e-5
    )
    # antiparallel case returns a finite pi-rotation, not NaN
    w = _shortest_arc(jnp.array([0.0, 0.0, 1.0]), jnp.array([0.0, 0.0, -1.0]))
    assert np.isfinite(np.asarray(w)).all()
    np.testing.assert_allclose(float(jnp.linalg.norm(w)), np.pi, atol=1e-5)
    # move_z fine scaling clips at 0.02
    d = _move_z(jnp.zeros(3), jnp.array([0.0, 0.0, 0.3]), 0.005, 0.0, fine=3.0)
    assert abs(float(d[2]) - 0.02) < 1e-6


def test_up_correction_converges():
    """Iterating rel' = exp(w/2) ⊗ rel drives the up rows together from any
    start — the exactness property the align phases rely on."""
    key = jax.random.PRNGKey(5)
    for i in range(4):
        key, k = jax.random.split(key)
        rel = T.quat_normalize(jax.random.normal(k, (4,)))
        for _ in range(12):
            w = _up_correction(rel, 0.0)
            w = jnp.clip(w, -0.3, 0.3)  # emulate per-step rotation limits
            r = T.quat_from_axis_angle(
                w / jnp.maximum(jnp.linalg.norm(w), 1e-9),
                jnp.linalg.norm(w),
            )
            rel = T.quat_mul(r, rel)
        v = T.quat_rotate(rel, jnp.array([0.0, 0.0, 1.0]))
        assert float(v[2]) > 0.999, f"start {i}: v={v}"


def test_gen_policy_connects_staged():
    """The scripted policy CONNECTS (the previously-unasserted flagship
    capability): from a staged mid-carry state — leg grasped under the
    hand — the align/approach/fine phases must drive ``num_connected`` to 1.

    Staging (rather than rolling the full grasp sequence from reset) keeps
    the CPU cost bounded at ~250 steps; the grasp acquisition itself is
    covered by ``test_gen_policy_progression``, and the full-episode
    statistics live in the committed TPU artifact
    (``runs/gen_stats_table_lack.json``).
    """
    from furniture_tpu.robots import kinematics as K

    env = FurnitureSawyerGenEnv(EnvConfig(agent_type="Sawyer", control_type="ik"))
    st = env._st
    s = jax.jit(env.reset)(jax.random.PRNGKey(3))

    # move leg 0 so its grasp midpoint sits at the grip site
    fk_out = K.fk(env.robot, s.qpos)
    grip_pos, _ = K.site_world(env.robot, fk_out, "right")
    leg = int(np.asarray(st["leg"])[0])
    gl = env._site_pos(s.parts, jnp.asarray(st["gl"])[0])
    gr = env._site_pos(s.parts, jnp.asarray(st["gr"])[0])
    shift = grip_pos - 0.5 * (gl + gr)
    s = s._replace(
        parts=s.parts._replace(pos=s.parts.pos.at[leg].add(shift))
    )

    step = jax.jit(env.step)
    pol = jax.jit(env.scripted_action)

    # close the gripper on the staged leg
    a_close = jnp.zeros(env.dof).at[6].set(1.0)
    for _ in range(8):
        s, *_ = step(s, a_close)
    assert bool(np.asarray(s.touch_l)[0, leg]) and bool(
        np.asarray(s.touch_r)[0, leg]
    ), "staged grasp did not close on the leg"

    gen = jax.jit(env.init_policy_state)(s, jax.random.PRNGKey(1))
    gen = gen._replace(
        part=jnp.array(0, jnp.int32), phase=jnp.array(ALIGN_CONN, jnp.int32)
    )
    for i in range(250):
        a, gen = pol(gen, s)
        s, obs, rew, done, info = step(s, a)
        if int(s.num_connected) >= 1:
            break
    assert int(s.num_connected) >= 1, (
        f"no connect in 250 staged steps (end phase {int(gen.phase)})"
    )


def test_gen_policy_progression():
    """Scripted policy must grasp the leg and reach the alignment phases
    with the leg lifted."""
    env = FurnitureSawyerGenEnv(EnvConfig(agent_type="Sawyer", control_type="ik"))
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    gen = jax.jit(env.init_policy_state)(s, jax.random.PRNGKey(1))
    pol = jax.jit(env.scripted_action)
    step = jax.jit(env.step)
    max_phase = 0
    lifted = False
    for i in range(120):
        a, gen = pol(gen, s)
        s, obs, rew, done, info = step(s, a)
        max_phase = max(max_phase, int(gen.phase))
        leg = int(np.asarray(env._st["leg"])[int(gen.part)])
        if float(s.parts.pos[leg][2]) > 0.1 and bool(
            np.asarray(s.touch_l)[0, leg]
        ):
            lifted = True
        if max_phase >= ALIGN_CONN and lifted:
            break
    assert max_phase >= MOVE_WAYPOINTS, f"only reached phase {max_phase}"
    assert lifted, "scripted policy never lifted the leg while grasping"
