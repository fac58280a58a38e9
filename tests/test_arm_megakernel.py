"""Whole-control-step arm Pallas megakernel vs the XLA arm path.

Runs the kernel in interpreter mode (tests execute on CPU); the same kernel
is the TPU production path behind ``ArmEnv.step_batch``
(``SimConfig.use_pallas="auto"``). Mirrors ``tests/test_megakernel.py``'s
discipline for the cursor kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np

import furniture_tpu.robots.kinematics as K
from furniture_tpu.config import EnvConfig
from furniture_tpu.envs.arm import ArmEnv
from furniture_tpu.physics.arm_megakernel import ArmMegaPhysics


def _env(agent="Sawyer", **kw):
    return ArmEnv(
        EnvConfig(agent_type=agent, control_type="impedance", **kw)
    )


def _grip_states(env, B, key=0):
    """Reset states with part 0 teleported between arm 0's fingers so the
    robot contact lanes, squeeze servo, and JᵀF coupling all see real work."""
    keys = jax.random.split(jax.random.PRNGKey(key), B)
    states = jax.jit(jax.vmap(env.reset))(keys)
    fk = K.fk(env.robot, states.qpos[0])
    gp, _ = K.site_world(env.robot, fk, env.arms[0])
    pos = states.parts.pos.at[:, 0].set(jnp.asarray(gp)[None])
    return states._replace(parts=states.parts._replace(pos=pos))


def _run_both(env, states, ctrl, n):
    B = ctrl.shape[0]
    ref = jax.jit(jax.vmap(lambda st, c: env._sim_substeps(st, c, None, n)))(
        states, ctrl
    )
    mega = ArmMegaPhysics(env.tables, env.robot, env.config.sim, interpret=True)
    G1, G2 = jax.vmap(
        lambda q: K.joint_dyn_matrices(env.robot, q, env.config.sim.timestep)
    )(states.qpos)
    parts, qp, qv, touch = mega.control_step(
        states.parts,
        states.group,
        jnp.ones((B, env._P)),
        states.qpos,
        states.qvel,
        ctrl,
        jnp.zeros((B, env.robot.nj)),
        G1,
        G2,
        n,
    )
    return ref, (parts, qp, qv, touch)


def _assert_match(env, ref, out, tol=5e-4):
    parts, qp, qv, touch = out
    for name in ("pos", "quat", "lin_vel", "ang_vel"):
        a = np.asarray(getattr(ref.parts, name))
        b = np.asarray(getattr(parts, name))
        assert np.max(np.abs(a - b)) < tol, (name, np.max(np.abs(a - b)))
    assert np.max(np.abs(np.asarray(ref.qpos) - np.asarray(qp))) < tol
    assert np.max(np.abs(np.asarray(ref.qvel) - np.asarray(qv))) < tol
    B = qp.shape[0]
    t = touch.reshape(B, env.n_arms, 2, env._P)
    assert np.array_equal(np.asarray(ref.touch_l), np.asarray(t[:, :, 0]))
    assert np.array_equal(np.asarray(ref.touch_r), np.asarray(t[:, :, 1]))


def test_arm_megakernel_matches_xla_substeps():
    env = _env()
    B = 2
    states = _grip_states(env, B)
    actions = jax.random.uniform(
        jax.random.PRNGKey(1), (B, env.dof), minval=-1.0, maxval=1.0
    )
    actions = actions.at[:, -2].set(-1.0)  # close the gripper hard
    ctrl = jax.vmap(env._direct_ctrl)(actions[:, :-1])
    ref, out = _run_both(env, states, ctrl, n=5)
    assert bool(jnp.any(out[3])), "expected gripper-part contact"
    _assert_match(env, ref, out)


def test_arm_megakernel_matches_xla_baxter():
    env = _env("Baxter")
    B = 2
    states = _grip_states(env, B)
    actions = jax.random.uniform(
        jax.random.PRNGKey(2), (B, env.dof), minval=-1.0, maxval=1.0
    )
    ctrl = jax.vmap(env._direct_ctrl)(actions[:, :-1])
    ref, out = _run_both(env, states, ctrl, n=3)
    _assert_match(env, ref, out)


def test_step_batch_matches_vmapped_step_arm():
    """Full batched step (kernel forced on via use_pallas="on" → interpret
    on CPU) vs the per-env XLA path: float state within tolerance, discrete
    assembly/reward state exact."""
    cfg = EnvConfig(
        agent_type="Sawyer",
        control_type="impedance",
        sim=EnvConfig().sim.__class__(control_freq=100, use_pallas="on"),
    )
    env_k = ArmEnv(cfg)
    env_x = ArmEnv(cfg.replace(sim=cfg.sim.__class__(control_freq=100)))
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    states = jax.jit(jax.vmap(env_x.reset))(keys)
    actions = jax.random.uniform(
        jax.random.PRNGKey(4), (B, env_x.dof), minval=-1.0, maxval=1.0
    )
    s_ref, obs_ref, rew_ref, done_ref, info_ref = jax.jit(
        jax.vmap(env_x.step)
    )(states, actions)
    s_out, obs_out, rew_out, done_out, info_out = env_k.step_batch(
        states, actions
    )
    assert np.allclose(
        np.asarray(s_ref.parts.pos), np.asarray(s_out.parts.pos), atol=1e-3
    )
    assert np.allclose(
        np.asarray(s_ref.qpos), np.asarray(s_out.qpos), atol=1e-3
    )
    assert np.array_equal(np.asarray(s_ref.group), np.asarray(s_out.group))
    assert np.array_equal(
        np.asarray(s_ref.num_connected), np.asarray(s_out.num_connected)
    )
    assert np.allclose(np.asarray(rew_ref), np.asarray(rew_out), atol=1e-3)
    assert np.array_equal(np.asarray(done_ref), np.asarray(done_out))


def test_two_way_coupling_loads_the_arm():
    """With ``sim.robot_coupling`` the grasped part's contact impulses must
    feed back into the joints (VERDICT r2 item 6): holding a part between
    closed fingers produces a measurably different joint trajectory than the
    uncoupled kinematic-collider approximation."""
    sim_on = EnvConfig().sim.__class__(robot_coupling=True)
    sim_off = EnvConfig().sim.__class__(robot_coupling=False)
    env_on = ArmEnv(EnvConfig(agent_type="Sawyer", control_type="impedance", sim=sim_on))
    env_off = ArmEnv(EnvConfig(agent_type="Sawyer", control_type="impedance", sim=sim_off))
    states = _grip_states(env_on, 1)
    action = jnp.zeros(env_on.dof).at[-2].set(-1.0)  # hold still, close grip
    ctrl = env_on._direct_ctrl(action[:-1])
    st1 = jax.jit(lambda s: env_on._sim_substeps(s, ctrl, None, 20))(
        jax.tree.map(lambda x: x[0], states)
    )
    st0 = jax.jit(lambda s: env_off._sim_substeps(s, ctrl, None, 20))(
        jax.tree.map(lambda x: x[0], states)
    )
    dq = np.max(np.abs(np.asarray(st1.qpos) - np.asarray(st0.qpos)))
    assert dq > 1e-6, f"coupling had no joint-space effect (dq={dq})"
    assert np.all(np.isfinite(np.asarray(st1.qpos)))
    # the part must still be held (not dropped through the floor or flung)
    assert np.asarray(st1.parts.pos)[0, 2] > 0.0
