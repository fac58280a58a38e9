"""Arm-agent environment tests: kinematics sanity, IK tracking, grasping,
control-type variants, and batching.

Mirrors the testing discipline the reference lacks (SURVEY.md §4); the grasp
test is the physical analogue of the reference's ``gripper_tester.py``
(a gripper must grasp and lift a box without dropping it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furniture_tpu.config import EnvConfig, SimConfig
from furniture_tpu.envs.arm import ArmEnv
from furniture_tpu.robots import compile_robot
from furniture_tpu.robots import kinematics as K

FAST_SIM = SimConfig(control_freq=20, solver_iters=12)


@pytest.fixture(scope="module")
def env():
    return ArmEnv(
        EnvConfig(
            agent_type="Sawyer",
            control_type="ik",
            furniture_name="table_lack_0825",
            sim=FAST_SIM,
        )
    )


@pytest.fixture(scope="module")
def reset_state(env):
    return jax.jit(env.reset)(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def step(env):
    return jax.jit(env.step)


def test_chain_compile_all_agents():
    for agent in ("Sawyer", "Panda", "Jaco", "Fetch", "Baxter"):
        for tq in (False, True):
            r = compile_robot(agent, use_torque=tq)
            assert r.nb > 5 and r.nj >= 8
            # mass matrix SPD at init pose
            fk_out = K.fk(r, jnp.asarray(r.init_qpos, jnp.float32))
            M = np.asarray(K.mass_matrix(r, fk_out))
            ev = np.linalg.eigvalsh(M)
            assert ev.min() > 0, f"{agent}: M not SPD"
            # every arm has finger geoms for grasp coupling
            for arm in r.arms:
                assert len(r.finger_geoms_l[arm]) > 0
                assert len(r.finger_geoms_r[arm]) > 0


def test_fk_jacobian_consistency():
    """Analytic point Jacobian must match jax.jacfwd through fk."""
    r = compile_robot("Sawyer")
    q0 = jnp.asarray(r.init_qpos, jnp.float32)
    body = r.eef_body["right"]

    def eef_pos(q):
        return K.fk(r, q)["body_pos"][body]

    fk_out = K.fk(r, q0)
    J = K.point_jacobian(r, fk_out, body, fk_out["body_pos"][body])
    J_ad = jax.jacfwd(eef_pos)(q0)
    np.testing.assert_allclose(
        np.asarray(J[:3]), np.asarray(J_ad), atol=1e-4
    )


def test_reset_finite(env, reset_state):
    s = reset_state
    assert np.isfinite(np.asarray(s.qpos)).all()
    assert np.isfinite(np.asarray(s.parts.pos)).all()
    # arm init pose (reference sawyer_robot.py:20)
    np.testing.assert_allclose(
        np.asarray(s.qpos)[:7],
        [-0.28, -0.60, 0.00, 1.86, 0.00, 0.3, 1.57],
        atol=1e-5,
    )


def test_zero_action_holds(env, reset_state, step):
    s = reset_state
    a = jnp.zeros(env.dof)
    for _ in range(3):
        s, obs, rew, done, info = step(s, a)
    drift = np.abs(np.asarray(s.qpos)[:7] - np.asarray(reset_state.qpos)[:7])
    assert drift.max() < 5e-3, f"arm drifted {drift}"


def test_ik_moves_eef(env, reset_state, step):
    s = reset_state
    fk0 = K.fk(env.robot, s.qpos)
    p0, _ = K.eef_pose(env.robot, fk0, "right")
    a = jnp.zeros(env.dof).at[2].set(1.0)  # +z
    for _ in range(5):
        s, *_ = step(s, a)
    fk1 = K.fk(env.robot, s.qpos)
    p1, _ = K.eef_pose(env.robot, fk1, "right")
    dz = float((p1 - p0)[2])
    assert dz > 0.1, f"eef only moved {dz} in z"


def test_grasp_lift_release(env, reset_state, step):
    """Two-finger friction grasp must lift a part with the hand and release
    it when opened (physical analogue of gripper_tester.py:17-233)."""
    s = reset_state
    fk = K.fk(env.robot, s.qpos)
    gp, _ = K.site_world(env.robot, fk, "right")
    pos = np.asarray(s.parts.pos).copy()
    # grasp below the palm so only fingertips hold the part (grasping
    # higher wedges the feather-light part in the palm cavity, where
    # residual friction keeps carrying it after release — physical, but
    # not what this test checks)
    pos[0] = np.asarray(gp) + [0.0, 0.0, -0.02]
    s = s._replace(parts=s.parts._replace(pos=jnp.asarray(pos)))

    close = jnp.zeros(env.dof).at[6].set(1.0)
    for _ in range(3):
        s, obs, rew, done, info = step(s, close)
    assert bool(np.asarray(s.touch_l)[0, 0]), "left finger not touching"
    assert bool(np.asarray(s.touch_r)[0, 0]), "right finger not touching"
    assert bool(np.asarray(s.touched)[0]), "touch bookkeeping missing"

    p0 = np.asarray(s.parts.pos[0]).copy()
    # eef moves ~0.03/step (move_speed x 0.3 IK sensitivity at full action)
    lift = jnp.zeros(env.dof).at[2].set(1.0).at[6].set(1.0)
    for _ in range(8):
        s, obs, rew, done, info = step(s, lift)
    p1 = np.asarray(s.parts.pos[0])
    dz = float(p1[2] - p0[2])
    assert dz > 0.1, f"part not lifted with hand (dz={dz})"
    assert bool(np.asarray(s.picked)[0]), "pick bookkeeping missing"

    # release far from other parts: part must stop following the hand
    open_a = jnp.zeros(env.dof).at[6].set(-1.0).at[2].set(1.0)
    for _ in range(6):
        s, obs, rew, done, info = step(s, open_a)
    fk2 = K.fk(env.robot, s.qpos)
    gp2, _ = K.site_world(env.robot, fk2, "right")
    gap = float(np.asarray(gp2)[2] - np.asarray(s.parts.pos[0])[2])
    assert gap > 0.2, "part still glued to the hand after release"


def test_fast_transport_keeps_grip(env, reset_state, step):
    """A pinched part must track the hand through full-speed lateral
    transport (SimConfig.grip_force): the scripted generator carries legs
    at move_speed=0.1 m/control-step. The bounded-force squeeze floor gives
    the finger friction cone a ±20 N budget (the reference's force-limited
    finger servos), so the grasp holds without velocity-blend assists."""
    s = reset_state
    fk = K.fk(env.robot, s.qpos)
    gp, _ = K.site_world(env.robot, fk, "right")
    pos = np.asarray(s.parts.pos).copy()
    pos[0] = np.asarray(gp) + [0.0, 0.0, -0.02]
    s = s._replace(parts=s.parts._replace(pos=jnp.asarray(pos)))

    close = jnp.zeros(env.dof).at[6].set(1.0)
    for _ in range(3):
        s, *_ = step(s, close)
    lift = jnp.zeros(env.dof).at[2].set(1.0).at[6].set(1.0)
    for _ in range(4):
        s, *_ = step(s, lift)
    assert bool(np.asarray(s.touch_l)[0, 0] & np.asarray(s.touch_r)[0, 0])

    # full-speed lateral carry (the XY_MOVE_CONN regime)
    carry = jnp.zeros(env.dof).at[1].set(1.0).at[6].set(1.0)
    fk0 = K.fk(env.robot, s.qpos)
    h0, _ = K.eef_pose(env.robot, fk0, "right")
    p0 = np.asarray(s.parts.pos[0]).copy()
    for _ in range(6):
        s, *_ = step(s, carry)
    fk1 = K.fk(env.robot, s.qpos)
    h1, _ = K.eef_pose(env.robot, fk1, "right")
    dh = np.asarray(h1 - h0)
    dp = np.asarray(s.parts.pos[0]) - p0
    assert np.linalg.norm(dh) > 0.08, f"hand did not transport ({dh})"
    assert bool(
        np.asarray(s.touch_l)[0, 0] & np.asarray(s.touch_r)[0, 0]
    ), "part slipped out during fast transport"
    assert np.linalg.norm(dp - dh) < 0.06, (
        f"part did not track the hand: hand {dh}, part {dp}"
    )


def test_observation_layout(env, reset_state):
    obs = env.observe(reset_state)
    # ik robot_ob: gripper_qpos(2) + eef_pos(3) + eef_quat(4) + velp(3) + velr(3)
    assert obs["robot_ob"].shape == (15,)
    assert obs["object_ob"].shape == (env.model.n_parts * 7,)


def test_impedance_mode_runs():
    env = ArmEnv(
        EnvConfig(agent_type="Sawyer", control_type="impedance", sim=FAST_SIM)
    )
    assert env.dof == 9  # 7 + gripper + connect (furniture_sawyer.py:53-64)
    s = jax.jit(env.reset)(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    a = jnp.zeros(env.dof).at[1].set(0.3)
    q0 = np.asarray(s.qpos)[:7].copy()
    for _ in range(3):
        s, obs, rew, done, info = step(s, a)
    q1 = np.asarray(s.qpos)[:7]
    assert np.isfinite(q1).all()
    assert abs(q1[1] - q0[1]) > 0.01, "velocity servo did not move joint 1"
    # impedance robot_ob prepends joint pos/vel
    assert obs["robot_ob"].shape == (7 + 7 + 15,)


def test_torque_mode_runs():
    env = ArmEnv(
        EnvConfig(agent_type="Sawyer", control_type="torque", sim=FAST_SIM)
    )
    s = jax.jit(env.reset)(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    a = jnp.zeros(env.dof).at[0].set(0.05)
    for _ in range(2):
        s, obs, rew, done, info = step(s, a)
    assert np.isfinite(np.asarray(s.qpos)).all()


def test_baxter_bimanual():
    env = ArmEnv(
        EnvConfig(agent_type="Baxter", control_type="ik", sim=FAST_SIM)
    )
    assert env.dof == 15  # furniture_baxter.py:52-63
    s = jax.jit(env.reset)(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    s, obs, rew, done, info = step(s, jnp.zeros(env.dof))
    assert np.isfinite(np.asarray(s.qpos)).all()
    assert s.touch_l.shape == (2, env.model.n_parts)


def test_baxter_grasp_lift():
    """Baxter's right gripper must grasp and lift a part — mirrors the
    Sawyer grasp test on the bimanual agent, exercising the dense 15-point
    robot sample set (fingertip face-center contacts) that the old
    lane-budget fallback used to drop to 8 corners for Baxter."""
    env = ArmEnv(
        EnvConfig(agent_type="Baxter", control_type="ik", sim=FAST_SIM)
    )
    step = jax.jit(env.step)
    s = jax.jit(env.reset)(jax.random.PRNGKey(1))
    fk = K.fk(env.robot, s.qpos)
    r = env.robot
    # stage the leg at the midpoint of the right gripper's fingertips
    # (Baxter's open gap is ~9 cm, so the part is re-pinned while the
    # fingers travel — it would free-fall out of reach otherwise)
    rg_pos, _ = K.geom_world(r, fk)
    tip_l = np.asarray(rg_pos[np.asarray(r.finger_geoms_l["right"])[-1]])
    tip_r = np.asarray(rg_pos[np.asarray(r.finger_geoms_r["right"])[-1]])
    mid = 0.5 * (tip_l + tip_r)
    pos = np.asarray(s.parts.pos).copy()
    pos[0] = mid
    s = s._replace(parts=s.parts._replace(pos=jnp.asarray(pos)))

    # ik layout: [right6, left6, grip_right, grip_left, connect]
    close = jnp.zeros(env.dof).at[12].set(1.0)
    for _ in range(3):
        s, *_ = step(s, close)
        s = s._replace(parts=s.parts._replace(pos=jnp.asarray(pos)))
    for _ in range(2):
        s, *_ = step(s, close)
    assert bool(np.asarray(s.touch_l)[0, 0]), "right-left finger not touching"
    assert bool(np.asarray(s.touch_r)[0, 0]), "right-right finger not touching"

    p0 = np.asarray(s.parts.pos[0]).copy()
    lift = jnp.zeros(env.dof).at[2].set(1.0).at[12].set(1.0)
    for _ in range(8):
        s, *_ = step(s, lift)
    dz = float(s.parts.pos[0][2] - p0[2])
    assert dz > 0.08, f"Baxter did not lift the part (dz={dz})"


def test_vmap_batching(env):
    B = 4
    states = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), B)
    )
    actions = jnp.zeros((B, env.dof))
    states, obs, rew, done, info = jax.jit(jax.vmap(env.step))(states, actions)
    assert states.qpos.shape == (B, env.robot.nj)
    assert rew.shape == (B,)


def test_arm_instability_guard():
    """NaN qpos / flung parts are contained: lane sanitized, penalized,
    done (env/furniture.py:2889-2897,463-467)."""
    import jax, jax.numpy as jnp, numpy as np
    from furniture_tpu.config import EnvConfig
    from furniture_tpu.envs.arm import ArmEnv

    env = ArmEnv(EnvConfig(agent_type="Sawyer", control_type="ik"))
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    bad = s._replace(
        qpos=s.qpos.at[0].set(jnp.nan),
        parts=s.parts._replace(pos=s.parts.pos.at[0, 2].set(50.0)),
    )
    step = jax.jit(env.step)
    s2, obs, rew, done, info = step(bad, jnp.zeros(env.dof))
    assert bool(info["unstable"]) and bool(done)
    assert float(rew) < 0
    for leaf in jax.tree.leaves((s2, obs)):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("agent", ["Sawyer", "Baxter"])
@pytest.mark.parametrize(
    "control_type",
    [
        "ik",
        "ik_quaternion",
        "impedance",
        "torque",
        "position_orientation",
        "position",
        "joint_impedance",
        "joint_velocity",
        "joint_torque",
    ],
)
def test_every_control_type_steps(agent, control_type):
    """Every declared control mode steps with a full-range action and keeps
    the state finite (reference modes: env/furniture.py:2899-3094; the
    ik_quaternion layout is 7 dims/arm + grippers, :3000-3015)."""
    env = ArmEnv(
        EnvConfig(agent_type=agent, control_type=control_type, sim=FAST_SIM)
    )
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, env.dof), jnp.float32
    )
    s2, obs, rew, done, info = step(s, a)
    for leaf in jax.tree.leaves((s2, obs, rew)):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    assert not bool(info["unstable"])


def test_ik_quaternion_tracks_rotation():
    """A pure-rotation quaternion action must rotate the hand toward the
    commanded delta (right-multiplied, env/furniture.py:3010,1332-1342) and
    the gripper index must address the slot after the 7-dim arm blocks."""
    from furniture_tpu import transforms as T

    env = ArmEnv(
        EnvConfig(agent_type="Sawyer", control_type="ik_quaternion", sim=FAST_SIM)
    )
    assert env.dof == 7 + 1 + 1
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    fk0 = K.fk(env.robot, s.qpos)
    _, hq0 = K.eef_pose(env.robot, fk0, "right")

    # ~11° about world z of the hand frame (right-multiplied delta)
    dq = jnp.array([np.cos(0.1), 0.0, 0.0, np.sin(0.1)], jnp.float32)
    a = jnp.zeros(env.dof).at[3:7].set(dq)
    step = jax.jit(env.step)
    s2 = s
    for _ in range(5):
        s2, *_ = step(s2, a)
    fk1 = K.fk(env.robot, s2.qpos)
    _, hq1 = K.eef_pose(env.robot, fk1, "right")
    # angle moved toward the accumulated target
    d = T.quat_mul(hq1, T.quat_inv(hq0))
    ang = 2 * np.arccos(min(1.0, abs(float(d[0]))))
    assert ang > 0.05, f"hand only rotated {ang:.3f} rad"
