"""Cursor environment: end-to-end semantics tests on table_lack_0825."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furniture_tpu.config import EnvConfig
from furniture_tpu.envs.cursor import CursorEnv, CursorState


@pytest.fixture(scope="module")
def env():
    return CursorEnv(EnvConfig())


@pytest.fixture(scope="module")
def reset_state(env):
    return jax.jit(env.reset)(jax.random.PRNGKey(0))


def test_reset_shapes(env, reset_state):
    s = reset_state
    assert s.parts.pos.shape == (5, 3)
    assert s.group.tolist() == [0, 1, 2, 3, 4]
    assert int(s.num_connected) == 0
    assert np.isfinite(np.asarray(s.parts.pos)).all()
    # parts settled at/above floor
    assert np.asarray(s.parts.pos)[:, 2].min() > -0.01


def test_zero_action_step(env, reset_state):
    step = jax.jit(env.step)
    s, obs, rew, done, info = step(reset_state, jnp.zeros(15))
    assert obs["object_ob"].shape == (5 * 7,)
    assert obs["robot_ob"].shape == (8,)
    assert float(rew) == 0.0
    assert not bool(done)
    assert np.isfinite(np.asarray(s.parts.pos)).all()


def test_cursor_moves_with_boundary(env, reset_state):
    step = jax.jit(env.step)
    a = jnp.zeros(15).at[0].set(1.0)  # cursor0 +x at move_speed
    s, *_ = step(reset_state, a)
    np.testing.assert_allclose(
        np.asarray(s.cursor_pos[0]),
        np.asarray(reset_state.cursor_pos[0]) + [0.1, 0, 0],
        atol=1e-6,
    )
    # z below floor limit rejected
    a2 = jnp.zeros(15).at[2].set(-1.0)
    s2, *_ = step(reset_state, a2)
    np.testing.assert_allclose(
        np.asarray(s2.cursor_pos[0]), np.asarray(reset_state.cursor_pos[0]), atol=1e-6
    )


def test_select_and_carry(env, reset_state):
    """Teleport cursor onto part 0, select it, then move: part co-moves."""
    step = jax.jit(env.step)
    part0 = np.asarray(reset_state.parts.pos[0]).copy()
    part0[2] = max(part0[2], 0.05)  # cursor must stay above move_speed*0.45
    s = reset_state._replace(
        cursor_pos=reset_state.cursor_pos.at[0].set(jnp.asarray(part0))
    )
    hold = jnp.zeros(15).at[6].set(1.0)
    s, *_ = step(s, hold)
    assert int(s.selected[0]) == 0

    move = jnp.zeros(15).at[6].set(1.0).at[2].set(1.0)  # keep select, +z
    before = np.asarray(s.parts.pos[0])
    s2, *_ = step(s, move)
    after = np.asarray(s2.parts.pos[0])
    np.testing.assert_allclose(after - before, [0, 0, 0.1], atol=5e-3)
    # deselect drops it (gravity acts again)
    s3, *_ = step(s2, jnp.zeros(15))
    assert int(s3.selected[0]) == -1


def _staged_connect_state(env) -> CursorState:
    """Hand-built state: tabletop held above floor, leg 0 posed so its conn
    site coincides with the table's conn_site1, both with identity quats
    (ups aligned, forwards at an allowed 0° angle)."""
    m = env.model
    s = jax.jit(env.reset)(jax.random.PRNGKey(1))
    pos = np.asarray(s.parts.pos).copy()
    quat = np.tile([1.0, 0, 0, 0], (5, 1)).astype(np.float32)
    # table (part4) floating
    pos[4] = [0.0, 0.0, 0.5]
    # leg 0: its conn site (local z=0.1355) onto table conn_site1
    # table-leg,conn_site1 local pos (-0.305,-0.095,-0.02)
    leg_site_local = np.asarray(m.conn_pos[0])     # leg-table conn_site1
    table_site_idx = list(m.conn_names).index("table-leg,0,90,180,270,conn_site1")
    table_site_local = np.asarray(m.conn_pos[table_site_idx])
    target_site_world = pos[4] + table_site_local
    pos[0] = target_site_world - leg_site_local + [0.0, 0.0, -0.01]
    s = s._replace(
        parts=s.parts._replace(pos=jnp.asarray(pos), quat=jnp.asarray(quat)),
        selected=jnp.array([0, 4], jnp.int32),
        cursor_pos=jnp.asarray(
            np.stack([pos[0], pos[4]]), jnp.float32
        ),
    )
    return s


def test_connect_sequence(env):
    """11 consecutive connect actions weld leg0 to the tabletop."""
    step = jax.jit(env.step)
    s = _staged_connect_state(env)
    a = jnp.zeros(15).at[6].set(1.0).at[13].set(1.0).at[14].set(1.0)
    for k in range(env.config.num_connect_steps + 1):
        s, obs, rew, done, info = step(s, a)
    assert int(s.num_connected) == 1, f"connect_step={int(s.connect_step)}"
    assert float(rew) == env.config.reward.success_reward
    # groups merged
    g = np.asarray(s.group)
    assert g[0] == g[4]
    # the leg's site now coincides with the table's site
    cpos, _ = env._conn_world(s.parts)
    d = np.linalg.norm(
        np.asarray(cpos[0])
        - np.asarray(cpos[list(env.model.conn_names).index("table-leg,0,90,180,270,conn_site1")])
    )
    assert d < 0.02, d
    # connected sites are consumed
    assert bool(s.conn_connected[0])
    # cursor 1 released
    assert int(s.selected[1]) == -1
    # subtask moved to the next unconnected weld
    assert int(s.subtask[0]) != 0 or int(s.subtask[1]) != 0


def test_connect_requires_alignment(env):
    """Far-apart parts never connect."""
    step = jax.jit(env.step)
    s = _staged_connect_state(env)
    pos = np.asarray(s.parts.pos).copy()
    pos[0, 0] += 1.0  # move leg far away
    s = s._replace(parts=s.parts._replace(pos=jnp.asarray(pos)))
    a = jnp.zeros(15).at[6].set(1.0).at[13].set(1.0).at[14].set(1.0)
    for _ in range(12):
        s, *_ = step(s, a)
    assert int(s.num_connected) == 0


def test_full_assembly_by_teleport(env):
    """Assemble all four legs by staging each connect; success at 4."""
    m = env.model
    step = jax.jit(env.step)
    s = jax.jit(env.reset)(jax.random.PRNGKey(2))
    pos = np.asarray(s.parts.pos).copy()
    quat = np.tile([1.0, 0, 0, 0], (5, 1)).astype(np.float32)
    pos[4] = [0.0, 0.0, 0.6]
    s = s._replace(parts=s.parts._replace(pos=jnp.asarray(pos), quat=jnp.asarray(quat)))

    names = list(m.conn_names)
    total_rew = 0.0
    for leg in range(4):
        leg_site = names.index(f"leg-table,0,90,180,270,conn_site{leg+1}")
        table_site = names.index(f"table-leg,0,90,180,270,conn_site{leg+1}")
        pos = np.asarray(s.parts.pos).copy()
        quat2 = np.asarray(s.parts.quat).copy()
        quat2[leg] = [1.0, 0, 0, 0]
        cpos_t = np.asarray(s.parts.pos[4]) + np.asarray(m.conn_pos[table_site])
        pos[leg] = cpos_t - np.asarray(m.conn_pos[leg_site]) + [0, 0, -0.005]
        s = s._replace(
            parts=s.parts._replace(pos=jnp.asarray(pos), quat=jnp.asarray(quat2)),
            selected=jnp.array([leg, 4], jnp.int32),
            cursor_pos=jnp.asarray(np.stack([pos[leg], pos[4]]), jnp.float32),
        )
        a = jnp.zeros(15).at[6].set(1.0).at[13].set(1.0).at[14].set(1.0)
        done = False
        for _ in range(env.config.num_connect_steps + 1):
            s, obs, rew, done, info = step(s, a)
            total_rew += float(rew)
        assert int(s.num_connected) == leg + 1, f"leg {leg}"
    assert bool(done)
    assert bool(info["success"])
    assert total_rew == 4 * env.config.reward.success_reward


def test_vmapped_steps(env):
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(env.reset))(keys)
    actions = jnp.zeros((B, 15))
    step = jax.jit(jax.vmap(env.step))
    s, obs, rew, done, info = step(states, actions)
    assert s.parts.pos.shape == (B, 5, 3)
    assert obs["object_ob"].shape == (B, 35)
    assert rew.shape == (B,)


def test_instability_guard_resets_lane(env, reset_state):
    """Divergent lanes are sanitized, penalized, and flagged done
    (reference instability catch, env/furniture.py:2889-2897,463-467)."""
    step = jax.jit(env.step)
    bad = reset_state._replace(
        parts=reset_state.parts._replace(
            pos=reset_state.parts.pos.at[0, 0].set(jnp.nan),
            lin_vel=reset_state.parts.lin_vel.at[1, 2].set(jnp.inf),
        )
    )
    s, obs, rew, done, info = step(bad, jnp.zeros(15))
    assert bool(info["unstable"])
    assert bool(done)
    assert float(rew) <= -env.config.reward.unstable_penalty_coef + 1e-6
    for leaf in jax.tree.leaves((s.parts, obs)):
        assert np.isfinite(np.asarray(leaf)).all()


def test_stable_lane_not_flagged(env, reset_state):
    step = jax.jit(env.step)
    _, _, _, _, info = step(reset_state, jnp.zeros(15))
    assert not bool(info["unstable"])
