"""Whole-control-step Pallas megakernel vs the XLA-fused engine path.

Runs the kernel in interpreter mode (tests execute on CPU); the same kernel
is the TPU production path selected by ``SimConfig.use_pallas="auto"``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from furniture_tpu.config import EnvConfig
from furniture_tpu.envs.cursor import CursorEnv
from furniture_tpu.physics.engine import substeps
from furniture_tpu.physics.megakernel import MegaPhysics


def _env(**kw):
    return CursorEnv(EnvConfig(furniture_name="table_lack_0825", **kw))


def test_megakernel_matches_engine_substeps():
    env = _env()
    B = 4
    key = jax.random.PRNGKey(0)
    states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, B))
    parts, group = states.parts, states.group
    # nonzero velocities so the solver, integrator and friction cone all
    # see real work
    parts = parts._replace(
        lin_vel=parts.lin_vel + 0.05, ang_vel=parts.ang_vel + 0.1
    )
    gscale = jnp.ones((B, env._P))

    ref = jax.jit(
        jax.vmap(lambda p, g, gs: substeps(env.substep, p, g, gs, 5))
    )(parts, group, gscale)
    mega = MegaPhysics(env.tables, env.config.sim, interpret=True)
    out = mega.substeps(parts, group, gscale, 5)

    for name in ("pos", "quat", "lin_vel", "ang_vel"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        assert np.max(np.abs(a - b)) < 1e-4, (name, np.max(np.abs(a - b)))


def test_megakernel_handles_welded_groups_and_gravity_comp():
    env = _env()
    B = 2
    key = jax.random.PRNGKey(1)
    states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, B))
    parts = states.parts
    # weld parts 0 and 1 into one group; gravity-compensate group of part 2
    group = jnp.tile(jnp.array([0, 0, 2, 3, 4], jnp.int32), (B, 1))
    gscale = jnp.tile(
        jnp.array([1.0, 1.0, 0.0, 1.0, 1.0], jnp.float32), (B, 1)
    )

    ref = jax.jit(
        jax.vmap(lambda p, g, gs: substeps(env.substep, p, g, gs, 3))
    )(parts, group, gscale)
    mega = MegaPhysics(env.tables, env.config.sim, interpret=True)
    out = mega.substeps(parts, group, gscale, 3)

    for name in ("pos", "quat", "lin_vel", "ang_vel"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        assert np.max(np.abs(a - b)) < 1e-4, (name, np.max(np.abs(a - b)))


def test_step_batch_matches_vmapped_step():
    """step_batch/reset_batch (XLA backend on CPU) vs the per-env path.

    Float state may drift slightly (different XLA fusion orders feed the
    thresholded contact logic), so floats get a loose bound; the discrete
    assembly state (groups, welds, counts, reward, done) must match exactly.
    """
    env = _env()
    B = 4
    key = jax.random.PRNGKey(2)
    keys = jax.random.split(key, B)

    st_ref = jax.jit(jax.vmap(env.reset))(keys)
    st_bat = jax.jit(env.reset_batch)(keys)
    for a, b in zip(jax.tree.leaves(st_ref), jax.tree.leaves(st_bat)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-5
        )

    actions = jax.random.uniform(key, (B, env.dof), minval=-1.0, maxval=1.0)
    s1, o1, r1, d1, i1 = jax.jit(jax.vmap(env.step))(st_ref, actions)
    s2, o2, r2, d2, i2 = jax.jit(env.step_batch)(st_bat, actions)

    # exact discrete/semantic fields
    for f in ("group", "selected", "num_connected", "connect_step", "t"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s1, f)), np.asarray(getattr(s2, f)), err_msg=f
        )
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # float physics state: small fusion-order drift allowed
    for name in ("pos", "quat", "lin_vel", "ang_vel"):
        a = np.asarray(getattr(s1.parts, name))
        b = np.asarray(getattr(s2.parts, name))
        assert np.max(np.abs(a - b)) < 0.05, (name, np.max(np.abs(a - b)))


def test_step_batch_megakernel_interpret():
    """Full step_batch through the megakernel (interpret) stays consistent
    with the XLA step on the discrete assembly state."""
    env = _env()
    sim_on = dataclasses.replace(env.config.sim, use_pallas="on")
    env_on = CursorEnv(EnvConfig(furniture_name="table_lack_0825", sim=sim_on))
    B = 2
    key = jax.random.PRNGKey(3)
    keys = jax.random.split(key, B)
    st = jax.jit(jax.vmap(env.reset))(keys)
    actions = jax.random.uniform(key, (B, env.dof), minval=-1.0, maxval=1.0)

    s1, _, r1, d1, _ = jax.jit(jax.vmap(env.step))(st, actions)
    s2, _, r2, d2, _ = jax.jit(env_on.step_batch)(st, actions)
    for f in ("group", "selected", "num_connected", "connect_step", "t"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s1, f)), np.asarray(getattr(s2, f)), err_msg=f
        )
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    for name in ("pos", "quat", "lin_vel", "ang_vel"):
        a = np.asarray(getattr(s1.parts, name))
        b = np.asarray(getattr(s2.parts, name))
        assert np.max(np.abs(a - b)) < 0.05, (name, np.max(np.abs(a - b)))
