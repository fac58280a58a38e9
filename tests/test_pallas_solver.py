"""Pallas contact-solver kernel vs the XLA-fused reference solver.

Runs the kernel in interpreter mode (tests execute on CPU); the same kernel
was validated bit-consistent on TPU v5e hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np

from furniture_tpu.models import compile_model
from furniture_tpu.physics.collide import (
    concat_contacts,
    floor_contacts,
    pair_contacts,
)
from furniture_tpu.physics.engine import (
    _group_aggregates,
    _solve_contacts,
    physics_tables,
)
from furniture_tpu.physics.pallas_solver import solve_contacts_pallas
from furniture_tpu.physics.state import init_state


def _setup(key, vel_scale=0.1):
    m = compile_model("table_lack_0825")
    tb = physics_tables(m)
    from furniture_tpu.config import SimConfig
    from furniture_tpu.physics.collide import attach_betas

    attach_betas(tb, SimConfig())
    k1, k2 = jax.random.split(key)
    pos = jnp.asarray(m.part_init_pos, jnp.float32) + jax.random.normal(
        k1, (m.n_parts, 3)
    ) * 0.01
    pos = pos.at[:, 2].set(jnp.abs(pos[:, 2]) * 0.3 + 0.02)
    quat = jnp.tile(jnp.array([1.0, 0, 0, 0]), (m.n_parts, 1))
    st = init_state(pos, quat)
    st = st._replace(
        lin_vel=jax.random.normal(k2, (m.n_parts, 3)) * vel_scale
    )
    group = jnp.arange(m.n_parts)
    _, g_com, g_im, g_iI = _group_aggregates(tb, st, group)
    fc = floor_contacts(tb, st.pos, st.quat, 0.001)
    pc = pair_contacts(tb, st.pos, st.quat, group, 0.001)
    c = concat_contacts(fc, pc)
    return (c, group, g_com, g_im, g_iI, st.lin_vel, st.ang_vel,
            0.002, 24, 0.55, 0.2, 0.001)


def test_pallas_solver_matches_xla():
    for seed in (0, 1, 2):
        args = _setup(jax.random.PRNGKey(seed))
        lv1, av1 = jax.jit(lambda a=args: _solve_contacts(*a))()
        lv2, av2 = solve_contacts_pallas(*args, interpret=True)
        np.testing.assert_allclose(
            np.asarray(lv1), np.asarray(lv2), atol=2e-3, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(av1), np.asarray(av2), atol=5e-3, rtol=1e-3
        )
