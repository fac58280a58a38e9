"""Physics engine sanity tests on the real table_lack model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furniture_tpu.config import SimConfig
from furniture_tpu.models import compile_model
from furniture_tpu.physics import PartState, init_state
from furniture_tpu.physics.engine import (
    control_step,
    make_substep,
    physics_tables,
    substeps,
)


@pytest.fixture(scope="module")
def setup():
    model = compile_model("table_lack_0825")
    tables = physics_tables(model)
    cfg = SimConfig()
    substep = make_substep(tables, cfg)
    return model, tables, cfg, substep


def _default_state(model):
    return init_state(model.part_init_pos, model.part_init_quat)


def test_drop_to_floor_rest(setup):
    """Parts dropped from above settle to rest on the floor."""
    model, tables, cfg, substep = setup
    state = _default_state(model)
    state = state._replace(pos=state.pos.at[:, 2].add(0.1))
    group = jnp.arange(model.n_parts)
    gscale = jnp.ones(model.n_parts)

    run = jax.jit(lambda s: substeps(substep, s, group, gscale, 200))
    out = run(state)
    assert np.isfinite(np.asarray(out.pos)).all()
    # all parts on or above the floor: no box corner far below z=0
    from furniture_tpu.physics.collide import floor_contacts

    fc = floor_contacts(tables, out.pos, out.quat, cfg.contact_slop)
    depth = np.asarray(jnp.where(fc.mask, fc.depth, 0.0))
    assert depth.max() < 0.01, f"max penetration {depth.max()}"
    # settled: small velocity
    assert np.abs(np.asarray(out.lin_vel)).max() < 0.2


def test_held_part_static(setup):
    """A held (gravity-compensated, velocity-zeroed) part in free space
    stays exactly where it is (reference _stop_object semantics)."""
    model, tables, cfg, substep = setup
    state = _default_state(model)
    state = state._replace(pos=state.pos.at[:, 2].add(0.5))
    group = jnp.arange(model.n_parts)
    held = jnp.ones(model.n_parts, dtype=bool)

    out = jax.jit(
        lambda s: control_step(substep, s, group, held, cfg_substeps)
    )(state)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(state.pos), atol=1e-5)


cfg_substeps = 50  # 0.1s control step / 0.002 timestep


def test_welded_group_comoves(setup):
    """Two parts in the same group fall as one rigid body: relative pose
    preserved while both translate."""
    model, tables, cfg, substep = setup
    state = _default_state(model)
    state = state._replace(pos=state.pos.at[:, 2].add(0.5))
    # weld parts 0 and 4 (leg + tabletop) into group 0
    group = jnp.array([0, 1, 2, 3, 0])
    gscale = jnp.ones(model.n_parts)
    rel_before = np.asarray(state.pos[4] - state.pos[0])

    out = jax.jit(lambda s: substeps(substep, s, group, gscale, 30))(state)
    rel_after = np.asarray(out.pos[4] - out.pos[0])
    np.testing.assert_allclose(rel_after, rel_before, atol=1e-3)
    # both fell
    assert np.asarray(out.pos)[0, 2] < np.asarray(state.pos)[0, 2] - 0.005


def test_vmapped_batch(setup):
    """The engine vmaps over env batches with per-env group labels."""
    model, tables, cfg, substep = setup
    B = 4
    state = _default_state(model)
    batch = jax.tree.map(lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim), state)
    groups = jnp.tile(jnp.arange(model.n_parts)[None], (B, 1))
    groups = groups.at[0].set(jnp.zeros(model.n_parts, jnp.int32))
    held = jnp.zeros((B, model.n_parts), dtype=bool)

    step = jax.jit(
        jax.vmap(lambda s, g, h: control_step(substep, s, g, h, 10))
    )
    out = step(batch, groups, held)
    assert np.isfinite(np.asarray(out.pos)).all()
    assert out.pos.shape == (B, model.n_parts, 3)


def test_no_interpenetration_after_settle(setup):
    """Two stacked parts resolve overlap and separate."""
    model, tables, cfg, substep = setup
    state = _default_state(model)
    # put leg 0 inside the tabletop's box
    pos = np.asarray(state.pos).copy()
    pos[0] = pos[4] + np.array([0.0, 0.0, 0.005])
    state = state._replace(pos=jnp.asarray(pos))
    group = jnp.arange(model.n_parts)
    gscale = jnp.ones(model.n_parts)
    out = jax.jit(lambda s: substeps(substep, s, group, gscale, 100))(state)
    assert np.isfinite(np.asarray(out.pos)).all()


def test_leaning_part_edge_contact(setup):
    """A leg laid crossing another leg (edge-on-edge, no corner inside
    either box) must find the SAT edge contact (collide.edge_contacts) and
    come to rest ON it instead of sinking through — MuJoCo box-box manifold
    behavior the corner sampling alone cannot produce."""
    from furniture_tpu.physics.collide import edge_contacts

    model, tables, cfg, substep = setup
    state = _default_state(model)
    # legs 0 and 1 (long thin boxes): 0 flat on the floor along its own
    # axis, 1 laid across it at 90 deg, resting mid-shaft on mid-shaft
    import furniture_tpu.transforms as T

    P = model.n_parts
    far = jnp.stack([jnp.array([2.0 + i, 2.0 + i, 0.02]) for i in range(P)])
    pos = far.at[0].set(jnp.array([0.0, 0.0, 0.017]))
    pos = pos.at[1].set(jnp.array([0.0, 0.0, 0.055]))
    quat = jnp.tile(jnp.array([1.0, 0, 0, 0]), (P, 1))
    # leg local long axis: rotate one leg 90 deg about z so they cross
    quat = quat.at[0].set(T.euler_to_quat(jnp.array([0.0, 90.0, 0.0])))
    quat = quat.at[1].set(
        T.quat_mul(
            T.euler_to_quat(jnp.array([0.0, 0.0, 90.0])),
            T.euler_to_quat(jnp.array([0.0, 90.0, 0.0])),
        )
    )
    state = state._replace(pos=pos, quat=quat)
    group = jnp.arange(P)
    gscale = jnp.ones(P)

    run = jax.jit(lambda s: substeps(substep, s, group, gscale, 300))
    out = run(state)
    assert np.isfinite(np.asarray(out.pos)).all()
    # the top leg must rest ON the bottom leg, not sink through it: its
    # center stays clearly above the bottom leg's resting height
    z_top = float(out.pos[1, 2])
    z_bot = float(out.pos[0, 2])
    assert z_top > z_bot + 0.02, f"top leg sank: z_top={z_top} z_bot={z_bot}"

    # and the edge lane itself must be the active contact at rest
    NPp = len(tables["_pairs"])
    ec = edge_contacts(
        tables, out.pos, out.quat, group, cfg.contact_slop,
        corner_hit=jnp.zeros(NPp, bool),
    )
    m = np.asarray(ec.mask)
    assert m.any(), "no SAT edge contact between the crossed legs"
