"""Group-composite rigid-body integrator + masked Jacobi contact solver.

Replaces MuJoCo's ``mj_step`` inner loop (reference
``env/furniture.py:2877-2879``: ``control_timestep/model_timestep`` substeps
per control step) for the free furniture parts. Welded parts are treated as
one composite rigid body selected by the per-env ``group`` label array — see
``furniture_tpu/physics/__init__`` for the design rationale.

All functions operate on a single env and are ``vmap``-batched by callers.
Shapes: P parts, K contact lanes (static capacity).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import transforms as T
from .collide import (
    Contacts,
    concat_contacts,
    edge_contacts,
    floor_contacts,
    pair_contacts,
)
from .state import PartState


def _inv3(a):
    """Closed-form 3x3 inverse (adjugate/det). ``jnp.linalg.inv`` lowers to a
    general LU solve on TPU — orders of magnitude slower for batched tiny
    matrices than this fully-vectorized form."""
    m00, m01, m02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    m10, m11, m12 = a[..., 1, 0], a[..., 1, 1], a[..., 1, 2]
    m20, m21, m22 = a[..., 2, 0], a[..., 2, 1], a[..., 2, 2]
    c00 = m11 * m22 - m12 * m21
    c01 = m02 * m21 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c10 = m12 * m20 - m10 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m02 * m10 - m00 * m12
    c20 = m10 * m21 - m11 * m20
    c21 = m01 * m20 - m00 * m21
    c22 = m00 * m11 - m01 * m10
    det = m00 * c00 + m01 * c10 + m02 * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    rows = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ],
        axis=-2,
    )
    return rows * inv_det[..., None, None]


def _group_aggregates(model_np, state: PartState, group):
    """Composite mass properties of each part's rigid group.

    Every part carries its group's composite values (mask-matmul over the
    [P,P] membership matrix — tiny, and MXU-friendly at batch).
    """
    mass = jnp.asarray(model_np["part_mass"], jnp.float32)          # [P]
    com_l = jnp.asarray(model_np["part_com"], jnp.float32)          # [P,3]
    I_l = jnp.asarray(model_np["part_inertia"], jnp.float32)        # [P,3,3]

    member = (group[:, None] == group[None, :]).astype(jnp.float32)  # [P,P]
    com_w = state.pos + T.quat_rotate(state.quat, com_l)            # [P,3]
    R = T.quat_to_mat(state.quat)                                   # [P,3,3]
    I_w = jnp.matmul(jnp.matmul(R, I_l), jnp.swapaxes(R, -1, -2))   # R I R^T

    g_mass = member @ mass                                          # [P]
    g_com = (member @ (mass[:, None] * com_w)) / g_mass[:, None]    # [P,3]

    d = com_w[None, :, :] - g_com[:, None, :]                       # [P,P,3]
    d2 = jnp.sum(d * d, axis=-1)                                    # [P,P]
    eye = jnp.eye(3, dtype=jnp.float32)
    # parallel-axis term per (group-rep p, member q)
    pa = mass[None, :, None, None] * (
        d2[..., None, None] * eye - d[..., :, None] * d[..., None, :]
    )                                                               # [P,P,3,3]
    g_inertia = jnp.einsum("pq,qij->pij", member, I_w) + jnp.sum(
        member[..., None, None] * pa, axis=1
    )
    g_inv_mass = 1.0 / g_mass
    g_inv_inertia = _inv3(g_inertia + 1e-8 * eye)
    return member, g_com, g_inv_mass, g_inv_inertia


# warm-start normal-impulse cap, in acceleration units (m/s²): ~20 g, so a
# persistent contact can warm-start with well above its share of the weight
# impulse, while one-substep impact spikes are discarded (see _solve_contacts)
WARM_CAP_ACC = 200.0


def _tangent_basis(n):
    """Orthonormal (t1, t2) perpendicular to n (branch-free)."""
    ref = jnp.where(
        jnp.abs(n[..., 2:3]) < 0.9,
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    t1 = T.unit(jnp.cross(n, ref))
    t2 = jnp.cross(n, t1)
    return t1, t2


def _solve_contacts(
    c: Contacts,
    group,
    g_com,
    g_inv_mass,
    g_inv_inertia,
    lin_vel,
    ang_vel,
    dt,
    iters: int,
    relaxation: float,
    baumgarte: float,
    slop: float,
    return_impulses: bool = False,
    min_normal=None,
    lam0=None,
    return_lam: bool = False,
    warm_cap=None,
):
    """Impulse-accumulating Jacobi solve; returns updated group velocities.

    Jacobi (not Gauss-Seidel) so every contact lane updates in parallel on
    the VPU; under-relaxation keeps it convergent.

    ``min_normal`` [K] (optional): per-lane normal-impulse floor (kept as a
    general solver feature; the finger squeeze that originally used it now
    goes through the prescribed press velocity, ``SimConfig.grip_press_vel``).

    ``lam0`` [K,3] (optional): warm-start impulses, normally the previous
    substep's converged ``lam`` (contact lanes are static, so the manifold
    changes little across a 2 ms substep). Warm-starting halves the
    iteration count needed for a given solution quality — the standard
    impulse-solver optimization; ``return_lam`` returns the converged
    ``lam`` for the next substep's warm start.
    """
    K = c.depth.shape[0]
    P = group.shape[0]
    valid = c.mask & (c.depth > -slop)
    fmask = valid.astype(jnp.float32)
    lam_floor = (
        jnp.zeros((K,), jnp.float32)
        if min_normal is None
        else min_normal * fmask
    )

    has_b = c.part_b >= 0
    pb_safe = jnp.where(has_b, c.part_b, 0)

    # contact lanes have *static* part assignment: gather part-level
    # quantities through constant one-hot matmuls (TPU gathers with a batch
    # dim lower poorly; these fold into batched matmuls on the MXU)
    oa = jax.nn.one_hot(c.part_a, P, dtype=jnp.float32)              # [K,P] const
    ob = jax.nn.one_hot(pb_safe, P, dtype=jnp.float32) * has_b[:, None].astype(
        jnp.float32
    )

    r_a = c.point - oa @ g_com                                       # [K,3]
    r_b = c.point - (jax.nn.one_hot(pb_safe, P, dtype=jnp.float32) @ g_com)

    inv_m_a = oa @ g_inv_mass
    inv_m_b = ob @ g_inv_mass
    inv_I_a = jnp.einsum("kp,pij->kij", oa, g_inv_inertia)           # [K,3,3]
    inv_I_b = jnp.einsum("kp,pij->kij", ob, g_inv_inertia)

    t1, t2 = _tangent_basis(c.normal)
    dirs = jnp.stack([c.normal, t1, t2], axis=1)                     # [K,3dir,3]

    # effective mass per direction; quadratic forms written as explicit
    # broadcast-mul-sums (3-operand einsums over tiny inner dims lower
    # catastrophically on TPU — measured ~10x slower)
    rxd_a = jnp.cross(r_a[:, None, :], dirs)                         # [K,3,3]
    rxd_b = jnp.cross(r_b[:, None, :], dirs)

    def quad(rxd, inv_I):
        # (rxd)ᵀ I⁻¹ (rxd) per direction: [K,d,3],[K,3,3] -> [K,d]
        t = jnp.sum(inv_I[:, None, :, :] * rxd[:, :, None, :], axis=-1)
        return jnp.sum(rxd * t, axis=-1)

    w = (
        inv_m_a[:, None]
        + inv_m_b[:, None]
        + quad(rxd_a, inv_I_a)
        + quad(rxd_b, inv_I_b)
    )                                                                # [K,3]
    inv_w = 1.0 / jnp.maximum(w, 1e-8)

    # depenetration velocity clamped (max_depenetration_velocity analogue):
    # deep overlaps (teleports, kinematic-finger squeezes) must not inject
    # unbounded energy
    # per-lane Baumgarte from the geom pair's solref (collide.solref_beta);
    # `baumgarte` (the config cap) is already folded into c.beta
    bias = -jnp.minimum(
        (c.beta / dt) * jnp.maximum(c.depth - slop, 0.0), 0.5
    )                                                                # [K]

    # membership scatter matrices (group of part_a / part_b -> all member parts)
    mem_a = (group[c.part_a][:, None] == group[None, :]).astype(jnp.float32)  # [K,P]
    mem_b = (
        (group[pb_safe][:, None] == group[None, :]) & has_b[:, None]
    ).astype(jnp.float32)

    # mass splitting: Jacobi diverges when one body carries n redundant
    # active lanes and every lane applies a full correction (growth factor
    # ~ n·relaxation per sweep). Scale each lane's update by 1/n of the most
    # contended side, which makes the sweep contractive for any lane count.
    cnt_p = fmask @ (mem_a + mem_b)                                  # [P]
    n_a = oa @ cnt_p
    n_b = ob @ cnt_p
    lane_scale = relaxation / jnp.maximum(jnp.maximum(n_a, n_b), 1.0)  # [K]

    def apply(lam):                                                  # lam [K,3]
        imp = jnp.sum(lam[:, :, None] * dirs, axis=1) * fmask[:, None]  # [K,3]
        tq_a = jnp.cross(r_a, imp)
        tq_b = jnp.cross(r_b, -imp)
        dlin = (mem_a - mem_b).T @ imp * g_inv_mass[:, None]         # [P,3]
        ang_acc = mem_a.T @ tq_a + mem_b.T @ tq_b                    # [P,3]
        dang = jnp.sum(g_inv_inertia * ang_acc[:, None, :], axis=-1)
        return lin_vel + dlin, ang_vel + dang

    def body(_, lam):
        lv, av = apply(lam)
        va = oa @ lv + jnp.cross(oa @ av, r_a)
        # kinematic lanes (part_b = -1) have ob = 0 rows; their b-side motion
        # is the prescribed vel_b (robot gripper surface velocity)
        vb = ob @ lv + jnp.cross(ob @ av, r_b) + c.vel_b
        v_rel = va - vb                                              # [K,3]
        vd = jnp.einsum("ki,kdi->kd", v_rel, dirs)                   # [K,3]
        target = jnp.stack([vd[:, 0] + bias, vd[:, 1], vd[:, 2]], -1)
        dlam = -target * inv_w * lane_scale[:, None]
        lam_new = lam + dlam
        # clamp: normal >= squeeze floor (0 on non-finger lanes); friction
        # cone |t| <= mu * n
        ln = jnp.maximum(lam_new[:, 0], lam_floor)
        max_f = c.friction * ln
        lt = jnp.clip(lam_new[:, 1:], -max_f[:, None], max_f[:, None])
        return jnp.concatenate([ln[:, None], lt], axis=-1)

    if lam0 is None:
        init = jnp.zeros((K, 3), jnp.float32)
    else:
        # cap the warm start at a resting-contact scale (~20x the weight
        # impulse, WARM_CAP_ACC·m_eff·dt): a stale IMPACT impulse re-applied
        # as the initial guess launches the part, and the under-relaxed
        # Jacobi sweep cannot unwind a large overshoot within `iters`.
        # ``warm_cap`` overrides the acceleration scale per lane (robot
        # kinematic-finger lanes use a 10x tighter cap — see envs/arm).
        acc = WARM_CAP_ACC if warm_cap is None else warm_cap
        cap = acc * inv_w[:, 0] * dt
        ln0 = jnp.minimum(lam0[:, 0], cap)
        mf0 = c.friction[:, None] * ln0[:, None]
        init = jnp.concatenate(
            [ln0[:, None], jnp.clip(lam0[:, 1:], -mf0, mf0)], axis=-1
        )
    lam = jax.lax.fori_loop(0, iters, body, init)
    lv, av = apply(lam)
    out = (lv, av)
    if return_impulses:
        imp = jnp.sum(lam[:, :, None] * dirs, axis=1) * fmask[:, None]  # [K,3]
        out = out + (imp,)
    if return_lam:
        out = out + (lam,)
    return out


def _integrate(state: PartState, member, g_com, dt):
    """Rigid group motion: rotate members about the group COM, translate."""
    w = state.ang_vel                                                # [P,3]
    # smoothed norm: differentiable at w = 0 (iLQR linearizes through this)
    angle = jnp.sqrt(jnp.sum(w * w, axis=-1) + 1e-18)
    axis = w / angle[..., None]
    dq = T.quat_from_axis_angle(axis, angle * dt)                    # [P,4]
    rel = state.pos - g_com
    new_pos = g_com + T.quat_rotate(dq, rel) + state.lin_vel * dt
    new_quat = T.quat_normalize(T.quat_mul(dq, state.quat))
    return state._replace(pos=new_pos, quat=new_quat)


def _floor_projection(model_np, state: PartState, member, slop):
    """Position-level correction: push groups up so no corner is below z=0.

    The velocity-level Baumgarte handles gradual load; this hard projection
    prevents tunneling after teleports (cursor moves, connect snaps)."""
    contacts = floor_contacts(model_np, state.pos, state.quat, slop)
    pen = jnp.where(contacts.mask, contacts.depth - slop, 0.0)
    pen = jnp.maximum(pen, 0.0)
    # max penetration per part (static corner->part one-hot, no scatter),
    # then per group
    assign = jnp.asarray(model_np["_floor_assign"])                  # [P,G*8]
    per_part = jnp.max(jnp.where(assign, pen[None, :], 0.0), axis=1)
    per_group = jnp.max(member * per_part[None, :], axis=1)          # [P]
    lift = jnp.zeros_like(state.pos).at[:, 2].set(per_group)
    return state._replace(pos=state.pos + lift)


def make_substep(model_np, cfg_sim):
    """Build the single-substep function (closed over static model arrays).

    ``extra_contacts`` (optional) is a prebuilt :class:`Contacts` set appended
    to the floor/pair sets — used by arm envs to inject robot-gripper
    kinematic contacts (``collide.robot_contacts``).
    """
    from .collide import attach_betas

    attach_betas(model_np, cfg_sim)
    dt = cfg_sim.timestep
    gvec = jnp.array([0.0, 0.0, cfg_sim.gravity], jnp.float32)

    # "lane" selects the legacy per-env Pallas lane solver; the batched
    # whole-step megakernel (physics/megakernel.py) is dispatched at the env
    # step_batch level, not here
    if cfg_sim.use_pallas == "lane":
        from .pallas_solver import solve_contacts_pallas as solver
    else:
        solver = _solve_contacts

    def substep(
        state: PartState,
        group,
        gravity_scale,
        extra_contacts=None,
        return_extra_impulses=False,
        extra_min_normal=None,
        lam_warm=None,
        return_lam=False,
    ):
        member, g_com, g_inv_mass, g_inv_inertia = _group_aggregates(
            model_np, state, group
        )
        # gravity on group: all members share the group's gravity scale
        lin_vel = state.lin_vel + dt * gvec[None, :] * gravity_scale[:, None]

        fc = floor_contacts(model_np, state.pos, state.quat, cfg_sim.contact_slop)
        pc = pair_contacts(
            model_np, state.pos, state.quat, group, cfg_sim.contact_slop
        )
        # SAT edge/face lane for pairs whose corner manifold is empty
        # (leaning/crossing parts, collide.edge_contacts)
        NPp = len(model_np["_pairs"])
        if NPp:
            ch = (
                pc.mask[: NPp * 8].reshape(NPp, 8).any(-1)
                | pc.mask[NPp * 8 :].reshape(NPp, 8).any(-1)
            )
            ec = edge_contacts(
                model_np, state.pos, state.quat, group,
                cfg_sim.contact_slop, corner_hit=ch,
            )
            pc = concat_contacts(pc, ec)
        contacts = concat_contacts(fc, pc)
        n_base = contacts.depth.shape[0]
        if extra_contacts is not None:
            contacts = concat_contacts(contacts, extra_contacts)

        kwargs = {}
        if return_extra_impulses:
            kwargs["return_impulses"] = True
        if extra_min_normal is not None:
            # pad zeros for the base (floor/pair/edge) lanes
            kwargs["min_normal"] = jnp.concatenate(
                [jnp.zeros((n_base,), jnp.float32), extra_min_normal]
            )
        if lam_warm is not None:
            kwargs["lam0"] = lam_warm
            if extra_contacts is not None:
                # robot kinematic-finger lanes: 10x tighter warm-start cap
                # (see the lam0 cap note in _solve_contacts)
                n_extra = extra_contacts.depth.shape[0]
                kwargs["warm_cap"] = jnp.concatenate(
                    [
                        jnp.full((n_base,), WARM_CAP_ACC, jnp.float32),
                        jnp.full((n_extra,), WARM_CAP_ACC * 0.15, jnp.float32),
                    ]
                )
        if return_lam:
            kwargs["return_lam"] = True
        # the legacy lane solver takes none of the extended features; fall
        # back to the XLA solve when any is requested
        solve = _solve_contacts if kwargs else solver
        out = solve(
            contacts,
            group,
            g_com,
            g_inv_mass,
            g_inv_inertia,
            lin_vel,
            state.ang_vel,
            dt,
            cfg_sim.solver_iters,
            cfg_sim.relaxation,
            cfg_sim.baumgarte,
            cfg_sim.contact_slop,
            **kwargs,
        )
        lv, av = out[0], out[1]
        # safety velocity clamp (the reference catches MuJoCo instability
        # exceptions and resets, env/furniture.py:2889-2897; we bound energy
        # instead so lanes never NaN)
        lv = jnp.clip(lv, -cfg_sim.max_velocity, cfg_sim.max_velocity)
        av = jnp.clip(av, -cfg_sim.max_velocity, cfg_sim.max_velocity)
        state = state._replace(lin_vel=lv, ang_vel=av)
        state = _integrate(state, member, g_com, dt)
        state = _floor_projection(model_np, state, member, cfg_sim.contact_slop)
        ret = (state,)
        if return_extra_impulses:
            ret = ret + (out[2][n_base:],)
        if return_lam:
            ret = ret + (out[-1],)
        return ret if len(ret) > 1 else state

    # static lane counts so callers can allocate warm-start buffers:
    # 8 floor lanes per geom + 16 vertex + 1 SAT edge lane per pair
    substep.n_base_lanes = 8 * len(model_np["geom_part"]) + 17 * len(
        model_np["_pairs"]
    )
    # the legacy lane backend takes no lam0; substeps() skips warm-starting
    substep.supports_warm = cfg_sim.use_pallas != "lane"
    return substep


def substeps(substep_fn, state: PartState, group, gravity_scale, n: int):
    """Run ``n`` physics substeps under ``lax.scan`` (static count).

    When ``substep_fn`` is a :func:`make_substep` product (exposes
    ``n_base_lanes``), the converged contact impulses are carried across
    substeps as the next substep's warm start — the standard impulse-solver
    optimization (lanes are static; the manifold changes little per 2 ms
    substep), which lets ``SimConfig.solver_iters`` stay low."""
    nl = getattr(substep_fn, "n_base_lanes", None)
    if nl is None or not getattr(substep_fn, "supports_warm", False):
        def body(s, _):
            return substep_fn(s, group, gravity_scale), None

        out, _ = jax.lax.scan(body, state, None, length=n)
        return out

    def body(carry, _):
        s, lam = carry
        s, lam = substep_fn(
            s, group, gravity_scale, lam_warm=lam, return_lam=True
        )
        return (s, lam), None

    lam0 = jnp.zeros((nl, 3), jnp.float32)
    (out, _), _ = jax.lax.scan(body, (state, lam0), None, length=n)
    return out


def control_step(substep_fn, state: PartState, group, held, n_substeps: int):
    """One environment control step of free-part physics, reference semantics
    (``env/furniture.py:2857-2887``): all part velocities are zeroed, held
    groups get gravity compensation, then ``n_substeps`` integration steps.
    """
    state = state._replace(
        lin_vel=jnp.zeros_like(state.lin_vel),
        ang_vel=jnp.zeros_like(state.ang_vel),
    )
    gravity_scale = jnp.where(held, 0.0, 1.0)
    state = substeps(substep_fn, state, group, gravity_scale, n_substeps)
    # held groups re-stopped after the loop (env/furniture.py:2883-2887)
    hold3 = held[:, None]
    state = state._replace(
        lin_vel=jnp.where(hold3, 0.0, state.lin_vel),
        ang_vel=jnp.where(hold3, 0.0, state.ang_vel),
    )
    return state


def physics_tables(model) -> dict:
    """All static numpy tables the engine needs, derived from CompiledModel."""
    from .collide import precompute_collision_tables

    out = precompute_collision_tables(model)
    out["geom_solref"] = np.asarray(model.geom_solref, dtype=np.float32)
    out["part_mass"] = np.asarray(model.part_mass, dtype=np.float32)
    out["part_com"] = np.asarray(model.part_com, dtype=np.float32)
    out["part_inertia"] = np.asarray(model.part_inertia, dtype=np.float32)
    return out


def robot_contact_tables(tables: dict, robot, lane_budget: int = 1700) -> dict:
    """Static tables for robot↔part contact coupling.

    Pairs every gripper-side robot geom (``CompiledRobot.hand_geoms``) with
    every part collision geom, plus the per-lane robot-geom map used for
    finger-touch detection (reference finger-contact scan,
    ``env/furniture.py:1290-1330``).

    Sample sets are PER ROBOT GEOM: finger geoms always keep the dense
    15-point set (corners + face centers + center — face-center fingertip
    contacts are the case the set exists for, on every agent including
    bimanual Baxter), while non-finger hand geoms (gripper bases/palms)
    drop to the 8-corner set when the dense-everywhere total would exceed
    ``lane_budget`` (the arm megakernel's VMEM working set scales with the
    lane count). Lanes are emitted as FLAT per-lane tables (``_rl_*``):
    side 1 (part-geom sample points vs robot box) first, then side 2
    (robot-geom sample points vs part box), each pair contributing its own
    sample count. Both the XLA narrow phase (``collide.robot_contacts``)
    and the Pallas kernel read these tables, so the two paths stay
    bit-identical.
    """
    from .collide import _CORNER_SIGNS, _SAMPLE_SIGNS15

    hand = np.flatnonzero(robot.hand_geoms)
    finger = set()
    for arm in robot.arms:
        finger |= set(np.asarray(robot.finger_geoms_l[arm]).tolist())
        finger |= set(np.asarray(robot.finger_geoms_r[arm]).tolist())
    part_geoms = np.arange(len(tables["geom_part"]))
    pairs = np.array(
        [(r, p) for r in hand for p in part_geoms], dtype=np.int32
    ).reshape(-1, 2)
    names = list(getattr(robot, "geom_names", [])) or [""] * (
        int(hand.max()) + 1 if len(hand) else 0
    )
    tip = {int(g) for g in hand if "fingertip" in names[int(g)]}
    k_base = 8 * len(tables["geom_part"]) + 17 * len(tables["_pairs"])

    def k_total(ns):
        return k_base + 2 * int(ns.sum())

    # tiered densification under the budget: all geoms dense if it fits,
    # else all finger geoms dense, else fingertips only (the face-center
    # fingertip contact is the case the 15-point set exists for)
    tiers = [
        np.full(len(pairs), 15, np.int32),
        np.array([15 if int(r) in finger else 8 for r, _ in pairs], np.int32),
        np.array([15 if int(r) in tip else 8 for r, _ in pairs], np.int32),
        np.full(len(pairs), 8, np.int32),
    ]
    ns_pair = tiers[-1]
    for t in tiers:
        if k_total(t) <= lane_budget:
            ns_pair = t
            break
    s15 = np.asarray(_SAMPLE_SIGNS15, np.float32)
    s8 = np.asarray(_CORNER_SIGNS, np.float32)

    rl_pair, rl_rgeom, rl_pgeom, rl_sign = [], [], [], []
    for i, (r, p) in enumerate(pairs):
        s = s15 if ns_pair[i] == 15 else s8
        rl_pair.append(np.full(len(s), i, np.int32))
        rl_rgeom.append(np.full(len(s), r, np.int32))
        rl_pgeom.append(np.full(len(s), p, np.int32))
        rl_sign.append(s)
    if pairs.size:
        rl_pair = np.concatenate(rl_pair)
        rl_rgeom = np.concatenate(rl_rgeom)
        rl_pgeom = np.concatenate(rl_pgeom)
        rl_sign = np.concatenate(rl_sign, axis=0)
    else:
        rl_pair = np.zeros(0, np.int32)
        rl_rgeom = np.zeros(0, np.int32)
        rl_pgeom = np.zeros(0, np.int32)
        rl_sign = np.zeros((0, 3), np.float32)
    # both sides share the per-pair sample layout
    lane_rgeom = np.concatenate([rl_rgeom, rl_rgeom])
    return {
        "_robot_pairs": pairs,
        "_rl_pair": rl_pair,       # [L] pair index per side lane
        "_rl_rgeom": rl_rgeom,     # [L] robot geom per side lane
        "_rl_pgeom": rl_pgeom,     # [L] part geom per side lane
        "_rl_sign": rl_sign,       # [L,3] sample sign vector
        "_lane_rgeom": lane_rgeom,  # [2L] robot geom per total lane
        "robot_np": {
            "_box_sizes": np.asarray(robot.geom_size, dtype=np.float32),
            "geom_friction": np.asarray(robot.geom_friction, dtype=np.float32),
            "geom_solref": np.asarray(robot.geom_solref, dtype=np.float32),
        },
    }
