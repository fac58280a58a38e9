"""Vectorized collision detection for part collision prims.

Static-shape contact generation (the ``nconmax`` analogue of the reference's
``base.xml:5``): every potential contact has a fixed lane and a validity mask.

Narrow phase:
* geom vs floor plane: the geom's 8 box corners (spheres/cylinders use their
  bounding box — exact for the resting face cases that dominate here)
* geom vs geom: vertex-in-box tests both ways (8+8 candidate points/pair);
  face-vertex contacts are the dominant regime for flat-pack furniture parts
* geom vs geom edge-edge: one SAT lane per pair (``edge_contacts``) covering
  the crossing-edge regime the vertex tests miss (e.g. a leaning part whose
  edge rests on another box's edge).

All functions are per-env and ``vmap``-batched by the caller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import transforms as T

_CORNER_SIGNS = np.array(
    [
        [sx, sy, sz]
        for sx in (-1.0, 1.0)
        for sy in (-1.0, 1.0)
        for sz in (-1.0, 1.0)
    ]
)  # [8,3]

# corners + 6 face centers + box center: the denser sample set used for
# gripper↔part contacts, where edge-edge and face-center configurations
# (a rotated fingertip pad pressing a flat part face) dominate and pure
# vertex-in-box manifolds lose contact
_SAMPLE_SIGNS15 = np.concatenate(
    [
        _CORNER_SIGNS,
        np.array(
            [
                [1.0, 0, 0], [-1.0, 0, 0],
                [0, 1.0, 0], [0, -1.0, 0],
                [0, 0, 1.0], [0, 0, -1.0],
                [0.0, 0, 0],
            ]
        ),
    ]
)  # [15,3]


class Contacts(NamedTuple):
    """A fixed-capacity contact set (one env).

    ``vel_b`` is the prescribed world velocity of the b side at the contact
    point for kinematic colliders (robot gripper geoms, ``part_b == -1``);
    zero for floor and part-part lanes. ``beta`` is the per-lane
    position-correction fraction derived from the geom pair's MuJoCo
    ``solref`` (see :func:`solref_beta`)."""

    point: jax.Array    # [K,3] world position
    normal: jax.Array   # [K,3] world normal (a -> b: pushes a along +n)
    depth: jax.Array    # [K] penetration (>0 means overlapping)
    part_a: jax.Array   # [K] part index
    part_b: jax.Array   # [K] part index, -1 = static world (floor/robot)
    friction: jax.Array  # [K]
    mask: jax.Array     # [K] bool
    vel_b: jax.Array    # [K,3] prescribed b-side velocity (kinematic lanes)
    beta: jax.Array     # [K] per-lane Baumgarte fraction (solref-derived)


# MuJoCo default solref for geoms that do not set one (robot bases etc.)
_DEFAULT_SOLREF = np.array([0.02, 1.0], np.float32)
# the reference FloorArena plane (assets/arenas/floor_arena.xml) keeps it
_FLOOR_SOLREF = np.array([0.02, 1.0], np.float32)


def solref_beta(solref_a, solref_b, dt: float, cap: float) -> np.ndarray:
    """Per-pair position-correction fraction from MuJoCo ``solref``.

    MuJoCo's soft constraint (solref = (timeconst τ, dampratio ζ), reference
    ``base.xml:4`` + per-geom overrides like ``solref="0.001 1"`` in the
    furniture XMLs) corrects penetration with time constant ~τζ. The
    discrete-time Baumgarte analogue corrects a fraction β ≈ dt/(τζ) of the
    penetration per substep; β is clamped at ``cap`` (``SimConfig.baumgarte``),
    the stability limit of the mass-split Jacobi sweep. Pair mixing is the
    elementwise mean — MuJoCo's default equal-``solmix`` rule.

    Note on the shipped assets: every furniture geom is stiffer than the cap
    (τζ ≤ 0.003 < dt/cap), so part-part lanes all saturate at ``cap``; the
    softer robot/floor geoms (τζ = 0.02) pull their mixed lanes slightly
    below it.
    """
    sr = 0.5 * (np.asarray(solref_a, np.float64) + np.asarray(solref_b, np.float64))
    tz = np.maximum(sr[..., 0] * np.maximum(sr[..., 1], 1e-3), 1e-6)
    return np.minimum(cap, dt / tz).astype(np.float32)


def attach_betas(model_np: dict, cfg_sim) -> None:
    """Precompute per-lane solref betas into the tables dict (idempotent).

    Adds ``_floor_beta [G]``, ``_pair_beta [NP]`` and (when robot pairs are
    present) ``_robot_beta [NPr]``.
    """
    key = (float(cfg_sim.timestep), float(cfg_sim.baumgarte))
    if model_np.get("_beta_key") == key:
        return
    dt, cap = key
    sr = np.asarray(
        model_np.get(
            "geom_solref",
            np.tile(_DEFAULT_SOLREF, (len(model_np["geom_part"]), 1)),
        ),
        np.float64,
    )
    model_np["_floor_beta"] = solref_beta(sr, _FLOOR_SOLREF[None], dt, cap)
    pairs = model_np["_pairs"]
    if len(pairs):
        model_np["_pair_beta"] = solref_beta(
            sr[pairs[:, 0]], sr[pairs[:, 1]], dt, cap
        )
    else:
        model_np["_pair_beta"] = np.zeros(0, np.float32)
    rpairs = model_np.get("_robot_pairs")
    if rpairs is not None and len(rpairs):
        rsr = np.asarray(
            model_np["robot_np"].get(
                "geom_solref",
                np.tile(_DEFAULT_SOLREF, (int(rpairs[:, 0].max()) + 1, 1)),
            ),
            np.float64,
        )
        model_np["_robot_beta"] = solref_beta(
            sr[rpairs[:, 1]], rsr[rpairs[:, 0]], dt, cap
        )
    model_np["_beta_key"] = key


def _geom_world(model_np, state_pos, state_quat):
    """World pose of every collision geom: part pose ∘ geom offset."""
    gp = jnp.asarray(model_np["geom_pos"], jnp.float32)
    gq = jnp.asarray(model_np["geom_quat"], jnp.float32)
    part = model_np["geom_part"]
    ppos = state_pos[part]
    pquat = state_quat[part]
    wpos = ppos + T.quat_rotate(pquat, gp)
    wquat = T.quat_mul(pquat, gq)
    return wpos, wquat


def geom_box_sizes(model_np) -> np.ndarray:
    """Effective box half-extents per geom (sphere r,r,r; cylinder r,r,h).

    Cylinder geoms store MuJoCo ``size = (radius, half-length)``; the box
    rep is (r, r, half-length) — the half-length moves to z BEFORE the
    radius overwrites slot 1 (a prior version dropped it, leaving every
    cylinder a zero-thickness disk that never collided: the swivel-chair
    column could not be grasped at its recorded demo states)."""
    size = np.array(model_np["geom_size"], dtype=np.float32).copy()
    gtype = np.asarray(model_np["geom_type"])
    sphere = gtype == 1
    size[sphere, 1] = size[sphere, 0]
    size[sphere, 2] = size[sphere, 0]
    cyl = gtype == 2
    size[cyl, 2] = size[cyl, 1]
    size[cyl, 1] = size[cyl, 0]
    return size


def floor_contacts(model_np, pos, quat, slop: float) -> Contacts:
    """Corners of every collision geom vs the floor plane z=0.

    The floor is the reference's ``FloorArena`` plane with friction 2.0
    (``env/furniture.py:1971-1977``).
    """
    G = len(model_np["geom_part"])
    sizes = jnp.asarray(model_np["_box_sizes"], jnp.float32)  # [G,3]
    wpos, wquat = _geom_world(model_np, pos, quat)
    corners_local = jnp.asarray(_CORNER_SIGNS, jnp.float32)[None] * sizes[:, None]  # [G,8,3]
    cw = wpos[:, None] + T.quat_rotate(wquat[:, None], corners_local)  # [G,8,3]
    cw = cw.reshape(G * 8, 3)
    depth = -cw[:, 2]
    mask = depth > -slop
    part = jnp.asarray(np.repeat(model_np["geom_part"], 8))
    fric = jnp.asarray(np.repeat(model_np["_floor_friction"], 8), jnp.float32)
    n = jnp.zeros_like(cw).at[:, 2].set(1.0)
    return Contacts(
        point=cw,
        normal=n,
        depth=depth,
        part_a=part,
        part_b=jnp.full((G * 8,), -1, dtype=jnp.int32),
        friction=fric,
        mask=mask,
        vel_b=jnp.zeros_like(cw),
        beta=jnp.asarray(np.repeat(model_np["_floor_beta"], 8), jnp.float32),
    )


def pair_contacts(model_np, pos, quat, group, slop: float) -> Contacts:
    """Vertex-in-box contacts for all precompiled cross-part geom pairs.

    ``group`` masks out pairs whose parts were welded into the same rigid
    group (the reference's collision-bitmask rewrite on connect,
    ``env/furniture.py:866-878``, reduces to exactly this predicate).
    """
    pairs = model_np["_pairs"]  # [NP,2] geom index pairs, precomputed
    NP = len(pairs)
    if NP == 0:
        z3 = jnp.zeros((0, 3), jnp.float32)
        z = jnp.zeros((0,), jnp.float32)
        zi = jnp.zeros((0,), jnp.int32)
        return Contacts(z3, z3, z, zi, zi, z, jnp.zeros((0,), bool), z3, z)

    sizes = jnp.asarray(model_np["_box_sizes"], jnp.float32)
    gpart = jnp.asarray(model_np["geom_part"])
    wpos, wquat = _geom_world(model_np, pos, quat)
    fric = jnp.asarray(model_np["geom_friction"], jnp.float32)

    ga = jnp.asarray(pairs[:, 0])
    gb = jnp.asarray(pairs[:, 1])

    def verts_in_box(g_src, g_dst):
        """Corners of g_src tested against box g_dst. Returns per-pair 8 pts."""
        sz_s = sizes[g_src]                                    # [NP,3]
        corners = jnp.asarray(_CORNER_SIGNS, jnp.float32)[None] * sz_s[:, None]
        cw = wpos[g_src][:, None] + T.quat_rotate(wquat[g_src][:, None], corners)
        # express in dst box frame
        inv_q = T.quat_inv(wquat[g_dst])
        local = T.quat_rotate(inv_q[:, None], cw - wpos[g_dst][:, None])  # [NP,8,3]
        sz_d = sizes[g_dst][:, None]                           # [NP,1,3]
        # per-axis penetration (positive inside)
        pen = sz_d - jnp.abs(local)                            # [NP,8,3]
        inside = jnp.all(pen > -slop, axis=-1)                 # [NP,8]
        ax = jnp.argmin(pen, axis=-1)                          # [NP,8] min-pen axis
        depth = jnp.min(pen, axis=-1)                          # [NP,8]
        # normal: dst-box face axis, pointing from dst toward src corner side
        sign = jnp.sign(jnp.take_along_axis(local, ax[..., None], -1))[..., 0]
        n_local = jax.nn.one_hot(ax, 3, dtype=cw.dtype) * sign[..., None]
        n_world = T.quat_rotate(wquat[g_dst][:, None], n_local)
        return cw, n_world, depth, inside

    # corners of A in B: normal pushes A out of B (normal on A = +n_world)
    cw_ab, n_ab, d_ab, in_ab = verts_in_box(ga, gb)
    # corners of B in A: normal from A's face pushes B (the lane's part_a —
    # the corner owner) out of A, so it is used unflipped
    cw_ba, n_ba, d_ba, in_ba = verts_in_box(gb, ga)

    point = jnp.concatenate([cw_ab.reshape(-1, 3), cw_ba.reshape(-1, 3)])
    normal = jnp.concatenate([n_ab.reshape(-1, 3), n_ba.reshape(-1, 3)])
    depth = jnp.concatenate([d_ab.reshape(-1), d_ba.reshape(-1)])
    inside = jnp.concatenate([in_ab.reshape(-1), in_ba.reshape(-1)])

    pa = jnp.concatenate([jnp.repeat(gpart[ga], 8), jnp.repeat(gpart[gb], 8)])
    pb = jnp.concatenate([jnp.repeat(gpart[gb], 8), jnp.repeat(gpart[ga], 8)])
    pair_fric = jnp.maximum(fric[ga], fric[gb])
    fr = jnp.concatenate([jnp.repeat(pair_fric, 8), jnp.repeat(pair_fric, 8)])

    same_group = group[pa] == group[pb]
    mask = inside & ~same_group
    beta = jnp.asarray(
        np.concatenate([np.repeat(model_np["_pair_beta"], 8)] * 2), jnp.float32
    )
    return Contacts(
        point, normal, depth, pa, pb, fr, mask, jnp.zeros_like(point), beta
    )


def concat_contacts(a: Contacts, b: Contacts) -> Contacts:
    return Contacts(*(jnp.concatenate([x, y]) for x, y in zip(a, b)))


def edge_contacts(
    model_np, pos, quat, group, slop: float, corner_hit=None
) -> Contacts:
    """SAT box-box contact, one lane per precompiled geom pair, emitted
    only where the corner manifold came up empty.

    The vertex-in-box manifolds of :func:`pair_contacts` miss edge-edge
    configurations (two boxes crossing with no corner inside the other —
    a part leaning across another's edge). MuJoCo's box-box narrow phase
    emits these from its full SAT; here all 15 SAT axes (6 face + 9 edge
    cross) are tested per pair, and when the boxes intersect but no corner
    lane fired (``corner_hit`` [NP] bool from :func:`pair_contacts`), one
    contact is emitted on the minimum-overlap axis at the midpoint of the
    closest points of the two supporting edges.
    """
    pairs = model_np["_pairs"]
    NP = len(pairs)
    if NP == 0:
        z3 = jnp.zeros((0, 3), jnp.float32)
        z = jnp.zeros((0,), jnp.float32)
        zi = jnp.zeros((0,), jnp.int32)
        return Contacts(z3, z3, z, zi, zi, z, jnp.zeros((0,), bool), z3, z)

    sizes = jnp.asarray(model_np["_box_sizes"], jnp.float32)
    gpart = jnp.asarray(model_np["geom_part"])
    wpos, wquat = _geom_world(model_np, pos, quat)
    fric = jnp.asarray(model_np["geom_friction"], jnp.float32)

    ga = jnp.asarray(pairs[:, 0])
    gb = jnp.asarray(pairs[:, 1])
    Ra = T.quat_to_mat(wquat[ga])                     # [NP,3,3] cols = axes
    Rb = T.quat_to_mat(wquat[gb])
    Sa = sizes[ga]                                    # [NP,3]
    Sb = sizes[gb]
    ca = wpos[ga]
    cb = wpos[gb]
    t = cb - ca                                       # [NP,3]

    a_ax = jnp.swapaxes(Ra, 1, 2)                     # [NP,3(axis),3(world)]
    b_ax = jnp.swapaxes(Rb, 1, 2)

    # face-axis overlaps (the 6 of the 15 SAT axes the corner lanes cover)
    dotAB = jnp.einsum("pid,pjd->pij", a_ax, b_ax)    # [NP,3,3] a_i·b_j
    absAB = jnp.abs(dotAB)
    ta = jnp.einsum("pd,pid->pi", t, a_ax)            # t·a_i
    tb = jnp.einsum("pd,pjd->pj", t, b_ax)
    ov_a = Sa + jnp.einsum("pj,pij->pi", Sb, absAB) - jnp.abs(ta)   # [NP,3]
    ov_b = jnp.einsum("pi,pij->pj", Sa, absAB) + Sb - jnp.abs(tb)
    face_min = jnp.minimum(ov_a.min(-1), ov_b.min(-1))               # [NP]

    # 9 cross axes n_ij = a_i x b_j
    n = jnp.cross(a_ax[:, :, None, :], b_ax[:, None, :, :])          # [NP,3,3,3]
    n_len = jnp.linalg.norm(n, axis=-1)
    parallel = n_len < 1e-6
    n_hat = n / jnp.maximum(n_len, 1e-12)[..., None]
    # projection radii: r_A = sum_k Sa_k |a_k·n| (the i-th term vanishes)
    a_dot_n = jnp.einsum("pkd,pijd->pkij", a_ax, n_hat)              # [NP,3,3,3]
    b_dot_n = jnp.einsum("pkd,pijd->pkij", b_ax, n_hat)
    rA = jnp.einsum("pk,pkij->pij", Sa, jnp.abs(a_dot_n))
    rB = jnp.einsum("pk,pkij->pij", Sb, jnp.abs(b_dot_n))
    t_n = jnp.einsum("pd,pijd->pij", t, n_hat)
    ov_e = rA + rB - jnp.abs(t_n)                                    # [NP,3,3]
    # finite sentinel (not inf: inf*0 in the one-hot select below is NaN)
    ov_e = jnp.where(parallel, 1e9, ov_e)

    ov_flat = ov_e.reshape(NP, 9)
    best = jnp.argmin(ov_flat, axis=-1)                              # [NP]
    oh = jax.nn.one_hot(best, 9, dtype=jnp.float32)                  # [NP,9]

    def pick(x):  # [NP,3,3,...] -> [NP,...] select best (i,j)
        flat = x.reshape((NP, 9) + x.shape[3:])
        return jnp.einsum("pn,pn...->p...", oh, flat)

    edge_min = jnp.min(ov_flat, -1)                                  # [NP]
    n_best = pick(n_hat)                                             # [NP,3]
    tn_best = pick(t_n)
    # orient the axis from B toward A: +normal pushes part_a (A) out
    n_edge = jnp.where((tn_best > 0)[:, None], -n_best, n_best)

    # best FACE axis of the 6 (for shallow crossings whose minimal
    # separating axis is a face but no corner is contained)
    ov6 = jnp.concatenate([ov_a, ov_b], -1)                          # [NP,6]
    t6 = jnp.concatenate([ta, tb], -1)
    axes6 = jnp.concatenate([a_ax, b_ax], 1)                         # [NP,6,3]
    bf = jnp.argmin(ov6, -1)
    ohf = jax.nn.one_hot(bf, 6, dtype=jnp.float32)
    n_face_raw = jnp.einsum("pn,pnd->pd", ohf, axes6)
    sgn_f = jnp.sign(jnp.sum(ohf * t6, -1))
    n_face = -sgn_f[:, None] * n_face_raw                            # push A out

    use_face = face_min < edge_min
    n_out = jnp.where(use_face[:, None], n_face, n_edge)
    depth_out = jnp.minimum(face_min, edge_min)

    # supporting edges: direction a_i / b_j of the chosen axis pair
    oh_i = jax.nn.one_hot(best // 3, 3, dtype=jnp.float32)           # [NP,3]
    oh_j = jax.nn.one_hot(best % 3, 3, dtype=jnp.float32)
    d1 = jnp.einsum("pi,pid->pd", oh_i, a_ax)                        # [NP,3]
    d2 = jnp.einsum("pj,pjd->pd", oh_j, b_ax)
    # edge anchor: extreme corner along -n_out for A (A is pushed +n_out,
    # so its contact edge is on its -n_out... sign convention: A's support
    # toward B is along -n_out), +n_out for B
    sgn_a = jnp.sign(jnp.einsum("pkd,pd->pk", a_ax, -n_out))
    sgn_b = jnp.sign(jnp.einsum("pkd,pd->pk", b_ax, n_out))
    off_a = jnp.einsum("pk,pk,pkd->pd", Sa, sgn_a * (1.0 - oh_i), a_ax)
    off_b = jnp.einsum("pk,pk,pkd->pd", Sb, sgn_b * (1.0 - oh_j), b_ax)
    pa0 = ca + off_a
    pb0 = cb + off_b
    # closest points of the two edge lines, clamped to the edge extents
    r12 = pb0 - pa0
    d12 = jnp.sum(d1 * d2, -1)
    denom = jnp.maximum(1.0 - d12 * d12, 1e-9)
    r_d1 = jnp.sum(r12 * d1, -1)
    r_d2 = jnp.sum(r12 * d2, -1)
    s1 = (r_d1 - d12 * r_d2) / denom
    s2 = (d12 * r_d1 - r_d2) / denom
    half1 = jnp.sum(Sa * oh_i, -1)
    half2 = jnp.sum(Sb * oh_j, -1)
    s1 = jnp.clip(s1, -half1, half1)
    s2 = jnp.clip(s2, -half2, half2)
    # NOTE: in the use_face branch the normal/depth come from the best face
    # axis while the point stays the edge closest-point midpoint.  That point
    # can sit slightly off the contacting face in shallow face-dominated
    # crossings, applying a small spurious torque — an accepted approximation:
    # the lane only fires when the 16 vertex lanes found nothing (see the
    # corner_hit gate below), a regime where the crossing is near-degenerate
    # and the midpoint lies within O(slop) of the face.  Keeping one fused
    # point keeps this a single lane in both Pallas kernels.
    point = 0.5 * (pa0 + s1[:, None] * d1 + pb0 + s2[:, None] * d2)

    intersect = (
        jnp.all(ov_a > -slop, -1)
        & jnp.all(ov_b > -slop, -1)
        & (edge_min > -slop)
    )
    pa_part = gpart[ga]
    pb_part = gpart[gb]
    same_group = group[pa_part] == group[pb_part]
    if corner_hit is None:
        corner_hit = jnp.zeros((NP,), bool)
    # fire only where the corner manifold came up empty: co-existing with
    # corner lanes would double-constrain face-dominated configurations
    mask = intersect & ~corner_hit & ~same_group

    pair_fric = jnp.maximum(fric[ga], fric[gb])
    beta = jnp.asarray(model_np["_pair_beta"], jnp.float32)
    return Contacts(
        point=point,
        normal=n_out,
        depth=depth_out,
        part_a=pa_part,
        part_b=pb_part,
        friction=pair_fric,
        mask=mask,
        vel_b=jnp.zeros_like(point),
        beta=beta,
    )


def robot_contacts(
    model_np,
    robot_np,
    pos,
    quat,
    rg_pos,
    rg_quat,
    rg_vel,
    rg_angvel,
    slop: float,
) -> Contacts:
    """Part geoms vs robot gripper geoms (kinematic colliders).

    The robot side is treated as infinitely heavy — the part solver sees a
    prescribed contact-point velocity instead of b-side inverse mass. This is
    the coupling that lets the two-finger friction grasp of the reference
    (``env/furniture.py:1290-1330`` finger-contact scan; MuJoCo solves the
    same contacts two-way) lift and carry parts.

    ``rg_pos/rg_quat`` [RG,3/4]: world poses of robot collision geoms this
    substep; ``rg_vel/rg_angvel`` [RG,3]: world velocity of each geom center
    and its body's angular velocity. Also returns per-lane robot geom ids via
    the static table so envs can detect finger touches.
    """
    rl_rgeom = model_np["_rl_rgeom"]            # [L] robot geom per side lane
    rl_pgeom = model_np["_rl_pgeom"]            # [L] part geom per side lane
    L = len(rl_rgeom)
    if L == 0:
        z3 = jnp.zeros((0, 3), jnp.float32)
        z = jnp.zeros((0,), jnp.float32)
        zi = jnp.zeros((0,), jnp.int32)
        return Contacts(z3, z3, z, zi, zi, z, jnp.zeros((0,), bool), z3, z)

    sizes = jnp.asarray(model_np["_box_sizes"], jnp.float32)
    r_sizes = jnp.asarray(robot_np["_box_sizes"], jnp.float32)
    gpart = jnp.asarray(model_np["geom_part"])
    wpos, wquat = _geom_world(model_np, pos, quat)
    fric = jnp.asarray(model_np["geom_friction"], jnp.float32)
    r_fric = jnp.asarray(robot_np["geom_friction"], jnp.float32)

    rg = jnp.asarray(rl_rgeom)
    pg = jnp.asarray(rl_pgeom)
    # per-lane sample sign vectors (flat tables: finger geoms carry the
    # dense 15-point set, other hand geoms may carry 8 corners —
    # engine.robot_contact_tables)
    signs = jnp.asarray(model_np["_rl_sign"], jnp.float32)      # [L,3]

    # side 1: part-geom sample points inside robot box
    c_p = wpos[pg] + T.quat_rotate(wquat[pg], signs * sizes[pg])  # [L,3]
    inv_rq = T.quat_inv(rg_quat[rg])
    loc_p = T.quat_rotate(inv_rq, c_p - rg_pos[rg])
    pen_p = r_sizes[rg] - jnp.abs(loc_p)
    in_p = jnp.all(pen_p > -slop, axis=-1)
    ax_p = jnp.argmin(pen_p, axis=-1)
    d_p = jnp.min(pen_p, axis=-1)
    sgn_p = jnp.sign(jnp.take_along_axis(loc_p, ax_p[..., None], -1))[..., 0]
    n_p = T.quat_rotate(
        rg_quat[rg],
        jax.nn.one_hot(ax_p, 3, dtype=c_p.dtype) * sgn_p[..., None],
    )                                           # pushes part out of robot box

    # side 2: robot-geom sample points inside part box
    c_r = rg_pos[rg] + T.quat_rotate(rg_quat[rg], signs * r_sizes[rg])
    inv_pq = T.quat_inv(wquat[pg])
    loc_r = T.quat_rotate(inv_pq, c_r - wpos[pg])
    pen_r = sizes[pg] - jnp.abs(loc_r)
    in_r = jnp.all(pen_r > -slop, axis=-1)
    ax_r = jnp.argmin(pen_r, axis=-1)
    d_r = jnp.min(pen_r, axis=-1)
    sgn_r = jnp.sign(jnp.take_along_axis(loc_r, ax_r[..., None], -1))[..., 0]
    # face normal of the part box pushes the robot corner out; flip to act on part
    n_r = -T.quat_rotate(
        wquat[pg],
        jax.nn.one_hot(ax_r, 3, dtype=c_r.dtype) * sgn_r[..., None],
    )

    point = jnp.concatenate([c_p, c_r])
    normal = jnp.concatenate([n_p, n_r])
    depth = jnp.concatenate([d_p, d_r])
    inside = jnp.concatenate([in_p, in_r])

    pa = jnp.concatenate([gpart[pg]] * 2)
    lane_fric = jnp.maximum(fric[pg], r_fric[rg])
    fr = jnp.concatenate([lane_fric] * 2)

    # prescribed velocity of the robot surface at each contact point
    rg2 = jnp.concatenate([rg, rg])
    r = point - rg_pos[rg2]
    vel_b = rg_vel[rg2] + jnp.cross(rg_angvel[rg2], r)

    beta = jnp.asarray(
        np.concatenate([model_np["_robot_beta"][model_np["_rl_pair"]]] * 2),
        jnp.float32,
    )
    return Contacts(
        point,
        normal,
        depth,
        pa,
        jnp.full((2 * L,), -1, dtype=jnp.int32),
        fr,
        inside,
        vel_b,
        beta,
    )


def precompute_collision_tables(model) -> dict:
    """Host-side static tables used by the collision/narrow-phase functions.

    Returns a dict of numpy arrays closed over by the jitted step.
    """
    out = {
        "geom_part": np.asarray(model.geom_part),
        "geom_pos": np.asarray(model.geom_pos, dtype=np.float32),
        "geom_quat": np.asarray(model.geom_quat, dtype=np.float32),
        "geom_size": np.asarray(model.geom_size, dtype=np.float32),
        "geom_type": np.asarray(model.geom_type),
        "geom_friction": np.asarray(model.geom_friction, dtype=np.float32),
    }
    out["_box_sizes"] = geom_box_sizes(out)
    # floor friction: max(geom, floor=2.0) per reference floor setting
    out["_floor_friction"] = np.maximum(out["geom_friction"], 2.0).astype(np.float32)
    # cross-part geom pairs
    gp = out["geom_part"]
    G = len(gp)
    pairs = [
        (i, j) for i in range(G) for j in range(i + 1, G) if gp[i] != gp[j]
    ]
    out["_pairs"] = np.asarray(pairs, dtype=np.int32).reshape(len(pairs), 2)
    # corner-lane -> part one-hot for scatter-free floor projection.
    # Size by n_parts, NOT max(geom_part)+1: a part may carry no collision
    # geoms at all (e.g. chair_agne_0010's part3), and every [P]-shaped
    # array must still cover it.
    P = int(model.n_parts)
    lane_part = np.repeat(gp, 8)
    out["_floor_assign"] = (
        lane_part[None, :] == np.arange(P)[:, None]
    )
    return out
