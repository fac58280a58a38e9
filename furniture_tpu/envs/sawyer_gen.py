"""Scripted demonstration generator: the reference's 12-phase waypoint
planner (``furniture_sawyer_gen.py``) as a *jitted scripted policy*.

The reference generates demos one environment at a time with a host-side
Python state machine driving ``env.step``. Here the entire planner is a pure
function ``scripted_action(gen, env_state) -> (action, gen)`` over a small
``GenPolicyState`` pytree, so demo generation runs as
``vmap(policy ∘ step)`` — thousands of scripted assembly episodes in
parallel on one chip instead of one CPU process per episode.

Phase machine (``furniture_sawyer_gen.py:29-80``):
  0 init_grip  1 xy_move_g  2 align_g  3 z_move_g  4 move_waypoints
  5 align_conn  6 xy_move_conn  7 z_move_conn  8 align_conn_fine
  9 z_move_conn_fine  10 move_nogrip_safepos  11 part_done

P-control primitives ``move_xy/move_xyz/move_z`` (:272-345) are ported as
branch-free jnp functions; the reference's per-plane 2D alignment feedback
(``align2D``/``align_gripsites``/``get_closest_xy_fwd`` :214-270) is
replaced by exact world rotation-vector corrections (``_up_correction`` /
``_fwd_correction``) mapped into the IK euler slots through the accumulated
hand-target frame — the planar form is only well-conditioned near upright
poses, while table_lack requires a 90° mid-air reorientation of the grasped
leg. Recipe parameters (eps, magnitudes, waypoint offsets) are compiled
into static per-subtask arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import transforms as T
from ..config import EnvConfig
from ..robots import kinematics as K
from .sawyer_dense import FurnitureSawyerDenseRewardEnv

(
    INIT_GRIP,
    XY_MOVE_G,
    ALIGN_G,
    Z_MOVE_G,
    MOVE_WAYPOINTS,
    ALIGN_CONN,
    XY_MOVE_CONN,
    Z_MOVE_CONN,
    ALIGN_CONN_FINE,
    Z_MOVE_CONN_FINE,
    MOVE_NOGRIP_SAFEPOS,
    PART_DONE,
) = range(12)

MAXW = 3  # static safepos buffer capacity (recipes use 1-2 waypoints)


class GenPolicyState(NamedTuple):
    phase: jax.Array          # int32 0..11
    part: jax.Array           # int32 current subtask (mirrors subtask_step)
    safepos: jax.Array        # [MAXW,3] absolute waypoint targets
    safepos_len: jax.Array    # int32
    safepos_idx: jax.Array    # int32
    z_move_g_prev: jax.Array  # f32 griptip ratchet (:498-507)
    noise_wp: jax.Array       # [3] per-episode waypoint noise
    noise_ng: jax.Array       # [3] per-episode nogrip noise
    drop_count: jax.Array     # int32 consecutive carry steps with no grasp
    phase_steps: jax.Array    # int32 steps spent in the current phase


# per-phase step budget + fallthrough target: align phases that limit-cycle
# (the min_rot_act floor + the ±π/2 fold in the forward corrections can
# oscillate around a tolerance boundary forever) fall through to their next
# phase — a slightly misaligned grasp/approach still usually succeeds —
# while stuck move/approach phases reopen and re-grasp. The reference's
# host-side generator instead discards the whole episode on any stall
# (furniture_sawyer_gen.py:430-697); budgets keep the batch lanes live.
_PHASE_LIMIT = np.array(
    [100, 200, 80, 150, 150, 120, 200, 200, 120, 200, 100, 1 << 30], np.int32
)
_PHASE_FALLTHROUGH = np.array(
    [
        XY_MOVE_G,      # INIT_GRIP
        XY_MOVE_G,      # XY_MOVE_G (unreachable leg: keep trying)
        Z_MOVE_G,       # ALIGN_G
        XY_MOVE_G,      # Z_MOVE_G
        ALIGN_CONN,     # MOVE_WAYPOINTS (leg held; skip stuck waypoint)
        XY_MOVE_CONN,   # ALIGN_CONN
        XY_MOVE_G,      # XY_MOVE_CONN
        XY_MOVE_G,      # Z_MOVE_CONN
        Z_MOVE_CONN_FINE,  # ALIGN_CONN_FINE
        XY_MOVE_G,      # Z_MOVE_CONN_FINE
        PART_DONE,      # MOVE_NOGRIP_SAFEPOS
        PART_DONE,      # PART_DONE
    ],
    np.int32,
)


# -- ported planner primitives (furniture_sawyer_gen.py:214-345) -------------


def _move_xy(cur, tgt, eps, noise=None):
    """Returns (d2, reached): P-move in xy with per-axis deadband and
    0.04-saturation (:272-294). ``reached`` advances the phase."""
    d = tgt - cur
    if noise is not None:
        d = d + noise[:2]
    reached = (jnp.abs(d[0]) <= eps) & (jnp.abs(d[1]) <= eps)
    d = jnp.where(jnp.abs(d) < eps, 0.0, d)
    d = jnp.where(jnp.abs(d) > 0.04, jnp.sign(d), d)
    return jnp.where(reached, 0.0, d), reached


def _move_xyz(cur, tgt, eps, noise=None):
    """(d3, reached) xyz variant (:295-320)."""
    d = tgt - cur
    if noise is not None:
        d = d + noise
    reached = jnp.all(jnp.abs(d) <= eps)
    d = jnp.where(jnp.abs(d) < eps, 0.0, d)
    d = jnp.where(jnp.abs(d) > 0.04, jnp.sign(d), d)
    return jnp.where(reached, 0.0, d), reached


def _move_z(cur, tgt, eps, conn_dist, fine=None):
    """z-approach with conn_dist offset (:321-345)."""
    tgt = tgt + jnp.array([0.0, 0.0, 1.0]) * conn_dist
    d = tgt - cur
    d = jnp.where(jnp.abs(d) < eps, 0.0, d)
    if fine is not None:
        d = jnp.clip(d / fine, -0.02, 0.02)
    return d


def _wrap_pi(a):
    return jnp.mod(a + jnp.pi, 2 * jnp.pi) - jnp.pi


def _shortest_arc(v, target):
    """World rotation vector (axis·angle, radians) taking unit ``v`` onto
    unit ``target``; picks a deterministic perpendicular axis at the
    antiparallel singularity."""
    c = jnp.clip(jnp.dot(v, target), -1.0, 1.0)
    axis = T.cross(v, target)
    n = jnp.linalg.norm(axis)
    angle = jnp.arctan2(n, c)
    # antiparallel fallback: any axis perpendicular to v
    perp = jnp.where(
        jnp.abs(v[0]) < 0.9,
        jnp.array([1.0, 0.0, 0.0]),
        jnp.array([0.0, 1.0, 0.0]),
    )
    anti = T.unit(T.cross(v, perp))
    axis = jnp.where(n < 1e-6, jnp.where(c < 0, anti, jnp.zeros(3)), axis / jnp.maximum(n, 1e-8))
    return axis * angle


def _up_correction(rel_quat, eps):
    """World rotation vector aligning a held part's conn-site up row-vector
    with the target site's (the predicate ``_is_aligned`` checks,
    ``env/furniture.py:1057-1153``).

    ``row2(R_g) == row2(R_t)  ⟺  (R_g R_tᵀ) e_z == e_z``; applying a world
    rotation r to the held part maps ``rel = R_g R_tᵀ → R_r rel``, so the
    exact correction is the shortest arc taking ``v = rel·e_z`` onto e_z.
    This replaces the reference's per-plane ``align2D`` feedback
    (``furniture_sawyer_gen.py:552-560``) — the planar decomposition of the
    row-convention vectors is only well-conditioned near upright poses,
    while the rotation-vector form is exact everywhere."""
    v = T.quat_rotate(rel_quat, jnp.array([0.0, 0.0, 1.0]))
    w = _shortest_arc(v, jnp.array([0.0, 0.0, 1.0]))
    return jnp.where(jnp.linalg.norm(w) < eps, jnp.zeros(3), w)


def _fwd_correction(rel_quat, angles, angle_mask, has_angles, eps):
    """World-z rotation vector aligning the conn-site forward row-vectors up
    to the connector's allowed angle set (site name angles,
    ``env/furniture.py:1088-1131``; reference ``get_closest_xy_fwd``
    :222-248). Valid once the up axes are aligned (rel ≈ R_z(θ))."""
    vf = T.quat_rotate(rel_quat, jnp.array([1.0, 0.0, 0.0]))
    theta = jnp.arctan2(vf[1], vf[0])
    cand = jnp.deg2rad(angles)
    err = _wrap_pi(cand - theta)
    err = jnp.where(angle_mask, jnp.abs(err), jnp.inf)
    best = jnp.argmin(err)
    # sites with no angle list accept any xy orientation (reference
    # get_closest_xy_fwd returns gfwd unchanged -> zero correction)
    phi = jnp.where(has_angles, _wrap_pi(cand[best] - theta), 0.0)
    phi = jnp.where(jnp.abs(phi) < eps, 0.0, phi)
    return jnp.array([0.0, 0.0, 1.0]) * phi


def _grip_fwd_correction(hand_quat, gvec2, eps):
    """World-z rotation aligning the finger separation axis (hand body-y in
    world — the finger slide joints' axis) with the grasp vector's xy
    direction, nearest of the two senses (the goal of the reference's
    ``align_gripsites``, :214-221)."""
    f = T.quat_rotate(hand_quat, jnp.array([0.0, 1.0, 0.0]))[:2]
    phi = _wrap_pi(jnp.arctan2(gvec2[1], gvec2[0]) - jnp.arctan2(f[1], f[0]))
    # fingers are symmetric: rotate to the nearer of ±gvec
    phi = jnp.where(phi > jnp.pi / 2, phi - jnp.pi, phi)
    phi = jnp.where(phi < -jnp.pi / 2, phi + jnp.pi, phi)
    phi = jnp.where(jnp.abs(phi) < eps, 0.0, phi)
    return jnp.array([0.0, 0.0, 1.0]) * phi


def _grip_up_correction(hand_quat, eps):
    """World rotation pointing the gripper z-axis straight down (the role of
    the reference's align_g yz/xz corrections toward ``align_g_tgt``,
    :468-477)."""
    w = T.quat_rotate(hand_quat, jnp.array([0.0, 0.0, 1.0]))
    out = _shortest_arc(w, jnp.array([0.0, 0.0, -1.0]))
    return jnp.where(jnp.linalg.norm(out) < eps, jnp.zeros(3), out)


class FurnitureSawyerGenEnv(FurnitureSawyerDenseRewardEnv):
    """Dense env + jitted scripted assembly policy
    (reference ``FurnitureSawyerGenEnv``, ``furniture_sawyer_gen.py:13``)."""

    def __init__(self, config: EnvConfig | None = None, model=None):
        # carry/grasp rigidity comes from the finger-servo press squeeze
        # (SimConfig.grip_press_vel; the reference's force-limited finger
        # servos) — no per-env overrides needed; the velocity-blend assists
        # earlier rounds floored here are retired.
        super().__init__(config, model)
        p = self.model.recipe_raw
        self._p = p
        S = self.n_subtasks
        self.eps = float(p["eps"])
        self.eps_fine = float(p["eps_fine"])
        self.rot_eps = float(p["rot_eps"])
        self.rot_eps_fine = float(p["rot_eps_fine"])
        self.lat_mag = float(p["lat_magnitude"])
        self.rot_mag = float(p["rot_magnitude"])
        self.fine_mag = float(p["fine_magnitude"])
        self.min_rot_act = float(p["min_rot_act"])
        self.min_rot_act_fine = float(p["min_rot_act_fine"])
        zc = p["z_conn_dist"]
        self._z_conn = np.array(
            zc if isinstance(zc, list) else [zc] * S, np.float32
        )
        self.max_success_steps = int(p.get("max_success_steps", 2000))

        def pad_offsets(key):
            out = np.zeros((S, MAXW, 4), np.float32)
            lens = np.zeros(S, np.int32)
            for s, entry in enumerate(p.get(key, [None] * S)):
                if entry is None:
                    continue
                for w, off in enumerate(entry[:MAXW]):
                    out[s, w, : len(off)] = off
                    out[s, w, 3] = off[3] if len(off) == 4 else np.nan
                lens[s] = min(len(entry), MAXW)
            return out, lens

        self._ginit, self._ginit_len = pad_offsets("grip_init_pos")
        self._wp, self._wp_len = pad_offsets("waypoints")
        self._ng, self._ng_len = pad_offsets("nogrip_safepos")
        ga = p.get("grip_angles")
        self._skip_align_g = np.array(
            [ga is not None and ga[s] is None for s in range(S)]
        )
        # gripper base collision geom (reference gripbase_site,
        # furniture_sawyer_gen.py:362)
        names = self.robot.geom_names
        cand = [i for i, n in enumerate(names) if "gripper_base" in n]
        self._gripbase_geom = cand[0] if cand else int(
            np.flatnonzero(self.robot.hand_geoms)[0]
        )

    # -- policy ----------------------------------------------------------------

    def init_policy_state(self, env_state, key) -> GenPolicyState:
        r = self.config.furn_xyz_rand
        k1, k2 = jax.random.split(key)
        gen = GenPolicyState(
            phase=jnp.array(INIT_GRIP, jnp.int32),
            part=jnp.array(0, jnp.int32),
            safepos=jnp.zeros((MAXW, 3)),
            safepos_len=jnp.array(0, jnp.int32),
            safepos_idx=jnp.array(0, jnp.int32),
            z_move_g_prev=jnp.array(jnp.inf, jnp.float32),
            noise_wp=jax.random.uniform(k1, (3,), minval=0.0, maxval=2 * r),
            noise_ng=jax.random.uniform(k2, (3,), minval=0.0, maxval=2 * r),
            drop_count=jnp.array(0, jnp.int32),
            phase_steps=jnp.array(0, jnp.int32),
        )
        return self._enter_part(gen, env_state)

    def _gripbase_pos(self, fk_out):
        g = self._gripbase_geom
        b = self.robot.geom_body[g]
        return fk_out["body_pos"][b] + T.quat_rotate(
            fk_out["body_quat"][b],
            jnp.asarray(self.robot.geom_pos[g], jnp.float32),
        )

    def _enter_part(self, gen: GenPolicyState, env_state) -> GenPolicyState:
        """Per-part (re)initialization (furniture_sawyer_gen.py:386-422):
        grip_init safepos or skip to xy_move_g."""
        s = gen.part
        fk_out = K.fk(self.robot, env_state.qpos)
        base = self._gripbase_pos(fk_out)
        off = jnp.asarray(self._ginit)[s]                     # [MAXW,4]
        tgt = base[None, :] + off[:, :3]
        tgt = tgt.at[:, 2].set(
            jnp.where(jnp.isnan(off[:, 3]), tgt[:, 2], off[:, 3])
        )
        n = jnp.asarray(self._ginit_len)[s]
        has_init = n > 0
        return gen._replace(
            phase=jnp.where(has_init, INIT_GRIP, XY_MOVE_G).astype(jnp.int32),
            safepos=tgt,
            safepos_len=n,
            safepos_idx=jnp.array(0, jnp.int32),
            z_move_g_prev=jnp.array(jnp.inf, jnp.float32),
        )

    def scripted_action(self, gen: GenPolicyState, env_state):
        """One planner decision (the body of the reference's generate_demos
        inner loop, furniture_sawyer_gen.py:430-697). Returns (action8, gen)."""
        st = self._st
        s = gen.part
        phase_in = gen.phase
        fk_out = K.fk(self.robot, env_state.qpos)
        parts = env_state.parts

        gripbase = self._gripbase_pos(fk_out)
        grip_pos, hand_quat = K.site_world(self.robot, fk_out, "right")
        griptip = K.tip_world(self.robot, fk_out, "right")

        gl = self._site_pos(parts, jnp.asarray(st["gl"])[s])
        gr = self._site_pos(parts, jnp.asarray(st["gr"])[s])
        g_pos = 0.5 * (gl + gr)
        g_vec = gr - gl

        gconn = jnp.asarray(st["leg_site"])[s]
        tconn = jnp.asarray(st["table_site"])[s]
        gconn_pos, gconn_quat = self._conn_pose(parts, gconn)
        tconn_pos, tconn_quat = self._conn_pose(parts, tconn)

        # velocity-lead prediction of the held leg's conn site, one control
        # step ahead: the approach phases servo a site on a *swinging* part
        # (a friction grasp is compliant, unlike the reference's rigid
        # force-closed MuJoCo grasp), and pure position feedback on the
        # swing limit-cycles until the leg rips out of the fingers; leading
        # the measurement by the swing velocity damps the loop
        leg_idx = jnp.asarray(st["leg"])[s]
        v_conn = parts.lin_vel[leg_idx] + T.cross(
            parts.ang_vel[leg_idx], gconn_pos - parts.pos[leg_idx]
        )
        gconn_pred = gconn_pos + (1.0 / self.config.sim.control_freq) * v_conn

        m = self.model
        angles = jnp.asarray(m.conn_angles, jnp.float32)[gconn]
        amask = jnp.asarray(m.conn_angle_mask)[gconn]
        has_angles = jnp.asarray(m.conn_has_angles)[gconn]
        z_conn = jnp.asarray(self._z_conn)[s]

        # relative conn-site rotation: the quantity every align phase
        # controls (see _up_correction)
        rel = T.quat_mul(gconn_quat, T.quat_inv(tconn_quat))
        hand_tgt = env_state.hand_quat_init[0]

        # the env's own connectability predicate for the current pair
        # (``_is_aligned``, env/furniture.py:1057-1153): the fine phases
        # press connect the moment the env would accept it. The policy's
        # own eps_fine deadbands are STRICTER than the env tolerance, and
        # waiting for every action component to zero while the leg presses
        # against the tabletop lets contact torques tip the leg out of
        # alignment first (measured: staged runs hovered 7 mm outside
        # eps_fine, perfectly aligned, until the grasp ripped).
        aligned_now, _ = self.ops.alignment(parts)
        fine_ok = aligned_now[gconn, tconn]

        def to_act(omega_world):
            """World rotation vector [rad] → euler action slots 3:6.

            The env's ik mode composes euler deltas on the right of the
            accumulated hand-target quat (``_do_ik_step`` semantics,
            ``env/furniture.py:2917-2922``), i.e. +rotations about the hand
            target's body axes; express the desired world correction in
            that frame."""
            return T.quat_rotate(T.quat_inv(hand_tgt), omega_world)

        a = jnp.zeros(8)

        # --- phase branches; each returns (action, gen) ---
        # travel waypoints (init-grip lift, carry waypoints, nogrip retreat)
        # are coarse via points, not precision targets: a 1 cm per-axis
        # tolerance limit-cycles against the IK target low-pass (the hand
        # overshoots the deadband and orbits), so they accept 3x eps
        wp_eps = 3.0 * self.eps

        def ph_init_grip(gen):
            act = a.at[6].set(-1.0)
            d, reached = _move_xyz(
                gripbase, gen.safepos[gen.safepos_idx], wp_eps
            )
            act = act.at[0:3].set(d)
            idx = jnp.where(reached, gen.safepos_idx + 1, gen.safepos_idx)
            advance = idx >= gen.safepos_len
            return act, gen._replace(
                safepos_idx=jnp.where(advance, 0, idx),
                phase=jnp.where(advance, XY_MOVE_G, gen.phase).astype(jnp.int32),
            )

        def ph_xy_move_g(gen):
            # keep a safe traverse height: the reference enters this phase
            # from a high start, but after a failed grasp the hand can be
            # low, and a low open gripper plows into lying parts and bats
            # them across the workspace
            act = a.at[6].set(-1.0)
            d, reached = _move_xy(grip_pos[:2], g_pos[:2], self.eps)
            climb = jnp.maximum(0.0, 0.35 - gripbase[2])
            act = act.at[0:2].set(d).at[2].set(
                jnp.where(climb > 0.02, climb, 0.0)
            )
            return act, gen._replace(
                phase=jnp.where(reached, ALIGN_G, gen.phase).astype(jnp.int32)
            )

        def ph_align_g(gen):
            # point the gripper straight down + fingers across the grasp
            # vector (reference align_g, furniture_sawyer_gen.py:460-487).
            # xy and rotation are corrected SIMULTANEOUSLY (the reference
            # alternates, but wrist rotations translate the eef, so
            # rotate-then-translate wanders); grip alignment uses a 2x
            # tolerance — a grasp with the fingers ±0.1 rad off the grasp
            # vector still straddles the leg
            act = a.at[6].set(-1.0)
            w_up = _grip_up_correction(hand_quat, 2 * self.rot_eps)
            w_fwd = _grip_fwd_correction(hand_quat, g_vec[:2], 2 * self.rot_eps)
            rot = w_up + w_fwd
            rot_zero = jnp.all(rot == 0.0)
            d, reached = _move_xy(grip_pos[:2], g_pos[:2], self.eps)
            act = act.at[0:2].set(d).at[3:6].set(to_act(rot))
            skip = jnp.asarray(self._skip_align_g)[gen.part]
            advance = skip | (rot_zero & reached)
            return act, gen._replace(
                phase=jnp.where(advance, Z_MOVE_G, gen.phase).astype(jnp.int32)
            )

        def ph_z_move_g(gen):
            d = g_pos - grip_pos
            descending = (jnp.abs(d[2]) > self.eps) & (
                griptip[2] < gen.z_move_g_prev
            )
            act = jnp.where(
                descending,
                a.at[6].set(-1.0).at[0:3].set(d),
                a.at[6].set(1.0),
            )
            # on grasp: safepos <- gripbase + waypoints (offsets); carry
            # height floored so the hanging leg clears the assembly during
            # the lift-and-traverse (see z_keep above)
            off = jnp.asarray(self._wp)[gen.part, :, :3]
            tgt = gripbase[None, :] + off + gen.noise_wp[None, :]
            tgt = tgt.at[:, 2].set(jnp.maximum(tgt[:, 2], 0.40))
            return act, gen._replace(
                z_move_g_prev=jnp.where(
                    descending, griptip[2] - 1e-4, gen.z_move_g_prev
                ),
                phase=jnp.where(descending, gen.phase, MOVE_WAYPOINTS).astype(
                    jnp.int32
                ),
                safepos=jnp.where(descending, gen.safepos, tgt),
                safepos_len=jnp.where(
                    descending,
                    gen.safepos_len,
                    jnp.asarray(self._wp_len)[gen.part],
                ),
                safepos_idx=jnp.where(descending, gen.safepos_idx, 0),
            )

        def ph_move_waypoints(gen):
            act = a.at[6].set(1.0)
            done_wp = gen.safepos_idx >= gen.safepos_len
            d, reached = _move_xyz(
                gripbase,
                gen.safepos[jnp.minimum(gen.safepos_idx, MAXW - 1)],
                wp_eps,
            )
            act = act.at[0:3].set(jnp.where(done_wp, 0.0, d))
            idx = jnp.where(reached & ~done_wp, gen.safepos_idx + 1, gen.safepos_idx)
            return act, gen._replace(
                safepos_idx=jnp.where(done_wp, 0, idx),
                phase=jnp.where(done_wp, ALIGN_CONN, gen.phase).astype(jnp.int32),
            )

        # safe traverse height for the held leg's conn site: clear of the
        # tabletop surface and anything already assembled on it. The
        # reorientation leaves the leg hanging below the hand; traversing
        # with the tip at tabletop height grazes the assembly, and a
        # rigid-grasp-vs-welded-structure contact ejects the leg (measured:
        # carry-phase peak leg speeds of 2-7 m/s, tools/profile_gen.py)
        z_keep = tconn_pos[2] + z_conn + self._z_finedist + 0.04

        def _hold_z(act):
            # altitude FLOOR, not a target: only push up when the tip sinks
            # below the safe height — dragging a freshly lifted leg back
            # down through clutter costs more grasps than it saves
            dz = jnp.clip(z_keep - gconn_pred[2], 0.0, 0.3)
            return act.at[2].set(jnp.where(dz > self.eps, dz, 0.0))

        def ph_align_conn(gen):
            # up axes first, then the allowed-angle xy rotation (reference
            # align_conn, furniture_sawyer_gen.py:552-572). Corrections are
            # doubled here (clipped to ±1 later): the leg tracks the hand
            # through a compliant friction grasp at ~60% of the commanded
            # rate, and the coarse 90° reorientation dominates the episode
            # budget otherwise
            act = a.at[6].set(1.0)
            w_up = _up_correction(rel, self.rot_eps)
            up_zero = jnp.all(w_up == 0.0)
            w_fwd = _fwd_correction(rel, angles, amask, has_angles, self.rot_eps)
            done_rot = up_zero & jnp.all(w_fwd == 0.0)
            rot = 2.0 * jnp.where(up_zero, w_fwd, w_up)
            act = _hold_z(act.at[3:6].set(to_act(rot)))
            return act, gen._replace(
                phase=jnp.where(done_rot, XY_MOVE_CONN, gen.phase).astype(jnp.int32),
            )

        def ph_xy_move_conn(gen):
            act = a.at[6].set(1.0)
            d, reached = _move_xy(gconn_pred[:2], tconn_pos[:2], self.eps)
            # opportunistic press: the env accepts a connect whenever its
            # alignment predicate holds — firing at the earliest aligned
            # instant skips the risky fine descent into table contact
            act = _hold_z(act.at[0:2].set(d))
            act = jnp.where(fine_ok, act.at[7].set(1.0), act)
            return act, gen._replace(
                phase=jnp.where(reached, Z_MOVE_CONN, gen.phase).astype(jnp.int32)
            )

        def ph_z_move_conn(gen):
            act = a.at[6].set(1.0)
            d = _move_z(
                gconn_pred, tconn_pos, self.eps, z_conn + self._z_finedist
            )
            act = act.at[0:3].set(jnp.clip(d, -0.3, 0.3))
            act = jnp.where(fine_ok, act.at[7].set(1.0), act)
            reached = jnp.all(d == 0)
            return act, gen._replace(
                phase=jnp.where(reached, ALIGN_CONN_FINE, gen.phase).astype(
                    jnp.int32
                )
            )

        def ph_align_conn_fine(gen):
            act = a.at[6].set(1.0)
            w_up = _up_correction(rel, self.rot_eps_fine)
            up_zero = jnp.all(w_up == 0.0)
            w_fwd = _fwd_correction(
                rel, angles, amask, has_angles, self.rot_eps_fine
            )
            fwd_zero = jnp.all(w_fwd == 0.0)
            d, reached = _move_xy(gconn_pred[:2], tconn_pos[:2], self.eps_fine)
            rot = jnp.where(up_zero, w_fwd, w_up)
            act = jnp.where(
                up_zero & fwd_zero,
                act.at[0:2].set(d),
                act.at[3:6].set(to_act(rot)),
            )
            advance = (up_zero & fwd_zero & reached) | fine_ok
            return act, gen._replace(
                phase=jnp.where(advance, Z_MOVE_CONN_FINE, gen.phase).astype(
                    jnp.int32
                ),
            )

        def ph_z_move_conn_fine(gen):
            act = a.at[6].set(1.0)
            d = _move_z(
                gconn_pred, tconn_pos, self.eps_fine, z_conn, fine=self.fine_mag
            )
            w_up = _up_correction(rel, self.rot_eps_fine)
            up_zero = jnp.all(w_up == 0.0)
            w_fwd = _fwd_correction(
                rel, angles, amask, has_angles, self.rot_eps_fine
            )
            rot = jnp.where(up_zero, w_fwd, w_up)
            act = act.at[0:3].set(d).at[3:6].set(to_act(rot))
            # press connect whenever the env's own predicate accepts; the
            # phase is LEFT only on evidence the env actually connected
            # (the global connected-evidence redirect below) — the state
            # moves during the 50 substeps between decision and connect
            # check, and a press that arrives misaligned must be retried,
            # not assumed successful
            press = jnp.all(act[0:6] == 0) | fine_ok
            act = jnp.where(press, act.at[7].set(1.0), act)
            return act, gen

        def ph_move_nogrip(gen):
            act = a.at[6].set(-1.0)
            done_wp = gen.safepos_idx >= gen.safepos_len
            d, reached = _move_xyz(
                gripbase,
                gen.safepos[jnp.minimum(gen.safepos_idx, MAXW - 1)],
                wp_eps,
            )
            act = act.at[0:3].set(jnp.where(done_wp, 0.0, d))
            idx = jnp.where(reached & ~done_wp, gen.safepos_idx + 1, gen.safepos_idx)
            return act, gen._replace(
                safepos_idx=jnp.where(done_wp, 0, idx),
                phase=jnp.where(done_wp, PART_DONE, gen.phase).astype(jnp.int32),
            )

        def ph_part_done(gen):
            return a, gen

        action, gen = jax.lax.switch(
            gen.phase,
            [
                ph_init_grip,
                ph_xy_move_g,
                ph_align_g,
                ph_z_move_g,
                ph_move_waypoints,
                ph_align_conn,
                ph_xy_move_conn,
                ph_z_move_conn,
                ph_align_conn_fine,
                ph_z_move_conn_fine,
                ph_move_nogrip,
                ph_part_done,
            ],
            gen,
        )

        # connected-evidence redirect: whatever align/approach phase the
        # policy was in when the env registered the connect (opportunistic
        # presses fire from several phases), retreat to the nogrip safepos
        # and let the PART_DONE handler advance to the next part
        connected_evt = (
            (env_state.subtask_step > gen.part)
            | (env_state.num_connected >= self.n_subtasks)
        ) & (gen.phase >= ALIGN_CONN) & (gen.phase <= Z_MOVE_CONN_FINE)
        off_ng = jnp.asarray(self._ng)[gen.part, :, :3]
        tgt_ng = gripbase[None, :] + off_ng + gen.noise_ng[None, :]
        gen = gen._replace(
            phase=jnp.where(
                connected_evt, MOVE_NOGRIP_SAFEPOS, gen.phase
            ).astype(jnp.int32),
            safepos=jnp.where(connected_evt, tgt_ng, gen.safepos),
            safepos_len=jnp.where(
                connected_evt,
                jnp.asarray(self._ng_len)[gen.part],
                gen.safepos_len,
            ).astype(jnp.int32),
            safepos_idx=jnp.where(connected_evt, 0, gen.safepos_idx).astype(
                jnp.int32
            ),
        )

        # magnitudes + clip (:679-683, :117-124). The reference also floors
        # small rotation actions to min_rot_act (real-robot stiction
        # compensation); here the floor is intentionally NOT applied — the
        # simulated wrist has no stiction, and a floored ±min_rot bang-bang
        # limit-cycles around the rot_eps boundary instead of converging
        action = action.at[0:3].multiply(self.lat_mag)
        action = action.at[3:6].multiply(self.rot_mag)
        action = jnp.clip(action, -1.0, 1.0)

        # carry-speed cap: lat_magnitude=15 saturates every lateral move to
        # ±1 (max eef speed), which bang-bangs the compliant grasp until the
        # leg is flung out; while carrying, cap translation at 40%
        carrying = (
            (gen.phase == MOVE_WAYPOINTS) | (gen.phase == XY_MOVE_CONN)
        )
        # the connector descent gets its own slower cap: most connects fire
        # via the opportunistic press DURING this approach, and the descent
        # is where mating-contact ejections peak — slower approach gives
        # the aligned-press more chances per cm and builds less wedge
        # energy against the tabletop
        descending_conn = gen.phase == Z_MOVE_CONN
        # pre-grasp approach is also capped (at 50%): full-speed saturated
        # moves overshoot the IK target low-pass and orbit the 1 cm grasp
        # tolerance instead of settling (41% of all generator time was
        # measured inside XY_MOVE_G at full speed)
        pregrasp = (
            (gen.phase == INIT_GRIP)
            | (gen.phase == XY_MOVE_G)
            | (gen.phase == ALIGN_G)
        )
        cap = jnp.where(
            descending_conn,
            0.1,
            jnp.where(carrying, 0.25, jnp.where(pregrasp, 0.5, 1.0)),
        )
        action = action.at[0:3].set(jnp.clip(action[0:3], -cap, cap))

        # advance to next part when the env connected this part
        def next_part(gen):
            gen = gen._replace(part=env_state.subtask_step)
            return self._enter_part(gen, env_state)

        gen = jax.lax.cond(
            (gen.phase == PART_DONE)
            & (env_state.subtask_step > gen.part)
            & (env_state.subtask_step < self.n_subtasks),
            next_part,
            lambda g: g,
            gen,
        )

        # drop recovery (robustification over the reference, which discards
        # any episode that loses the grasp, furniture_sawyer_gen.py:430-697):
        # if the leg stays un-grasped through a carry/align/approach phase,
        # reopen and go back to XY_MOVE_G to re-grasp — the grasp sites
        # track the part wherever it landed
        held = env_state.touch_l[0, leg_idx] & env_state.touch_r[0, leg_idx]
        in_carry = (gen.phase >= MOVE_WAYPOINTS) & (gen.phase <= Z_MOVE_CONN_FINE)
        dc = jnp.where(in_carry & ~held, gen.drop_count + 1, 0)
        regrasp = dc >= 8

        # per-phase step budget: stalled phases fall through (see
        # _PHASE_LIMIT / _PHASE_FALLTHROUGH)
        psteps = jnp.where(gen.phase == phase_in, gen.phase_steps + 1, 0)
        timed_out = psteps >= jnp.asarray(_PHASE_LIMIT)[gen.phase]
        fallthrough = jnp.asarray(_PHASE_FALLTHROUGH)[gen.phase]

        new_phase = jnp.where(
            regrasp, XY_MOVE_G, jnp.where(timed_out, fallthrough, gen.phase)
        )
        # lift-first redirect applies to drop recoveries and to timeouts of
        # the LOW phases (hand at grasp/carry height) — NOT to INIT_GRIP or
        # XY_MOVE_G timeouts, whose fallthrough is XY_MOVE_G itself
        # (redirecting those re-enters INIT_GRIP forever)
        low_phase = (
            (gen.phase == Z_MOVE_G)
            | (gen.phase == XY_MOVE_CONN)
            | (gen.phase == Z_MOVE_CONN)
            | (gen.phase == Z_MOVE_CONN_FINE)
        )
        reset_grasp = regrasp | (timed_out & low_phase)
        # re-grasp goes through a lift-in-place waypoint first: after a drop
        # the hand is at carry height, and driving xy straight at the fallen
        # leg plows the open gripper into it at full speed, batting it
        # across (and out of) the workspace
        lift = jnp.stack(
            [gripbase[0], gripbase[1], jnp.float32(0.37)]
        )
        gen = gen._replace(
            drop_count=jnp.where(regrasp, 0, dc).astype(jnp.int32),
            phase_steps=jnp.where(regrasp | timed_out, 0, psteps).astype(
                jnp.int32
            ),
            phase=jnp.where(reset_grasp, INIT_GRIP, new_phase).astype(
                jnp.int32
            ),
            safepos=jnp.where(
                reset_grasp, gen.safepos.at[0].set(lift), gen.safepos
            ),
            safepos_len=jnp.where(reset_grasp, 1, gen.safepos_len).astype(
                jnp.int32
            ),
            safepos_idx=jnp.where(reset_grasp, 0, gen.safepos_idx).astype(
                jnp.int32
            ),
            z_move_g_prev=jnp.where(
                reset_grasp, jnp.inf, gen.z_move_g_prev
            ).astype(jnp.float32),
        )
        return action, gen

    # -- batched generation ------------------------------------------------------

    def generate_demos(
        self,
        n_demos: int,
        seed: int = 0,
        batch: int | None = None,
        store_path: str | None = None,
        demo_dir: str | None = None,
        max_steps: int | None = None,
        record_obs: bool = True,
    ):
        """Batched scripted demo generation: roll ``batch`` parallel scripted
        episodes on the megakernel batch path, return the successful
        (obs, action, reward) trajectories (reference ``generate_demos``
        :347-731 + DemoRecorder save at :716-718).

        Demos carry per-step observations in the reference's
        ``DemoRecorder`` schema (``util/demo_recorder.py:33-87``:
        ``len(obs) == len(actions)+1``) so ``rl.bc.demos_to_dataset`` /
        GAIL can train on them directly. ``demo_dir`` additionally saves
        each demo as a numbered reference-schema pickle; ``store_path``
        persists (actions, rewards) through the native multithreaded
        trajectory store (``native/traj_store.cpp``).

        Returns ``(demos, stats)`` with ``stats`` = per-batch success rate,
        connect-count histogram, and first-success step quantiles — the
        committed success-rate artifact's payload.
        """
        batch = batch or max(n_demos, 8)
        # the in-policy drop recovery retries failed grasps, so give
        # episodes 2x the reference's success budget by default
        max_steps = max_steps or 2 * self.max_success_steps
        key = jax.random.PRNGKey(seed)
        k_reset, k_gen = jax.random.split(key)

        reset = jax.jit(self.reset_batch)
        init_pol = jax.jit(jax.vmap(self.init_policy_state))

        def state_snap(env_s):
            """Per-step env-state stream entry (the reference DemoRecorder's
            ``states`` = MuJoCo qpos/qvel, ``util/demo_recorder.py:33-56``;
            here the engine state is parts pose/vel + robot joints, plus the
            assembly fields needed to restore/replay the state exactly)."""
            return {
                "parts_pos": env_s.parts.pos,
                "parts_quat": env_s.parts.quat,
                "parts_lin_vel": env_s.parts.lin_vel,
                "parts_ang_vel": env_s.parts.ang_vel,
                "qpos": env_s.qpos,
                "qvel": env_s.qvel,
                "group": env_s.group,
                "weld_active": env_s.weld_active,
                "conn_connected": env_s.conn_connected,
                "num_connected": env_s.num_connected,
            }

        def one_step(carry, _):
            env_s, gen_s = carry
            action, gen_s = jax.vmap(self.scripted_action)(gen_s, env_s)
            env_s, obs, rew, done, info = self.step_batch(env_s, action)
            rec = {
                "action": action,
                "rew": rew,
                "succ": info["success"],
                "nconn": env_s.num_connected,
                "state": state_snap(env_s),
            }
            if record_obs:
                rec["obs"] = obs
            return (env_s, gen_s), rec

        # the rollout runs in fixed-length jitted segments with a host loop
        # over them: one monolithic max_steps-long scan is a single XLA
        # execution of minutes of device time, which trips device-side
        # execution watchdogs (observed as TPU worker crashes on the
        # tunneled runtime); segment boundaries cost one dispatch each
        seg = 400

        @jax.jit
        def rollout_seg(env_s, gen_s):
            (env_s, gen_s), traj = jax.lax.scan(
                one_step, (env_s, gen_s), None, length=seg
            )
            return env_s, gen_s, traj

        env_s = reset(jax.random.split(k_reset, batch))
        gen_s = init_pol(env_s, jax.random.split(k_gen, batch))
        obs0 = jax.jit(jax.vmap(self.observe))(env_s)
        obs0 = {k: np.asarray(v) for k, v in obs0.items()}
        state0 = jax.tree.map(np.asarray, state_snap(env_s))

        chunks = []
        n_seg = int(np.ceil(max_steps / seg))
        for _ in range(n_seg):
            env_s, gen_s, traj = rollout_seg(env_s, gen_s)
            chunks.append(jax.tree.map(np.asarray, traj))
        traj = jax.tree.map(lambda *xs: np.concatenate(xs)[:max_steps], *chunks)
        actions, rewards = traj["action"], traj["rew"]
        successes, n_conn = traj["succ"], traj["nconn"]
        states_t = traj["state"]
        obs_t = traj.get("obs") if record_obs else None

        succ = successes.any(axis=0)                         # [B]
        first = np.where(succ, successes.argmax(0) + 1, max_steps)

        def ob_slice(t, b):
            """One env's observation dict at step t (t == -1 -> reset obs)."""
            if t < 0:
                return {k: np.asarray(v[b]) for k, v in obs0.items()}
            return {k: np.asarray(v[t, b]) for k, v in obs_t.items()}

        def state_slice(t, b):
            if t < 0:
                return {k: v[b] for k, v in state0.items()}
            return {k: v[t, b] for k, v in states_t.items()}

        demos = []
        for b in np.flatnonzero(succ)[:n_demos]:
            t_end = int(first[b])
            d = {
                "actions": actions[:t_end, b],
                "rewards": rewards[:t_end, b],
                "num_connected": int(n_conn[t_end - 1, b]),
                # reference-schema per-step streams
                # (util/demo_recorder.py:33-56): states has one more entry
                # than actions (reset state first) so state-replay aligns
                # with obs; connect_actions mirrors the action's connect bit
                "states": [state_slice(-1, b)]
                + [state_slice(t, b) for t in range(t_end)],
                "connect_actions": (actions[:t_end, b, -1] > 0.0).tolist(),
            }
            if record_obs:
                d["obs"] = [ob_slice(-1, b)] + [
                    ob_slice(t, b) for t in range(t_end)
                ]
            demos.append(d)

        if demo_dir is not None and demos:
            from ..utils.demo import DemoRecorder

            rec = DemoRecorder(demo_dir, metadata={
                "agent": self.config.agent_type,
                "furniture_name": self.config.furniture_name,
                "seed": seed,
            })
            for i, d in enumerate(demos):
                for t, a in enumerate(d["actions"]):
                    rec.add(
                        ob=d["obs"][t] if record_obs else None,
                        state=d["states"][t],
                        action=a,
                        reward=float(d["rewards"][t]),
                        connect_action=d["connect_actions"][t],
                    )
                rec.add(
                    ob=d["obs"][len(d["actions"])] if record_obs else None,
                    state=d["states"][len(d["actions"])],
                )
                rec.save(f"Sawyer_{self.config.furniture_name}_", count=i)

        if store_path is not None and demos:
            from ..utils.traj_store import TrajStore

            with TrajStore(store_path, "w") as ts:
                for d in demos:
                    ts.append(d["actions"], d["rewards"])
                ts.flush()

        final_conn = n_conn[-1]
        stats = {
            "batch": int(batch),
            "max_steps": int(max_steps),
            "seed": int(seed),
            "success_rate": float(succ.mean()),
            "connect_histogram": np.bincount(
                final_conn, minlength=self.n_subtasks + 1
            ).tolist(),
            "mean_num_connected": float(final_conn.mean()),
            "first_success_steps": sorted(
                int(f) for f in first[succ]
            ),
        }
        return demos, stats
