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

P-control primitives ``move_xy/move_xyz/move_z`` (:272-345) and 2D
alignment ``align2D``/``align_gripsites``/``get_closest_xy_fwd`` (:214-270)
are ported as branch-free jnp functions; recipe parameters (eps, magnitudes,
waypoint offsets) are compiled into static per-subtask arrays.
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
    t_fwd: jax.Array          # [2] cached target xy-forward
    t_fwd_valid: jax.Array    # bool
    z_move_g_prev: jax.Array  # f32 griptip ratchet (:498-507)
    noise_wp: jax.Array       # [3] per-episode waypoint noise
    noise_ng: jax.Array       # [3] per-episode nogrip noise


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


_FLIP_MARGIN = 0.35  # rad; see below


def _align2D(vec2, tgt2, eps):
    """CCW in-plane rotation (radians) taking vec2 onto tgt2, with deadband
    and gimbal-lock guard (the role of the reference's ``align2D`` :249-270).
    Callers map the returned angle to euler actions with the sign rule
    (−φ_x, +φ_y, −φ_z): the observed site vectors use the reference's row
    convention and transform as v' = R(δ)⁻¹v under the env's right-multiplied
    euler delta (see ``envs/arm.py:_ik_prepare``) — the same reason the
    reference negates its align2D output.

    Wrapped to the SHIFTED interval (-π+margin, π+margin]: a target ~180°
    away sits exactly on the ±π wrap boundary, where any wobble of the held
    part flips the commanded rotation direction every step and the
    controller oscillates forever (observed on table_lack when the grasped
    leg dangles conn-end-up). Shifting the branch cut off the flip
    configuration makes the direction choice deterministic — the part
    rotates through the full 180° instead of dithering."""
    angle = T.angle_between2D(vec2, tgt2)
    act = (
        jnp.mod(angle + jnp.pi - _FLIP_MARGIN, 2 * jnp.pi)
        - jnp.pi
        + _FLIP_MARGIN
    )
    act = jnp.where(jnp.abs(act) < eps, 0.0, act)
    lock = jnp.abs(vec2[0]) + jnp.abs(vec2[1]) < 0.5
    return jnp.where(lock, 0.0, act)


def _align_gripsites(gripvec2, gvec2, eps):
    """Gripper-finger/grasp-vector xy alignment (:214-221): flip gripvec to
    the nearer direction first, then the ccw angle onto the target."""
    flip = T.angle_between(-gripvec2, gvec2) < T.angle_between(gripvec2, gvec2)
    gv = jnp.where(flip, -gripvec2, gripvec2)
    return _align2D(gv, gvec2, eps)


def _closest_xy_fwd(angles, angle_mask, has_angles, gfwd2, tfwd2):
    """tconn xy-forward rotated by the allowed angle closest to gconn's
    (:222-248)."""
    base = T.angle_between2D(gfwd2, tfwd2)
    min_plain = jnp.minimum(jnp.abs(base), jnp.abs(2 * jnp.pi + base))

    rot = T.rotate_vector2D(tfwd2[None, :], angles * (jnp.pi / 180.0))  # [A,2]
    xy = T.angle_between2D(gfwd2[None, :], rot)                          # [A]
    xy = jnp.where((xy >= jnp.pi) & (xy < 2 * jnp.pi), 2 * jnp.pi - xy, xy)
    xy = jnp.where((xy >= -2 * jnp.pi) & (xy < -jnp.pi), 2 * jnp.pi + xy, xy)
    xy = jnp.where(angle_mask, jnp.abs(xy), jnp.inf)
    best = jnp.argmin(xy)
    better = xy[best] < min_plain
    out = jnp.where(better, rot[best], tfwd2)
    return jnp.where(has_angles, out, gfwd2)


class FurnitureSawyerGenEnv(FurnitureSawyerDenseRewardEnv):
    """Dense env + jitted scripted assembly policy
    (reference ``FurnitureSawyerGenEnv``, ``furniture_sawyer_gen.py:13``)."""

    def __init__(self, config: EnvConfig | None = None, model=None):
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
            t_fwd=jnp.zeros(2),
            t_fwd_valid=jnp.array(False),
            z_move_g_prev=jnp.array(jnp.inf, jnp.float32),
            noise_wp=jax.random.uniform(k1, (3,), minval=0.0, maxval=2 * r),
            noise_ng=jax.random.uniform(k2, (3,), minval=0.0, maxval=2 * r),
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
            t_fwd_valid=jnp.array(False),
            z_move_g_prev=jnp.array(jnp.inf, jnp.float32),
        )

    def scripted_action(self, gen: GenPolicyState, env_state):
        """One planner decision (the body of the reference's generate_demos
        inner loop, furniture_sawyer_gen.py:430-697). Returns (action8, gen)."""
        st = self._st
        s = gen.part
        fk_out = K.fk(self.robot, env_state.qpos)
        parts = env_state.parts

        gripbase = self._gripbase_pos(fk_out)
        grip_pos, hand_quat = K.site_world(self.robot, fk_out, "right")
        grip_up = T.up_vector_from_quat(hand_quat)
        grip_fwd = T.forward_vector_from_quat(hand_quat)
        griptip = K.tip_world(self.robot, fk_out, "right")

        gl = self._site_pos(parts, jnp.asarray(st["gl"])[s])
        gr = self._site_pos(parts, jnp.asarray(st["gr"])[s])
        g_pos = 0.5 * (gl + gr)
        g_vec = gr - gl

        gconn = jnp.asarray(st["leg_site"])[s]
        tconn = jnp.asarray(st["table_site"])[s]
        gconn_pos, gconn_quat = self._conn_pose(parts, gconn)
        tconn_pos, tconn_quat = self._conn_pose(parts, tconn)
        g_up = T.up_vector_from_quat(gconn_quat)
        t_up = T.up_vector_from_quat(tconn_quat)
        g_fwd = T.forward_vector_from_quat(gconn_quat)
        t_fwd3 = T.forward_vector_from_quat(tconn_quat)

        m = self.model
        angles = jnp.asarray(m.conn_angles, jnp.float32)[gconn]
        amask = jnp.asarray(m.conn_angle_mask)[gconn]
        has_angles = jnp.asarray(m.conn_has_angles)[gconn]
        z_conn = jnp.asarray(self._z_conn)[s]

        def cached_t_fwd(gen):
            fresh = _closest_xy_fwd(angles, amask, has_angles, g_fwd[:2], t_fwd3[:2])
            tf = jnp.where(gen.t_fwd_valid, gen.t_fwd, fresh)
            return tf, gen._replace(t_fwd=tf, t_fwd_valid=jnp.array(True))

        a = jnp.zeros(8)

        # --- phase branches; each returns (action, gen) ---
        def ph_init_grip(gen):
            act = a.at[6].set(-1.0)
            d, reached = _move_xyz(
                gripbase, gen.safepos[gen.safepos_idx], self.eps
            )
            act = act.at[0:3].set(d)
            idx = jnp.where(reached, gen.safepos_idx + 1, gen.safepos_idx)
            advance = idx >= gen.safepos_len
            return act, gen._replace(
                safepos_idx=jnp.where(advance, 0, idx),
                phase=jnp.where(advance, XY_MOVE_G, gen.phase).astype(jnp.int32),
            )

        def ph_xy_move_g(gen):
            act = a.at[6].set(-1.0)
            d, reached = _move_xy(grip_pos[:2], g_pos[:2], self.eps)
            act = act.at[0:2].set(d)
            return act, gen._replace(
                phase=jnp.where(reached, ALIGN_G, gen.phase).astype(jnp.int32)
            )

        def ph_align_g(gen):
            # world-axis rot actions: yz-plane ccw = +x, xz-plane ccw = -y,
            # xy-plane ccw = +z
            act = a.at[6].set(-1.0)
            # action sign rule for row-convention vectors (see arm._ik_prepare):
            # euler = (-phi_x, +phi_y, -phi_z) for CCW in-plane corrections
            ac_z = -_align_gripsites(grip_fwd[:2], g_vec[:2], self.rot_eps)
            tgt = jnp.array([0.0, -1.0])
            ac_x = -_align2D(grip_up[1:3], tgt, self.rot_eps)
            ac_y = _align2D(grip_up[0::2], tgt, self.rot_eps)
            rot_zero = (ac_x == 0) & (ac_y == 0) & (ac_z == 0)
            d, reached = _move_xy(grip_pos[:2], g_pos[:2], self.eps)
            act = jnp.where(
                rot_zero,
                act.at[0:2].set(d),
                act.at[3:6].set(jnp.stack([ac_x, ac_y, ac_z])),
            )
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
            # on grasp: safepos <- gripbase + waypoints (offsets)
            off = jnp.asarray(self._wp)[gen.part, :, :3]
            tgt = gripbase[None, :] + off + gen.noise_wp[None, :]
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
                self.eps,
            )
            act = act.at[0:3].set(jnp.where(done_wp, 0.0, d))
            idx = jnp.where(reached & ~done_wp, gen.safepos_idx + 1, gen.safepos_idx)
            return act, gen._replace(
                safepos_idx=jnp.where(done_wp, 0, idx),
                phase=jnp.where(done_wp, ALIGN_CONN, gen.phase).astype(jnp.int32),
            )

        def ph_align_conn(gen):
            act = a.at[6].set(1.0)
            ac_x = -_align2D(g_up[1:3], t_up[1:3], self.rot_eps)
            ac_y = _align2D(g_up[0::2], t_up[0::2], self.rot_eps)
            rot_zero = (ac_x == 0) & (ac_y == 0)
            tf, gen2 = cached_t_fwd(gen)
            ac_z = -_align2D(g_fwd[:2], tf, self.rot_eps)
            gen = jax.tree.map(
                lambda new, old: jnp.where(rot_zero, new, old), gen2, gen
            )
            done_rot = rot_zero & (ac_z == 0)
            act = jnp.where(
                rot_zero,
                act.at[5].set(ac_z),
                act.at[3:5].set(jnp.stack([ac_x, ac_y])),
            )
            return act, gen._replace(
                phase=jnp.where(done_rot, XY_MOVE_CONN, gen.phase).astype(jnp.int32),
                t_fwd_valid=gen.t_fwd_valid & ~done_rot,
            )

        def ph_xy_move_conn(gen):
            act = a.at[6].set(1.0)
            d, reached = _move_xy(gconn_pos[:2], tconn_pos[:2], self.eps)
            act = act.at[0:2].set(d)
            return act, gen._replace(
                phase=jnp.where(reached, Z_MOVE_CONN, gen.phase).astype(jnp.int32)
            )

        def ph_z_move_conn(gen):
            act = a.at[6].set(1.0)
            d = _move_z(
                gconn_pos, tconn_pos, self.eps, z_conn + self._z_finedist
            )
            act = act.at[0:3].set(d)
            reached = jnp.all(d == 0)
            return act, gen._replace(
                phase=jnp.where(reached, ALIGN_CONN_FINE, gen.phase).astype(
                    jnp.int32
                )
            )

        def ph_align_conn_fine(gen):
            act = a.at[6].set(1.0)
            ac_x = -_align2D(g_up[1:3], t_up[1:3], self.rot_eps_fine)
            ac_y = _align2D(g_up[0::2], t_up[0::2], self.rot_eps_fine)
            rot_zero = (ac_x == 0) & (ac_y == 0)
            tf, gen2 = cached_t_fwd(gen)
            ac_z = -_align2D(g_fwd[:2], tf, self.rot_eps_fine)
            gen = jax.tree.map(
                lambda new, old: jnp.where(rot_zero, new, old), gen2, gen
            )
            d, reached = _move_xy(gconn_pos[:2], tconn_pos[:2], self.eps_fine)
            act = jnp.where(
                rot_zero,
                jnp.where(
                    ac_z == 0,
                    act.at[0:2].set(d),
                    act.at[5].set(ac_z),
                ),
                act.at[3:5].set(jnp.stack([ac_x, ac_y])),
            )
            advance = rot_zero & (ac_z == 0) & reached
            return act, gen._replace(
                phase=jnp.where(advance, Z_MOVE_CONN_FINE, gen.phase).astype(
                    jnp.int32
                ),
                t_fwd_valid=gen.t_fwd_valid & ~advance,
            )

        def ph_z_move_conn_fine(gen):
            act = a.at[6].set(1.0)
            d = _move_z(
                gconn_pos, tconn_pos, self.eps_fine, z_conn, fine=self.fine_mag
            )
            ac_x = -_align2D(g_up[1:3], t_up[1:3], self.rot_eps_fine)
            ac_y = _align2D(g_up[0::2], t_up[0::2], self.rot_eps_fine)
            rot_zero = (ac_x == 0) & (ac_y == 0)
            tf, gen2 = cached_t_fwd(gen)
            ac_z0 = -_align2D(g_fwd[:2], tf, self.rot_eps_fine)
            ac_z = jnp.where(rot_zero, ac_z0, 0.0)
            gen = jax.tree.map(
                lambda new, old: jnp.where(rot_zero, new, old), gen2, gen
            )
            act = act.at[0:3].set(d).at[3:6].set(jnp.stack([ac_x, ac_y, ac_z]))
            done = jnp.all(act[0:6] == 0)
            act = jnp.where(done, act.at[7].set(1.0), act)
            # safepos <- gripbase + nogrip_safepos offsets
            off = jnp.asarray(self._ng)[gen.part, :, :3]
            tgt = gripbase[None, :] + off + gen.noise_ng[None, :]
            return act, gen._replace(
                phase=jnp.where(done, MOVE_NOGRIP_SAFEPOS, gen.phase).astype(
                    jnp.int32
                ),
                safepos=jnp.where(done, tgt, gen.safepos),
                safepos_len=jnp.where(
                    done, jnp.asarray(self._ng_len)[gen.part], gen.safepos_len
                ),
                safepos_idx=jnp.where(done, 0, gen.safepos_idx),
            )

        def ph_move_nogrip(gen):
            act = a.at[6].set(-1.0)
            done_wp = gen.safepos_idx >= gen.safepos_len
            d, reached = _move_xyz(
                gripbase,
                gen.safepos[jnp.minimum(gen.safepos_idx, MAXW - 1)],
                self.eps,
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

        # magnitudes + min-rot normalization + clip (:679-683, :117-124)
        action = action.at[0:3].multiply(self.lat_mag)
        action = action.at[3:6].multiply(self.rot_mag)
        fine = (gen.phase == ALIGN_CONN_FINE) | (gen.phase == Z_MOVE_CONN_FINE)
        min_rot = jnp.where(fine, self.min_rot_act_fine, self.min_rot_act)
        rot = action[3:6]
        small = (jnp.abs(rot) > 0) & (jnp.abs(rot) < min_rot)
        rot = jnp.where(small, jnp.sign(rot) * min_rot, rot)
        action = action.at[3:6].set(rot)
        action = jnp.clip(action, -1.0, 1.0)

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
        return action, gen

    # -- batched generation ------------------------------------------------------

    def generate_demos(
        self,
        n_demos: int,
        seed: int = 0,
        batch: int | None = None,
        store_path: str | None = None,
    ):
        """Batched scripted demo generation: roll ``batch`` parallel scripted
        episodes to ``max_success_steps``, return the successful
        (obs, action, reward) trajectories (host-side; reference
        ``generate_demos`` :347-731 + DemoRecorder). When ``store_path`` is
        given, successful trajectories are persisted through the native
        multithreaded trajectory store (``native/traj_store.cpp``)."""
        batch = batch or max(n_demos, 8)
        key = jax.random.PRNGKey(seed)
        k_reset, k_gen = jax.random.split(key)

        reset = jax.jit(jax.vmap(self.reset))
        init_pol = jax.jit(jax.vmap(self.init_policy_state))

        def one_step(carry, _):
            env_s, gen_s = carry
            action, gen_s = jax.vmap(self.scripted_action)(gen_s, env_s)
            env_s, obs, rew, done, info = jax.vmap(self.step)(env_s, action)
            return (env_s, gen_s), (action, rew, info["success"])

        @jax.jit
        def rollout(env_s, gen_s):
            (env_s, gen_s), traj = jax.lax.scan(
                one_step, (env_s, gen_s), None, length=self.max_success_steps
            )
            return env_s, traj

        env_s = reset(jax.random.split(k_reset, batch))
        gen_s = init_pol(env_s, jax.random.split(k_gen, batch))
        env_s, (actions, rewards, successes) = rollout(env_s, gen_s)

        succ = np.asarray(jnp.any(successes, axis=0))       # [B]
        demos = []
        for b in np.flatnonzero(succ)[:n_demos]:
            t_end = int(np.asarray(jnp.argmax(successes[:, b]))) + 1
            demos.append(
                {
                    "actions": np.asarray(actions[:t_end, b]),
                    "rewards": np.asarray(rewards[:t_end, b]),
                }
            )
        if store_path is not None and demos:
            from ..utils.traj_store import TrajStore

            with TrajStore(store_path, "w") as ts:
                for d in demos:
                    ts.append(d["actions"], d["rewards"])
                ts.flush()
        return demos, float(succ.mean())
