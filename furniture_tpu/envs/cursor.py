"""Batched Cursor environment: the reference's simplest agent, rebuilt as a
pure jitted step function.

Reference semantics being reproduced (citations into /root/reference):
* action layout, 15-dim: 2 cursors × (move3, rotate3, select1) + connect1
  (``env/furniture.py:800-845`` ``_step_discrete``; dof at
  ``furniture_cursor.py:50-56``)
* boundary-clamped cursor teleport (``env/furniture.py:708-722``)
* rigid-group co-move/rotate with out-of-bounds revert
  (``env/furniture.py:724-747``, ``_is_inside`` :775-783)
* selection by cursor-geom overlap, first non-selected group wins
  (``env/furniture.py:785-798``, cursor geoms have margin 0.05:
  ``models/assets/robots/cursor/robot.xml``)
* connect state machine needing ``num_connect_steps=10`` consecutive aligned
  connect actions with pose interpolation, then a snap + weld
  (``env/furniture.py:926-1041`` ``_try_connect``, ``:847-924`` ``_connect``)
* alignment predicate over allowed angles (``env/furniture.py:1057-1153``)
* per-control-step physics with all part velocities zeroed and held groups
  gravity-compensated (``env/furniture.py:2857-2887``)
* sparse reward: success_reward × newly-connected (``env/furniture.py:482-541``)

The whole environment state is a NamedTuple of arrays; ``step`` is pure and
``vmap``-batched over thousands of envs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import transforms as T
from ..config import EnvConfig
from ..models import CompiledModel, compile_model
from ..physics import PartState, init_state
from ..physics.engine import make_substep, physics_tables, substeps

_CURSOR_MARGIN = 0.06  # cursor box half 0.01 + geom margin 0.05


class CursorState(NamedTuple):
    """Complete per-env state (a pytree of arrays)."""

    parts: PartState
    group: jax.Array            # [P] rigid-group label (union-find flattened)
    cursor_pos: jax.Array       # [2,3]
    selected: jax.Array         # [2] part index or -1
    connect_step: jax.Array     # scalar int
    num_connected: jax.Array    # scalar int
    conn_connected: jax.Array   # [C] bool: site already used
    weld_active: jax.Array      # [W] bool (bookkeeping / obs parity)
    subtask: jax.Array          # [2] part ids of next subtask (-1,-1 if done)
    connected_body1: jax.Array  # scalar part idx (-1: none) for post-settle snap
    connected_body1_pos: jax.Array   # [3]
    connected_body1_quat: jax.Array  # [4]
    t: jax.Array                # scalar int episode step


class CursorEnv:
    """Host-side factory for the pure reset/step functions of one furniture
    model. The returned functions close over static model arrays; jit/vmap
    them from the caller (see ``furniture_tpu.api`` for the gym-like host
    wrapper and ``furniture_tpu.parallel`` for sharded rollouts)."""

    def __init__(self, config: EnvConfig | None = None, model: CompiledModel | None = None):
        self.config = config or EnvConfig()
        self.model = model or compile_model(self.config.furniture_name)
        self.tables = physics_tables(self.model)
        self.substep = make_substep(self.tables, self.config.sim)
        m = self.model
        self._P = m.n_parts
        self._C = m.n_conn
        self._W = m.n_welds
        # success criterion: config override, else recipe num_connects, else W
        nc = self.config.num_connects
        self.success_num_connects = int(nc if nc is not None else m.num_connects)
        self.dof = 15

    # -- geometry helpers --------------------------------------------------

    def _conn_world(self, parts: PartState):
        m = self.model
        cp = jnp.asarray(m.conn_pos, jnp.float32)
        part = jnp.asarray(m.conn_part)
        pos = parts.pos[part] + T.quat_rotate(parts.quat[part], cp)
        quat = parts.quat[part]  # conn sites carry identity site quat
        return pos, quat

    def _site_world(self, parts: PartState):
        m = self.model
        sp = jnp.asarray(m.site_pos, jnp.float32)
        part = jnp.asarray(m.site_part)
        return parts.pos[part] + T.quat_rotate(parts.quat[part], sp)

    def _group_bbox(self, parts: PartState, group, ref_part):
        """Bounding box over all sites of ``ref_part``'s group — including the
        origin, replicating the min/max zero-init of
        ``env/furniture.py:758-762``."""
        m = self.model
        site_w = self._site_world(parts)                     # [S,3]
        in_group = group[jnp.asarray(m.site_part)] == group[ref_part]
        big = 1e9
        lo = jnp.min(
            jnp.where(in_group[:, None], site_w, big), axis=0
        )
        hi = jnp.max(
            jnp.where(in_group[:, None], site_w, -big), axis=0
        )
        lo = jnp.minimum(lo, 0.0)
        hi = jnp.maximum(hi, 0.0)
        return lo, hi

    def _move_group(self, parts: PartState, group, base_part, move_offset, target_quat):
        """Rigidly rotate ``base_part``'s group about the base part's origin to
        ``target_quat`` and translate by ``move_offset``
        (``env/furniture.py:724-747`` via ``transform_to_target_quat``)."""
        in_group = group == group[base_part]                 # [P]
        base_pose = jnp.concatenate([parts.pos[base_part], parts.quat[base_part]])
        qpos = jnp.concatenate([parts.pos, parts.quat], axis=-1)  # [P,7]
        new_pos, new_quat = T.transform_to_target_quat(
            base_pose[None], qpos, target_quat[None]
        )
        new_pos = new_pos + move_offset[None]
        pos = jnp.where(in_group[:, None], new_pos, parts.pos)
        quat = jnp.where(in_group[:, None], new_quat, parts.quat)
        return parts._replace(pos=pos, quat=quat)

    def _part_overlaps_cursor(self, parts: PartState, cursor_pos):
        """Per-part: does the cursor point-with-margin touch any geom?"""
        tb = self.tables
        gpart = jnp.asarray(tb["geom_part"])
        gp = jnp.asarray(tb["geom_pos"], jnp.float32)
        gq = jnp.asarray(tb["geom_quat"], jnp.float32)
        sizes = jnp.asarray(tb["_box_sizes"], jnp.float32)
        wpos = parts.pos[gpart] + T.quat_rotate(parts.quat[gpart], gp)
        wquat = T.quat_mul(parts.quat[gpart], gq)
        local = T.quat_rotate(T.quat_inv(wquat), cursor_pos[None] - wpos)  # [G,3]
        d = jnp.maximum(jnp.abs(local) - sizes, 0.0)
        dist = jnp.linalg.norm(d, axis=-1)                   # [G]
        touch_geom = dist <= _CURSOR_MARGIN
        return (
            jax.ops.segment_max(
                touch_geom.astype(jnp.int32), gpart, num_segments=self._P
            )
            > 0
        )

    # -- alignment predicate ----------------------------------------------

    def _alignment(self, parts: PartState):
        """Vectorized ``_is_aligned`` over all C×C conn-site pairs.

        Returns (aligned[C,C] bool, target_quat[C,C,4]) — target is the
        world quat the *first* site's frame should take
        (``env/furniture.py:1057-1153``)."""
        m = self.model
        cfg = self.config.align
        pos, quat = self._conn_world(parts)                  # [C,3],[C,4]
        up = T.up_vector_from_quat(quat)                     # [C,3]
        fwd = T.forward_vector_from_quat(quat)

        C = self._C
        pos1 = pos[:, None]
        pos2 = pos[None, :]
        d12 = pos2 - pos1
        pos_dist = jnp.linalg.norm(d12, axis=-1)             # [C,C]
        u12 = d12 / jnp.maximum(pos_dist[..., None], 1e-12)
        rot_dist_up = jnp.einsum("id,jd->ij", up, up) / (
            jnp.linalg.norm(up, axis=-1)[:, None]
            * jnp.linalg.norm(up, axis=-1)[None, :]
        )
        project1_2 = jnp.einsum("ipd,ipd->ip", up[:, None].repeat(C, 1), u12)
        project2_1 = jnp.einsum("jd,ijd->ij", up, -u12)

        # allowed-angle case: rotate fwd_i about up_i by each table angle
        angles = jnp.asarray(m.conn_angles, jnp.float32)     # [C,A]
        amask = jnp.asarray(m.conn_angle_mask)               # [C,A]
        f_rot = T.rotate_vector(
            fwd[:, None, :], up[:, None, :], angles
        )                                                    # [C,A,3]
        cos_fa = jnp.einsum("iad,jd->ija", f_rot, fwd)       # [C,C,A]
        ok_a = (cos_fa > cfg.rot_dist_forward) & amask[:, None, :]
        any_ok = jnp.any(ok_a, axis=-1)                      # [C,C]
        first_a = jnp.argmax(ok_a, axis=-1)                  # [C,C]
        f_ang = jnp.take_along_axis(
            jnp.broadcast_to(f_rot[:, None], (C, C) + f_rot.shape[1:]),
            first_a[..., None, None].repeat(3, -1),
            axis=2,
        )[:, :, 0]                                           # [C,C,3]

        # free-angle case (env/furniture.py:1088-1105)
        cos_ff = jnp.einsum("id,jd->ij", fwd, fwd)
        f_pos = T.rotate_vector_cos_siml(
            fwd[:, None], up[:, None], cos_ff, 1.0
        )                                                    # [C,C,3]
        f_neg = T.rotate_vector_cos_siml(fwd[:, None], up[:, None], cos_ff, -1.0)
        cp = jnp.einsum("ijd,jd->ij", f_pos, fwd)
        cn = jnp.einsum("ijd,jd->ij", f_neg, fwd)
        f_free = jnp.where((cp > cn)[..., None], f_pos, f_neg)

        has_ang = jnp.asarray(m.conn_has_angles)[:, None]    # [C,1]
        fwd_aligned = jnp.where(has_ang, any_ok, True)
        f_chosen = jnp.where(has_ang[..., None], f_ang, f_free)
        target_quat = T.lookat_to_quat(
            jnp.broadcast_to(up[:, None], f_chosen.shape), f_chosen
        )                                                    # [C,C,4]

        up_ok = rot_dist_up > cfg.rot_dist_up
        proj_ok = (jnp.abs(project1_2) > cfg.project_dist) & (
            jnp.abs(project2_1) > cfg.project_dist
        )
        aligned = (
            (pos_dist < cfg.pos_dist) & up_ok & fwd_aligned & proj_ok
        ) | ((pos_dist < cfg.pos_dist / 2) & up_ok & fwd_aligned)
        return aligned, target_quat

    # -- connect machinery -------------------------------------------------

    def _find_connectable(self, state: CursorState):
        """First eligible aligned conn-site pair between the two held groups
        (site iteration order of ``env/furniture.py:978-988``)."""
        m = self.model
        g1 = state.group[state.selected[0]]
        g2 = state.group[state.selected[1]]
        conn_group = state.group[jnp.asarray(m.conn_part)]   # [C]
        in1 = conn_group == g1
        in2 = conn_group == g2
        pa = jnp.asarray(m.conn_pair_a)
        pb = jnp.asarray(m.conn_pair_b)
        compl_ = (pa[:, None] == pb[None, :]) & (pb[:, None] == pa[None, :])
        free = ~state.conn_connected
        elig = (
            in1[:, None]
            & in2[None, :]
            & compl_
            & free[:, None]
            & free[None, :]
        )
        # weld-row existence gate (env/furniture.py:966-972)
        wg1 = state.group[jnp.asarray(m.weld_part1)]
        wg2 = state.group[jnp.asarray(m.weld_part2)]
        gate = jnp.any(
            ((wg1 == g1) | (wg1 == g2)) & ((wg2 == g1) | (wg2 == g2))
        ) if self._W else jnp.array(False)

        aligned, target_quat = self._alignment(state.parts)
        ok = elig & aligned & gate
        flat = ok.reshape(-1)
        found = jnp.any(flat)
        idx = jnp.argmax(flat)
        s1 = idx // self._C
        s2 = idx % self._C
        return found, s1, s2, target_quat[s1, s2]

    def _snap_connect(self, state: CursorState, s1, s2, target_quat) -> CursorState:
        """Final connect: snap site2's group onto site1, weld, merge groups
        (``env/furniture.py:847-924`` + ``_align_connectors`` :1224)."""
        m = self.model
        conn_part = jnp.asarray(m.conn_part)
        p1 = conn_part[s1]
        p2 = conn_part[s2]
        cpos, _ = self._conn_world(state.parts)
        site1_pos = cpos[s1]
        site2_pos = cpos[s2]

        # rigid map x -> A(x - site2) + site1 with A = target ∘ q(part2)^-1
        A = T.quat_mul(target_quat, T.quat_inv(state.parts.quat[p2]))
        in2 = state.group == state.group[p2]
        new_pos = T.quat_rotate(A[None], state.parts.pos - site2_pos[None]) + site1_pos[None]
        new_quat = T.quat_mul(A[None], state.parts.quat)
        parts = state.parts._replace(
            pos=jnp.where(in2[:, None], new_pos, state.parts.pos),
            quat=jnp.where(in2[:, None], new_quat, state.parts.quat),
            lin_vel=jnp.zeros_like(state.parts.lin_vel),
            ang_vel=jnp.zeros_like(state.parts.ang_vel),
        )

        # floor lift: union bbox of both groups must have min z >= 0
        lo1, _ = self._group_bbox(parts, state.group, p1)
        lo2, _ = self._group_bbox(parts, state.group, p2)
        min_z = jnp.minimum(lo1[2], lo2[2])
        lift = jnp.where(min_z < 0, -min_z, 0.0)
        in_either = (state.group == state.group[p1]) | in2
        parts = parts._replace(
            pos=parts.pos.at[:, 2].add(jnp.where(in_either, lift, 0.0))
        )

        # weld bookkeeping + group merge (g(p1) label <- g(p2),
        # env/furniture.py:2749-2760)
        weld_idx = jnp.asarray(m.weld_lookup)[p1, p2]
        weld_active = jnp.where(
            (jnp.arange(self._W) == weld_idx) & (weld_idx >= 0),
            True,
            state.weld_active,
        )
        g1 = state.group[p1]
        g2 = state.group[p2]
        group = jnp.where(state.group == g1, g2, state.group)

        conn_connected = state.conn_connected.at[s1].set(True).at[s2].set(True)

        # next subtask: first weld whose parts are in different groups
        # (env/furniture.py:2723-2736)
        if self._W:
            wg1 = group[jnp.asarray(m.weld_part1)]
            wg2 = group[jnp.asarray(m.weld_part2)]
            open_w = wg1 != wg2
            any_open = jnp.any(open_w)
            w = jnp.argmax(open_w)
            subtask = jnp.where(
                any_open,
                jnp.stack([jnp.asarray(m.weld_part1)[w], jnp.asarray(m.weld_part2)[w]]),
                jnp.array([-1, -1]),
            )
        else:
            subtask = jnp.array([-1, -1])

        return state._replace(
            parts=parts,
            group=group,
            weld_active=weld_active,
            conn_connected=conn_connected,
            num_connected=state.num_connected + 1,
            selected=state.selected.at[1].set(-1),
            connect_step=jnp.array(0),
            connected_body1=p1,
            connected_body1_pos=parts.pos[p1],
            connected_body1_quat=parts.quat[p1],
            subtask=subtask,
        )

    def _interp_connect(self, state: CursorState, s1, s2, target_quat) -> CursorState:
        """Intermediate connect step: ease site2's group toward the snap target
        (``env/furniture.py:995-1036``; per-step recomputation replaces the
        reference's precomputed slerp/linspace schedule — the terminal snap
        is identical)."""
        m = self.model
        conn_part = jnp.asarray(m.conn_part)
        p2 = conn_part[s2]
        cpos, _ = self._conn_world(state.parts)
        site1_pos = cpos[s1]
        site2_pos = cpos[s2]

        A = T.quat_mul(target_quat, T.quat_inv(state.parts.quat[p2]))
        body_target_pos = T.quat_rotate(A, state.parts.pos[p2] - site2_pos) + site1_pos
        body_target_quat = T.quat_mul(A, state.parts.quat[p2])

        N = self.config.num_connect_steps
        k = state.connect_step
        frac = 0.9 / jnp.maximum(N - k, 1).astype(jnp.float32)
        cur_pos = state.parts.pos[p2]
        cur_quat = state.parts.quat[p2]
        step_pos = cur_pos + frac * (body_target_pos - cur_pos)
        step_quat = T.quat_slerp(cur_quat, body_target_quat, frac)

        parts = self._move_group(
            state.parts, state.group, p2, step_pos - cur_pos,
            step_quat,
        )
        parts = parts._replace(
            lin_vel=jnp.zeros_like(parts.lin_vel),
            ang_vel=jnp.zeros_like(parts.ang_vel),
        )
        return state._replace(parts=parts, connect_step=state.connect_step + 1)

    def _try_connect(self, state: CursorState) -> CursorState:
        found, s1, s2, tq = self._find_connectable(state)

        def on_found(st):
            return jax.lax.cond(
                st.connect_step < self.config.num_connect_steps,
                lambda s: self._interp_connect(s, s1, s2, tq),
                lambda s: self._snap_connect(s, s1, s2, tq),
                st,
            )

        def on_missing(st):
            return st._replace(connect_step=jnp.array(0))

        return jax.lax.cond(found, on_found, on_missing, state)

    # -- cursor sub-actions ------------------------------------------------

    def _cursor_update(self, state: CursorState, idx: int, act7) -> CursorState:
        cfg = self.config
        move = act7[0:3] * cfg.move_speed
        rot = act7[3:6] * cfg.rotate_speed
        select = act7[6] > 0

        selected = jnp.where(select, state.selected[idx], -1)
        state = state._replace(selected=state.selected.at[idx].set(selected))

        # move cursor with boundary check (env/furniture.py:708-722)
        new_cpos = state.cursor_pos[idx] + move
        b = cfg.cursor_boundary
        move_ok = jnp.all(jnp.abs(new_cpos) < b) & (
            new_cpos[2] >= cfg.move_speed * 0.45
        )
        cursor_pos = jnp.where(move_ok, new_cpos, state.cursor_pos[idx])
        state = state._replace(
            cursor_pos=state.cursor_pos.at[idx].set(cursor_pos)
        )

        # move held object group (with revert when out of bounds)
        holding = state.selected[idx] >= 0

        def do_move_obj(st: CursorState) -> CursorState:
            sel = jnp.maximum(st.selected[idx], 0)
            base_quat = st.parts.quat[sel]
            target_quat = T.euler_to_quat(rot, base_quat)
            moved = self._move_group(st.parts, st.group, sel, move, target_quat)
            lo, hi = self._group_bbox(moved, st.group, sel)
            inside = jnp.all(lo >= jnp.array([-b, -b, -0.05])) & jnp.all(
                hi <= jnp.array([b, b, b])
            )
            parts = jax.tree.map(
                lambda new, old: jnp.where(inside, new, old), moved, st.parts
            )
            # revert cursor too if the object couldn't move
            cp = jnp.where(
                inside, st.cursor_pos[idx], st.cursor_pos[idx] - move
            )
            return st._replace(
                parts=parts, cursor_pos=st.cursor_pos.at[idx].set(cp)
            )

        state = jax.lax.cond(
            move_ok & holding, do_move_obj, lambda s: s, state
        )

        # acquire selection (env/furniture.py:785-798)
        def do_select(st: CursorState) -> CursorState:
            overlap = self._part_overlaps_cursor(st.parts, st.cursor_pos[idx])
            sel0 = st.selected[0]
            sel1 = st.selected[1]
            g = st.group
            taken = jnp.zeros(self._P, bool)
            taken = jnp.where(sel0 >= 0, g == g[jnp.maximum(sel0, 0)], taken)
            taken = jnp.where(
                sel1 >= 0, taken | (g == g[jnp.maximum(sel1, 0)]), taken
            )
            cand = overlap & ~taken
            any_c = jnp.any(cand)
            first = jnp.argmax(cand)
            new_sel = jnp.where(any_c, first, -1)
            return st._replace(selected=st.selected.at[idx].set(new_sel))

        state = jax.lax.cond(
            move_ok & select & ~holding, do_select, lambda s: s, state
        )
        return state

    # -- public API --------------------------------------------------------

    def reset(self, key) -> CursorState:
        """Pure reset: randomized placement + settle
        (``env/furniture.py:1406-1653``, ``placement_sampler.py:137-190``)."""
        m = self.model
        cfg = self.config
        P = self._P
        k_xy, k_rot = jax.random.split(key)

        base_pos = jnp.asarray(m.part_init_pos, jnp.float32)
        base_quat = jnp.asarray(m.part_init_quat, jnp.float32)
        r = cfg.furn_xyz_rand
        xy = jax.random.uniform(k_xy, (P, 2), minval=-r, maxval=r)
        pos = base_pos + jnp.concatenate(
            [xy, jnp.full((P, 1), 0.01)], axis=-1
        )
        # rotation noise: the reference samples uniform(low=max, high=max) —
        # i.e. a *constant* offset of furn_rot_rand degrees
        # (placement_sampler.py:125-137); replicated for parity.
        rot = jnp.full((P, 3), 0.0).at[:, 0].set(cfg.furn_rot_rand)
        quat = T.euler_to_quat(rot, base_quat)

        # overlap rejection (horizontal-radius circles,
        # placement_sampler.py:163-188): resample offending parts a few
        # rounds; later-indexed parts move (reference places in order).
        radius = jnp.asarray(m.part_horiz_radius, jnp.float32)

        def resample_round(i, carry):
            pos, key = carry
            key, sub = jax.random.split(key)
            d = jnp.linalg.norm(
                pos[:, None, :2] - pos[None, :, :2], axis=-1
            )
            rr = radius[:, None] + radius[None, :]
            lower = jnp.tril(jnp.ones((P, P), bool), k=-1)  # j < i pairs
            bad = jnp.any((d <= rr) & lower, axis=1)        # part i overlaps earlier part
            new_xy = base_pos[:, :2] + jax.random.uniform(
                sub, (P, 2), minval=-r, maxval=r
            )
            pos = pos.at[:, :2].set(
                jnp.where(bad[:, None], new_xy, pos[:, :2])
            )
            return pos, key

        pos, _ = jax.lax.fori_loop(0, 10, resample_round, (pos, k_rot))

        parts = init_state(pos, quat)
        group = jnp.arange(P, dtype=jnp.int32)

        # settle: 10 × (zero vel, 10 substeps, clip vel) with gravity
        # compensation (env/furniture.py:1535-1540: _stop/_slow_objects)
        gscale = jnp.zeros(P)

        def settle(i, p):
            p = p._replace(
                lin_vel=jnp.zeros_like(p.lin_vel),
                ang_vel=jnp.zeros_like(p.ang_vel),
            )
            p = substeps(self.substep, p, group, gscale, 10)
            clip = self.config.sim.slow_clip
            return p._replace(
                lin_vel=jnp.clip(p.lin_vel, -clip, clip),
                ang_vel=jnp.clip(p.ang_vel, -clip, clip),
            )

        parts = jax.lax.fori_loop(0, 10, settle, parts)
        parts = parts._replace(
            lin_vel=jnp.zeros_like(parts.lin_vel),
            ang_vel=jnp.zeros_like(parts.ang_vel),
        )

        # initial subtask = first weld pair (env/furniture.py:2723-2736)
        if self._W:
            subtask = jnp.stack(
                [
                    jnp.asarray(m.weld_part1)[0],
                    jnp.asarray(m.weld_part2)[0],
                ]
            )
        else:
            subtask = jnp.array([-1, -1])

        return CursorState(
            parts=parts,
            group=group,
            cursor_pos=jnp.array(
                [
                    [-0.2, 0.0, cfg.move_speed / 2],
                    [0.2, 0.0, cfg.move_speed / 2],
                ],
                jnp.float32,
            ),  # env/furniture.py:1777-1779
            selected=jnp.array([-1, -1], jnp.int32),
            connect_step=jnp.array(0, jnp.int32),
            num_connected=jnp.array(0, jnp.int32),
            conn_connected=jnp.zeros(self._C, bool),
            weld_active=jnp.zeros(self._W, bool),
            subtask=subtask.astype(jnp.int32),
            connected_body1=jnp.array(-1, jnp.int32),
            connected_body1_pos=jnp.zeros(3),
            connected_body1_quat=jnp.array([1.0, 0, 0, 0]),
            t=jnp.array(0, jnp.int32),
        )

    def observe(self, state: CursorState) -> dict:
        """Observation dict matching the reference layout
        (``env/furniture.py:1344-1389``, ``furniture_cursor.py:87-106``)."""
        obs = {}
        if self.config.object_ob:
            obs["object_ob"] = jnp.concatenate(
                [state.parts.pos, state.parts.quat], axis=-1
            ).reshape(-1)
        if self.config.robot_ob:
            obs["robot_ob"] = jnp.concatenate(
                [
                    state.cursor_pos.reshape(-1),
                    (state.selected >= 0).astype(jnp.float32),
                ]
            )
        if self.config.subtask_ob:
            obs["subtask_ob"] = state.subtask + 1
        return obs

    def step(self, state: CursorState, action):
        """One control step. Returns (state, obs, reward, done, info)."""
        cfg = self.config
        prev_connected = state.num_connected

        # per-cursor discrete action (env/furniture.py:800-836)
        state = self._cursor_update(state, 0, action[0:7])
        state = self._cursor_update(state, 1, action[7:14])

        # connect (env/furniture.py:836-845)
        both = (state.selected[0] >= 0) & (state.selected[1] >= 0)
        do_connect = (action[14] > 0) & both
        state = jax.lax.cond(
            do_connect,
            self._try_connect,
            lambda s: s._replace(connect_step=jnp.array(0)),
            state,
        )

        # physics control step (env/furniture.py:2857-2887)
        held = jnp.zeros(self._P, bool)
        for i in range(2):
            sel = state.selected[i]
            held = jnp.where(
                sel >= 0,
                held | (state.group == state.group[jnp.maximum(sel, 0)]),
                held,
            )
        parts = state.parts._replace(
            lin_vel=jnp.zeros_like(state.parts.lin_vel),
            ang_vel=jnp.zeros_like(state.parts.ang_vel),
        )
        gscale = jnp.where(held, 0.0, 1.0)
        parts = substeps(
            self.substep, parts, state.group, gscale, cfg.n_substeps
        )
        parts = parts._replace(
            lin_vel=jnp.where(held[:, None], 0.0, parts.lin_vel),
            ang_vel=jnp.where(held[:, None], 0.0, parts.ang_vel),
        )
        state = state._replace(parts=parts)

        # post-connect pose snap-back + one substep (env/furniture.py:426-436)
        def snap_back(st: CursorState) -> CursorState:
            p1 = jnp.maximum(st.connected_body1, 0)
            cur = st.parts.pos[p1]
            move = st.connected_body1_pos - cur
            moved = self._move_group(
                st.parts, st.group, p1, move, st.connected_body1_quat
            )
            moved = moved._replace(
                lin_vel=jnp.zeros_like(moved.lin_vel),
                ang_vel=jnp.zeros_like(moved.ang_vel),
            )
            moved = substeps(self.substep, moved, st.group, gscale, 1)
            return st._replace(parts=moved, connected_body1=jnp.array(-1))

        state = jax.lax.cond(
            state.connected_body1 >= 0, snap_back, lambda s: s, state
        )

        state = state._replace(t=state.t + 1)

        # reward & termination (env/furniture.py:437-445, 482-541)
        newly = (state.num_connected - prev_connected).astype(jnp.float32)
        reward = cfg.reward.success_reward * newly
        success = state.num_connected >= self.success_num_connects
        done = success | (state.t >= cfg.max_episode_steps)
        obs = self.observe(state)
        info = {
            "success": success,
            "num_connected": state.num_connected,
            "success_reward": reward,
        }
        return state, obs, reward, done, info
