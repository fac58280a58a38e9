"""Shared assembly machinery: alignment predicate, connect state machine,
weld bookkeeping, rigid-group moves.

This is the agent-independent core of the reference's connect logic
(``env/furniture.py:847-1153`` ``_connect``/``_try_connect``/``_is_aligned``,
``:2723-2776`` subtask/union-find/weld activation), factored out so the Cursor
env (``envs/cursor.py``) and all arm envs (``envs/arm.py``) share one
implementation.

All methods are pure, single-env functions over a duck-typed state NamedTuple
carrying the assembly fields::

    parts: PartState            free furniture parts
    group: [P] int32            rigid-group label (union-find flattened)
    conn_connected: [C] bool    connector site already used
    weld_active: [W] bool       weld equality rows activated
    num_connected: int32
    subtask: [2] int32          next weld's part pair (-1,-1 when done)
    connect_step: int32         consecutive aligned connect-steps counter
    connected_body1: int32      part idx for the post-settle pose snap-back
    connected_body1_pos: [3]
    connected_body1_quat: [4]

Callers vmap/jit the enclosing env step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import transforms as T
from ..physics.state import PartState


def dyn_row(arr, i, n: int):
    """``arr[i]`` for a TRACED scalar index, via one-hot contraction.

    Batched dynamic gathers lower catastrophically on the TPU backend
    (measured ~20x the surrounding math in the per-step connect sweep);
    a one-hot multiply-sum fuses cleanly. Integer/bool arrays round-trip
    through f32 exactly (part/group labels are tiny)."""
    oh = jax.nn.one_hot(i, n, dtype=jnp.float32)
    out = jnp.tensordot(oh, arr.astype(jnp.float32), axes=1)
    if jnp.issubdtype(arr.dtype, jnp.integer):
        return jnp.round(out).astype(arr.dtype)
    if arr.dtype == jnp.bool_:
        return out > 0.5
    return out.astype(arr.dtype)


class AssemblyOps:
    """Pure-function assembly helpers closed over one compiled model."""

    def __init__(self, model, config, tables):
        self.model = model
        self.config = config
        self.tables = tables
        self._P = model.n_parts
        self._C = model.n_conn
        self._W = model.n_welds

    # -- geometry helpers ----------------------------------------------------

    def conn_world(self, parts: PartState):
        """World pose of every connector site (``env/furniture.py:1044-1055``)."""
        m = self.model
        cp = jnp.asarray(m.conn_pos, jnp.float32)
        part = jnp.asarray(m.conn_part)
        pos = parts.pos[part] + T.quat_rotate(parts.quat[part], cp)
        quat = parts.quat[part]  # conn sites carry identity site quat
        return pos, quat

    def site_world(self, parts: PartState):
        m = self.model
        sp = jnp.asarray(m.site_pos, jnp.float32)
        part = jnp.asarray(m.site_part)
        return parts.pos[part] + T.quat_rotate(parts.quat[part], sp)

    def group_bbox(self, parts: PartState, group, ref_part):
        """Bounding box over all sites of ``ref_part``'s group — including the
        origin, replicating the min/max zero-init of
        ``env/furniture.py:758-762``."""
        m = self.model
        site_w = self.site_world(parts)                      # [S,3]
        ref_g = dyn_row(group, ref_part, self._P)
        in_group = group[jnp.asarray(m.site_part)] == ref_g
        big = 1e9
        lo = jnp.min(jnp.where(in_group[:, None], site_w, big), axis=0)
        hi = jnp.max(jnp.where(in_group[:, None], site_w, -big), axis=0)
        lo = jnp.minimum(lo, 0.0)
        hi = jnp.maximum(hi, 0.0)
        return lo, hi

    def move_group(self, parts: PartState, group, base_part, move_offset, target_quat):
        """Rigidly rotate ``base_part``'s group about the base part's origin to
        ``target_quat`` and translate by ``move_offset``
        (``env/furniture.py:724-747`` via ``transform_to_target_quat``)."""
        in_group = group == dyn_row(group, base_part, self._P)  # [P]
        base_pose = jnp.concatenate(
            [
                dyn_row(parts.pos, base_part, self._P),
                dyn_row(parts.quat, base_part, self._P),
            ]
        )
        qpos = jnp.concatenate([parts.pos, parts.quat], axis=-1)  # [P,7]
        new_pos, new_quat = T.transform_to_target_quat(
            base_pose[None], qpos, target_quat[None]
        )
        new_pos = new_pos + move_offset[None]
        pos = jnp.where(in_group[:, None], new_pos, parts.pos)
        quat = jnp.where(in_group[:, None], new_quat, parts.quat)
        return parts._replace(pos=pos, quat=quat)

    # -- alignment predicate ---------------------------------------------------

    def alignment(self, parts: PartState):
        """Vectorized ``_is_aligned`` over all C×C conn-site pairs.

        Returns (aligned[C,C] bool, target_quat[C,C,4]) — target is the
        world quat the *first* site's frame should take
        (``env/furniture.py:1057-1153``)."""
        m = self.model
        cfg = self.config.align
        pos, quat = self.conn_world(parts)                   # [C,3],[C,4]
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
        # one-hot contraction, not take_along_axis: the batched dynamic
        # gather lowers catastrophically on TPU (see transforms.mat_to_quat)
        sel_a = jax.nn.one_hot(first_a, f_rot.shape[1], dtype=f_rot.dtype)
        f_ang = jnp.einsum("ija,iad->ijd", sel_a, f_rot)     # [C,C,3]

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

    # -- connect machinery ------------------------------------------------------

    def find_connectable(self, state, in1, in2):
        """First eligible aligned conn-site pair with site1 ∈ ``in1`` mask and
        site2 ∈ ``in2`` mask (site iteration order of
        ``env/furniture.py:978-988``). ``in1``/``in2`` are [C] bool masks over
        connector sites (cursor: the two held groups; arm: the touched part's
        group × all other groups)."""
        m = self.model
        pa = jnp.asarray(m.conn_pair_a)
        pb = jnp.asarray(m.conn_pair_b)
        compl_ = (pa[:, None] == pb[None, :]) & (pb[:, None] == pa[None, :])
        free = ~state.conn_connected
        conn_group = state.group[jnp.asarray(m.conn_part)]   # [C]
        diff_group = conn_group[:, None] != conn_group[None, :]
        elig = (
            in1[:, None]
            & in2[None, :]
            & compl_
            & free[:, None]
            & free[None, :]
            & diff_group
        )
        # weld-row existence gate (env/furniture.py:966-972): a weld row must
        # exist whose two parts both lie in the candidate body sets
        if self._W:
            wp1 = jnp.asarray(m.weld_part1)
            wp2 = jnp.asarray(m.weld_part2)
            part_in1 = jnp.zeros(self._P, bool).at[jnp.asarray(m.conn_part)].max(in1)
            part_in2 = jnp.zeros(self._P, bool).at[jnp.asarray(m.conn_part)].max(in2)
            g = state.group
            gset1 = jnp.zeros(self._P, bool).at[g].max(part_in1)  # group labels in set1
            gset2 = jnp.zeros(self._P, bool).at[g].max(part_in2)
            either = gset1 | gset2
            gate = jnp.any(either[g[wp1]] & either[g[wp2]])
        else:
            gate = jnp.array(False)

        aligned, target_quat = self.alignment(state.parts)
        ok = elig & aligned & gate
        flat = ok.reshape(-1)
        found = jnp.any(flat)
        idx = jnp.argmax(flat)
        s1 = idx // self._C
        s2 = idx % self._C
        # one-hot contraction instead of target_quat[s1, s2]: under vmap the
        # dynamic 2-D gather lowers catastrophically on TPU (measured 37 ms
        # per 4096-lane batch step — ~20x the full alignment computation);
        # the masked reduction is a clean fused multiply-sum
        onehot = jax.nn.one_hot(idx, self._C * self._C, dtype=target_quat.dtype)
        tq = jnp.sum(
            onehot[:, None] * target_quat.reshape(self._C * self._C, 4), axis=0
        )
        return found, s1, s2, tq

    def snap_connect(self, state, s1, s2, target_quat):
        """Final connect: snap site2's group onto site1, weld, merge groups
        (``env/furniture.py:847-924`` + ``_align_connectors`` :1224)."""
        m = self.model
        conn_part = jnp.asarray(m.conn_part)
        p1 = dyn_row(conn_part, s1, self._C)
        p2 = dyn_row(conn_part, s2, self._C)
        cpos, _ = self.conn_world(state.parts)
        site1_pos = dyn_row(cpos, s1, self._C)
        site2_pos = dyn_row(cpos, s2, self._C)

        # rigid map x -> A(x - site2) + site1 with A = target ∘ q(part2)^-1
        q_p2 = dyn_row(state.parts.quat, p2, self._P)
        g_p2 = dyn_row(state.group, p2, self._P)
        A = T.quat_mul(target_quat, T.quat_inv(q_p2))
        in2 = state.group == g_p2
        new_pos = T.quat_rotate(A[None], state.parts.pos - site2_pos[None]) + site1_pos[None]
        new_quat = T.quat_mul(A[None], state.parts.quat)
        parts = state.parts._replace(
            pos=jnp.where(in2[:, None], new_pos, state.parts.pos),
            quat=jnp.where(in2[:, None], new_quat, state.parts.quat),
            lin_vel=jnp.zeros_like(state.parts.lin_vel),
            ang_vel=jnp.zeros_like(state.parts.ang_vel),
        )

        # floor lift: union bbox of both groups must have min z >= 0
        lo1, _ = self.group_bbox(parts, state.group, p1)
        lo2, _ = self.group_bbox(parts, state.group, p2)
        min_z = jnp.minimum(lo1[2], lo2[2])
        lift = jnp.where(min_z < 0, -min_z, 0.0)
        g_p1 = dyn_row(state.group, p1, self._P)
        in_either = (state.group == g_p1) | in2
        parts = parts._replace(
            pos=parts.pos.at[:, 2].add(jnp.where(in_either, lift, 0.0))
        )

        # weld bookkeeping + group merge (g(p1) label <- g(p2),
        # env/furniture.py:2749-2760)
        weld_row = dyn_row(jnp.asarray(m.weld_lookup), p1, self._P)
        weld_idx = dyn_row(weld_row, p2, self._P)
        weld_active = jnp.where(
            (jnp.arange(self._W) == weld_idx) & (weld_idx >= 0),
            True,
            state.weld_active,
        )
        group = jnp.where(state.group == g_p1, g_p2, state.group)

        conn_connected = (
            state.conn_connected
            | (jnp.arange(self._C) == s1)
            | (jnp.arange(self._C) == s2)
        )

        return state._replace(
            parts=parts,
            group=group,
            weld_active=weld_active,
            conn_connected=conn_connected,
            num_connected=state.num_connected + 1,
            connect_step=jnp.array(0),
            connected_body1=p1,
            connected_body1_pos=dyn_row(parts.pos, p1, self._P),
            connected_body1_quat=dyn_row(parts.quat, p1, self._P),
            subtask=self.next_subtask(group),
        )

    def next_subtask(self, group):
        """First weld whose parts are in different groups
        (``env/furniture.py:2723-2736``)."""
        m = self.model
        if not self._W:
            return jnp.array([-1, -1], jnp.int32)
        wg1 = group[jnp.asarray(m.weld_part1)]
        wg2 = group[jnp.asarray(m.weld_part2)]
        open_w = wg1 != wg2
        any_open = jnp.any(open_w)
        w = jnp.argmax(open_w)
        return jnp.where(
            any_open,
            jnp.stack(
                [jnp.asarray(m.weld_part1)[w], jnp.asarray(m.weld_part2)[w]]
            ),
            jnp.array([-1, -1]),
        ).astype(jnp.int32)

    def interp_connect(self, state, s1, s2, target_quat):
        """Intermediate connect step: ease site2's group toward the snap target
        (``env/furniture.py:995-1036``; per-step recomputation replaces the
        reference's precomputed slerp/linspace schedule — the terminal snap
        is identical)."""
        m = self.model
        conn_part = jnp.asarray(m.conn_part)
        p2 = dyn_row(conn_part, s2, self._C)
        cpos, _ = self.conn_world(state.parts)
        site1_pos = dyn_row(cpos, s1, self._C)
        site2_pos = dyn_row(cpos, s2, self._C)

        cur_pos = dyn_row(state.parts.pos, p2, self._P)
        cur_quat = dyn_row(state.parts.quat, p2, self._P)
        A = T.quat_mul(target_quat, T.quat_inv(cur_quat))
        body_target_pos = T.quat_rotate(A, cur_pos - site2_pos) + site1_pos
        body_target_quat = T.quat_mul(A, cur_quat)

        N = self.config.num_connect_steps
        k = state.connect_step
        frac = 0.9 / jnp.maximum(N - k, 1).astype(jnp.float32)
        step_pos = cur_pos + frac * (body_target_pos - cur_pos)
        step_quat = T.quat_slerp(cur_quat, body_target_quat, frac)

        parts = self.move_group(
            state.parts, state.group, p2, step_pos - cur_pos, step_quat
        )
        parts = parts._replace(
            lin_vel=jnp.zeros_like(parts.lin_vel),
            ang_vel=jnp.zeros_like(parts.ang_vel),
        )
        return state._replace(parts=parts, connect_step=state.connect_step + 1)

    def try_connect(self, state, in1, in2, num_connect_steps=None):
        """One connect attempt (``env/furniture.py:926-1041``): when an aligned
        eligible pair exists, either interpolate toward it or (after
        ``num_connect_steps`` consecutive attempts) snap + weld."""
        N = (
            self.config.num_connect_steps
            if num_connect_steps is None
            else num_connect_steps
        )
        found, s1, s2, tq = self.find_connectable(state, in1, in2)

        def on_found(st):
            return jax.lax.cond(
                st.connect_step < N,
                lambda s: self.interp_connect(s, s1, s2, tq),
                lambda s: self.snap_connect(s, s1, s2, tq),
                st,
            )

        def on_missing(st):
            return st._replace(connect_step=jnp.array(0))

        return jax.lax.cond(found, on_found, on_missing, state)

    def initial_subtask(self):
        m = self.model
        if self._W:
            return jnp.stack(
                [jnp.asarray(m.weld_part1)[0], jnp.asarray(m.weld_part2)[0]]
            ).astype(jnp.int32)
        return jnp.array([-1, -1], jnp.int32)

    def preassemble(self, state, subtasks):
        """Start with the given recipe subtasks already connected — the
        reference's ``--preassembled`` weld activation + site snapping at
        reset (``env/furniture.py:1492-1566``; target orientation per
        ``_project_connector_quat`` :1201-1222).

        ``subtasks`` is a static tuple of recipe row indices; each snap is
        unrolled at trace time and reuses :meth:`snap_connect` (weld
        bookkeeping, group merge, floor lift) with the leg site moved onto
        the table site at the recipe angle.
        """
        import numpy as np

        m = self.model
        for i in subtasks:
            s_leg = int(np.asarray(m.recipe_site1)[i])
            s_tab = int(np.asarray(m.recipe_site2)[i])
            ang = float(np.asarray(m.recipe_angle)[i])
            _, cquat = self.conn_world(state.parts)
            up1 = T.up_vector_from_quat(cquat[s_tab])
            fwd1 = T.forward_vector_from_quat(cquat[s_tab])
            if np.isnan(ang):
                # free-angle connector: nearest of the two in-plane
                # projections of the leg forward (env/furniture.py:1206-1217)
                fwd2 = T.forward_vector_from_quat(cquat[s_leg])
                cos = T.cos_siml(fwd1, fwd2)
                fp = T.rotate_vector_cos_siml(fwd1, up1, cos, 1.0)
                fn = T.rotate_vector_cos_siml(fwd1, up1, cos, -1.0)
                fwd_r = jnp.where(
                    T.cos_siml(fp, fwd2) > T.cos_siml(fn, fwd2), fp, fn
                )
            else:
                fwd_r = T.rotate_vector(fwd1, up1, ang)
            target = T.lookat_to_quat(up1, fwd_r)
            state = self.snap_connect(
                state, jnp.asarray(s_tab), jnp.asarray(s_leg), target
            )
        # preassembly is not a live connect event: clear the snap-back
        # bookkeeping the env step loop reacts to (env/furniture.py:1560-1562)
        return state._replace(
            connected_body1=jnp.array(-1, jnp.int32),
            connect_step=jnp.array(0, jnp.int32),
        )


def apply_reset_variants(ops: AssemblyOps, config, pool, state, key):
    """Recipe preassembly + init-state-pool sampling for a freshly placed
    state (reference reset tail, ``env/furniture.py:1433-1434, 1492-1566``).

    ``pool`` is a dict of stacked arrays (see ``utils/init_pool``) or None.
    Shared by CursorEnv and ArmEnv resets; pure and vmappable.
    """
    if config.preassembled:
        state = ops.preassemble(state, config.preassembled)
    if pool is not None:
        k_i, k_u = jax.random.split(jax.random.fold_in(key, 0x1517))
        n = len(pool["pos"])
        i = jax.random.randint(k_i, (), 0, n)
        use = jax.random.uniform(k_u) > 0.2      # env/furniture.py:1433
        pick = lambda name, cur: jnp.where(
            use, jnp.asarray(pool[name], cur.dtype)[i], cur
        )
        state = state._replace(
            parts=state.parts._replace(
                pos=pick("pos", state.parts.pos),
                quat=pick("quat", state.parts.quat),
                lin_vel=jnp.zeros_like(state.parts.lin_vel),
                ang_vel=jnp.zeros_like(state.parts.ang_vel),
            ),
            group=pick("group", state.group),
            weld_active=pick("weld_active", state.weld_active),
            conn_connected=pick("conn_connected", state.conn_connected),
            num_connected=pick("num_connected", state.num_connected),
        )
        if hasattr(state, "qpos") and "qpos" in pool:
            state = state._replace(
                qpos=pick("qpos", state.qpos),
                qvel=pick("qvel", state.qvel),
            )
        state = state._replace(subtask=ops.next_subtask(state.group))
    return state


def sample_placement(model, cfg, key):
    """Randomized initial part placement with overlap rejection
    (``placement_sampler.py:66-188`` ``UniformRandomSampler``: XML-init-pose
    anchored xy noise, constant z-rotation offset, horizontal-radius circle
    rejection re-sampled in part order). Returns (pos [P,3], quat [P,4])."""
    P = model.n_parts
    k_xy, k_rounds = jax.random.split(key)

    base_pos = jnp.asarray(model.part_init_pos, jnp.float32)
    base_quat = jnp.asarray(model.part_init_quat, jnp.float32)
    r = cfg.furn_xyz_rand
    xy = jax.random.uniform(k_xy, (P, 2), minval=-r, maxval=r)
    pos = base_pos + jnp.concatenate([xy, jnp.full((P, 1), 0.01)], axis=-1)
    # rotation noise: the reference samples uniform(low=max, high=max) —
    # i.e. a *constant* offset of furn_rot_rand degrees
    # (placement_sampler.py:125-137); replicated for parity.
    rot = jnp.full((P, 3), 0.0).at[:, 0].set(cfg.furn_rot_rand)
    quat = T.euler_to_quat(rot, base_quat)

    radius = jnp.asarray(model.part_horiz_radius, jnp.float32)

    def resample_round(i, carry):
        pos, key = carry
        key, sub = jax.random.split(key)
        d = jnp.linalg.norm(pos[:, None, :2] - pos[None, :, :2], axis=-1)
        rr = radius[:, None] + radius[None, :]
        lower = jnp.tril(jnp.ones((P, P), bool), k=-1)  # j < i pairs
        bad = jnp.any((d <= rr) & lower, axis=1)
        new_xy = base_pos[:, :2] + jax.random.uniform(
            sub, (P, 2), minval=-r, maxval=r
        )
        pos = pos.at[:, :2].set(jnp.where(bad[:, None], new_xy, pos[:, :2]))
        return pos, key

    pos, _ = jax.lax.fori_loop(0, 10, resample_round, (pos, k_rounds))
    return pos, quat


def settle_parts(substep_fn, substeps_fn, parts, group, cfg_sim, rounds: int = 10):
    """Part stabilization at reset, reference semantics
    (``env/furniture.py:1535-1540``: 10 × (stop objects, 10 substeps with
    gravity compensation, clip velocities))."""
    P = parts.pos.shape[0]
    gscale = jnp.zeros(P)

    def settle(i, p):
        p = p._replace(
            lin_vel=jnp.zeros_like(p.lin_vel),
            ang_vel=jnp.zeros_like(p.ang_vel),
        )
        p = substeps_fn(substep_fn, p, group, gscale, 10)
        clip = cfg_sim.slow_clip
        return p._replace(
            lin_vel=jnp.clip(p.lin_vel, -clip, clip),
            ang_vel=jnp.clip(p.ang_vel, -clip, clip),
        )

    parts = jax.lax.fori_loop(0, rounds, settle, parts)
    return parts._replace(
        lin_vel=jnp.zeros_like(parts.lin_vel),
        ang_vel=jnp.zeros_like(parts.ang_vel),
    )


def instability_guard(parts, pos_bound: float = 10.0):
    """Divergence containment for one env lane.

    The reference catches MuJoCo instability exceptions during
    ``sim.step()``, logs "Simulation is unstable", resets the episode and
    applies ``unstable_penalty_coef`` (``env/furniture.py:2889-2897``,
    ``:463-467``). In a batched jitted step there are no exceptions, so we
    detect divergence (non-finite pose/velocity or a part flung outside
    ``pos_bound`` meters) and sanitize the lane to finite values; the caller
    flags ``done`` so the vec-env auto-reset replaces the lane.

    Returns ``(sanitized_parts, unstable: bool scalar)``.
    """
    finite = lambda x: jnp.all(jnp.isfinite(x))
    unstable = ~(
        finite(parts.pos)
        & finite(parts.quat)
        & finite(parts.lin_vel)
        & finite(parts.ang_vel)
    ) | jnp.any(jnp.abs(parts.pos) > pos_bound)

    def sanitize(p):
        pos = jnp.clip(
            jnp.nan_to_num(p.pos, posinf=pos_bound, neginf=-pos_bound),
            -pos_bound,
            pos_bound,
        )
        # bound inf components so the norm below cannot overflow (an inf
        # component mapped to finfo.max would yield an all-zero quat)
        quat = jnp.nan_to_num(p.quat, posinf=0.0, neginf=0.0)
        norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
        unit = jnp.zeros_like(quat).at[..., 0].set(1.0)
        quat = jnp.where(norm > 1e-6, quat / jnp.maximum(norm, 1e-6), unit)
        return p._replace(
            pos=pos,
            quat=quat,
            lin_vel=jnp.zeros_like(p.lin_vel),
            ang_vel=jnp.zeros_like(p.ang_vel),
        )

    parts = jax.tree.map(
        lambda s, o: jnp.where(unstable, s, o), sanitize(parts), parts
    )
    return parts, unstable
