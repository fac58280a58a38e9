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
from ..models import CompiledModel, compile_from_config, compile_model
from ..physics import PartState, init_state
from .assembly import AssemblyOps
from ..physics.engine import make_substep, physics_tables, substeps
from ..physics.megakernel import make_batched_substeps

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
    wrapper and ``furniture_tpu.parallel`` for sharded rollouts).

    ``step_batch``/``reset_batch`` are the preferred batched entry points:
    same semantics as ``vmap(step)``/``vmap(reset)``, but physics routes
    through the whole-control-step Pallas megakernel on TPU."""

    has_batch_api = True

    def __init__(self, config: EnvConfig | None = None, model: CompiledModel | None = None):
        self.config = config or EnvConfig()
        self.model = model or compile_from_config(self.config)
        self.tables = physics_tables(self.model)
        self.substep = make_substep(self.tables, self.config.sim)
        m = self.model
        self._P = m.n_parts
        self._C = m.n_conn
        self._W = m.n_welds
        # success criterion: config override, else recipe num_connects, else
        # W. With num_connects set, preassembled connects count on top of it
        # (env/furniture.py:1479)
        nc = self.config.num_connects
        if nc is not None:
            self.success_num_connects = int(nc) + len(self.config.preassembled)
        else:
            self.success_num_connects = int(m.num_connects)
        self.dof = 15
        # shared assembly machinery (alignment / connect / weld bookkeeping)
        self.ops = AssemblyOps(self.model, self.config, self.tables)
        self._batched_substeps = make_batched_substeps(
            self.tables, self.config.sim, self.substep
        )
        # initial-state pool (env/furniture.py:127-130; see utils/init_pool)
        self._init_pool = None
        if self.config.load_init_states:
            from ..utils.init_pool import load_pool

            self._init_pool = load_pool(self.config.load_init_states)

    def set_init_state_pool(self, pool) -> None:
        """Install an initial-state pool (dict of stacked arrays or list of
        snapshots — see ``utils/init_pool``). Re-jit resets after calling."""
        from ..utils.init_pool import stack_pool

        self._init_pool = stack_pool(pool) if isinstance(pool, list) else pool

    def _apply_reset_variants(self, state, key):
        """Recipe preassembly + init-state-pool sampling (see
        ``assembly.apply_reset_variants``)."""
        from .assembly import apply_reset_variants

        return apply_reset_variants(
            self.ops, self.config, self._init_pool, state, key
        )

    def _conn_world(self, parts: PartState):
        """World pose of all connector sites (delegates to AssemblyOps)."""
        return self.ops.conn_world(parts)

    # -- cursor-specific helpers --------------------------------------------

    def _part_overlaps_cursor(self, parts: PartState, cursor_pos):
        """Per-part: does the cursor point-with-margin touch any geom?
        (``env/furniture.py:785-798`` selection by cursor-geom overlap)."""
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
        # static [P,G] membership mask instead of segment_max: batched
        # scatter-reductions lower poorly on TPU; the masked any() fuses
        part_of = jnp.asarray(
            self.tables["geom_part"][None, :]
            == np.arange(self._P)[:, None]
        )
        return jnp.any(part_of & touch_geom[None, :], axis=1)

    def _try_connect(self, state: CursorState) -> CursorState:
        """Cursor connect: both held groups' conn sites are the candidates
        (``env/furniture.py:836-845``)."""
        from .assembly import dyn_row

        m = self.model
        conn_group = state.group[jnp.asarray(m.conn_part)]   # [C]
        g1 = dyn_row(state.group, jnp.maximum(state.selected[0], 0), self._P)
        g2 = dyn_row(state.group, jnp.maximum(state.selected[1], 0), self._P)
        prev = state.num_connected
        state = self.ops.try_connect(state, conn_group == g1, conn_group == g2)
        # deselect cursor 1 on successful connect (env/furniture.py:918-920)
        sel1 = jnp.where(state.num_connected > prev, -1, state.selected[1])
        return state._replace(selected=state.selected.at[1].set(sel1))

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
            from .assembly import dyn_row

            sel = jnp.maximum(st.selected[idx], 0)
            base_quat = dyn_row(st.parts.quat, sel, self._P)
            target_quat = T.euler_to_quat(rot, base_quat)
            moved = self.ops.move_group(st.parts, st.group, sel, move, target_quat)
            lo, hi = self.ops.group_bbox(moved, st.group, sel)
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
            from .assembly import dyn_row

            overlap = self._part_overlaps_cursor(st.parts, st.cursor_pos[idx])
            sel0 = st.selected[0]
            sel1 = st.selected[1]
            g = st.group
            g0 = dyn_row(g, jnp.maximum(sel0, 0), self._P)
            g1 = dyn_row(g, jnp.maximum(sel1, 0), self._P)
            taken = jnp.zeros(self._P, bool)
            taken = jnp.where(sel0 >= 0, g == g0, taken)
            taken = jnp.where(sel1 >= 0, taken | (g == g1), taken)
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

    def _sample_parts(self, key) -> PartState:
        """Randomized placement with overlap rejection
        (``placement_sampler.py:137-190``)."""
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
        return init_state(pos, quat)

    def _initial_state(self, parts: PartState) -> CursorState:
        """Assemble the post-settle CursorState (``env/furniture.py:1777-1779``
        cursor start poses; ``:2723-2736`` initial subtask)."""
        m = self.model
        cfg = self.config
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
            group=jnp.arange(self._P, dtype=jnp.int32),
            cursor_pos=jnp.array(
                [
                    [-0.2, 0.0, cfg.move_speed / 2],
                    [0.2, 0.0, cfg.move_speed / 2],
                ],
                jnp.float32,
            ),
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

    def reset(self, key) -> CursorState:
        """Pure reset: randomized placement + settle
        (``env/furniture.py:1406-1653``, ``placement_sampler.py:137-190``)."""
        parts = self._sample_parts(key)
        group = jnp.arange(self._P, dtype=jnp.int32)

        # settle: 10 × (zero vel, 10 substeps, clip vel) with gravity
        # compensation (env/furniture.py:1535-1540: _stop/_slow_objects)
        gscale = jnp.zeros(self._P)

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
        return self._apply_reset_variants(self._initial_state(parts), key)

    def reset_batch(self, keys) -> CursorState:
        """Batched reset: vmapped placement, settle through the batched
        physics backend (megakernel on TPU). Semantics identical to
        ``vmap(reset)``."""
        B = keys.shape[0]
        parts = jax.vmap(self._sample_parts)(keys)
        group = jnp.tile(jnp.arange(self._P, dtype=jnp.int32), (B, 1))
        gscale = jnp.zeros((B, self._P))
        clip = self.config.sim.slow_clip
        for _ in range(10):
            parts = parts._replace(
                lin_vel=jnp.zeros_like(parts.lin_vel),
                ang_vel=jnp.zeros_like(parts.ang_vel),
            )
            parts = self._batched_substeps(parts, group, gscale, 10)
            parts = parts._replace(
                lin_vel=jnp.clip(parts.lin_vel, -clip, clip),
                ang_vel=jnp.clip(parts.ang_vel, -clip, clip),
            )
        parts = parts._replace(
            lin_vel=jnp.zeros_like(parts.lin_vel),
            ang_vel=jnp.zeros_like(parts.ang_vel),
        )
        return jax.vmap(self._apply_reset_variants)(
            jax.vmap(self._initial_state)(parts), keys
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

    def _pre_physics(self, state: CursorState, action):
        """Cursor sub-actions + connect attempt; returns the updated state and
        the held-part mask for the physics step
        (``env/furniture.py:800-845``)."""
        state = self._cursor_update(state, 0, action[0:7])
        state = self._cursor_update(state, 1, action[7:14])

        both = (state.selected[0] >= 0) & (state.selected[1] >= 0)
        do_connect = (action[14] > 0) & both
        state = jax.lax.cond(
            do_connect,
            self._try_connect,
            lambda s: s._replace(connect_step=jnp.array(0)),
            state,
        )

        from .assembly import dyn_row

        held = jnp.zeros(self._P, bool)
        for i in range(2):
            sel = state.selected[i]
            g_sel = dyn_row(state.group, jnp.maximum(sel, 0), self._P)
            held = jnp.where(sel >= 0, held | (state.group == g_sel), held)
        return state, held

    def _snap_move(self, state: CursorState) -> PartState:
        """Post-connect pose snap-back move (``env/furniture.py:426-436``):
        returns the snap-target parts (velocities zeroed); caller runs the one
        settle substep and selects by ``connected_body1 >= 0``."""
        p1 = jnp.maximum(state.connected_body1, 0)
        cur = state.parts.pos[p1]
        move = state.connected_body1_pos - cur
        moved = self.ops.move_group(
            state.parts, state.group, p1, move, state.connected_body1_quat
        )
        return moved._replace(
            lin_vel=jnp.zeros_like(moved.lin_vel),
            ang_vel=jnp.zeros_like(moved.ang_vel),
        )

    def _finish(self, state: CursorState, prev_connected):
        """Instability guard + reward + termination
        (``env/furniture.py:437-445, 482-541, 2889-2897``)."""
        cfg = self.config
        from .assembly import instability_guard

        state = state._replace(t=state.t + 1)
        parts, unstable = instability_guard(state.parts)
        state = state._replace(parts=parts)

        newly = (state.num_connected - prev_connected).astype(jnp.float32)
        reward = (
            cfg.reward.success_reward * newly
            - cfg.reward.unstable_penalty_coef * unstable
        )
        success = state.num_connected >= self.success_num_connects
        done = success | (state.t >= cfg.max_episode_steps) | unstable
        obs = self.observe(state)
        info = {
            "success": success,
            "num_connected": state.num_connected,
            "success_reward": cfg.reward.success_reward * newly,
            "unstable": unstable,
        }
        return state, obs, reward, done, info

    def step(self, state: CursorState, action):
        """One control step (single env). Returns
        (state, obs, reward, done, info)."""
        cfg = self.config
        prev_connected = state.num_connected
        state, held = self._pre_physics(state, action)

        # physics control step (env/furniture.py:2857-2887)
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
            moved = self._snap_move(st)
            moved = substeps(self.substep, moved, st.group, gscale, 1)
            return st._replace(parts=moved, connected_body1=jnp.array(-1))

        state = jax.lax.cond(
            state.connected_body1 >= 0, snap_back, lambda s: s, state
        )
        return self._finish(state, prev_connected)

    def step_batch(self, states: CursorState, actions):
        """One control step for a batch (leading dim B). Identical semantics
        to ``vmap(step)`` but routes the physics through the batched backend
        (the whole-control-step Pallas megakernel on TPU) — the difference is
        ~2 orders of magnitude in sequential-kernel count per step."""
        cfg = self.config
        prev_connected = states.num_connected
        states, held = jax.vmap(self._pre_physics)(states, actions)

        parts = states.parts._replace(
            lin_vel=jnp.zeros_like(states.parts.lin_vel),
            ang_vel=jnp.zeros_like(states.parts.ang_vel),
        )
        gscale = jnp.where(held, 0.0, 1.0)
        parts = self._batched_substeps(
            parts, states.group, gscale, cfg.n_substeps
        )
        parts = parts._replace(
            lin_vel=jnp.where(held[..., None], 0.0, parts.lin_vel),
            ang_vel=jnp.where(held[..., None], 0.0, parts.ang_vel),
        )
        states = states._replace(parts=parts)

        # post-connect snap-back, gated at BATCH level: connects are rare
        # (a handful per episode), so the whole snap+settle (a second
        # megakernel launch) is skipped via a real runtime branch unless
        # some lane connected this step
        snap = states.connected_body1 >= 0

        def do_snap(states):
            moved = jax.vmap(self._snap_move)(states)
            settled = self._batched_substeps(moved, states.group, gscale, 1)
            sel = snap[:, None, None]
            return PartState(
                pos=jnp.where(sel, settled.pos, states.parts.pos),
                quat=jnp.where(sel, settled.quat, states.parts.quat),
                lin_vel=jnp.where(sel, settled.lin_vel, states.parts.lin_vel),
                ang_vel=jnp.where(sel, settled.ang_vel, states.parts.ang_vel),
            )

        parts = jax.lax.cond(
            jnp.any(snap), do_snap, lambda s: s.parts, states
        )
        states = states._replace(
            parts=parts,
            connected_body1=jnp.where(snap, -1, states.connected_body1),
        )
        return jax.vmap(self._finish)(states, prev_connected)
