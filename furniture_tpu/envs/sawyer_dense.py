"""Dense-reward Sawyer assembly environment: the reference's 8-phase reward
curriculum (``furniture_sawyer_dense.py``) as a masked, array-indexed state
machine inside the jitted step.

Phase curriculum (``furniture_sawyer_dense.py:88-97``):
  0 init_eef → 1 move_eef_above_leg → 2 lower_eef → 3 grasp_leg →
  4 lift_leg → 5 align_leg → 6 move_leg → 7 move_leg_fine

Per-subtask reward variables (leg/table parts, conn sites, grasp-target
sites, lift waypoints — ``_update_reward_variables`` :149-221) are
precompiled into static per-subtask arrays from the assembly recipe; the
traced ``subtask_step`` indexes them. All phase rewards use the reference's
``diff_rew`` potential-difference form (:579-944) with coefficients from
``config/furniture_sawyer_dense.py:26-72`` (``DenseRewardConfig``).

The branchy Python state machine of the reference (skip transitions
:306-346, drop/table-move early-exit :444-556) becomes mask arithmetic over
a phase index — one compiled program, no per-phase recompilation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import transforms as T
from ..config import EnvConfig
from ..models import CompiledModel
from ..physics import PartState
from ..robots import kinematics as K
from .arm import ArmEnv, ArmState

N_PHASES = 8
(
    INIT_EEF,
    MOVE_EEF_ABOVE_LEG,
    LOWER_EEF,
    GRASP_LEG,
    LIFT_LEG,
    ALIGN_LEG,
    MOVE_LEG,
    MOVE_LEG_FINE,
) = range(N_PHASES)

# phases where the grip must point down / align with the grasp vector / be
# open (furniture_sawyer_dense.py:75-87)
_GRIP_UP_PHASES = (INIT_EEF, MOVE_EEF_ABOVE_LEG, LOWER_EEF, GRASP_LEG, LIFT_LEG)
_GRIP_FORWARD_PHASES = (MOVE_EEF_ABOVE_LEG, LOWER_EEF, GRASP_LEG, LIFT_LEG)
_GRIP_OPEN_PHASES = (INIT_EEF, MOVE_EEF_ABOVE_LEG, LOWER_EEF)


class Prev(NamedTuple):
    """Potential-difference trackers (reference ``_prev_*`` scalars)."""

    init_eef_dist: jax.Array
    eef_above_leg_dist: jax.Array
    eef_leg_dist: jax.Array
    grasp_dist: jax.Array
    lift_leg_z_dist: jax.Array
    lift_leg_xy_dist: jax.Array
    move_pos_dist: jax.Array
    move_up_ang_dist: jax.Array
    move_forward_ang_dist: jax.Array
    proj_t: jax.Array
    proj_l: jax.Array


class DenseState(NamedTuple):
    """ArmState fields + dense-reward machine state (flat for duck-typing
    with ``AssemblyOps``/``ArmEnv.step_physics``)."""

    # -- ArmState fields ----------------------------------------------------
    parts: PartState
    group: jax.Array
    conn_connected: jax.Array
    weld_active: jax.Array
    num_connected: jax.Array
    subtask: jax.Array
    connect_step: jax.Array
    connected_body1: jax.Array
    connected_body1_pos: jax.Array
    connected_body1_quat: jax.Array
    qpos: jax.Array
    qvel: jax.Array
    ik_target_pos: jax.Array
    hand_quat_init: jax.Array
    touched: jax.Array
    picked: jax.Array
    touch_l: jax.Array
    touch_r: jax.Array
    t: jax.Array
    # -- dense machine ------------------------------------------------------
    phase_i: jax.Array          # scalar int32 0..7
    subtask_step: jax.Array     # scalar int32
    leg_dropped: jax.Array      # bool
    table_moved: jax.Array      # bool
    leg_lift: jax.Array         # bool
    leg_fine_aligned: jax.Array  # int32
    init_eef_pos: jax.Array     # [3]
    init_table_site_pos: jax.Array  # [3]
    init_lift_leg_z: jax.Array  # scalar
    lift_leg_pos: jax.Array     # [3]
    prev: Prev


class FurnitureSawyerDenseRewardEnv(ArmEnv):
    """Dense-reward assembly env (reference
    ``FurnitureSawyerDenseRewardEnv``, ``furniture_sawyer_dense.py:12``)."""

    def __init__(self, config: EnvConfig | None = None, model: CompiledModel | None = None):
        config = (config or EnvConfig()).replace(
            agent_type=(config.agent_type if config and config.agent_type != "Cursor" else "Sawyer"),
            num_connect_steps=0,  # furniture_sawyer_dense.py:74
        )
        super().__init__(config, model)
        self._compile_subtask_tables()

    # -- static recipe → per-subtask arrays ----------------------------------

    def _compile_subtask_tables(self):
        m = self.model
        recipe = m.recipe_raw
        assert recipe is not None, f"{m.name}: dense env needs a recipe"
        part2id = {n: i for i, n in enumerate(m.part_names)}
        conn2id = {n: i for i, n in enumerate(m.conn_names)}
        site2id = {n: i for i, n in enumerate(m.site_names)}

        S = len(recipe["recipe"])
        legs, tables, lsites, tsites = [], [], [], []
        gls, grs, lift_z, angles = [], [], [], []
        has_ginit, ginit_off, ginit_z = [], [], []
        used = set()
        for s in range(S):
            leg, table = recipe["recipe"][s]
            legs.append(part2id[leg])
            tables.append(part2id[table])
            sr = recipe["site_recipe"][s]
            lsites.append(conn2id[sr[0]])
            tsites.append(conn2id[sr[1]])
            angles.append(float(sr[2]) if len(sr) > 2 else np.nan)
            # first unused grasp-site pair (furniture_sawyer_dense.py:198-204)
            gl = gr = None
            for i in range(S):
                cl, cr = f"{leg}_ltgt_site{i}", f"{leg}_rtgt_site{i}"
                if cl not in used and cr not in used and cl in site2id:
                    used.add(cl)
                    used.add(cr)
                    gl, gr = site2id[cl], site2id[cr]
                    break
            assert gl is not None, f"{leg}: no grasp target sites"
            gls.append(gl)
            grs.append(gr)
            lift_z.append(float(recipe["waypoints"][s][0][2]))
            gi = recipe.get("grip_init_pos", [None] * S)[s]
            if gi is not None:
                has_ginit.append(True)
                off = list(gi[0])
                ginit_off.append(off[:3])
                ginit_z.append(off[3] - 0.085 if len(off) == 4 else np.nan)
            else:
                has_ginit.append(False)
                ginit_off.append([0.0, 0.0, 0.0])
                ginit_z.append(np.nan)

        self._st = {
            "leg": np.array(legs, np.int32),
            "table": np.array(tables, np.int32),
            "leg_site": np.array(lsites, np.int32),
            "table_site": np.array(tsites, np.int32),
            "gl": np.array(gls, np.int32),
            "gr": np.array(grs, np.int32),
            "lift_z": np.array(lift_z, np.float32),
            "angle": np.array(angles, np.float32),
            "has_ginit": np.array(has_ginit),
            "ginit_off": np.array(ginit_off, np.float32),
            "ginit_z": np.array(ginit_z, np.float32),
        }
        self.n_subtasks = S
        self._z_finedist = float(recipe.get("z_finedist", 0.05))

    # -- geometric helpers ----------------------------------------------------

    def _site_pos(self, parts: PartState, site_idx):
        m = self.model
        p = jnp.asarray(m.site_part)[site_idx]
        local = jnp.asarray(m.site_pos, jnp.float32)[site_idx]
        return parts.pos[p] + T.quat_rotate(parts.quat[p], local)

    def _conn_pose(self, parts: PartState, conn_idx):
        m = self.model
        p = jnp.asarray(m.conn_part)[conn_idx]
        local = jnp.asarray(m.conn_pos, jnp.float32)[conn_idx]
        pos = parts.pos[p] + T.quat_rotate(parts.quat[p], local)
        return pos, parts.quat[p]

    def _collect_values(self, state: DenseState, fk_out):
        """All sensor values the reward machine needs
        (``_collect_values``, furniture_sawyer_dense.py:222-271)."""
        st = self._st
        s = state.subtask_step
        parts = state.parts
        leg = jnp.asarray(st["leg"])[s]
        lsite = jnp.asarray(st["leg_site"])[s]
        tsite = jnp.asarray(st["table_site"])[s]

        leg_pos = parts.pos[leg]
        lpos, lquat = self._conn_pose(parts, lsite)
        tpos, tquat = self._conn_pose(parts, tsite)
        leg_up = T.up_vector_from_quat(lquat)
        table_up = T.up_vector_from_quat(tquat)
        leg_fwd = T.forward_vector_from_quat(lquat)
        table_fwd = T.forward_vector_from_quat(tquat)

        # leg forward rotated by the recipe angle about leg up
        # (_project_connector_forward, env/furniture.py:1178-1199)
        angle = jnp.asarray(st["angle"])[s]
        has_angle = ~jnp.isnan(angle)
        fwd_rot_fixed = T.rotate_vector(
            leg_fwd, leg_up, jnp.where(has_angle, angle, 0.0)
        )
        cos = T.cos_siml(leg_fwd, table_fwd)
        f_pos = T.rotate_vector_cos_siml(leg_fwd, leg_up, cos, 1.0)
        f_neg = T.rotate_vector_cos_siml(leg_fwd, leg_up, cos, -1.0)
        free = jnp.where(
            T.cos_siml(f_pos, table_fwd) > T.cos_siml(f_neg, table_fwd),
            f_pos,
            f_neg,
        )
        leg_fwd_rotated = jnp.where(has_angle, fwd_rot_fixed, free)

        eef_pos = K.tip_world(self.robot, fk_out, "right")
        gl = self._site_pos(parts, jnp.asarray(st["gl"])[s])
        gr = self._site_pos(parts, jnp.asarray(st["gr"])[s])
        leg_grasp_pos = 0.5 * (gl + gr)
        leg_grasp_vec = gr - gl

        touched = state.touch_l[0] & state.touch_r[0]
        leg_touched = touched[leg]
        above_tpos = tpos + jnp.array([0.0, 0.0, self._z_finedist])

        return {
            "eef_pos": eef_pos,
            "leg_touched": leg_touched,
            "leg_safe_grasp": leg_touched & (eef_pos[2] < leg_grasp_pos[2]),
            "leg_grasp_pos": leg_grasp_pos,
            "leg_grasp_vec": leg_grasp_vec,
            "leg_pos": leg_pos,
            "leg_site_pos": lpos,
            "table_site_pos": tpos,
            "above_table_site_pos": above_tpos,
            "move_pos_dist": jnp.linalg.norm(tpos - lpos),
            "move_above_pos_dist": jnp.linalg.norm(above_tpos - lpos),
            "move_up_ang_dist": T.cos_siml(leg_up, table_up),
            "move_forward_ang_dist": T.cos_siml(leg_fwd_rotated, table_fwd),
            "proj_table": T.cos_siml(-table_up, lpos - tpos),
            "proj_leg": T.cos_siml(leg_up, tpos - lpos),
            "table_displacement": jnp.linalg.norm(
                tpos - state.init_table_site_pos
            ),
            "lsite": lsite,
            "tsite": tsite,
        }

    # -- reset ----------------------------------------------------------------

    def _subtask_vars(self, state: DenseState, fk_out) -> DenseState:
        """(Re)initialize per-subtask reward variables
        (``_update_reward_variables``, furniture_sawyer_dense.py:149-221)."""
        st = self._st
        s = jnp.minimum(state.subtask_step, self.n_subtasks - 1)
        parts = state.parts
        leg = jnp.asarray(st["leg"])[s]
        tsite = jnp.asarray(st["table_site"])[s]
        tpos, _ = self._conn_pose(parts, tsite)
        leg_pos = parts.pos[leg]
        lift_leg_pos = leg_pos + jnp.array([0.0, 0.0, 1.0]) * jnp.asarray(
            st["lift_z"]
        )[s]

        eef_pos = K.tip_world(self.robot, fk_out, "right")
        has_gi = jnp.asarray(st["has_ginit"])[s]
        gi_off = jnp.asarray(st["ginit_off"])[s]
        gi_z = jnp.asarray(st["ginit_z"])[s]
        init_eef = eef_pos + gi_off
        init_eef = init_eef.at[2].set(
            jnp.where(jnp.isnan(gi_z), init_eef[2], gi_z)
        )
        phase_i = jnp.where(has_gi, INIT_EEF, MOVE_EEF_ABOVE_LEG)

        gl = self._site_pos(parts, jnp.asarray(st["gl"])[s])
        gr = self._site_pos(parts, jnp.asarray(st["gr"])[s])
        grasp_pos = 0.5 * (gl + gr)
        above = grasp_pos + jnp.array([0.0, 0.0, 0.05])

        prev = Prev(
            init_eef_dist=jnp.linalg.norm(eef_pos - init_eef),
            eef_above_leg_dist=jnp.linalg.norm(eef_pos - above),
            eef_leg_dist=jnp.array(0.0),
            grasp_dist=jnp.array(-1.0),
            lift_leg_z_dist=jnp.asarray(st["lift_z"])[s],
            lift_leg_xy_dist=jnp.array(0.0),
            move_pos_dist=jnp.array(0.0),
            move_up_ang_dist=jnp.array(0.0),
            move_forward_ang_dist=jnp.array(0.0),
            proj_t=jnp.array(0.0),
            proj_l=jnp.array(0.0),
        )
        return state._replace(
            phase_i=phase_i.astype(jnp.int32),
            leg_dropped=jnp.array(False),
            table_moved=jnp.array(False),
            leg_lift=jnp.array(False),
            leg_fine_aligned=jnp.array(0, jnp.int32),
            init_eef_pos=init_eef,
            init_table_site_pos=tpos,
            init_lift_leg_z=leg_pos[2],
            lift_leg_pos=lift_leg_pos,
            prev=prev,
        )

    def reset(self, key) -> DenseState:
        base = super().reset(key)
        z = jnp.array(0.0)
        state = DenseState(
            **base._asdict(),
            phase_i=jnp.array(0, jnp.int32),
            subtask_step=jnp.array(0, jnp.int32),
            leg_dropped=jnp.array(False),
            table_moved=jnp.array(False),
            leg_lift=jnp.array(False),
            leg_fine_aligned=jnp.array(0, jnp.int32),
            init_eef_pos=jnp.zeros(3),
            init_table_site_pos=jnp.zeros(3),
            init_lift_leg_z=z,
            lift_leg_pos=jnp.zeros(3),
            prev=Prev(z, z, z, z, z, z, z, z, z, z, z),
        )
        fk_out = K.fk(self.robot, state.qpos)
        return self._subtask_vars(state, fk_out)

    def reset_batch(self, keys) -> DenseState:
        """Batched reset: ArmEnv's megakernel-settled reset + vmapped dense
        wrapper fields."""
        base = super(FurnitureSawyerDenseRewardEnv, self).reset_batch(keys)

        def wrap(b):
            z = jnp.array(0.0)
            state = DenseState(
                **b._asdict(),
                phase_i=jnp.array(0, jnp.int32),
                subtask_step=jnp.array(0, jnp.int32),
                leg_dropped=jnp.array(False),
                table_moved=jnp.array(False),
                leg_lift=jnp.array(False),
                leg_fine_aligned=jnp.array(0, jnp.int32),
                init_eef_pos=jnp.zeros(3),
                init_table_site_pos=jnp.zeros(3),
                init_lift_leg_z=z,
                lift_leg_pos=jnp.zeros(3),
                prev=Prev(z, z, z, z, z, z, z, z, z, z, z),
            )
            fk_out = K.fk(self.robot, state.qpos)
            return self._subtask_vars(state, fk_out)

        return jax.vmap(wrap)(base)

    # -- observation ------------------------------------------------------------

    def observe(self, state) -> dict:
        obs = super().observe(state)
        if self.config.dense.phase_ob and hasattr(state, "phase_i"):
            obs["phase_ob"] = jax.nn.one_hot(state.phase_i, N_PHASES)
        return obs

    # -- dense reward machine -----------------------------------------------------

    def step(self, state: DenseState, action):
        prev_connected = state.num_connected
        state = self.step_physics(state, action)
        return self._finish_step(state, action, prev_connected)

    def _finish_step(self, state: DenseState, action, prev_connected):
        """Dense-reward post-physics layer; overriding ArmEnv's hook makes
        the inherited ``step_batch`` (megakernel physics + vmapped finish)
        produce dense rewards and phase bookkeeping too."""
        cfg = self.config
        d = cfg.dense
        state, unstable = self._guard(state)
        state = state._replace(t=state.t + 1)
        connected = state.num_connected > prev_connected

        fk_out = K.fk(self.robot, state.qpos)
        v = self._collect_values(state, fk_out)
        pr = state.prev
        phase = state.phase_i
        leg_touched = v["leg_touched"]
        table_moved_now = v["table_displacement"] > 0.1

        # ---- shared penalties/rewards ----
        # ctrl penalty (furniture_sawyer_dense.py:1002-1006)
        ctrl_penalty = -d.ctrl_penalty_coef * jnp.linalg.norm(action[:-2])
        # stable grip (:946-983)
        _, hand_quat = K.eef_pose(self.robot, fk_out, "right")
        eef_up = T.up_vector_from_quat(hand_quat)
        eef_fwd = T.forward_vector_from_quat(hand_quat)
        eef_up_dist = T.cos_siml(eef_up, jnp.array([0.0, 0.0, -1.0]))
        eef_up_rew = d.eef_up_dist_coef * (eef_up_dist - 1.0)
        gvec = v["leg_grasp_vec"]
        eef_fwd_dist = jnp.maximum(
            T.cos_siml(eef_fwd, gvec), T.cos_siml(-eef_fwd, gvec)
        )
        eef_fwd_rew = (jnp.abs(eef_fwd_dist) - 1.0) * d.eef_forward_dist_coef
        in_up = jnp.isin(phase, jnp.asarray(_GRIP_UP_PHASES))
        in_fwd = jnp.isin(phase, jnp.asarray(_GRIP_FORWARD_PHASES))
        stable_grip_reward = (
            jnp.where(in_up, eef_up_rew, 0.0) + jnp.where(in_fwd, eef_fwd_rew, 0.0)
        )
        sg_succ = jnp.where(in_up, eef_up_dist > d.eef_rot_threshold, True) & \
            jnp.where(in_fwd, eef_fwd_dist > d.eef_rot_threshold, True)
        # gripper penalty (:985-1000)
        grip_open_phase = jnp.isin(phase, jnp.asarray(_GRIP_OPEN_PHASES))
        grip_ac = action[-2]
        grip_penalty = (
            jnp.where(grip_open_phase, -grip_ac, grip_ac) * d.gripper_penalty_coef
        )
        grip_succ = jnp.where(grip_open_phase, grip_ac < 0, grip_ac > 0)
        # move-other-part penalty (:1008-1019)
        move_other_penalty = (
            -d.move_other_part_penalty_coef * v["table_displacement"]
        )

        # ---- per-phase diff rewards (diff_rew=True defaults) ----
        def f_clip(x, c):
            return jnp.minimum(x, c)

        # 0 init_eef (:579-601)
        init_dist = jnp.linalg.norm(v["eef_pos"] - state.init_eef_pos)
        f0 = lambda x: jnp.exp(-10 * jnp.minimum(x, 0.5))
        r0 = (f0(init_dist) - f0(pr.init_eef_dist)) * d.init_eef_pos_dist_coef * 10
        succ0 = init_dist < 0.03

        # 1 move_eef_above_leg (:603-627)
        above = v["leg_grasp_pos"] + jnp.array([0.0, 0.0, 0.05])
        above_dist = jnp.linalg.norm(v["eef_pos"] - above)
        r1 = (
            (f_clip(pr.eef_above_leg_dist, 1.0) - f_clip(above_dist, 1.0))
            * d.move_eef_pos_dist_coef
            * 10
        )
        succ1 = above_dist < 0.03

        # 2 lower_eef (:629-655) — also reused by grasp_leg
        lower = v["leg_grasp_pos"] + jnp.array([0.0, 0.0, -0.015])
        lower_xy = jnp.linalg.norm(v["eef_pos"][:2] - lower[:2])
        lower_z = jnp.abs(v["eef_pos"][2] - lower[2])
        lower_dist = jnp.linalg.norm(v["eef_pos"] - lower)
        r2 = (
            (f_clip(pr.eef_leg_dist, 0.2) - f_clip(lower_dist, 0.2))
            * d.lower_eef_pos_dist_coef
            * 10
        )
        succ2 = (lower_xy < 0.02) & (lower_z < 0.015)

        # 3 grasp_leg (:657-676)
        r3 = r2 + (grip_ac - pr.grasp_dist) * d.grasp_dist_coef
        succ3 = leg_touched & v["leg_safe_grasp"]

        # 4 lift_leg (:678-729)
        xy_dist = jnp.linalg.norm(state.lift_leg_pos[:2] - v["leg_pos"][:2])
        z_dist = jnp.abs(state.lift_leg_pos[2] - v["leg_pos"][2])
        lift_z_rew = (
            (f_clip(pr.lift_leg_z_dist, 0.5) - f_clip(z_dist, 0.5))
            * d.lift_z_dist_coef
            * 10
        )
        lift_xy_rew = (
            (f_clip(pr.lift_leg_xy_dist, 0.8) - f_clip(xy_dist, 0.8))
            * d.lift_xy_dist_coef
            * 10
        )
        leg_lift_now = v["leg_pos"][2] > (state.init_lift_leg_z + 0.01)
        lift_bonus = jnp.where(
            leg_touched & leg_lift_now & v["leg_safe_grasp"] & ~state.leg_lift,
            d.phase_bonus / 2,
            0.0,
        )
        r4 = lift_z_rew + lift_xy_rew
        r4 = jnp.where(leg_touched, r4, jnp.minimum(r4, 0.0)) + lift_bonus
        succ4 = (xy_dist < d.lift_xy_pos_threshold) & (
            z_dist < d.lift_z_pos_threshold
        )

        # 5 align_leg (:731-791)
        align_pos_dist = jnp.linalg.norm(state.lift_leg_pos - v["leg_pos"])
        a_pos = (
            (f_clip(pr.move_pos_dist, 0.4) - f_clip(align_pos_dist, 0.4))
            * d.align_pos_dist_coef
            * 10
        )
        a_up = (
            (v["move_up_ang_dist"] - pr.move_up_ang_dist)
            * d.align_rot_dist_coef
            * 10
        )
        a_fwd = (
            (v["move_forward_ang_dist"] - pr.move_forward_ang_dist)
            * d.align_rot_dist_coef
            * 10
        )
        r5 = (
            jnp.where(leg_touched, a_pos, jnp.minimum(a_pos, 0.0))
            + jnp.where(leg_touched, a_up, jnp.minimum(a_up, 0.0))
            + jnp.where(leg_touched, a_fwd, jnp.minimum(a_fwd, 0.0))
        )
        succ5 = (
            (align_pos_dist < d.align_pos_threshold)
            & (v["move_up_ang_dist"] > d.align_rot_threshold)
            & (v["move_forward_ang_dist"] > d.align_rot_threshold)
            & leg_touched
        )

        # 6 move_leg (:793-851)
        m_pos = (
            (f_clip(pr.move_pos_dist, 0.5) - f_clip(v["move_above_pos_dist"], 0.5))
            * d.move_pos_dist_coef
            * 10
        )
        m_up = (
            (jnp.maximum(v["move_up_ang_dist"], 0) - jnp.maximum(pr.move_up_ang_dist, 0))
            * d.move_rot_dist_coef
            * 10
        )
        m_fwd = (
            (
                jnp.maximum(v["move_forward_ang_dist"], 0)
                - jnp.maximum(pr.move_forward_ang_dist, 0)
            )
            * d.move_rot_dist_coef
            * 10
        )
        r6 = (
            jnp.where(leg_touched, m_pos, jnp.minimum(m_pos, 0.0))
            + jnp.where(leg_touched, m_up, jnp.minimum(m_up, 0.0))
            + jnp.where(leg_touched, m_fwd, jnp.minimum(m_fwd, 0.0))
        )
        succ6 = (
            (
                (v["move_above_pos_dist"] < d.move_pos_threshold)
                | (v["move_pos_dist"] < d.move_pos_threshold)
            )
            & (v["move_up_ang_dist"] > d.move_rot_threshold)
            & (v["move_forward_ang_dist"] > d.move_rot_threshold)
            & leg_touched
        )

        # 7 move_leg_fine (:853-944)
        ef = lambda x: jnp.exp(d.move_fine_pos_exp_coef * x)
        fine_pos = (
            (ef(v["move_pos_dist"]) - ef(pr.move_pos_dist))
            * d.move_fine_pos_dist_coef
            * 10
        )
        ang = lambda x: jnp.exp(
            -2 * (1 - jnp.maximum(x, d.move_rot_threshold - 0.1))
        )
        fine_up = (
            (ang(v["move_up_ang_dist"]) - ang(pr.move_up_ang_dist))
            * d.move_fine_rot_dist_coef
            * 10
        )
        fine_fwd = (
            (ang(v["move_forward_ang_dist"]) - ang(pr.move_forward_ang_dist))
            * d.move_fine_rot_dist_coef
            * 10
        )
        pf = lambda x: jnp.exp(-3 * (1 - jnp.maximum(jnp.abs(x), 0.5)))
        fine_pt = (pf(v["proj_table"]) - pf(pr.proj_t)) * d.move_fine_rot_dist_coef * 5
        fine_pl = (pf(v["proj_leg"]) - pf(pr.proj_l)) * d.move_fine_rot_dist_coef * 5
        aligned_now, _ = self.ops.alignment(state.parts)
        fine_succ = aligned_now[v["lsite"], v["tsite"]]
        connect_rew = jnp.where(
            fine_succ, (action[-1] + 1.0) * d.aligned_bonus_coef, 0.0
        )
        r7 = (
            jnp.where(leg_touched, fine_pos, jnp.minimum(fine_pos, 0.0))
            + jnp.where(leg_touched, fine_up, jnp.minimum(fine_up, 0.0))
            + jnp.where(leg_touched, fine_fwd, jnp.minimum(fine_fwd, 0.0))
            + jnp.where(leg_touched, fine_pt, jnp.minimum(fine_pt, 0.0))
            + jnp.where(leg_touched, fine_pl, jnp.minimum(fine_pl, 0.0))
            + connect_rew
        )
        r7 = jnp.where(connected, 0.0, r7)

        phase_rewards = jnp.stack([r0, r1, r2, r3, r4, r5, r6, r7])
        phase_succs = jnp.stack(
            [succ0, succ1, succ2, succ3, succ4, succ5, succ6, fine_succ]
        )
        phase_reward = phase_rewards[phase]
        phase_succ = phase_succs[phase]

        # ---- transitions (furniture_sawyer_dense.py:380-556) ----
        bonus = jnp.array(0.0)
        done = jnp.array(False)
        success = jnp.array(False)
        next_phase = phase
        next_state = state

        gates = sg_succ & grip_succ
        adv0 = (phase == INIT_EEF) & succ0 & gates
        adv1 = (phase == MOVE_EEF_ABOVE_LEG) & succ1 & gates
        adv2 = (phase == LOWER_EEF) & succ2 & gates
        adv3 = (phase == GRASP_LEG) & succ3 & sg_succ
        adv4 = (phase == LIFT_LEG) & leg_touched & ~table_moved_now & succ4
        adv5 = (phase == ALIGN_LEG) & leg_touched & ~table_moved_now & succ5
        adv6 = (phase == MOVE_LEG) & leg_touched & ~table_moved_now & succ6
        adv = adv0 | adv1 | adv2 | adv3 | adv4 | adv5 | adv6
        next_phase = jnp.where(adv, phase + 1, phase)
        bonus += jnp.where(adv0 | adv1 | adv2 | adv3 | adv4, d.phase_bonus, 0.0)
        bonus += jnp.where(adv5 | adv6, d.phase_bonus * 2, 0.0)

        # skip transitions (when phase_ob is off; :306-346)
        if not d.phase_ob:
            skip_lift = (
                v["leg_safe_grasp"] & sg_succ & (next_phase < GRASP_LEG)
            )
            next_phase = jnp.where(skip_lift, LIFT_LEG, next_phase)
            in_45 = (next_phase == LIFT_LEG) | (next_phase == ALIGN_LEG)
            skip_fine = (
                leg_touched
                & in_45
                & (
                    (v["move_pos_dist"] < d.move_pos_threshold)
                    | (v["move_above_pos_dist"] < d.move_pos_threshold)
                )
                & (v["move_up_ang_dist"] > d.move_rot_threshold)
                & (v["move_forward_ang_dist"] > d.move_rot_threshold)
            )
            next_phase = jnp.where(skip_fine, MOVE_LEG_FINE, next_phase)
        else:
            skip_fine = jnp.array(False)

        # drop / table-move bookkeeping (early_termination=False default:
        # flag + one-time drop penalty, no episode end; :444-556, :563-567)
        dropped_now = (
            (phase > GRASP_LEG) & ~leg_touched & ~state.leg_dropped & ~connected
        )
        table_moved_flag = state.table_moved | table_moved_now
        leg_dropped = state.leg_dropped | dropped_now
        drop_penalty = jnp.where(
            leg_dropped & ~jnp.array(d.early_termination),
            -d.drop_penalty_coef,
            0.0,
        )
        if d.early_termination:
            done = done | dropped_now | (table_moved_now & ~state.table_moved)
            bonus -= jnp.where(dropped_now, d.phase_bonus / 2, 0.0)
            bonus -= jnp.where(
                table_moved_now & ~state.table_moved, d.phase_bonus / 2, 0.0
            )

        # connect handling (:516-556 + :367-391)
        correct_connect = connected & fine_succ
        wrong_connect = connected & ~fine_succ
        bonus += jnp.where(correct_connect, d.phase_bonus * 2, 0.0)
        bonus -= jnp.where(
            correct_connect,
            state.leg_fine_aligned.astype(jnp.float32) * d.aligned_bonus_coef,
            0.0,
        )
        done = done | wrong_connect
        subtask_done = state.subtask_step + 1 >= self.success_num_connects
        success = correct_connect & subtask_done
        done = done | success

        leg_fine_aligned = jnp.where(
            fine_succ & (phase == MOVE_LEG_FINE),
            state.leg_fine_aligned + 1,
            state.leg_fine_aligned,
        )

        # ---- prev updates ----
        new_prev = Prev(
            init_eef_dist=jnp.where(phase == INIT_EEF, init_dist, pr.init_eef_dist),
            eef_above_leg_dist=jnp.where(
                adv0, above_dist,
                jnp.where(phase == MOVE_EEF_ABOVE_LEG, above_dist, pr.eef_above_leg_dist),
            ),
            eef_leg_dist=jnp.where(
                adv1, lower_dist,
                jnp.where(
                    (phase == LOWER_EEF) | (phase == GRASP_LEG),
                    lower_dist,
                    pr.eef_leg_dist,
                ),
            ),
            grasp_dist=jnp.where(phase == GRASP_LEG, grip_ac, pr.grasp_dist),
            lift_leg_z_dist=jnp.where(phase == LIFT_LEG, z_dist, pr.lift_leg_z_dist),
            lift_leg_xy_dist=jnp.where(
                phase == LIFT_LEG, xy_dist, pr.lift_leg_xy_dist
            ),
            move_pos_dist=jnp.where(
                adv4, jnp.array(0.0),
                jnp.where(
                    adv5, v["move_above_pos_dist"],
                    jnp.where(
                        adv6 | skip_fine, v["move_pos_dist"],
                        jnp.where(
                            phase == ALIGN_LEG, align_pos_dist,
                            jnp.where(
                                phase == MOVE_LEG, v["move_above_pos_dist"],
                                jnp.where(
                                    phase == MOVE_LEG_FINE,
                                    v["move_pos_dist"],
                                    pr.move_pos_dist,
                                ),
                            ),
                        ),
                    ),
                ),
            ),
            move_up_ang_dist=jnp.where(
                adv4 | skip_fine | (phase >= ALIGN_LEG),
                v["move_up_ang_dist"],
                pr.move_up_ang_dist,
            ),
            move_forward_ang_dist=jnp.where(
                adv4 | skip_fine | (phase >= ALIGN_LEG),
                v["move_forward_ang_dist"],
                pr.move_forward_ang_dist,
            ),
            proj_t=jnp.where(
                adv6 | skip_fine | (phase == MOVE_LEG_FINE),
                v["proj_table"],
                pr.proj_t,
            ),
            proj_l=jnp.where(
                adv6 | skip_fine | (phase == MOVE_LEG_FINE),
                v["proj_leg"],
                pr.proj_l,
            ),
        )

        state = state._replace(
            phase_i=next_phase.astype(jnp.int32),
            prev=new_prev,
            leg_dropped=leg_dropped,
            table_moved=table_moved_flag,
            leg_lift=state.leg_lift | (leg_lift_now & leg_touched & v["leg_safe_grasp"]),
            leg_fine_aligned=leg_fine_aligned,
        )

        # advance to next subtask on a correct connect (:141-147)
        def next_subtask(st: DenseState) -> DenseState:
            st = st._replace(
                subtask_step=st.subtask_step + 1,
                phase_i=jnp.array(0, jnp.int32),
            )
            return self._subtask_vars(st, fk_out)

        state = jax.lax.cond(
            correct_connect & ~subtask_done, next_subtask, lambda s: s, state
        )

        reward = (
            ctrl_penalty
            + phase_reward
            + stable_grip_reward
            + grip_penalty
            + bonus
            + move_other_penalty
            + drop_penalty
            - cfg.reward.unstable_penalty_coef * unstable
        )
        done = done | (state.t >= cfg.max_episode_steps) | unstable

        obs = self.observe(state)
        info = {
            "success": success,
            "unstable": unstable,
            "phase_i": state.phase_i
            + N_PHASES * state.subtask_step,
            "subtask": state.subtask_step,
            "phase_bonus": bonus,
            "phase_reward": phase_reward,
            "ctrl_penalty": ctrl_penalty,
            "stable_grip_reward": stable_grip_reward,
            "gripper_penalty": grip_penalty,
            "move_other_part_penalty": move_other_penalty,
            "touch": leg_touched,
            "num_connected": state.num_connected,
        }
        return state, obs, reward, done, info
