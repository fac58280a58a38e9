"""Batched articulated-arm environments (Sawyer / Panda / Jaco / Fetch /
Baxter), rebuilt as pure jitted step functions.

Reference semantics reproduced (citations into /root/reference):

* control types
  - ``ik``: eef-delta actions → persistent world-frame IK target, 20-iter
    DLS IK, joint P-control velocities clipped to ±1, velocity actuators,
    ×3 action repeat with velocity recomputation
    (``env/furniture.py:2899-2996`` ``_do_ik_step``;
    ``controllers/sawyer_ik_controller.py:51-88,240-277``)
  - ``impedance``: normalized joint-velocity targets rescaled to actuator
    ctrlranges (velocity servos; ``env/furniture.py:1277-1285`` +
    ``_setup_action`` :3332-3380)
  - ``torque``: direct motor torques on the ``robot_torque.xml`` variant
    (``env/furniture.py:1268-1275``)
  - new controllers (``position_orientation``/``position``/
    ``joint_impedance``/``joint_velocity``/``joint_torque``): torque-space
    controllers ported from ``controllers/arm_controller.py`` (see
    ``furniture_tpu/controllers/osc.py``)
* robot is gravity/bias-compensated every control step
  (``qfrc_applied = qfrc_bias``, ``env/furniture.py:3371-3377``), so arm
  dynamics reduce to M(q)q̈ = τ_act − D q̇ (integrated implicitly)
* two-finger grasping is real contact physics: gripper geoms are kinematic
  colliders with prescribed surface velocities in the part contact solver
  (the coupling MuJoCo provides natively; ``physics/collide.robot_contacts``)
* connect requires both finger groups touching a part, then runs the shared
  connect state machine on that part's group vs all others
  (``env/furniture.py:1290-1330``, ``_try_connect`` :926)
* sparse reward: touch / pick (once per part) + success × newly-connected
  + ctrl penalty (``env/furniture.py:482-541``)
* observations per agent env (``furniture_sawyer.py:103-155``):
  ik → [gripper_qpos, eef_pos, eef_quat(xyzw), eef_velp, eef_velr];
  impedance/torque prepend [joint_pos, joint_vel]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import transforms as T
from ..config import EnvConfig
from ..controllers import dls_ik, ik_velocities
from ..controllers.osc import (
    joint_impedance_torques,
    joint_velocity_torques,
    load_controller_config,
    orientation_error,
    osc_torques,
)
from ..models import CompiledModel, compile_from_config, compile_model
from ..physics import PartState, init_state
from ..physics.collide import robot_contacts
from ..physics.engine import make_substep, physics_tables, robot_contact_tables
from ..robots import AGENT_SPECS, compile_robot
from ..robots import kinematics as K
from .assembly import AssemblyOps, sample_placement

NEW_CONTROLLERS = (
    "position_orientation",
    "position",
    "joint_impedance",
    "joint_velocity",
    "joint_torque",
)

# gripper scalar → joint-control sign map (reference format_action:
# two_finger_gripper.py:66-73, panda_gripper.py:65-71, fetch_gripper.py:63-68;
# Jaco replicates the scalar over 3 finger joints, env/furniture.py:2966)
_GRIPPER_SIGNS = {
    "two_finger_gripper": [1.0, -1.0],
    "left_two_finger_gripper": [1.0, -1.0],
    "panda_gripper": [-1.0, 1.0],
    "fetch_gripper": [1.0, 1.0],
    "jaco_gripper": [1.0, 1.0, 1.0],
}

# reference gripper workspace box (env/furniture.py:170-171)
_MIN_GRIPPER_POS = np.array([-1.5, -1.5, 0.0])
_MAX_GRIPPER_POS = np.array([1.5, 1.5, 1.5])


class ArmState(NamedTuple):
    """Complete per-env state for an arm agent (a pytree of arrays)."""

    # assembly fields (shared with AssemblyOps duck-typing)
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
    # robot
    qpos: jax.Array            # [NJ]
    qvel: jax.Array            # [NJ]
    ik_target_pos: jax.Array   # [n_arms,3] persistent IK target (world)
    hand_quat_init: jax.Array  # [n_arms,4] accumulated target hand quat
                               # (reference _initial_right_hand_quat)
    # reward bookkeeping (env/furniture.py:516-521 _touched/_picked)
    touched: jax.Array         # [P] bool
    picked: jax.Array          # [P] bool
    touch_l: jax.Array         # [n_arms,P] finger touches after last substep
    touch_r: jax.Array         # [n_arms,P]
    t: jax.Array


class ArmEnv:
    """Host-side factory for pure reset/step functions of one (agent,
    furniture, control_type) combination. jit/vmap from the caller.

    ``step_batch``/``reset_batch`` are the preferred batched entry points:
    same semantics as ``vmap(step)``/``vmap(reset)``, but the whole control
    step (FK + robot contacts + joint dynamics + part physics) routes through
    the arm Pallas megakernel on TPU (``physics/arm_megakernel.py``)."""

    has_batch_api = True

    def __init__(self, config: EnvConfig | None = None, model: CompiledModel | None = None):
        self.config = config or EnvConfig(agent_type="Sawyer")
        cfg = self.config
        assert cfg.agent_type in AGENT_SPECS, cfg.agent_type
        self.control_type = cfg.control_type
        use_torque = self.control_type in ("torque",) + NEW_CONTROLLERS
        self.robot = compile_robot(cfg.agent_type, use_torque=use_torque)
        self.model = model or compile_from_config(cfg)
        self.tables = physics_tables(self.model)
        self.tables.update(
            robot_contact_tables(
                self.tables, self.robot, lane_budget=cfg.sim.arm_lane_budget
            )
        )
        self.substep = make_substep(self.tables, cfg.sim)
        self.ops = AssemblyOps(self.model, cfg, self.tables)

        m = self.model
        r = self.robot
        self._P = m.n_parts
        self._C = m.n_conn
        self._W = m.n_welds
        nc = cfg.num_connects
        # with num_connects set, preassembled connects count on top of it
        # (env/furniture.py:1479)
        if nc is not None:
            self.success_num_connects = int(nc) + len(cfg.preassembled)
        else:
            self.success_num_connects = int(m.num_connects)
        # initial-state pool (env/furniture.py:127-130; utils/init_pool)
        self._init_pool = None
        if cfg.load_init_states:
            from ..utils.init_pool import load_pool

            self._init_pool = load_pool(cfg.load_init_states)

        self.arms = r.arms
        self.n_arms = len(r.arms)

        # static per-lane finger masks for touch detection (flat per-lane
        # robot tables, engine.robot_contact_tables)
        lane_rg = self.tables["_lane_rgeom"]
        rl_pgeom = self.tables["_rl_pgeom"]
        lane_part = (
            np.concatenate([self.tables["geom_part"][rl_pgeom]] * 2)
            if len(rl_pgeom)
            else np.zeros(0, np.int32)
        )
        self._lane_part = lane_part
        self._lane_l = {
            arm: np.isin(lane_rg, r.finger_geoms_l[arm]) for arm in r.arms
        }
        self._lane_r = {
            arm: np.isin(lane_rg, r.finger_geoms_r[arm]) for arm in r.arms
        }

        # action layout (reference dof properties, furniture_sawyer.py:53-64,
        # furniture_baxter.py:52-63, furniture_jaco.py:53-64)
        self.gripper_action_dims = {
            arm: (len(_GRIPPER_SIGNS[AGENT_SPECS[cfg.agent_type]["grippers"][arm][0]])
                  if self.control_type in ("impedance", "torque") + NEW_CONTROLLERS
                  and cfg.agent_type == "Jaco" else 1)
            for arm in r.arms
        }
        if self.control_type == "ik":
            self.dof = 6 * self.n_arms + self.n_arms + 1
        elif self.control_type == "ik_quaternion":
            self.dof = 7 * self.n_arms + self.n_arms + 1
        else:
            self.dof = (
                r.dof + sum(self.gripper_action_dims.values()) + 1
            )

        self._ctrl_cfg = load_controller_config()

        # batched parts-only physics (cursor megakernel on TPU) for the
        # reset settle rounds
        from ..physics.megakernel import make_batched_substeps

        self._batched_substeps = make_batched_substeps(
            self.tables, cfg.sim, self.substep
        )

        # static lane→joint ancestry for the JᵀF coupling feedback
        self._lane_anc = (
            self.robot.ancestor[self.robot.geom_body[lane_rg]].astype(np.float32)
            if len(lane_rg)
            else np.zeros((0, self.robot.nj), np.float32)
        )

        # batched TPU production path: the whole-control-step arm megakernel
        mode = cfg.sim.use_pallas
        on_tpu = jax.default_backend() == "tpu"
        use_mega = (mode == "auto" and on_tpu) or mode == "on"
        self._mega = None
        if use_mega and len(self.tables["_robot_pairs"]) and len(self.tables["_pairs"]):
            from ..physics.arm_megakernel import ArmMegaPhysics

            self._mega = ArmMegaPhysics(
                self.tables,
                self.robot,
                cfg.sim,
                block=cfg.sim.arm_mega_block,
                interpret=not on_tpu,
            )

    # -- low-level control ---------------------------------------------------

    def _format_ctrl(self, arm_ctrl, gripper_scalars):
        """Assemble the [NA] actuator control vector from arm controls (already
        in actuator order) + per-arm gripper scalars, rescaling normalized
        inputs to actuator ctrlranges (``_setup_action``,
        ``env/furniture.py:3332-3369``)."""
        r = self.robot
        spec = AGENT_SPECS[self.config.agent_type]
        ctrl = jnp.zeros(r.na)
        for arm in r.arms:
            rows = r.arm_actuators[arm]
            ctrl = ctrl.at[jnp.asarray(rows)].set(arm_ctrl[arm])
            signs = jnp.asarray(
                _GRIPPER_SIGNS[spec["grippers"][arm][0]], jnp.float32
            )
            g = gripper_scalars[arm] * signs  # formatted gripper action
            grows = r.gripper_actuators[arm]
            ctrl = ctrl.at[jnp.asarray(grows)].set(g[: len(grows)])
        # rescale [-1,1] → ctrlrange
        lo = jnp.asarray(r.act_ctrlrange[:, 0], jnp.float32)
        hi = jnp.asarray(r.act_ctrlrange[:, 1], jnp.float32)
        c = jnp.clip(ctrl, -1.0, 1.0)
        return 0.5 * (hi + lo) + 0.5 * (hi - lo) * c

    def _robot_geoms(self, fk_out, qvel):
        rg_pos, rg_quat = K.geom_world(self.robot, fk_out)
        rg_vel, rg_ang = K.geom_velocities(self.robot, fk_out, qvel)
        return rg_pos, rg_quat, rg_vel, rg_ang

    def _sim_substeps(self, state: ArmState, ctrl, tau_extra, n: int) -> ArmState:
        """n coupled substeps: arm joint dynamics + part physics with the
        gripper as kinematic collider in the part solver and (with
        ``sim.robot_coupling``) contact impulses fed back as Jᵀλ joint-space
        impulses (``_do_simulation``, ``env/furniture.py:2857-2887`` — MuJoCo
        steps these contacts two-way; arm agents do NOT stop parts).

        The joint-space inertia is frozen per control step (the arm moves ≤ a
        few degrees per 0.05–0.1 s with bias-compensated dynamics) into the
        precomputed update matrices G1/G2; FK, geom velocities, actuator
        torques, and contacts update exactly per substep. This is the XLA
        reference path; the TPU production path is the identical-math Pallas
        megakernel (``physics/arm_megakernel.py``) behind ``step_batch``.
        """
        r = self.robot
        cfg = self.config.sim
        couple = cfg.robot_coupling

        G1, G2 = K.joint_dyn_matrices(r, state.qpos, cfg.timestep)
        anc_lane = jnp.asarray(self._lane_anc)
        # warm-start buffer: base lanes + robot lanes (see engine.substeps)
        n_lam = self.substep.n_base_lanes + len(self._lane_part)

        n_base = self.substep.n_base_lanes

        def body(carry, _):
            qpos, qvel, parts, lam_ws = carry
            fk_out = K.fk(r, qpos)
            rg_pos, rg_quat = K.geom_world(r, fk_out)
            rg_vel, rg_ang = K.geom_velocities(r, fk_out, qvel)
            extra = robot_contacts(
                self.tables,
                self.tables["robot_np"],
                parts.pos,
                parts.quat,
                rg_pos,
                rg_quat,
                rg_vel,
                rg_ang,
                cfg.contact_slop,
            )
            # contact-aware gripper servo: once finger penetration exceeds
            # `gripper_squeeze`, the closing direction is blocked (target
            # clamped to the current position); opening stays free. This
            # emulates MuJoCo's force-limited finger servos — purely
            # kinematic fingers would close straight through the part.
            ctrl_eff = ctrl
            deeps = {}
            for arm in self.arms:
                lanes = jnp.asarray(self._lane_l[arm] | self._lane_r[arm])
                pen = jnp.max(
                    jnp.where(extra.mask & lanes, extra.depth, -jnp.inf)
                )
                deep = pen > cfg.gripper_squeeze
                grows_ = jnp.asarray(r.gripper_actuators[arm])
                gj_ = jnp.asarray(r.act_joint[r.gripper_actuators[arm]])
                cs_ = jnp.asarray(
                    r.act_close_sign[r.gripper_actuators[arm]], jnp.float32
                )
                # servo actively commanding closure (raw ctrl beyond the
                # current finger position in the closing direction): an OPEN
                # gripper straddling a part must not squeeze — the floor
                # otherwise grabs lying legs during descent and drags them
                closing = jnp.any(cs_ * (ctrl[grows_] - qpos[gj_]) > 0)
                # the floor engages at HALF the servo clamp threshold: the
                # clamp equilibrates penetration right at `gripper_squeeze`,
                # so gating the floor on the same value makes the pinch
                # flicker substep-to-substep (floor active only part-time
                # and carried grasps still slipped)
                deeps[arm] = closing & (pen > 0.5 * cfg.gripper_squeeze)
                grows = jnp.asarray(r.gripper_actuators[arm])
                gj = jnp.asarray(r.act_joint[r.gripper_actuators[arm]])
                cs = jnp.asarray(
                    r.act_close_sign[r.gripper_actuators[arm]], jnp.float32
                )
                held = jnp.where(
                    cs > 0,
                    jnp.minimum(ctrl[grows], qpos[gj]),
                    jnp.maximum(ctrl[grows], qpos[gj]),
                )
                ctrl_eff = ctrl_eff.at[grows].set(
                    jnp.where(deep, held, ctrl[grows])
                )
            tau, _, _ = K.actuator_torques(r, qpos, qvel, ctrl_eff)
            if tau_extra is not None:
                tau = tau + tau_extra
            # finger-servo press (SimConfig.grip_press_vel): while the servo
            # commands closing and the squeeze clamp holds penetration, the
            # pad surface keeps advancing — modeled as an inward prescribed
            # surface velocity on the engaged finger lanes. Squeeze forces
            # (and the resulting friction force closure) then emerge from
            # the contact solve itself, momentum-consistently, saturating
            # at the warm-start cap. n̂ points from the finger surface
            # toward the part body, so the advancing pad surface moves
            # along +n̂.
            if cfg.grip_press_vel > 0 and len(self._lane_part):
                press = jnp.zeros(extra.mask.shape, jnp.float32)
                for arm in self.arms:
                    finger = jnp.asarray(self._lane_l[arm] | self._lane_r[arm])
                    press = press + jnp.where(
                        extra.mask & finger & deeps[arm], 1.0, 0.0
                    )
                extra = extra._replace(
                    vel_b=extra.vel_b
                    + cfg.grip_press_vel * press[:, None] * extra.normal
                )
            gscale = jnp.ones(self._P)
            if couple:
                parts2, lam_imp, lam_ws = self.substep(
                    parts,
                    state.group,
                    gscale,
                    extra_contacts=extra,
                    return_extra_impulses=True,
                    lam_warm=lam_ws,
                    return_lam=True,
                )
                p_c = K.contact_impulses_to_joints(
                    r, fk_out, extra.point, anc_lane, lam_imp
                )
                # spike clamp (SimConfig.robot_coupling_clamp)
                pc_cap = cfg.robot_coupling_clamp * cfg.timestep
                p_c = jnp.clip(p_c, -pc_cap, pc_cap)
            else:
                parts2, lam_ws = self.substep(
                    parts, state.group, gscale, extra_contacts=extra,
                    lam_warm=lam_ws,
                    return_lam=True,
                )
                p_c = jnp.zeros(r.nj)
            # grasp-aware velocity clamp (SimConfig.held_vel_clamp): a
            # pinched group's speed is bounded at hand scale — the explicit
            # coupling otherwise pumps energy when a held part is wedged
            # against the structure (connector mating) and ejects it
            if cfg.held_vel_clamp > 0:
                lane_part = jnp.asarray(self._lane_part)
                pinched = jnp.zeros(self._P, bool)
                for arm in self.arms:
                    tl = (
                        jax.ops.segment_max(
                            (extra.mask & jnp.asarray(self._lane_l[arm])).astype(
                                jnp.int32
                            ),
                            lane_part,
                            num_segments=self._P,
                        )
                        > 0
                    )
                    tr = (
                        jax.ops.segment_max(
                            (extra.mask & jnp.asarray(self._lane_r[arm])).astype(
                                jnp.int32
                            ),
                            lane_part,
                            num_segments=self._P,
                        )
                        > 0
                    )
                    pinched = pinched | (tl & tr & deeps[arm])
                pin_g = jnp.any(
                    (state.group[:, None] == state.group[None, :])
                    & pinched[None, :],
                    axis=1,
                )

                def cap_vec(v, cap):
                    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
                    scale = jnp.minimum(1.0, cap / jnp.maximum(n, 1e-9))
                    return jnp.where(pin_g[:, None], v * scale, v)

                parts2 = parts2._replace(
                    lin_vel=cap_vec(parts2.lin_vel, cfg.held_vel_clamp),
                    ang_vel=cap_vec(parts2.ang_vel, cfg.held_angvel_clamp),
                )
            qpos2, qvel2 = K.integrate_precomputed(
                r, G1, G2, qpos, qvel, tau, p_c, cfg.timestep
            )
            return (qpos2, qvel2, parts2, lam_ws), extra.mask

        (qpos, qvel, parts, _), masks = jax.lax.scan(
            body,
            (
                state.qpos,
                state.qvel,
                state.parts,
                jnp.zeros((n_lam, 3), jnp.float32),
            ),
            None,
            length=n,
        )
        state = state._replace(qpos=qpos, qvel=qvel, parts=parts)
        return self._update_touches(state, masks[-1])

    def _update_touches(self, state: ArmState, contact_mask) -> ArmState:
        """Finger-touch masks from the final substep's contact configuration
        (``env/furniture.py:1290-1330`` scans ``sim.data.contact`` after the
        control step)."""
        lane_part = jnp.asarray(self._lane_part)
        tl, tr = [], []
        for arm in self.arms:
            for masks, acc in ((self._lane_l[arm], tl), (self._lane_r[arm], tr)):
                hit = contact_mask & jnp.asarray(masks)
                acc.append(
                    jax.ops.segment_max(
                        hit.astype(jnp.int32), lane_part, num_segments=self._P
                    )
                    > 0
                )
        return state._replace(
            touch_l=jnp.stack(tl), touch_r=jnp.stack(tr)
        )

    # -- control-type dispatch -------------------------------------------------

    def _ik_prepare(self, state: ArmState, action):
        """IK-target update + DLS IK solve (once per control step); returns
        ``(state', q_cmd [NJ], grip [n_arms])`` — shared by the per-env and
        batched paths (``_do_ik_step``, ``env/furniture.py:2899-2996``)."""
        cfg = self.config
        r = self.robot

        # per-arm action width: ik = [dpos3, deuler3]; ik_quaternion =
        # [dpos3, dquat4] (env/furniture.py:3000-3010, wxyz delta quat
        # right-multiplied onto the current hand quat via _make_input :1332)
        aw = 7 if self.control_type == "ik_quaternion" else 6
        new_tpos = []
        new_hqi = []
        q_cmd = state.qpos
        for i, arm in enumerate(self.arms):
            a = action[aw * i : aw * i + aw]
            # action deltas are world-frame. (The reference's axis swap at
            # :2914 converts world→robot-base frame for its base-frame bullet
            # IK target; composed with the base rotation Rz(-90°) it is the
            # identity, so a world-frame IK target needs no swap.)
            move = a[:3] * cfg.move_speed
            fk_out = K.fk(r, state.qpos)
            hand_pos, hand_quat = K.eef_pose(r, fk_out, arm)
            dpos = jnp.clip(
                move,
                jnp.asarray(_MIN_GRIPPER_POS, jnp.float32) - hand_pos,
                jnp.asarray(_MAX_GRIPPER_POS, jnp.float32) - hand_pos,
            )
            if self.control_type == "ik_quaternion":
                # delta quaternion action (wxyz), right-multiplied onto the
                # current hand quat (env/furniture.py:3010,1332-1342);
                # normalize so arbitrary action vectors are valid rotations
                dq_in = T.quat_normalize(a[3:7])
                # keep w >= 0 (shortest arc) so random-action quats do not
                # command near-360° targets
                dq_in = jnp.where(dq_in[0] < 0, -dq_in, dq_in)
                hqi = T.quat_normalize(T.quat_mul(hand_quat, dq_in))
            else:
                # rotation deltas are hand-frame euler, RIGHT-multiplied onto
                # the accumulated target (matching the reference's composition
                # direction, env/furniture.py:2917,1332-1342). This choice is
                # load-bearing for controllability of the site up/forward
                # vectors: those use the reference's ROW convention
                # (transform_utils.py:520-545, i.e. R(q)ᵀ·axis), and under a
                # right-multiplied delta δ they transform as a clean WORLD
                # rotation v' = R(δ)⁻¹·v — so a P-controller on those vectors
                # commands euler = −(in-plane angle) per axis
                # (envs/sawyer_gen.py align phases). A left-multiplied world
                # delta scrambles them through the full hand orientation.
                # the same 0.3 sensitivity low-pass as position — without it
                # a ±1 rot action jumps the wrist target 22.5° in one control
                # step, which flings grasped parts out of the friction grip
                hqi = T.quat_mul(
                    state.hand_quat_init[i],
                    T.euler_to_quat(0.3 * a[3:6] * cfg.rotate_speed),
                )
                hqi = T.quat_normalize(hqi)
            # anti-windup: keep the orientation target within 45° of the
            # actual hand; an unbounded target makes the arm lurch (and fling
            # grasped parts) when the IK finally finds a path to it
            dq = T.quat_mul(hqi, T.quat_inv(hand_quat))
            dq = jnp.where(dq[0] < 0, -dq, dq)
            ang = 2.0 * jnp.arccos(jnp.clip(dq[0], -1.0, 1.0))
            frac = jnp.minimum(1.0, (jnp.pi / 4) / jnp.maximum(ang, 1e-6))
            hqi = T.quat_slerp(hand_quat, hqi, frac)
            # target moves by user_sensitivity×dpos (the IK low-pass,
            # sawyer_ik_controller.py:47,251); anti-windup keeps the target
            # within 15 cm of the actual hand
            tpos = state.ik_target_pos[i] + 0.3 * dpos
            err = tpos - hand_pos
            err_n = jnp.linalg.norm(err)
            tpos = hand_pos + err * jnp.minimum(1.0, 0.15 / jnp.maximum(err_n, 1e-6))
            # (the reference's extra -90° z offset, sawyer_ik_controller.py:
            # 250-258, compensates pybullet's URDF eef frame differing from
            # the MuJoCo hand frame — our IK runs on the hand frame directly,
            # so no offset is needed)
            tquat = hqi
            q_cmd = dls_ik(r, arm, q_cmd, tpos, tquat)
            new_tpos.append(tpos)
            new_hqi.append(hqi)

        state = state._replace(
            ik_target_pos=jnp.stack(new_tpos), hand_quat_init=jnp.stack(new_hqi)
        )

        # gripper scalars follow the per-arm blocks (env/furniture.py:
        # 2919-2959 for ik, :3012-3015 for ik_quaternion)
        grip = jnp.stack(
            [action[aw * self.n_arms + i] for i in range(self.n_arms)]
        )
        return state, q_cmd, grip

    def _ik_ctrl(self, qpos, q_cmd, grip):
        """Actuator controls for one IK action repeat: P-control joint
        velocities toward the commanded positions, re-evaluated at the
        current qpos (``env/furniture.py:2978-2996``)."""
        r = self.robot
        arm_ctrl = {
            arm: ik_velocities(qpos, q_cmd, r.arm_joints[arm])
            for arm in self.arms
        }
        return self._format_ctrl(
            arm_ctrl, {arm: grip[i] for i, arm in enumerate(self.arms)}
        )

    def _ik_step(self, state: ArmState, action) -> ArmState:
        """``_do_ik_step`` (``env/furniture.py:2899-2996``)."""
        cfg = self.config
        state, q_cmd, grip = self._ik_prepare(state, action)

        # ×action_repeat closed-loop repeats (env/furniture.py:2978-2996):
        # velocities recomputed from the same commanded joint positions
        def repeat_body(st, _):
            ctrl = self._ik_ctrl(st.qpos, q_cmd, grip)
            return self._sim_substeps(st, ctrl, None, cfg.n_substeps), None

        state, _ = jax.lax.scan(
            repeat_body, state, None, length=cfg.action_repeat
        )
        return state

    def _direct_ctrl(self, action):
        """``impedance``/``torque`` actuator controls from a normalized
        action (``env/furniture.py:1268-1285``)."""
        r = self.robot
        arm_ctrl = {}
        k = 0
        for arm in self.arms:
            na = len(r.arm_actuators[arm])
            arm_ctrl[arm] = action[k : k + na]
            k += na
        grip = {}
        for arm in self.arms:
            grip[arm] = action[k]
            k += self.gripper_action_dims[arm]
        return self._format_ctrl(arm_ctrl, grip)

    def _direct_step(self, state: ArmState, action) -> ArmState:
        """``impedance`` (velocity servos) / ``torque`` (motors) modes:
        normalized action rescaled to ctrlranges, one control step
        (``env/furniture.py:1268-1285``)."""
        ctrl = self._direct_ctrl(action)
        return self._sim_substeps(state, ctrl, None, self.config.n_substeps)

    def _controller_prepare(self, state: ArmState, action):
        """New-controller modes (``_do_controller_step``,
        ``env/furniture.py:3065-3094``): returns (ctrl, tau_extra) — torques
        from the ported arm_controller math held for one control step, with
        the gripper scalar riding the regular actuator path."""
        r = self.robot
        cfg = self.config
        ct = self.control_type
        ccfg = self._ctrl_cfg.get(
            "position_orientation" if ct in ("position",) else ct,
            self._ctrl_cfg.get(ct, {}),
        )

        fk_out = K.fk(r, state.qpos)
        M = K.mass_matrix(r, fk_out)
        tau_extra = jnp.zeros(r.nj)
        k = 0
        for arm in self.arms:
            arm_j = r.arm_joints[arm]
            na = len(arm_j)
            if ct in ("position_orientation", "position"):
                a = action[k : k + (6 if ct == "position_orientation" else 3)]
                k += 6 if ct == "position_orientation" else 3
                eef_pos, eef_quat = K.eef_pose(r, fk_out, arm)
                rng_pos = ccfg.get("control_range_pos", 0.05)
                rng_ori = ccfg.get("control_range_ori", 0.2)
                goal_pos = eef_pos + a[:3] * rng_pos
                if ct == "position_orientation":
                    d_euler = a[3:6] * rng_ori
                    goal_mat = T.quat_to_mat(
                        T.euler_to_quat(d_euler * 180.0 / np.pi, eef_quat)
                    )
                else:
                    goal_mat = T.quat_to_mat(eef_quat)
                kp = ccfg.get("initial_impedance_pos", 150.0)
                kp_ori = ccfg.get("initial_impedance_ori", 150.0)
                damping = ccfg.get("initial_damping", 1.0)
                tau_arm = osc_torques(
                    r, arm, fk_out, M, state.qpos, state.qvel,
                    goal_pos, goal_mat, kp, kp_ori, damping,
                    initial_joint=np.asarray(r.init_qpos)[arm_j],
                    position_only=(ct == "position"),
                )
            elif ct == "joint_impedance":
                a = action[k : k + na]
                k += na
                rng = jnp.asarray(
                    (ccfg.get("control_range", [0.2] * na) * na)[:na], jnp.float32
                )
                goal_q = state.qpos[arm_j] + a * rng
                kp = jnp.asarray((ccfg.get("kp_max", [100] * na) * na)[:na], jnp.float32) * 0.5
                Ma = M[arm_j][:, arm_j]
                tau_arm = joint_impedance_torques(
                    Ma, state.qpos[arm_j], state.qvel[arm_j], goal_q, kp, 1.0
                )
            elif ct == "joint_velocity":
                a = action[k : k + na]
                k += na
                kv = jnp.asarray((ccfg.get("kv", [8.0] * na) * na)[:na], jnp.float32)
                rng = ccfg.get("control_range", 1.0)
                rng = rng[0] if isinstance(rng, list) else rng
                tau_arm = joint_velocity_torques(
                    state.qvel[arm_j], a * rng, kv
                )
            else:  # joint_torque
                a = action[k : k + na]
                k += na
                rng = ccfg.get("control_range", 1.0)
                rng = rng[0] if isinstance(rng, list) else rng
                tau_arm = a * rng
            tau_extra = tau_extra.at[jnp.asarray(arm_j)].add(tau_arm)

        grip = {}
        for arm in self.arms:
            grip[arm] = action[k]
            k += self.gripper_action_dims[arm]
        # zero arm actuator commands; gripper still position-servoed
        ctrl = self._format_ctrl(
            {arm: jnp.zeros(len(r.arm_actuators[arm])) for arm in self.arms},
            grip,
        )
        return ctrl, tau_extra

    def _controller_step(self, state: ArmState, action) -> ArmState:
        # motors get zero ctrl; controller torque enters via tau_extra
        ctrl, tau_extra = self._controller_prepare(state, action)
        return self._sim_substeps(state, ctrl, tau_extra, self.config.n_substeps)

    # -- public API --------------------------------------------------------------

    def _reset_unsettled(self, key) -> ArmState:
        """Placement + robot init WITHOUT the part-settle rounds (those are
        appended by ``reset``/``reset_batch`` so the batched path can run
        them through the megakernel instead of vmapped XLA micro-kernels)."""
        cfg = self.config
        r = self.robot
        k_place, k_agent = jax.random.split(key)
        pos, quat = sample_placement(self.model, cfg, k_place)
        parts = init_state(pos, quat)
        group = jnp.arange(self._P, dtype=jnp.int32)

        qpos = jnp.asarray(r.init_qpos, jnp.float32)
        noise = cfg.agent_xyz_rand * jax.random.uniform(
            k_agent, qpos.shape, minval=-1.0, maxval=1.0
        )
        qpos = qpos + noise
        qvel = jnp.zeros_like(qpos)

        fk_out = K.fk(r, qpos)
        tpos, hqi = [], []
        for arm in self.arms:
            hp, hq = K.eef_pose(r, fk_out, arm)
            tpos.append(hp)
            hqi.append(hq)

        state = ArmState(
            parts=parts,
            group=group,
            conn_connected=jnp.zeros(self._C, bool),
            weld_active=jnp.zeros(self._W, bool),
            num_connected=jnp.array(0, jnp.int32),
            subtask=self.ops.initial_subtask(),
            connect_step=jnp.array(0, jnp.int32),
            connected_body1=jnp.array(-1, jnp.int32),
            connected_body1_pos=jnp.zeros(3),
            connected_body1_quat=jnp.array([1.0, 0, 0, 0]),
            qpos=qpos,
            qvel=qvel,
            ik_target_pos=jnp.stack(tpos),
            hand_quat_init=jnp.stack(hqi),
            touched=jnp.zeros(self._P, bool),
            picked=jnp.zeros(self._P, bool),
            touch_l=jnp.zeros((self.n_arms, self._P), bool),
            touch_r=jnp.zeros((self.n_arms, self._P), bool),
            t=jnp.array(0, jnp.int32),
        )
        return state

    def restore_snapshot(self, state: ArmState, snap: dict) -> ArmState:
        """Overwrite the dynamic fields of ``state`` with one recorded demo
        ``states`` entry (``utils/demo.py`` stream; reference state-based
        ``run_demo`` replay, ``env/furniture.py:2183``). ``state`` supplies
        the remaining bookkeeping fields (a fresh ``reset`` works)."""
        parts = state.parts._replace(
            pos=jnp.asarray(snap["parts_pos"], jnp.float32),
            quat=jnp.asarray(snap["parts_quat"], jnp.float32),
            lin_vel=jnp.asarray(snap["parts_lin_vel"], jnp.float32),
            ang_vel=jnp.asarray(snap["parts_ang_vel"], jnp.float32),
        )
        qpos = jnp.asarray(snap["qpos"], jnp.float32)
        # refresh the persistent IK target at the restored hand pose
        fk_out = K.fk(self.robot, qpos)
        tpos, hqi = [], []
        for arm in self.arms:
            hp, hq = K.eef_pose(self.robot, fk_out, arm)
            tpos.append(hp)
            hqi.append(hq)
        return state._replace(
            parts=parts,
            qpos=qpos,
            qvel=jnp.asarray(snap["qvel"], jnp.float32),
            ik_target_pos=jnp.stack(tpos),
            hand_quat_init=jnp.stack(hqi),
            group=jnp.asarray(snap["group"], jnp.int32),
            weld_active=jnp.asarray(snap["weld_active"], bool),
            conn_connected=jnp.asarray(snap["conn_connected"], bool),
            num_connected=jnp.asarray(snap["num_connected"], jnp.int32),
        )

    def set_init_state_pool(self, pool) -> None:
        """Install an initial-state pool (see ``utils/init_pool``).
        Re-jit resets after calling."""
        from ..utils.init_pool import stack_pool

        self._init_pool = stack_pool(pool) if isinstance(pool, list) else pool

    def _apply_reset_variants(self, state, key):
        from .assembly import apply_reset_variants

        return apply_reset_variants(
            self.ops, self.config, self._init_pool, state, key
        )

    def reset(self, key) -> ArmState:
        state = self._reset_unsettled(key)

        # settle parts (env/furniture.py:1535-1540)
        from ..physics.engine import substeps as substeps_fn
        from .assembly import settle_parts

        parts = settle_parts(
            lambda s, g, gs: self.substep(s, g, gs),
            lambda fn, s, g, gs, n: substeps_fn(fn, s, g, gs, n),
            state.parts,
            state.group,
            self.config.sim,
        )
        return self._apply_reset_variants(state._replace(parts=parts), key)

    def observe(self, state: ArmState) -> dict:
        cfg = self.config
        r = self.robot
        obs = {}
        if cfg.object_ob:
            obs["object_ob"] = jnp.concatenate(
                [state.parts.pos, state.parts.quat], axis=-1
            ).reshape(-1)
        if cfg.robot_ob:
            fk_out = K.fk(r, state.qpos)
            feats = []
            if self.control_type in ("impedance", "torque") + NEW_CONTROLLERS:
                for arm in self.arms:
                    feats.append(state.qpos[r.arm_joints[arm]])
                    feats.append(state.qvel[r.arm_joints[arm]])
            for arm in self.arms:
                gj = r.gripper_joints[arm]
                site_pos, _ = K.site_world(r, fk_out, arm)
                _, hand_quat = K.eef_pose(r, fk_out, arm)
                body = r.eef_body[arm]
                Jsite = K.point_jacobian(r, fk_out, body, site_pos)
                vel6 = Jsite @ state.qvel
                feats.extend(
                    [
                        state.qpos[gj][:2],
                        site_pos,
                        T.convert_quat(hand_quat, to="xyzw"),
                        vel6[:3],
                        vel6[3:],
                    ]
                )
            obs["robot_ob"] = jnp.concatenate(feats)
        if cfg.subtask_ob:
            obs["subtask_ob"] = state.subtask + 1
        return obs

    def step_physics(self, state: ArmState, action) -> ArmState:
        """Control dispatch + physics + connect machinery + post-connect
        snap-back; no reward. Shared by the sparse (``step``) and dense
        (``envs/sawyer_dense.py``) reward layers."""
        if self.control_type in ("ik", "ik_quaternion"):
            state = self._ik_step(state, action)
        elif self.control_type in ("impedance", "torque"):
            state = self._direct_step(state, action[:-1])
        else:
            state = self._controller_step(state, action[:-1])
        return self._connect_phase(state, action[-1])

    def _connect_phase(self, state: ArmState, connect) -> ArmState:
        # connect attempt (env/furniture.py:1290-1330): first part touched by
        # both fingers of any arm
        both = jnp.any(state.touch_l & state.touch_r, axis=0)   # [P]
        any_touch = jnp.any(both)
        target_part = jnp.argmax(both)

        def do_connect(st: ArmState) -> ArmState:
            conn_group = st.group[jnp.asarray(self.model.conn_part)]
            g1 = st.group[target_part]
            in1 = conn_group == g1
            in2 = jnp.ones(self._C, bool)
            # arm agents snap+weld on a single aligned connect press:
            # ``_num_connect_steps = 0`` for every agent except Cursor
            # (env/furniture.py:157 vs furniture_cursor.py:32), and the
            # reference's interpolation runs INSIDE one env.step
            # (``_move_objects_target``, env/furniture.py:1007-1022)
            return self.ops.try_connect(st, in1, in2, num_connect_steps=0)

        state = jax.lax.cond(
            (connect > 0) & any_touch,
            do_connect,
            lambda s: s._replace(connect_step=jnp.array(0)),
            state,
        )

        # post-connect pose snap-back + one settle substep
        # (env/furniture.py:426-436)
        def snap_back(st: ArmState) -> ArmState:
            p1 = jnp.maximum(st.connected_body1, 0)
            cur = st.parts.pos[p1]
            move = st.connected_body1_pos - cur
            moved = self.ops.move_group(
                st.parts, st.group, p1, move, st.connected_body1_quat
            )
            moved = moved._replace(
                lin_vel=jnp.zeros_like(moved.lin_vel),
                ang_vel=jnp.zeros_like(moved.ang_vel),
            )
            return st._replace(parts=moved, connected_body1=jnp.array(-1))

        state = jax.lax.cond(
            state.connected_body1 >= 0, snap_back, lambda s: s, state
        )
        return state

    def _guard(self, state: ArmState):
        """Divergence containment (reference instability catch + penalty,
        ``env/furniture.py:2889-2897,463-467``): sanitize the lane and
        return the ``unstable`` flag for the reward/done plumbing."""
        from .assembly import instability_guard

        parts, unstable = instability_guard(state.parts)
        # NaN in qpos propagates through FK into every derived field
        # (ik_target_pos, hand quats, touch flags), so sweep the whole
        # state: any non-finite float leaf marks the lane unstable and is
        # replaced by its finite projection.
        rest = state._replace(parts=parts)
        leaves_bad = [
            ~jnp.all(jnp.isfinite(x))
            for x in jax.tree.leaves(rest)
            if jnp.issubdtype(x.dtype, jnp.floating)
        ]
        unstable = unstable | jnp.any(jnp.stack(leaves_bad))
        state = jax.tree.map(
            lambda x: (
                # bounded projection: ±inf must not become ±3.4e38 in the
                # terminal obs/reward (MPPI rollouts consume stepped values)
                jnp.where(unstable, jnp.nan_to_num(x, posinf=0.0, neginf=0.0), x)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x
            ),
            rest,
        )
        qvel = jnp.where(unstable, 0.0, state.qvel)
        return state._replace(qvel=qvel), unstable

    def step(self, state: ArmState, action):
        """One control step with the base sparse reward. Returns
        (state, obs, reward, done, info)."""
        prev_connected = state.num_connected
        state = self.step_physics(state, action)
        return self._finish_step(state, action, prev_connected)

    def _finish_step(self, state: ArmState, action, prev_connected):
        """Instability guard + sparse reward + done/obs/info assembly
        (shared by ``step`` and the batched ``step_batch``)."""
        cfg = self.config
        state, unstable = self._guard(state)

        # sparse reward (env/furniture.py:482-541)
        both = jnp.any(state.touch_l & state.touch_r, axis=0)   # [P]
        touching_floor = self._parts_on_floor(state.parts)
        newly_touched = both & ~state.touched
        touched = state.touched | both
        newly_picked = both & ~touching_floor & ~state.picked
        picked = state.picked | newly_picked
        state = state._replace(touched=touched, picked=picked, t=state.t + 1)

        newly = (state.num_connected - prev_connected).astype(jnp.float32)
        touch_reward = cfg.reward.touch_reward * jnp.sum(newly_touched)
        pick_reward = cfg.reward.pick_reward * jnp.sum(newly_picked)
        ctrl_penalty = -cfg.reward.ctrl_penalty_coef * jnp.sum(
            jnp.square(action[:-1])
        )
        success_reward = cfg.reward.success_reward * newly
        unstable_penalty = -cfg.reward.unstable_penalty_coef * unstable
        reward = (
            success_reward + touch_reward + pick_reward + ctrl_penalty
            + unstable_penalty
        )

        success = state.num_connected >= self.success_num_connects
        done = success | (state.t >= cfg.max_episode_steps) | unstable
        obs = self.observe(state)
        info = {
            "success": success,
            "num_connected": state.num_connected,
            "success_reward": success_reward,
            "touch_reward": touch_reward,
            "pick_reward": pick_reward,
            "ctrl_penalty": ctrl_penalty,
            "unstable": unstable,
        }
        return state, obs, reward, done, info

    def _parts_on_floor(self, parts: PartState):
        """Per-part floor contact (reference checks FLOOR geom contacts,
        ``env/furniture.py:509-513``): any geom corner within slop of z=0."""
        from ..physics.collide import floor_contacts

        fc = floor_contacts(
            self.tables, parts.pos, parts.quat, self.config.sim.contact_slop
        )
        return (
            jax.ops.segment_max(
                (fc.mask & (fc.depth > -0.002)).astype(jnp.int32),
                fc.part_a,
                num_segments=self._P,
            )
            > 0
        )

    # -- batched API (arm megakernel production path) -------------------------

    def reset_batch(self, keys) -> ArmState:
        """Batched reset: vmapped placement/robot init, then the settle
        rounds through the batched part-physics path (the cursor megakernel
        on TPU) — vmapping the XLA settle loops instead compiles for minutes
        on the tunneled backend."""
        states = jax.vmap(self._reset_unsettled)(keys)
        B = states.group.shape[0]
        parts, group = states.parts, states.group
        gscale = jnp.zeros((B, self._P))
        clip = self.config.sim.slow_clip

        def settle(i, p):
            p = p._replace(
                lin_vel=jnp.zeros_like(p.lin_vel),
                ang_vel=jnp.zeros_like(p.ang_vel),
            )
            p = self._batched_substeps(p, group, gscale, 10)
            return p._replace(
                lin_vel=jnp.clip(p.lin_vel, -clip, clip),
                ang_vel=jnp.clip(p.ang_vel, -clip, clip),
            )

        parts = jax.lax.fori_loop(0, 10, settle, parts)
        parts = parts._replace(
            lin_vel=jnp.zeros_like(parts.lin_vel),
            ang_vel=jnp.zeros_like(parts.ang_vel),
        )
        return jax.vmap(self._apply_reset_variants)(
            states._replace(parts=parts), keys
        )

    def _mega_substeps(self, states: ArmState, ctrl, tau_extra, n: int) -> ArmState:
        """One control step of ``n`` coupled substeps for the whole batch via
        the arm megakernel; per-control-step joint matrices from vmapped XLA."""
        cfg = self.config.sim
        B = ctrl.shape[0]
        G1, G2 = jax.vmap(
            lambda q: K.joint_dyn_matrices(self.robot, q, cfg.timestep)
        )(states.qpos)
        if tau_extra is None:
            tau_extra = jnp.zeros((B, self.robot.nj))
        gscale = jnp.ones((B, self._P))
        parts, qp, qv, touch = self._mega.control_step(
            states.parts,
            states.group,
            gscale,
            states.qpos,
            states.qvel,
            ctrl,
            tau_extra,
            G1,
            G2,
            n,
        )
        touch = touch.reshape(B, self.n_arms, 2, self._P)
        return states._replace(
            parts=parts,
            qpos=qp,
            qvel=qv,
            touch_l=touch[:, :, 0],
            touch_r=touch[:, :, 1],
        )

    def _step_physics_batch(self, states: ArmState, actions) -> ArmState:
        cfg = self.config
        if self.control_type in ("ik", "ik_quaternion"):
            states, q_cmd, grip = jax.vmap(self._ik_prepare)(states, actions)
            for _ in range(cfg.action_repeat):
                ctrl = jax.vmap(self._ik_ctrl)(states.qpos, q_cmd, grip)
                states = self._mega_substeps(states, ctrl, None, cfg.n_substeps)
        elif self.control_type in ("impedance", "torque"):
            ctrl = jax.vmap(self._direct_ctrl)(actions[:, :-1])
            states = self._mega_substeps(states, ctrl, None, cfg.n_substeps)
        else:
            ctrl, tau_extra = jax.vmap(self._controller_prepare)(
                states, actions[:, :-1]
            )
            states = self._mega_substeps(states, ctrl, tau_extra, cfg.n_substeps)
        return jax.vmap(self._connect_phase)(states, actions[:, -1])

    def step_batch(self, states: ArmState, actions):
        """Batched control step: same semantics as ``vmap(step)`` but with
        the whole substep loop on-chip in one Pallas program per block."""
        if self._mega is None:
            return jax.vmap(self.step)(states, actions)
        prev_connected = states.num_connected
        states = self._step_physics_batch(states, actions)
        return jax.vmap(self._finish_step)(states, actions, prev_connected)


# -- agent-specific conveniences ------------------------------------------------


def make_arm_env(agent_type: str):
    """Factory-of-factories used by the registry in ``furniture_tpu.api``."""

    def factory(config: EnvConfig) -> ArmEnv:
        return ArmEnv(config.replace(agent_type=agent_type))

    return factory


SawyerEnv = make_arm_env("Sawyer")
PandaEnv = make_arm_env("Panda")
JacoEnv = make_arm_env("Jaco")
FetchEnv = make_arm_env("Fetch")
BaxterEnv = make_arm_env("Baxter")
