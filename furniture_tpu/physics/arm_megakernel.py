"""Whole-control-step Pallas TPU megakernel for articulated-arm agents.

Extends the free-part megakernel (``physics/megakernel.py``) with the robot:
the entire arm control step — forward kinematics of the joint chain, robot
gripper↔part contact narrow phase, the contact-aware gripper servo, joint
dynamics with precomputed implicit-integration matrices, the all-lane Jacobi
contact solve, two-way JᵀF contact coupling back onto the joints, and part
integration — runs as ONE Pallas program per batch block with all state
resident in VMEM for all ``n`` substeps.

Why: one arm substep is tiny (NJ≈9-19 joints, K≈1-2k contact lanes) but the
control step is 50 substeps deep (×3 action repeat for IK). Lowered through
XLA as ``lax.scan`` of micro-kernels this is launch/HBM-bound — the exact
pathology the cursor megakernel fixed (round-2: 4.6k→39k steps/s). Round-2
measured the arm XLA path at ~742 steps/s/chip; this kernel is the batched
TPU production path behind ``ArmEnv.step_batch``.

Layout: batch-last, component-major, like ``MegaPhysics``. Per-part state is
``[P, Bb]``; per-joint state is ``[NJ, Bb]``; contact lanes are ``[K, Bb]``
with K = floor lanes + part-pair lanes + robot lanes. Static lane→part /
lane→robot-geom maps are constant one-hot matmuls (MXU); the robot chain is
unrolled at trace time (NB≤37 bodies) into straight-line quaternion math on
the VPU.

Joint dynamics: the joint-space inertia is frozen per control step (the arm
moves ≤ a few degrees per 0.1 s under bias-compensated dynamics — same
approximation as the XLA path, ``envs/arm.py:_sim_substeps``), so the
semi-implicit update ``(M + dt·D) q̇' = M q̇ + dt·τ + p_contact`` becomes two
precomputed per-env matrices G1 = (M+dtD)⁻¹M and G2 = dt·(M+dtD)⁻¹ applied
per substep as tiled elementwise-mul + constant-matmul reductions.

Two-way coupling (MuJoCo native behavior, reference ``env/furniture.py:
2877-2879`` stepping contacts between gripper and part geoms): the part
solver treats robot geoms as kinematic colliders with prescribed surface
velocities (exact per-substep joint-sum velocities), and the accumulated
contact impulses are fed back as joint-space impulses Jᵀ(−λ) so grasped
part weight loads the arm.

Parity vs the XLA path is asserted in ``tests/test_arm_megakernel.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import (
    _CORNER_SIGNS,
    _cross,
    _dot3,
    _edge_sat,
    _inv3_rows,
    _matcat,
    _qconj,
    _qmul,
    _qrot,
)

_HINGE = 0  # chain.HINGE
_SLIDE = 1  # chain.SLIDE
_MOTOR = 0  # chain.MOTOR
_VELOCITY = 1  # chain.VELOCITY
_POSITION = 2  # chain.POSITION


def _qrot_const(q, v):
    """Rotate a STATIC 3-vector (python floats) by a traced quaternion."""
    w, x, y, z = q
    vx, vy, vz = float(v[0]), float(v[1]), float(v[2])
    ux = y * vz - z * vy
    uy = z * vx - x * vz
    uz = x * vy - y * vx
    return (
        vx + 2.0 * (w * ux + (y * uz - z * uy)),
        vy + 2.0 * (w * uy + (z * ux - x * uz)),
        vz + 2.0 * (w * uz + (x * uy - y * ux)),
    )


def _qmul_const_r(a, b):
    """Quaternion product a ⊗ b with STATIC right factor b (python floats)."""
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = (float(c) for c in b)
    return (
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    )


def _part_frame_points(signs, sizes, gpos, gquat, geoms):
    """Sample points of each geom expressed in its PART frame (static)."""
    S = len(signs)
    out = np.zeros((len(geoms) * S, 3), np.float32)
    for i, g in enumerate(geoms):
        c = signs * sizes[g]
        w, x, y, z = gquat[g]
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ],
            np.float32,
        )
        out[i * S : (i + 1) * S] = gpos[g] + c @ R.T
    return out


def _onehot(idx, n):
    m = np.zeros((len(idx), n), np.float32)
    if len(idx):
        m[np.arange(len(idx)), idx] = 1.0
    return m


class ArmMegaPhysics:
    """Batched whole-control-step kernel for one (robot, furniture) combo.

    ``control_step(parts, group, gscale, qpos, qvel, ctrl, tau_extra, G1,
    G2, n)`` takes batch-leading pytrees and runs ``n`` coupled substeps
    on-chip, returning ``(parts', qpos', qvel', touch [B, 2*n_arms*P])``.
    """

    def __init__(self, tables, robot, cfg_sim, block: int = 128, interpret: bool = False):
        self.cfg = cfg_sim
        self.block = block
        self.interpret = interpret
        self.robot = robot

        gp = np.asarray(tables["geom_part"])
        G = len(gp)
        P = len(tables["part_mass"])  # n_parts (a part may carry no geoms)
        self.P = P
        self.NJ = robot.nj
        self.NA = robot.na
        sizes = np.asarray(tables["_box_sizes"], np.float32)
        gpos = np.asarray(tables["geom_pos"], np.float32)
        gquat = np.asarray(tables["geom_quat"], np.float32)
        fric = np.asarray(tables["geom_friction"], np.float32)

        # ---- floor lanes (identical to MegaPhysics) ----
        lf_geom = np.repeat(np.arange(G), 8)
        self.Kf = G * 8
        self.lf_corner = _part_frame_points(
            _CORNER_SIGNS, sizes, gpos, gquat, np.arange(G)
        )
        lf_part = gp[lf_geom]
        lf_fric = np.asarray(tables["_floor_friction"], np.float32)[lf_geom]

        # ---- part-pair lanes (identical to MegaPhysics) ----
        pairs = np.asarray(tables["_pairs"]).reshape(-1, 2)
        NP_ = len(pairs)
        src = np.concatenate([pairs[:, 0], pairs[:, 1]]) if NP_ else np.zeros(0, int)
        dst = np.concatenate([pairs[:, 1], pairs[:, 0]]) if NP_ else np.zeros(0, int)
        lp_src = np.repeat(src, 8)
        lp_dst = np.repeat(dst, 8)
        self.Kp = len(lp_src)
        self.lp_corner = (
            _part_frame_points(_CORNER_SIGNS, sizes, gpos, gquat, src)
            if NP_
            else np.zeros((0, 3), np.float32)
        )
        lp_part_a = gp[lp_src] if NP_ else np.zeros(0, int)
        lp_part_b = gp[lp_dst] if NP_ else np.zeros(0, int)
        pair_fric = np.maximum(fric[src], fric[dst]) if NP_ else np.zeros(0, np.float32)
        lp_fric = np.repeat(pair_fric, 8)
        self.lp_dst_pos = gpos[lp_dst] if NP_ else np.zeros((0, 3), np.float32)
        self.lp_dst_quat = gquat[lp_dst] if NP_ else np.zeros((0, 4), np.float32)
        self.lp_dst_size = sizes[lp_dst] if NP_ else np.zeros((0, 3), np.float32)

        # ---- SAT edge/face lanes (one per pair; collide.edge_contacts) ----
        self.Ke = NP_
        e_ga = pairs[:, 0] if NP_ else np.zeros(0, int)
        e_gb = pairs[:, 1] if NP_ else np.zeros(0, int)
        self.ep_a = np.concatenate(
            [gpos[e_ga], gquat[e_ga], sizes[e_ga]], axis=1
        ).astype(np.float32) if NP_ else np.zeros((0, 10), np.float32)
        self.ep_b = np.concatenate(
            [gpos[e_gb], gquat[e_gb], sizes[e_gb]], axis=1
        ).astype(np.float32) if NP_ else np.zeros((0, 10), np.float32)
        psum = np.zeros((NP_, self.Kp), np.float32)
        for p_i in range(NP_):
            psum[p_i, p_i * 8 : (p_i + 1) * 8] = 1.0
            psum[p_i, (NP_ + p_i) * 8 : (NP_ + p_i + 1) * 8] = 1.0
        self.PAIRSUM = psum
        edge_fric = (
            np.maximum(fric[e_ga], fric[e_gb])
            if NP_
            else np.zeros(0, np.float32)
        )

        # ---- robot lanes (flat per-lane tables; mirror
        # collide.robot_contacts lane order: side 1 then side 2) ----
        rpairs = np.asarray(tables["_robot_pairs"]).reshape(-1, 2)
        assert len(rpairs) > 0, "arm megakernel needs robot contact pairs"
        lane_rg1 = np.asarray(tables["_rl_rgeom"])   # [L] robot geom per lane
        lane_pg1 = np.asarray(tables["_rl_pgeom"])   # [L] part geom per lane
        rl_sign = np.asarray(tables["_rl_sign"], np.float32)  # [L,3]
        rl_pair = np.asarray(tables["_rl_pair"])
        L = len(lane_rg1)
        r_sizes = np.asarray(tables["robot_np"]["_box_sizes"], np.float32)
        r_fric = np.asarray(tables["robot_np"]["geom_friction"], np.float32)
        self.Kr1 = L                            # part samples in robot box
        self.Kr2 = L                            # robot samples in part box
        self.Kr = self.Kr1 + self.Kr2

        # unique robot geoms, in hand order (rpairs is robot-geom-major)
        hand_list = list(dict.fromkeys(rpairs[:, 0].tolist()))
        self.hand_list = hand_list
        NRG = len(hand_list)
        self.NRG = NRG
        hand_slot = {g: i for i, g in enumerate(hand_list)}
        slot1 = np.array([hand_slot[g] for g in lane_rg1])

        # side 1: part-geom sample points (part frame, static, per lane)
        r1c = np.zeros((L, 3), np.float32)
        for i in range(L):
            g = lane_pg1[i]
            c = rl_sign[i] * sizes[g]
            w, x, y, z_ = gquat[g]
            R = np.array(
                [
                    [1 - 2 * (y * y + z_ * z_), 2 * (x * y - w * z_), 2 * (x * z_ + w * y)],
                    [2 * (x * y + w * z_), 1 - 2 * (x * x + z_ * z_), 2 * (y * z_ - w * x)],
                    [2 * (x * z_ - w * y), 2 * (y * z_ + w * x), 1 - 2 * (x * x + y * y)],
                ],
                np.float32,
            )
            r1c[i] = gpos[g] + R @ c
        self.r1_corner = r1c
        self.r1_rsize = r_sizes[lane_rg1]                        # [Kr1,3]
        self.OHR1 = _onehot(slot1, NRG)                          # [Kr1,NRG]
        self.OAr1 = _onehot(gp[lane_pg1], P)                     # [Kr1,P]

        # side 2: robot-geom sample points (robot-geom frame, static)
        self.r2_off = r_sizes[lane_rg1] * rl_sign                # [Kr2,3]
        lane_rg2 = lane_rg1
        lane_pg2 = lane_pg1
        self.OHR2 = self.OHR1
        self.OAr2 = self.OAr1
        self.r2_dst_pos = gpos[lane_pg2]
        self.r2_dst_quat = gquat[lane_pg2]
        self.r2_dst_size = sizes[lane_pg2]

        rfr = np.maximum(fric[lane_pg1], r_fric[lane_rg1])
        lane_rfric = np.concatenate([rfr] * 2)

        # per-robot-lane geom slot / body / joint-ancestry (both sides)
        lane_rg = np.concatenate([lane_rg1, lane_rg2])
        self.lane_slot = np.concatenate([slot1, slot1])
        lane_body = robot.geom_body[lane_rg]
        self.ANC = robot.ancestor[lane_body].astype(np.float32)  # [Kr,NJ]
        self.OHR = _onehot(self.lane_slot, NRG)                  # [Kr,NRG]

        # gripper squeeze masks: per arm, lanes on either finger
        self.arms = robot.arms
        self.n_arms = len(robot.arms)
        self.SQZ = np.stack(
            [
                np.isin(
                    lane_rg,
                    np.concatenate(
                        [robot.finger_geoms_l[a], robot.finger_geoms_r[a]]
                    ),
                ).astype(np.float32)
                for a in robot.arms
            ]
        )  # [n_arms, Kr]

        # touch aggregation: row ((arm*2+side)*P + p) = 1 on lanes of that
        # finger side whose part geom belongs to part p
        lane_part_r = gp[np.concatenate([lane_pg1, lane_pg2])]
        tm = np.zeros((self.n_arms * 2 * P, self.Kr), np.float32)
        for a, arm in enumerate(robot.arms):
            for s, fg in enumerate(
                (robot.finger_geoms_l[arm], robot.finger_geoms_r[arm])
            ):
                side = np.isin(lane_rg, fg)
                for p in range(P):
                    tm[(a * 2 + s) * P + p] = (side & (lane_part_r == p)).astype(
                        np.float32
                    )
        self.TOUCHMAP = tm
        self.NT = tm.shape[0]

        # eef body index per arm (finger-separation axis for the
        # bounded-force squeeze floor; see envs/arm._sim_substeps)
        self._eef_body = [int(robot.eef_body[arm]) for arm in robot.arms]

        # ---- combined lane tables for the solver ----
        self.K = self.Kf + self.Kp + self.Ke + self.Kr
        part_a = np.concatenate(
            [lf_part, lp_part_a, gp[e_ga], lane_part_r]
        ).astype(int)
        part_b = np.concatenate(
            [np.full(self.Kf, -1), lp_part_b, gp[e_gb], np.full(self.Kr, -1)]
        ).astype(int)
        has_b = part_b >= 0
        pb_safe = np.where(has_b, part_b, 0)
        self.OA = _onehot(part_a, P)
        self.OBS = _onehot(pb_safe, P)
        self.OB = self.OBS * has_b[:, None]
        self.OAp = _onehot(lp_part_a, P) if self.Kp else np.zeros((0, P), np.float32)
        self.OBp = _onehot(lp_part_b, P) if self.Kp else np.zeros((0, P), np.float32)
        self.OAe = _onehot(gp[e_ga], P) if NP_ else np.zeros((0, P), np.float32)
        self.OBe = _onehot(gp[e_gb], P) if NP_ else np.zeros((0, P), np.float32)
        self.OAf = _onehot(lf_part, P)
        self.lane_fric = np.concatenate(
            [lf_fric, lp_fric, edge_fric, lane_rfric]
        ).astype(np.float32)
        # per-lane solref-derived Baumgarte fractions (collide.attach_betas)
        from .collide import attach_betas

        attach_betas(tables, cfg_sim)
        lp_beta = (
            np.repeat(np.concatenate([tables["_pair_beta"]] * 2), 8)
            if NP_
            else np.zeros(0, np.float32)
        )
        r_beta = np.concatenate([tables["_robot_beta"][rl_pair]] * 2)
        self.lane_beta = np.concatenate(
            [
                np.repeat(tables["_floor_beta"], 8),
                lp_beta,
                np.asarray(tables["_pair_beta"], np.float32),
                r_beta,
            ]
        ).astype(np.float32)
        self.floor_mask_p = np.stack(
            [lf_part == p for p in range(P)]
        ).astype(np.float32)

        self.mass = np.asarray(tables["part_mass"], np.float32)
        self.com_l = np.asarray(tables["part_com"], np.float32)
        self.inertia_l = np.asarray(tables["part_inertia"], np.float32)

        # ---- static robot-chain constants (baked into the trace) ----
        self.NB = robot.nb
        self._fk_meta = []
        for b in range(robot.nb):
            j = int(robot.body_joint[b])
            self._fk_meta.append(
                dict(
                    parent=int(robot.parent[b]),
                    lpos=np.asarray(robot.body_pos[b], np.float64),
                    lquat=np.asarray(robot.body_quat[b], np.float64),
                    joint=j,
                    jtype=int(robot.jnt_type[j]) if j >= 0 else -1,
                    jaxis=np.asarray(robot.jnt_axis[j], np.float64)
                    if j >= 0
                    else None,
                    jpos=np.asarray(robot.jnt_pos[j], np.float64)
                    if j >= 0
                    else None,
                )
            )
        self._hand_meta = [
            dict(
                body=int(robot.geom_body[g]),
                lpos=np.asarray(robot.geom_pos[g], np.float64),
                lquat=np.asarray(robot.geom_quat[g], np.float64),
            )
            for g in hand_list
        ]
        self._jnt_meta = [
            dict(
                body=int(robot.jnt_body[j]),
                jtype=int(robot.jnt_type[j]),
                axis=np.asarray(robot.jnt_axis[j], np.float64),
                pos=np.asarray(robot.jnt_pos[j], np.float64),
            )
            for j in range(robot.nj)
        ]
        self._act_meta = [
            dict(
                joint=int(robot.act_joint[i]),
                kind=int(robot.act_kind[i]),
                gain=float(robot.act_gain[i]),
                clo=float(robot.act_ctrlrange[i, 0]),
                chi=float(robot.act_ctrlrange[i, 1]),
                flo=float(robot.act_forcerange[i, 0]),
                fhi=float(robot.act_forcerange[i, 1]),
            )
            for i in range(robot.na)
        ]
        # gripper actuators per arm (for the contact-aware squeeze servo)
        self._grip_meta = [
            dict(
                arm_idx=a,
                rows=[int(r) for r in robot.gripper_actuators[arm]],
                joints=[int(robot.act_joint[r]) for r in robot.gripper_actuators[arm]],
                signs=[float(robot.act_close_sign[r]) for r in robot.gripper_actuators[arm]],
            )
            for a, arm in enumerate(robot.arms)
        ]
        self.A2J = _onehot(robot.act_joint, robot.nj).T.copy()   # [NJ,NA]
        self.SUMJ = np.kron(np.eye(robot.nj, dtype=np.float32), np.ones((1, robot.nj), np.float32))  # [NJ,NJ²]
        self._jfric = np.asarray(robot.jnt_frictionloss, np.float64)
        self._jmaxvel = np.asarray(robot.jnt_maxvel, np.float64)
        self._jlo = np.asarray(robot.jnt_range[:, 0], np.float64)
        self._jhi = np.asarray(robot.jnt_range[:, 1], np.float64)

        self._compiled = {}

    # -- kernel body -----------------------------------------------------------

    def _fk(self, qp):
        """Unrolled chain FK: qp [NJ,Bb] → per-body pose tuples of [1,Bb]."""
        bpos, bquat = [], []
        for b in range(self.NB):
            m = self._fk_meta[b]
            par = m["parent"]
            if par < 0:
                shape = qp[0:1].shape
                ppos = tuple(jnp.zeros(shape) for _ in range(3))
                pquat = (jnp.ones(shape), jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape))
            else:
                ppos, pquat = bpos[par], bquat[par]
            pre_pos = tuple(
                p + r for p, r in zip(ppos, _qrot_const(pquat, m["lpos"]))
            )
            pre_quat = _qmul_const_r(pquat, m["lquat"])
            j = m["joint"]
            if j < 0:
                bpos.append(pre_pos)
                bquat.append(pre_quat)
                continue
            qj = qp[j : j + 1]
            ax = m["jaxis"]
            if m["jtype"] == _HINGE:
                half = 0.5 * qj
                s, c = jnp.sin(half), jnp.cos(half)
                qrot = (c, s * float(ax[0]), s * float(ax[1]), s * float(ax[2]))
                w_quat = _qmul(pre_quat, qrot)
                jp = m["jpos"]
                w_pos = tuple(
                    pp + a - b_
                    for pp, a, b_ in zip(
                        pre_pos,
                        _qrot_const(pre_quat, jp),
                        _qrot_const(w_quat, jp),
                    )
                )
            else:  # SLIDE
                d = _qrot_const(pre_quat, ax)
                w_pos = tuple(pp + dc * qj for pp, dc in zip(pre_pos, d))
                w_quat = pre_quat
            bpos.append(w_pos)
            bquat.append(w_quat)
        return bpos, bquat

    def _kernel_body(
        self,
        xs_ref,
        xc_ref,
        pc_ref,
        oa_ref,
        obs_ref,
        ob_ref,
        oat_ref,
        obt_ref,
        fric_ref,
        lfc_ref,
        oaf_ref,
        fmpt_ref,
        lpc_ref,
        oap_ref,
        obp_ref,
        r1c_ref,
        r1sz_ref,
        ohr1_ref,
        r2c_ref,
        ohr2_ref,
        anc_ref,
        sqz_ref,
        tmap_ref,
        jc_ref,
        a2j_ref,
        sumj_ref,
        beta_ref,
        epa_ref,
        epb_ref,
        oae_ref,
        obe_ref,
        psum_ref,
        ys_ref,
        yt_ref,
        *,
        n: int,
    ):
        P, Kf, Kp, Ke, Kr1, Kr2, Kr, K = (
            self.P,
            self.Kf,
            self.Kp,
            self.Ke,
            self.Kr1,
            self.Kr2,
            self.Kr,
            self.K,
        )
        NJ, NA, NRG, NT = self.NJ, self.NA, self.NRG, self.NT
        cfg = self.cfg
        dt = cfg.timestep
        slop = cfg.contact_slop
        iters = cfg.solver_iters
        relax = cfg.relaxation
        baum = cfg.baumgarte
        maxv = cfg.max_velocity
        gz = cfg.gravity
        squeeze = cfg.gripper_squeeze
        couple = getattr(cfg, "robot_coupling", True)

        s = xs_ref[:]
        xc = xc_ref[:]
        Bb = s.shape[-1]

        def grab(o, c):
            return tuple(s[(o + i) * P : (o + i + 1) * P] for i in range(c))

        pos0 = grab(0, 3)
        quat0 = grab(3, 4)
        lin0 = grab(7, 3)
        ang0 = grab(10, 3)
        group = s[13 * P : 14 * P]
        gscale = s[14 * P : 15 * P]
        qp0 = s[15 * P : 15 * P + NJ]
        qv0 = s[15 * P + NJ : 15 * P + 2 * NJ]

        ctrl = xc[0:NA]
        tau_extra = xc[NA : NA + NJ]
        G1 = xc[NA + NJ : NA + NJ + NJ * NJ]
        G2 = xc[NA + NJ + NJ * NJ : NA + NJ + 2 * NJ * NJ]

        pc = pc_ref[:]
        col = lambda a, i: a[:, i : i + 1]
        MASS = col(pc, 0)
        COM_L = tuple(col(pc, 1 + c) for c in range(3))
        IL = [[col(pc, 4 + 3 * i + j) for j in range(3)] for i in range(3)]
        OA = oa_ref[:]
        OBS = obs_ref[:]
        OB = ob_ref[:]
        OAT = oat_ref[:]
        OBT = obt_ref[:]
        FRIC = fric_ref[:]
        lfc = lfc_ref[:]
        LF_C = tuple(col(lfc, c) for c in range(3))
        OAf = oaf_ref[:]
        fmpt = fmpt_ref[:]
        FMP = [col(fmpt, p) for p in range(P)]
        lpc = lpc_ref[:]
        LP_C = tuple(col(lpc, c) for c in range(3))
        LP_DP = tuple(col(lpc, 3 + c) for c in range(3))
        LP_DQ = tuple(col(lpc, 6 + c) for c in range(4))
        LP_SZ = tuple(col(lpc, 10 + c) for c in range(3))
        OAp = oap_ref[:]
        OBp = obp_ref[:]
        r1c = r1c_ref[:]
        R1_C = tuple(col(r1c, c) for c in range(3))
        r1sz = r1sz_ref[:]
        R1_SZ = tuple(col(r1sz, c) for c in range(3))
        OHR1 = ohr1_ref[:]
        r2c = r2c_ref[:]
        R2_OFF = tuple(col(r2c, c) for c in range(3))
        R2_DP = tuple(col(r2c, 3 + c) for c in range(3))
        R2_DQ = tuple(col(r2c, 6 + c) for c in range(4))
        R2_SZ = tuple(col(r2c, 10 + c) for c in range(3))
        OHR2 = ohr2_ref[:]
        ANC = anc_ref[:]                       # [Kr,NJ]
        SQZ = sqz_ref[:]                       # [n_arms,Kr] -> cols
        TMAP = tmap_ref[:]                     # [NT,Kr]
        jc = jc_ref[:]                         # [NJ,4] fric/maxvel/lo/hi
        JFRIC = col(jc, 0)
        JMAXV = col(jc, 1)
        JLO = col(jc, 2)
        JHI = col(jc, 3)
        A2J = a2j_ref[:]                       # [NJ,NA]
        SUMJ = sumj_ref[:]                     # [NJ,NJ²]
        BETA = beta_ref[:]                     # [K,1]
        epa = epa_ref[:]                       # [Ke,10]
        EA_P = tuple(col(epa, c) for c in range(3))
        EA_Q = tuple(col(epa, 3 + c) for c in range(4))
        EA_S = tuple(col(epa, 7 + c) for c in range(3))
        epb = epb_ref[:]
        EB_P = tuple(col(epb, c) for c in range(3))
        EB_Q = tuple(col(epb, 3 + c) for c in range(4))
        EB_S = tuple(col(epb, 7 + c) for c in range(3))
        OAe = oae_ref[:]
        OBe = obe_ref[:]
        PSUM = psum_ref[:]                     # [Ke,Kp]

        # robot-lane part one-hots are rows [Kf+Kp+Ke:] of OA; slice views
        OA_r = OA[Kf + Kp + Ke :]
        member = (group[:, None, :] == group[None, :, :]).astype(jnp.float32)
        gl_a = _matcat(OAp, (group,))[0]
        gl_b = _matcat(OBp, (group,))[0]
        diff_group = (gl_a != gl_b).astype(jnp.float32)

        def spread_sum(vals):
            return tuple(jnp.sum(member * v[None, :, :], axis=1) for v in vals)

        def substep(_, st):
            # lam carried across substeps (warm start; see engine.substeps
            # and the cursor megakernel — keeps solver_iters at 12)
            pos, quat, lin, ang, qp, qv, touch, lam_ws = st

            # ================= robot kinematics =================
            bpos, bquat = self._fk(qp)
            # joint world frames
            axis_w, anchor_w = [], []
            for jm in self._jnt_meta:
                bq = bquat[jm["body"]]
                bp = bpos[jm["body"]]
                axis_w.append(_qrot_const(bq, jm["axis"]))
                anchor_w.append(
                    tuple(p + r for p, r in zip(bp, _qrot_const(bq, jm["pos"])))
                )
            # hand geom world poses, stacked [NRG,Bb]
            rg_pos_l, rg_quat_l = [], []
            for hm in self._hand_meta:
                bq = bquat[hm["body"]]
                bp = bpos[hm["body"]]
                rg_pos_l.append(
                    tuple(p + r for p, r in zip(bp, _qrot_const(bq, hm["lpos"])))
                )
                rg_quat_l.append(_qmul_const_r(bq, hm["lquat"]))
            RGP = tuple(
                jnp.concatenate([rg_pos_l[g][c] for g in range(NRG)], axis=0)
                for c in range(3)
            )
            RGQ = tuple(
                jnp.concatenate([rg_quat_l[g][c] for g in range(NRG)], axis=0)
                for c in range(4)
            )

            # ================= part group aggregates =================
            com_w = tuple(p + c for p, c in zip(pos, _qrot(quat, COM_L)))
            w, x, y, z = quat
            R = [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
            Iw = [[None] * 3 for _ in range(3)]
            for i in range(3):
                for j in range(3):
                    acc = 0.0
                    for a in range(3):
                        for b in range(3):
                            acc = acc + R[i][a] * IL[a][b] * R[j][b]
                    Iw[i][j] = acc
            g_mass = jnp.sum(member * MASS[None, :, :], axis=1)
            inv_gm = 1.0 / g_mass
            g_com = tuple(
                jnp.sum(member * (MASS * c)[None, :, :], axis=1) * inv_gm
                for c in com_w
            )
            d = tuple(c[None, :, :] - gc[:, None, :] for c, gc in zip(com_w, g_com))
            d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            gI = [[None] * 3 for _ in range(3)]
            for i in range(3):
                for j in range(3):
                    pa = MASS[None, :, :] * ((d2 if i == j else 0.0) - d[i] * d[j])
                    gI[i][j] = jnp.sum(member * (Iw[i][j][None, :, :] + pa), axis=1)
            invI = _inv3_rows(gI, 1e-8)
            # (gravity applied after the robot narrow phase, alongside the
            # bounded-force squeeze floor computation)

            # ================= narrow phase =================
            # floor lanes
            pq_f = _matcat(OAf, quat)
            pp_f = _matcat(OAf, pos)
            cw_f = tuple(p + c for p, c in zip(pp_f, _qrot(pq_f, LF_C)))
            depth_f = -cw_f[2]
            fmask_f = (depth_f > -slop).astype(jnp.float32)
            n_f = (
                jnp.zeros_like(depth_f),
                jnp.zeros_like(depth_f),
                jnp.ones_like(depth_f),
            )

            # part-pair lanes
            pq_a = _matcat(OAp, quat)
            pp_a = _matcat(OAp, pos)
            pq_b = _matcat(OBp, quat)
            pp_b = _matcat(OBp, pos)
            cw_p = tuple(p + c for p, c in zip(pp_a, _qrot(pq_a, LP_C)))
            wq_d = _qmul(pq_b, LP_DQ)
            wp_d = tuple(p + c for p, c in zip(pp_b, _qrot(pq_b, LP_DP)))
            rel = tuple(c - wp for c, wp in zip(cw_p, wp_d))
            loc = _qrot(_qconj(wq_d), rel)
            pen = tuple(sz - jnp.abs(l) for sz, l in zip(LP_SZ, loc))
            inside = (
                (pen[0] > -slop) & (pen[1] > -slop) & (pen[2] > -slop)
            ).astype(jnp.float32)
            depth_p = jnp.minimum(jnp.minimum(pen[0], pen[1]), pen[2])
            is_x = (pen[0] <= pen[1]) & (pen[0] <= pen[2])
            is_y = (~is_x) & (pen[1] <= pen[2])
            is_z = (~is_x) & (~is_y)
            n_loc = (
                jnp.where(is_x, jnp.sign(loc[0]), 0.0),
                jnp.where(is_y, jnp.sign(loc[1]), 0.0),
                jnp.where(is_z, jnp.sign(loc[2]), 0.0),
            )
            n_p = _qrot(wq_d, n_loc)
            fmask_p = inside * diff_group * (depth_p > -slop).astype(jnp.float32)

            # SAT edge/face lane per pair where the corner manifold is
            # empty (collide.edge_contacts; one lane per pair)
            q_pae = _matcat(OAe, quat)
            p_pae = _matcat(OAe, pos)
            q_ea = _qmul(q_pae, EA_Q)
            p_ea = tuple(p + c for p, c in zip(p_pae, _qrot(q_pae, EA_P)))
            q_pbe = _matcat(OBe, quat)
            p_pbe = _matcat(OBe, pos)
            q_eb = _qmul(q_pbe, EB_Q)
            p_eb = tuple(p + c for p, c in zip(p_pbe, _qrot(q_pbe, EB_P)))
            pt_e, n_e, depth_e, inter_e = _edge_sat(
                q_ea, p_ea, q_eb, p_eb, EA_S, EB_S, slop
            )
            corner_cnt = jnp.dot(
                PSUM, fmask_p, preferred_element_type=jnp.float32
            )
            gl_ae = _matcat(OAe, (group,))[0]
            gl_be = _matcat(OBe, (group,))[0]
            fmask_e = (
                inter_e & (corner_cnt <= 0.0) & (gl_ae != gl_be)
            ).astype(jnp.float32)

            # robot side 1: part samples in robot box
            OAr = OA_r[:Kr1]
            pq_1 = _matcat(OAr, quat)
            pp_1 = _matcat(OAr, pos)
            cw_1 = tuple(p + c for p, c in zip(pp_1, _qrot(pq_1, R1_C)))
            rq_1 = _matcat(OHR1, RGQ)
            rp_1 = _matcat(OHR1, RGP)
            rel1 = tuple(c - rp for c, rp in zip(cw_1, rp_1))
            loc1 = _qrot(_qconj(rq_1), rel1)
            pen1 = tuple(sz - jnp.abs(l) for sz, l in zip(R1_SZ, loc1))
            in1 = (
                (pen1[0] > -slop) & (pen1[1] > -slop) & (pen1[2] > -slop)
            ).astype(jnp.float32)
            depth1 = jnp.minimum(jnp.minimum(pen1[0], pen1[1]), pen1[2])
            i1x = (pen1[0] <= pen1[1]) & (pen1[0] <= pen1[2])
            i1y = (~i1x) & (pen1[1] <= pen1[2])
            i1z = (~i1x) & (~i1y)
            nl1 = (
                jnp.where(i1x, jnp.sign(loc1[0]), 0.0),
                jnp.where(i1y, jnp.sign(loc1[1]), 0.0),
                jnp.where(i1z, jnp.sign(loc1[2]), 0.0),
            )
            n_1 = _qrot(rq_1, nl1)

            # robot side 2: robot samples in part box
            rq_2 = _matcat(OHR2, RGQ)
            rp_2 = _matcat(OHR2, RGP)
            cw_2 = tuple(p + c for p, c in zip(rp_2, _qrot(rq_2, R2_OFF)))
            OAr2 = OA_r[Kr1:]
            pq_2 = _matcat(OAr2, quat)
            pp_2 = _matcat(OAr2, pos)
            wq_2 = _qmul(pq_2, R2_DQ)
            wp_2 = tuple(p + c for p, c in zip(pp_2, _qrot(pq_2, R2_DP)))
            rel2 = tuple(c - wp for c, wp in zip(cw_2, wp_2))
            loc2 = _qrot(_qconj(wq_2), rel2)
            pen2 = tuple(sz - jnp.abs(l) for sz, l in zip(R2_SZ, loc2))
            in2 = (
                (pen2[0] > -slop) & (pen2[1] > -slop) & (pen2[2] > -slop)
            ).astype(jnp.float32)
            depth2 = jnp.minimum(jnp.minimum(pen2[0], pen2[1]), pen2[2])
            i2x = (pen2[0] <= pen2[1]) & (pen2[0] <= pen2[2])
            i2y = (~i2x) & (pen2[1] <= pen2[2])
            i2z = (~i2x) & (~i2y)
            nl2 = (
                jnp.where(i2x, jnp.sign(loc2[0]), 0.0),
                jnp.where(i2y, jnp.sign(loc2[1]), 0.0),
                jnp.where(i2z, jnp.sign(loc2[2]), 0.0),
            )
            # part-face normal pushes the robot corner out; flip to act on part
            n_2 = tuple(-c for c in _qrot(wq_2, nl2))

            point_r = tuple(
                jnp.concatenate([a, b], axis=0) for a, b in zip(cw_1, cw_2)
            )
            normal_r = tuple(
                jnp.concatenate([a, b], axis=0) for a, b in zip(n_1, n_2)
            )
            depth_r = jnp.concatenate([depth1, depth2], axis=0)
            rmask = jnp.concatenate([in1, in2], axis=0)          # [Kr,Bb]

            # prescribed robot surface velocity at each robot-lane point:
            # v(p) = Σ_j q̇_j φ_j(p),  φ_j = anc·(hinge: a_j×(p−o_j); slide: a_j)
            vbx = jnp.zeros_like(depth_r)
            vby = jnp.zeros_like(depth_r)
            vbz = jnp.zeros_like(depth_r)
            for j in range(NJ):
                anc_j = ANC[:, j : j + 1]
                qvj = qv[j : j + 1]
                if self._jnt_meta[j]["jtype"] == _HINGE:
                    dvec = tuple(p - o for p, o in zip(point_r, anchor_w[j]))
                    phi = _cross(axis_w[j], dvec)
                else:
                    phi = tuple(
                        jnp.broadcast_to(c, depth_r.shape) for c in axis_w[j]
                    )
                vbx = vbx + anc_j * qvj * phi[0]
                vby = vby + anc_j * qvj * phi[1]
                vbz = vbz + anc_j * qvj * phi[2]
            velb_r = (vbx, vby, vbz)

            # touch flags from this substep's raw contact configuration
            # (carried → final value = last substep, matching
            # envs/arm._update_touches on masks[-1])
            touch_new = (
                jnp.dot(TMAP, rmask, preferred_element_type=jnp.float32) > 0
            ).astype(jnp.float32)

            # ================= gripper squeeze servo =================
            ctrl_eff = ctrl
            deeps = []        # clamp gate (pen > squeeze)
            deeps_floor = []  # squeeze-floor gate at half threshold — the
            #                   clamp equilibrates penetration AT `squeeze`,
            #                   so the same gate would flicker per substep
            #                   (see envs/arm._sim_substeps)
            for a in range(self.n_arms):
                m_a = SQZ[a : a + 1].T                            # [Kr,1]
                pen_a = jnp.max(
                    jnp.where((rmask * m_a) > 0, depth_r, -1e9),
                    axis=0,
                    keepdims=True,
                )                                                 # [1,Bb]
                deeps.append(pen_a > squeeze)
                # floor gate: servo actively commanding closure (raw ctrl
                # beyond the finger position in the closing direction) — an
                # OPEN gripper straddling a part must not squeeze
                gm_a = self._grip_meta[a]
                closing = None
                for row, gj, cs in zip(
                    gm_a["rows"], gm_a["joints"], gm_a["signs"]
                ):
                    c_r = cs * (ctrl[row : row + 1] - qp[gj : gj + 1]) > 0
                    closing = c_r if closing is None else (closing | c_r)
                deeps_floor.append(closing & (pen_a > 0.5 * squeeze))
            for gm in self._grip_meta:
                deep = deeps[gm["arm_idx"]]
                for row, gj, cs in zip(gm["rows"], gm["joints"], gm["signs"]):
                    cr = ctrl[row : row + 1]
                    qj = qp[gj : gj + 1]
                    held = jnp.minimum(cr, qj) if cs > 0 else jnp.maximum(cr, qj)
                    new_row = jnp.where(deep, held, cr)
                    # guarded concat: Mosaic rejects zero-sized slices
                    pieces = []
                    if row > 0:
                        pieces.append(ctrl_eff[:row])
                    pieces.append(new_row)
                    if row + 1 < NA:
                        pieces.append(ctrl_eff[row + 1 :])
                    ctrl_eff = jnp.concatenate(pieces, axis=0)

            # ============ finger-servo press ============
            # (SimConfig.grip_press_vel; mirrors envs/arm._sim_substeps):
            # inward prescribed surface velocity on engaged finger lanes —
            # the blocked servo's pad keeps advancing; squeeze forces
            # emerge from the solve, saturating at the warm-start cap
            rvalid = rmask * (depth_r > -slop).astype(jnp.float32)
            if cfg.grip_press_vel > 0:
                press = jnp.zeros_like(depth_r)
                for a_i in range(self.n_arms):
                    gate = deeps_floor[a_i].astype(jnp.float32)  # [1,Bb]
                    press = press + SQZ[a_i : a_i + 1].T * gate
                press = press * rvalid * cfg.grip_press_vel
                velb_r = tuple(
                    v + press * nc for v, nc in zip(velb_r, normal_r)
                )
            lin = (lin[0], lin[1], lin[2] + dt * gz * gscale)

            # ================= actuator torques =================
            frows = []
            for i, am in enumerate(self._act_meta):
                c = jnp.clip(ctrl_eff[i : i + 1], am["clo"], am["chi"])
                if am["kind"] == _VELOCITY:
                    f = am["gain"] * c
                elif am["kind"] == _POSITION:
                    f = am["gain"] * (c - qp[am["joint"] : am["joint"] + 1])
                else:
                    f = am["gain"] * c
                    if np.isfinite(am["flo"]):
                        f = jnp.clip(f, am["flo"], am["fhi"])
                frows.append(f)
            act_f = jnp.concatenate(frows, axis=0)               # [NA,Bb]
            tau = (
                jnp.dot(A2J, act_f, preferred_element_type=jnp.float32)
                + tau_extra
            )

            # ================= all-lane contact solve =================
            point = tuple(
                jnp.concatenate([f, p, e, r], axis=0)
                for f, p, e, r in zip(cw_f, cw_p, pt_e, point_r)
            )
            normal = tuple(
                jnp.concatenate([f, p, e, r], axis=0)
                for f, p, e, r in zip(n_f, n_p, n_e, normal_r)
            )
            depth = jnp.concatenate(
                [depth_f, depth_p, depth_e, depth_r], axis=0
            )
            fmask = jnp.concatenate(
                [fmask_f, fmask_p, fmask_e, rvalid], axis=0
            )
            zero_fp = jnp.zeros((Kf + Kp + Ke, Bb), jnp.float32)
            velb = tuple(jnp.concatenate([zero_fp, c], axis=0) for c in velb_r)

            gca = _matcat(OA, g_com)
            gcb = _matcat(OBS, g_com)
            r_a = tuple(p - g for p, g in zip(point, gca))
            r_b = tuple(p - g for p, g in zip(point, gcb))

            use_z = jnp.abs(normal[2]) < 0.9
            ref = (
                jnp.where(use_z, 0.0, 1.0),
                jnp.zeros_like(normal[0]),
                jnp.where(use_z, 1.0, 0.0),
            )
            t1r = _cross(normal, ref)
            t1n = jnp.sqrt(_dot3(t1r, t1r) + 1e-24)
            t1 = tuple(c / t1n for c in t1r)
            t2 = _cross(normal, t1)
            dirs = (normal, t1, t2)

            inv_m_a = _matcat(OA, (inv_gm,))[0]
            inv_m_b = _matcat(OB, (inv_gm,))[0]
            iflat = [invI[i][j] for i in range(3) for j in range(3)]
            iA = _matcat(OA, iflat)
            iB = _matcat(OB, iflat)

            def quad(rxd, I9):
                t0 = I9[0] * rxd[0] + I9[1] * rxd[1] + I9[2] * rxd[2]
                t1_ = I9[3] * rxd[0] + I9[4] * rxd[1] + I9[5] * rxd[2]
                t2_ = I9[6] * rxd[0] + I9[7] * rxd[1] + I9[8] * rxd[2]
                return rxd[0] * t0 + rxd[1] * t1_ + rxd[2] * t2_

            inv_w = []
            for dvec in dirs:
                rxd_a = _cross(r_a, dvec)
                rxd_b = _cross(r_b, dvec)
                wd = inv_m_a + inv_m_b + quad(rxd_a, iA) + quad(rxd_b, iB)
                inv_w.append(1.0 / jnp.maximum(wd, 1e-8))

            bias = -jnp.minimum(
                (BETA / dt) * jnp.maximum(depth - slop, 0.0), 0.5
            )

            s_a = _matcat(OAT, (fmask,))[0]
            s_b = _matcat(OBT, (fmask,))[0]
            cnt_p = spread_sum((s_a + s_b,))[0]
            n_a = _matcat(OA, (cnt_p,))[0]
            n_b = _matcat(OB, (cnt_p,))[0]
            lane_scale = relax / jnp.maximum(jnp.maximum(n_a, n_b), 1.0)

            def apply(lam):
                imp = tuple(
                    (lam[0] * dirs[0][c] + lam[1] * dirs[1][c] + lam[2] * dirs[2][c])
                    * fmask
                    for c in range(3)
                )
                tq_a = _cross(r_a, imp)
                tq_b = _cross(r_b, tuple(-i for i in imp))
                sa = _matcat(OAT, imp + tq_a)
                sb = _matcat(OBT, tuple(-i for i in imp) + tq_b)
                dlin_s = tuple(sa[c] + sb[c] for c in range(3))
                angacc_s = tuple(sa[3 + c] + sb[3 + c] for c in range(3))
                dlin_g = spread_sum(dlin_s)
                angacc_g = spread_sum(angacc_s)
                lv = tuple(l + dg * inv_gm for l, dg in zip(lin, dlin_g))
                av = tuple(
                    a
                    + invI[i][0] * angacc_g[0]
                    + invI[i][1] * angacc_g[1]
                    + invI[i][2] * angacc_g[2]
                    for i, a in enumerate(ang)
                )
                return lv, av, imp

            def it_body(_, lam):
                lv, av, _ = apply(lam)
                ga6 = _matcat(OA, lv + av)
                gb6 = _matcat(OB, lv + av)
                va = tuple(
                    ga6[c] + cr for c, cr in enumerate(_cross(ga6[3:], r_a))
                )
                vb = tuple(
                    gb6[c] + cr + vl
                    for c, (cr, vl) in enumerate(zip(_cross(gb6[3:], r_b), velb))
                )
                v_rel = tuple(a - b for a, b in zip(va, vb))
                vd0 = _dot3(v_rel, dirs[0])
                vd1 = _dot3(v_rel, dirs[1])
                vd2 = _dot3(v_rel, dirs[2])
                l0 = lam[0] - (vd0 + bias) * inv_w[0] * lane_scale
                l1 = lam[1] - vd1 * inv_w[1] * lane_scale
                l2 = lam[2] - vd2 * inv_w[2] * lane_scale
                ln = jnp.maximum(l0, 0.0)
                mf = FRIC * ln
                return (ln, jnp.clip(l1, -mf, mf), jnp.clip(l2, -mf, mf))

            # warm-start cap at resting-contact scale (engine.WARM_CAP_ACC):
            # discard stale impact spikes, keep steady-state impulses.
            # Robot (kinematic-finger) lanes carry a 10x TIGHTER cap: a
            # stale over-applied impulse between two stiff kinematic pads
            # amplifies the explicit finger<->part coupling into a growing
            # oscillation that ejects held parts (the under-relaxed
            # mass-split sweep cannot unwind it), while some persistence is
            # what lets the servo-press squeeze accumulate force closure
            capfac = jnp.concatenate(
                [
                    jnp.full((Kf + Kp + Ke, Bb), 200.0, jnp.float32),
                    jnp.full((Kr, Bb), 30.0, jnp.float32),
                ],
                axis=0,
            )
            capw = capfac * inv_w[0] * dt
            l0w = jnp.minimum(lam_ws[0], capw)
            mfw = FRIC * l0w
            lam_init = (
                l0w,
                jnp.clip(lam_ws[1], -mfw, mfw),
                jnp.clip(lam_ws[2], -mfw, mfw),
            )
            lam = jax.lax.fori_loop(0, iters, it_body, lam_init)
            lv, av, imp = apply(lam)
            lv = tuple(jnp.clip(c, -maxv, maxv) for c in lv)
            av = tuple(jnp.clip(c, -maxv, maxv) for c in av)
            # grasp-aware velocity clamp (SimConfig.held_vel_clamp; mirrors
            # envs/arm._sim_substeps): pinched groups bounded at hand scale
            if cfg.held_vel_clamp > 0:
                pin_any = jnp.zeros((P, Bb), jnp.float32)
                for a_i in range(self.n_arms):
                    tl = touch_new[(2 * a_i) * P : (2 * a_i + 1) * P]
                    tr = touch_new[(2 * a_i + 1) * P : (2 * a_i + 2) * P]
                    deep_f = deeps_floor[a_i].astype(jnp.float32)
                    pin_any = jnp.maximum(pin_any, tl * tr * deep_f)
                pin_g = jnp.max(member * pin_any[None, :, :], axis=1)

                def cap_vec(v, cap):
                    n = jnp.sqrt(_dot3(v, v) + 1e-18)
                    scale = jnp.minimum(1.0, cap / n)
                    return tuple(
                        jnp.where(pin_g > 0, c * scale, c) for c in v
                    )

                lv = cap_vec(lv, cfg.held_vel_clamp)
                av = cap_vec(av, cfg.held_angvel_clamp)

            # ================= joint integration =================
            # contact reaction impulse onto the arm: p_c = Jᵀ(−λ)
            imp_r = tuple(c[Kf + Kp + Ke :] for c in imp)        # [Kr,Bb]
            pc_rows = []
            for j in range(NJ):
                if not couple:
                    break
                anc_j = ANC[:, j : j + 1]
                if self._jnt_meta[j]["jtype"] == _HINGE:
                    dvec = tuple(p - o for p, o in zip(point_r, anchor_w[j]))
                    phi = _cross(axis_w[j], dvec)
                else:
                    phi = tuple(
                        jnp.broadcast_to(c, depth_r.shape) for c in axis_w[j]
                    )
                dot = (
                    imp_r[0] * phi[0] + imp_r[1] * phi[1] + imp_r[2] * phi[2]
                )
                pc_rows.append(
                    -jnp.sum(anc_j * dot, axis=0, keepdims=True)
                )
            if couple:
                p_c = jnp.concatenate(pc_rows, axis=0)            # [NJ,Bb]
                # spike clamp (SimConfig.robot_coupling_clamp; see envs/arm)
                pc_cap = cfg.robot_coupling_clamp * dt
                p_c = jnp.clip(p_c, -pc_cap, pc_cap)
            else:
                p_c = jnp.zeros_like(qv)

            rhs = tau - JFRIC * jnp.tanh(qv / 0.01) + p_c / dt    # [NJ,Bb]
            qv_tile = jnp.concatenate([qv] * NJ, axis=0)          # [NJ²,Bb]
            rhs_tile = jnp.concatenate([rhs] * NJ, axis=0)
            qv_new = jnp.dot(
                SUMJ, G1 * qv_tile, preferred_element_type=jnp.float32
            ) + jnp.dot(SUMJ, G2 * rhs_tile, preferred_element_type=jnp.float32)
            qv_new = jnp.clip(qv_new, -JMAXV, JMAXV)
            qp_new = qp + dt * qv_new
            qp_cl = jnp.clip(qp_new, JLO, JHI)
            qv_new = jnp.where(qp_cl != qp_new, 0.0, qv_new)

            # ================= part integration =================
            angle = jnp.sqrt(_dot3(av, av) + 1e-18)
            axis = tuple(c / angle for c in av)
            an = jnp.sqrt(_dot3(axis, axis) + 1e-24)
            axis = tuple(c / an for c in axis)
            half = angle * (dt * 0.5)
            sh = jnp.sin(half)
            dq = (jnp.cos(half), sh * axis[0], sh * axis[1], sh * axis[2])
            relp = tuple(p - g for p, g in zip(pos, g_com))
            rot_rel = _qrot(dq, relp)
            new_pos = tuple(
                g + rr + v * dt for g, rr, v in zip(g_com, rot_rel, lv)
            )
            nq = _qmul(dq, quat)
            qn = jnp.maximum(
                jnp.sqrt(
                    nq[0] * nq[0] + nq[1] * nq[1] + nq[2] * nq[2] + nq[3] * nq[3]
                ),
                1e-12,
            )
            new_quat = tuple(c / qn for c in nq)

            pq2 = _matcat(OAf, new_quat)
            pp2 = _matcat(OAf, new_pos)
            cz = pp2[2] + _qrot(pq2, LF_C)[2]
            d2f = -cz
            penf = jnp.maximum(
                jnp.where(d2f > -slop, d2f - slop, 0.0), 0.0
            )
            per_part = jnp.concatenate(
                [
                    jnp.max(jnp.where(FMP[p] > 0, penf, 0.0), axis=0, keepdims=True)
                    for p in range(P)
                ],
                axis=0,
            )
            per_group = jnp.max(member * per_part[None, :, :], axis=1)
            new_pos = (new_pos[0], new_pos[1], new_pos[2] + per_group)

            return (new_pos, new_quat, lv, av, qp_cl, qv_new, touch_new, lam)

        touch0 = jnp.zeros((NT, s.shape[-1]), jnp.float32)
        zl0 = jnp.zeros((K, s.shape[-1]), jnp.float32)
        out = jax.lax.fori_loop(
            0,
            n,
            substep,
            (pos0, quat0, lin0, ang0, qp0, qv0, touch0, (zl0, zl0, zl0)),
        )
        pos, quat, lin, ang, qp, qv, touch, _ = out
        ys_ref[:] = jnp.concatenate(pos + quat + lin + ang + (qp, qv), axis=0)
        yt_ref[:] = touch

    # -- host wrapper ----------------------------------------------------------

    def _consts(self):
        if not hasattr(self, "_const_arrays"):
            P = self.P
            pc = np.zeros((P, 13), np.float32)
            pc[:, 0] = self.mass
            pc[:, 1:4] = self.com_l
            pc[:, 4:13] = self.inertia_l.reshape(P, 9)
            lpc = np.concatenate(
                [self.lp_corner, self.lp_dst_pos, self.lp_dst_quat, self.lp_dst_size],
                axis=1,
            ).astype(np.float32)
            r2c = np.concatenate(
                [
                    self.r2_off,
                    self.r2_dst_pos,
                    self.r2_dst_quat,
                    self.r2_dst_size,
                ],
                axis=1,
            ).astype(np.float32)                                 # [Kr2,13]
            jc = np.stack(
                [
                    self._jfric,
                    np.minimum(self._jmaxvel, 1e9),
                    np.maximum(self._jlo, -1e9),
                    np.minimum(self._jhi, 1e9),
                ],
                axis=1,
            ).astype(np.float32)                                 # [NJ,4]
            self._const_arrays = (
                pc,
                self.OA,
                self.OBS,
                self.OB,
                self.OA.T.copy(),
                self.OB.T.copy(),
                self.lane_fric[:, None].copy(),
                self.lf_corner,
                self.OAf,
                self.floor_mask_p.T.copy(),
                lpc,
                self.OAp,
                self.OBp,
                self.r1_corner,
                self.r1_rsize,
                self.OHR1,
                r2c,
                self.OHR2,
                self.ANC,
                self.SQZ,
                self.TOUCHMAP,
                jc,
                self.A2J,
                self.SUMJ,
                self.lane_beta[:, None].copy(),
                self.ep_a,
                self.ep_b,
                self.OAe,
                self.OBe,
                self.PAIRSUM,
            )
        return tuple(jnp.asarray(a) for a in self._const_arrays)

    def _get_call(self, n: int, B: int, Bb: int):
        key = (n, B, Bb)
        if key in self._compiled:
            return self._compiled[key]
        P, NJ, NA, NT = self.P, self.NJ, self.NA, self.NT
        rows_s = 15 * P + 2 * NJ
        rows_c = NA + NJ + 2 * NJ * NJ
        rows_y = 13 * P + 2 * NJ
        grid = (B // Bb,)
        kernel = functools.partial(self._kernel_body, n=n)
        const_specs = [
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for a in self._consts()
        ]
        call = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((rows_y, B), jnp.float32),
                jax.ShapeDtypeStruct((NT, B), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((rows_s, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_c, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            ]
            + const_specs,
            out_specs=(
                pl.BlockSpec((rows_y, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((NT, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
            interpret=self.interpret,
        )
        self._compiled[key] = call
        return call

    def control_step(
        self, parts, group, gscale, qpos, qvel, ctrl, tau_extra, G1, G2, n: int
    ):
        """Run ``n`` coupled substeps for a batch (leading dim B).

        Inputs: ``parts.pos [B,P,3]``…, ``group/gscale [B,P]``, ``qpos/qvel
        [B,NJ]``, ``ctrl [B,NA]``, ``tau_extra [B,NJ]``, ``G1/G2 [B,NJ,NJ]``.
        Returns ``(parts', qpos', qvel', touch [B, 2*n_arms, P])``.
        """
        from .state import PartState

        B0, P, NJ, NA = parts.pos.shape[0], self.P, self.NJ, self.NA
        min_b = 8 if self.interpret else 128
        Bb = min(self.block, max(B0, min_b))
        B = int(np.ceil(B0 / Bb) * Bb)

        def tx(a, c):
            return jnp.transpose(a, (2, 1, 0)).reshape(c * a.shape[1], B0)

        xs = jnp.concatenate(
            [
                tx(parts.pos, 3),
                tx(parts.quat, 4),
                tx(parts.lin_vel, 3),
                tx(parts.ang_vel, 3),
                group.astype(jnp.float32).T,
                gscale.astype(jnp.float32).T,
                qpos.T,
                qvel.T,
            ],
            axis=0,
        )
        xc = jnp.concatenate(
            [
                ctrl.T,
                tau_extra.T,
                G1.reshape(B0, NJ * NJ).T,
                G2.reshape(B0, NJ * NJ).T,
            ],
            axis=0,
        )
        if B != B0:
            xs = jnp.pad(xs, ((0, 0), (0, B - B0)), mode="edge")
            xc = jnp.pad(xc, ((0, 0), (0, B - B0)), mode="edge")
        ys, yt = self._get_call(n, B, Bb)(xs, xc, *self._consts())
        if B != B0:
            ys = ys[:, :B0]
            yt = yt[:, :B0]

        def rx(rows, c):
            return jnp.transpose(rows.reshape(c, P, B0), (2, 1, 0))

        parts_out = PartState(
            pos=rx(ys[0 : 3 * P], 3),
            quat=rx(ys[3 * P : 7 * P], 4),
            lin_vel=rx(ys[7 * P : 10 * P], 3),
            ang_vel=rx(ys[10 * P : 13 * P], 3),
        )
        qp = ys[13 * P : 13 * P + NJ].T
        qv = ys[13 * P + NJ : 13 * P + 2 * NJ].T
        touch = yt.T.reshape(B0, self.n_arms * 2, P) > 0.5
        return parts_out, qp, qv, touch
