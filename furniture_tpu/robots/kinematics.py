"""Batched articulated-chain kinematics and joint-space dynamics.

TPU-native replacement for the MuJoCo computations the reference leans on:

* forward kinematics + eef pose     (``sim.data.body_xpos/xquat`` reads, e.g.
                                     ``env/furniture.py:2915``, ``:3399-3457``)
* basic/body Jacobians              (``controllers/arm_controller.py:115-125``
                                     ``Jx/Jr`` via ``sim.data.get_body_jacp/r``)
* joint-space mass matrix           (``cymj._mj_fullM``,
                                     ``arm_controller.py:127-137``)
* joint integration with actuators  (MuJoCo ``mj_step`` actuator dynamics;
                                     velocity servo ``τ=kv(ctrl−q̇)``, position
                                     servo ``τ=kp(ctrl−q)``, motor ``τ=gear·a``)

Design notes (TPU-first):
* the chain is tiny (≤ 31 bodies, ≤ 19 joints), so FK is an unrolled Python
  loop over bodies at trace time — XLA sees a flat fused graph, no dynamic
  control flow;
* Jacobians/mass matrix are dense einsums over the precompiled ``ancestor``
  matrix — MXU-friendly at batch, no gathers;
* the reference gravity-compensates the robot exactly every control step
  (``qfrc_applied = qfrc_bias``, ``env/furniture.py:3371-3377``), so the
  integrator needs no gravity/Coriolis term: M q̈ = τ_actuator − damping·q̇,
  integrated semi-implicitly with actuator gains folded into an implicit
  damping matrix for unconditional stability at kp up to 1e6.

All functions take a ``CompiledRobot`` (static numpy) plus traced ``qpos`` /
``qvel`` of shape [NJ]; callers ``vmap`` over the batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import transforms as T
from .chain import HINGE, MOTOR, POSITION, SLIDE, VELOCITY, CompiledRobot


def fk(robot: CompiledRobot, qpos: jax.Array):
    """Forward kinematics.

    Implemented as a ``lax.scan`` over bodies (uniform body, dynamic parent
    gather) rather than an unrolled Python loop: the chain is sequential
    either way at runtime, but the scan keeps the XLA graph tiny — the
    unrolled form made every enclosing loop body (substeps, IK iterations)
    ~20s of CPU compile on its own.

    Returns dict with body world poses and joint world axes/anchors:
      body_pos [NB,3], body_quat [NB,4], axis_w [NJ,3], anchor_w [NJ,3]
    """
    NB = robot.nb
    pos_l = jnp.asarray(robot.body_pos, jnp.float32)         # [NB,3]
    quat_l = jnp.asarray(robot.body_quat, jnp.float32)       # [NB,4]
    parent = jnp.asarray(robot.parent)                        # [NB]
    bj = robot.body_joint
    has_j = jnp.asarray(bj >= 0)
    j_safe = np.maximum(bj, 0)
    hinge = jnp.asarray((robot.jnt_type[j_safe] == HINGE) & (bj >= 0))
    axis_b = jnp.asarray(robot.jnt_axis[j_safe], jnp.float32)  # [NB,3]
    jpos_b = jnp.asarray(robot.jnt_pos[j_safe], jnp.float32)   # [NB,3]
    qj_b = qpos[jnp.asarray(j_safe)] * has_j                   # [NB]

    def body_fn(carry, x):
        pos_all, quat_all = carry
        i, par, lpos, lquat, is_h, has, ax, jp, qj = x
        root = par < 0
        psafe = jnp.maximum(par, 0)
        ppos = jnp.where(root, jnp.zeros(3), pos_all[psafe])
        pquat = jnp.where(root, jnp.array([1.0, 0, 0, 0]), quat_all[psafe])
        pre_pos = ppos + T.quat_rotate(pquat, lpos)
        pre_quat = T.quat_mul(pquat, lquat)
        # hinge: rotate about anchor jp along ax (MuJoCo semantics)
        qj_rot = T.quat_from_axis_angle(ax, jnp.where(is_h, qj, 0.0))
        w_quat = T.quat_mul(pre_quat, qj_rot)
        w_pos_h = pre_pos + T.quat_rotate(pre_quat, jp) - T.quat_rotate(w_quat, jp)
        w_pos_s = pre_pos + T.quat_rotate(pre_quat, ax) * qj
        w_pos = jnp.where(
            is_h, w_pos_h, jnp.where(has, w_pos_s, pre_pos)
        )
        pos_all = pos_all.at[i].set(w_pos)
        quat_all = quat_all.at[i].set(w_quat)
        return (pos_all, quat_all), None

    xs = (
        jnp.arange(NB),
        parent,
        pos_l,
        quat_l,
        hinge,
        has_j,
        axis_b,
        jpos_b,
        qj_b,
    )
    (body_pos, body_quat), _ = jax.lax.scan(
        body_fn, (jnp.zeros((NB, 3)), jnp.zeros((NB, 4))), xs
    )

    # joint world frames recovered vectorized: for a hinge, R_joint maps its
    # own axis to itself, so rotate by the POST-joint quat is equivalent
    if robot.nj:
        jb = jnp.asarray(robot.jnt_body)
        axis_w = T.quat_rotate(body_quat[jb], jnp.asarray(robot.jnt_axis, jnp.float32))
        anchor_w = body_pos[jb] + T.quat_rotate(
            body_quat[jb], jnp.asarray(robot.jnt_pos, jnp.float32)
        )
    else:
        axis_w = jnp.zeros((0, 3))
        anchor_w = jnp.zeros((0, 3))

    return {
        "body_pos": body_pos,
        "body_quat": body_quat,
        "axis_w": axis_w,
        "anchor_w": anchor_w,
    }


def point_jacobian(robot: CompiledRobot, fk_out, body_idx, point_w):
    """6×NJ spatial Jacobian of world ``point_w`` rigidly attached to body
    ``body_idx`` (static int). Rows 0-2 linear, 3-5 angular.

    Matches MuJoCo's ``jacp/jacr`` convention used by the reference
    controllers (``arm_controller.py:115-125``).
    """
    anc = jnp.asarray(robot.ancestor[body_idx], jnp.float32)    # [NJ]
    axis = fk_out["axis_w"]                                     # [NJ,3]
    anchor = fk_out["anchor_w"]                                 # [NJ,3]
    hinge = jnp.asarray(robot.jnt_type == HINGE, jnp.float32)[:, None]
    arm = point_w[None, :] - anchor                             # [NJ,3]
    jv = hinge * jnp.cross(axis, arm) + (1.0 - hinge) * axis
    jw = hinge * axis
    jv = jv * anc[:, None]
    jw = jw * anc[:, None]
    return jnp.concatenate([jv.T, jw.T], axis=0)                # [6,NJ]


def body_jacobians(robot: CompiledRobot, fk_out):
    """Linear (at body COM) and angular Jacobians for every body.

    Returns (Jv [NB,3,NJ], Jw [NB,3,NJ], com_w [NB,3]). Dense masked form —
    batched einsums instead of per-body gathers.
    """
    anc = jnp.asarray(robot.ancestor, jnp.float32)              # [NB,NJ]
    axis = fk_out["axis_w"]                                     # [NJ,3]
    anchor = fk_out["anchor_w"]                                 # [NJ,3]
    hinge = jnp.asarray(robot.jnt_type == HINGE, jnp.float32)[:, None]

    com_w = fk_out["body_pos"] + T.quat_rotate(
        fk_out["body_quat"], jnp.asarray(robot.body_com, jnp.float32)
    )                                                           # [NB,3]
    arm = com_w[:, None, :] - anchor[None, :, :]                # [NB,NJ,3]
    jv_h = jnp.cross(jnp.broadcast_to(axis[None], arm.shape), arm)
    jv = hinge[None] * jv_h + (1.0 - hinge)[None] * axis[None]  # [NB,NJ,3]
    jw = hinge[None] * jnp.broadcast_to(axis[None], arm.shape)
    jv = jv * anc[..., None]
    jw = jw * anc[..., None]
    return jnp.swapaxes(jv, 1, 2), jnp.swapaxes(jw, 1, 2), com_w


def mass_matrix(robot: CompiledRobot, fk_out):
    """Joint-space inertia via the batched body-Jacobian form
    ``M = Σ_b m_b Jv_bᵀJv_b + Jw_bᵀ I_b Jw_b`` (+ armature on the diagonal).

    Equivalent to CRBA for these chain sizes and maps onto batched matmuls
    (the reference reads MuJoCo's CRBA result via ``cymj._mj_fullM``,
    ``arm_controller.py:127-137``).
    """
    jv, jw, _ = body_jacobians(robot, fk_out)                   # [NB,3,NJ]
    mass = jnp.asarray(robot.body_mass, jnp.float32)            # [NB]
    I_l = jnp.asarray(robot.body_inertia, jnp.float32)          # [NB,3,3]
    R = T.quat_to_mat(fk_out["body_quat"])                      # [NB,3,3]
    I_w = R @ I_l @ jnp.swapaxes(R, -1, -2)

    M = jnp.einsum("b,bik,bij->kj", mass, jv, jv) + jnp.einsum(
        "bik,bil,blj->kj", jw, I_w, jw
    )
    return M + jnp.diag(jnp.asarray(robot.jnt_armature, jnp.float32))


def gravity_bias(robot: CompiledRobot, fk_out, g=-9.81):
    """Joint-space gravity torque (the dominant part of MuJoCo's
    ``qfrc_bias``; used by controllers that need explicit gravity comp)."""
    jv, _, _ = body_jacobians(robot, fk_out)
    mass = jnp.asarray(robot.body_mass, jnp.float32)
    gvec = jnp.array([0.0, 0.0, g], jnp.float32)
    # τ_g = -Σ_b m_b Jv_bᵀ g  (bias sign convention: τ cancels gravity)
    return -jnp.einsum("b,bik,i->k", mass, jv, gvec)


def actuator_torques(robot: CompiledRobot, qpos, qvel, ctrl):
    """Explicit actuator torque + implicit damping gain per joint.

    Returns (tau [NJ], d_implicit [NJ]): velocity servos contribute
    ``kv·ctrl`` explicitly and ``kv`` implicitly; position servos are made
    implicit-in-stiffness (``kp·dt`` folded into damping by the integrator)
    so the gripper's kp=1e4..1e6 stays stable at dt=2 ms.
    """
    NJ = robot.nj
    tau = jnp.zeros(NJ)
    d_imp = jnp.zeros(NJ)
    k_imp = jnp.zeros(NJ)
    aj = robot.act_joint
    for i in range(robot.na):
        j = int(aj[i])
        kind = int(robot.act_kind[i])
        gain = float(robot.act_gain[i])
        c = jnp.clip(
            ctrl[i], robot.act_ctrlrange[i, 0], robot.act_ctrlrange[i, 1]
        )
        if kind == VELOCITY:
            tau = tau.at[j].add(gain * c)   # −kv·q̇ goes implicit via d_imp
            d_imp = d_imp.at[j].add(gain)
        elif kind == POSITION:
            tau = tau.at[j].add(gain * (c - qpos[j]))
            k_imp = k_imp.at[j].add(gain)
        else:  # MOTOR
            f = gain * c
            lo, hi = robot.act_forcerange[i]
            if np.isfinite(lo):
                f = jnp.clip(f, lo, hi)
            tau = tau.at[j].add(f)
    return tau, d_imp, k_imp


def static_damping(robot: CompiledRobot, dt) -> np.ndarray:
    """Total implicit per-joint damping D = joint damping + actuator kv +
    dt·actuator kp (depends only on actuator kinds/gains — static)."""
    D = np.asarray(robot.jnt_damping, np.float64).copy()
    for i in range(robot.na):
        j = int(robot.act_joint[i])
        kind = int(robot.act_kind[i])
        gain = float(robot.act_gain[i])
        if kind == VELOCITY:
            D[j] += gain
        elif kind == POSITION:
            D[j] += dt * gain
    return D.astype(np.float32)


def joint_dyn_matrices(robot: CompiledRobot, qpos, dt):
    """Precompute the semi-implicit update matrices for one control step.

    With A = M(q) + dt·diag(D) frozen over the control step (the arm moves
    ≤ a few degrees per 0.1 s under bias-compensated dynamics), the substep
    update ``A q̇' = M q̇ + dt·τ_eff + p_contact`` becomes
    ``q̇' = G1 q̇ + G2 (τ_eff + p_contact/dt)`` with G1 = A⁻¹M, G2 = dt·A⁻¹.
    """
    fk_out = fk(robot, qpos)
    M = mass_matrix(robot, fk_out)
    D = jnp.asarray(static_damping(robot, dt))
    A = M + dt * jnp.diag(D)
    Ainv = jax.scipy.linalg.solve(A, jnp.eye(robot.nj), assume_a="pos")
    return Ainv @ M, dt * Ainv


def integrate_precomputed(robot: CompiledRobot, G1, G2, qpos, qvel, tau, p_c, dt):
    """One semi-implicit joint step using precomputed G1/G2
    (:func:`joint_dyn_matrices`). ``p_c`` is a joint-space contact impulse
    (Jᵀλ feedback from the part contact solver); pass zeros when uncoupled.
    Algebraically identical to :func:`integrate` with frozen M."""
    fric = jnp.asarray(robot.jnt_frictionloss, jnp.float32)
    rhs = tau - fric * jnp.tanh(qvel / 0.01) + p_c / dt
    new_qvel = G1 @ qvel + G2 @ rhs
    vmax = jnp.asarray(robot.jnt_maxvel, jnp.float32)
    new_qvel = jnp.clip(new_qvel, -vmax, vmax)
    new_qpos = qpos + dt * new_qvel
    lo = jnp.asarray(robot.jnt_range[:, 0], jnp.float32)
    hi = jnp.asarray(robot.jnt_range[:, 1], jnp.float32)
    clamped = jnp.clip(new_qpos, lo, hi)
    hit = clamped != new_qpos
    new_qvel = jnp.where(hit, 0.0, new_qvel)
    return clamped, new_qvel


def body_angvel(robot: CompiledRobot, fk_out, qvel, body_idx: int):
    """World angular velocity of one body: ω = Σ_j anc[b,j]·q̇_j·axis_j
    (hinge joints only contribute)."""
    anc = jnp.asarray(robot.ancestor[body_idx], jnp.float32)
    hinge = jnp.asarray(robot.jnt_type == HINGE, jnp.float32)
    return jnp.sum(
        (anc * hinge * qvel)[:, None] * fk_out["axis_w"], axis=0
    )


def contact_impulses_to_joints(robot: CompiledRobot, fk_out, points, anc_mask, imp):
    """Joint-space reaction impulse of robot-lane contact impulses: Jᵀ(−λ).

    ``points [L,3]`` world contact points on robot geoms, ``anc_mask [L,NJ]``
    static ancestry of each lane's robot body, ``imp [L,3]`` the impulse the
    solver applied to the PART at each lane (reaction on the robot is −imp).
    This is the two-way coupling MuJoCo provides natively (the reference's
    gripper↔part contacts load the arm through ``mj_step``)."""
    axis = fk_out["axis_w"]                                    # [NJ,3]
    anchor = fk_out["anchor_w"]                                # [NJ,3]
    hinge = jnp.asarray(robot.jnt_type == HINGE, jnp.float32)[None, :, None]
    dvec = points[:, None, :] - anchor[None, :, :]             # [L,NJ,3]
    phi = hinge * jnp.cross(
        jnp.broadcast_to(axis[None], dvec.shape), dvec
    ) + (1.0 - hinge) * axis[None]                             # [L,NJ,3]
    phi = phi * anc_mask[:, :, None]
    return -jnp.einsum("lji,li->j", phi, imp)


def integrate(robot: CompiledRobot, M, qpos, qvel, tau, d_implicit, k_implicit, dt):
    """One semi-implicit joint integration step.

    Solves ``(M + dt·D) q̇' = M q̇ + dt·(τ − frictionloss·tanh(q̇/ε))`` with
    ``D = joint damping + actuator kv + dt·actuator kp``, then clamps joint
    limits (zeroing the velocity of clamped joints).
    """
    D = (
        jnp.asarray(robot.jnt_damping, jnp.float32)
        + d_implicit
        + dt * k_implicit
    )
    fric = jnp.asarray(robot.jnt_frictionloss, jnp.float32)
    rhs = M @ qvel + dt * (tau - fric * jnp.tanh(qvel / 0.01))
    A = M + dt * jnp.diag(D)
    new_qvel = jax.scipy.linalg.solve(A, rhs, assume_a="pos")
    vmax = jnp.asarray(robot.jnt_maxvel, jnp.float32)
    new_qvel = jnp.clip(new_qvel, -vmax, vmax)
    new_qpos = qpos + dt * new_qvel

    lo = jnp.asarray(robot.jnt_range[:, 0], jnp.float32)
    hi = jnp.asarray(robot.jnt_range[:, 1], jnp.float32)
    clamped = jnp.clip(new_qpos, lo, hi)
    hit = clamped != new_qpos
    new_qvel = jnp.where(hit, 0.0, new_qvel)
    return clamped, new_qvel


def geom_world(robot: CompiledRobot, fk_out):
    """World pose of every robot collision geom."""
    gb = robot.geom_body
    gp = jnp.asarray(robot.geom_pos, jnp.float32)
    gq = jnp.asarray(robot.geom_quat, jnp.float32)
    bp = fk_out["body_pos"][gb]
    bq = fk_out["body_quat"][gb]
    return bp + T.quat_rotate(bq, gp), T.quat_mul(bq, gq)


def geom_velocities(robot: CompiledRobot, fk_out, qvel):
    """World linear/angular velocity of every robot collision geom center.

    Used to prescribe contact-point velocities of the (kinematically
    treated) gripper geoms in the part contact solver.
    """
    jv, jw, com_w = body_jacobians(robot, fk_out)               # [NB,3,NJ]
    v_com = jv @ qvel                                           # [NB,3]
    w_b = jw @ qvel                                             # [NB,3]
    gb = robot.geom_body
    gpos_w, _ = geom_world(robot, fk_out)
    r = gpos_w - com_w[gb]
    v_geom = v_com[gb] + jnp.cross(w_b[gb], r)
    return v_geom, w_b[gb]


def site_world(robot: CompiledRobot, fk_out, arm: str):
    """World position/quat of the arm's grip site (reference ``grip_site``,
    used for eef obs and IK targets)."""
    b, local = robot.grip_site[arm]
    pos = fk_out["body_pos"][b] + T.quat_rotate(
        fk_out["body_quat"][b], jnp.asarray(local, jnp.float32)
    )
    return pos, fk_out["body_quat"][b]


def tip_world(robot: CompiledRobot, fk_out, arm: str):
    """World position of the arm's griptip site (reference ``griptip_site``,
    the eef point of the dense-reward env, ``furniture_sawyer_dense.py:245``)."""
    b, local = robot.griptip_site[arm]
    return fk_out["body_pos"][b] + T.quat_rotate(
        fk_out["body_quat"][b], jnp.asarray(local, jnp.float32)
    )


def eef_pose(robot: CompiledRobot, fk_out, arm: str):
    """World pose of the hand body (reference ``right_hand`` body pose,
    ``env/furniture.py:2915``)."""
    b = robot.eef_body[arm]
    return fk_out["body_pos"][b], fk_out["body_quat"][b]
