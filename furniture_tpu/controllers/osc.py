"""Torque-space controllers: operational-space (position/orientation),
joint impedance, joint velocity.

Ports the *math* of the reference's ``controllers/arm_controller.py`` —
λ-matrices via SVD-regularized ``(J M⁻¹ Jᵀ)⁻¹`` (:753-797), impedance wrench
→ ``τ = Jᵀ F`` with nullspace posture torque (:713-744), critically-damped
joint impedance (:483-496), velocity servo ``τ = kv (q̇_des − q̇)`` (:364) —
as pure batched jax functions on our own FK/mass-matrix.

Gains come from the converted controller config
(``assets/controller_config.json`` ← ``controllers/controller_config.hjson``).
"""

from __future__ import annotations

import json
from functools import lru_cache

import jax
import jax.numpy as jnp

from ..models import ASSET_DIR
from ..robots import kinematics as K


@lru_cache(maxsize=1)
def load_controller_config() -> dict:
    with open(ASSET_DIR / "controller_config.json") as f:
        return json.load(f)


def orientation_error(desired_mat, current_mat):
    """Rotational error between two rotation matrices
    (``arm_controller.py:178-199``): ``e = ½ Σ r_i × d_i``."""
    rc = current_mat.T   # columns of current as rows
    rd = desired_mat.T
    return 0.5 * (
        jnp.cross(rc[0], rd[0]) + jnp.cross(rc[1], rd[1]) + jnp.cross(rc[2], rd[2])
    )


def _svd_clamped_inv(A, threshold: float = 0.00025):
    """Pseudo-inverse zeroing singular values below ``threshold``
    (``arm_controller.py:786-797`` singularity handling)."""
    u, s, vt = jnp.linalg.svd(A)
    s_inv = jnp.where(s < threshold, 0.0, 1.0 / jnp.maximum(s, 1e-12))
    return vt.T @ (s_inv[:, None] * u.T)


def osc_torques(
    robot,
    arm: str,
    fk_out,
    M,
    qpos,
    qvel,
    goal_pos,
    goal_mat,
    kp_pos,
    kp_ori,
    damping,
    initial_joint=None,
    position_only: bool = False,
):
    """Operational-space control torques
    (``arm_controller.py:507-881`` PositionOrientationController /
    PositionController).

    * impedance wrench: ``F = kp·e − kv·v`` with critical damping
      ``kv = 2·√kp·damping`` (:710-744)
    * decoupling by λ-matrices with SVD-clamped inversion (:753-797)
    * ``τ = Jᵀ[λx F; λr T]`` + nullspace posture torque toward
      ``initial_joint`` (joint_kp=10, :734-742)
    """
    arm_j = robot.arm_joints[arm]
    body = robot.eef_body[arm]
    eef_pos, eef_quat = K.eef_pose(robot, fk_out, arm)
    from .. import transforms as T

    cur_mat = T.quat_to_mat(eef_quat)
    J = K.point_jacobian(robot, fk_out, body, eef_pos)[:, arm_j]   # [6,na]
    Jx, Jr = J[:3], J[3:]
    vel = J @ qvel[arm_j]                                          # [6]

    kv_pos = 2.0 * jnp.sqrt(kp_pos) * damping
    kv_ori = 2.0 * jnp.sqrt(kp_ori) * damping
    e_pos = goal_pos - eef_pos
    F = kp_pos * e_pos - kv_pos * vel[:3]
    if position_only:
        Tq = -kv_ori * vel[3:]
    else:
        e_ori = orientation_error(goal_mat, cur_mat)
        Tq = kp_ori * e_ori - kv_ori * vel[3:]

    Ma = M[arm_j][:, arm_j]  # arm block of the joint-space inertia
    M_inv = jnp.linalg.inv(Ma)
    lam_x = _svd_clamped_inv(Jx @ M_inv @ Jx.T)
    lam_r = _svd_clamped_inv(Jr @ M_inv @ Jr.T)
    wrench = jnp.concatenate([lam_x @ F, lam_r @ Tq])
    torques = J.T @ wrench                                         # [na]

    if initial_joint is not None:
        joint_kp = 10.0
        joint_kv = 2.0 * jnp.sqrt(joint_kp)
        pose_tau = Ma @ (
            joint_kp * (jnp.asarray(initial_joint) - qpos[arm_j])
            - joint_kv * qvel[arm_j]
        )
        lam = _svd_clamped_inv(J @ M_inv @ J.T)
        Jbar = M_inv @ J.T @ lam
        null = jnp.eye(len(arm_j)) - Jbar @ J
        torques = torques + null.T @ pose_tau
    return torques


def joint_impedance_torques(M_arm, qpos_arm, qvel_arm, goal_qpos, kp, damping):
    """Critically-damped joint-space impedance with mass-matrix decoupling
    (``arm_controller.py:369-505`` JointImpedanceController):
    ``τ = M (kp·e − kv·q̇)``, ``kv = 2√kp·damping``."""
    kv = 2.0 * jnp.sqrt(kp) * damping
    acc = kp * (goal_qpos - qpos_arm) - kv * qvel_arm
    return M_arm @ acc


def joint_velocity_torques(qvel_arm, goal_qvel, kv):
    """``τ = kv (q̇_des − q̇)`` (``arm_controller.py:315-368``)."""
    return kv * (goal_qvel - qvel_arm)
