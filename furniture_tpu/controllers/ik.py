"""Batched damped-least-squares inverse kinematics.

Replaces the reference's pybullet IK side-engine
(``controllers/sawyer_ik_controller.py:112-277``: headless bullet + URDF,
20 ``calculateInverseKinematics`` resolve iterations, then a joint-space
P-controller emitting clipped velocities). Here IK is plain jax on the same
FK used by the dynamics — jit/vmap-batched, no host round-trip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import transforms as T
from ..robots import kinematics as K


def _pose_error(cur_pos, cur_quat, target_pos, target_quat):
    """6-vector twist moving (cur) toward (target)."""
    e_pos = target_pos - cur_pos
    # orientation error from the relative quaternion (axis * angle)
    dq = T.quat_mul(target_quat, T.quat_inv(cur_quat))
    dq = jnp.where(dq[..., 0:1] < 0, -dq, dq)
    angle = 2.0 * jnp.arccos(jnp.clip(dq[..., 0], -1.0, 1.0))
    axis = dq[..., 1:] / jnp.maximum(
        jnp.linalg.norm(dq[..., 1:], axis=-1, keepdims=True), 1e-9
    )
    return jnp.concatenate([e_pos, axis * angle[..., None]], axis=-1)


def dls_ik(
    robot,
    arm: str,
    qpos,
    target_pos,
    target_quat,
    iters: int = 20,
    damping: float = 1e-3,
    step_scale: float = 1.0,
):
    """Damped-least-squares IK for ``arm``'s hand body.

    Returns the full joint vector with the arm's actuated joints moved to
    reach (``target_pos``, ``target_quat``); other joints (gripper, locked
    joints, the other arm) are untouched. Matches the reference's resolve
    loop length (``sawyer_ik_controller.py:272-277``).
    """
    arm_j = robot.arm_joints[arm]            # static int array
    body = robot.eef_body[arm]
    lo = jnp.asarray(robot.jnt_range[arm_j, 0], jnp.float32)
    hi = jnp.asarray(robot.jnt_range[arm_j, 1], jnp.float32)

    def body_fn(_, q):
        fk_out = K.fk(robot, q)
        cur_pos, cur_quat = K.eef_pose(robot, fk_out, arm)
        err = _pose_error(cur_pos, cur_quat, target_pos, target_quat)  # [6]
        J = K.point_jacobian(robot, fk_out, body, cur_pos)             # [6,NJ]
        Ja = J[:, arm_j]                                               # [6,na]
        JJt = Ja @ Ja.T + damping * jnp.eye(6)
        dq = Ja.T @ jax.scipy.linalg.solve(JJt, err, assume_a="pos")
        qa = jnp.clip(q[arm_j] + step_scale * dq, lo, hi)
        return q.at[arm_j].set(qa)

    return jax.lax.fori_loop(0, iters, body_fn, qpos)


def ik_velocities(qpos, q_cmd, arm_joints, gain: float = 5.0):
    """Joint-space P-controller to velocity commands, clipped to ±1
    (``sawyer_ik_controller.py:78-88`` ``v = -5·(q - q_cmd)``, clip at :295-299).
    """
    delta = qpos[arm_joints] - q_cmd[arm_joints]
    return jnp.clip(-gain * delta, -1.0, 1.0)
