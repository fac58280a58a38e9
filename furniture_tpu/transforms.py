"""Batched 3D transform library (quaternions, rotations, poses) for TPU.

All functions are pure jax.numpy, broadcast over arbitrary leading batch axes,
and are safe under ``jit``/``vmap``/``grad`` (no data-dependent Python control
flow; singular configurations handled with ``jnp.where`` guards).

Conventions
-----------
* Quaternions are stored **wxyz** (MuJoCo / pyquaternion order), matching the
  reference environment's runtime convention (see
  ``/root/reference/furniture/env/furniture.py:1044`` ``_site_xpos_xquat`` and
  ``transform_utils.py:641`` ``transform_to_target_quat``).
* ``quat_rotate(q, v)`` is the active rotation ``R(q) v`` (pyquaternion
  ``Quaternion.rotate`` semantics).
* The ``up/forward/right`` direction extractors replicate the exact row
  formulas of the reference (``transform_utils.py:520-556``) so alignment
  predicates agree bit-for-bit in float32.
* Angles in ``rotate_vector`` / ``euler_to_quat`` are **degrees** like the
  reference (``transform_utils.py:617-631,739-746``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


# ---------------------------------------------------------------------------
# basic vector helpers
# ---------------------------------------------------------------------------

def unit(v: jax.Array, axis: int = -1) -> jax.Array:
    """Normalize ``v`` along ``axis``.

    Uses a smoothed norm (``sqrt(Σv² + ε²)``) rather than ``max(‖v‖, ε)``:
    the clamped form still backpropagates ``v/‖v‖`` through the norm and
    yields NaN gradients at v = 0, which breaks iLQR linearization of the
    contact physics."""
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True) + _EPS * _EPS)
    return v / n


def l2_dist(a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
    """Euclidean distance (reference ``transform_utils.py:668``)."""
    return jnp.linalg.norm(a - b, axis=axis)


def cos_siml(a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
    """Cosine similarity (reference ``transform_utils.py:718``)."""
    num = jnp.sum(a * b, axis=axis)
    den = jnp.linalg.norm(a, axis=axis) * jnp.linalg.norm(b, axis=axis)
    return num / jnp.maximum(den, _EPS)


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.cross(a, b)


# ---------------------------------------------------------------------------
# quaternion core (wxyz)
# ---------------------------------------------------------------------------

def quat_identity(shape=()) -> jax.Array:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product ``q1 ∘ q2`` in wxyz (pyquaternion ``__mul__``)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_inv(q: jax.Array) -> jax.Array:
    """Inverse for unit quaternions (conjugate)."""
    return quat_conj(q) / jnp.maximum(
        jnp.sum(q * q, axis=-1, keepdims=True), _EPS
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Active rotation of vector ``v`` by unit quaternion ``q`` (wxyz)."""
    w = q[..., :1]
    u = q[..., 1:]
    # R v = v + 2 w (u × v) + 2 u × (u × v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_axis_angle(axis: jax.Array, angle_rad: jax.Array) -> jax.Array:
    """Unit quaternion from (unnormalized) axis and angle in radians."""
    axis = unit(axis)
    half = angle_rad[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """3x3 active rotation matrix from wxyz quaternion."""
    w, x, y, z = jnp.moveaxis(quat_normalize(q), -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat_to_quat(m: jax.Array) -> jax.Array:
    """wxyz quaternion from a 3x3 rotation matrix (branch-free Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions; pick numerically best per-lane
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    c0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    c1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    c2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    c3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )

    cases = jnp.stack([c0, c1, c2, c3], axis=-2)  # [..., 4 cases, 4]
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    # one-hot contraction, NOT take_along_axis: the dynamic gather lowers
    # catastrophically on TPU when this runs batched inside the per-step
    # alignment sweep (measured ~35 ms per 4096-env batch step vs ~1 ms
    # for the fused multiply-sum)
    sel = jax.nn.one_hot(best, 4, dtype=cases.dtype)          # [..., 4]
    q = jnp.sum(sel[..., None] * cases, axis=-2)
    return quat_normalize(q)


def euler_to_quat(rot_deg: jax.Array, base_quat: jax.Array | None = None) -> jax.Array:
    """Reference ``euler_to_quat`` (``transform_utils.py:617-631``).

    ``rot_deg`` = (rx, ry, rz) in degrees; result is
    ``base ∘ (qz ∘ qy ∘ qx)`` — i.e. the offset applied in the body frame.
    """
    half = jnp.deg2rad(rot_deg) * 0.5
    cx, cy, cz = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sx, sy, sz = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    # qz * qy * qx expanded
    q = jnp.stack(
        [
            cz * cy * cx + sz * sy * sx,
            cz * cy * sx - sz * sy * cx,
            cz * sy * cx + sz * cy * sx,
            sz * cy * cx - cz * sy * sx,
        ],
        axis=-1,
    )
    if base_quat is not None:
        q = quat_mul(base_quat, q)
    return q


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation (shortest arc), wxyz.

    Matches ``pyquaternion``-based ``T.quat_slerp`` used for connect
    interpolation (reference ``env/furniture.py:1013``).
    """
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == q0.ndim - 1 else jnp.asarray(t)
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS))
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# reference-exact direction extractors (transform_utils.py:520-556)
# ---------------------------------------------------------------------------

def forward_vector_from_quat(q: jax.Array) -> jax.Array:
    """Reference ``forward_vector_from_quat`` (``transform_utils.py:520``)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )


def up_vector_from_quat(q: jax.Array) -> jax.Array:
    """Reference ``up_vector_from_quat`` (``transform_utils.py:532``)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )


def right_vector_from_quat(q: jax.Array) -> jax.Array:
    """Reference ``right_vector_from_quat`` (``transform_utils.py:545``)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )


def lookat_to_quat(forward: jax.Array, up: jax.Array) -> jax.Array:
    """Reference ``lookat_to_quat`` (``transform_utils.py:457-516``), wxyz out.

    Builds the rotation matrix with rows (right, true_up, forward) and
    extracts its quaternion; the reference returns xyzw and then converts —
    here we return wxyz directly.
    """
    v = unit(forward)
    v2 = unit(jnp.cross(unit(up), v))
    v3 = jnp.cross(v, v2)
    m = jnp.stack([v2, v3, v], axis=-2)  # rows: m00..m02 = v2, m10..=v3, m20..=v
    return mat_to_quat(m)


def rotate_vector(v: jax.Array, axis: jax.Array, angle_deg: jax.Array) -> jax.Array:
    """Rodrigues rotation by degrees (reference ``transform_utils.py:739``).

    Note: like the reference, drops the (1-cos) k(k·v) term — exact only for
    v ⟂ axis, which holds for its uses (forward ⟂ up).
    """
    k = unit(axis)
    a = jnp.deg2rad(jnp.asarray(angle_deg))[..., None]
    return jnp.cos(a) * v + jnp.sin(a) * jnp.cross(k, v)


def rotate_vector_cos_siml(
    v: jax.Array, axis: jax.Array, cos: jax.Array, direction: float
) -> jax.Array:
    """Reference ``rotate_vector_cos_siml`` (``transform_utils.py:748``)."""
    k = unit(axis)
    sin = jnp.sqrt(jnp.maximum(1.0 - jnp.square(cos), 0.0))[..., None]
    return cos[..., None] * v + direction * sin * jnp.cross(k, v)


# ---------------------------------------------------------------------------
# pose ops
# ---------------------------------------------------------------------------

def angle_between2D(cur: jax.Array, tgt: jax.Array) -> jax.Array:
    """Relative signed angle in radians between 2D vectors, range (-2π, 2π)
    (reference ``transform_utils.py:688-700`` via ``pos_atan``)."""
    a_cur = jnp.arctan2(cur[..., 1], cur[..., 0])
    a_tgt = jnp.arctan2(tgt[..., 1], tgt[..., 0])
    return a_tgt - a_cur


def angle_between(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Unsigned angle in radians between vectors
    (``transform_utils.py:703-715``)."""
    c = cos_siml(v1, v2)
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


def rotate_vector2D(vec: jax.Array, angle_rad: jax.Array) -> jax.Array:
    """Rotate a 2D vector counterclockwise (``transform_utils.py:730-736``)."""
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    return jnp.stack(
        [c * vec[..., 0] - s * vec[..., 1], s * vec[..., 0] + c * vec[..., 1]],
        axis=-1,
    )


def rel_pose(pose1: jax.Array, pose2: jax.Array) -> jax.Array:
    """Pose of ``pose2`` in ``pose1``'s frame, as (pos3, quat4-wxyz).

    Reference ``rel_pose`` (``transform_utils.py:633-639``); used for the
    weld equality data (``env/furniture.py:2770``).
    """
    inv1 = quat_inv(pose1[..., 3:7])
    rp = quat_rotate(inv1, pose2[..., :3] - pose1[..., :3])
    rq = quat_mul(inv1, pose2[..., 3:7])
    return jnp.concatenate([rp, rq], axis=-1)


def transform_to_target_quat(
    qpos_base: jax.Array, qpos: jax.Array, target_quat: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Rigid co-rotation of ``qpos`` when ``qpos_base`` is rotated (in place)
    to ``target_quat``. The core of the reference's rigid-group motion
    (``transform_utils.py:641-665``).
    """
    rel_rot = quat_mul(target_quat, quat_inv(qpos_base[..., 3:7]))
    new_pos = quat_rotate(rel_rot, qpos[..., :3] - qpos_base[..., :3]) + qpos_base[..., :3]
    new_quat = quat_mul(rel_rot, qpos[..., 3:7])
    return new_pos, new_quat


def pose_mul(pos1, quat1, pos2, quat2):
    """Compose poses: world_T_a ∘ a_T_b → (pos, quat) of b in world."""
    return pos1 + quat_rotate(quat1, pos2), quat_mul(quat1, quat2)


def pose_inv(pos, quat):
    iq = quat_inv(quat)
    return -quat_rotate(iq, pos), iq


def convert_quat(q: jax.Array, to: str = "xyzw") -> jax.Array:
    """Reorder quaternion components (reference ``transform_utils.py:15``)."""
    if to == "xyzw":
        return q[..., jnp.array([1, 2, 3, 0])]
    if to == "wxyz":
        return q[..., jnp.array([3, 0, 1, 2])]
    raise ValueError(f"bad order {to}")
