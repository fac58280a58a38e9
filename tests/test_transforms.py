"""Transform library tests: internal consistency + reference-convention checks.

The reference conventions being pinned down (all wxyz):
* ``quat_mul`` is the Hamilton product (pyquaternion ``__mul__``)
* ``quat_rotate`` is active rotation
* up/forward/right extractors match ``transform_utils.py:520-556`` rows
* ``transform_to_target_quat`` rigid co-rotation matches
  ``transform_utils.py:641-665``
"""

import jax.numpy as jnp
import numpy as np
import pytest

import furniture_tpu.transforms as T


def rand_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_quat_mul_identity(rng):
    q = rand_quat(rng, (5,))
    qi = np.tile([1.0, 0, 0, 0], (5, 1))
    np.testing.assert_allclose(T.quat_mul(qi, q), q, atol=1e-6)
    np.testing.assert_allclose(T.quat_mul(q, qi), q, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = rand_quat(rng, (7,))
    v = rng.normal(size=(7, 3))
    Rv = np.einsum("bij,bj->bi", np.asarray(T.quat_to_mat(q)), v)
    np.testing.assert_allclose(T.quat_rotate(q, v), Rv, atol=1e-5)


def test_quat_mul_composes_rotation(rng):
    q1, q2 = rand_quat(rng), rand_quat(rng)
    v = rng.normal(size=3)
    a = T.quat_rotate(T.quat_mul(q1, q2), v)
    b = T.quat_rotate(q1, T.quat_rotate(q2, v))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_mat_quat_roundtrip(rng):
    q = rand_quat(rng, (20,))
    q2 = np.asarray(T.mat_to_quat(T.quat_to_mat(q)))
    # sign ambiguity
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_direction_extractors_reference_formulas(rng):
    """Pin the exact row formulas of transform_utils.py:520-556."""
    q = rand_quat(rng)
    w, x, y, z = q
    fwd = np.array([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)])
    up = np.array([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)])
    right = np.array([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)])
    np.testing.assert_allclose(T.forward_vector_from_quat(q), fwd, atol=1e-6)
    np.testing.assert_allclose(T.up_vector_from_quat(q), up, atol=1e-6)
    np.testing.assert_allclose(T.right_vector_from_quat(q), right, atol=1e-6)


def test_up_forward_orthonormal(rng):
    q = rand_quat(rng, (10,))
    up = np.asarray(T.up_vector_from_quat(q))
    fwd = np.asarray(T.forward_vector_from_quat(q))
    np.testing.assert_allclose(np.sum(up * fwd, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(up, axis=-1), 1.0, atol=1e-5)


def test_lookat_roundtrip(rng):
    """lookat_to_quat(up, fwd_rotated) must reproduce those direction vectors
    through the same extractors — the invariant the reference relies on when
    snapping connectors (env/furniture.py:1099-1105)."""
    q = rand_quat(rng, (10,))
    up = np.asarray(T.up_vector_from_quat(q))
    fwd = np.asarray(T.forward_vector_from_quat(q))
    # reference call pattern: lookat_to_quat(up1, forward1) (forward arg = up!)
    q2 = T.lookat_to_quat(jnp.asarray(up), jnp.asarray(fwd))
    np.testing.assert_allclose(np.asarray(T.up_vector_from_quat(q2)), up, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(T.forward_vector_from_quat(q2)), fwd, atol=1e-4
    )


def test_transform_to_target_quat_rigidity(rng):
    """Rigid co-rotation: distances between base and satellite preserved, and
    base point itself stays fixed."""
    base = np.concatenate([rng.normal(size=3), rand_quat(rng)])
    sat = np.concatenate([rng.normal(size=3), rand_quat(rng)])
    target = rand_quat(rng)
    new_pos, new_quat = T.transform_to_target_quat(base, sat, target)
    d_before = np.linalg.norm(sat[:3] - base[:3])
    d_after = np.linalg.norm(np.asarray(new_pos) - base[:3])
    np.testing.assert_allclose(d_after, d_before, atol=1e-5)
    # base maps to itself
    bp, bq = T.transform_to_target_quat(base, base, target)
    np.testing.assert_allclose(bp, base[:3], atol=1e-5)
    sign = np.sign(np.sum(np.asarray(bq) * target))
    np.testing.assert_allclose(np.asarray(bq) * sign, target, atol=1e-5)


def test_transform_to_target_relative_pose_preserved(rng):
    """Relative pose of satellite in base frame is invariant."""
    base = np.concatenate([rng.normal(size=3), rand_quat(rng)])
    sat = np.concatenate([rng.normal(size=3), rand_quat(rng)])
    target = rand_quat(rng)
    rel_before = np.asarray(T.rel_pose(base, sat))
    new_pos, new_quat = T.transform_to_target_quat(base, sat, target)
    new_base = np.concatenate([base[:3], target])
    new_sat = np.concatenate([np.asarray(new_pos), np.asarray(new_quat)])
    rel_after = np.asarray(T.rel_pose(new_base, new_sat))
    np.testing.assert_allclose(rel_after[:3], rel_before[:3], atol=1e-4)
    sign = np.sign(np.sum(rel_after[3:] * rel_before[3:]))
    np.testing.assert_allclose(rel_after[3:] * sign, rel_before[3:], atol=1e-4)


def test_euler_to_quat_z90():
    """90° z-rotation about identity: forward (y-ish) maps per reference
    convention; compare against axis-angle."""
    q = np.asarray(T.euler_to_quat(jnp.array([0.0, 0.0, 90.0])))
    expect = np.asarray(
        T.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.pi / 2))
    )
    sign = np.sign(np.sum(q * expect))
    np.testing.assert_allclose(q * sign, expect, atol=1e-5)


def test_euler_to_quat_composition_order(rng):
    """euler_to_quat(rot, base) == base ∘ qz∘qy∘qx (transform_utils.py:617)."""
    base = rand_quat(rng)
    rot = np.array([10.0, 20.0, 30.0])
    got = np.asarray(T.euler_to_quat(jnp.asarray(rot), jnp.asarray(base)))
    qx = np.asarray(T.quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.deg2rad(10.0)))
    qy = np.asarray(T.quat_from_axis_angle(jnp.array([0.0, 1, 0]), jnp.deg2rad(20.0)))
    qz = np.asarray(T.quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.deg2rad(30.0)))
    expect = np.asarray(
        T.quat_mul(jnp.asarray(base), T.quat_mul(jnp.asarray(qz), T.quat_mul(jnp.asarray(qy), jnp.asarray(qx))))
    )
    sign = np.sign(np.sum(got * expect))
    np.testing.assert_allclose(got * sign, expect, atol=1e-5)


def test_slerp_endpoints_midpoint(rng):
    q0, q1 = rand_quat(rng), rand_quat(rng)
    np.testing.assert_allclose(T.quat_slerp(q0, q1, 0.0), q0, atol=1e-5)
    s1 = np.asarray(T.quat_slerp(q0, q1, 1.0))
    sign = np.sign(np.sum(s1 * q1))
    np.testing.assert_allclose(s1 * sign, q1, atol=1e-5)
    # midpoint is unit and equidistant
    mid = np.asarray(T.quat_slerp(q0, q1, 0.5))
    np.testing.assert_allclose(np.linalg.norm(mid), 1.0, atol=1e-5)


def test_rotate_vector_degrees():
    v = jnp.array([1.0, 0.0, 0.0])
    out = np.asarray(T.rotate_vector(v, jnp.array([0.0, 0.0, 1.0]), 90.0))
    np.testing.assert_allclose(out, [0, 1, 0], atol=1e-6)


def test_rel_pose_identity(rng):
    p = np.concatenate([rng.normal(size=3), rand_quat(rng)])
    rel = np.asarray(T.rel_pose(p, p))
    np.testing.assert_allclose(rel[:3], 0.0, atol=1e-6)
    sign = np.sign(rel[3])
    np.testing.assert_allclose(rel[3:] * sign, [1, 0, 0, 0], atol=1e-6)
