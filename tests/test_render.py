"""Renderer tests: rgb/depth/segmentation camera observations
(reference camera path: ``env/furniture.py:586-668``, Unity/mujoco-py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furniture_tpu.config import EnvConfig
from furniture_tpu.envs.cursor import CursorEnv
from furniture_tpu.render import (
    SEG_BACKGROUND,
    SEG_FLOOR,
    Camera,
    frontview,
    make_render_fn,
    to_uint8,
)
from furniture_tpu import transforms as T


@pytest.fixture(scope="module")
def cursor_env():
    return CursorEnv(EnvConfig(furniture_name="table_lack_0825"))


@pytest.fixture(scope="module")
def cursor_frame(cursor_env):
    state = cursor_env.reset(jax.random.PRNGKey(0))
    rf = jax.jit(make_render_fn(cursor_env, frontview(72, 72)))
    return jax.tree.map(np.asarray, rf(state))


def test_shapes_and_ranges(cursor_frame):
    rgb, depth, seg = cursor_frame
    assert rgb.shape == (72, 72, 3) and seg.shape == (72, 72)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    assert np.isfinite(depth[seg != SEG_BACKGROUND]).all()
    assert np.isinf(depth[seg == SEG_BACKGROUND]).all()


def test_segmentation_ids(cursor_env, cursor_frame):
    _, _, seg = cursor_frame
    ids = set(np.unique(seg).tolist())
    # floor visible from the frontview camera, several parts visible,
    # plus sky above the horizon
    assert SEG_FLOOR in ids and SEG_BACKGROUND in ids
    parts_visible = [i for i in ids if i >= 0]
    assert len(parts_visible) >= 2
    assert max(parts_visible) < cursor_env.model.n_parts + 2  # parts + cursors


def test_depth_orders_floor_behind_parts(cursor_frame):
    rgb, depth, seg = cursor_frame
    part_px = seg >= 0
    floor_px = seg == SEG_FLOOR
    assert part_px.any() and floor_px.any()
    # parts sit on the floor between the camera and the far floor plane:
    # median part depth < max floor depth
    assert np.median(depth[part_px]) < depth[floor_px].max()


def test_moving_part_changes_image(cursor_env):
    rf = jax.jit(make_render_fn(cursor_env, frontview(64, 64)))
    state = cursor_env.reset(jax.random.PRNGKey(1))
    _, _, seg0 = rf(state)
    lifted = state._replace(
        parts=state.parts._replace(pos=state.parts.pos + jnp.array([0.0, 0.0, 0.4]))
    )
    _, _, seg1 = rf(lifted)
    assert not np.array_equal(np.asarray(seg0), np.asarray(seg1))


def test_vmap_batch(cursor_env):
    rf = make_render_fn(cursor_env, frontview(48, 48))
    states = jax.vmap(cursor_env.reset)(jax.random.split(jax.random.PRNGKey(2), 3))
    rgb, depth, seg = jax.jit(jax.vmap(rf))(states)
    assert rgb.shape == (3, 48, 48, 3)
    # each lane sees furniture
    assert all((np.asarray(seg[i]) >= 0).any() for i in range(3))


def test_chunked_matches_scan_for_rotated_geoms():
    """The chunked (static_types) path must shade rotated geoms identically
    to the generic scan path — regression for the n@rot vs n@rot.T normal
    rotation bug (hit normals were rotated geom->world with the transpose)."""
    from furniture_tpu.models.compiler import BOX, CYLINDER, SPHERE
    from furniture_tpu.render.raycast import GeomScene, render

    rng = np.random.RandomState(3)
    n = 6
    quat = rng.randn(n, 4)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    scene = GeomScene(
        pos=jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)) + np.array([0, 0, 0.3])),
        quat=jnp.asarray(quat, jnp.float32),
        type=jnp.asarray([BOX, BOX, SPHERE, CYLINDER, BOX, CYLINDER], jnp.int32),
        size=jnp.asarray(rng.uniform(0.05, 0.15, (n, 3)), jnp.float32),
        seg=jnp.arange(n, dtype=jnp.int32),
        rgba=jnp.asarray(rng.uniform(0.2, 0.9, (n, 3)), jnp.float32),
    )
    cam = frontview(56, 56)
    rgb_scan, d_scan, seg_scan = jax.jit(lambda s: render(s, cam))(scene)
    rgb_chunk, d_chunk, seg_chunk = jax.jit(
        lambda s: render(
            s, cam, static_types=tuple(np.asarray(scene.type).tolist())
        )
    )(scene)
    assert np.array_equal(np.asarray(seg_scan), np.asarray(seg_chunk))
    np.testing.assert_allclose(
        np.asarray(rgb_scan), np.asarray(rgb_chunk), atol=1e-5
    )


def test_to_uint8(cursor_frame):
    rgb, _, _ = cursor_frame
    img = np.asarray(to_uint8(jnp.asarray(rgb)))
    assert img.dtype == np.uint8 and img.max() > 40


def test_arm_render_includes_robot():
    from furniture_tpu.envs.arm import ArmEnv

    env = ArmEnv(EnvConfig(agent_type="Sawyer", control_type="impedance"))
    state = env.reset(jax.random.PRNGKey(0))
    # camera looking at the robot base from the front
    cam = Camera(
        pos=jnp.array([0.0, -1.2, 0.9]),
        quat=T.quat_normalize(jnp.array([0.86, 0.51, 0.0, 0.0])),
        fovy=60.0,
        width=64,
        height=64,
    )
    rgb, depth, seg = jax.jit(make_render_fn(env, cam))(state)
    P = env.model.n_parts
    ids = np.unique(np.asarray(seg))
    assert (ids >= P).any(), "robot body ids visible"
    assert (ids == SEG_FLOOR).any()


def test_wrapper_camera_obs():
    from furniture_tpu import make_env

    env = make_env(
        "IKEACursor-v0",
        furniture_name="table_lack_0825",
        camera_ob=True,
        depth_ob=True,
        segmentation_ob=True,
        screen_width=40,
        screen_height=40,
    )
    ob = env.reset(seed=0)
    assert ob["camera_ob"].shape == (40, 40, 3)
    assert ob["depth_ob"].shape == (40, 40)
    assert ob["segmentation_ob"].shape == (40, 40)
    ob, rew, done, info = env.step(env.action_space.sample())
    assert ob["camera_ob"].shape == (40, 40, 3)
    img = env.render("rgb_array")
    assert img.shape == (40, 40, 3)
