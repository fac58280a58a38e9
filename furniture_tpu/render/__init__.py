"""TPU-native camera observations (rgb / depth / segmentation).

Replaces the reference's two native render paths — the Unity app over TCP
(``env/unity_interface.py``, ``env/mjremote.py``) and mujoco-py's OpenGL
offscreen context (``env/furniture.py:604-631``) — with a pure jitted
ray-casting renderer over the same compiled geom tables the physics uses.
Because it is just another XLA program, it vmaps over the environment batch
and shards with the step: visual observations are produced on-device at
rollout speed instead of 28-65 steps/s over a host socket (BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .raycast import (
    SEG_BACKGROUND,
    SEG_FLOOR,
    Camera,
    GeomScene,
    box_scene,
    frontview,
    merge_scenes,
    part_palette,
    part_scene,
    render,
    to_uint8,
)

__all__ = [
    "Camera",
    "GeomScene",
    "SEG_BACKGROUND",
    "SEG_FLOOR",
    "box_scene",
    "frontview",
    "make_render_fn",
    "merge_scenes",
    "part_palette",
    "part_scene",
    "render",
    "to_uint8",
]

_CURSOR_HALF = 0.015  # cursor box visual half-size (robots/cursor/robot.xml)


def make_render_fn(env, camera: Camera | None = None):
    """Build a jittable ``state -> (rgb, depth, seg)`` for a Cursor or Arm
    environment (the reference's ``render()``/``_get_obs`` camera path,
    ``env/furniture.py:586-668``).

    Segmentation ids: furniture parts 0..P-1; robot bodies / cursors get ids
    ``P + k`` (the reference's Unity segmentation likewise separates agent
    from object ids, ``env/furniture.py:633-668``); floor ``SEG_FLOOR``,
    background ``SEG_BACKGROUND``.
    """
    cam = camera or frontview()
    tables = env.tables
    P = int(env.model.n_parts)
    palette = part_palette(P + 8)

    is_cursor = hasattr(env, "dof") and not hasattr(env, "robot")

    from ..models.compiler import BOX as _BOX

    if is_cursor:
        # geom types are compile-time data: static partitioning lets render()
        # run typed chunked broadcasts instead of the per-geom serial scan
        types_static = tuple(np.asarray(tables["geom_type"]).tolist()) + (
            _BOX,
            _BOX,
        )

        def render_state(state):
            scene = part_scene(tables, state.parts, albedo=palette[jnp.asarray(tables["geom_part"])])
            cursors = box_scene(
                state.cursor_pos,
                jnp.array([_CURSOR_HALF] * 3),
                jnp.array([P, P + 1], jnp.int32),
                rgba=jnp.array([[0.15, 0.9, 0.9], [0.9, 0.25, 0.9]]),
            )
            return render(
                merge_scenes(scene, cursors), cam, static_types=types_static
            )

        return render_state

    from ..robots import kinematics as K

    r = env.robot
    robot_seg = jnp.asarray(P + np.asarray(r.geom_body), jnp.int32)
    robot_rgba = jnp.tile(jnp.array([0.55, 0.57, 0.62]), (len(r.geom_body), 1))
    robot_size = jnp.asarray(r.geom_size, jnp.float32)
    from ..models.compiler import BOX

    types_static = tuple(np.asarray(tables["geom_type"]).tolist()) + (
        _BOX,
    ) * len(r.geom_body)

    def render_state(state):
        scene = part_scene(tables, state.parts, albedo=palette[jnp.asarray(tables["geom_part"])])
        fk_out = K.fk(r, state.qpos)
        gpos, gquat = K.geom_world(r, fk_out)
        robot = GeomScene(
            pos=gpos,
            quat=gquat,
            type=jnp.full((gpos.shape[0],), BOX, jnp.int32),
            size=robot_size,
            seg=robot_seg,
            rgba=robot_rgba,
        )
        return render(
            merge_scenes(scene, robot), cam, static_types=types_static
        )

    return render_state
